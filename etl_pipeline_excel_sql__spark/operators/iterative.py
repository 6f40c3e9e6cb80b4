"""Lineage truncation for iterative DataFrame algorithms, with bounded
storage and an opt-in fault-tolerant mode.

Iterative operators (connected components in ``clusters.py``, PageRank in
``graph.py``) must cut their logical plan every round or plan analysis
doubles per iteration. The cut has two flavors:

* ``localCheckpoint`` (default) — blocks in the executor block manager.
  Fast, but (a) NOT fault-tolerant: losing an executor mid-loop loses
  blocks with no lineage to recompute them, failing a multi-hour job at
  real scale; and (b) blocks accumulate unless the previous iteration's
  are explicitly unpersisted (Spark's ContextCleaner frees them only on
  JVM GC, which is nondeterministic).
* reliable ``checkpoint`` — files under a checkpoint directory (HDFS/S3 on
  a cluster). Survives executor loss; the right mode for 100-TB runs.

``LineageTruncator`` wraps both behind one call and bounds storage either
way: each ``truncate`` unpersists the previous iteration's blocks (local
mode) or deletes its checkpoint files (reliable mode) once the new
iteration has materialized. The caller must therefore only ever read the
MOST RECENT truncated DataFrame — exactly the shape of a fixpoint loop.

``truncate_with`` additionally lets the convergence check BE the
materializing action: a non-eager checkpoint is marked and the caller's
action (e.g. "count changed labels") runs as the one job that both
materializes the checkpoint and answers convergence — one job per round
instead of an eager-checkpoint job plus a separate count job.
"""

from __future__ import annotations

from typing import Callable, TypeVar

from pyspark.sql import DataFrame, SparkSession

T = TypeVar("T")


def _persisted_rdd_ids(spark: SparkSession) -> set[int]:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(i) for i in jmap.keySet().toArray()}


def _unpersist_rdd_ids(spark: SparkSession, ids: set[int]) -> None:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in ids:
        jrdd = jmap.get(rid)
        if jrdd is not None:
            jrdd.unpersist(False)


class LineageTruncator:
    """Per-iteration plan truncation with previous-iteration cleanup.

    One instance per loop variable. ``checkpoint_dir=None`` (default)
    keeps the sandbox-friendly ``localCheckpoint``; passing a directory
    (e.g. an HDFS/S3 URI on a cluster) switches every cut to a reliable
    ``checkpoint`` so executor loss cannot kill the loop. Results are
    identical either way — only the storage substrate changes.
    """

    def __init__(
        self, spark: SparkSession, checkpoint_dir: str | None = None
    ) -> None:
        self._spark = spark
        self._reliable = checkpoint_dir is not None
        self._prior_rdd_ids: set[int] = set()
        self._prior_files: set[str] = set()
        if self._reliable:
            spark.sparkContext.setCheckpointDir(checkpoint_dir)
            self._ckpt_root = checkpoint_dir

    @property
    def spark(self) -> SparkSession:
        """The session this truncator's cuts live in — module-global
        slot holders compare it to the current session to decide
        whether a cached truncator is stale (ADVICE r13: callers were
        reaching into ``_spark``)."""
        return self._spark

    # -- reliable-mode file tracking ------------------------------------
    def _rdd_dirs(self) -> set[str]:
        """Glob rdd-* checkpoint dirs under the root, any filesystem."""
        sc = self._spark.sparkContext
        jvm = sc._jvm
        path = jvm.org.apache.hadoop.fs.Path(self._ckpt_root + "/*/rdd-*")
        fs = path.getFileSystem(sc._jsc.hadoopConfiguration())
        statuses = fs.globStatus(path)
        if statuses is None:
            return set()
        return {str(s.getPath()) for s in statuses}

    def _delete_files(self, paths: set[str]) -> None:
        sc = self._spark.sparkContext
        jvm = sc._jvm
        for p in paths:
            jpath = jvm.org.apache.hadoop.fs.Path(p)
            fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
            fs.delete(jpath, True)

    # -- public API ------------------------------------------------------
    def truncate(self, df: DataFrame) -> DataFrame:
        """Eagerly materialize a lineage cut of ``df``; free the prior one.

        Uses Spark's own eager checkpoint (which counts the INTERNAL row
        RDD) rather than ``truncate_with(df, count)``: a DataFrame-level
        count would analyze + codegen a fresh aggregate plan every
        iteration — measured ~0.1 s/iteration of pure driver overhead in
        the PageRank loop.
        """
        before_ids = _persisted_rdd_ids(self._spark)
        before_files = self._rdd_dirs() if self._reliable else set()
        if self._reliable:
            # Reliable checkpoint runs TWO jobs (the materializing action,
            # then the file write recomputing all partitions from lineage)
            # unless the plan is cached between them — persist around the
            # cut keeps each round to one computation.
            cached = df.persist()
            try:
                cut = cached.checkpoint(eager=True)
            finally:
                # unpersist even when checkpoint() raises — otherwise the
                # cached blocks leak for the rest of the session
                cached.unpersist()
        else:
            cut = df.localCheckpoint(eager=True)
        self._retire_prior(before_ids, before_files)
        return cut

    def truncate_with(
        self, df: DataFrame, action: Callable[[DataFrame], T]
    ) -> tuple[DataFrame, T]:
        """Mark a lineage cut, run ``action`` as the materializing job.

        ``action`` MUST compute every partition (a full ``count()`` /
        aggregate — never ``limit``), otherwise unvisited partitions stay
        unmaterialized and the cut is partial. Returns the truncated
        DataFrame and the action's result. The previous iteration's
        storage is freed only after the new cut has fully materialized,
        so a failure mid-action never strands the loop without its input.
        """
        before_ids = _persisted_rdd_ids(self._spark)
        before_files = self._rdd_dirs() if self._reliable else set()
        if self._reliable:
            # same persist-around-the-cut as truncate(): the deferred
            # file write replays the plan from the cache, not from
            # scratch, keeping "one computation per round" true in
            # reliable mode too
            cached = df.persist()
            try:
                cut = cached.checkpoint(eager=False)
                result = action(cut)
            finally:
                # runs even when the caller's action raises — the persisted
                # blocks must never outlive the round that created them
                cached.unpersist()
        else:
            cut = df.localCheckpoint(eager=False)
            result = action(cut)
        self._retire_prior(before_ids, before_files)
        return cut, result

    def _retire_prior(
        self, before_ids: set[int], before_files: set[str]
    ) -> None:
        """The new cut is fully materialized: free the previous round's
        storage and remember the new round's for next time."""
        _unpersist_rdd_ids(self._spark, self._prior_rdd_ids)
        self._prior_rdd_ids = _persisted_rdd_ids(self._spark) - before_ids
        if self._reliable:
            self._delete_files(self._prior_files)
            self._prior_files = self._rdd_dirs() - before_files
