"""Connected components over near-duplicate pair graphs.

Pair generators (``minhash_lsh_pairs``, ``cosine_neardup_pairs``,
``ngram_jaccard_pairs``) emit edges; deduplication needs the *clusters*
those edges imply — every document in a component is a copy-group and one
keeper survives. This is the standard third stage of a web-scale dedup
pipeline (pairs -> components -> keeper policy), absent from the reference
(its dedup is single-key ``drop_duplicates``, Upload.py:48) but required
at training-data scale.

Algorithm: iterative min-label propagation expressed as DataFrame joins —
each round every node takes the minimum label among itself and its
neighbors; a fixpoint is reached in graph-diameter rounds. Near-dup
components are dense blobs (diameter 2-4 in practice), so the loop is
short; each round is one shuffle join + one shuffle aggregate, both on the
(node, label) pair — never on document payloads. Lineage is truncated
per-round (``operators/iterative.LineageTruncator``) so the plan stays
flat no matter how many rounds run, and the changed-label count that
decides convergence IS the job that materializes the round's cut — one
job per round, no separate convergence action. For graphs with long
chains (not the near-dup shape) the published large-star/small-star
contraction [Kiveris et al., "Connected Components in MapReduce and
Beyond"] drops the round count to O(log^2 n); the loop body here is the
small-star half of that scheme.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_excel_sql__spark.operators.iterative import LineageTruncator


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Resolve an undirected pair graph into components.

    Returns ``(member_id, cluster_id, cluster_size)`` for every node that
    appears in ``pairs``; ``cluster_id`` is the minimum node id in the
    component (deterministic, no RNG), ``cluster_size`` the component's
    node count. Nodes with no edges (singletons) are by definition absent
    — callers wanting them keep a left-anti of the corpus against this
    result.

    Raises ``RuntimeError`` if the graph has not converged after
    ``max_iters`` rounds (diameter > max_iters — not a near-dup shape).

    ``checkpoint_dir`` switches per-round lineage truncation from
    ``localCheckpoint`` (fast, sandbox default, NOT fault-tolerant) to a
    reliable ``checkpoint`` under the given directory (HDFS/S3 on a
    cluster) so an executor loss mid-loop cannot kill a long job.
    Values are identical either way.
    """
    spark = pairs.sparkSession
    # Separate truncators: edges are read every round and must never be
    # retired; the label loop retires round N-1's storage once round N
    # has materialized (bounded: ≤1 round of (node,label) rows alive).
    edge_trunc = LineageTruncator(spark, checkpoint_dir)
    loop_trunc = LineageTruncator(spark, checkpoint_dir)
    sym = pairs.select(
        F.col(id_a).alias("u"), F.col(id_b).alias("v")
    ).union(pairs.select(F.col(id_b).alias("u"), F.col(id_a).alias("v")))
    # Self-loops make "min over self" part of the same aggregate as "min
    # over neighbors" — one groupBy per round instead of a join + least().
    nodes = sym.select("u").distinct()  # sym is symmetric: u covers v too
    # Materialize the edge set ONCE: it is re-read every round (and pair
    # generators like minhash_lsh_pairs have expensive subtrees — without
    # this, each round re-runs the full LSH pipeline).
    edges = edge_trunc.truncate(
        sym.union(nodes.select("u", F.col("u").alias("v"))).distinct()
    )

    labels = edges.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    for _ in range(max_iters):
        plan = (
            edges.join(
                labels.select(F.col("node").alias("u"), "lbl"), on="u"
            )
            .groupBy(F.col("v").alias("node"))
            .agg(F.min("lbl").alias("new_lbl"))
            .join(labels, on="node")
            .select(
                "node",
                F.col("lbl").alias("old_lbl"),
                F.col("new_lbl").alias("lbl"),
            )
        )
        # The changed-label count doubles as the materializing action for
        # the round's lineage cut: one job per round. (A full count, never
        # limit(1) — every partition must compute for the cut to be whole.)
        nxt, changed = loop_trunc.truncate_with(
            plan,
            lambda d: d.filter(F.col("lbl") != F.col("old_lbl")).count(),
        )
        labels = nxt.select("node", "lbl")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components: no fixpoint in {max_iters} rounds"
        )

    sizes = labels.groupBy("lbl").agg(F.count("*").alias("cluster_size"))
    return (
        labels.join(sizes, on="lbl")
        .select(
            F.col("node").alias("member_id"),
            F.col("lbl").alias("cluster_id"),
            "cluster_size",
        )
    )
