"""Structured Streaming pipelines over the ``events`` table.

The reference has no streaming surface (SURVEY.md §2.12); these are the
engine-side extensions: watermarked tumbling-window aggregation and
gap-based sessionization, written so the batch twins in
plans/analytics_queries.py (``window_agg_events``, ``sessionize``) compute
identical results — the streaming tests assert exactly that equivalence
with ``availableNow`` triggers.

Scale notes: state size is bounded by the watermark horizon; the window agg
keys state by (window, event_type), sessionization by session_window merge
state per user. Both shuffle once on their grouping key, same as batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Synthetic-input schema used by the state/watermark unit tests, which
#: construct raw-nanos long inputs by hand. The real corpus stream source
#: (``read_events_stream``) does NOT assume this shape — it infers the
#: on-disk schema from a batch read and normalizes via
#: ``sources.registry.normalize_events_ts``.
EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # raw nanos (TIMESTAMP(NANOS) parquet)
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (one file = one batch with
    ``availableNow``; a production deployment points this at a Kafka topic
    or a landing directory — everything downstream is identical).

    The stream schema is taken from a batch read of the same file so the
    ``ts`` physical type (raw-nanos long / timestamp_ntz / timestamp —
    it has varied across environments) is whatever is actually on disk,
    then normalized by the same dtype-dispatching logic the batch path
    uses. The batch read here is schema-only: no data job runs.
    """
    from etl_pipeline_excel_sql__spark.sources.registry import (
        ensure_session_confs,
        normalize_events_ts,
    )

    ensure_session_confs(spark)
    events_path = f"{sf_dir}/events.parquet"
    on_disk_schema = spark.read.parquet(events_path).schema
    # The file stream source requires a directory. The driver corpus
    # keeps ONE parquet file per table, so we stream the sf dir with a
    # pathGlobFilter narrowing to that file name; Spark-written corpora
    # (e.g. the generated .localdata/sf1) store events.parquet as a
    # DIRECTORY of part-*.parquet files — the glob would match nothing
    # (it filters file names, not directory names), so stream the
    # directory itself.
    import os

    reader = spark.readStream.schema(on_disk_schema).format("parquet")
    if os.path.isdir(events_path):
        raw = reader.load(events_path)
    else:
        raw = reader.option("pathGlobFilter", "events.parquet").load(sf_dir)
    return normalize_events_ts(raw)


def windowed_counts_stream(
    events: DataFrame, watermark: str = "1 hour", window: str = "1 hour"
) -> DataFrame:
    """Watermarked tumbling-window counts/sums by event type.

    Late rows beyond the watermark are dropped and their state evicted —
    bounded state at any input rate. Output matches the batch
    ``window_agg_events`` query on the same (complete) input.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # Cross-engine float parity: a double SUM accumulates in
            # partition order and differs in the last ulps run-to-run and
            # engine-to-engine; summing as decimal is associative (exact),
            # and the decimal→string→double render parses to the same
            # double on Spark and DuckDB. Do not "simplify" this chain —
            # it is what makes the value hash deterministic.
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("decimal(38,6)")
            .cast("string")
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize_stream(
    events: DataFrame,
    gap: str = "30 minutes 1 microsecond",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based sessionization with ``session_window`` (merging state).

    Equivalent to the batch lag/cumsum sessionization for a complete input:
    both split a user's event sequence at >gap silences. The default gap
    carries a 1 µs pad because the two formulations disagree at EXACTLY the
    gap boundary: the batch rule (``diff > 30min`` starts a session) keeps
    a 30:00.000000 silence in-session, while ``session_window``'s window is
    the half-open ``[start, start+gap)`` and would split it. With
    microsecond-resolution timestamps, ``diff < 30min + 1µs`` and
    ``diff <= 30min`` are identical predicates, so the pad makes the
    streaming and batch sessionizations equivalent for every input rather
    than merely for inputs with no exact-boundary silences.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        )
        .select("user_id", "n_events", "session_start", "session_end")
    )


def enrich_stream(events: DataFrame, dim: DataFrame, key: str) -> DataFrame:
    """Stream-static enrichment join.

    The static side is re-read per micro-batch and broadcast (dimension-
    sized); no state is kept, so this composes freely with downstream
    watermarked aggregations.
    """
    return events.join(F.broadcast(dim), on=key, how="left")


def stream_state_partitions() -> int:
    """Shuffle/state-store partition count for STATEFUL streams, sized
    to STATE, not to cores (round 14, guide §2; r13 verdict #4).

    A stateful streaming query fixes its state-store partition count at
    the first micro-batch (it is baked into the checkpoint), so it is a
    DESIGN parameter to choose per stream, not a runtime knob: one state
    store instance per partition per stateful operator runs every
    micro-batch whether or not it holds keys. Defaulting it to the core
    count (32 locally) made each micro-batch of the drains pay 32 state
    store tasks over a watermark-horizon working set of a few thousand
    keys — the r13 scaling probe measured ``stream_join_left`` 3×
    FASTER at 8 cores than 32 for exactly this reason. The default (8)
    matches the measured working set of the bounded event drains; a
    production deployment sizes it to expected state rows / target
    state-per-partition via ``SPARK_GRAFT_STREAM_SHUFFLE`` (e.g.
    hundreds for a multi-GB state) — it is a data-shape parameter, so
    there is deliberately NO scaling with local core count.
    """
    import os

    return int(os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE", "8"))


class _stream_shuffle_conf:
    """Scope ``spark.sql.shuffle.partitions`` around a stream START so
    the stream plans its state stores with the state-sized count while
    batch queries keep the session default. The conf only matters at
    planning time (the count is then pinned by the checkpoint), so
    restoring it immediately after ``start()`` is safe."""

    def __init__(self, spark: SparkSession) -> None:
        self._spark = spark

    def __enter__(self):
        self._prior = self._spark.conf.get("spark.sql.shuffle.partitions")
        self._spark.conf.set(
            "spark.sql.shuffle.partitions", str(stream_state_partitions())
        )
        return self

    def __exit__(self, *exc):
        self._spark.conf.set("spark.sql.shuffle.partitions", self._prior)
        return False


def run_to_memory_sink(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drain a (bounded) stream with availableNow into an in-memory table and
    return it as a batch DataFrame — the streaming tests' harness."""
    spark = stream_df.sparkSession
    with _stream_shuffle_conf(spark):
        q = (
            stream_df.writeStream.format("memory")
            .queryName(query_name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination()
    return spark.table(query_name)


def run_with_state_metrics(
    stream_df: DataFrame, query_name: str, output_mode: str = "update"
) -> tuple[DataFrame, list[dict]]:
    """Like :func:`run_to_memory_sink`, but also return the per-micro-batch
    ``stateOperators`` metric dicts from ``StreamingQueryProgress``.

    This is how SCALING.md's "bounded state" claims become measured
    numbers instead of prose: the caller asserts ``numRowsTotal`` at the
    final batch stays at the watermark-horizon working set (not the
    all-time key count) and that ``numRowsRemoved`` is non-zero once the
    watermark passes old state. Works with any state store provider —
    the metrics come from the progress API, not provider internals.

    ``recentProgress`` is a ring buffer (default 100 entries) that would
    silently drop early micro-batches of a long availableNow drain —
    undercounting removal sums and hiding early state spikes — so the
    buffer is widened before the query starts; sources producing beyond
    even that need a StreamingQueryListener instead.
    """
    spark = stream_df.sparkSession
    _KEY = "spark.sql.streaming.numRecentProgressUpdates"
    prior = spark.conf.get(_KEY, None)
    spark.conf.set(_KEY, "10000")
    try:
        with _stream_shuffle_conf(spark):
            q = (
                stream_df.writeStream.format("memory")
                .queryName(query_name)
                .outputMode(output_mode)
                .trigger(availableNow=True)
                .start()
            )
        q.awaitTermination()
        state_metrics = [
            dict(op)
            for p in q.recentProgress
            for op in (p.stateOperators or [])
        ]
    finally:
        # The widened ring buffer is a per-query need, not a session
        # policy — restore so later queries on the shared session keep
        # their own progress-retention setting.
        if prior is None:
            spark.conf.unset(_KEY)
        else:
            spark.conf.set(_KEY, prior)
    return stream_df.sparkSession.table(query_name), state_metrics


def running_user_totals_stream(
    events: DataFrame, state_timeout_ms: int = 0, exact_micros: bool = False
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``:
    per-user lifetime event count and value sum, emitted on every update.

    This is the escape hatch for stateful semantics the built-in windowed
    aggregations can't express (cross-batch running totals, custom
    eviction). State is one tiny row per user; batches arrive as Arrow
    pandas frames. ``state_timeout_ms > 0`` arms a processing-time
    timeout per user: a user idle past the timeout has its state row
    REMOVED (bounding state by active users, not all-time users) and
    starts from zero on its next event; 0 keeps state forever.

    ``exact_micros=True`` switches the sum to FLOOR-quantized integer
    micro-units (``floor(v * 1e6 + 0.5)`` per row, int64 accumulation) and
    renames it ``total_value_micros`` — a float sum depends on Arrow batch
    row order and can never be value-hash-gated; integer addition is
    associative, so the quantized total is bit-identical to any batch
    engine applying the same per-row formula.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    val_field = (
        StructField("total_value_micros", LongType())
        if exact_micros
        else StructField("total_value", DoubleType())
    )
    output_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            val_field,
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField(
                "s", LongType() if exact_micros else DoubleType()
            ),
        ]
    )

    def update(key, pdfs, state: "GroupState"):
        import numpy as np
        import pandas as pd

        if state_timeout_ms > 0 and state.hasTimedOut:
            # idle past the timeout: evict the state row; the user's
            # totals restart from zero on its next event
            state.remove()
            return
        n, s = state.get if state.exists else (0, 0 if exact_micros else 0.0)
        for pdf in pdfs:
            n += len(pdf)
            if exact_micros:
                v = pdf["value"].to_numpy(dtype="float64")
                s += int(
                    np.floor(v * 1e6 + 0.5).astype("int64").sum()
                )
            else:
                s += float(pdf["value"].sum())
        state.update((n, s))
        if state_timeout_ms > 0:
            state.setTimeoutDuration(state_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                (
                    "total_value_micros" if exact_micros else "total_value"
                ): [s],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if state_timeout_ms > 0
            else GroupStateTimeout.NoTimeout
        ),
    )


def dedup_events_stream(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming exact dedup: first occurrence of each ``event_id`` wins;
    re-deliveries inside the watermark horizon are dropped statefully.

    ``dropDuplicatesWithinWatermark`` keys state by event_id and evicts
    entries once the watermark passes them — bounded state for at-least-
    once sources (Kafka replays, file re-lands), the streaming twin of the
    batch ``exact_dedup``/``dedup_lastwins`` operators. State carries only
    the key and its watermark timestamp, never the payload.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def sliding_counts_stream(
    events: DataFrame,
    watermark: str = "1 hour",
    window: str = "2 hours",
    slide: str = "1 hour",
) -> DataFrame:
    """Watermarked sliding-window counts by event type.

    Each event contributes to window/slide overlapping windows; state per
    open window is evicted at the watermark exactly as in the tumbling
    case. The batch twin is a groupBy over the same ``F.window`` columns —
    the streaming test asserts equality on complete input.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
        )
    )


def m4_downsample_stream(
    events: DataFrame, watermark: str = "1 hour", window: str = "1 hour"
) -> DataFrame:
    """Watermarked M4 downsampling: (min, max, first, last) per
    (event_type, hour window) BY THE STREAMING ENGINE.

    first/last are ``min_by``/``max_by`` over the (epoch-micros,
    event_id) total order — declarative aggregates, so the streaming
    state per open window is four scalars + two ordering keys, merged
    associatively across micro-batches exactly like the batch partials.
    ``F.window`` buckets align to epoch hours, the same cells as the
    batch twin's ``tus div HOUR_US``.
    """
    key = F.struct(F.unix_micros(F.col("ts")).alias("tus"), F.col("event_id"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
            F.min_by("value", key).alias("v_first"),
            F.max_by("value", key).alias("v_last"),
        )
        .select(
            "event_type",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "bucket_start"
            ),
            "n_points",
            "v_min",
            "v_max",
            "v_first",
            "v_last",
        )
    )


def purchase_attribution_stream(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "2 hours",
    watermark: str = "4 hours",
) -> DataFrame:
    """Stream-stream interval join: purchases attributed to a prior click
    by the same user within ``horizon``.

    Both inputs are watermarked so the join state is bounded: a buffered
    click can be evicted once the purchase-side watermark passes
    ``click.ts + horizon``. The time-range predicate makes this an
    interval join — Spark keys state by user and prunes per the range.
    Inner join only here; outer stream-stream joins emit nulls at
    watermark expiry with the same state bounds.
    """
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", watermark)
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")
        ),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_time"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias(
            "purchase_time"
        ),
        "purchase_value",
    )


def hll_users_stream(
    events: DataFrame, watermark: str = "1 hour", window: str = "1 hour"
) -> DataFrame:
    """Per-window distinct-user HLL BY THE STREAMING ENGINE — the
    sketch as bounded streaming state.

    ``COUNT(DISTINCT)`` is unsupported in streaming for the same reason
    it hurts at batch scale (per-window state grows with cardinality);
    the HLL register table is the fix: constant HLL_M-sized state per
    window regardless of user count. Chained stateful aggregations are
    restricted in streaming, so the registers live as ONE watermarked
    aggregation with HLL_M conditional MAX columns (register j =
    ``max(rho) FILTER (reg = j)``), folded to the estimate by stateless
    projection — same integer arithmetic as the batch sketch
    (operators/sketches.py), so the drained result hash-matches the
    DuckDB replay exactly.
    """
    import functools
    import operator as _op

    from etl_pipeline_excel_sql__spark.functions.hashing import md5_hash60
    from etl_pipeline_excel_sql__spark.operators.sketches import (
        HLL_ALPHA_DEN,
        HLL_ALPHA_NUM,
        HLL_M,
        HLL_RHO_SCALE,
        _rho,
    )

    hs = events.select(
        "ts", md5_hash60(F.col("user_id").cast("string")).alias("__h")
    )
    keyed = hs.select(
        "ts",
        (F.col("__h") % HLL_M).alias("reg"),
        _rho(F.expr(f"__h DIV {HLL_M}")).alias("rho"),
    )
    regs = (
        keyed.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(
            *[
                F.max(F.when(F.col("reg") == j, F.col("rho"))).alias(
                    f"r{j}"
                )
                for j in range(HLL_M)
            ]
        )
    )
    contribs = [
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), {HLL_RHO_SCALE}"
            f" - least(coalesce(r{j}, 0), {HLL_RHO_SCALE}))"
        )
        for j in range(HLL_M)
    ]
    zeros = [
        (F.coalesce(F.col(f"r{j}"), F.lit(0)) == 0).cast("int")
        for j in range(HLL_M)
    ]
    numer = HLL_ALPHA_NUM * HLL_M * HLL_M * (1 << HLL_RHO_SCALE)
    return regs.select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        ),
        functools.reduce(_op.add, zeros).alias("v_zero"),
        functools.reduce(_op.add, contribs).alias("sum_scaled"),
    ).withColumn(
        "est_distinct",
        F.expr(
            f"CAST({numer} DIV ({HLL_ALPHA_DEN} * sum_scaled) AS BIGINT)"
        ),
    )


def cms_cells_stream(
    events: DataFrame, watermark: str = "1 hour", window: str = "1 hour"
) -> DataFrame:
    """Per-window Count-Min cells BY THE STREAMING ENGINE — the
    frequency sketch as bounded streaming state, the CMS twin of
    ``hll_users_stream``.

    Exact per-key frequency state grows with key cardinality; the CMS
    cell table is the fix: the stateful aggregation keys on
    ``(window, row, col)``, so state is at most d·w = CMS_D·CMS_W cells
    per window no matter how many users the stream sees. ONE watermarked
    aggregation (chained stateful aggs are restricted); point-query
    probing (min over the d cells) is a stateless batch step over the
    drained cells — see ``plans/streaming_queries.q_stream_cms_users``.
    Same seeded integer hashes as the batch sketch
    (operators/sketches.py), so the drained cells hash-match the DuckDB
    replay exactly.
    """
    from etl_pipeline_excel_sql__spark.operators.sketches import (
        CMS_D,
        CMS_W,
        _cms_col,
    )

    cells = events.select(
        "ts",
        F.posexplode(
            F.array(
                *[
                    _cms_col(F.col("user_id").cast("string"), j, CMS_W)
                    for j in range(CMS_D)
                ]
            )
        ).alias("row", "col"),
    )
    return (
        cells.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "row",
            "col",
            "cnt",
        )
    )


def left_attribution_stream(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "2 hours",
    watermark: str = "4 hours",
) -> DataFrame:
    """LEFT-OUTER stream-stream interval join: every click, attributed
    to a purchase within ``horizon`` when one exists, emitted with NULL
    purchase columns when none arrives — the state-timeout semantics
    :func:`purchase_attribution_stream` (inner) does not exercise.

    The engine buffers an unmatched click until the purchase-side
    watermark proves no future match is possible (``click_ts + horizon``
    behind the watermark), THEN emits the null row — so outer results
    near the end of a bounded drain are withheld by construction (the
    watermark never advances past the final events). Callers comparing
    against a batch twin must restrict BOTH sides to clicks older than
    ``max_ts − watermark − horizon`` (plus a safety margin): see
    ``q_stream_join_left``. State stays bounded exactly as in the inner
    join; the outer behavior only changes what is emitted at eviction.
    Emits the raw ``click_ts`` alongside the formatted time so the
    settle cutoff can filter the drained result.
    """
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", watermark)
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")
        ),
        "leftOuter",
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "click_ts",
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_time"),
        "purchase_id",
        "purchase_value",
    )
