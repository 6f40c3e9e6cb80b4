"""Round-3 analytics widening: sliding windows, exact discrete percentiles,
histogram binning.

Numeric-determinism rules (the driver hash-compares against DuckDB):

* percentiles are DISCRETE — the query SELECTS an existing double value by
  rank position instead of interpolating, so no float arithmetic can differ
  between engines;
* histogram buckets use explicit ``FLOOR`` — Spark's double→bigint CAST
  truncates while DuckDB's rounds half-even, so a bare CAST is an
  engine-dependent trap; ``FLOOR(x / width)`` is IEEE-identical on both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_excel_sql__spark.sources.registry import load_table


def q_window_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window counts (2 h window, 1 h slide) by event type — each
    event lands in exactly two overlapping windows. Batch twin of
    ``streaming/events.sliding_counts_stream``; one shuffle on the grouping
    key, Spark expands the window memberships map-side."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
        )
    )


def q_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles (p25/p50/p75/p90) of order value per
    priority class.

    Rank positions are computed with integer ceiling arithmetic
    (``(n*q + 99) DIV 100``) and the value AT that rank is selected — one
    window sort, then a conditional max per target rank folds the group to
    a single row. Scales as one shuffle + one partial-aggregated groupBy;
    no collect, no interpolation.
    """
    o = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    wn = Window.partitionBy("o_orderpriority")
    ranked = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    picks = [
        F.max(
            F.when(
                F.col("rn") == F.expr(f"(n * {q} + 99) DIV 100"),
                F.col("o_totalprice"),
            )
        ).alias(f"p{q}")
        for q in (25, 50, 75, 90)
    ]
    return ranked.groupBy("o_orderpriority").agg(
        F.max("n").alias("n_orders"), *picks
    )


def q_histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order values ($50k buckets): bucket ordinal,
    inclusive lower bound, count. Pure map-side bucket expression + one
    partial-aggregated groupBy — the canonical distributed histogram."""
    o = load_table(spark, "orders", sf_dir)
    bucket = F.expr("CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT)")
    return (
        o.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            "bucket",
            (F.col("bucket") * F.lit(50000)).cast("bigint").alias("bucket_lo"),
            "n_orders",
        )
    )


ORACLE: dict[str, str] = {
    # every event belongs to the two hour-aligned starts covering it
    "window_sliding_counts": """
        SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type,
               COUNT(*) AS n_events
        FROM (
          SELECT event_type,
                 time_bucket(INTERVAL 1 HOUR, ts)
                   - INTERVAL 1 HOUR * off AS ws
          FROM events
          CROSS JOIN (SELECT unnest([0, 1]) AS off) offs
        )
        GROUP BY 1, 2""",
    "percentile_disc": """
        WITH ranked AS (
          SELECT o_orderpriority, o_totalprice,
                 row_number() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice, o_orderkey) AS rn,
                 COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
          FROM orders
        )
        SELECT o_orderpriority,
               MAX(n) AS n_orders,
               MAX(CASE WHEN rn = (n * 25 + 99) // 100
                        THEN o_totalprice END) AS p25,
               MAX(CASE WHEN rn = (n * 50 + 99) // 100
                        THEN o_totalprice END) AS p50,
               MAX(CASE WHEN rn = (n * 75 + 99) // 100
                        THEN o_totalprice END) AS p75,
               MAX(CASE WHEN rn = (n * 90 + 99) // 100
                        THEN o_totalprice END) AS p90
        FROM ranked GROUP BY o_orderpriority""",
    "histogram_totalprice": """
        SELECT bucket,
               CAST(bucket * 50000 AS BIGINT) AS bucket_lo,
               COUNT(*) AS n_orders
        FROM (SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bucket
              FROM orders)
        GROUP BY bucket""",
}

QUERIES = {
    "window_sliding_counts": q_window_sliding_counts,
    "percentile_disc": q_percentile_disc,
    "histogram_totalprice": q_histogram_totalprice,
}
