"""Exact distributed quantiles without a global sort.

``row_number() OVER (ORDER BY value)`` funnels the whole table through
one task, and ``percentile``/``approx_percentile`` either sort or give
up exactness. This is the two-phase order-statistic locate:

1. **Bucket pass** — one map-side-combinable aggregate keyed on a
   MONOTONE bucket of the value (``floor(value / width)``): counts per
   bucket, prefix-summed by a window over the BUCKET TABLE (thousands
   of rows, never the corpus).
2. **Locate + resolve** — each requested rank falls in exactly one
   bucket with a known local rank; a second pass filters the corpus to
   just the needed buckets (a pushed-down range predicate on the scan)
   and ranks within them — per-bucket populations are ~n/n_buckets, so
   the window partitions stay small at any scale.

Exactness: the bucket is a monotone function of the value, so ties of
equal values never straddle buckets, and the within-bucket order
``(value, *tiebreak)`` extends to the same global order the naive
single-partition window would produce — which is exactly what the
DuckDB oracle runs. The selected rank is 1-based
``greatest(1, ceil(p·n/100))`` (the discrete lower quantile).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from etl_pipeline_excel_sql__spark.functions.localframe import local_df


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    tiebreak_cols: list[str],
    pcts: list[int],
    bucket_width: float,
) -> DataFrame:
    """``(pct, rank, value)`` for each requested percentile — the exact
    element at 1-based rank ``greatest(1, ceil(pct*n/100))`` under
    ``ORDER BY (value, *tiebreak_cols)``, located via the two-phase
    bucket plan (module doctrine). ``bucket_width`` sizes phase 1's
    aggregate: aim for 1e3–1e6 buckets — big enough to spread phase 2,
    small enough that the bucket table is a trivial window."""
    if not pcts or any(p < 1 or p > 100 for p in pcts):
        raise ValueError("exact_quantiles: pcts must be within [1, 100]")
    spark = df.sparkSession
    v = F.col(value_col)
    bucketed = df.select(
        v.alias("__v"),
        *[F.col(c) for c in tiebreak_cols],
        F.floor(v / F.lit(bucket_width)).cast("bigint").alias("__b"),
    )
    counts = bucketed.groupBy("__b").agg(F.count(F.lit(1)).alias("__c"))
    wcum = Window.orderBy("__b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = counts.select(
        "__b",
        "__c",
        F.sum("__c").over(wcum).alias("__cum"),
    )
    n_row = counts.agg(F.sum("__c").alias("__n"))
    pcts_df = local_df(spark, [(p,) for p in pcts], "pct INT")
    # rank per pct — pcts × 1 rows, broadcast-scale by construction
    ranks = pcts_df.crossJoin(F.broadcast(n_row)).select(
        "pct",
        F.expr(
            "greatest(CAST(1 AS BIGINT),"
            " CAST(ceil(pct * __n / 100.0) AS BIGINT))"
        ).alias("rank"),
    )
    # locate: the first bucket whose cumulative count reaches the rank;
    # local rank = rank - (cum - bucket count)
    located = (
        ranks.join(
            F.broadcast(cum),
            (F.col("__cum") >= F.col("rank"))
            & (F.col("__cum") - F.col("__c") < F.col("rank")),
        )
        .select(
            "pct",
            "rank",
            "__b",
            (F.col("rank") - (F.col("__cum") - F.col("__c"))).alias(
                "__local"
            ),
        )
    )
    # resolve: rank within just the needed buckets (pushed-down range
    # predicate via the semi-joinable bucket list)
    wloc = Window.partitionBy("__b").orderBy(
        F.col("__v").asc(), *[F.col(c).asc() for c in tiebreak_cols]
    )
    in_bucket = bucketed.join(
        F.broadcast(located.select("__b").distinct()), "__b"
    ).select("__b", "__v", F.row_number().over(wloc).alias("__r"))
    return (
        located.join(
            in_bucket,
            (located["__b"] == in_bucket["__b"])
            & (F.col("__local") == F.col("__r")),
        )
        .select("pct", "rank", F.col("__v").alias("value"))
    )
