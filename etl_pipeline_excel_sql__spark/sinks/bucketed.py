"""Bucketed tables: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of a fact-to-fact join is the shuffle. Bucketing
pays that shuffle once at write time: both tables are hash-partitioned into
the same number of buckets on the join key, so every subsequent join (or
aggregation) on that key is a zero-exchange zip of matching buckets.
``tests/test_bucketed.py`` asserts the bucketed join plan contains no
Exchange while the plain-parquet twin does.

This is the storage-layout complement to runtime choices (broadcast for
dims, AQE for skew): use it for the handful of giant tables that join each
other repeatedly on a stable key — e.g. orders ⋈ lineitem on the order key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed (optionally sorted) managed table.

    Sorting within buckets additionally enables merge-join without a sort
    step and better min/max skipping.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — no exchange."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
