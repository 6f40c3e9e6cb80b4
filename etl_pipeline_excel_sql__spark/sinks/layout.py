"""Multi-dimensional data layout: Z-order-clustered parquet writes.

``write_zordered`` range-partitions the frame on its Z-order key and
sorts within each partition, so every output file covers a contiguous
Z-range — a small rectangle in (a, b) space — and parquet min/max
footer statistics prune files for range predicates on EITHER dimension
(the Delta/Iceberg ``ZORDER BY`` layout, expressed with stock Spark
writers). A single-column sort gives the same pruning on that column
and none on the other; the measurement in ``tests/test_zorder.py``
quantifies the difference from the actual written footers.

Scale shape: one range shuffle (sampled boundaries) + per-partition
sort — exactly what a tuned manual ``ORDER BY`` export costs; no
driver-side anything. ``n_files`` controls file granularity: more
files = finer pruning rectangles = more footer reads per query; the
usual 100 MB-1 GB file-size guidance applies unchanged at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_pipeline_excel_sql__spark.functions.zorder import (
    ZORDER_BITS,
    zorder_key,
)


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: Column | str,
    col_b: Column | str,
    n_files: int,
    bits: int = ZORDER_BITS,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the
    Z-order key of (``col_a``, ``col_b``) — both must be non-negative
    integer Columns/names already quantized to the ``bits`` budget."""
    a = F.col(col_a) if isinstance(col_a, str) else col_a
    b = F.col(col_b) if isinstance(col_b, str) else col_b
    keyed = df.withColumn("__zkey", zorder_key(a, b, bits))
    (
        keyed.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
