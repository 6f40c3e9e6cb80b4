"""Distributed sinks: partitioned parquet / csv / json writers.

The reference's only sink is a template workbook; a 100 TB engine also
needs real distributed sinks. These helpers encode the file-sizing
discipline that matters at scale:

* **partition columns** chosen low-cardinality (date, category) so
  partition pruning works on the read side without creating millions of
  tiny directories;
* **file sizing** via a pre-write ``repartition`` on the partition columns
  (plus optional salt) — the classic fix for the one-file-per-task ×
  per-partition explosion;
* **maxRecordsPerFile** as the hard ceiling so a skewed partition splits
  instead of producing a multi-GB file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_parquet_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    files_per_partition: int = 1,
    max_records_per_file: int = 5_000_000,
    mode: str = "overwrite",
) -> None:
    """Partitioned parquet write with controlled file counts.

    With ``partition_cols``, rows are first repartitioned on those columns
    (optionally salted to ``files_per_partition`` files each) so every
    output directory gets a small, predictable number of well-filled files
    instead of one shard per upstream task.
    """
    writer = df
    if partition_cols:
        if files_per_partition > 1:
            salt = (F.rand(seed=7) * files_per_partition).cast("int")
            writer = df.withColumn("__salt", salt).repartition(
                *[F.col(c) for c in partition_cols], F.col("__salt")
            ).drop("__salt")
        else:
            writer = df.repartition(*[F.col(c) for c in partition_cols])
        (
            writer.write.mode(mode)
            .option("maxRecordsPerFile", max_records_per_file)
            .partitionBy(*partition_cols)
            .parquet(path)
        )
    else:
        (
            df.write.mode(mode)
            .option("maxRecordsPerFile", max_records_per_file)
            .parquet(path)
        )


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def compact_parquet(
    spark,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 256 * 1024 * 1024,
) -> int:
    """Small-files compaction: rewrite a directory into ~target-sized files.

    Long-running ingestion (streaming sinks, frequent small batches) leaves
    thousands of tiny files that wreck scan planning at scale; compaction
    coalesces them based on the actual input byte size. Returns the file
    count written. Narrow ``coalesce`` — no shuffle.
    """
    import glob as _glob
    import os as _os

    total = sum(
        _os.path.getsize(p)
        for p in _glob.glob(f"{in_path}/**/*.parquet", recursive=True)
    )
    n_files = max(1, round(total / target_file_bytes))
    df = spark.read.parquet(in_path)
    df.coalesce(n_files).write.mode("overwrite").parquet(out_path)
    return n_files


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (columnar, stripe-statistics pushdown on read — the
    Hive-ecosystem sibling of the parquet path)."""
    df.write.mode(mode).orc(path)
