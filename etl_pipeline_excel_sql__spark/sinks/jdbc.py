"""JDBC write-back sink — the bridge the reference never had.

The reference moves data in one direction only: SQL Server → Excel
(Download.py:78-86 reads over ODBC; every writer targets a workbook). A
real engine needs the return path — curated parquet/Excel results landing
back in a relational system — so this sink wraps ``df.write.jdbc`` with
the two semantics that matter operationally:

* ``mode="truncate"`` — keep the remote table's DDL (types, indexes,
  grants) and replace only the rows: Spark's ``overwrite`` +
  ``truncate=true`` path, falling back to DELETE-free recreate only if
  the dialect cannot truncate.
* ``mode="recreate"`` — drop and recreate from the DataFrame schema
  (Spark's plain ``overwrite``): the right call when the frame's shape
  IS the contract.
* ``mode="append"`` — plain inserts.

Writes run from the EXECUTORS, one connection per partition — a 1000-
partition frame opens 1000 connections unless bounded, so
``max_write_partitions`` (default 16) coalesces before the write; at
100 TB the bottleneck is the database's ingest path, never Spark. Use
``batchsize`` (JDBC option, default 1000 here) to keep round-trips
amortized.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

_MODES = ("append", "truncate", "recreate")


@dataclass
class JdbcSink:
    """Declarative JDBC sink mirroring ``sources.registry.JdbcSource``.

    ``options`` pass through to the DataFrameWriter (credentials,
    ``isolationLevel``, dialect-specific knobs) — never hardcoded.
    """

    url: str
    table: str
    options: dict[str, str] = field(default_factory=dict)
    batch_size: int = 1000
    max_write_partitions: int = 16

    def write(self, df: DataFrame, mode: str = "append") -> None:
        if mode not in _MODES:
            raise ValueError(
                f"JdbcSink.write: mode must be one of {_MODES}, got {mode!r}"
            )
        if self.max_write_partitions > 0:
            # coalesce, not repartition: bounding the connection count
            # must not add a shuffle in front of the write
            df = df.coalesce(self.max_write_partitions)
        writer = (
            df.write.format("jdbc")
            .option("url", self.url)
            .option("dbtable", self.table)
            .option("batchsize", str(self.batch_size))
        )
        if mode == "append":
            writer = writer.mode("append")
        elif mode == "truncate":
            writer = writer.mode("overwrite").option("truncate", "true")
        else:  # recreate
            writer = writer.mode("overwrite").option("truncate", "false")
        for k, v in self.options.items():
            writer = writer.option(k, v)
        writer.save()
