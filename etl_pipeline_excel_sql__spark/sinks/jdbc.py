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
``max_write_partitions`` (default 16) bounds parallelism before the
write; at 100 TB the bottleneck is the database's ingest path, never
Spark. Use ``batchsize`` (JDBC option, default 1000 here) to keep
round-trips amortized.

The bound has a classic trade-off. ``coalesce`` (default) avoids a
shuffle, but it does NOT insert a stage boundary — it propagates UP the
plan, so everything upstream of the write (a wide aggregation, an
expensive join) also runs at ≤``max_write_partitions`` tasks. That is
fine when the upstream is cheap or already narrow; for an expensive
upstream plan set ``shuffle_before_write=True`` to use ``repartition``
instead — one extra shuffle of the (database-ingest-sized, therefore
small) result buys full upstream parallelism. Persisting the frame
before ``write`` achieves the same decoupling when the caller already
materializes it for other reasons.
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
    #: False (default): ``coalesce`` — no shuffle, but upstream stages
    #: collapse to ``max_write_partitions`` tasks. True: ``repartition``
    #: — one extra shuffle of the final rows, upstream keeps its
    #: parallelism. See the module docstring for when each wins.
    shuffle_before_write: bool = False

    def bounded(self, df: DataFrame) -> DataFrame:
        """The connection-bounding step ``write`` actually executes —
        public so tests can assert the real plan (repartition Exchange vs
        upstream-collapsing coalesce) instead of reconstructing it."""
        if self.max_write_partitions <= 0:
            return df
        bound = df.repartition if self.shuffle_before_write else df.coalesce
        return bound(self.max_write_partitions)

    def write(self, df: DataFrame, mode: str = "append") -> None:
        if mode not in _MODES:
            raise ValueError(
                f"JdbcSink.write: mode must be one of {_MODES}, got {mode!r}"
            )
        df = self.bounded(df)
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
