"""Table sources.

The reference's only scan is a full-table JDBC read of SQL Server
(``SELECT * FROM Working_Table_Uploadtest_V2`` — reference Download.py:78-86,
Upload.py:116-123) with the ministry filter applied *client-side afterwards*.
Here scans are declarative: the caller composes ``.filter``/``.select`` on the
returned DataFrame and Catalyst pushes predicates and column pruning into the
source (JDBC query rewrite, or parquet row-group/page pruning) — strictly
better than the reference's fetch-everything-then-filter at any scale.

For the test corpus the "database table" is parquet at ``$sf_dir``; the JDBC
path is the same API surface with options swapped.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to always broadcast in joins.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def corpus_fingerprint(sf_dir: str, table: str = "documents") -> tuple:
    """Cheap content-identity key for the corpus at ``sf_dir`` — the
    (path, mtime_ns, size) triples of the table's parquet file(s).

    Derived per-(process, sf) artifacts (the persisted Jaccard-truth
    parquet, the incremental cluster state, the resharded ring table,
    ADVICE r12) key their caches on this, not on ``sf_dir`` alone: if
    the corpus at the same path is REGENERATED in-process (e.g.
    ``gen_scaled_testdata`` then re-bench in one session), the
    fingerprint changes and the stale artifact is rebuilt instead of
    silently desyncing from the oracle, which reads the live files.
    """
    import pathlib

    p = pathlib.Path(sf_dir) / f"{table}.parquet"
    if p.is_dir():
        return tuple(
            (str(q.relative_to(p)), q.stat().st_mtime_ns, q.stat().st_size)
            for q in sorted(p.rglob("*"))
            if q.is_file()
        )
    st = p.stat()
    return (st.st_mtime_ns, st.st_size)


def scratch_dir(prefix: str) -> str:
    """``tempfile.mkdtemp`` with atexit removal — every per-(process, sf)
    derived-artifact dir (truth parquet, cluster state, ring table, bm25
    index) goes through here so nothing lingers past the process
    (ADVICE r12: the caches previously leaked their dirs for the
    machine's lifetime)."""
    import atexit
    import shutil
    import tempfile

    path = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


def ensure_session_confs(spark: SparkSession) -> None:
    """Pin the SQL confs our semantics depend on, whoever built the session.

    Queries may be invoked with an externally-created SparkSession (the
    verification driver does exactly that); these are runtime SQL confs, so
    setting them here is safe and idempotent:

    * ``nanosAsLong`` — events.ts is TIMESTAMP(NANOS) parquet, which the
      vectorized reader otherwise rejects outright;
    * UTC session timezone — timestamp→string rendering must not depend on
      the host timezone (the oracle renders naive/UTC).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to a plain TIMESTAMP whatever the physical
    parquet type happens to be in this environment.

    The corpus has shipped ``ts`` in (at least) three forms across
    environments: TIMESTAMP(NANOS) surfaced as raw-nanos ``bigint`` under
    ``nanosAsLong``, TIMESTAMP(MICROS) with ``isAdjustedToUTC=false``
    surfaced as ``timestamp_ntz``, and plain ``timestamp``. Branching on the
    *observed* dtype here — once, for every consumer (batch ``load_table``
    and the streaming source) — makes every downstream query dtype-agnostic.
    """
    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":
        # Raw nanos: truncate to micros with integer division (`div` — float
        # division would lose precision above 2**53).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dtype == "timestamp_ntz":
        # Session timezone is pinned UTC (ensure_session_confs), so the NTZ
        # wall-clock values and the UTC instants are identical.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Load one corpus table as a DataFrame (lazy parquet scan)."""
    ensure_session_confs(spark)
    d = sf_dir or DEFAULT_SF_DIR
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(f"{d}/{name}.parquet")
    if name == "events":
        df = normalize_events_ts(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {t: load_table(spark, t, sf_dir) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every corpus table as a temp view for ``spark.sql`` use."""
    for t, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(t)


@dataclass(frozen=True)
class JdbcSource:
    """Declarative JDBC source (reference Download.py:78-86 semantics).

    The reference hardcodes a SQL Server DSN and pulls the whole table over
    ODBC before filtering. This source instead:

    * pushes filters/projections into the remote query (Catalyst JDBC
      pushdown);
    * reads in parallel via ``partitionColumn``/``numPartitions`` so a large
      table lands as N concurrent range scans instead of one cursor;
    * leaves credentials to options, never code.
    """

    url: str
    table: str
    options: dict[str, str] = field(default_factory=dict)
    partition_column: str | None = None
    num_partitions: int | None = None
    lower_bound: int | None = None
    upper_bound: int | None = None

    def load(self, spark: SparkSession) -> DataFrame:
        reader = (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", self.table)
        )
        if self.partition_column is not None:
            reader = (
                reader.option("partitionColumn", self.partition_column)
                .option("numPartitions", str(self.num_partitions or 8))
                .option("lowerBound", str(self.lower_bound or 0))
                .option("upperBound", str(self.upper_bound or 1_000_000))
            )
        for k, v in self.options.items():
            reader = reader.option(k, v)
        return reader.load()


#: File formats the generic path loader accepts. All are Spark built-ins
#: (no extra packages); each supports predicate pushdown to a different
#: degree — parquet/orc prune row groups/stripes by statistics, csv/json
#: only skip whole files via partition pruning.
FILE_FORMATS = ("parquet", "orc", "csv", "json")


def load_path(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    **options: str,
) -> DataFrame:
    """Load a file-based table of any supported format (lazy scan).

    ``schema`` is REQUIRED for csv/json: without one, Spark runs a full
    inference scan over the data before the real query — at 100 TB that
    is a second pass over the corpus, and inferred types silently drift
    with content (an all-digits id column becomes bigint in one
    ingestion and string in the next). Columnar formats carry their own
    schema, so it stays optional there. CSV defaults to header=true
    (override via options).

    A JSONL document corpus — the most common LLM-corpus interchange
    format — is exactly ``load_path(spark, p, "json", schema=...)``;
    round-trip covered in tests/test_sources_sinks.py.
    """
    ensure_session_confs(spark)
    if fmt not in FILE_FORMATS:
        raise ValueError(
            f"load_path: fmt must be one of {FILE_FORMATS}, got {fmt!r}"
        )
    if fmt in ("csv", "json") and schema is None:
        raise ValueError(
            f"load_path: {fmt} requires an explicit schema — inference "
            "scans the whole input once before the query and drifts with "
            "content"
        )
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", options.pop("header", "true"))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)
