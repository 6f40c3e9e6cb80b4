"""SparkSession factory with scale-aware defaults.

Local runs use ``local[$SPARK_GRAFT_CPUS]`` (default all cores); the same
config block is what we would ship to a 1000-executor cluster — only
``master`` and the shuffle-partition count change (cluster deployments size
``spark.sql.shuffle.partitions`` ≈ 2-3× total cores and rely on AQE
coalescing, which is enabled here).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_APP_NAME = "etl_pipeline_excel_sql__spark"


def default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus:
        return int(cpus)
    return os.cpu_count() or 8


def get_session(
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Defaults chosen for 100 TB readiness, not just local convenience:

    * **AQE on** (runtime coalesce + skew-join splitting) — at scale the
      static partition count is always wrong somewhere; AQE re-plans from
      actual map output sizes.
    * **UTC session timezone** — deterministic timestamp semantics across
      drivers/executors and vs. the DuckDB oracle.
    * **Arrow on** — any residual driver transfer (template-scale sinks,
      ``toPandas``) and all Pandas UDFs move columnar, not pickled rows.
    * **Broadcast threshold 64 MB** — dimension tables (region/nation/
      customer-slices) broadcast instead of shuffling the fact table.
    """
    par = default_parallelism()
    builder = (
        SparkSession.builder.appName(_APP_NAME)
        .master(master or f"local[{par}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or par))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        # TIMESTAMP(NANOS) parquet (events.ts) arrives as raw nano longs;
        # sources/registry.py converts to microsecond timestamps explicitly.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # local[N] runs the executor inside the driver JVM: size it for 32
        # concurrent tasks over wide array columns, or full-GC storms make
        # run times bimodal (87s outliers on a 5s query at 8g were traced
        # to exactly this).
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
