"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship Download-pipeline query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full named-query registry from
``etl_pipeline_excel_sql__spark.plans`` (one entry per implemented operator
from SURVEY.md §2 plus the engine's analytics / training-data extensions).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from etl_pipeline_excel_sql__spark.plans import ORACLE, QUERIES  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["download_pipeline"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    Every computed column is aliased identically to its ``oracle_sql`` twin.
    """
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (same column names)."""
    return dict(ORACLE)
