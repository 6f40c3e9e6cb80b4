"""Named query registry: every operator from SURVEY.md §2 plus the engine's
analytics/training-data extensions, each paired with an ANSI-SQL oracle.

``QUERIES[name](spark, sf_dir) -> DataFrame`` and ``ORACLE[name] -> str`` are
what ``__spark_entry__.py`` exposes to the driver's correctness harness.
"""

from etl_pipeline_excel_sql__spark.plans import (
    analytics_queries,
    extended_queries,
    pipeline_queries,
    reference_queries,
)

QUERIES = {
    **reference_queries.QUERIES,
    **analytics_queries.QUERIES,
    **pipeline_queries.QUERIES,
    **extended_queries.QUERIES,
}

ORACLE = {
    **reference_queries.ORACLE,
    **analytics_queries.ORACLE,
    **pipeline_queries.ORACLE,
    **extended_queries.ORACLE,
}

# Every oracle key must have a query; queries without an oracle get the
# driver's weaker rows-only check (documented per query).
assert set(ORACLE) <= set(QUERIES), sorted(set(ORACLE) - set(QUERIES))
