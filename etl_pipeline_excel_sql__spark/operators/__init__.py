from etl_pipeline_excel_sql__spark.operators.diff import snapshot_diff, word_diff
from etl_pipeline_excel_sql__spark.operators.ordering import categorical_order
from etl_pipeline_excel_sql__spark.operators.reconcile import (
    ReconcileResult,
    reconcile_schema,
)

__all__ = [
    "snapshot_diff",
    "word_diff",
    "categorical_order",
    "ReconcileResult",
    "reconcile_schema",
]
