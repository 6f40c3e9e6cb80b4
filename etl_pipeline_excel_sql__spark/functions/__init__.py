from etl_pipeline_excel_sql__spark.functions.cleaning import (
    date_reformat,
    null_literal_to_null,
    percent_format,
    to_str,
)
from etl_pipeline_excel_sql__spark.functions.normalize import (
    norm_header,
    normalize_colname,
    safe_fname_token,
)

__all__ = [
    "date_reformat",
    "null_literal_to_null",
    "percent_format",
    "to_str",
    "norm_header",
    "normalize_colname",
    "safe_fname_token",
]
