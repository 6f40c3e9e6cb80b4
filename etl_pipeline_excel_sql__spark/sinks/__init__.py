from etl_pipeline_excel_sql__spark.sinks.excel_writer import (
    CellGrid,
    write_header_matched,
    write_highlighted_diff,
    write_positional,
)

__all__ = [
    "CellGrid",
    "write_positional",
    "write_header_matched",
    "write_highlighted_diff",
]
