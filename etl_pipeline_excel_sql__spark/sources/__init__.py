from etl_pipeline_excel_sql__spark.sources.registry import (
    TABLES,
    JdbcSource,
    load_table,
    load_tables,
)

__all__ = ["TABLES", "JdbcSource", "load_table", "load_tables"]
