from etl_pipeline_excel_sql__spark.streaming.events import (
    read_events_stream,
    sessionize_stream,
    windowed_counts_stream,
)

__all__ = [
    "read_events_stream",
    "sessionize_stream",
    "windowed_counts_stream",
]
