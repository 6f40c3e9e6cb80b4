"""Streaming tests: streaming results must equal their batch twins."""

from __future__ import annotations

import pytest

from etl_pipeline_excel_sql__spark.plans.analytics_queries import (
    q_sessionize,
    q_window_agg_events,
)
from etl_pipeline_excel_sql__spark.streaming.events import (
    read_events_stream,
    run_to_memory_sink,
    sessionize_stream,
    windowed_counts_stream,
)


def test_windowed_counts_stream_equals_batch(spark, sf_dir):
    stream = windowed_counts_stream(read_events_stream(spark, sf_dir))
    got = run_to_memory_sink(stream, "win_counts_test")
    batch = q_window_agg_events(spark, sf_dir)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_sessionize_stream_equals_batch(spark, sf_dir):
    stream = sessionize_stream(read_events_stream(spark, sf_dir))
    got = {
        (r.user_id, r.session_start): (r.n_events, r.session_end)
        for r in run_to_memory_sink(stream, "sessionize_test").collect()
    }
    batch = {
        (r.user_id, r.session_start): (r.n_events, r.session_end)
        for r in q_sessionize(spark, sf_dir).collect()
    }
    assert got == batch
