"""Hand-corpus semantics + plan shapes for the behavior/linkage families
(funnel conversion, cohort retention, blocked best-match linkage)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _ts(day: int, hour: int = 0) -> datetime.datetime:
    return datetime.datetime(2024, 1, day, hour)


@pytest.fixture()
def tiny_events(spark):
    rows = [
        # u1 completes the funnel in order
        (1, _ts(1), "view"),
        (1, _ts(2), "click"),
        (1, _ts(3), "purchase"),
        # u2 clicks BEFORE viewing — click must not count (order matters),
        # and the purchase without a qualifying click must not either
        (2, _ts(2), "click"),
        (2, _ts(3), "view"),
        (2, _ts(4), "purchase"),
        # u3 views only
        (3, _ts(1), "view"),
        # u4 same-timestamp view+click: >= anchors count the click
        (4, _ts(5), "view"),
        (4, _ts(5), "click"),
    ]
    return spark.createDataFrame(rows, "user_id INT, ts TIMESTAMP, event_type STRING")


def test_funnel_order_semantics(tiny_events):
    from etl_pipeline_excel_sql__spark.operators.behavior import funnel_steps

    out = {
        r["step"]: (r["n_users"], r["conv_ppm"])
        for r in funnel_steps(
            tiny_events, ["view", "click", "purchase"]
        ).collect()
    }
    assert out[1] == (4, 1_000_000)
    # u1 and u4 have clicks at-or-after their first view; u2's click
    # precedes their view
    assert out[2] == (2, 500_000)
    assert out[3] == (1, 250_000)


def test_funnel_empty_step(spark):
    from etl_pipeline_excel_sql__spark.operators.behavior import funnel_steps

    ev = spark.createDataFrame(
        [(1, _ts(1), "view")], "user_id INT, ts TIMESTAMP, event_type STRING"
    )
    out = {r["step"]: r["n_users"] for r in funnel_steps(ev, ["view", "click"]).collect()}
    assert out == {1: 1, 2: 0}


def test_cohort_retention_hand(spark):
    from etl_pipeline_excel_sql__spark.operators.behavior import (
        cohort_retention,
    )

    rows = [
        (1, _ts(1)), (1, _ts(1, 5)), (1, _ts(3)),   # cohort d1, active d1+d3
        (2, _ts(1)),                                  # cohort d1, d1 only
        (3, _ts(3)), (3, _ts(4)),                     # cohort d3, active d3+d4
    ]
    ev = spark.createDataFrame(rows, "user_id INT, ts TIMESTAMP").withColumn(
        "event_type", F.lit("view")
    )
    got = {
        (r["cohort_day"], r["day_offset"]): (
            r["cohort_size"],
            r["n_active"],
            r["retention_ppm"],
        )
        for r in cohort_retention(ev).collect()
    }
    assert got[("2024-01-01", 0)] == (2, 2, 1_000_000)
    assert got[("2024-01-01", 2)] == (2, 1, 500_000)
    assert got[("2024-01-03", 0)] == (1, 1, 1_000_000)
    assert got[("2024-01-03", 1)] == (1, 1, 1_000_000)
    assert len(got) == 4  # no zero-activity rows are fabricated


def test_linkage_best_match_hand(spark):
    from etl_pipeline_excel_sql__spark.operators.linkage import (
        blocked_best_match,
    )

    rows = [
        (10, "red widget", "widget"),
        (11, "rad widget", "widget"),   # dist 1 to red widget
        (12, "blue widget", "widget"),  # dist 3 to red widget
        (13, "red bolt", "bolt"),       # different block — never compared
        (20, "tiny gear", "gear"),      # alone in its block — no match row
    ]
    cat = spark.createDataFrame(rows, "k BIGINT, name STRING, b STRING")
    probes = cat.filter(F.col("k").isin(10, 20))
    got = {
        r["k"]: (r["match_key"], r["dist"])
        for r in blocked_best_match(
            cat, probes, key_col="k", name_col="name", block_col="b"
        ).collect()
    }
    assert got == {10: (11, 1)}


def test_linkage_tie_breaks_on_smaller_key(spark):
    from etl_pipeline_excel_sql__spark.operators.linkage import (
        blocked_best_match,
    )

    rows = [
        (1, "aaa", "x"),
        (5, "aab", "x"),  # dist 1
        (3, "aac", "x"),  # dist 1 — smaller key wins
    ]
    cat = spark.createDataFrame(rows, "k BIGINT, name STRING, b STRING")
    got = blocked_best_match(
        cat, cat.filter("k = 1"), "k", "name", "b"
    ).collect()
    assert (got[0]["match_key"], got[0]["dist"]) == (3, 1)


def test_linkage_plan_broadcasts_probes_no_cartesian(spark):
    from etl_pipeline_excel_sql__spark.plans import QUERIES

    plan = (
        QUERIES["linkage_best_match"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # best-match is an AGGREGATE (partial+final), not a window sort
    assert "HashAggregate" in plan
    assert "Window" not in plan


def test_funnel_plan_pushes_type_filters(spark):
    from etl_pipeline_excel_sql__spark.plans import QUERIES

    plan = (
        QUERIES["funnel_conversion"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # each step reads only its own event type at the scan
    for t in ("view", "click", "purchase"):
        assert f"EqualTo(event_type,{t})" in plan or f"event_type,{t}" in plan
    assert "CartesianProduct" not in plan
