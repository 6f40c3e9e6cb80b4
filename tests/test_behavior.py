"""Hand-corpus semantics + plan shape for the blocked best-match
record-linkage family."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


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
