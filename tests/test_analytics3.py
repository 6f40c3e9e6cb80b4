"""Tests for the round-2b analytics family: exact correlation/regression,
cohort retention, and the ordered conversion funnel."""

from __future__ import annotations

import math

from etl_pipeline_excel_sql__spark.plans.analytics3_queries import (
    q_cohort_retention,
    q_corr_regression,
    q_funnel_conversion,
)


def test_corr_regression_matches_closed_form(spark, sf_dir):
    """Power-sum statistics equal a driver-side float recomputation to 1e-9
    relative — and r stays in [-1, 1]."""
    from etl_pipeline_excel_sql__spark.sources.registry import load_table

    rows = {r["l_returnflag"]: r for r in q_corr_regression(spark, sf_dir).collect()}
    raw = (
        load_table(spark, "lineitem", sf_dir)
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .collect()
    )
    by_flag: dict[str, list[tuple[float, float]]] = {}
    for r in raw:
        by_flag.setdefault(r["l_returnflag"], []).append(
            (r["l_quantity"], r["l_extendedprice"])
        )
    for flag, pts in by_flag.items():
        n = len(pts)
        sx = sum(p[0] for p in pts)
        sy = sum(p[1] for p in pts)
        sxx = sum(p[0] * p[0] for p in pts)
        syy = sum(p[1] * p[1] for p in pts)
        sxy = sum(p[0] * p[1] for p in pts)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        r_ = (n * sxy - sx * sy) / math.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )
        got = rows[flag]
        assert got["n_rows"] == n
        assert abs(got["slope"] - slope) <= 1e-9 * max(1.0, abs(slope))
        assert abs(got["pearson_r"] - r_) <= 1e-9
        assert -1.0 <= got["pearson_r"] <= 1.0


def test_cohort_retention_offsets_nonnegative_and_bounded(spark, sf_dir):
    rows = q_cohort_retention(spark, sf_dir).collect()
    assert rows
    # offset 0 exists for every cohort (the cohort day itself is activity)
    cohorts = {r["cohort_day"] for r in rows}
    zero = {r["cohort_day"] for r in rows if r["day_offset"] == 0}
    assert cohorts == zero
    assert all(r["day_offset"] >= 0 for r in rows)
    # day-0 cell is the cohort's max: retention can never exceed cohort size
    by_cohort: dict[str, dict[int, int]] = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_day"], {})[r["day_offset"]] = r["n_users"]
    for cells in by_cohort.values():
        assert max(cells.values()) == cells[0]


def test_funnel_monotone(spark, sf_dir):
    row = q_funnel_conversion(spark, sf_dir).collect()[0]
    assert (
        row["n_users"]
        >= row["n_view"]
        >= row["n_click_after_view"]
        >= row["n_purchase_after_click"]
        >= 0
    )
    assert row["n_view"] > 0
