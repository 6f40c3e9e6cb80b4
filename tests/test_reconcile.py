"""Schema-reconciliation tests (FIXTURES.md B3 scenarios)."""

from __future__ import annotations

import pytest

from etl_pipeline_excel_sql__spark.operators.reconcile import (
    EmptyIntersectionError,
    apply_reconciliation,
    reconcile_schema,
    scan_header_row,
)


def test_header_scan_normalizes_and_indexes():
    cells = [" Total\xa0Project_Cost ($M) ", "Ministry", None, "Status  Notes"]
    headers = scan_header_row(cells)
    assert headers == {"total project cost m": 0, "ministry": 1, "status notes": 3}


def test_header_scan_short_blank_run_continues():
    cells = ["a"] + [None] * 9 + ["b"]
    assert scan_header_row(cells) == {"a": 0, "b": 10}


def test_header_scan_ten_blanks_terminates():
    cells = ["a"] + [None] * 10 + ["b"]
    assert scan_header_row(cells) == {"a": 0}


def test_header_scan_500_col_cap():
    cells = [f"c{i}" for i in range(600)]
    assert len(scan_header_row(cells)) == 500


def test_header_scan_first_occurrence_wins():
    assert scan_header_row(["X", "x "]) == {"x": 0}


def test_reconcile_intersection_and_overrides():
    res = reconcile_schema(
        source_cols=["Ministry", "Total Project Cost ($M)", "Unmatched"],
        template_header_cells=["ministry", "TOTAL_PROJECT_COST M", "Extra Col"],
        manual_overrides={},
    )
    assert res.mapping == {"Ministry": 0, "Total Project Cost ($M)": 1}
    assert res.unmatched_source == ("Unmatched",)
    assert res.unmatched_template == ("extra col",)


def test_reconcile_manual_override():
    res = reconcile_schema(
        source_cols=["OldName"],
        template_header_cells=["New Name"],
        manual_overrides={"OldName": "New Name"},
    )
    assert res.mapping == {"OldName": 0}


def test_reconcile_empty_intersection_raises():
    with pytest.raises(EmptyIntersectionError):
        reconcile_schema(["a"], ["b"])


def test_apply_reconciliation_projects_in_template_order(spark):
    df = spark.createDataFrame([(1, "x", 2.0)], "c int, a string, b double")
    res = reconcile_schema(["c", "a", "b"], ["a", "b", "c"])
    out = apply_reconciliation(df, res)
    assert out.columns == ["a", "b", "c"]
