"""End-to-end pipeline tests on reference-domain fixtures (FIXTURES.md B1/B2)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_pipeline_excel_sql__spark.pipelines import (
    EmptySourceError,
    compare_pipeline,
    download_pipeline,
    output_filename,
    resolve_columns,
    upload_pipeline,
)
from etl_pipeline_excel_sql__spark.sinks.excel_writer import FILL_CHANGED, FILL_CLEARED

TRACKER_SCHEMA = (
    "`OB Main ID` string, Ministry string, `RFP Issuance` string, "
    "`Design Readiness` string, `Risks to Project Cost` string, "
    "`Status Notes` string"
)

TRACKER_ROWS = [
    ("P1", "MOH", "2024-01-15", "0.876", "high", "on track for spring"),
    ("P2", "MOH", "garbage", "NULL", "low", "delayed until fall"),
    ("P3", "MAG", "2023-06-30", "0.5", "med", "complete"),
    ("P4", "OUT", "2023-06-30", "1.0", "med", "not in list"),
]


@pytest.fixture()
def tracker(spark):
    return spark.createDataFrame(TRACKER_ROWS, TRACKER_SCHEMA)


def test_output_filename():
    assert output_filename("MOH", dt.date(2026, 8, 13)) == "MOH_08_13_2026.xlsx"
    assert output_filename("A/B", dt.date(2026, 1, 2)) == "A_B_01_02_2026.xlsx"


def test_download_pipeline_end_to_end(tracker):
    res = download_pipeline(
        tracker,
        filter_col="Ministry",
        filter_value="MOH",
        drop_cols=["Risks to Project Cost"],
        date_cols=["RFP Issuance"],
        percent_cols=["Design Readiness"],
        run_date=dt.date(2026, 8, 13),
        skip_cols=frozenset({2}),
        inject_vba=True,
    )
    assert res.rows_written == 2
    assert res.grid.get(4, 11) == "08/13/2026"         # K3 stamp
    # columns after drop: OB Main ID, Ministry, RFP Issuance, Design
    # Readiness, Status Notes -> excel cols 1,3,4,5,6 (col 2 skipped)
    row_p1 = [res.grid.get(8, c) for c in (1, 3, 4, 5, 6)]
    assert row_p1 == ["P1", "MOH", "01-15-2024", "88%", "on track for spring"]
    row_p2 = [res.grid.get(9, c) for c in (1, 3, 4, 5, 6)]
    # 'garbage' date coerces to null -> ''; 'NULL' literal percent -> ''
    assert row_p2 == ["P2", "MOH", "", "", "delayed until fall"]
    assert res.notes and "vba-injection: recorded" in res.notes[0]
    # K4: the paste-guard macro source is carried on the grid verbatim
    # (Download.py:203-227 semantics — guard ranges + undo + message).
    vba = res.grid.vba_modules["Sheet1"]
    assert "Worksheet_SelectionChange" in vba
    assert '"C:C, D:D, E:E, J:J, K:K, AI:AI, AH:AH, AP:AP"' in vba
    assert "Application.Undo" in vba
    assert "Copy and paste is not allowed in this column." in vba


def test_upload_pipeline_all_block_order(tracker):
    template = ["ob main id", "MINISTRY", "Status_Notes", "Template Only"]
    res = upload_pipeline(
        tracker,
        ministry="ALL",
        ministry_list=["MOH", "MAG"],
        template_header_cells=template,
        order_tiebreak=["OB Main ID"],
    )
    # OUT ministry filtered by IN-list; blocks in [MOH, MAG] order
    assert res.rows_written == 3
    col1 = [res.grid.get(r, 1) for r in (6, 7, 8)]
    col2 = [res.grid.get(r, 2) for r in (6, 7, 8)]
    assert col2 == ["MOH", "MOH", "MAG"]
    assert col1 == ["P1", "P2", "P3"]
    # template-only column stays untouched
    assert all(res.grid.get(r, 4) is None for r in (6, 7, 8))


def test_upload_pipeline_empty_guard(tracker):
    with pytest.raises(EmptySourceError):
        upload_pipeline(
            tracker,
            ministry="NOPE",
            ministry_list=["MOH"],
            template_header_cells=["ministry"],
        )


def test_resolve_columns():
    assert resolve_columns(
        ["OB Main ID", "Status Notes", "Gone"],
        ["OB Main ID", "STATUS_NOTES", "Other"],
    ) == {"OB Main ID": "OB Main ID", "Status Notes": "STATUS_NOTES", "Gone": None}


def test_compare_pipeline_end_to_end(spark):
    q1 = spark.createDataFrame(
        [
            ("P1", "on track for spring", "a"),
            ("P2", "x", "b"),
            ("P3", "keep", "c"),
            ("P3", "keep-last", "c2"),   # duplicate key: last wins by ord
            ("", "blankkey", "z"),
        ],
        "`OB Main ID` string, `STATUS_NOTES` string, other string",
    ).withColumn("ord", F.monotonically_increasing_id())
    q2 = spark.createDataFrame(
        [
            ("P1", "delayed until fall spring extra", "a"),   # changed + word diff
            ("P2", "", "b"),                                   # cleared
            ("P3", "keep-last", "c2"),                         # same vs last-wins row
            ("P9", "brand new", "n"),                          # new row
        ],
        "`OB Main ID` string, `Status Notes` string, other string",
    )
    diff, res = compare_pipeline(
        q1,
        q2,
        key="OB Main ID",
        compare_cols=["Status Notes"],
        word_diff_cols=["Status Notes"],
        old_order_col="ord",
    )
    rows = {r["OB Main ID"]: r for r in diff.collect()}
    assert rows["P1"]["Status Notes__status"] == "changed"
    assert [w.same for w in rows["P1"]["Status Notes__words"]] == [
        False, False, False, True, False,
    ]
    assert rows["P2"]["Status Notes__status"] == "cleared"
    assert rows["P3"]["Status Notes__status"] == "same"   # last-wins dedup
    assert rows["P9"].row_status == "new"
    fills = res.grid.fills
    assert FILL_CHANGED in fills.values() and FILL_CLEARED in fills.values()


def test_compare_pipeline_rejects_ambiguous_resolution(spark):
    """Two wanted names resolving to the same old-snapshot column must
    raise up front, not collapse the rename map and crash downstream."""
    import pytest

    from etl_pipeline_excel_sql__spark.pipelines import compare_pipeline

    q1 = spark.createDataFrame([(1, "x")], "a_b long, v string")
    q2 = spark.createDataFrame([(1, "x", "y")], "a_b long, `a b` string, v string")
    with pytest.raises(KeyError, match="ambiguous"):
        compare_pipeline(q1, q2, key="a_b", compare_cols=["a b"])
