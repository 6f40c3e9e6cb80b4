"""Unit tests for scalar semantics — the FIXTURES.md B4 verified vectors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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


def _eval(spark, col, value, value_type="string"):
    df = spark.createDataFrame([(value,)], f"v {value_type}")
    return df.select(col.alias("out")).collect()[0].out


# --- percent formatter (Download.py:146-155 semantics) ----------------------

@pytest.mark.parametrize(
    ("value", "expected"),
    [
        (0.5, "50%"),
        (0.876, "88%"),
        (1.0, "100%"),
        (0.0, "0%"),
        (None, None),
    ],
)
def test_percent_numeric(spark, value, expected):
    assert _eval(spark, percent_format(F.col("v")), value, "double") == expected


@pytest.mark.parametrize(
    ("value", "expected"),
    [
        ("NULL", None),       # literal-'NULL' → null
        ("abc", "abc"),       # non-numeric string passes through
        ("0.876", "88%"),     # numeric-looking string formats
        (None, None),
    ],
)
def test_percent_string(spark, value, expected):
    assert _eval(spark, percent_format(F.col("v")), value, "string") == expected


def test_percent_round_half_even(spark):
    # 0.125 * 100 = 12.5 exactly (binary-representable): banker's rounding
    assert _eval(spark, percent_format(F.col("v")), 0.125, "double") == "12%"
    assert _eval(spark, percent_format(F.col("v")), 0.135, "double") == "14%"


# --- date reformat (Download.py:130-136) -------------------------------------

@pytest.mark.parametrize(
    ("value", "expected"),
    [
        ("2024-01-15", "01-15-2024"),
        ("garbage", None),
        (None, None),
    ],
)
def test_date_reformat(spark, value, expected):
    assert _eval(spark, date_reformat(F.col("v")), value) == expected


# --- null literal / to_str ----------------------------------------------------

def test_null_literal(spark):
    assert _eval(spark, null_literal_to_null(F.col("v")), "NULL") is None
    assert _eval(spark, null_literal_to_null(F.col("v")), "x") == "x"


def test_to_str(spark):
    assert _eval(spark, to_str(F.col("v")), None) == ""
    assert _eval(spark, to_str(F.col("v")), "  x ") == "x"
    assert _eval(spark, to_str(F.col("v")), 3.5, "double") == "3.5"


# --- normalizers (pure Python, Upload.py:137-145 / Compare.py:34-39) ---------

def test_norm_header():
    assert norm_header(" Total\xa0Project_Cost ($M) ") == "total project cost m"
    assert norm_header("A\r\nB") == "a b"
    assert norm_header(None) == ""


def test_normalize_colname():
    assert normalize_colname(" Total\xa0Project_Cost ($M) ") == "total_project_cost_m"
    assert normalize_colname("__x__") == "x"


def test_safe_fname_token():
    assert safe_fname_token('a\\/:*?"<>|b') == "a_________b"


def test_normalizers_differ():
    # T3 vs T4 keep distinct canonical separators (SURVEY §2.6)
    s = "A b_c"
    assert norm_header(s) == "a b c"
    assert normalize_colname(s) == "a_b_c"


def test_percent_matches_python_format_semantics(spark):
    """Reference parity property: percent_format must agree with the pandas
    semantics f"{x*100:.0f}%" (Download.py:146-155) across random and
    adversarial ratios — including round-half-even ties."""
    import random

    rng = random.Random(42)
    values = [rng.random() for _ in range(300)]
    values += [i / 200 for i in range(201)]           # exact .5% ties
    values += [0.0, 1.0, 0.999999, 1e-9, 0.125, 0.135, 0.875]
    expected = [f"{v * 100:.0f}%" for v in values]
    df = spark.createDataFrame([(v,) for v in values], "v double")
    from pyspark.sql import functions as F

    got = [
        r.out
        for r in df.select(percent_format(F.col("v")).alias("out")).collect()
    ]
    assert got == expected


def test_percent_huge_value_no_overflow(spark):
    # decimal(38,0) render: extreme ratios must not trip ANSI overflow
    assert _eval(
        spark, percent_format(F.col("v")), 1e18, "double"
    ) == f"{1e18 * 100:.0f}%"


def test_percent_format_matches_cpython_property(spark):
    """VERDICT r4 ask #7: the half-even parity claim
    (percent_format == CPython f"{x*100:.0f}%") property-tested over
    doubles, including the exact .005 ties where half-even matters.

    Why parity holds (and what this test pins): Spark's bround goes
    through the double's SHORTEST decimal repr (BigDecimal.valueOf);
    CPython formats the EXACT binary value. For |x*100| < 2^52 every
    half-integer n.5 is itself a representable double, so a non-tie
    value and its shortest repr can never straddle one — the two
    roundings agree on the whole input domain.
    """
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    ratio = st.floats(
        min_value=0.0,
        max_value=1.0,
        allow_nan=False,
        allow_infinity=False,
    )
    # exact .005-grid ties (k/200: 0.005, 0.015, ... -> x*100 lands on or
    # near n.5) plus the fixture vectors, always included
    always = [k / 200.0 for k in range(0, 201)] + [0.876, 0.5, 1.0, 0.125, 0.135]

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(xs=st.lists(ratio, min_size=1, max_size=150))
    def check(xs):
        vals = xs + always
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        got = [
            r.p
            for r in df.select(
                percent_format(F.col("v")).alias("p")
            ).collect()
        ]
        want = [f"{v * 100:.0f}%" for v in vals]
        assert got == want

    check()
