"""Two-phase exact quantiles (operators/quantiles.py) vs the naive sort."""

from __future__ import annotations

import math

import pytest

from etl_pipeline_excel_sql__spark.operators.quantiles import exact_quantiles


def _expected(values, pcts):
    s = sorted(values)
    n = len(s)
    out = {}
    for p in pcts:
        r = max(1, math.ceil(p * n / 100))
        out[p] = (r, s[r - 1][0])
    return out


@pytest.mark.parametrize(
    "values",
    [
        # heavy ties, including ties at bucket boundaries (width 10)
        [10.0] * 40 + [20.0] * 40 + [30.0] * 20,
        # skewed continuous-ish values
        [float(i * i % 977) for i in range(1, 501)],
        # single element
        [42.0],
    ],
)
def test_matches_naive_sort(spark, values):
    rows = [(v, i) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "v DOUBLE, id LONG")
    pcts = [1, 50, 90, 99, 100]
    got = {
        r.pct: (r.rank, r.value)
        for r in exact_quantiles(df, "v", ["id"], pcts, 10.0).collect()
    }
    assert got == _expected([(v, i) for v, i in rows], pcts)


def test_rejects_bad_pcts(spark):
    df = spark.createDataFrame([(1.0, 1)], "v DOUBLE, id LONG")
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", ["id"], [0], 1.0)
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", ["id"], [], 1.0)
