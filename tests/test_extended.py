"""Extended-query checks that the SQL oracle can't express."""

from __future__ import annotations

from etl_pipeline_excel_sql__spark.plans.extended_queries import (
    q_approx_distinct,
)
from etl_pipeline_excel_sql__spark.plans.analytics_queries import (
    q_agg_count_distinct,
)


def test_approx_distinct_error_bounded(spark, sf_dir):
    exact = {
        r.l_returnflag: r.n_parts
        for r in q_agg_count_distinct(spark, sf_dir).collect()
    }
    approx = {
        r.l_returnflag: r.approx_parts
        for r in q_approx_distinct(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for flag, n in exact.items():
        # HLL++ default rsd is 5%; allow 3 sigma
        assert abs(approx[flag] - n) <= max(0.15 * n, 5), (flag, n, approx[flag])
