"""Tests for integer-exact PageRank."""

from __future__ import annotations

from etl_pipeline_excel_sql__spark.operators.graph import PAGERANK_SCALE
from etl_pipeline_excel_sql__spark.plans.graph_queries import (
    N_NATIONS,
    q_pagerank_nations,
)


def test_pagerank_deterministic_and_mass_conserving(spark, sf_dir):
    a = {r["nation_key"]: r["rank_scaled"] for r in q_pagerank_nations(spark, sf_dir).collect()}
    b = {r["nation_key"]: r["rank_scaled"] for r in q_pagerank_nations(spark, sf_dir).collect()}
    assert a == b  # bit-identical across runs (integer arithmetic)
    assert len(a) == N_NATIONS
    assert all(r > 0 for r in a.values())
    total = sum(a.values())
    # floor divisions only ever LOSE mass, and only a hair of it
    assert total <= PAGERANK_SCALE
    assert total >= int(0.95 * PAGERANK_SCALE)


def test_pagerank_rewards_indegree(spark, sf_dir):
    """A nation receiving more weighted trade must outrank the minimum."""
    rows = q_pagerank_nations(spark, sf_dir).collect()
    ranks = sorted(r["rank_scaled"] for r in rows)
    assert ranks[-1] > ranks[0]  # graph is not rank-uniform
