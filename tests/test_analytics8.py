"""Tests for the round-4d analytics family: centroid geometry, language
confusion, and the backlog prefix-sum."""

from __future__ import annotations

from etl_pipeline_excel_sql__spark.plans.analytics8_queries import (
    q_emb_centroid_distances,
    q_lang_confusion,
    q_orders_backlog,
)
from etl_pipeline_excel_sql__spark.sources.registry import load_table


def test_centroid_distances_metric_properties(spark, sf_dir):
    rows = q_emb_centroid_distances(spark, sf_dir).collect()
    labels = {
        r["label"]
        for r in load_table(spark, "embeddings", sf_dir).select("label").distinct().collect()
    }
    n = len(labels)
    assert len(rows) == n * (n - 1) // 2
    for r in rows:
        assert r["label_a"] < r["label_b"]
        assert r["n_dims"] == 64
        assert r["dist_sq_micro2"] >= 0


def test_lang_confusion_totals_and_rates(spark, sf_dir):
    rows = q_lang_confusion(spark, sf_dir).collect()
    n_docs = load_table(spark, "documents", sf_dir).count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    by_class: dict[str, int] = {}
    for r in rows:
        by_class.setdefault(r["lang"], 0)
        by_class[r["lang"]] += r["n_docs"]
        assert 0 < r["rate_ppm"] <= 1_000_000
        assert r["rate_ppm"] == r["n_docs"] * 1_000_000 // r["n_class"]
    for r in rows:
        assert by_class[r["lang"]] == r["n_class"]


def test_orders_backlog_conserves_orders(spark, sf_dir):
    rows = sorted(q_orders_backlog(spark, sf_dir).collect(), key=lambda r: r["day"])
    n_orders = load_table(spark, "orders", sf_dir).count()
    n_with_items = (
        load_table(spark, "lineitem", sf_dir).select("l_orderkey").distinct().count()
    )
    assert sum(r["n_opened"] for r in rows) == n_orders
    assert sum(r["n_closed"] for r in rows) == n_with_items
    # final backlog = orders never fully shipped (no lineitem rows)
    assert rows[-1]["backlog"] == n_orders - n_with_items
    # prefix-sum consistency row to row
    run = 0
    for r in rows:
        run += r["n_opened"] - r["n_closed"]
        assert r["backlog"] == run


def test_scd2_pointintime_validity_semantics(spark, sf_dir):
    from etl_pipeline_excel_sql__spark.plans.analytics8_queries import (
        q_scd2_pointintime,
    )

    rows = {r["probe_date"]: r for r in q_scd2_pointintime(spark, sf_dir).collect()}
    n_cust = load_table(spark, "customer", sf_dir).count()
    # 2019 probe: only the %10==1 history versions exist
    hist = rows["2019-06-01"]
    assert hist["n_versions"] == hist["n_customers"]
    assert 0 < hist["n_versions"] < n_cust
    # 2020 probe: every customer has exactly one valid version
    mid = rows["2020-06-01"]
    assert mid["n_versions"] == mid["n_customers"] == n_cust
    # 2021 post-merge probe: every base customer still has exactly one
    # valid version, plus the %13==5 shifted-key inserts
    post = rows["2021-07-01"]
    assert post["n_versions"] == post["n_customers"] > n_cust
