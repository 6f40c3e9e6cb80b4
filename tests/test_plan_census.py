"""Repo-wide physical-plan census: ONE test that compiles every batch
registry query and asserts the global plan invariants the per-query
tests assert locally.

Invariants (the ones that decide 100 TB viability):
- NO CartesianProduct anywhere, ever.
- NO BatchEvalPython (row-at-a-time Python UDF) anywhere — Python may
  only touch data through Arrow (MapInPandas / FlatMapGroupsInPandas /
  ArrowEvalPython).
- BroadcastNestedLoopJoin only in the whitelisted queries whose
  crossJoin is a broadcast of a SINGLETON/model-sized frame (scalar
  aggregates, centroids, SRP planes, probe-date lists) — anything else
  is an accidental unbounded nested loop.

Streaming queries are excluded: invoking them executes the stream (the
memory-sink drain happens inside the query function), and their state
machines are covered by test_streaming.py and the oracle gate.
Iterative queries (connected components, PageRank, IVF training) run
driver actions during CONSTRUCTION; compiling them here is a real but
bounded cost (~seconds each at sf0.001).
"""

from __future__ import annotations

SF = "/root/testdata/sf0.001"

#: queries whose plan legitimately contains BroadcastNestedLoopJoin —
#: every one is a broadcast of a singleton or model-sized frame.
BNLJ_WHITELIST = {
    "agg_skew_salted",  # salt-range replicate of the tiny build side
    "ann_brute_topk",  # query vectors broadcast against the corpus scan
    "ann_filtered_topk",  # same, after the keyword prefilter
    "ann_ivf_topk",  # broadcast centroids / probe lists
    "ann_recall",  # composes ann_brute_topk + ann_ivf_topk; inherits their
    #               broadcast-singleton BNLJs (query-set broadcast, bounded)
    "ann_srp_buckets",  # broadcast SRP hyperplanes
    "ivfpq_adc",  # broadcast ncells-row coarse-centroid tables (seed +
    #               trained) cross-joined for assignment/probing — the
    #               same bounded singleton pattern as ann_ivf_topk
    "ivfpq_residual_adc",  # same bounded coarse-centroid cross-joins
    #               (the residual path shares the coarse quantizer)
    "neardup_cosine",  # broadcast SRP planes
    "semantic_dedup_keep",  # broadcast SRP planes feeding the keep-set
    "dedup_clusters",  # SRP planes inside the LSH pair generator
    "dedup_triangles",  # same pair generator
    "graph_cluster_coeff",  # same pair generator
    "pagerank_nations",  # broadcast dangling-mass singleton
    "corr_regression",  # broadcast scalar moment row
    "decontam_overlap",  # broadcast benchmark shingle set membership
    "tpch_q11_important_stock",  # broadcast global-share scalar
    "tpch_q14_promo_share",  # broadcast scalar denominator
    "tpch_q15_top_supplier",  # broadcast scalar max
    "tpch_q22_dormant_customers",  # broadcast avg-balance scalar
    "scalar_subquery",  # the scalar subquery itself
    "basket_lift",  # broadcast n_orders singleton
    "scd2_pointintime",  # broadcast 3-row probe-date list
    "emb_label_centroids",  # broadcast dim-count singleton
    "emb_centroid_distances",  # centroid base relation reuse
    "emb_gram_matrix",  # broadcast scale singleton
    "vec_quantize_int8",  # broadcast per-dim max row
    "ngram_lm_score",  # broadcast vocab-total scalar
    "vocab_coverage",  # broadcast top-V vocab list
    "text_tfidf_topk",  # broadcast doc-count scalar
    "heavy_hitter_terms",  # broadcast doc-count scalar
    "corpus_length_profile",  # broadcast count row
    "text_top_terms",  # broadcast count row
    "cohort_retention",  # broadcast cohort-day row
    "funnel_conversion",  # crossJoin of four single-row stage counts
    "multimodal_frames",  # broadcast frame-tick sequence
}


def test_every_batch_query_obeys_global_plan_invariants(spark):
    from etl_pipeline_excel_sql__spark.plans import QUERIES

    offenders: dict[str, list[str]] = {}
    unexpected_bnlj: list[str] = []
    for name, fn in QUERIES.items():
        if name.startswith("stream_"):
            continue
        plan = (
            fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        )
        bad = []
        if "CartesianProduct" in plan:
            bad.append("CartesianProduct")
        if "BatchEvalPython" in plan:
            bad.append("BatchEvalPython(row-at-a-time UDF)")
        if bad:
            offenders[name] = bad
        if (
            "BroadcastNestedLoopJoin" in plan
            and name not in BNLJ_WHITELIST
        ):
            unexpected_bnlj.append(name)
    assert not offenders, offenders
    assert not unexpected_bnlj, (
        "BroadcastNestedLoopJoin outside the singleton whitelist — "
        f"audit these for unbounded nested loops: {unexpected_bnlj}"
    )


def test_decontam_size_gates_the_bench_join(spark):
    """decontam_overlap must not FORCE-broadcast its corpus-derived
    benchmark side (the round-4 verdict's one scale defect): with the
    broadcast threshold disabled — the stand-in for a bench shingle set
    over the threshold at 100 TB — the plan must degrade to a shuffle
    join, with identical results. With the default threshold the engine
    is free to (and locally does) pick the broadcast plan, so the gate
    is the ENGINE's size estimate, not a hardcoded F.broadcast."""
    from etl_pipeline_excel_sql__spark.plans.corpus_queries import (
        q_decontam_overlap,
    )

    rows_default = sorted(
        map(tuple, q_decontam_overlap(spark, SF).collect())
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = q_decontam_overlap(spark, SF)
        initial = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" not in initial, initial
        rows_gated = sorted(map(tuple, df.collect()))
        final = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" not in final, final
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert rows_gated == rows_default
