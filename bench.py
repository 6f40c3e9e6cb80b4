"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": "...", "value": <total-sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}

Each query is forced end-to-end with the ``noop`` sink (computes every
column, writes nothing) — ``count()`` would let Catalyst prune the very work
being measured.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from etl_pipeline_excel_sql__spark.plans import QUERIES  # noqa: E402
from etl_pipeline_excel_sql__spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Raw samples per query (min is reported — see the aggregation-rule
#: comment in main). 3 since round 4: the suite is stable enough that the
#: extra pass buys noise rejection for ~40s of bench time.
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

#: Headline set: the flagship pipeline, the scale-critical shuffles/joins,
#: and one representative per operator family.
BENCH_QUERIES = [
    "download_pipeline",
    "diff_cells",
    "word_diff",
    "agg_pricing_summary",
    "join_multitable_revenue",
    "window_rank_topk",
    "sessionize",
    "asof_join",
    "range_join",
    "window_agg_events",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "neardup_cosine",
    "ann_brute_topk",
    "ann_ivf_topk",
    "text_quality",
    "text_fingerprint",
    "multimodal_extract",
    # round-2 additions (kept after the round-1 set so per-query
    # round-over-round comparison stays aligned)
    "dedup_clusters",
    "text_tfidf_topk",
    "tpch_q21_sole_late_supplier",
    "tpch_q8_market_share",
    "decontam_overlap",
    "text_repetition",
    # round-3 additions (appended; earlier ordering preserved for
    # round-over-round comparison)
    "corpus_curate_pipeline",
    "pagerank_nations",
    "asof_join_nearest",
    # round-4 additions (appended; earlier ordering preserved for
    # round-over-round comparison)
    "window_range_frame",
    "band_join_recent_errors",
    "text_passage_dedup",
    # round-4c/4d additions (appended; earlier ordering preserved)
    "basket_lift",
    "events_twap",
    "global_row_number",
    # round-6 additions (appended; earlier ordering preserved)
    "mix_domains",
    "dedup_kcore",
    "bpe_vocab",
    "pq_adc",
    "ivfpq_adc",
    "ivfpq_residual_adc",
    "semantic_dedup_keep",
    # round-7 additions (appended; earlier ordering preserved)
    "dedup_spans",
    "dedup_span_trim",
    "decontam_spans",
    "bpe_token_ids",
    "pack_token_ids",
    "curate_pack_pipeline",
    # round-8 additions (appended; earlier ordering preserved)
    "bm25_topk",
    "hybrid_rrf_topk",
    "perceptron_quality",
    # round-8b additions (appended; earlier ordering preserved)
    "cdc_chunk_stats",
    "hll_distinct_shingles",
    "cms_heavy_hitters",
    "kn_lm_score",
    "cluster_balanced_sample",
    "exact_price_quantiles",
    "ccnet_ppl_buckets",
    # round-9 additions (appended; earlier ordering preserved)
    "bm25_serve_topk",
    "bm25_incremental_topk",
    "phrase_search_topk",
    "skipgram_top_pairs",
    "hard_negatives_topk",
    "rag_context_pipeline",
]


#: Optional comma-separated subset override (e.g. the heavy dedup/ANN
#: family for an sf1 scaling probe) — ANY registry query is allowed,
#: not just the headline BENCH_QUERIES set (scaling probes deliberately
#: reach beyond the headline list); unknown names fail fast rather than
#: silently benching less.
_SUBSET = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
if _SUBSET:
    requested = [n.strip() for n in _SUBSET.split(",") if n.strip()]
    unknown = sorted(set(requested) - set(QUERIES))
    if unknown:
        raise SystemExit(f"unknown bench queries: {unknown}")
    BENCH_QUERIES = requested


def run_one(spark, name: str, sf_dir: str) -> float:
    t0 = time.time()
    df = QUERIES[name](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    # Iterative queries (BPE, k-means, components, span digests) leave
    # their FINAL localCheckpoint blocks persisted — unevictable, so a
    # 50-query suite accumulates them in the executor JVM and every
    # LATER query runs in a shrinking memory budget (the round-8 "broad
    # +10% drift": suite totals grew as rounds ADDED iterative queries,
    # while each query alone still hit its round-6 time). check_oracle
    # has swept per-query since round 6; the bench must too, or it
    # measures suite-order memory pressure instead of the queries.
    # Sweep time is excluded from the sample — it is harness bookkeeping.
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in list(jmap.keySet().toArray()):
        jrdd = jmap.get(rid)
        if jrdd is not None:
            jrdd.unpersist(False)
    return dt


def main() -> None:
    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    # JVM/codegen warmup on a tiny query so bench numbers measure the
    # queries, not JIT compilation of the scan pipeline.
    QUERIES["filter_eq"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    # AGGREGATION RULE (read this before comparing rounds): the reported
    # per-query number and the headline total are the MIN of N_RUNS raw
    # wall-clock samples per query — the stable capability signal, not the
    # mean. Local noise on a shared box is easily 2x, so means drift with
    # host load; a round-over-round comparison must compare min to min
    # (raw per-run arrays ship in "raw_runs" so a newly bimodal query is
    # still visible). Samples are INTERLEAVED (N_RUNS full passes over the
    # suite) so a minutes-long host-noise burst — observed 10x on idle
    # load — degrades at most one sample per query instead of all of them.
    # A single failing query must not zero out the whole bench (round 2
    # lost every timing to one AnalysisException): failures are recorded
    # structurally per-query and the run continues.
    # Per-query WARMUP pass (untimed): the first execution of a query in
    # a session pays one-off costs the steady state doesn't — codegen
    # compilation of its specific operator chain, broadcast build,
    # shuffle-file allocation. Round-8 measurement: first samples ran
    # 1.3-6x their settled times (multimodal_extract 2.6s -> 0.42s
    # steady), so with only N_RUNS timed samples the min still carried
    # warmup and round-over-round totals drifted ~10% on nothing.
    raw_runs: dict[str, list[float]] = {name: [] for name in BENCH_QUERIES}
    errors: dict[str, str] = {}
    for name in BENCH_QUERIES:
        try:
            run_one(spark, name, SF_DIR)
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
    for _ in range(N_RUNS):
        for name in BENCH_QUERIES:
            if name in errors:
                continue
            try:
                raw_runs[name].append(round(run_one(spark, name, SF_DIR), 3))
            except Exception as exc:  # noqa: BLE001
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
    timings = {n: min(r) for n, r in raw_runs.items() if r}

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline-query wall seconds at sf (local[{}])".format(
            spark.sparkContext.defaultParallelism
        ),
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "raw_runs": raw_runs,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    if errors:
        sys.exit(1)


if __name__ == "__main__":
    main()
