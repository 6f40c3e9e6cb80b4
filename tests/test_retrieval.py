"""BM25 + RRF hybrid retrieval: semantics pinned against tiny
hand-computable corpora, plus the scale/shape contracts (broadcast
query side, bounded fusion join)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_pipeline_excel_sql__spark.operators.retrieval import (
    BM25_B,
    BM25_K1,
    BM25_SCALE,
    RRF_K,
    RRF_SCALE,
    bm25_scores,
    bm25_topk,
    rrf_fuse,
)


def _bm25_ref(docs, queries, k1=BM25_K1, b=BM25_B):
    """Independent float BM25 (rational idf), micro-unit quantized —
    the operator must match this bit-for-bit."""
    toks = {d: t.split() for d, t in docs}
    n = len(docs)
    avgdl = float(sum(len(t) for t in toks.values())) / float(n)
    df: dict[str, int] = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    out = {}
    for qid, terms in queries:
        for d, t in toks.items():
            score, hits = 0, 0
            for term in terms:
                tf = t.count(term)
                if not tf:
                    continue
                hits += 1
                idf = (float(n - df[term]) + 0.5) / (float(df[term]) + 0.5)
                dnorm = (1.0 - b) + b * (float(len(t)) / avgdl)
                contrib = idf * ((tf * (k1 + 1.0)) / (tf + k1 * dnorm))
                score += math.floor(contrib * BM25_SCALE)
            if hits:
                out[(qid, d)] = (hits, score)
    return out


def test_bm25_matches_reference_quantized(spark):
    docs = [
        (1, "cat dog cat"),
        (2, "dog bird"),
        (3, "cat cat cat fish fish"),
        (4, "bird bird bird bird"),
    ]
    queries = [(0, ["cat", "bird"]), (1, ["fish"])]
    ddf = spark.createDataFrame(docs, ["doc_id", "text"])
    qdf = spark.createDataFrame(
        [(q, t) for q, ts in queries for t in ts], "query_id INT, term STRING"
    )
    got = {
        (r.query_id, r.doc_id): (r.n_hit, r.score_u)
        for r in bm25_scores(ddf, qdf).collect()
    }
    assert got == _bm25_ref(docs, queries)


def test_bm25_topk_rank_determinism(spark):
    # two docs with identical scores -> tie breaks on doc_id ascending
    docs = [(7, "x y"), (3, "x y"), (5, "z")]
    ddf = spark.createDataFrame(docs, ["doc_id", "text"])
    qdf = spark.createDataFrame([(0, "x")], "query_id INT, term STRING")
    rows = bm25_topk(ddf, qdf, k=5).orderBy("rank").collect()
    assert [(r.doc_id, r.rank) for r in rows] == [(3, 1), (7, 2)]


def test_rrf_fuse_integer_arithmetic_and_outer_semantics(spark):
    a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2)], "query_id INT, doc_id INT, rank INT"
    )
    b = spark.createDataFrame(
        [(0, 11, 1), (0, 12, 2)], "query_id INT, doc_id INT, rank INT"
    )
    got = {
        r.doc_id: (r.rrf_u, r.fused_rank)
        for r in rrf_fuse(a, b).collect()
    }
    c1 = RRF_SCALE // (RRF_K + 1)
    c2 = RRF_SCALE // (RRF_K + 2)
    # doc 11 appears in both lists; 10 and 12 in one each
    assert got == {
        11: (c1 + c2, 1),
        10: (c1, 2),
        12: (c2, 3),
    }


def test_bm25_plan_shape(spark, sf_dir):
    """The query side broadcasts; the corpus term table must not."""
    from etl_pipeline_excel_sql__spark.plans.retrieval_queries import (
        _query_terms_df,
        q_bm25_topk,
    )
    from etl_pipeline_excel_sql__spark.sources.registry import load_table

    plan = q_bm25_topk(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # the bounded query list
    df = q_bm25_topk(spark, sf_dir)
    rows = df.collect()
    assert rows, "corpus contains the query terms"
    # per-query ranks are 1..k contiguous
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q
    assert all(r.n_hit >= 1 for r in rows)
    # log-idf production variant runs (no oracle claim, plan identical)
    from etl_pipeline_excel_sql__spark.operators.retrieval import bm25_topk

    log_rows = bm25_topk(
        load_table(spark, "documents", sf_dir),
        _query_terms_df(spark),
        k=10,
        log_idf=True,
    ).collect()
    assert len(log_rows) == len(rows)
