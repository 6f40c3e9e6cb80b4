"""Invariant tests for the round-4 corpus operators (oracle parity is
covered by tools/check_oracle.py; these pin the semantic edges)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_excel_sql__spark.plans.corpus2_queries import (
    CHUNK_S,
    CHUNK_W,
    QUOTA_CAP,
    q_doc_chunk_windows,
    q_domain_quota_sample,
    q_ngram_lm_score,
    q_vocab_coverage,
)


def test_chunk_windows_cover_and_overlap(spark, sf_dir):
    chunks = q_doc_chunk_windows(spark, sf_dir)
    # every chunk is non-empty and at most W tokens
    bad = chunks.filter(
        (F.col("n_chunk_tokens") < 1) | (F.col("n_chunk_tokens") > CHUNK_W)
    ).count()
    assert bad == 0
    # chunk indexes are dense from 0 per doc, and only the LAST chunk of a
    # doc may be shorter than W (interior chunks always fill the window)
    agg = chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("chunk_idx").alias("mx"),
        F.min("chunk_idx").alias("mn"),
    )
    assert agg.filter(
        (F.col("mn") != 0) | (F.col("mx") != F.col("n") - 1)
    ).count() == 0
    # exact shape: chunk i holds min(W, n_doc - i*S) tokens, where n_doc
    # is recoverable as max(start + len) over the doc's chunks
    ndoc = chunks.groupBy("doc_id").agg(
        F.max(F.col("chunk_idx") * CHUNK_S + F.col("n_chunk_tokens")).alias(
            "n_doc"
        )
    )
    wrong_len = chunks.join(ndoc, "doc_id").filter(
        F.col("n_chunk_tokens")
        != F.least(
            F.lit(CHUNK_W), F.col("n_doc") - F.col("chunk_idx") * CHUNK_S
        )
    )
    assert wrong_len.count() == 0
    # stride: chunk i starts at i*S, so a doc with n tokens has
    # ceil(n/S) chunks — spot-check via one reconstructed doc
    row = chunks.filter(F.col("doc_id") == 1).orderBy("chunk_idx").collect()
    if len(row) > 1:
        first = row[0]["chunk_text"].split()
        second = row[1]["chunk_text"].split()
        assert first[CHUNK_S:] == second[: CHUNK_W - CHUNK_S]


def test_domain_quota_cap_holds(spark, sf_dir):
    out = q_domain_quota_sample(spark, sf_dir)
    per = out.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    assert per.filter(F.col("n") > QUOTA_CAP).count() == 0
    # deterministic: two runs pick the same survivors
    a = {r.doc_id for r in out.collect()}
    b = {r.doc_id for r in q_domain_quota_sample(spark, sf_dir).collect()}
    assert a == b


def test_ngram_lm_score_bounds(spark, sf_dir):
    out = q_ngram_lm_score(spark, sf_dir)
    # scaled conditional probabilities lie in (0, LM_SCALE]; the floor
    # mean therefore lies in [0, LM_SCALE]
    assert out.filter(
        (F.col("lm_score_scaled") < 0)
        | (F.col("lm_score_scaled") > 1_000_000)
    ).count() == 0
    assert out.filter(F.col("n_bigrams") < 1).count() == 0


def test_vocab_coverage_bounds(spark, sf_dir):
    out = q_vocab_coverage(spark, sf_dir)
    assert out.filter(
        (F.col("n_oov") > F.col("n_tokens"))
        | (F.col("oov_bp") < 0)
        | (F.col("oov_bp") > 10_000)
    ).count() == 0
