"""Hand-corpus semantics for BM25 pseudo-relevance-feedback expansion
and the classifier calibration banding."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_prf_expands_with_top_feedback_terms(spark):
    from etl_pipeline_excel_sql__spark.operators.retrieval import (
        bm25_build_index,
        bm25_prf_expand,
    )

    docs = [
        (1, "cat dog dog zebra"),
        (2, "cat bird bird bird"),
        (3, "mouse mouse"),
    ]
    ddf = spark.createDataFrame(docs, ["doc_id", "text"])
    qdf = spark.createDataFrame([(0, "cat")], "query_id INT, term STRING")
    idx = bm25_build_index(ddf)
    # fb_docs=2 -> docs 1 and 2 (the cat docs); candidate terms by total
    # feedback tf: bird=3, dog=2, zebra=1; "cat" excluded as original
    got = sorted(
        (r["query_id"], r["term"])
        for r in bm25_prf_expand(idx, qdf, fb_docs=2, fb_terms=2).collect()
    )
    assert got == [(0, "bird"), (0, "cat"), (0, "dog")]


def test_prf_tie_breaks_term_asc(spark):
    from etl_pipeline_excel_sql__spark.operators.retrieval import (
        bm25_build_index,
        bm25_prf_expand,
    )

    ddf = spark.createDataFrame(
        [(1, "q aa bb")], ["doc_id", "text"]
    )
    qdf = spark.createDataFrame([(0, "q")], "query_id INT, term STRING")
    idx = bm25_build_index(ddf)
    got = sorted(
        r["term"]
        for r in bm25_prf_expand(idx, qdf, fb_docs=1, fb_terms=1).collect()
    )
    # aa and bb tie at tf=1 -> term ASC keeps aa
    assert got == ["aa", "q"]


def test_calibration_bands_floor_negative_margins(spark):
    """FLOOR division must band negative margins toward -inf in BOTH
    engines (Spark DIV truncates toward zero — the operator must not use
    it here)."""
    from etl_pipeline_excel_sql__spark.plans.classifier_queries import (
        CALIBRATION_BAND,
    )

    df = spark.createDataFrame(
        [(-1,), (-CALIBRATION_BAND,), (0,), (CALIBRATION_BAND - 1,)],
        "margin BIGINT",
    )
    got = [
        r[0]
        for r in df.select(
            F.floor(F.col("margin") / F.lit(float(CALIBRATION_BAND))).cast(
                "bigint"
            )
        ).collect()
    ]
    assert got == [-1, -1, 0, 0]
