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
    """The banding must FLOOR negative margins toward -inf (Spark's DIV
    truncates toward zero), via the float-free positive-mod expression
    the query actually uses — checked against Python's true floordiv."""
    import duckdb

    from etl_pipeline_excel_sql__spark.plans.classifier_queries import (
        CALIBRATION_BAND as B,
        _BAND_SQL,
    )

    margins = [-2 * B, -B - 1, -B, -1, 0, 1, B - 1, B, 2 * B + 5]
    df = spark.createDataFrame([(m,) for m in margins], "margin BIGINT")
    got = [
        r[0]
        for r in df.select(F.expr(_BAND_SQL.format(b=B)))
        .toPandas()
        .itertuples(index=False)
    ]
    assert got == [m // B for m in margins]
    # and the DuckDB spelling agrees cell-for-cell
    duck = [
        duckdb.sql(
            f"SELECT (({m}) - ((({m}) % {B}) + {B}) % {B}) // {B}"
        ).fetchone()[0]
        for m in margins
    ]
    assert duck == [m // B for m in margins]
