"""Trained-artifact round trips: a model saved then loaded must drive
its consumer to BIT-IDENTICAL results vs the freshly-trained model, and
storage drift must fail at load, not as wrong encodes later."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_excel_sql__spark.sinks.models import (
    load_artifact,
    load_bpe_merges,
    load_perceptron_weights,
    save_artifact,
    save_bpe_merges,
    save_perceptron_weights,
)


def test_bpe_merges_round_trip_drives_identical_encoding(
    spark, sf_dir, tmp_path
):
    from etl_pipeline_excel_sql__spark.operators.bpe import (
        bpe_doc_token_ids,
        bpe_train_merges_from_words,
        word_frequencies,
    )
    from etl_pipeline_excel_sql__spark.sources.registry import load_table

    docs = load_table(spark, "documents", sf_dir).limit(100)
    words = word_frequencies(docs, "text")
    trained = bpe_train_merges_from_words(words, 6, batch_pairs=4)
    fresh = [(r.left, r.right) for r in trained.orderBy("merge_rank").collect()]

    path = str(tmp_path / "merges")
    save_bpe_merges(trained, path)
    loaded = load_bpe_merges(spark, path)
    assert loaded == fresh

    a = bpe_doc_token_ids(docs, "text", fresh, words=words).collect()
    b = bpe_doc_token_ids(docs, "text", loaded, words=words).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pq_codebooks_round_trip_drives_identical_codes(
    spark, sf_dir, tmp_path
):
    from etl_pipeline_excel_sql__spark.operators.pq import (
        pq_encode,
        pq_train_codebooks,
    )
    from etl_pipeline_excel_sql__spark.sources.registry import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    cb = pq_train_codebooks(emb, m=8, ncodes=16, iters=2, dims=64)
    path = str(tmp_path / "codebooks")
    save_artifact(cb, path)
    cb2 = load_artifact(spark, path, cb.schema)
    a = {r.vec_id: r.codes for r in pq_encode(emb, cb, m=8, dims=64).collect()}
    b = {r.vec_id: r.codes for r in pq_encode(emb, cb2, m=8, dims=64).collect()}
    assert a == b


def test_perceptron_weights_round_trip(spark, tmp_path):
    w = {3: 5, 17: -2, 400: 1}
    path = str(tmp_path / "weights")
    save_perceptron_weights(spark, w, path)
    assert load_perceptron_weights(spark, path) == w
    # empty model round-trips to empty
    path2 = str(tmp_path / "weights0")
    save_perceptron_weights(spark, {}, path2)
    assert load_perceptron_weights(spark, path2) == {}


def test_schema_drift_fails_at_load(spark, tmp_path):
    from etl_pipeline_excel_sql__spark.operators.bpe import MERGES_SCHEMA

    # artifact written with a renamed column must not load as merges
    bad = spark.createDataFrame(
        [(0, "a", "b", 3)], "rank INT, left STRING, right STRING, n BIGINT"
    )
    path = str(tmp_path / "bad")
    save_artifact(bad, path)
    with pytest.raises(Exception):
        load_artifact(spark, path, MERGES_SCHEMA)

def test_bm25_index_roundtrip_serves_identically(spark, sf_dir, tmp_path):
    """Persist the inverted index, reload it, serve the registered query
    batch — scores and ranks must be bit-identical to the fresh build,
    and a schema-drifted index fails at load, not as wrong scores."""
    import pytest
    from pyspark.sql import functions as F

    from etl_pipeline_excel_sql__spark.operators.retrieval import (
        bm25_build_index,
        bm25_scores_from_index,
    )
    from etl_pipeline_excel_sql__spark.plans.retrieval_queries import (
        _query_terms_df,
    )
    from etl_pipeline_excel_sql__spark.sinks.models import (
        load_bm25_index,
        save_bm25_index,
    )
    from etl_pipeline_excel_sql__spark.sources.registry import load_table

    docs = load_table(spark, "documents", sf_dir)
    fresh = bm25_build_index(docs)
    path = str(tmp_path / "bm25_index")
    save_bm25_index(fresh, path)
    loaded = load_bm25_index(spark, path)
    assert (loaded.n_docs, loaded.total_toks) == (
        fresh.n_docs,
        fresh.total_toks,
    )
    q = _query_terms_df(spark)
    a = sorted(map(tuple, bm25_scores_from_index(fresh, q).collect()))
    b = sorted(map(tuple, bm25_scores_from_index(loaded, q).collect()))
    assert a == b and a
    # drift: rename a column in storage -> load must fail loudly
    spark.read.parquet(f"{path}/dl").withColumnRenamed(
        "dl", "doc_len"
    ).write.mode("overwrite").parquet(f"{path}/dl_drifted")
    import shutil

    shutil.rmtree(f"{path}/dl")
    shutil.move(f"{path}/dl_drifted", f"{path}/dl")
    with pytest.raises(ValueError, match="does not match"):
        load_bm25_index(spark, path)
