"""Round-12 additions: shared Jaccard truth artifact + capstone pieces."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def tiny_sf(spark, tmp_path):
    """A minimal documents table on disk so load_table-style readers and
    the truth builder have a real parquet corpus to scan."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different text with no overlap at all"),
            (4, "the quick brown fox jumps over the lazy dog"),
        ],
        ["doc_id", "text"],
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_shared_jaccard_truth_builds_once_per_sf(spark, tiny_sf):
    """Second call for the same sf_dir must LOAD the persisted parquet,
    not rebuild: the dir map gains exactly one entry and the prefix-join
    DAG (counted via an accumulator on the exploded input) runs once."""
    from etl_pipeline_excel_sql__spark.functions.text import ws_tokens
    from etl_pipeline_excel_sql__spark.operators.dedup import shingle_rows
    from etl_pipeline_excel_sql__spark.plans import pipeline_queries as pq

    docs = spark.read.parquet(tiny_sf + "/documents.parquet").filter(
        F.size(ws_tokens(F.col("text"))) > 0
    )
    acc = spark.sparkContext.accumulator(0)

    def bump(x):
        acc.add(1)
        return x

    bump_udf = F.udf(bump, "bigint")
    exploded = shingle_rows(
        docs, "text", "doc_id", pq.MINHASH_SHINGLE_N
    ).withColumn("__id", bump_udf("__id"))

    from etl_pipeline_excel_sql__spark.sources.registry import (
        corpus_fingerprint,
    )

    truth_key = (tiny_sf, corpus_fingerprint(tiny_sf))
    pq._TRUTH_DIRS.pop(truth_key, None)
    first = pq._shared_jaccard_truth(spark, tiny_sf, docs, exploded)
    rows1 = sorted((r.id_a, r.id_b, r.jaccard_ppm) for r in first.collect())
    bumps_after_build = acc.value
    assert truth_key in pq._TRUTH_DIRS

    second = pq._shared_jaccard_truth(spark, tiny_sf, docs, exploded)
    rows2 = sorted((r.id_a, r.id_b, r.jaccard_ppm) for r in second.collect())
    assert rows1 == rows2
    assert acc.value == bumps_after_build, (
        "second call re-evaluated the prefix-join DAG instead of "
        "loading the persisted truth parquet"
    )
    # docs 1 and 4 are identical -> at least that exact pair in truth
    assert (1, 4, 1000000) in rows1
    pq._TRUTH_DIRS.pop(truth_key, None)


def test_noun_block_guards_short_names(spark):
    """ADVICE r11: single-word names must block to '' (the DuckDB
    split_part behavior), never NULL, and never throw under ANSI."""
    from etl_pipeline_excel_sql__spark.plans.behavior_queries import (
        noun_block,
    )

    df = spark.createDataFrame(
        [("solo",), ("two words",), ("",), ("three word name",), (None,)],
        "p_name string",
    ).select("p_name", noun_block(F.col("p_name")).alias("block"))
    got = {r.p_name: r.block for r in df.collect()}
    # ADVICE r12: NULL names coalesce to '' in BOTH twins (split_part on
    # NULL yields NULL in DuckDB; the input is coalesced there too).
    assert got == {
        "solo": "",
        "two words": "words",
        "": "",
        "three word name": "word",
        None: "",
    }


def test_pretrain_curation_conservation(spark, sf_dir):
    """The capstone's conservation contract: every input document lands
    in exactly one disposition — docs in = kept + dropped, attributed —
    token mass conserves, and the budget math holds (kept token mass
    cannot exceed the 3/10 budget by more than one document)."""
    from etl_pipeline_excel_sql__spark.plans.capstone_queries import (
        q_pretrain_curation_pipeline,
    )

    from etl_pipeline_excel_sql__spark.functions.text import ws_tokens

    sf = sf_dir
    docs = spark.read.parquet(sf + "/documents.parquet")
    n_docs = docs.count()
    n_tokens = docs.select(
        F.sum(F.size(ws_tokens(F.col("text"))))
    ).first()[0]

    rows = q_pretrain_curation_pipeline(spark, sf).collect()
    by = {r.disposition: r for r in rows}
    allowed = {
        "benchmark",
        "dropped_quality",
        "dropped_neardup",
        "dropped_contaminated",
        "dropped_overbudget",
        "kept",
    }
    assert set(by) <= allowed
    assert sum(r.n_docs for r in rows) == n_docs, "doc conservation"
    assert sum(r.n_tokens for r in rows) == n_tokens, "token conservation"
    assert "kept" in by and by["kept"].n_docs > 0
    assert "benchmark" in by
    # every pipeline stage must actually fire on the synthetic corpus
    assert by.get("dropped_quality") and by["dropped_quality"].n_docs > 0
    assert by.get("dropped_overbudget") and by["dropped_overbudget"].n_docs > 0
