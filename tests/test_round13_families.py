"""Round-13 additions: cache invalidation on corpus regeneration
(ADVICE r12), the empty-donor reshard fix, and the incremental-manifest
capstone's split-stability contract."""

import pytest
from pyspark.sql import functions as F


def test_truth_cache_invalidates_on_corpus_regen(spark, tmp_path):
    """ADVICE r12: the persisted Jaccard-truth artifact is keyed on the
    corpus FINGERPRINT, not the path — regenerating the corpus at the
    same sf_dir in-process must rebuild the truth set, not serve the
    stale parquet."""
    from etl_pipeline_excel_sql__spark.functions.text import ws_tokens
    from etl_pipeline_excel_sql__spark.operators.dedup import shingle_rows
    from etl_pipeline_excel_sql__spark.plans import pipeline_queries as pq

    sf = str(tmp_path)

    def write_corpus(rows):
        spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(sf + "/documents.parquet")

    def truth_rows():
        docs = spark.read.parquet(sf + "/documents.parquet").filter(
            F.size(ws_tokens(F.col("text"))) > 0
        )
        exploded = shingle_rows(docs, "text", "doc_id", pq.MINHASH_SHINGLE_N)
        got = pq._shared_jaccard_truth(spark, sf, docs, exploded)
        return sorted((r.id_a, r.id_b, r.jaccard_ppm) for r in got.collect())

    write_corpus(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "completely different text with no overlap at all"),
        ]
    )
    assert (1, 2, 1000000) in truth_rows()

    # regenerate the corpus AT THE SAME PATH: now 1 and 3 are the twins
    write_corpus(
        [
            (1, "an entirely new corpus version written in place"),
            (2, "completely different text with no overlap at all"),
            (3, "an entirely new corpus version written in place"),
        ]
    )
    rows2 = truth_rows()
    assert (1, 3, 1000000) in rows2, "stale truth artifact served"
    assert (1, 2, 1000000) not in rows2
