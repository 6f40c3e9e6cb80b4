"""Content-defined chunking (operators/cdc.py) property tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_excel_sql__spark.operators.cdc import (
    cdc_chunk_rows,
    cdc_corpus_stats,
    cdc_doc_stats,
    cdc_mark_duplicates,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_chunks_tile_the_token_stream(spark):
    """Chunks partition each document: contiguous, in order, covering
    every token exactly once (the reassembly contract)."""
    rows = [
        (0, "the quick brown fox jumps over the lazy dog " * 5),
        (1, "a b c"),
        (2, "   "),  # no tokens -> no chunks
        (3, "solo"),
    ]
    got = (
        cdc_chunk_rows(_docs(spark, rows))
        .orderBy("doc_id", "chunk_no")
        .collect()
    )
    assert not [r for r in got if r.doc_id == 2]
    by_doc: dict[int, list] = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, chunks in by_doc.items():
        n_toks_doc = len([t for t in rows[doc_id][1].split() if t])
        assert [c.chunk_no for c in chunks] == list(range(len(chunks)))
        # chunks tile: pos0 of chunk i+1 == pos0 + n_toks of chunk i
        cursor = 0
        for c in chunks:
            assert c.pos0 == cursor
            cursor += c.n_toks
        assert cursor == n_toks_doc


def test_identical_docs_chunk_identically_and_dedup(spark):
    """Two byte-identical documents produce digest-identical chunks;
    marking cuts every chunk of the later copy and none of the first."""
    text = "alpha beta gamma delta epsilon zeta eta theta " * 4
    marked = cdc_mark_duplicates(
        cdc_chunk_rows(_docs(spark, [(10, text), (20, text)]))
    ).collect()
    d10 = sorted(
        [r for r in marked if r.doc_id == 10], key=lambda r: r.chunk_no
    )
    d20 = sorted(
        [r for r in marked if r.doc_id == 20], key=lambda r: r.chunk_no
    )
    assert [r.digest for r in d10] == [r.digest for r in d20]
    assert all(not r.cut for r in d10)
    assert all(r.cut for r in d20)


def test_prefix_insertion_realigns(spark):
    """The CDC property: prepending tokens perturbs only a bounded
    prefix — chunks strictly after the first post-insertion cut point
    keep their digests (a fixed-size chunker would shift every chunk)."""
    base = " ".join(f"w{i}" for i in range(400))
    shifted = "INSERTED " + base
    chunks = cdc_chunk_rows(
        _docs(spark, [(0, base), (1, shifted)])
    ).collect()
    dig0 = {
        r.digest for r in chunks if r.doc_id == 0 and r.chunk_no > 0
    }
    dig1 = {
        r.digest for r in chunks if r.doc_id == 1 and r.chunk_no > 0
    }
    # all non-first chunks realign exactly (boundary window is 2 tokens,
    # so after the first shared cut point the streams are identical)
    shared = dig0 & dig1
    assert len(shared) >= len(dig0) - 1
    assert len(dig0) > 5  # the doc actually chunked


def test_incremental_membership_is_cross_set_only(spark):
    """A batch doc identical to a store doc is fully stored (ppm = 1e6);
    a novel doc stores nothing — and within-batch duplicates do NOT
    count as stored (membership is strictly vs the persisted store)."""
    from etl_pipeline_excel_sql__spark.operators.cdc import (
        cdc_chunk_rows,
        cdc_incremental_stats,
    )

    store_doc = "red green blue cyan magenta yellow black white " * 4
    novel = "totally fresh tokens never seen before anywhere " * 4
    store = cdc_chunk_rows(_docs(spark, [(1, store_doc)])).select("digest")
    got = {
        r.doc_id: r
        for r in cdc_incremental_stats(
            _docs(spark, [(10, store_doc), (20, novel), (30, novel)]),
            store,
        ).collect()
    }
    assert got[10].stored_ppm == 1_000_000
    assert got[20].stored_ppm == 0
    assert got[30].stored_ppm == 0  # within-batch twin isn't "stored"
    assert got[10].stored_chunks == got[10].n_chunks


def test_doc_and_corpus_stats_consistent(spark, sf_dir):
    """Corpus totals equal the sum of per-doc stats on real testdata,
    and ppm arithmetic is the integer DIV contract."""
    from etl_pipeline_excel_sql__spark.sources.registry import load_table

    docs = load_table(spark, "documents", sf_dir)
    per_doc = cdc_doc_stats(docs)
    total = per_doc.agg(
        F.sum("n_chunks").alias("c"),
        F.sum("n_tokens").alias("t"),
        F.sum("cut_tokens").alias("x"),
    ).collect()[0]
    corpus = cdc_corpus_stats(docs).collect()[0]
    assert corpus.total_chunks == total.c
    assert corpus.total_tokens == total.t
    assert corpus.cut_tokens == total.x
    assert corpus.savings_ppm == total.x * 1_000_000 // total.t
    assert corpus.unique_chunks <= corpus.total_chunks
