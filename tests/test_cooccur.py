"""Skip-gram co-occurrence (operators/cooccur.py): window semantics
pinned on a hand corpus; generation is lead-windows, never a self-join."""

from __future__ import annotations

import pytest

from etl_pipeline_excel_sql__spark.operators.cooccur import (
    skipgram_counts,
    skipgram_top_pairs,
)


def test_skipgram_counts_hand_corpus(spark):
    docs = [(1, "a b c a"), (2, "b b")]
    ddf = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r.center, r.context, r.dist): r.n_pairs
        for r in skipgram_counts(ddf, window=2).collect()
    }
    assert got == {
        ("a", "b", 1): 1,  # doc1 a->b
        ("a", "c", 2): 1,  # doc1 a->c (dist 2)
        ("b", "c", 1): 1,
        ("b", "a", 2): 1,  # doc1 b..a
        ("c", "a", 1): 1,
        ("b", "b", 1): 1,  # doc2
    }
    # pairs never cross document boundaries: no (a, b) at dist > doc len
    assert ("a", "b", 2) not in got


def test_skipgram_window_one_is_bigrams(spark):
    ddf = spark.createDataFrame([(1, "x y x y")], ["doc_id", "text"])
    got = {
        (r.center, r.context): r.n_pairs
        for r in skipgram_counts(ddf, window=1).collect()
    }
    assert got == {("x", "y"): 2, ("y", "x"): 1}


def test_skipgram_rejects_bad_window(spark):
    ddf = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        skipgram_counts(ddf, window=0)


def test_top_pairs_deterministic_ties(spark):
    ddf = spark.createDataFrame(
        [(1, "a b"), (2, "a c"), (3, "b a")], ["doc_id", "text"]
    )
    rows = skipgram_top_pairs(ddf, window=1, k=2).collect()
    # all three pairs have count 1; ties break (center ASC, context ASC)
    assert [(r.center, r.context) for r in rows] == [("a", "b"), ("a", "c")]


def test_skipgram_plan_has_no_join(spark, sf_dir):
    """Pair generation must be the lead-window shape — no self-join of
    the positions table."""
    from etl_pipeline_excel_sql__spark.plans.cooccur_queries import (
        q_skipgram_top_pairs,
    )

    plan = (
        q_skipgram_top_pairs(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan  # top-k, not a full sort
