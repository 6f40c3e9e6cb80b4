"""Property tests for the bucket-replicated band join and the passage
dedup against brute-force pure-Python references.

The DuckDB oracle checks the fixed corpus; these check the FORMULATIONS
over adversarial shapes hypothesis generates: events piled on bucket
boundaries (the off-by-one surface of the 2-bucket replication), empty
build sides, all-duplicate passages, and passage counts straddling the
document-frequency cap.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# --- band join ---------------------------------------------------------

#: timestamps in *microseconds*, clustered so windows overlap and land on
#: exact bucket boundaries (multiples of the band width included).
BAND_US = 600_000_000
TS = st.integers(min_value=0, max_value=4 * BAND_US).map(
    lambda v: (v // 100_000_000) * 100_000_000  # 0.1-bucket granularity
)
probe_rows = st.lists(TS, min_size=0, max_size=15)
build_rows = st.lists(TS, min_size=0, max_size=15)


def _brute_counts(probes, builds):
    return [
        sum(1 for b in builds if p - BAND_US <= b <= p) for p in probes
    ]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(probes=probe_rows, builds=build_rows)
def test_bucketed_band_join_equals_brute_force(spark, probes, builds):
    """The bucket-replicated equi-join + exact filter must equal the
    brute-force O(n*m) band count for every probe row — including rows
    exactly on bucket boundaries and window edges."""
    from pyspark.sql import functions as F

    probe = spark.createDataFrame(
        [(i, t) for i, t in enumerate(probes)], "pid long, pts long"
    )
    build = spark.createDataFrame([(t,) for t in builds], "ets long")
    build_b = build.withColumn("bucket", F.expr(f"ets div {BAND_US}"))
    probe2 = probe.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.expr(f"pts div {BAND_US}"),
                F.expr(f"pts div {BAND_US} - 1"),
            )
        ),
    )
    j = probe2.join(build_b, "bucket").filter(
        (F.col("ets") <= F.col("pts"))
        & (F.col("ets") >= F.col("pts") - BAND_US)
    )
    cnt = {
        int(r.pid): int(r.n)
        for r in j.groupBy("pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got = [cnt.get(i, 0) for i in range(len(probes))]
    assert got == _brute_counts(probes, builds)


# --- passage dedup -----------------------------------------------------

WORD = st.sampled_from(["a", "b", "c", "d"])
doc_texts = st.lists(
    st.lists(WORD, min_size=0, max_size=25).map(" ".join),
    min_size=1,
    max_size=8,
)


def _brute_passage_dedup(texts, w, max_df):
    def toks(t):
        return [x for x in t.split(" ") if x]

    passages = {}  # doc -> [(pos, passage)]
    for d, t in enumerate(texts):
        ws = toks(t)
        passages[d] = [
            (i // w, " ".join(ws[i : i + w]))
            for i in range(0, len(ws), w)
        ]
    from collections import defaultdict

    df = defaultdict(set)
    for d, ps in passages.items():
        for _, p in ps:
            df[p].add(d)
    boiler = {p for p, docs in df.items() if len(docs) > max_df}
    out = {}
    for d, ps in passages.items():
        kept = [(pos, p) for pos, p in ps if p not in boiler]
        out[d] = (
            len(ps),
            len(kept),
            " ".join(p for _, p in sorted(kept)),
        )
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(texts=doc_texts)
def test_passage_dedup_equals_brute_force(spark, texts, tmp_path_factory):
    """The distributed md5-keyed passage dedup must reproduce the naive
    per-document reference exactly, including all-boilerplate documents
    (empty clean_text) and passages repeated within one document (the df
    counts DISTINCT docs, so self-repeats never trip the cap)."""
    import json

    from etl_pipeline_excel_sql__spark.plans.corpus2_queries import (
        PASSAGE_MAX_DF,
        PASSAGE_W,
        q_text_passage_dedup,
    )

    sf_dir = tmp_path_factory.mktemp("passage_sf")
    rows = [(i, t, "xx", "src", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(sf_dir / "documents.parquet")
    )
    got = {
        int(r.doc_id): (int(r.n_passages), int(r.n_kept), r.clean_text)
        for r in q_text_passage_dedup(spark, str(sf_dir)).collect()
    }
    want = _brute_passage_dedup(texts, PASSAGE_W, PASSAGE_MAX_DF)
    assert got == want
