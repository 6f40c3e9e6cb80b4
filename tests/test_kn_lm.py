"""Kneser-Ney bigram scoring (plans/corpus2_queries.q_kn_lm_score):
exact-rational twin + probability-mass property."""

from __future__ import annotations

from collections import Counter
from fractions import Fraction

from etl_pipeline_excel_sql__spark.plans.corpus2_queries import (
    KN_D_DEN,
    KN_D_NUM,
    LM_SCALE,
    q_kn_lm_score,
)

CORPUS = {
    0: "a b a b c",
    1: "a b c a",
    2: "b c b a a",
    3: "c c a b",
}


def _model():
    """Bigram model counts from CORPUS: c2, c1, n1f, n1p, bt."""
    c2: Counter = Counter()
    doc_pairs: dict[int, Counter] = {}
    for doc, text in CORPUS.items():
        t = text.split()
        ps = Counter(zip(t, t[1:]))
        doc_pairs[doc] = ps
        c2.update(ps)
    c1: Counter = Counter()
    n1f: Counter = Counter()
    n1p: Counter = Counter()
    for (w1, w2), c in c2.items():
        c1[w1] += c
        n1f[w1] += 1
        n1p[w2] += 1
    return c2, c1, n1f, n1p, len(c2), doc_pairs


def _s_scaled(c2, c1, n1f, n1p, bt) -> int:
    """The registered single-floor scaled score."""
    num = (
        max(KN_D_DEN * c2 - KN_D_NUM, 0) * bt + KN_D_NUM * n1f * n1p
    ) * LM_SCALE
    return num // (KN_D_DEN * c1 * bt)


def test_kn_mass_sums_to_one_per_prefix():
    """Exact-rational sanity of the formula itself: for every prefix w1,
    sum over the FULL vocab of P_KN(w2|w1) == 1 (discounted mass exactly
    re-distributed by continuation probability)."""
    c2, c1, n1f, n1p, bt, _ = _model()
    vocab = sorted({w for pair in c2 for w in pair})
    d = Fraction(KN_D_NUM, KN_D_DEN)
    # P_cont must itself sum to 1 over the vocab
    assert sum(Fraction(n1p[w], bt) for w in vocab) == 1
    for w1 in {a for a, _ in c2}:
        mass = sum(
            Fraction(max(c2.get((w1, w2), 0) - d, 0), c1[w1])
            + d * Fraction(n1f[w1], c1[w1]) * Fraction(n1p[w2], bt)
            for w2 in vocab
        )
        assert mass == 1, (w1, mass)


def test_kn_query_matches_fraction_twin(spark, tmp_path):
    """The Spark query reproduces the integer twin exactly on a corpus
    small enough to enumerate by hand."""
    rows = [
        (doc, text, "en", "src", len(text)) for doc, text in CORPUS.items()
    ]
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, "
        "n_chars LONG"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    c2, c1, n1f, n1p, bt, doc_pairs = _model()
    expect = {}
    for doc, ps in doc_pairs.items():
        num = den = 0
        for (w1, w2), k in ps.items():
            s = _s_scaled(c2[(w1, w2)], c1[w1], n1f[w1], n1p[w2], bt)
            num += k * s
            den += k
        expect[doc] = (den, num // den)
    got = {
        r.doc_id: (r.n_bigrams, r.kn_score_scaled)
        for r in q_kn_lm_score(spark, str(tmp_path)).collect()
    }
    assert got == expect


def test_ccnet_buckets_partition_by_exact_terciles(spark, sf_dir):
    """Buckets are a partition of the scored docs, cut at the exact
    33rd/67th percentile score values (computed naively here)."""
    import math

    from etl_pipeline_excel_sql__spark.plans.corpus2_queries import (
        q_ccnet_ppl_buckets,
        q_kn_lm_score,
    )

    scores = sorted(
        (r.kn_score_scaled, r.doc_id)
        for r in q_kn_lm_score(spark, sf_dir).collect()
    )
    n = len(scores)
    c33 = scores[max(1, math.ceil(33 * n / 100)) - 1][0]
    c67 = scores[max(1, math.ceil(67 * n / 100)) - 1][0]
    got = q_ccnet_ppl_buckets(spark, sf_dir).collect()
    assert len(got) == n
    for r in got:
        want = (
            "head" if r.kn_score_scaled > c67
            else "middle" if r.kn_score_scaled > c33
            else "tail"
        )
        assert r.bucket == want, (r, c33, c67)
    assert {r.bucket for r in got} == {"head", "middle", "tail"}
