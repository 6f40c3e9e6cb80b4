"""Round-11 family pins: session-view IVM boundary stitching,
token-budget curation selection, cluster-safe split assignment."""

from __future__ import annotations

import duckdb
import pyarrow.parquet as pq
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# --- incremental_session_merge ---------------------------------------------


def test_session_merge_exercises_both_boundary_branches():
    """The data contract behind the 12-h gap choice: at the gate SFs,
    SOME users' boundary sessions fuse and some don't — if a testdata
    regeneration ever collapses this to one branch, the IVM row stops
    testing the stitch and this pin fails loudly."""
    from etl_pipeline_excel_sql__spark.plans.analytics5_queries import (
        SESSION_CUT_DEN,
        SESSION_CUT_NUM,
        SESSION_GAP_US,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    merged, n = con.execute(
        f"""
WITH b AS (SELECT MIN(epoch_us(ts)) mn, MAX(epoch_us(ts)) mx FROM events),
cut AS (SELECT mn + (mx-mn)*{SESSION_CUT_NUM}//{SESSION_CUT_DEN} c FROM b),
base AS (SELECT user_id, MAX(epoch_us(ts)) e FROM events, cut
         WHERE epoch_us(ts) < c GROUP BY user_id),
delta AS (SELECT user_id, MIN(epoch_us(ts)) s FROM events, cut
          WHERE epoch_us(ts) >= c GROUP BY user_id)
SELECT SUM(CASE WHEN d.s - b.e <= {SESSION_GAP_US} THEN 1 ELSE 0 END),
       COUNT(*)
FROM base b JOIN delta d USING (user_id)"""
    ).fetchall()[0]
    assert merged > 0, "no user fuses at the boundary - stitch untested"
    assert merged < n, "every user fuses - the no-merge branch untested"


def test_session_merge_matches_direct_sessionize(spark):
    """The stitched view equals direct sessionization over all events
    (engine-side replica of the oracle identity, plus conservation)."""
    from etl_pipeline_excel_sql__spark.plans.analytics5_queries import (
        QUERIES,
    )
    from etl_pipeline_excel_sql__spark.sources.registry import load_table

    got = {
        r.user_id: (r.n_sessions, r.total_events, r.max_session_events)
        for r in QUERIES["incremental_session_merge"](spark, SF).collect()
    }
    n_events = load_table(spark, "events", SF).count()
    assert sum(v[1] for v in got.values()) == n_events
    assert all(v[0] >= 1 and v[2] <= v[1] for v in got.values())


# --- curation_budget_select ------------------------------------------------


def test_budget_select_spends_exactly_up_to_budget(spark):
    from etl_pipeline_excel_sql__spark.plans.quality_queries import (
        BUDGET_DEN,
        BUDGET_NUM,
        QUERIES,
    )
    from etl_pipeline_excel_sql__spark.functions.text import ws_tokens
    from etl_pipeline_excel_sql__spark.sources.registry import load_table

    docs = load_table(spark, "documents", SF)
    total = docs.select(
        F.sum(F.size(ws_tokens(F.col("text")))).alias("t")
    ).collect()[0]["t"]
    budget_edge = total * BUDGET_NUM  # compare cum*DEN < total*NUM
    got = QUERIES["curation_budget_select"](spark, SF).collect()
    assert got, "selection is empty"
    # every selected doc started strictly inside the budget
    assert all(r.cum_before * BUDGET_DEN < budget_edge for r in got)
    # the selection REACHES the budget (last doc may overshoot)
    spent_through = max(r.cum_before + r.n_tokens for r in got)
    assert spent_through * BUDGET_DEN >= budget_edge
    # the selection is a contiguous prefix in token space: the
    # cum_before values tile [0, spent) with no gaps or overlaps
    ivals = sorted((r.cum_before, r.n_tokens) for r in got)
    pos = 0
    for start, ntok in ivals:
        assert start == pos, f"gap/overlap at {start} (expected {pos})"
        pos = start + ntok
    # the selection starts at the TOP of the quality order: permille 0
    # (rank 1 of some language) is always inside the budget prefix, and
    # the selected permille range is the LOW (best) end
    assert min(r.permille for r in got) == 0
    # and it is quality-biased: selected mean permille beats the
    # corpus-wide mean (permille ASC = better)
    from etl_pipeline_excel_sql__spark.plans.quality_queries import (
        QUERIES as QQ,
    )

    allp = [r.permille for r in QQ["quality_domain_rank"](spark, SF).collect()]
    sel_mean = sum(r.permille for r in got) / len(got)
    assert sel_mean < sum(allp) / len(allp)


# --- cluster_safe_splits ---------------------------------------------------


def test_cluster_safe_splits_zero_leaks_and_conserving(spark):
    from etl_pipeline_excel_sql__spark.plans.pipeline_queries import (
        QUERIES,
    )

    got = QUERIES["cluster_safe_splits"](spark, SF).collect()
    n_docs_corpus = pq.read_table(f"{SF}/documents.parquet").num_rows
    assert sum(r.n_docs for r in got) == n_docs_corpus
    assert all(r.leak_pairs == 0 for r in got)
    assert all(1 <= r.n_groups <= r.n_docs for r in got)
    assert {r.split for r in got} <= {"train", "val", "test"}


def test_doc_keyed_split_does_leak_where_cluster_keyed_does_not(spark):
    """The reason the family exists: the per-DOCUMENT hash split leaks
    near-dup pairs across splits on this corpus (split_leakage_audit
    returns rows), while the cluster-keyed assignment provably cannot.
    If the corpus ever stops producing doc-keyed leaks the contrast is
    vacuous - skip rather than fail in that case."""
    import pytest

    from etl_pipeline_excel_sql__spark.plans.pipeline_queries import (
        QUERIES,
    )

    doc_leaks = QUERIES["split_leakage_audit"](spark, SF).count()
    if doc_leaks == 0:
        pytest.skip("corpus produces no doc-keyed leaks at this SF")
    cluster = QUERIES["cluster_safe_splits"](spark, SF).collect()
    assert sum(r.leak_pairs for r in cluster) == 0


# --- stream_join_left ------------------------------------------------------


def test_stream_left_join_emits_both_outer_and_matched_rows(spark):
    """The drained+settled left-outer stream join must contain BOTH row
    classes at the gate SF: engine-emitted null rows (the state-timeout
    path this family exists for) and matched attributions — and every
    click below the settle cutoff appears exactly once per match (at
    least once overall)."""
    from etl_pipeline_excel_sql__spark.plans.streaming_queries import (
        QUERIES,
    )

    got = QUERIES["stream_join_left"](spark, SF).collect()
    outer = [r for r in got if r.purchase_id is None]
    matched = [r for r in got if r.purchase_id is not None]
    assert outer, "no engine-emitted outer rows - timeout path untested"
    assert matched, "no matched rows - join path untested"
    # a click appears once (unmatched) or once per matching purchase;
    # it never appears both matched AND as an outer null
    from collections import defaultdict

    by_click = defaultdict(list)
    for r in got:
        by_click[r.click_id].append(r.purchase_id)
    for cid, pids in by_click.items():
        assert (pids == [None]) or all(p is not None for p in pids), cid


# --- pareto_quality_length -------------------------------------------------


def test_pareto_frontier_matches_brute_force(spark):
    """Frontier equals the O(n²) dominance definition computed directly
    (per language): kept iff no other doc scores >= with <= tokens and
    is strictly better on one axis."""
    from etl_pipeline_excel_sql__spark.plans.quality_queries import QUERIES

    got = {
        (r.lang, r.doc_id) for r in QUERIES["pareto_quality_length"](spark, SF).collect()
    }
    # brute force over the same scored tuples
    from etl_pipeline_excel_sql__spark.functions.text import (
        STOPWORDS,
        stopword_hits,
        ws_tokens,
    )
    from etl_pipeline_excel_sql__spark.sources.registry import load_table

    docs = load_table(spark, "documents", SF)
    toks = ws_tokens(F.col("text"))
    hits = F.lit(0)
    for lg in sorted(STOPWORDS):
        hits = F.when(F.col("lang") == lg, stopword_hits(toks, lg)).otherwise(hits)
    rows = docs.select(
        "doc_id",
        "lang",
        hits.alias("h"),
        F.size(toks).cast("bigint").alias("t"),
    ).collect()
    scored = [
        (r.lang, r.doc_id, (r.h * 1000000) // max(r.t, 1), r.t) for r in rows
    ]
    want = set()
    for lang, did, s, t in scored:
        dominated = any(
            lg == lang
            and s2 >= s
            and t2 <= t
            and (s2 > s or t2 < t)
            for lg, _, s2, t2 in scored
        )
        if not dominated:
            want.add((lang, did))
    assert got == want


# --- shard_rebalance_audit -------------------------------------------------


def test_shard_rebalance_consistency_property(spark):
    """The audit must PROVE consistent hashing's guarantee on the
    corpus: every ring-moved key moves TO the new shard (never between
    old shards), the ring moves a small fraction (~1/(N+1)), and mod
    placement moves the large fraction (~N/(N+1))."""
    from etl_pipeline_excel_sql__spark.plans.ops_queries import QUERIES

    r = QUERIES["shard_rebalance_audit"](spark, SF).collect()[0]
    assert r.moved_ring == r.moved_ring_to_new
    assert 0 < r.moved_ring < r.moved_mod
    # loose statistical bounds: ring ~1/9 (111k ppm), mod ~8/9 (889k)
    assert 20_000 <= r.moved_ring_ppm <= 350_000
    assert 700_000 <= r.moved_mod_ppm <= 980_000


# --- minhash_band_tuning ---------------------------------------------------


def test_band_tuning_scurve_monotonicity(spark):
    """Wider bands (more rows per band) can only shrink the candidate
    set and the recall — the S-curve the tuning table exists to
    measure; n_truth is config-invariant."""
    from etl_pipeline_excel_sql__spark.plans.pipeline_queries import QUERIES

    rows = sorted(
        QUERIES["minhash_band_tuning"](spark, SF).collect(),
        key=lambda r: r.band_rows,
    )
    assert [r.band_rows for r in rows] == [1, 2, 3, 4, 6]
    assert len({r.n_truth for r in rows}) == 1
    for a, b in zip(rows, rows[1:]):
        assert b.n_candidates <= a.n_candidates
        assert b.n_hit <= a.n_hit
        assert b.recall_ppm <= a.recall_ppm
    assert all(r.n_hit <= r.n_truth for r in rows)
    assert all(r.n_hit <= r.n_candidates for r in rows)


# --- corpus-health rows + fertility ----------------------------------------


def test_dup_spectrum_conserves_and_finds_structure(spark):
    from etl_pipeline_excel_sql__spark.plans.corpus2_queries import QUERIES

    got = QUERIES["dup_size_spectrum"](spark, SF).collect()
    n_docs_corpus = pq.read_table(f"{SF}/documents.parquet").num_rows
    assert sum(r.n_docs for r in got) == n_docs_corpus
    assert all(r.n_docs == r.cluster_size * r.n_clusters for r in got)
    sizes = {r.cluster_size for r in got}
    assert 1 in sizes, "no singleton row"
    assert any(s >= 2 for s in sizes), "no near-dup families found"


def test_effective_size_discounts_near_dups(spark):
    from etl_pipeline_excel_sql__spark.plans.corpus2_queries import QUERIES

    got = QUERIES["effective_corpus_size"](spark, SF).collect()
    n_docs_corpus = pq.read_table(f"{SF}/documents.parquet").num_rows
    assert sum(r.n_docs for r in got) == n_docs_corpus
    assert all(r.effective_tokens <= r.raw_tokens for r in got)
    assert all(r.n_clusters <= r.n_docs for r in got)
    # the corpus HAS near-dups, so somewhere tokens were saved
    assert any(r.savings_ppm > 0 for r in got)


def test_bpe_fertility_at_least_one_subword_per_word(spark):
    from etl_pipeline_excel_sql__spark.plans.analytics5_queries import (
        QUERIES,
    )

    got = QUERIES["bpe_fertility_by_lang"](spark, SF).collect()
    assert got and all(r.n_words > 0 for r in got)
    # BPE splits a word into >= 1 subwords, so fertility >= 1e6 ppm
    assert all(r.fertility_ppm >= 1_000_000 for r in got)
    # and the fertilities differ across languages (the signal the audit
    # exists to surface)
    assert len({r.fertility_ppm for r in got}) > 1
