"""Tests for the round-4c analytics family: trimmed mean, TWAP, M4
downsampling, basket association rules, column profiling, and the
deterministic weighted document sample."""

from __future__ import annotations

from etl_pipeline_excel_sql__spark.plans.analytics7_queries import (
    WSAMPLE_K,
    q_agg_trimmed_mean,
    q_basket_lift,
    q_events_m4_downsample,
    q_events_twap,
    q_profile_columns,
    q_text_weighted_sample,
)
from etl_pipeline_excel_sql__spark.sources.registry import load_table


def test_trimmed_mean_matches_driver_recompute(spark, sf_dir):
    rows = {r["l_returnflag"]: r for r in q_agg_trimmed_mean(spark, sf_dir).collect()}
    raw = (
        load_table(spark, "lineitem", sf_dir)
        .select("l_returnflag", "l_extendedprice")
        .collect()
    )
    by_flag: dict[str, list[float]] = {}
    for r in raw:
        by_flag.setdefault(r["l_returnflag"], []).append(r["l_extendedprice"])
    for flag, vals in by_flag.items():
        vals.sort()
        n = len(vals)
        lo = n * 500 // 10000
        kept = vals[lo : n - lo]
        got = rows[flag]
        assert got["n_total"] == n
        assert got["n_kept"] == len(kept)
        mean = sum(kept) / len(kept)
        assert abs(got["trimmed_mean"] - mean) <= 1e-6 * max(1.0, abs(mean))
        # trimming can only pull the mean inside the kept range
        assert kept[0] <= got["trimmed_mean"] <= kept[-1]


def test_twap_matches_driver_recompute(spark, sf_dir):
    got = {
        (r["user_id"], r["day"]): r for r in q_events_twap(spark, sf_dir).collect()
    }
    raw = load_table(spark, "events", sf_dir).select(
        "user_id", "ts", "event_id", "value"
    ).collect()
    by_day: dict[tuple, list] = {}
    for r in raw:
        key = (r["user_id"], r["ts"].strftime("%Y-%m-%d"))
        by_day.setdefault(key, []).append(r)
    assert set(got) == set(by_day)
    for key, evs in by_day.items():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        num = 0.0
        den = 0
        for a, b in zip(evs, evs[1:]):
            delta = b["ts"] - a["ts"]
            dur = (
                delta.days * 86_400_000_000
                + delta.seconds * 1_000_000
                + delta.microseconds
            )
            num += a["value"] * dur
            den += dur
        g = got[key]
        assert g["n_events"] == len(evs)
        assert g["den_us"] == den
        expect = num / den if den > 0 else sum(e["value"] for e in evs) / len(evs)
        assert abs(g["twap"] - expect) <= 1e-6 * max(1.0, abs(expect))
        vals = [e["value"] for e in evs]
        assert min(vals) - 1e-9 <= g["twap"] <= max(vals) + 1e-9


def test_m4_envelope_and_totals(spark, sf_dir):
    rows = q_events_m4_downsample(spark, sf_dir).collect()
    assert rows
    n_events = load_table(spark, "events", sf_dir).count()
    assert sum(r["n_points"] for r in rows) == n_events
    for r in rows:
        assert r["v_min"] <= r["v_first"] <= r["v_max"]
        assert r["v_min"] <= r["v_last"] <= r["v_max"]
        if r["n_points"] == 1:
            assert r["v_first"] == r["v_last"] == r["v_min"] == r["v_max"]


def test_basket_lift_invariants(spark, sf_dir):
    rows = q_basket_lift(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["brand_a"] < r["brand_b"]
        assert 0 < r["n_both"] <= min(r["n_a"], r["n_b"])
        assert max(r["n_a"], r["n_b"]) <= r["n_orders"]
        assert 0 < r["conf_ab_ppm"] <= 1_000_000
        assert r["conf_ab_ppm"] == r["n_both"] * 1_000_000 // r["n_a"]
        assert (
            r["lift_ppm"]
            == r["n_both"] * r["n_orders"] * 1_000_000 // (r["n_a"] * r["n_b"])
        )


def test_profile_columns_shape(spark, sf_dir):
    rows = {r["col_name"]: r for r in q_profile_columns(spark, sf_dir).collect()}
    assert set(rows) == {"l_quantity", "l_extendedprice", "l_discount", "l_tax"}
    n = load_table(spark, "lineitem", sf_dir).count()
    for r in rows.values():
        assert r["n_rows"] == n
        assert r["n_null"] == 0
        assert 0 < r["n_distinct"] <= n
        assert r["v_min"] <= r["v_max"]
    # discount is a low-cardinality ratio; price is near-unique
    assert rows["l_discount"]["n_distinct"] < rows["l_extendedprice"]["n_distinct"]


def test_weighted_sample_deterministic_and_biased(spark, sf_dir):
    s1 = q_text_weighted_sample(spark, sf_dir).collect()
    s2 = q_text_weighted_sample(spark, sf_dir).collect()
    assert [r["doc_id"] for r in s1] == [r["doc_id"] for r in s2]
    assert len(s1) == WSAMPLE_K
    pri = [r["priority"] for r in s1]
    assert pri == sorted(pri)
    # length-weighting must pull the sample's mean length above the corpus's
    corpus_mean = (
        load_table(spark, "documents", sf_dir)
        .agg({"n_chars": "avg"})
        .collect()[0][0]
    )
    sample_mean = sum(r["n_chars"] for r in s1) / len(s1)
    assert sample_mean > corpus_mean


def test_weighted_median_matches_driver_recompute(spark, sf_dir):
    from decimal import Decimal

    from etl_pipeline_excel_sql__spark.plans.analytics7_queries import (
        q_weighted_median_price,
    )

    rows = {
        r["l_returnflag"]: r
        for r in q_weighted_median_price(spark, sf_dir).collect()
    }
    raw = (
        load_table(spark, "lineitem", sf_dir)
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .collect()
    )
    by_flag: dict[str, list[tuple[float, Decimal]]] = {}
    for r in raw:
        by_flag.setdefault(r["l_returnflag"], []).append(
            (r["l_extendedprice"], Decimal(str(r["l_quantity"])))
        )
    for flag, pts in by_flag.items():
        pts.sort(key=lambda p: p[0])
        tot = sum(p[1] for p in pts)
        cum = Decimal(0)
        median = None
        for v, w in pts:
            cum += w
            if cum * 2 >= tot:
                median = v
                break
        got = rows[flag]
        assert got["weighted_median"] == median
        assert abs(got["total_weight"] - float(tot)) < 1e-6
