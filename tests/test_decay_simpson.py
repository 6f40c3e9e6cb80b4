"""Python twins for events_decay_score and text_simpson_diversity."""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter


def test_decay_score_matches_python_twin(spark, tmp_path):
    from etl_pipeline_excel_sql__spark.plans.analytics7_queries import (
        DECAY_CAP_DAYS,
        q_events_decay_score,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # (event_id, ts, user_id, event_type, value, props)
        (1, t0, 7, "click", 10.5, "{}"),
        (2, t0 + dt.timedelta(days=1), 7, "click", 10.5, "{}"),
        (3, t0 + dt.timedelta(days=2, hours=23), 7, "buy", 0.25, "{}"),
        (4, t0 + dt.timedelta(days=2, hours=23), 9, "buy", 499.999999, "{}"),
        (5, t0 - dt.timedelta(days=100), 9, "old", 400.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, event_type STRING,"
        " value DOUBLE, props STRING",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    tmax = max(r[1] for r in rows)
    expect: dict[int, int] = {}
    counts: Counter = Counter()
    for _, ts, uid, _t, value, _p in rows:
        age = min(
            int((tmax - ts).total_seconds() * 1_000_000) // 86_400_000_000,
            DECAY_CAP_DAYS,
        )
        expect[uid] = expect.get(uid, 0) + (
            math.floor(value * 1_000_000) >> age
        )
        counts[uid] += 1
    got = {
        r.user_id: (r.n_events, r.decay_score_u)
        for r in q_events_decay_score(spark, str(tmp_path)).collect()
    }
    assert got == {u: (counts[u], s) for u, s in expect.items()}


def test_simpson_diversity_twin_and_bounds(spark, tmp_path):
    from etl_pipeline_excel_sql__spark.plans.quality_queries import (
        q_text_simpson_diversity,
    )

    corpus = {
        0: "a a a a",          # zero diversity
        1: "a b c d",          # max diversity for n=4: 1 - 4/16
        2: "a a b b b",
        3: "x",
    }
    rows = [(d, t, "en", "s", len(t)) for d, t in corpus.items()]
    spark.createDataFrame(
        rows,
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        r.doc_id: (r.n_tokens, r.distinct_tokens, r.simpson_ppm)
        for r in q_text_simpson_diversity(spark, str(tmp_path)).collect()
    }
    expect = {}
    for d, t in corpus.items():
        k = Counter(t.split())
        n = sum(k.values())
        expect[d] = (
            n,
            len(k),
            1_000_000 - sum(v * v for v in k.values()) * 1_000_000 // (n * n),
        )
    assert got == expect
    assert got[0][2] == 0
    assert got[3][2] == 0
    assert got[1][2] == 750_000
