"""User-behavior analytics over the event stream: ordered funnel
conversion and cohort retention — the two aggregate shapes every
product-analytics deployment runs daily (the Download/Upload reference
scripts' report tier, generalized to event data).

Cross-engine exactness: every emitted measure is an integer count or an
integer parts-per-million ratio (``n * 1e6 DIV total`` — the
``perceptron_confusion`` pattern); cohort days render as ``yyyy-MM-dd``
strings. No floats anywhere.

Scale shape:

* Funnel: each step scans only ITS OWN event type (filter pushed to the
  parquet scan) and aggregates min-timestamp per user — so step k's
  shuffle carries at most one row per user who reached step k-1, and
  every join keys on ``user_id`` (the same partitioning reused across
  steps; AQE coalesces). No per-user event lists are ever materialized.
* Retention: two hash aggregates (per-user first-day, per-(user, day)
  activity) joined on ``user_id``, then the bounded (cohort, offset)
  aggregate — the calendar bounds the final table, not the data volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel conversion: how many users performed ``steps[0]``,
    then ``steps[1]`` at-or-after their first ``steps[0]``, and so on
    (each step's anchor is the EARLIEST qualifying occurrence — the
    standard "first-touch" funnel semantics).

    Returns one row per step: ``(step, event_type, n_users, conv_ppm)``
    with ``conv_ppm`` the integer parts-per-million of step-1 users
    reaching this step.
    """
    if not steps:
        raise ValueError("funnel_steps: need at least one step")
    reached: list[DataFrame] = []
    prev: DataFrame | None = None
    for s in steps:
        ev = events.filter(F.col(type_col) == s).select(
            F.col(user_col).alias("user_id"), F.col(ts_col).alias("__ts")
        )
        if prev is not None:
            ev = ev.join(prev, on="user_id").filter(
                F.col("__ts") >= F.col("__anchor")
            )
        cur = ev.groupBy("user_id").agg(F.min("__ts").alias("__anchor"))
        reached.append(cur)
        prev = cur
    counts = None
    for i, (s, df) in enumerate(zip(steps, reached), start=1):
        row = df.agg(
            F.lit(i).cast("int").alias("step"),
            F.lit(s).alias("event_type"),
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
        )
        counts = row if counts is None else counts.unionByName(row)
    first = counts.filter(F.col("step") == 1).select(
        F.col("n_users").alias("__n1")
    )
    return counts.crossJoin(F.broadcast(first)).select(
        "step",
        "event_type",
        "n_users",
        F.expr(f"CAST(n_users * {PPM} DIV greatest(__n1, 1) AS BIGINT)").alias(
            "conv_ppm"
        ),
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Daily cohort retention: users grouped by their first-active day;
    for each later day offset, how many of them were active —
    ``(cohort_day, day_offset, cohort_size, n_active, retention_ppm)``.

    ``day_offset`` 0 is the cohort day itself (retention_ppm == 1e6 by
    construction — kept as the standard sanity anchor).
    """
    days = events.select(
        F.col(user_col).alias("user_id"),
        F.to_date(F.col(ts_col)).alias("__day"),
    ).distinct()
    cohorts = days.groupBy("user_id").agg(F.min("__day").alias("__cohort"))
    sizes = cohorts.groupBy("__cohort").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    active = (
        days.join(cohorts, on="user_id")
        .groupBy("__cohort", "__day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
    )
    return (
        active.join(sizes, on="__cohort")
        .select(
            F.date_format("__cohort", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff(F.col("__day"), F.col("__cohort"))
            .cast("int")
            .alias("day_offset"),
            "cohort_size",
            "n_active",
            F.expr(
                f"CAST(n_active * {PPM} DIV cohort_size AS BIGINT)"
            ).alias("retention_ppm"),
        )
    )
