"""Temporal joins Spark lacks as built-ins: as-of join and range join.

**As-of join** (each left row matches the latest right row at-or-before its
timestamp, per key) is implemented with the union-and-window technique — the
scalable formulation:

1. tag both sides and UNION them on (key, time);
2. one window per key ordered by time carries the most recent right-side
   attributes forward (``last(..., ignorenulls=True)``);
3. keep only left rows.

This costs exactly ONE shuffle (the window's partitionBy key) regardless of
side sizes — versus the naive ``join + filter + row_number`` which shuffles
the full M×N inequality-join intermediate. This is the same plan Flink's
temporal join and kdb's aj execute.

**Range join** is an equi-join on key plus an interval predicate; Spark
evaluates the interval as a post-join filter within each key group, which is
the right plan when keys are selective (here: per-order / per-user groups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join, all three directions, still exactly ONE shuffle.

    * ``backward`` — latest right row with time ≤ left time (the common
      case; kdb ``aj`` / pandas ``merge_asof`` default);
    * ``forward`` — earliest right row with time ≥ left time;
    * ``nearest`` — whichever of the two is closer in absolute time
      distance; exact ties prefer the backward match (pandas semantics).

    All directions ride the same union-and-window plan: both sides union on
    (key, time) and a single ``partitionBy(key)`` window carries right-side
    attributes backward and/or forward. ``nearest`` adds no extra shuffle —
    it evaluates both frame directions inside the same window partition and
    picks per-row. Right-side ties on (key, time) resolve to the row that
    sorts last on the value tuple — deterministic. Output: all left columns
    + ``right_values``.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown as-of direction {direction!r}")

    # Right-side ties on (key, time) must resolve deterministically: keep the
    # row with the greatest value tuple (arbitrary but stable convention).
    tie_w = Window.partitionBy(key, right_time).orderBy(
        *[F.col(v).desc() for v in right_values]
    )
    right = (
        right.withColumn("__tie_rn", F.row_number().over(tie_w))
        .filter(F.col("__tie_rn") == 1)
        .drop("__tie_rn")
    )

    left_cols = left.columns
    # __rvals carries the right time too (__rt) so `nearest` can compare
    # distances without a second pass over the data.
    rstruct = F.struct(
        F.col(right_time).alias("__rt"), *[F.col(v) for v in right_values]
    )
    l = left.select(
        F.col(key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*left_cols).alias("__lrow"),
        F.lit(None).cast(
            right.select(rstruct.alias("s")).schema["s"].dataType
        ).alias("__rvals"),
    )
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            left.select(F.struct(*left_cols).alias("s")).schema["s"].dataType
        ).alias("__lrow"),
        rstruct.alias("__rvals"),
    )
    merged = l.unionByName(r)

    # At equal timestamps the right row must be visible to the left row in
    # BOTH directions (≤ / ≥ semantics): backward sorts right-before-left
    # (__is_left asc) and looks back; forward sorts left-before-right
    # (__is_left desc) and looks ahead. Same partitionBy → one exchange;
    # the second ordering costs only an extra local sort, no extra shuffle.
    w_back = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__is_left").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    if direction in ("backward", "nearest"):
        merged = merged.withColumn(
            "__back", F.last("__rvals", ignorenulls=True).over(w_back)
        )
    if direction in ("forward", "nearest"):
        merged = merged.withColumn(
            "__fwd", F.first("__rvals", ignorenulls=True).over(w_fwd)
        )

    if direction == "backward":
        asof = F.col("__back")
    elif direction == "forward":
        asof = F.col("__fwd")
    else:
        from pyspark.sql.types import NumericType

        # Distances exactly, per time-column type. Numeric time columns
        # subtract directly — routing them through cast("timestamp") would
        # interpret them as SECONDS and saturate at Long.MAX for values
        # past ~2^63/1e6 (epoch-micros columns!), silently collapsing both
        # distances to 0. Temporal columns go through unix_micros (integer
        # micros — a double of epoch seconds can lose the micro digits and
        # flip a tie).
        if isinstance(merged.schema["__t"].dataType, NumericType):
            def _us(c):  # noqa: ANN001, ANN202
                return c
        else:
            def _us(c):  # noqa: ANN001, ANN202
                return F.unix_micros(c.cast("timestamp"))

        back_dist = _us(F.col("__t")) - _us(F.col("__back.__rt"))
        fwd_dist = _us(F.col("__fwd.__rt")) - _us(F.col("__t"))
        asof = (
            F.when(F.col("__back").isNull(), F.col("__fwd"))
            .when(F.col("__fwd").isNull(), F.col("__back"))
            .when(back_dist <= fwd_dist, F.col("__back"))
            .otherwise(F.col("__fwd"))
        )

    out = merged.withColumn("__asof", asof).filter(
        F.col("__is_left") == 1
    ).select(
        *[F.col("__lrow")[c].alias(c) for c in left_cols],
        *[F.col("__asof")[v].alias(v) for v in right_values],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    key_left: str,
    key_right: str,
    time_left: str,
    lower: str,
    upper: str,
) -> DataFrame:
    """Equi-join on key with an interval predicate on the left's time column.

    ``right.lower <= left.time <= right.upper`` — expressed declaratively so
    Catalyst plans the equi-part as a hash join and the interval as a
    residual filter (and can pick AQE skew handling on hot keys).
    """
    return left.join(
        right,
        on=(F.col(key_left) == F.col(key_right))
        & (F.col(time_left) >= F.col(lower))
        & (F.col(time_left) <= F.col(upper)),
    )
