"""Analytics widening, round 2b: exact second-moment statistics and
behavioral analytics over the events stream.

* ``corr_regression`` — Pearson correlation + least-squares slope/intercept
  per group, built from DECIMAL power sums (order-independent, exact) with
  the final arithmetic done once in IEEE doubles — the same
  exact-by-construction recipe as ``window_zscore``. Engine ``corr()`` /
  ``regr_slope()`` builtins stream float accumulators whose partial-sum
  order differs per engine/partitioning, so they can never hash-match an
  oracle; the power-sum formulation is bit-stable at any parallelism.
* ``cohort_retention`` — classic cohort table over ``events``: users
  grouped by first-activity day, counted per day-offset of later activity.
  Pure counts (hash-safe); two shuffles (per-user min, then cohort cell
  roll-up), both on high-cardinality keys.
* ``funnel_conversion`` — ordered funnel view→click→purchase, each stage
  anchored at the user's earliest qualifying event of the previous stage
  (a click only counts if it happens at-or-after the first view, and so
  on). Single-row count output.

Scale notes (100 TB): the power sums are partial-aggregatable map-side;
the funnel stages shuffle on ``user_id`` (high cardinality) and each stage
shrinks the population, so later joins ride broadcast at typical funnel
drop-offs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_excel_sql__spark.plans.analytics_queries import dec_out
from etl_pipeline_excel_sql__spark.sources.registry import load_table


def q_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corr / regr_slope / regr_intercept per return flag, exactly.

    x = l_quantity (integral 1..50), y = l_extendedprice (2-dp money).
    The five power sums n, Σx, Σy, Σx², Σy², Σxy ride DECIMAL — exact and
    order-independent under any partitioning — then become doubles via the
    string hop, and the closed-form statistics are a fixed dag of IEEE ops
    identical in both engines.
    """
    li = load_table(spark, "lineitem", sf_dir)
    x = F.col("l_quantity").cast("decimal(12,2)")
    y = F.col("l_extendedprice").cast("decimal(12,2)")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dec_out(F.sum(x).cast("decimal(38,2)")).alias("_sx"),
        dec_out(F.sum(y).cast("decimal(38,2)")).alias("_sy"),
        dec_out(F.sum((x * x).cast("decimal(30,4)")).cast("decimal(38,4)")).alias(
            "_sxx"
        ),
        dec_out(F.sum((y * y).cast("decimal(30,4)")).cast("decimal(38,4)")).alias(
            "_syy"
        ),
        dec_out(F.sum((x * y).cast("decimal(30,4)")).cast("decimal(38,4)")).alias(
            "_sxy"
        ),
    )
    n = F.col("n_rows").cast("double")
    cov_n = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    varx_n = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    vary_n = n * F.col("_syy") - F.col("_sy") * F.col("_sy")
    slope = cov_n / varx_n
    return agg.select(
        "l_returnflag",
        "n_rows",
        slope.alias("slope"),
        ((F.col("_sy") - slope * F.col("_sx")) / n).alias("intercept"),
        (cov_n / F.sqrt(varx_n * vary_n)).alias("pearson_r"),
    )


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort-retention matrix: first-activity-day cohorts × day offset.

    ``(user, day)`` is distinct before the roll-up, and every user belongs
    to exactly one cohort, so ``count(*)`` per cell IS the distinct-user
    count — no count-distinct shuffle needed.
    """
    ev = load_table(spark, "events", sf_dir)
    days = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    cohorts = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        days.join(cohorts, "user_id")
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("day", "cohort_day").cast("int").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view→click→purchase funnel, single-row counts.

    Each stage is the per-user MIN event time at-or-after the previous
    stage's anchor; a user converts at stage k only having converted at
    stage k-1. The three stage populations shrink monotonically.
    """
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "event_type", "ts"
    )
    t_view = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    t_click = (
        ev.filter(F.col("event_type") == "click")
        .join(t_view, "user_id")
        .filter(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    t_purchase = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t_click, "user_id")
        .filter(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    n_total = ev.select("user_id").distinct().agg(
        F.count(F.lit(1)).alias("n_users")
    )
    n_view = t_view.agg(F.count(F.lit(1)).alias("n_view"))
    n_click = t_click.agg(F.count(F.lit(1)).alias("n_click_after_view"))
    n_buy = t_purchase.agg(F.count(F.lit(1)).alias("n_purchase_after_click"))
    return (
        n_total.crossJoin(n_view).crossJoin(n_click).crossJoin(n_buy)
    )


ORACLE: dict[str, str] = {
    "corr_regression": """
        WITH sums AS (
          SELECT l_returnflag,
                 COUNT(*) AS n_rows,
                 CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)))
                      AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS sx,
                 CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
                      AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS sy,
                 CAST(CAST(CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(12,2))
                           * CAST(l_quantity AS DECIMAL(12,2))
                           AS DECIMAL(30,4)))
                      AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS sxx,
                 CAST(CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                           * CAST(l_extendedprice AS DECIMAL(12,2))
                           AS DECIMAL(30,4)))
                      AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS syy,
                 CAST(CAST(CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(12,2))
                           * CAST(l_extendedprice AS DECIMAL(12,2))
                           AS DECIMAL(30,4)))
                      AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS sxy
          FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, n_rows,
               (CAST(n_rows AS DOUBLE) * sxy - sx * sy)
                 / (CAST(n_rows AS DOUBLE) * sxx - sx * sx) AS slope,
               (sy - (CAST(n_rows AS DOUBLE) * sxy - sx * sy)
                 / (CAST(n_rows AS DOUBLE) * sxx - sx * sx) * sx)
                 / CAST(n_rows AS DOUBLE) AS intercept,
               (CAST(n_rows AS DOUBLE) * sxy - sx * sy)
                 / sqrt((CAST(n_rows AS DOUBLE) * sxx - sx * sx)
                        * (CAST(n_rows AS DOUBLE) * syy - sy * sy))
                 AS pearson_r
        FROM sums""",
    "cohort_retention": """
        WITH days AS (
          SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
        ), coh AS (
          SELECT user_id, MIN(day) AS cohort_day FROM days GROUP BY user_id
        )
        SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
               CAST(date_diff('day', cohort_day, day) AS INT) AS day_offset,
               COUNT(*) AS n_users
        FROM days JOIN coh USING (user_id)
        GROUP BY 1, 2""",
    "funnel_conversion": """
        WITH tv AS (
          SELECT user_id, MIN(ts) AS t_view FROM events
          WHERE event_type = 'view' GROUP BY user_id
        ), tc AS (
          SELECT e.user_id, MIN(e.ts) AS t_click
          FROM events e JOIN tv ON e.user_id = tv.user_id
          WHERE e.event_type = 'click' AND e.ts >= tv.t_view
          GROUP BY e.user_id
        ), tp AS (
          SELECT e.user_id, MIN(e.ts) AS t_purchase
          FROM events e JOIN tc ON e.user_id = tc.user_id
          WHERE e.event_type = 'purchase' AND e.ts >= tc.t_click
          GROUP BY e.user_id
        )
        SELECT (SELECT COUNT(DISTINCT user_id) FROM events) AS n_users,
               (SELECT COUNT(*) FROM tv) AS n_view,
               (SELECT COUNT(*) FROM tc) AS n_click_after_view,
               (SELECT COUNT(*) FROM tp) AS n_purchase_after_click""",
}

QUERIES = {
    "corr_regression": q_corr_regression,
    "cohort_retention": q_cohort_retention,
    "funnel_conversion": q_funnel_conversion,
}
