"""Product-analytics queries over the event stream — ordered funnel
conversion and cohort retention (``operators/behavior``) — plus blocked
fuzzy record linkage over the part catalog (``operators/linkage``).

All three are integer-exact end to end (counts, ppm ratios, packed
arg-min, Levenshtein distances — both engines implement the same exact
integer edit distance), so the oracles hash bit-for-bit on any build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_excel_sql__spark.operators.behavior import (
    PPM,
    cohort_retention,
    funnel_steps,
)
from etl_pipeline_excel_sql__spark.operators.linkage import (
    _PACK_BASE,
    blocked_best_match,
)
from etl_pipeline_excel_sql__spark.sources.registry import load_table

QUERIES: dict = {}
ORACLE: dict = {}

#: the reference funnel: browse → engage → buy.
FUNNEL_STEPS = ["view", "click", "purchase"]


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch ordered-funnel conversion over 30 days of events:
    users who viewed, then clicked at-or-after their first view, then
    purchased at-or-after that click. Each step scans ONE event type
    (filter at the parquet scan) and shuffles ≤ one row per qualifying
    user on the reused ``user_id`` key — no per-user event lists."""
    return funnel_steps(load_table(spark, "events", sf_dir), FUNNEL_STEPS)


ORACLE["funnel_conversion"] = f"""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS a FROM events
  WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, MIN(e.ts) AS a FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND e.ts >= s1.a
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, MIN(e.ts) AS a FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND e.ts >= s2.a
  GROUP BY e.user_id
), counts AS (
  SELECT 1 AS step, '{FUNNEL_STEPS[0]}' AS event_type,
         (SELECT COUNT(*) FROM s1) AS n
  UNION ALL SELECT 2, '{FUNNEL_STEPS[1]}', (SELECT COUNT(*) FROM s2)
  UNION ALL SELECT 3, '{FUNNEL_STEPS[2]}', (SELECT COUNT(*) FROM s3)
)
SELECT CAST(step AS INT) AS step, event_type,
       CAST(n AS BIGINT) AS n_users,
       CAST(n * {PPM} // GREATEST((SELECT COUNT(*) FROM s1), 1) AS BIGINT)
         AS conv_ppm
FROM counts
"""
QUERIES["funnel_conversion"] = q_funnel_conversion


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-cohort retention triangle: first-active day buckets ×
    day offsets, integer ppm retention. Two user-keyed hash aggregates
    plus one calendar-bounded final aggregate."""
    return cohort_retention(load_table(spark, "events", sf_dir))


ORACLE["cohort_retention"] = f"""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), coh AS (
  SELECT user_id, MIN(day) AS cohort FROM days GROUP BY user_id
), sizes AS (
  SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_size
  FROM coh GROUP BY cohort
), act AS (
  SELECT cohort, day, CAST(COUNT(*) AS BIGINT) AS n_active
  FROM days JOIN coh USING (user_id) GROUP BY cohort, day
)
SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
       CAST(day - cohort AS INT) AS day_offset,
       cohort_size, n_active,
       CAST(n_active * {PPM} // cohort_size AS BIGINT) AS retention_ppm
FROM act JOIN sizes USING (cohort)
"""
QUERIES["cohort_retention"] = q_cohort_retention


#: every 17th part plays the reconciliation batch (bounded, broadcasts).
LINKAGE_PROBE_MOD = 17


def _parts_with_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The part catalog with its blocking key: the name's noun (second
    token) — the token-signature blocking classic. Block cardinality is
    the operator's contract (the LSH-band doctrine): ~8 nouns here, each
    block a bounded slice of the catalog."""
    return load_table(spark, "part", sf_dir).select(
        "p_partkey",
        "p_name",
        F.element_at(F.split(F.col("p_name"), " "), 2).alias("block"),
    )


def q_linkage_best_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution: for every probe part, the closest OTHER part
    name within its blocking group by exact Levenshtein distance,
    deterministic ties — the dirty-catalog merge primitive. Probe batch
    broadcasts; best match is a packed-integer arg-min aggregate (no
    window sort, map-side combine)."""
    cat = _parts_with_block(spark, sf_dir)
    return blocked_best_match(
        cat,
        cat.filter(F.col("p_partkey") % LINKAGE_PROBE_MOD == 0),
        key_col="p_partkey",
        name_col="p_name",
        block_col="block",
    )


ORACLE["linkage_best_match"] = f"""
WITH cat AS (
  SELECT p_partkey AS key, p_name AS name,
         split_part(p_name, ' ', 2) AS block
  FROM part
), probes AS (
  SELECT * FROM cat WHERE key % {LINKAGE_PROBE_MOD} = 0
), pairs AS (
  SELECT p.key, p.name, p.block,
         levenshtein(p.name, c.name) * {_PACK_BASE} + c.key AS packed
  FROM probes p JOIN cat c USING (block)
  WHERE c.key <> p.key
)
SELECT key AS p_partkey, name AS p_name, block,
       CAST(MIN(packed) % {_PACK_BASE} AS BIGINT) AS match_key,
       CAST(MIN(packed) // {_PACK_BASE} AS BIGINT) AS dist
FROM pairs GROUP BY key, name, block
"""
QUERIES["linkage_best_match"] = q_linkage_best_match
