"""Blocked fuzzy record linkage over the part catalog
(``operators/linkage``) — best-match entity resolution, the dirty-catalog
merge primitive.

Integer-exact end to end (packed arg-min, Levenshtein distances — both
engines implement the same exact integer edit distance), so the oracle
hashes bit-for-bit on any build. (The behavior-analytics siblings —
ordered funnel and cohort retention — live in ``analytics3_queries`` as
``funnel_conversion``/``cohort_retention``.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_excel_sql__spark.operators.linkage import (
    _PACK_BASE,
    blocked_best_match,
)
from etl_pipeline_excel_sql__spark.sources.registry import load_table

QUERIES: dict = {}
ORACLE: dict = {}

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
