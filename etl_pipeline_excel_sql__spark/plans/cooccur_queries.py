"""Skip-gram co-occurrence queries (operators/cooccur.py): the
word2vec/GloVe preprocessing stage as a gated row — forward pair
counts within a ±window, built via lead windows (never a positions
self-join), all integers so every column hashes exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_pipeline_excel_sql__spark.operators.cooccur import (
    skipgram_top_pairs,
)
from etl_pipeline_excel_sql__spark.plans.spans_queries import _tok_sql
from etl_pipeline_excel_sql__spark.sources.registry import load_table

QUERIES: dict = {}
ORACLE: dict = {}

SKIPGRAM_WINDOW = 3
SKIPGRAM_TOPK = 50


def q_skipgram_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 forward skip-gram pairs (window 3) over the documents
    corpus, deterministic ties (n_pairs DESC, center ASC, context ASC).
    Pair generation is the kgram lead-window shape: one shuffle by
    doc_id, no self-join; the pair table is bigram-vocabulary-scale."""
    return skipgram_top_pairs(
        load_table(spark, "documents", sf_dir),
        window=SKIPGRAM_WINDOW,
        k=SKIPGRAM_TOPK,
    )


_LEADS = ", ".join(
    f"lead(tok, {r}) OVER w AS c{r}" for r in range(1, SKIPGRAM_WINDOW + 1)
)
_PAIR_SELECTS = "\n  UNION ALL\n".join(
    f"  SELECT center, c{r} AS context FROM windowed WHERE c{r} IS NOT NULL"
    for r in range(1, SKIPGRAM_WINDOW + 1)
)

ORACLE["skipgram_top_pairs"] = f"""
WITH toks AS ({_tok_sql("SELECT doc_id, text FROM documents")}),
windowed AS MATERIALIZED (
  SELECT tok AS center, {_LEADS}
  FROM toks
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
pairs AS (
{_PAIR_SELECTS}
),
totals AS (
  SELECT center, context, CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM pairs GROUP BY center, context
)
SELECT center, context, n_pairs FROM totals
ORDER BY n_pairs DESC, center ASC, context ASC LIMIT {SKIPGRAM_TOPK}
"""
QUERIES["skipgram_top_pairs"] = q_skipgram_top_pairs
