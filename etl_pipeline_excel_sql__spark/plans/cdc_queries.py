"""Content-defined chunking queries: the chunk-store dedup profile of
the documents corpus (operators/cdc.py — LBFS/restic-style rolling-hash
boundaries re-expressed over the token stream).

Oracles replay the identical pipeline in DuckDB: same 60-bit md5
boundary rule (H60_SQL — the shared hash contract), same running-sum
chunk numbering, same ``string_agg(tok, ' ' ORDER BY pos)`` chunk
digests, same packed-int64 canonical keeper — all integer/string math,
so every emitted column hashes exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_excel_sql__spark.functions.hashing import H60_SQL
from etl_pipeline_excel_sql__spark.operators.cdc import (
    CDC_DIVISOR,
    cdc_chunk_rows,
    cdc_corpus_stats,
    cdc_doc_stats,
    cdc_incremental_stats,
)
from etl_pipeline_excel_sql__spark.plans.spans_queries import _tok_sql
from etl_pipeline_excel_sql__spark.sources.registry import load_table

QUERIES: dict = {}
ORACLE: dict = {}

_H60_GRAM = H60_SQL.format(x="concat_ws(' ', lag(tok) OVER w, tok)")

def _chunks_cte(src: str, prefix: str = "") -> str:
    """Chunk rows over ``src`` — twin of ``cdc_chunk_rows``; CTE names
    get ``prefix`` so two corpora can be chunked in one statement."""
    p = prefix
    return f"""{p}toks AS MATERIALIZED ({_tok_sql(src)}
), {p}flagged AS (
  SELECT doc_id, pos, tok,
         CASE WHEN {_H60_GRAM} % {CDC_DIVISOR} = 0 THEN 1 ELSE 0 END AS bf
  FROM {p}toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), {p}chunked AS (
  SELECT doc_id, pos, tok,
         CAST(COALESCE(SUM(bf) OVER (
             PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS chunk_no
  FROM {p}flagged
), {p}chunks AS MATERIALIZED (
  SELECT doc_id, chunk_no, MIN(pos) AS pos0,
         COUNT(*) AS n_toks,
         md5(string_agg(tok, ' ' ORDER BY pos)) AS digest
  FROM {p}chunked GROUP BY doc_id, chunk_no
)"""


#: chunk rows + duplicate marks — the shared CTE chain the two
#: whole-corpus queries select from; twin of cdc_chunk_rows →
#: cdc_mark_duplicates.
_CDC_CTES = f"""{_chunks_cte("SELECT doc_id, text FROM documents")}, dd AS MATERIALIZED (
  SELECT digest, COUNT(*) AS cnt, MIN(doc_id * 2097152 + pos0) AS keepk
  FROM chunks GROUP BY digest
), marked AS MATERIALIZED (
  SELECT c.doc_id, c.n_toks,
         (d.cnt >= 2 AND c.doc_id * 2097152 + c.pos0 <> d.keepk) AS cut
  FROM chunks c JOIN dd d USING (digest)
)"""


def q_cdc_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document CDC dedup profile: how much of each document a
    content-addressed chunk store would NOT re-store (exact ppm)."""
    return cdc_doc_stats(load_table(spark, "documents", sf_dir))


ORACLE["cdc_chunk_stats"] = f"""
WITH {_CDC_CTES}
SELECT doc_id, COUNT(*) AS n_chunks,
       CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN cut THEN 1 ELSE 0 END) AS BIGINT) AS cut_chunks,
       CAST(SUM(CASE WHEN cut THEN n_toks ELSE 0 END) AS BIGINT)
         AS cut_tokens,
       CAST(SUM(CASE WHEN cut THEN n_toks ELSE 0 END) AS BIGINT) * 1000000
         // CAST(SUM(n_toks) AS BIGINT) AS cut_ppm
FROM marked GROUP BY doc_id
"""
QUERIES["cdc_chunk_stats"] = q_cdc_chunk_stats


def q_cdc_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus storage profile: unique vs total chunks, token
    savings in exact ppm, mean chunk length ×100 vs the expected
    CDC_DIVISOR."""
    return cdc_corpus_stats(load_table(spark, "documents", sf_dir))


ORACLE["cdc_dedup_stats"] = f"""
WITH {_CDC_CTES}
SELECT COUNT(*) AS total_chunks,
       (SELECT COUNT(*) FROM dd) AS unique_chunks,
       CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
       CAST(SUM(CASE WHEN cut THEN n_toks ELSE 0 END) AS BIGINT)
         AS cut_tokens,
       CAST(SUM(CASE WHEN cut THEN n_toks ELSE 0 END) AS BIGINT) * 1000000
         // CAST(SUM(n_toks) AS BIGINT) AS savings_ppm,
       CAST(SUM(n_toks) AS BIGINT) * 100 // COUNT(*) AS avg_chunk_toks_x100
FROM marked
"""
QUERIES["cdc_dedup_stats"] = q_cdc_dedup_stats


#: doc_id ≡ 0 (mod this) plays the incoming batch in the demo wiring —
#: the dedup_incremental / dedup_spans_incremental convention.
CDC_BATCH_MOD = 23


def q_cdc_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest shape: per incoming-batch document, the chunks/tokens the
    content-addressed store already holds (so the append writes only
    the complement). Store side = the chunk digest set of the rest of
    the corpus — what a chunk store persists between batches."""
    docs = load_table(spark, "documents", sf_dir)
    batch = docs.filter(F.col("doc_id") % CDC_BATCH_MOD == 0)
    corpus = docs.filter(F.col("doc_id") % CDC_BATCH_MOD != 0)
    return cdc_incremental_stats(
        batch, cdc_chunk_rows(corpus).select("digest")
    )


ORACLE["cdc_incremental"] = f"""
WITH {_chunks_cte(
    f"SELECT doc_id, text FROM documents WHERE doc_id % {CDC_BATCH_MOD} = 0"
)},
{_chunks_cte(
    f"SELECT doc_id, text FROM documents WHERE doc_id % {CDC_BATCH_MOD} <> 0",
    prefix="s_",
)},
store AS MATERIALIZED (SELECT DISTINCT digest FROM s_chunks),
m AS (
  SELECT c.doc_id, c.n_toks, (s.digest IS NOT NULL) AS stored
  FROM chunks c LEFT JOIN store s USING (digest)
)
SELECT doc_id, COUNT(*) AS n_chunks,
       CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN stored THEN 1 ELSE 0 END) AS BIGINT)
         AS stored_chunks,
       CAST(SUM(CASE WHEN stored THEN n_toks ELSE 0 END) AS BIGINT)
         AS stored_tokens,
       CAST(SUM(CASE WHEN stored THEN n_toks ELSE 0 END) AS BIGINT)
         * 1000000 // CAST(SUM(n_toks) AS BIGINT) AS stored_ppm
FROM m GROUP BY doc_id
"""
QUERIES["cdc_incremental"] = q_cdc_incremental
