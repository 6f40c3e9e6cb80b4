"""Training-pair mining queries: hard-negative selection for
contrastive objectives (operators/similarity.hard_negatives_topk) —
the most-similar vectors that DON'T share the query's label, gated
against an exact-cosine DuckDB replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_excel_sql__spark.operators.similarity import (
    hard_negatives_topk,
)
from etl_pipeline_excel_sql__spark.plans.pipeline_queries import (
    EMB_DIMS,
    _cos_sql,
)
from etl_pipeline_excel_sql__spark.sources.registry import load_table

QUERIES: dict = {}
ORACLE: dict = {}

#: the mining batch: bounded by construction (it broadcasts).
HARDNEG_QUERY_MAX_ID = 8
HARDNEG_TOPK = 10


def q_hard_negatives_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 hard negatives (most-similar different-label vectors) for
    each of the 8 probe vectors. Label inequality prunes BEFORE the dot
    product; the probe batch broadcasts; ranking is the ANN family's
    reviewed computed-cosine class with neighbor_id tie-break."""
    emb = load_table(spark, "embeddings", sf_dir)
    return hard_negatives_topk(
        emb,
        emb.filter(F.col("vec_id") < HARDNEG_QUERY_MAX_ID),
        k=HARDNEG_TOPK,
        dims=EMB_DIMS,
    )


ORACLE["hard_negatives_topk"] = f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, q.label AS query_label,
         c.vec_id AS neighbor_id, c.label AS neighbor_label,
         {_cos_sql('q.embedding', 'c.embedding', EMB_DIMS)} AS cosine_sim
  FROM (SELECT * FROM embeddings WHERE vec_id < {HARDNEG_QUERY_MAX_ID}) q
  CROSS JOIN embeddings c
  WHERE c.label <> q.label
)
SELECT query_id, query_label, neighbor_id, neighbor_label, cosine_sim,
       CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY cosine_sim DESC, neighbor_id ASC) AS INT) AS rank
FROM scored QUALIFY rank <= {HARDNEG_TOPK}
"""
QUERIES["hard_negatives_topk"] = q_hard_negatives_topk
