"""Round-5 quality-measurement queries.

``ann_recall`` pins the QUALITY of the approximate ANN path as a
CORRECTNESS row, not just a pytest assertion: recall@5 of
``ann_ivf_topk`` against the exact ``ann_brute_topk`` baseline, computed
engine-side per query vector and hash-matched against a DuckDB twin that
joins the two result oracles. If a future change silently degrades the
IVF probe (wrong cell assignment, broken nprobe ranking), the recall
vector changes and the driver gate catches it — the approximate operator
family gets the same regression protection as the exact ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_excel_sql__spark.plans.pipeline_queries import (
    _ANN_BRUTE_SQL,
    _ANN_IVF_SQL,
    q_ann_brute_topk,
    q_ann_ivf_topk,
)

RECALL_K = 5


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@5 of the IVF probe vs the exact baseline.

    Output: (query_id, n_hits, recall_at_5). The brute-force top-5 set is
    ground truth (its k=10 result is rank-filtered); a hit is a neighbor
    the IVF top-5 shares. Queries where IVF found nothing still appear
    (n_hits=0) via the left join from the ground-truth query set.

    Both inputs are tiny (n_queries × k rows), so the joins broadcast;
    the cost is the two ANN subtrees themselves.
    """
    brute5 = q_ann_brute_topk(spark, sf_dir).filter(
        F.col("rank") <= RECALL_K
    )
    ivf = q_ann_ivf_topk(spark, sf_dir).select("query_id", "neighbor_id")
    hits = (
        brute5.join(ivf, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("__hits"))
    )
    base = brute5.select("query_id").distinct()
    n_hits = F.coalesce(F.col("__hits"), F.lit(0))
    return base.join(hits, "query_id", "left").select(
        "query_id",
        n_hits.cast("int").alias("n_hits"),
        (n_hits.cast("double") / F.lit(float(RECALL_K))).alias(
            "recall_at_5"
        ),
    )


ORACLE: dict[str, str] = {
    "ann_recall": f"""
        WITH brute AS ({_ANN_BRUTE_SQL}),
        ivf AS ({_ANN_IVF_SQL}),
        b5 AS (
          SELECT query_id, neighbor_id FROM brute WHERE rank <= {RECALL_K}
        ),
        hits AS (
          SELECT b.query_id, COUNT(*) AS n_hits
          FROM b5 b JOIN ivf i
            ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
          GROUP BY b.query_id
        )
        SELECT q.query_id,
               CAST(COALESCE(h.n_hits, 0) AS INT) AS n_hits,
               CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / {float(RECALL_K)}
                 AS recall_at_5
        FROM (SELECT DISTINCT query_id FROM b5) q
        LEFT JOIN hits h USING (query_id)""",
}

QUERIES = {
    "ann_recall": q_ann_recall,
}
