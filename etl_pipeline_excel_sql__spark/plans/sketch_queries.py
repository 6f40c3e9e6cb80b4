"""Engine-exact HyperLogLog queries (operators/sketches.py): per-language
distinct 3-token-shingle sketches plus the merged corpus sketch, each
next to the exact count it approximates — the oracle-gated counterpart
to the rows-only ``approx_distinct``. Shingles (not raw tokens) are the
sketched value because the synthetic corpus's unigram vocabulary is ~31
types — far below the m=64 raw-estimator regime — while its 3-gram
space is ~16k, where the estimate's ~1/sqrt(m) error is meaningful and
gated via the emitted err_ppm.

The oracle replays the identical integer pipeline in DuckDB (same
``H60_SQL`` hash, same un-padded ``bin()`` bitlength, same shifted
harmonic sum and rational-alpha division), so every column — including
the estimate itself — hashes exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_excel_sql__spark.functions.hashing import H60_SQL
from etl_pipeline_excel_sql__spark.functions.text import ws_tokens
from etl_pipeline_excel_sql__spark.operators.sketches import (
    CMS_D,
    CMS_MAX_W_LOG2,
    CMS_MIN_W_LOG2,
    CMS_TARGET_LOAD,
    HLL_ALPHA_DEN,
    HLL_ALPHA_NUM,
    HLL_M,
    HLL_RHO_SCALE,
    adaptive_cms_w,
    cms_build,
    cms_query,
    hll_estimate,
    hll_registers,
)
from etl_pipeline_excel_sql__spark.plans.spans_queries import _tok_sql
from etl_pipeline_excel_sql__spark.sources.registry import load_table

QUERIES: dict = {}
ORACLE: dict = {}

#: shingle width for the sketched value.
HLL_SHINGLE_K = 3


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, sh) — every 3-token window, the ``kgram_rows`` lead-window
    shape with the language tag carried through."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "lang",
        "doc_id",
        F.posexplode(ws_tokens(F.col("text"))).alias("pos", "__t"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = [
        F.lead("__t", r).over(w).alias(f"__l{r}")
        for r in range(1, HLL_SHINGLE_K)
    ]
    windowed = toks.select("lang", "pos", "__t", *leads)
    return windowed.filter(
        F.col(f"__l{HLL_SHINGLE_K - 1}").isNotNull()
    ).select(
        "lang",
        F.concat_ws(
            " ",
            F.col("__t"),
            *[F.col(f"__l{r}") for r in range(1, HLL_SHINGLE_K)],
        ).alias("sh"),
    )


def q_hll_distinct_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-shingle HLL per language plus the merged '*' corpus row.

    The '*' row is computed by MERGING the per-language register tables
    (register-wise MAX) — the sketch's union property, never a second
    pass over the corpus — and every row carries the exact distinct
    count and the error in ppm, so estimator quality is itself gated.
    """
    sh = _shingles(spark, sf_dir)
    regs = hll_registers(sh, "sh", ["lang"])
    merged = (
        regs.groupBy("reg")
        .agg(F.max("rho").alias("rho"))
        .select(F.lit("*").alias("lang"), "reg", "rho")
    )
    est = hll_estimate(regs.unionByName(merged), ["lang"])
    exact = sh.groupBy("lang").agg(
        F.countDistinct("sh").alias("exact_distinct")
    )
    exact_all = sh.agg(
        F.countDistinct("sh").alias("exact_distinct")
    ).select(F.lit("*").alias("lang"), "exact_distinct")
    return (
        est.join(exact.unionByName(exact_all), "lang")
        .select(
            "lang",
            "v_zero",
            "sum_scaled",
            "est_distinct",
            "exact_distinct",
            F.expr(
                "abs(est_distinct - exact_distinct) * 1000000"
                " DIV exact_distinct"
            ).alias("err_ppm"),
        )
    )


_H60_SH = H60_SQL.format(x="sh")
_NUMER = HLL_ALPHA_NUM * HLL_M * HLL_M * (1 << HLL_RHO_SCALE)

ORACLE["hll_distinct_shingles"] = f"""
WITH sh AS MATERIALIZED (
  SELECT lang, concat_ws(' ', tok, {", ".join(f"l{r}" for r in range(1, HLL_SHINGLE_K))}) AS sh FROM (
    SELECT d.lang, t.tok,
           {", ".join(f"lead(tok, {r}) OVER w AS l{r}" for r in range(1, HLL_SHINGLE_K))}
    FROM ({_tok_sql("SELECT doc_id, text FROM documents")}) t
    JOIN documents d USING (doc_id)
    WINDOW w AS (PARTITION BY t.doc_id ORDER BY t.pos)
  ) WHERE l{HLL_SHINGLE_K - 1} IS NOT NULL
), hs AS (
  SELECT lang, {_H60_SH} AS h FROM sh
), rr AS (
  SELECT lang, h % {HLL_M} AS reg,
         CASE WHEN h // {HLL_M} = 0 THEN 55
              ELSE 55 - length(ltrim(bin(h // {HLL_M}), '0')) END AS rho
  FROM hs
), hit AS MATERIALIZED (
  SELECT lang, reg, MAX(rho) AS rho FROM rr GROUP BY lang, reg
), grid AS (
  SELECT l.lang, g.reg, CAST(COALESCE(h.rho, 0) AS INT) AS rho
  FROM (SELECT DISTINCT lang FROM sh) l
  CROSS JOIN (SELECT UNNEST(range({HLL_M})) AS reg) g
  LEFT JOIN hit h ON h.lang = l.lang AND h.reg = g.reg
), all_regs AS (
  SELECT lang, reg, rho FROM grid
  UNION ALL
  SELECT '*' AS lang, reg, MAX(rho) AS rho FROM grid GROUP BY reg
), est AS (
  SELECT lang,
         CAST(SUM(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS INT) AS v_zero,
         CAST(SUM(1::BIGINT << ({HLL_RHO_SCALE}
              - LEAST(rho, {HLL_RHO_SCALE}))) AS BIGINT) AS sum_scaled
  FROM all_regs GROUP BY lang
), exact AS (
  SELECT lang, COUNT(DISTINCT sh) AS exact_distinct FROM sh GROUP BY lang
  UNION ALL
  SELECT '*' AS lang, COUNT(DISTINCT sh) AS exact_distinct FROM sh
)
SELECT e.lang, e.v_zero, e.sum_scaled,
       {_NUMER} // ({HLL_ALPHA_DEN} * e.sum_scaled) AS est_distinct,
       x.exact_distinct,
       abs({_NUMER} // ({HLL_ALPHA_DEN} * e.sum_scaled)
           - x.exact_distinct) * 1000000 // x.exact_distinct AS err_ppm
FROM est e JOIN exact x USING (lang)
"""
QUERIES["hll_distinct_shingles"] = q_hll_distinct_shingles


#: heavy-hitter probe size.
CMS_PROBE_K = 5


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch over every 3-shingle occurrence, probed at the
    corpus's top-5 shingles (count DESC, shingle ASC tie-break): the
    estimate, the exact count, and the one-sided overestimate in ppm —
    the CMS guarantee (est >= exact, error <= 2N/w w.h.p.) gated as
    data. The width ADAPTS — one cheap occurrence count drives the
    ``adaptive_cms_w`` integer ladder, doubling w with the corpus to
    hold over-ppm ~flat across scale decades (the adaptive_srp_bits
    knob rule; the chosen w is emitted so adaptivity itself is gated).
    The sketch stays d·w cells regardless of corpus size; the exact
    side of the probe is a TakeOrdered top-k, never a full sort.
    """
    sh = _shingles(spark, sf_dir).select("sh")
    w = adaptive_cms_w(sh.count())
    cms = cms_build(sh, "sh", w)
    top = (
        sh.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .orderBy(F.col("exact_count").desc(), F.col("sh").asc())
        .limit(CMS_PROBE_K)
    )
    est = cms_query(cms, top.select("sh"), "sh", w)
    return top.join(est, "sh").select(
        "sh",
        "est_count",
        "exact_count",
        F.expr(
            "(est_count - exact_count) * 1000000 DIV exact_count"
        ).alias("over_ppm"),
        F.lit(w).cast("bigint").alias("w"),
    )


def _h60_cms(sh_expr: str) -> str:
    return H60_SQL.format(
        x=f"'cms' || CAST(j AS VARCHAR) || ':' || {sh_expr}"
    )


#: DuckDB twin of :func:`operators.sketches.adaptive_cms_w`: the same
#: integer threshold ladder over COUNT(*), generated from the same
#: constants so the two can never desynchronize.
_CMS_W_LADDER = "(CAST(1 AS BIGINT) << ({min_log2} + {ladder}))".format(
    min_log2=CMS_MIN_W_LOG2,
    ladder=" + ".join(
        f"(CASE WHEN cnt > {CMS_TARGET_LOAD * (1 << (k - 1))} THEN 1 ELSE 0 END)"
        for k in range(CMS_MIN_W_LOG2 + 1, CMS_MAX_W_LOG2 + 1)
    ),
)

ORACLE["cms_heavy_hitters"] = f"""
WITH sh AS MATERIALIZED (
  SELECT lang, concat_ws(' ', tok, {", ".join(f"l{r}" for r in range(1, HLL_SHINGLE_K))}) AS sh FROM (
    SELECT d.lang, t.tok,
           {", ".join(f"lead(tok, {r}) OVER w AS l{r}" for r in range(1, HLL_SHINGLE_K))}
    FROM ({_tok_sql("SELECT doc_id, text FROM documents")}) t
    JOIN documents d USING (doc_id)
    WINDOW w AS (PARTITION BY t.doc_id ORDER BY t.pos)
  ) WHERE l{HLL_SHINGLE_K - 1} IS NOT NULL
), wv AS MATERIALIZED (
  SELECT {_CMS_W_LADDER} AS w FROM (SELECT COUNT(*) AS cnt FROM sh)
), rows_ AS (SELECT UNNEST(range({CMS_D})) AS j),
cms AS MATERIALIZED (
  SELECT j AS row, {_h60_cms("sh")} % (SELECT w FROM wv) AS col,
         COUNT(*) AS cnt
  FROM sh CROSS JOIN rows_ GROUP BY 1, 2
), top AS MATERIALIZED (
  SELECT sh, COUNT(*) AS exact_count FROM sh GROUP BY sh
  ORDER BY exact_count DESC, sh ASC LIMIT {CMS_PROBE_K}
), probe AS (
  SELECT t.sh, t.exact_count, j AS row,
         {_h60_cms("t.sh")} % (SELECT w FROM wv) AS col
  FROM top t CROSS JOIN rows_
), est AS (
  SELECT sh, exact_count,
         CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS est_count
  FROM probe LEFT JOIN cms c USING (row, col)
  GROUP BY sh, exact_count
)
SELECT sh, est_count, exact_count,
       (est_count - exact_count) * 1000000 // exact_count AS over_ppm,
       (SELECT w FROM wv) AS w
FROM est
"""
QUERIES["cms_heavy_hitters"] = q_cms_heavy_hitters
