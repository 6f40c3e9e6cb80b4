"""Operational / export utilities: scalable global ordinals, order-free
table fingerprints, and fixed-size per-group samples.

* ``global_row_number`` — dense global ordinals for ordered export
  (``operators/ordering.global_row_numbers``). The naive
  ``row_number() OVER (ORDER BY ...)`` funnels the whole table through
  ONE task; the two-phase formulation (per-bucket counts → broadcast
  prefix-sum offsets → per-bucket rank) distributes the sort across
  month buckets while producing the identical numbering — the oracle IS
  the naive global window, proving the decomposition exact.
* ``table_fingerprint`` — replica-verification digest per return flag:
  row count, XOR of 60-bit row hashes (order-free, overflow-free), and
  the full decimal sum of hashes (catches the duplicate-pair
  cancellation XOR alone would miss — a duplicated row flips XOR back
  but moves the sum). Floats enter the row representation ONLY through
  the decimal(18,6)→string render, never double→string (engine float
  formatting differs; decimal rendering is the proven parity idiom).
  At 10^12 rows the decimal sum stays < 10^31 — inside decimal(38,0).
  This is how two copies of a 100 TB table are compared without moving
  either: ship one fingerprint row per group, not data.
* ``sample_fixed_per_group`` — exactly min(k, |group|) documents per
  language by hash order: the deterministic eval-set builder (the
  Bernoulli sampler can't promise exact k; the rank over the hash
  order can). One exchange on lang; per-group state is a rank counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_excel_sql__spark.sources.registry import (
    corpus_fingerprint,
    scratch_dir,
)
from etl_pipeline_excel_sql__spark.functions.hashing import (
    H60_SQL,
    md5_hash60,
)
from etl_pipeline_excel_sql__spark.operators.ordering import (
    global_row_numbers,
)
from etl_pipeline_excel_sql__spark.sources.registry import load_table
from etl_pipeline_excel_sql__spark.functions.localframe import local_df

#: DuckDB twin of md5_hash60 (cited in functions/hashing.py docstring).
_H60 = H60_SQL

#: documents kept per language by sample_fixed_per_group.
FIXED_K = 50


def q_global_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ordinals over orders by (o_orderdate, o_orderkey)."""
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey",
        "o_orderdate",
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
    )
    numbered = global_row_numbers(
        orders, "month", ["o_orderdate", "o_orderkey"]
    )
    return numbered.select("o_orderkey", F.col("rn").cast("bigint").alias("rn"))


#: fields entering the fingerprint, floats rendered via decimal. Each
#: field is TAGGED ('n' for NULL, 'v' + value otherwise) before joining:
#: concat_ws would silently SKIP NULLs, making rows that differ only in
#: which column is NULL (or NULL vs empty string) hash identically — a
#: digest that cannot see NULL-shifted corruption is not a digest.
_FP_FIELDS = (
    "l_orderkey",
    "l_linenumber",
    "l_returnflag",
    "l_linestatus",
    "CAST(l_quantity AS DECIMAL(18,6))",
    "CAST(l_extendedprice AS DECIMAL(18,6))",
    "CAST(l_discount AS DECIMAL(18,6))",
    "CAST(l_tax AS DECIMAL(18,6))",
)


def _fp_expr(str_type: str) -> str:
    """The tagged row representation ('n' / 'v'||value per field, joined
    by '|') — one template, instantiated with STRING for Spark and
    VARCHAR for the DuckDB oracle so the two can never drift."""
    tagged = [
        f"(CASE WHEN {f} IS NULL THEN 'n' "
        f"ELSE 'v' || CAST({f} AS {str_type}) END)"
        for f in _FP_FIELDS
    ]
    return " || '|' || ".join(tagged)


_FP_EXPR = _fp_expr("STRING")


def q_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-free per-group digest of lineitem for replica verification."""
    li = load_table(spark, "lineitem", sf_dir)
    h = md5_hash60(F.expr(_FP_EXPR))
    rows = li.select("l_returnflag", h.alias("h"))
    return rows.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.bit_xor("h").alias("fp_xor"),
        F.sum(F.col("h").cast("decimal(38,0)"))
        .cast("string")
        .alias("fp_sum"),
    )


def q_sample_fixed_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly min(k, |group|) docs per language, by hash rank."""
    doc = load_table(spark, "documents", sf_dir)
    h = md5_hash60(
        F.concat(F.lit("fixedk:"), F.col("doc_id").cast("string"))
    )
    w = Window.partitionBy("lang").orderBy("h", "doc_id")
    return (
        doc.select("doc_id", "lang", "n_chars", h.alias("h"))
        .withColumn("rank_in_lang", F.row_number().over(w))
        .filter(F.col("rank_in_lang") <= FIXED_K)
        .select("doc_id", "lang", "n_chars", "rank_in_lang")
    )


ORACLE: dict[str, str] = {
    "global_row_number": """
        SELECT o_orderkey,
               row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders""",
    "table_fingerprint": f"""
        WITH rows_h AS (
          SELECT l_returnflag,
                 {_H60.format(x=_fp_expr("VARCHAR"))} AS h
          FROM lineitem
        )
        SELECT l_returnflag, COUNT(*) AS n_rows,
               bit_xor(h) AS fp_xor,
               CAST(SUM(CAST(h AS DECIMAL(38,0))) AS VARCHAR) AS fp_sum
        FROM rows_h
        GROUP BY l_returnflag""",
    "sample_fixed_per_group": f"""
        SELECT doc_id, lang, n_chars, CAST(rank_in_lang AS INT) AS rank_in_lang
        FROM (
          SELECT doc_id, lang, n_chars,
                 row_number() OVER (PARTITION BY lang ORDER BY
                   {_H60.format(x="'fixedk:' || CAST(doc_id AS VARCHAR)")},
                   doc_id) AS rank_in_lang
          FROM documents
        )
        WHERE rank_in_lang <= {FIXED_K}""",
}

QUERIES = {
    "global_row_number": q_global_row_number,
    "table_fingerprint": q_table_fingerprint,
    "sample_fixed_per_group": q_sample_fixed_per_group,
}


#: exact-quantile request: percentiles and the phase-1 bucket width
#: (l_extendedprice spans ~900–105000, so width 64 → ~1.6k buckets).
QUANTILE_PCTS = [50, 90, 99, 100]
QUANTILE_WIDTH = 64.0


def q_exact_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99/p100 of l_extendedprice WITHOUT a global sort
    (operators/quantiles.exact_quantiles): one monotone-bucket
    aggregate, a window over the ~1.6k-row bucket table, then a second
    pass over only the located buckets. The oracle is the naive
    single-partition global window — a driver pass certifies the
    two-phase decomposition picks the identical elements, ties and all
    (tie-break (l_orderkey, l_linenumber))."""
    from etl_pipeline_excel_sql__spark.operators.quantiles import (
        exact_quantiles,
    )

    return exact_quantiles(
        load_table(spark, "lineitem", sf_dir),
        "l_extendedprice",
        ["l_orderkey", "l_linenumber"],
        QUANTILE_PCTS,
        QUANTILE_WIDTH,
    )


ORACLE["exact_price_quantiles"] = f"""
WITH ordered AS (
  SELECT l_extendedprice AS value,
         row_number() OVER (ORDER BY l_extendedprice, l_orderkey,
                            l_linenumber) AS rn
  FROM lineitem
), n AS (SELECT COUNT(*) AS n FROM lineitem),
ranks AS (
  SELECT pct, GREATEST(CAST(1 AS BIGINT),
              CAST(ceil(pct * n / 100.0) AS BIGINT)) AS rank
  FROM (VALUES {", ".join(f"({p})" for p in QUANTILE_PCTS)}) p(pct)
  CROSS JOIN n
)
SELECT pct, rank, value FROM ranks JOIN ordered ON ordered.rn = ranks.rank
"""
QUERIES["exact_price_quantiles"] = q_exact_price_quantiles


# --- consistent-hashing rebalance audit (round 11) --------------------------

#: base shard count, vnodes per shard, and the 52-bit ring space —
#: 52 hash bits + 8 shard bits keep the packed arg-min inside int64
#: (the packed-MIN doctrine; 2^52 ring positions are collision-ample
#: for the assignment audit).
SHARD_N = 8
SHARD_VNODES = 16
RING_BITS = 52
RING_SPACE = 1 << RING_BITS


def q_shard_rebalance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resharding-cost audit: how much data moves when shard count goes
    N → N+1, under naive modulo placement vs a consistent-hash ring
    (Karger et al., the memcached/Dynamo placement) — the number that
    decides whether a 100 TB corpus can grow its shard fleet online.
    Modulo reassigns ~N/(N+1) of all keys; the vnode ring reassigns
    only keys captured by the NEW shard's vnodes (~1/(N+1)), and —
    the consistency property this audit PROVES on the corpus rather
    than asserts — every moved key moves TO the new shard, never
    between old shards.

    Plan shape: the ring is (N+1)·V rows — it broadcasts; ownership is
    a per-doc arg-min over the broadcast ring via one packed-integer
    MIN aggregate (map-side combined, no shuffle of doc rows beyond
    the final global count), exactly the `blocked_best_match` arg-min
    doctrine. Output: one all-integer row.
    """
    from etl_pipeline_excel_sql__spark.functions.hashing import md5_hash60
    from etl_pipeline_excel_sql__spark.sources.registry import load_table

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id",
        (
            md5_hash60(F.concat(F.lit("doc:"), F.col("doc_id").cast("string")))
            % F.lit(RING_SPACE)
        ).alias("h"),
    )
    ring = local_df(
        spark,
        [(s, v) for s in range(SHARD_N + 1) for v in range(SHARD_VNODES)],
        ["shard", "vnode"],
    ).select(
        "shard",
        (
            md5_hash60(
                F.concat_ws(":", F.lit("ring"), F.col("shard"), F.col("vnode"))
            )
            % F.lit(RING_SPACE)
        ).alias("point"),
    )

    def owner(ring_df: DataFrame, col: str) -> DataFrame:
        packed = (
            ((F.col("point") - F.col("h") + F.lit(RING_SPACE)) % F.lit(RING_SPACE))
            * F.lit(256)
            + F.col("shard")
        )
        return (
            docs.join(F.broadcast(ring_df))
            .groupBy("doc_id", "h")
            .agg(F.min(packed).alias("__p"))
            .select(
                "doc_id",
                "h",
                (F.col("__p") % F.lit(256)).cast("bigint").alias(col),
            )
        )

    own_n = owner(ring.filter(F.col("shard") < SHARD_N), "ring_owner_n")
    own_n1 = owner(ring, "ring_owner_n1")
    joined = own_n.join(own_n1.drop("h"), "doc_id").select(
        "doc_id",
        "ring_owner_n",
        "ring_owner_n1",
        (F.col("h") % F.lit(SHARD_N)).alias("mod_n"),
        (F.col("h") % F.lit(SHARD_N + 1)).alias("mod_n1"),
    )
    n = F.count(F.lit(1)).cast("bigint")
    moved_mod = F.sum(
        F.when(F.col("mod_n") != F.col("mod_n1"), 1).otherwise(0)
    ).cast("bigint")
    moved_ring = F.sum(
        F.when(F.col("ring_owner_n") != F.col("ring_owner_n1"), 1).otherwise(0)
    ).cast("bigint")
    moved_ring_to_new = F.sum(
        F.when(
            (F.col("ring_owner_n") != F.col("ring_owner_n1"))
            & (F.col("ring_owner_n1") == SHARD_N),
            1,
        ).otherwise(0)
    ).cast("bigint")
    return joined.agg(
        n.alias("n_docs"),
        moved_mod.alias("moved_mod"),
        moved_ring.alias("moved_ring"),
        moved_ring_to_new.alias("moved_ring_to_new"),
        F.expr(
            "CAST(sum(CASE WHEN mod_n <> mod_n1 THEN 1 ELSE 0 END) * 1000000"
            " DIV count(*) AS BIGINT)"
        ).alias("moved_mod_ppm"),
        F.expr(
            "CAST(sum(CASE WHEN ring_owner_n <> ring_owner_n1 THEN 1 ELSE 0"
            " END) * 1000000 DIV count(*) AS BIGINT)"
        ).alias("moved_ring_ppm"),
    )


def _shard_rebalance_sql() -> str:
    from etl_pipeline_excel_sql__spark.functions.hashing import H60_SQL

    h = H60_SQL.format(x="concat('doc:', CAST(doc_id AS VARCHAR))")
    pt = H60_SQL.format(
        x="concat('ring', ':', CAST(s AS VARCHAR), ':', CAST(v AS VARCHAR))"
    )
    return f"""
WITH docs AS (
  SELECT doc_id, ({h}) % {RING_SPACE} AS h FROM documents
), ring AS (
  SELECT s AS shard, ({pt}) % {RING_SPACE} AS point
  FROM range(0, {SHARD_N + 1}) t1(s), range(0, {SHARD_VNODES}) t2(v)
), own_n AS (
  SELECT doc_id, h,
         CAST(MIN(((point - h + {RING_SPACE}) % {RING_SPACE}) * 256 + shard)
              % 256 AS BIGINT) AS ring_owner_n
  FROM docs JOIN ring ON ring.shard < {SHARD_N}
  GROUP BY doc_id, h
), own_n1 AS (
  SELECT doc_id,
         CAST(MIN(((point - h + {RING_SPACE}) % {RING_SPACE}) * 256 + shard)
              % 256 AS BIGINT) AS ring_owner_n1
  FROM docs JOIN ring ON TRUE
  GROUP BY doc_id, h
), j AS (
  SELECT o.doc_id, o.ring_owner_n, p.ring_owner_n1,
         o.h % {SHARD_N} AS mod_n, o.h % {SHARD_N + 1} AS mod_n1
  FROM own_n o JOIN own_n1 p USING (doc_id)
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN mod_n <> mod_n1 THEN 1 ELSE 0 END) AS BIGINT)
         AS moved_mod,
       CAST(SUM(CASE WHEN ring_owner_n <> ring_owner_n1 THEN 1 ELSE 0 END)
         AS BIGINT) AS moved_ring,
       CAST(SUM(CASE WHEN ring_owner_n <> ring_owner_n1
                      AND ring_owner_n1 = {SHARD_N} THEN 1 ELSE 0 END)
         AS BIGINT) AS moved_ring_to_new,
       CAST(SUM(CASE WHEN mod_n <> mod_n1 THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS moved_mod_ppm,
       CAST(SUM(CASE WHEN ring_owner_n <> ring_owner_n1 THEN 1 ELSE 0 END)
            * 1000000 // COUNT(*) AS BIGINT) AS moved_ring_ppm
FROM j
"""


ORACLE["shard_rebalance_audit"] = _shard_rebalance_sql()
QUERIES["shard_rebalance_audit"] = q_shard_rebalance_audit


# --- ring-sharded sink write-path audit (round 12) ---------------------------

#: one resharded table dir per (process, corpus version) — the
#: bm25_serve_topk index-dir convention: repeated gate/bench invocations
#: reuse the on-disk table instead of leaking a fresh mkdtemp per call.
#: Keyed on (sf_dir, corpus fingerprint) so in-process corpus
#: regeneration rebuilds the table (ADVICE r12); atexit-cleaned.
_RING_DIRS: dict[tuple, str] = {}


def q_ring_reshard_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `shard_rebalance_audit` ring DEPLOYED as a sink, audited from
    the FILES: write the documents table parquet-partitioned by its
    ring-owner shard (``sinks.bucketed.write_ring_sharded`` — ownership
    is a pure map over the literal vnode ring, no join/shuffle), grow
    the fleet N -> N+1 in place (``reshard_add_shard`` — dynamic
    partition overwrite rewrites ONLY the donor partitions plus the new
    shard; movers provably go only TO the new shard), then report per
    shard from the resharded files: row count and how many rows moved
    in. The oracle recomputes both from first principles (md5-60 ring
    ownership under both fleet sizes), so any sink mis-placement or
    lost/duplicated row during the in-place rewrite hash-desyncs.

    At 100 TB this is the reshard a storage fleet actually executes:
    moved volume ~1/(N+1) of the corpus, untouched shards' files not
    rewritten (asserted in tests/test_bucketed.py)."""
    from etl_pipeline_excel_sql__spark.sinks.bucketed import (
        reshard_add_shard,
        ring_assign,
        ring_points,
        write_ring_sharded,
    )
    from etl_pipeline_excel_sql__spark.sources.registry import load_table

    ring_key = (sf_dir, corpus_fingerprint(sf_dir))
    path = _RING_DIRS.get(ring_key)
    if path is None:
        path = scratch_dir("ring_shard_tbl_")
        docs = load_table(spark, "documents", sf_dir).select("doc_id")
        write_ring_sharded(
            docs, path, "doc_id", SHARD_N, SHARD_VNODES, RING_SPACE
        )
        reshard_add_shard(
            spark, path, "doc_id", SHARD_N, SHARD_VNODES, RING_SPACE
        )
        _RING_DIRS[ring_key] = path
    after = spark.read.parquet(path)
    old_pts = ring_points(SHARD_N, SHARD_VNODES, RING_SPACE)
    with_old = ring_assign(
        after, "doc_id", old_pts, RING_SPACE, out_col="__old_shard"
    )
    return with_old.groupBy(F.col("shard").cast("bigint").alias("shard")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(
            F.when(F.col("__old_shard") != F.col("shard"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_gained"),
    )


def _ring_reshard_sql() -> str:
    from etl_pipeline_excel_sql__spark.functions.hashing import H60_SQL

    h = H60_SQL.format(x="concat('doc:', CAST(doc_id AS VARCHAR))")
    pt = H60_SQL.format(
        x="concat('ring', ':', CAST(s AS VARCHAR), ':', CAST(v AS VARCHAR))"
    )
    return f"""
WITH docs AS (
  SELECT doc_id, ({h}) % {RING_SPACE} AS h FROM documents
), ring AS (
  SELECT s AS shard, ({pt}) % {RING_SPACE} AS point
  FROM range(0, {SHARD_N + 1}) t1(s), range(0, {SHARD_VNODES}) t2(v)
), own_n AS (
  SELECT doc_id, h,
         CAST(MIN(((point - h + {RING_SPACE}) % {RING_SPACE}) * 256 + shard)
              % 256 AS BIGINT) AS o_n
  FROM docs JOIN ring ON ring.shard < {SHARD_N}
  GROUP BY doc_id, h
), own_n1 AS (
  SELECT doc_id,
         CAST(MIN(((point - h + {RING_SPACE}) % {RING_SPACE}) * 256 + shard)
              % 256 AS BIGINT) AS o_n1
  FROM docs JOIN ring ON TRUE
  GROUP BY doc_id, h
)
SELECT o_n1 AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN o.o_n <> p.o_n1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_gained
FROM own_n o JOIN own_n1 p USING (doc_id)
GROUP BY o_n1
"""


ORACLE["ring_reshard_audit"] = _ring_reshard_sql()
QUERIES["ring_reshard_audit"] = q_ring_reshard_audit
