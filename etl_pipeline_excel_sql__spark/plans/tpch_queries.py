"""TPC-H Q2/Q9/Q18-flavor queries (VERDICT round-1 backlog item 6).

The corpus has no ``partsupp`` table, so each query is adapted to the
tables that exist while keeping the operator shape that makes the original
interesting:

* Q2  — correlated minimum: cheapest EUROPE supplier per part (window-min in
  Spark, correlated scalar subquery in the oracle — identical tie semantics).
* Q9  — multi-key aggregation over a 5-table join with a computed profit
  expression (supply cost proxied by ``p_retailprice`` since partsupp is
  absent).
* Q18 — large-order detection: aggregate-then-join with a HAVING-style
  threshold on ``sum(l_quantity)``.

Numeric parity follows the repo rule: decimal arithmetic end-to-end, final
outputs rendered via ``dec_out`` (decimal → string → double) because the
driver's value hash is only faithful for doubles (CORRECTNESS_r01).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_excel_sql__spark.plans.analytics_queries import DEC, dec_out
from etl_pipeline_excel_sql__spark.sources.registry import load_table


def q_tpch_q2_mincost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest EUROPE supplier per PROMO small part (TPC-H Q2 shape).

    The reference point is the correlated subquery ``price = (SELECT
    min(price) ... WHERE same part)``; Spark expresses it as a window
    minimum over the part key — one shuffle, no self-join, ties kept on
    both engines.
    """
    li = load_table(spark, "lineitem", sf_dir)
    p = F.broadcast(
        load_table(spark, "part", sf_dir).filter(
            (F.col("p_size") < 15) & (F.col("p_type") == "PROMO")
        )
    )
    s = F.broadcast(load_table(spark, "supplier", sf_dir))
    n = F.broadcast(load_table(spark, "nation", sf_dir))
    r = F.broadcast(
        load_table(spark, "region", sf_dir).filter(F.col("r_name") == "EUROPE")
    )
    price = F.col("l_extendedprice").cast(DEC)
    joined = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "n_name",
                price.alias("price"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        joined.withColumn("min_price", F.min("price").over(w))
        .filter(F.col("price") == F.col("min_price"))
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            "n_name",
            dec_out(F.col("price")).alias("min_price"),
        )
        .distinct()
    )


def q_tpch_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit by supplier nation and order year (TPC-H Q9 shape).

    Supply cost is proxied as ``0.5 * p_retailprice`` (no partsupp table);
    the interesting part — a five-table join feeding a two-key aggregate of
    a composite decimal expression — is intact. Fact table shuffles once;
    all dimensions broadcast.
    """
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate")
    p = F.broadcast(
        load_table(spark, "part", sf_dir).filter(
            F.col("p_name").contains("widget")
        )
    )
    s = F.broadcast(load_table(spark, "supplier", sf_dir))
    n = F.broadcast(load_table(spark, "nation", sf_dir))
    amount = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(6,4)") - F.col("p_retailprice").cast(DEC) * F.lit(0.5).cast(
        "decimal(6,4)"
    ) * F.col("l_quantity").cast(DEC)
    joined = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
    )
    return (
        joined.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(dec_out(F.sum(amount).cast("decimal(38,8)")).alias("sum_profit"))
    )


def q_tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with orders whose total quantity exceeds 250 (TPC-H Q18).

    Aggregate-then-join: the lineitem aggregate (HAVING) runs first and
    shrinks the fact side to a sliver before it ever touches orders or
    customer — at 100 TB the join input is the filtered aggregate, never
    raw lineitems.
    """
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = F.broadcast(load_table(spark, "customer", sf_dir))
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("decimal(38,2)").alias("tot_qty"))
        .filter(F.col("tot_qty") > F.lit(250).cast(DEC))
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
            "o_totalprice",
            dec_out(F.col("tot_qty")).alias("total_qty"),
        )
    )


def q_tpch_q20_share_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers shipping the majority of a part's demand (TPC-H Q20 shape).

    The original's correlated aggregate subquery (``ps_availqty > 0.5 *
    sum(l_quantity) for that part``) is expressed Spark-first as two
    aggregates joined on the part key — the correlated scalar becomes a
    plain column. The share test is ``supp_qty * 8 > part_demand``
    (supplier covers over an eighth of the part's demand — the 0.5 of the
    original is vacuous on this corpus's supplier fan-out), applied to
    exact decimal sums multiplied by a power of two, so the comparison is
    bit-identical on both engines with no scale change or precision
    overflow.
    """
    li = load_table(spark, "lineitem", sf_dir)
    s = F.broadcast(load_table(spark, "supplier", sf_dir))
    p = F.broadcast(load_table(spark, "part", sf_dir))
    qty = F.col("l_quantity").cast(DEC)
    pq = li.groupBy("l_partkey").agg(
        F.sum(qty).cast("decimal(38,2)").alias("part_demand")
    )
    sp = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(qty).cast("decimal(38,2)").alias("supp_qty")
    )
    return (
        sp.join(pq, on="l_partkey")
        .filter(
            dec_out(F.col("supp_qty")) * F.lit(8.0)
            > dec_out(F.col("part_demand"))
        )
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(p, F.col("l_partkey") == p.p_partkey)
        .select(
            "s_suppkey",
            "s_name",
            "p_partkey",
            "p_name",
            dec_out(F.col("supp_qty")).alias("supp_qty"),
            dec_out(F.col("part_demand")).alias("part_demand"),
        )
    )


def q_tpch_q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers solely responsible for a late order (TPC-H Q21 shape).

    Keeps Q21's signature operator stack — a fact self-EXISTS (another
    supplier participated in the order) and a self-NOT-EXISTS (no OTHER
    supplier was late) — as one left-semi plus one left-anti join against
    the order/supplier key set. "Late" is ``l_shipdate > o_orderdate + 60
    days`` (the corpus has no commit/receipt dates). Output is the full
    (s_name, numwait) aggregate — no LIMIT, so results are deterministic.
    """
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate")
    s = F.broadcast(load_table(spark, "supplier", sf_dir))
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.datediff("l_shipdate", "o_orderdate") > 60)
        .select("l_orderkey", "l_suppkey")
    )
    all_keys = li.select(
        F.col("l_orderkey").alias("k_orderkey"),
        F.col("l_suppkey").alias("k_suppkey"),
    )
    late_keys = late.select(
        F.col("l_orderkey").alias("k_orderkey"),
        F.col("l_suppkey").alias("k_suppkey"),
    ).distinct()
    multi = late.join(
        all_keys,
        (F.col("l_orderkey") == F.col("k_orderkey"))
        & (F.col("l_suppkey") != F.col("k_suppkey")),
        "left_semi",
    )
    sole = multi.join(
        late_keys,
        (F.col("l_orderkey") == F.col("k_orderkey"))
        & (F.col("l_suppkey") != F.col("k_suppkey")),
        "left_anti",
    )
    return (
        sole.join(s, sole.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


ORACLE: dict[str, str] = {
    "tpch_q2_mincost_supplier": """
        WITH eur AS (
          SELECT l_partkey, s_suppkey, s_name, n_name,
                 CAST(l_extendedprice AS DECIMAL(12,2)) AS price
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation   ON s_nationkey = n_nationkey
          JOIN region   ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE'
        )
        SELECT DISTINCT p_partkey, p_name, s_suppkey, s_name, n_name,
               CAST(CAST(price AS VARCHAR) AS DOUBLE) AS min_price
        FROM part
        JOIN eur ON l_partkey = p_partkey
        WHERE p_size < 15 AND p_type = 'PROMO'
          AND price = (SELECT min(e2.price) FROM eur e2
                       WHERE e2.l_partkey = p_partkey)""",
    "tpch_q9_profit": """
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(CAST(CAST(SUM(
                 CAST(l_extendedprice AS DECIMAL(12,2))
                   * CAST(1.0 - l_discount AS DECIMAL(6,4))
                 - CAST(p_retailprice AS DECIMAL(12,2))
                   * CAST(0.5 AS DECIMAL(6,4))
                   * CAST(l_quantity AS DECIMAL(12,2))
               ) AS DECIMAL(38,8)) AS VARCHAR) AS DOUBLE) AS sum_profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN orders   ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%widget%'
        GROUP BY n_name, year(o_orderdate)""",
    "tpch_q18_large_orders": """
        WITH big AS (
          SELECT l_orderkey,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2))
                   AS tot_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2))
                 > CAST(250 AS DECIMAL(12,2))
        )
        SELECT c_custkey, c_name, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date_str,
               o_totalprice,
               CAST(CAST(tot_qty AS VARCHAR) AS DOUBLE) AS total_qty
        FROM big
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey""",
}

ORACLE.update(
    {
        "tpch_q20_share_supplier": """
        WITH pq AS (
          SELECT l_partkey,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2))
                   AS part_demand
          FROM lineitem GROUP BY l_partkey
        ), sp AS (
          SELECT l_partkey, l_suppkey,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2))
                   AS supp_qty
          FROM lineitem GROUP BY l_partkey, l_suppkey
        )
        SELECT s_suppkey, s_name, p_partkey, p_name,
               CAST(CAST(supp_qty AS VARCHAR) AS DOUBLE) AS supp_qty,
               CAST(CAST(part_demand AS VARCHAR) AS DOUBLE) AS part_demand
        FROM sp
        JOIN pq USING (l_partkey)
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN part     ON l_partkey = p_partkey
        WHERE CAST(CAST(supp_qty AS VARCHAR) AS DOUBLE) * 8.0
              > CAST(CAST(part_demand AS VARCHAR) AS DOUBLE)""",
        "tpch_q21_sole_late_supplier": """
        WITH late AS (
          SELECT l_orderkey, l_suppkey
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        )
        SELECT s_name, COUNT(*) AS numwait
        FROM late l1
        JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE EXISTS (
                SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
                SELECT 1 FROM late l3
                WHERE l3.l_orderkey = l1.l_orderkey
                  AND l3.l_suppkey <> l1.l_suppkey)
        GROUP BY s_name""",
    }
)

QUERIES = {
    "tpch_q2_mincost_supplier": q_tpch_q2_mincost_supplier,
    "tpch_q9_profit": q_tpch_q9_profit,
    "tpch_q18_large_orders": q_tpch_q18_large_orders,
    "tpch_q20_share_supplier": q_tpch_q20_share_supplier,
    "tpch_q21_sole_late_supplier": q_tpch_q21_sole_late_supplier,
}
