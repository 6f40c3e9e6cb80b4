"""TPC-H Q4-Q8, Q11-Q17, Q19, Q22-flavor queries (round-2 widening).

Together with ``tpch_queries`` (Q2/Q9/Q18/Q20/Q21) every TPC-H number now
maps to a named query: Q1 → ``agg_pricing_summary``, Q3 →
``sql_topk_revenue``, Q10 → ``returned_items_report``, and the rest are
here by name. Adaptations, since the corpus has no ``partsupp`` and fewer
columns than full TPC-H:

* Q4  — EXISTS semi-join: orders with any lineitem shipped >30 days after
  the order date ("late commit" proxy), counted per priority.
* Q7  — volume shipping: revenue between two nation pairs by ship year.
* Q8  — market share: one nation's revenue share of a region by year
  (ratio of two exact decimal sums, divided as doubles).
* Q13 — customer order distribution: left join + two-level aggregation.
* Q14 — promo revenue share per month (CASE ratio).
* Q15 — top supplier(s) by quarterly revenue (aggregate equal to the
  global max — broadcast-join against a 1-row aggregate, no window).
* Q16 — supplier diversity per (brand, type, size) with a NOT-IN
  exclusion list (anti-join) and count distinct.
* Q17 — small-quantity revenue: correlated per-part average quantity
  (aggregate-then-join, never a window over the fact table).
* Q22 — dormant high-balance customers: scalar avg subquery + NOT EXISTS
  (anti-join against urgent orders), grouped by a name-derived code.
* Q5  — cyclic join (customer and supplier share a nation); Q6 — pure
  scan-filter-aggregate; Q11 — HAVING against a global scalar share
  (supplier balance proxies partsupp value); Q12 — conditional class
  counts (line status proxies shipmode); Q19 — OR-of-ANDs disjunction
  across both join sides.

Numeric parity follows the repo rule (see ``analytics_queries.dec_out``):
money stays DECIMAL end-to-end, outputs render decimal → string → double,
ratios divide the two string-hopped doubles (IEEE division is deterministic
and identical on both engines). ``l_quantity`` is integral (1..50), so
float sums of it are exact at any order; money sums always go through
DECIMAL.

Reference shapes: TPC-H spec rev 3.0 (public); no code derived from
/root/reference (it has no analytics queries — these extend SURVEY §2's
"beyond the reference" widening).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_excel_sql__spark.plans.analytics_queries import DEC, dec_out
from etl_pipeline_excel_sql__spark.sources.registry import load_table

#: Exact decimal revenue term used by Q7/Q8/Q14/Q15/Q17.
def _revenue():
    return F.col("l_extendedprice").cast(DEC) * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(6,4)")


_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * CAST(1.0 - l_discount AS DECIMAL(6,4))"
)


def q_tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-order counts per priority over one quarter (TPC-H Q4 shape).

    The signature operator is EXISTS — a left-semi join whose condition
    references both sides (lineitem shipped >30 days after the order
    date). The semi-join keeps the orders side at most once per key, so
    the aggregate never double-counts multi-lineitem orders.
    """
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (F.datediff(li.l_shipdate, o.o_orderdate) > 30),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def q_tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue shipped between NATION_1 and NATION_2 by year (TPC-H Q7).

    Two independent nation lookups (supplier side and customer side) with
    the cross-pair filter; lineitem⋈orders is the only big shuffle, both
    nation paths broadcast.
    """
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    c = F.broadcast(
        load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    )
    s = F.broadcast(
        load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    )
    n1 = F.broadcast(
        load_table(spark, "nation", sf_dir).select(
            F.col("n_nationkey").alias("sn_key"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    n2 = F.broadcast(
        load_table(spark, "nation", sf_dir).select(
            F.col("n_nationkey").alias("cn_key"),
            F.col("n_name").alias("cust_nation"),
        )
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, F.col("s_nationkey") == F.col("sn_key"))
        .join(n2, F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(dec_out(F.sum(_revenue()).cast("decimal(38,4)")).alias("revenue"))
    )


def q_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_3's share of EUROPE-customer STANDARD-part revenue by year
    (TPC-H Q8 shape).

    The ratio divides two *exact* decimal sums after the string hop —
    numerator and denominator are each order-independent, and one IEEE
    double division is bit-identical on both engines. The CASE lives
    inside the aggregate so it's one pass, not a self-join.
    """
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    p = F.broadcast(
        load_table(spark, "part", sf_dir)
        .filter(F.col("p_type") == "STANDARD")
        .select("p_partkey")
    )
    c = F.broadcast(
        load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    )
    s = F.broadcast(
        load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    )
    n1 = F.broadcast(
        load_table(spark, "nation", sf_dir).select(
            F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cr_key")
        )
    )
    r = F.broadcast(
        load_table(spark, "region", sf_dir)
        .filter(F.col("r_name") == "EUROPE")
        .select("r_regionkey")
    )
    n2 = F.broadcast(
        load_table(spark, "nation", sf_dir).select(
            F.col("n_nationkey").alias("sn_key"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    vol = _revenue()
    nation_vol = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
        F.lit(0).cast(DEC)
    )
    agg = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(n1, F.col("c_nationkey") == F.col("cn_key"))
        .join(r, F.col("cr_key") == F.col("r_regionkey"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n2, F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.sum(nation_vol).cast("decimal(38,4)").alias("nat"),
            F.sum(vol).cast("decimal(38,4)").alias("tot"),
        )
    )
    return agg.select(
        "o_year",
        (dec_out(F.col("nat")) / dec_out(F.col("tot"))).alias("mkt_share"),
    )


def q_tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of customers by non-urgent order count (TPC-H Q13).

    Left outer join with the filter *inside the join condition* (so
    customers whose only orders are urgent still appear with count 0),
    then a second aggregation over the counts. Integer outputs only.
    """
    c = load_table(spark, "customer", sf_dir).select("c_custkey")
    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


def q_tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROMO-part revenue share per ship month (TPC-H Q14 shape).

    Same exact-decimal-CASE-ratio discipline as Q8; grouped per month so
    the output exercises the date bucketing too.
    """
    li = load_table(spark, "lineitem", sf_dir)
    p = F.broadcast(
        load_table(spark, "part", sf_dir).select("p_partkey", "p_type")
    )
    rev = _revenue()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(DEC))
    agg = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.sum(promo).cast("decimal(38,4)").alias("promo"),
            F.sum(rev).cast("decimal(38,4)").alias("tot"),
        )
    )
    return agg.select(
        "ship_month",
        (
            F.lit(100.0) * dec_out(F.col("promo")) / dec_out(F.col("tot"))
        ).alias("promo_revenue_pct"),
    )


def q_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with the maximum 1996Q1 revenue (TPC-H Q15 shape).

    The original's view + scalar-max subquery becomes aggregate →
    broadcast-join against the 1-row global max. The max is compared on
    the exact DECIMAL (not the double render), so ties are bit-exact; at
    100 TB the second pass touches only the per-supplier aggregate, never
    lineitem.
    """
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    s = F.broadcast(load_table(spark, "supplier", sf_dir))
    revs = li.groupBy("l_suppkey").agg(
        F.sum(_revenue()).cast("decimal(38,4)").alias("total_rev")
    )
    top = F.broadcast(revs.agg(F.max("total_rev").alias("max_rev")))
    return (
        revs.join(top, revs.total_rev == top.max_rev)
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            dec_out(F.col("total_rev")).alias("total_rev"),
        )
    )


def q_tpch_q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-supplier counts per (brand, type, size) with an exclusion
    list (TPC-H Q16 shape).

    The NOT IN subquery (suppliers whose name contains '77' — the
    "complaints" proxy) is a broadcast anti-join, the count distinct is a
    single shuffle on the group key. Integer outputs only.
    """
    li = load_table(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey")
    p = F.broadcast(
        load_table(spark, "part", sf_dir).filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & (F.col("p_size") <= 10)
        )
    )
    excluded = F.broadcast(
        load_table(spark, "supplier", sf_dir)
        .filter(F.col("s_name").contains("77"))
        .select(F.col("s_suppkey").alias("x_suppkey"))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(excluded, li.l_suppkey == F.col("x_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q_tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average yearly revenue lost by dropping small-quantity Brand#1
    SMALL-part orders (TPC-H Q17 shape).

    The correlated scalar subquery (``0.2 * avg(l_quantity)`` for that
    part) is an aggregate-then-join on the part key — at scale the join
    input is one row per part, not a window over the fact table.
    ``l_quantity`` is integral so its float sum is exact; the threshold
    and the final division are deterministic double ops.
    """
    li = load_table(spark, "lineitem", sf_dir)
    p = F.broadcast(
        load_table(spark, "part", sf_dir)
        .filter((F.col("p_brand") == "Brand#1") & (F.col("p_type") == "SMALL"))
        .select("p_partkey")
    )
    narrowed = li.join(p, li.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_qty = narrowed.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.sum("l_quantity") / F.count("*")).alias("avg_qty")
    )
    small = narrowed.join(
        avg_qty, F.col("l_partkey") == F.col("a_partkey")
    ).filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
    return small.agg(
        (
            dec_out(
                F.sum(F.col("l_extendedprice").cast(DEC)).cast("decimal(38,2)")
            )
            / F.lit(7.0)
        ).alias("avg_yearly")
    )


def q_tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-balance customers with no urgent orders, grouped by the last
    two digits of the customer name (TPC-H Q22 shape).

    Scalar subquery (global average positive balance — computed as an
    exact decimal sum divided by count) + NOT EXISTS (broadcast-able
    anti-join against urgent orders' customer keys). The balance
    comparison happens between doubles derived identically on both
    engines.
    """
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = F.broadcast(
        c.filter(F.col("c_acctbal") > 0).agg(
            (
                dec_out(
                    F.sum(F.col("c_acctbal").cast(DEC)).cast("decimal(38,2)")
                )
                / F.count("*")
            ).alias("avg_bal")
        )
    )
    urgent_cust = o.select(F.col("o_custkey").alias("u_custkey")).distinct()
    return (
        c.crossJoin(avg_bal)
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent_cust, F.col("c_custkey") == F.col("u_custkey"), "left_anti")
        .groupBy(F.substring("c_name", -2, 2).alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            dec_out(
                F.sum(F.col("c_acctbal").cast(DEC)).cast("decimal(38,2)")
            ).alias("totacctbal"),
        )
    )


ORACLE: dict[str, str] = {
    "tpch_q4_order_priority": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-04-01'
          AND EXISTS (
                SELECT 1 FROM lineitem
                WHERE l_orderkey = o_orderkey
                  AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        GROUP BY o_orderpriority""",
    "tpch_q7_volume_shipping": """
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               CAST(CAST(CAST(SUM({rev}) AS DECIMAL(38,4)) AS VARCHAR)
                    AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        GROUP BY n1.n_name, n2.n_name, year(l_shipdate)""".format(rev=_REV_SQL),
    "tpch_q8_market_share": """
        WITH vols AS (
          SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                 {rev} AS volume,
                 n2.n_name AS supp_nation
          FROM lineitem
          JOIN part     ON l_partkey = p_partkey
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region   ON n1.n_regionkey = r_regionkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'EUROPE' AND p_type = 'STANDARD'
        )
        SELECT o_year,
               CAST(CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                                       THEN volume
                                       ELSE CAST(0 AS DECIMAL(12,2)) END)
                     AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE)
               / CAST(CAST(CAST(SUM(volume) AS DECIMAL(38,4)) AS VARCHAR)
                      AS DOUBLE) AS mkt_share
        FROM vols GROUP BY o_year""".format(rev=_REV_SQL),
    "tpch_q13_order_distribution": """
        WITH per_cust AS (
          SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer
          LEFT JOIN orders ON c_custkey = o_custkey
                          AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey
        )
        SELECT c_count, COUNT(*) AS custdist
        FROM per_cust GROUP BY c_count""",
    "tpch_q14_promo_share": """
        SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
               100.0
               * CAST(CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
                                         THEN {rev}
                                         ELSE CAST(0 AS DECIMAL(12,2)) END)
                       AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE)
               / CAST(CAST(CAST(SUM({rev}) AS DECIMAL(38,4)) AS VARCHAR)
                      AS DOUBLE) AS promo_revenue_pct
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        GROUP BY strftime(l_shipdate, '%Y-%m')""".format(rev=_REV_SQL),
    "tpch_q15_top_supplier": """
        WITH revs AS (
          SELECT l_suppkey,
                 CAST(SUM({rev}) AS DECIMAL(38,4)) AS total_rev
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name,
               CAST(CAST(total_rev AS VARCHAR) AS DOUBLE) AS total_rev
        FROM revs
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_rev = (SELECT max(total_rev) FROM revs)""".format(
        rev=_REV_SQL
    ),
    "tpch_q16_supplier_diversity": """
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO' AND p_size <= 10
          AND l_suppkey NOT IN (
                SELECT s_suppkey FROM supplier WHERE s_name LIKE '%77%')
        GROUP BY p_brand, p_type, p_size""",
    "tpch_q17_small_qty_revenue": """
        WITH narrowed AS (
          SELECT l_partkey, l_quantity, l_extendedprice
          FROM lineitem
          JOIN part ON l_partkey = p_partkey
          WHERE p_brand = 'Brand#1' AND p_type = 'SMALL'
        ), avg_qty AS (
          SELECT l_partkey AS a_partkey,
                 SUM(l_quantity) / COUNT(*) AS avg_qty
          FROM narrowed GROUP BY l_partkey
        )
        SELECT CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
                    AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) / 7.0
               AS avg_yearly
        FROM narrowed
        JOIN avg_qty ON l_partkey = a_partkey
        WHERE l_quantity < 0.2 * avg_qty""",
    "tpch_q22_dormant_customers": """
        WITH avg_bal AS (
          SELECT CAST(CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2)))
                      AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE)
                 / COUNT(*) AS avg_bal
          FROM customer WHERE c_acctbal > 0
        )
        SELECT right(c_name, 2) AS cntrycode,
               COUNT(*) AS numcust,
               CAST(CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2)))
                    AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS totacctbal
        FROM customer, avg_bal
        WHERE c_acctbal > avg_bal
          AND NOT EXISTS (
                SELECT 1 FROM orders
                WHERE o_custkey = c_custkey
                  AND o_orderpriority = '1-URGENT')
        GROUP BY right(c_name, 2)""",
}

QUERIES = {
    "tpch_q4_order_priority": q_tpch_q4_order_priority,
    "tpch_q7_volume_shipping": q_tpch_q7_volume_shipping,
    "tpch_q8_market_share": q_tpch_q8_market_share,
    "tpch_q13_order_distribution": q_tpch_q13_order_distribution,
    "tpch_q14_promo_share": q_tpch_q14_promo_share,
    "tpch_q15_top_supplier": q_tpch_q15_top_supplier,
    "tpch_q16_supplier_diversity": q_tpch_q16_supplier_diversity,
    "tpch_q17_small_qty_revenue": q_tpch_q17_small_qty_revenue,
    "tpch_q22_dormant_customers": q_tpch_q22_dormant_customers,
}


def q_tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASIA revenue where customer and supplier share a nation (TPC-H Q5).

    The signature is the cyclic join condition ``c_nationkey =
    s_nationkey`` closing the customer→order→lineitem→supplier chain;
    lineitem⋈orders is the only shuffle join, everything else broadcasts.
    """
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    ).select("o_orderkey", "o_custkey")
    c = F.broadcast(
        load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    )
    s = F.broadcast(
        load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    )
    n = F.broadcast(load_table(spark, "nation", sf_dir))
    r = F.broadcast(
        load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey)
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(n, F.col("s_nationkey") == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dec_out(F.sum(_revenue()).cast("decimal(38,4)")).alias("revenue"))
    )


def q_tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-revenue delta (TPC-H Q6): pure scan-filter-aggregate.

    Every predicate (date range, discount band, quantity cap) reaches the
    parquet scan; the aggregate is one map-side-combined decimal sum —
    the canonical row-group-pruning benchmark.
    """
    li = load_table(spark, "lineitem", sf_dir)
    amount = F.col("l_extendedprice").cast(DEC) * F.col("l_discount").cast(
        "decimal(6,4)"
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dec_out(F.sum(amount).cast("decimal(38,6)")).alias("revenue"))
    )


def q_tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations holding an outsized share of supplier balance (TPC-H Q11
    shape; supplier acctbal proxies partsupp value — no partsupp table).

    The HAVING-against-global-scalar becomes a broadcast join against the
    1-row total; the share test multiplies the string-hopped doubles
    (IEEE-deterministic) rather than re-scaling decimals.
    """
    s = load_table(spark, "supplier", sf_dir)
    n = F.broadcast(load_table(spark, "nation", sf_dir))
    per_nation = (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.col("s_acctbal").cast(DEC)).cast("decimal(38,2)").alias(
                "bal"
            )
        )
    )
    total = F.broadcast(
        s.agg(
            F.sum(F.col("s_acctbal").cast(DEC)).cast("decimal(38,2)").alias(
                "tot"
            )
        )
    )
    return (
        per_nation.crossJoin(total)
        .filter(dec_out(F.col("bal")) * F.lit(20.0) > dec_out(F.col("tot")))
        .select("n_name", dec_out(F.col("bal")).alias("value"))
    )


def q_tpch_q12_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High/low-priority order counts per line status (TPC-H Q12 shape;
    l_linestatus proxies shipmode — the corpus carries no shipmode).

    The CASE pair inside one aggregate is the signature: a single shuffle
    produces both conditional counts.
    """
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias(
                "low_line_count"
            ),
        )
    )


def q_tpch_q19_or_of_ands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue under an OR of three AND-groups (TPC-H Q19).

    The disjunction mixes part and lineitem predicates, so it can only be
    applied after the join — but each group's part-only conjuncts
    (brand, size) still prune the broadcast build side, and the
    lineitem-only bounds (quantity < 40) are pushed to the scan. The
    shape exercises CNF extraction in the optimizer.
    """
    li = load_table(spark, "lineitem", sf_dir)
    p = F.broadcast(load_table(spark, "part", sf_dir))
    g1 = (
        (F.col("p_brand") == "Brand#12")
        & (F.col("p_size").between(1, 5))
        & (F.col("l_quantity").between(1, 11))
    )
    g2 = (
        (F.col("p_brand") == "Brand#23")
        & (F.col("p_size").between(1, 10))
        & (F.col("l_quantity").between(10, 20))
    )
    g3 = (
        (F.col("p_brand") == "Brand#34")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(20, 30))
    )
    return (
        li.filter(F.col("l_quantity") < 40)
        .join(p, li.l_partkey == p.p_partkey)
        .filter(g1 | g2 | g3)
        .agg(dec_out(F.sum(_revenue()).cast("decimal(38,4)")).alias("revenue"))
    )


ORACLE.update(
    {
        "tpch_q5_local_supplier": """
        SELECT n_name,
               CAST(CAST(CAST(SUM({rev}) AS DECIMAL(38,4)) AS VARCHAR)
                    AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
                     AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name""".format(rev=_REV_SQL),
        "tpch_q6_forecast_revenue": """
        SELECT CAST(CAST(CAST(SUM(
                 CAST(l_extendedprice AS DECIMAL(12,2))
                 * CAST(l_discount AS DECIMAL(6,4))
               ) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24""",
        "tpch_q11_important_stock": """
        WITH per_nation AS (
          SELECT n_name,
                 CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2)))
                      AS DECIMAL(38,2)) AS bal
          FROM supplier JOIN nation ON s_nationkey = n_nationkey
          GROUP BY n_name
        ), total AS (
          SELECT CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2)))
                      AS DECIMAL(38,2)) AS tot
          FROM supplier
        )
        SELECT n_name, CAST(CAST(bal AS VARCHAR) AS DOUBLE) AS value
        FROM per_nation, total
        WHERE CAST(CAST(bal AS VARCHAR) AS DOUBLE) * 20.0
              > CAST(CAST(tot AS VARCHAR) AS DOUBLE)""",
        "tpch_q12_priority_classes": """
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_linestatus""",
        "tpch_q19_or_of_ands": """
        SELECT CAST(CAST(CAST(SUM({rev}) AS DECIMAL(38,4)) AS VARCHAR)
                    AS DOUBLE) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_quantity < 40
          AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                AND l_quantity BETWEEN 1 AND 11)
            OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                AND l_quantity BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 20 AND 30))""".format(rev=_REV_SQL),
    }
)

QUERIES.update(
    {
        "tpch_q5_local_supplier": q_tpch_q5_local_supplier,
        "tpch_q6_forecast_revenue": q_tpch_q6_forecast_revenue,
        "tpch_q11_important_stock": q_tpch_q11_important_stock,
        "tpch_q12_priority_classes": q_tpch_q12_priority_classes,
        "tpch_q19_or_of_ands": q_tpch_q19_or_of_ands,
    }
)


def q_tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 unshipped BUILDING-segment orders by revenue (TPC-H Q3).

    The corpus orders table carries o_orderpriority, not Q3's
    o_shippriority — the priority column swaps in with identical plan
    shape. lineitem⋈orders is the one shuffle join (customer filter
    broadcasts); the top-10 is a TakeOrdered over the aggregated output
    with a total order (exact decimal revenue DESC, orderkey ASC), so
    both engines pick the same rows deterministically.
    """
    cutoff = "1996-03-15"
    c = F.broadcast(
        load_table(spark, "customer", sf_dir)
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderdate") < F.lit(cutoff))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") > F.lit(cutoff)
    )
    agg = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_revenue()).cast("decimal(38,4)").alias("__rev"))
    )
    return (
        agg.orderBy(F.col("__rev").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select(
            "l_orderkey",
            dec_out(F.col("__rev")).alias("revenue"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
    )


def q_tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by revenue lost to returns in one quarter (Q10).

    Revenue aggregates by custkey FIRST (the only corpus-sized shuffle),
    then joins the customer dimension and the broadcast nation lookup —
    the aggregate side is |customers-with-returns| rows, so the dimension
    join never moves lineitem-scale data.
    """
    o = (
        load_table(spark, "orders", sf_dir)
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1996-04-01"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_returnflag") == "R"
    )
    per_cust = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(_revenue()).cast("decimal(38,4)").alias("__rev"))
    )
    cust = load_table(spark, "customer", sf_dir)
    nat = F.broadcast(
        load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    )
    return (
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey)
        .join(nat, F.col("c_nationkey") == F.col("n_nationkey"))
        .orderBy(F.col("__rev").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            dec_out(F.col("__rev")).alias("revenue"),
            "c_acctbal",
            "n_name",
        )
    )


ORACLE.update(
    {
        "tpch_q3_shipping_priority": """
        SELECT l_orderkey,
               CAST(CAST(rev AS VARCHAR) AS DOUBLE) AS revenue,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               o_orderpriority
        FROM (
          SELECT l_orderkey, o_orderdate, o_orderpriority,
                 CAST(SUM({rev}) AS DECIMAL(38,4)) AS rev
          FROM customer, orders, lineitem
          WHERE c_mktsegment = 'BUILDING'
            AND c_custkey = o_custkey
            AND l_orderkey = o_orderkey
            AND o_orderdate < TIMESTAMP '1996-03-15'
            AND l_shipdate  > TIMESTAMP '1996-03-15'
          GROUP BY l_orderkey, o_orderdate, o_orderpriority
          ORDER BY rev DESC, l_orderkey ASC
          LIMIT 10)""".format(rev=_REV_SQL),
        "tpch_q10_returned_items": """
        SELECT c_custkey, c_name,
               CAST(CAST(rev AS VARCHAR) AS DOUBLE) AS revenue,
               c_acctbal, n_name
        FROM (
          SELECT c_custkey, c_name, c_acctbal, n_name,
                 CAST(SUM({rev}) AS DECIMAL(38,4)) AS rev
          FROM customer, orders, lineitem, nation
          WHERE c_custkey = o_custkey
            AND l_orderkey = o_orderkey
            AND o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate <  TIMESTAMP '1996-04-01'
            AND l_returnflag = 'R'
            AND c_nationkey = n_nationkey
          GROUP BY c_custkey, c_name, c_acctbal, n_name
          ORDER BY rev DESC, c_custkey ASC
          LIMIT 20)""".format(rev=_REV_SQL),
    }
)

QUERIES.update(
    {
        "tpch_q3_shipping_priority": q_tpch_q3_shipping_priority,
        "tpch_q10_returned_items": q_tpch_q10_returned_items,
    }
)
