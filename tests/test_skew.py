"""Skew operators: salted results must equal their unsalted equivalents."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_excel_sql__spark.operators.skew import salted_count_sum, salted_join


def _skewed(spark):
    # 90% of rows share one hot key
    rows = [(("hot" if i % 10 else f"k{i}"), float(i % 100)) for i in range(2000)]
    return spark.createDataFrame(rows, "k string, v double")


def test_salted_count_sum_matches_direct(spark):
    df = _skewed(spark)
    direct = {
        r.k: (r.n, str(r.s))
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(12,2)")).cast("decimal(38,2)").alias("s"),
        )
        .collect()
    }
    salted = {
        r.k: (r.n_rows, str(r.sum_v))
        for r in salted_count_sum(df, ["k"], "v").collect()
    }
    assert salted == direct


def test_salted_join_matches_direct(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("hot", "H"), ("k1", "A"), ("missing", "Z")], "k string, tag string"
    )
    direct = sorted(
        (r.k, r.v, r.tag) for r in big.join(small, on="k", how="inner").collect()
    )
    salted = sorted(
        (r.k, r.v, r.tag) for r in salted_join(big, small, "k").collect()
    )
    assert salted == direct
    left_direct = sorted(
        (r.k, r.v, r.tag)
        for r in big.join(small, on="k", how="left").collect()
    )
    left_salted = sorted(
        (r.k, r.v, r.tag) for r in salted_join(big, small, "k", how="left").collect()
    )
    assert left_salted == left_direct
