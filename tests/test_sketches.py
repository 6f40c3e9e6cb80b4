"""Engine-exact HLL (operators/sketches.py) property tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_excel_sql__spark.operators.sketches import (
    HLL_M,
    _rho_int,
    hll_estimate,
    hll_registers,
)


def _vals(spark, rows):
    return spark.createDataFrame(rows, "grp STRING, v STRING")


def test_rho_spark_matches_python(spark):
    """The bin()-bitlength rank agrees with Python's bit_length twin on
    edge payloads (0, 1, max 54-bit)."""
    import etl_pipeline_excel_sql__spark.operators.sketches as sk

    payloads = [0, 1, 2, 3, 63, 64, (1 << 53), (1 << 54) - 1]
    df = spark.createDataFrame([(p,) for p in payloads], "r LONG")
    got = {
        r.r: r.rho
        for r in df.select("r", sk._rho(F.col("r")).alias("rho")).collect()
    }
    for p in payloads:
        assert got[p] == _rho_int(p), p


def test_register_grid_complete_and_partition_invariant(spark):
    """Every (group, register) pair appears exactly once, and the
    register table is identical under a different partitioning."""
    rows = [("a", f"x{i}") for i in range(500)] + [
        ("b", f"y{i}") for i in range(20)
    ]
    df = _vals(spark, rows)
    regs = hll_registers(df, "v", ["grp"]).collect()
    assert len(regs) == 2 * HLL_M
    assert len({(r.grp, r.reg) for r in regs}) == 2 * HLL_M
    regs2 = hll_registers(df.repartition(7, "v"), "v", ["grp"]).collect()
    assert sorted(map(tuple, regs)) == sorted(map(tuple, regs2))


def test_merge_is_registerwise_max(spark):
    """Union sketch == register-wise MAX of part sketches — the
    mergeability contract that makes the sketch a distributed
    aggregate."""
    a = _vals(spark, [("g", f"a{i}") for i in range(300)])
    b = _vals(spark, [("g", f"b{i}") for i in range(300)])
    ra = {r.reg: r.rho for r in hll_registers(a, "v", ["grp"]).collect()}
    rb = {r.reg: r.rho for r in hll_registers(b, "v", ["grp"]).collect()}
    ru = {
        r.reg: r.rho
        for r in hll_registers(a.union(b), "v", ["grp"]).collect()
    }
    assert ru == {reg: max(ra[reg], rb[reg]) for reg in ra}


def test_estimate_accuracy_at_sketch_regime(spark):
    """Raw estimator lands within ~4/sqrt(m) of truth for cardinalities
    well past 2.5m (the regime the registered query targets)."""
    for n in (2_000, 20_000):
        df = _vals(spark, [("g", f"val-{i}") for i in range(n)])
        est = hll_estimate(
            hll_registers(df, "v", ["grp"]), ["grp"]
        ).collect()[0]
        assert abs(est.est_distinct - n) / n < 0.5, (n, est.est_distinct)


def test_cms_never_underestimates_and_merges(spark):
    """CMS guarantees: est >= exact for EVERY value, and the sketch of
    a union is the cell-wise sum of the parts' sketches."""
    from collections import Counter

    from etl_pipeline_excel_sql__spark.operators.sketches import (
        cms_build,
        cms_query,
    )

    vals_a = [f"v{i % 50}" for i in range(400)]
    vals_b = [f"v{i % 37}" for i in range(300)]
    truth = Counter(vals_a + vals_b)
    mk = lambda vs: spark.createDataFrame([(v,) for v in vs], "v STRING")
    cms_u = cms_build(mk(vals_a + vals_b), "v")
    probes = mk(sorted(truth))
    est = {
        r.v: r.est_count
        for r in cms_query(cms_u, probes, "v").collect()
    }
    assert all(est[v] >= c for v, c in truth.items())
    # mergeability: union sketch == cellwise sum of part sketches
    parts = (
        cms_build(mk(vals_a), "v")
        .union(cms_build(mk(vals_b), "v"))
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, cms_u.collect())) == sorted(
        map(tuple, parts.collect())
    )


def test_duplicates_do_not_move_the_sketch(spark):
    """The sketch depends only on the distinct value set."""
    base = [("g", f"v{i}") for i in range(1_000)]
    d1 = hll_estimate(
        hll_registers(_vals(spark, base), "v", ["grp"]), ["grp"]
    ).collect()[0]
    d2 = hll_estimate(
        hll_registers(_vals(spark, base * 3), "v", ["grp"]), ["grp"]
    ).collect()[0]
    assert d1.sum_scaled == d2.sum_scaled
    assert d1.est_distinct == d2.est_distinct


def test_adaptive_cms_w_ladder():
    """Pure-integer width ladder: round-8 fixed width at small N,
    doubling per load decade, clamped at both ends."""
    from etl_pipeline_excel_sql__spark.operators.sketches import (
        CMS_MAX_W_LOG2,
        CMS_MIN_W_LOG2,
        CMS_TARGET_LOAD,
        adaptive_cms_w,
    )

    w_min = 1 << CMS_MIN_W_LOG2
    assert adaptive_cms_w(0) == w_min
    assert adaptive_cms_w(CMS_TARGET_LOAD * w_min) == w_min  # boundary stays
    assert adaptive_cms_w(CMS_TARGET_LOAD * w_min + 1) == 2 * w_min
    assert adaptive_cms_w(CMS_TARGET_LOAD * 2 * w_min + 1) == 4 * w_min
    assert adaptive_cms_w(10**18) == 1 << CMS_MAX_W_LOG2
    # load (= N/w) never exceeds CMS_TARGET_LOAD until the MAX clamp
    for n in (10**3, 10**5, 10**7, 10**9):
        w = adaptive_cms_w(n)
        if w < (1 << CMS_MAX_W_LOG2):
            assert n <= CMS_TARGET_LOAD * w


def test_cms_width_parameter_threads_through(spark):
    """cms_build/cms_query agree on the estimate at a non-default w."""
    from etl_pipeline_excel_sql__spark.operators.sketches import (
        cms_build,
        cms_query,
    )

    vals = [("a",)] * 7 + [("b",)] * 3 + [(f"x{i}",) for i in range(50)]
    df = spark.createDataFrame(vals, "v STRING")
    for w in (64, 4096):
        cms = cms_build(df, "v", w)
        est = {
            r.v: r.est_count
            for r in cms_query(
                cms, spark.createDataFrame([("a",), ("b",)], "v STRING"), "v", w
            ).collect()
        }
        assert est["a"] >= 7 and est["b"] >= 3  # one-sided
