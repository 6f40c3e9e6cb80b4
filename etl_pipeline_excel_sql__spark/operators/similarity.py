"""Similarity search over embedding columns (``array<float>``).

Two tiers:

* **Brute-force top-k** — the correctness baseline. Query set ⨯ corpus
  cross join with the query side broadcast (queries are small by
  construction), cosine as codegen'd array math, per-query top-k via a
  rank window partitioned by query id. At 100 TB of corpus this is a
  single embarrassingly-parallel scan: no corpus shuffle at all — the only
  shuffle is the per-query top-k reduction, k rows per query per partition
  after partial aggregation.
* **IVF (inverted-file) probe** — the scale path. The corpus is
  partitioned into coarse cells by TRAINED k-means
  (:func:`kmeans_train_assign`: deterministic seeds, Lloyd rounds as
  DataFrame ops, decimal-exact means); ``ivf_topk`` also accepts any
  precomputed cell column (e.g. ``label``). A query first picks its
  ``nprobe`` nearest cell centroids, then brute-forces only those cells —
  the scan shrinks by ~ncells/nprobe. Centroids are a tiny model artifact:
  collected per round and compiled into the assignment expression, always
  broadcast-scale.
* **SRP-LSH bucketing** (in functions/vectors.py) — alternative scale path:
  sign-random-projection buckets as a pre-filter, same join shape as the
  MinHash band join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_pipeline_excel_sql__spark.functions.vectors import cosine, dot, l2_norm_sq


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int | None = None,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Output: ``query_id, neighbor_id, cosine_sim, rank`` (self-matches
    excluded). Ties break on neighbor id ascending — fully deterministic.
    """
    # Norms are per-vector: compute them once per side, not once per pair —
    # cuts the pair-scoring arithmetic to a dot product plus one divide.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        F.sqrt(l2_norm_sq(F.col(vec_col), dims)).alias("__qnorm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        F.sqrt(l2_norm_sq(F.col(vec_col), dims)).alias("__cnorm"),
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine_sim",
            dot(F.col("__qvec"), F.col("__cvec"), dims)
            / (F.col("__qnorm") * F.col("__cnorm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def cell_centroids(
    corpus: DataFrame,
    cell_col: str = "label",
    vec_col: str = "embedding",
    dims: int = 64,
) -> DataFrame:
    """Per-cell mean vector: posexplode → mean per (cell, dim) → re-assemble.

    One shuffle keyed on (cell, dim) — tiny. The mean is computed as
    ``CAST(decimal_sum AS DOUBLE) / count`` so it is order-independent and
    bit-reproducible (a double ``avg`` would vary with partition merge
    order). ``sort_array(collect_list(...))`` re-assembles dimension order
    deterministically.
    """
    exploded = corpus.select(
        F.col(cell_col).alias("cell"), F.posexplode(vec_col).alias("dim", "val")
    )
    per_dim = exploded.groupBy("cell", "dim").agg(
        (
            F.sum(F.col("val").cast("decimal(20,10)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_val")
    )
    return per_dim.groupBy("cell").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("dim", "mean_val"))),
            lambda s: s["mean_val"],
        ).alias("centroid")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    dims: int | None = 64,
) -> DataFrame:
    """IVF-style ANN: probe the ``nprobe`` nearest cells, brute-force inside.

    Approximate (recall < 1 when the true neighbor lives in an unprobed
    cell) but the corpus scan drops to ~nprobe/ncells of brute force.
    Output schema matches :func:`brute_force_topk`.
    """
    cents = cell_centroids(corpus, cell_col, vec_col, dims)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        F.sqrt(l2_norm_sq(F.col(vec_col), dims)).alias("__qnorm"),
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("__cell_sim").desc(), F.col("cell").asc()
    )
    probes = (
        q.join(F.broadcast(cents))
        .withColumn("__cell_sim", cosine(F.col("__qvec"), F.col("centroid"), dims))
        .withColumn("__probe_rank", F.row_number().over(probe_w))
        .filter(F.col("__probe_rank") <= nprobe)
        .select("query_id", "__qvec", "__qnorm", "cell")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        F.sqrt(l2_norm_sq(F.col(vec_col), dims)).alias("__cnorm"),
        F.col(cell_col).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(probes), on="cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine_sim",
            dot(F.col("__qvec"), F.col("__cvec"), dims)
            / (F.col("__qnorm") * F.col("__cnorm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def kmeans_assign(
    corpus: DataFrame,
    cents: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int | None = 64,
) -> DataFrame:
    """Assign each vector to its max-cosine centroid (ties → lowest cell).

    Centroids broadcast (tiny); the corpus never shuffles — assignment is a
    map-side scan plus a per-vector top-1 window on the id (the window
    shuffle carries ncells rows per vector, nothing else).
    """
    scored = corpus.select(
        F.col(id_col), F.col(vec_col)
    ).crossJoin(F.broadcast(cents)).withColumn(
        "__sim", cosine(F.col(vec_col), F.col("centroid"), dims)
    )
    w = Window.partitionBy(id_col).orderBy(F.col("__sim").desc(), F.col("cell").asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, vec_col, "cell")
    )


def _assign_to_literal_centroids(
    corpus: DataFrame,
    cent_rows: list[tuple[int, list[float]]],
    id_col: str,
    vec_col: str,
    dims: int,
) -> DataFrame:
    """Assignment as a pure narrow map: centroids embedded as literals.

    The centroid table is tiny (ncells × dims doubles), so instead of a
    crossJoin + top-1 window (a shuffle of ncells rows per vector), each
    Lloyd round collects the centroids and compiles one codegen'd argmax
    expression chain — zero shuffle, zero window, embarrassingly parallel.
    Strict ``>`` comparisons walk cells in ascending order, so ties keep
    the lowest cell — identical to the window's (sim DESC, cell ASC).

    Centroid norms are folded driver-side in Python (IEEE doubles, same
    left-fold order as the engine/oracle), corpus norms in-engine — the
    resulting similarity is bit-identical to :func:`kmeans_assign`.
    """
    import math

    vec = F.col(vec_col)
    norm_v = F.sqrt(l2_norm_sq(vec, dims))
    cells: list[int] = []
    sims: list[Column] = []
    for cell, cvec in sorted(cent_rows):
        acc = 0.0
        for x in cvec:
            acc += x * x
        cnorm = math.sqrt(acc)
        d = F.element_at(vec, 1).cast("double") * F.lit(cvec[0])
        for i in range(1, dims):
            d = d + F.element_at(vec, i + 1).cast("double") * F.lit(cvec[i])
        cells.append(cell)
        sims.append(d / (norm_v * F.lit(cnorm)))
    # argmax via array_max + first-position: each sim expression appears
    # exactly once in the array (a when-chain would nest the growing "best"
    # expression inside every step — exponential plan blowup). First
    # occurrence of the max = lowest cell id, the window's tie rule.
    sim_arr = F.array(*sims)
    pos = F.array_position(sim_arr, F.array_max(sim_arr)).cast("int")
    cell_arr = F.array(*[F.lit(c) for c in cells])
    return corpus.select(
        F.col(id_col),
        F.col(vec_col),
        F.element_at(cell_arr, pos).cast("int").alias("cell"),
    )


def kmeans_train_assign(
    corpus: DataFrame,
    ncells: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
) -> DataFrame:
    """Lloyd's k-means as pure DataFrame ops → final (id, vec, cell).

    * Seeds: the ``ncells`` lowest-id vectors (deterministic, no RNG).
    * Each round: broadcast-assign to max-cosine centroid, then recompute
      per-cell means with the decimal-exact trick (``cell_centroids``) so
      every round is order-independent and bit-reproducible — the DuckDB
      oracle unrolls the same rounds and matches exactly.
    * Rounds are ``iters`` assignments with ``iters-1`` mean updates in
      between; the caller (``ivf_topk``) derives the final probe centroids
      as the means of the returned assignment, which is the ``iters``-th
      update.

    At 100 TB: each round is one scan + one tiny aggregate (ncells×dims
    partial sums); centroids always broadcast. Empty cells drop out
    naturally (their group vanishes), mirrored by the oracle's GROUP BY.
    """
    seed_rows = [
        (i, [float(x) for x in r[0]])
        for i, r in enumerate(
            corpus.orderBy(id_col).limit(ncells).select(vec_col).collect()
        )
    ]
    assigned = _assign_to_literal_centroids(
        corpus, seed_rows, id_col, vec_col, dims
    )
    for _ in range(iters - 1):
        cent_rows = [
            (int(r["cell"]), [float(x) for x in r["centroid"]])
            for r in cell_centroids(assigned, "cell", vec_col, dims).collect()
        ]
        assigned = _assign_to_literal_centroids(
            corpus, cent_rows, id_col, vec_col, dims
        )
    # The final assignment is consumed several times downstream (probe
    # centroids + both sides of the cell join); checkpoint it so the wide
    # literal-dot expression is evaluated once, not per consumer.
    return assigned.localCheckpoint(eager=False)


def ivf_topk_trained(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    ncells: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
) -> DataFrame:
    """IVF ANN over TRAINED k-means cells (no label stand-in).

    Trains ``ncells`` centroids with :func:`kmeans_train_assign`, then runs
    the standard IVF probe (``nprobe`` nearest cells per query, exact
    cosine inside). Same output schema as :func:`brute_force_topk`; recall
    vs brute force is measured in tests/test_operators.py.
    """
    assigned = kmeans_train_assign(corpus, ncells, iters, id_col, vec_col, dims)
    return ivf_topk(
        assigned, queries, k=k, nprobe=nprobe,
        id_col=id_col, vec_col=vec_col, cell_col="cell", dims=dims,
    )


def cosine_neardup_pairs(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
    dims: int | None = None,
    srp_bits: int = 0,
    srp_tables: int = 1,
) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ threshold, blocked + LSH-bucketed.

    Candidate generation composes two keys:

    * ``block_col`` — hard partition (IVF-style cell / label);
    * ``srp_bits``/``srp_tables`` — multi-table signed-random-projection
      LSH: each vector gets ``srp_tables`` independent ``srp_bits``-bit
      signatures, and a pair is a candidate when it matches in ANY table.

    With SRP enabled, no cell is quadratic: the self-join key is
    (block, table, bucket), and the shuffle carries only (id, key) rows —
    vectors re-join only for the surviving candidates, which get EXACT
    cosine verification. Pass ``srp_bits=0`` for the per-cell all-pairs
    variant, ``block_col=None`` + ``srp_bits=0`` for exact all-pairs (only
    sane on small corpora).
    """
    cols = [
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__vec"),
        F.sqrt(l2_norm_sq(F.col(vec_col), dims)).alias("__norm"),
    ]
    if block_col:
        cols.append(F.col(block_col).alias("__block"))
    base = corpus.select(*cols)

    if srp_bits:
        from etl_pipeline_excel_sql__spark.functions.vectors import srp_signatures

        keys = corpus.select(
            F.col(id_col).alias("__id"),
            *([F.col(block_col).alias("__block")] if block_col else []),
            F.posexplode(
                srp_signatures(F.col(vec_col), srp_bits, dims, srp_tables)
            ).alias("__table", "__bucket"),
        )
        key_cols = (["__block"] if block_col else []) + ["__table", "__bucket"]
        cand = (
            keys.select(F.col("__id").alias("id_a"), *key_cols)
            .join(
                keys.select(F.col("__id").alias("id_b"), *key_cols),
                on=key_cols,
            )
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        va = base.select(
            F.col("__id").alias("id_a"),
            F.col("__vec").alias("vec_a"),
            F.col("__norm").alias("norm_a"),
        )
        vb = base.select(
            F.col("__id").alias("id_b"),
            F.col("__vec").alias("vec_b"),
            F.col("__norm").alias("norm_b"),
        )
        joined = cand.join(va, on="id_a").join(vb, on="id_b")
    else:
        a = base.select(
            F.col("__id").alias("id_a"),
            F.col("__vec").alias("vec_a"),
            F.col("__norm").alias("norm_a"),
            *([F.col("__block")] if block_col else []),
        )
        b = base.select(
            F.col("__id").alias("id_b"),
            F.col("__vec").alias("vec_b"),
            F.col("__norm").alias("norm_b"),
            *([F.col("__block")] if block_col else []),
        )
        joined = (a.join(b, on="__block") if block_col else a.crossJoin(b)).filter(
            F.col("id_a") < F.col("id_b")
        )
    return (
        joined.withColumn(
            "cosine_sim",
            dot(F.col("vec_a"), F.col("vec_b"), dims)
            / (F.col("norm_a") * F.col("norm_b")),
        )
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )
