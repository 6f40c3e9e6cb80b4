"""Vector math over ``array<float>`` embedding columns.

All expressions use an explicit left-fold with a 0.0 initial accumulator and
per-element cast-to-double, so the floating-point evaluation order is fully
specified — results are bit-identical across engines (the DuckDB oracle uses
the same sequential fold), and no rounding fudge is ever needed for
correctness comparison.

Everything here is codegen'd array arithmetic: at 100 TB the similarity scan
is embarrassingly parallel with zero shuffle until the top-k reduction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from etl_pipeline_excel_sql__spark.functions.localframe import local_df


def dot_sql(a: str, b: str, dims: int) -> str:
    """Unrolled left-associative dot product as Spark-SQL text.

    ``a``/``b`` are SQL expressions (column names or field paths). One
    parsed string beats building ~2·dims Column ops through py4j by ~1000×
    in driver time, and the text is byte-stable across invocations so the
    codegen cache can reuse the compiled class.
    """
    return " + ".join(
        f"CAST(element_at({a}, {i + 1}) AS DOUBLE)"
        f" * CAST(element_at({b}, {i + 1}) AS DOUBLE)"
        for i in range(dims)
    )


def l2_norm_sq_sql(a: str, dims: int) -> str:
    return dot_sql(a, a, dims)


def _sql_ref(c: Column | str) -> str | None:
    """SQL text for a plain named column, else None (computed Columns have
    no recoverable SQL text through the public API)."""
    if isinstance(c, str):
        return c
    s = str(c)
    if s.startswith("Column<'") and s.endswith("'>"):
        name = s[8:-2]
        if name.isidentifier():
            return name
    return None


def dot(a: Column | str, b: Column | str, dims: int | None = None) -> Column:
    """Sequential dot product: ``sum_i a[i]*b[i]`` in doubles.

    With ``dims`` given, the sum is unrolled into a flat left-associative
    expression chain — plain codegen'd arithmetic, ~50× faster than the
    higher-order ``aggregate`` fold (HOF lambdas are interpreted per
    element, outside whole-stage codegen). The unrolled chain computes the
    exact same IEEE result as the fold (``0.0 + p1 == p1``), so oracle
    parity is unaffected. Plain named columns take the SQL-text path
    (parsed JVM-side in one call); computed Columns fall back to per-op
    construction. Without ``dims`` (unknown width) it falls back to the
    interpreted fold.
    """
    if dims is not None:
        ra, rb = _sql_ref(a), _sql_ref(b)
        if ra is not None and rb is not None:
            return F.expr(dot_sql(ra, rb, dims))
        a, b = F.col(a) if isinstance(a, str) else a, (
            F.col(b) if isinstance(b, str) else b
        )
        terms = [
            F.element_at(a, i + 1).cast("double")
            * F.element_at(b, i + 1).cast("double")
            for i in range(dims)
        ]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm_sq(a: Column | str, dims: int | None = None) -> Column:
    if dims is not None:
        return dot(a, a, dims)
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column | str, b: Column | str, dims: int | None = None) -> Column:
    """Cosine similarity with deterministic evaluation order."""
    return dot(a, b, dims) / (
        F.sqrt(l2_norm_sq(a, dims)) * F.sqrt(l2_norm_sq(b, dims))
    )


def cosine_sql(a: str, b: str, dims: int) -> str:
    """Cosine as one SQL string (see :func:`dot_sql` for why text)."""
    return (
        f"(({dot_sql(a, b, dims)}) / (SQRT({l2_norm_sq_sql(a, dims)})"
        f" * SQRT({l2_norm_sq_sql(b, dims)})))"
    )


def _srp_plane(j: int, i: int) -> float:
    """Hyperplane component (j, i): deterministic pseudo-random in
    [-0.5, 0.5). Identical to the engine/oracle expression
    ``conv(substr(md5('srp:j:i'),1,15),16,10) % 100000 / 100000 - 0.5`` --
    hashlib.md5 yields the same digits, so the constant folds driver-side
    and the projection compiles to a plain multiply-add chain instead of an
    interpreted higher-order fold (~50x on the hot path)."""
    import hashlib

    h = int(hashlib.md5(f"srp:{j}:{i}".encode()).hexdigest()[:15], 16)
    return (h % 100000) / 100000.0 - 0.5


def _plain_column_name(c) -> str:
    """Unwrap a plain named Column; reject computed expressions (the SQL
    generator needs a reference it can splice into text)."""
    name = _sql_ref(c)
    if name is None:
        raise ValueError(
            f"need a plain column name, got {c!r}; pass the name instead"
        )
    return name


def srp_signature(
    a: Column | str, bits: int, dims: int, plane_offset: int = 0
) -> Column:
    """Signed-random-projection LSH signature (for ANN bucketing).

    Hyperplane components derive from md5 -- reproducible anywhere, no
    stored model. Returns a ``bits``-bit integer bucket id.
    ``plane_offset`` selects an independent hyperplane family (table t of a
    multi-table scheme uses ``plane_offset = t * bits``).

    The expression is generated as ONE SQL string and parsed JVM-side:
    building the ~2,000-node tree through per-op Python calls costs seconds
    of driver time per invocation, while parsing the equivalent text takes
    milliseconds. ``a`` must therefore be a plain column name (a named
    Column is unwrapped). Sums are written left-associative, matching the
    oracle's sequential fold bit-for-bit.
    """
    col = _plain_column_name(a)
    bit_sqls = []
    for jj in range(bits):
        j = plane_offset + jj
        terms = " + ".join(
            f"CAST(element_at({col}, {i + 1}) AS DOUBLE) * {_srp_plane(j, i)!r}D"
            for i in range(dims)
        )
        bit_sqls.append(
            f"(CASE WHEN ({terms}) > 0 THEN CAST({1 << jj} AS BIGINT) "
            f"ELSE CAST(0 AS BIGINT) END)"
        )
    return F.expr(" + ".join(bit_sqls))


def srp_signatures(
    a: Column, bits: int, dims: int, tables: int
) -> Column:
    """``tables`` independent SRP signatures → ``array<bigint>``.

    Table ``t`` uses hyperplanes ``t*bits .. (t+1)*bits-1``, so every table
    is an independent ``bits``-bit hash family; a multi-table LSH candidate
    filter keeps pairs matching in ANY table (recall ``1-(1-p^bits)^tables``
    for per-plane agreement probability ``p = 1 - θ/π``).

    NOTE: this fuses tables×bits×dims products into one projection — fine
    up to ~512 terms, but beyond that janino rejects the generated method
    and eval silently degrades to interpreted. Multi-table callers on the
    hot path should prefer :func:`srp_buckets_long`.
    """
    return F.array(
        *[srp_signature(a, bits, dims, plane_offset=t * bits) for t in range(tables)]
    )


def srp_planes_df(
    spark, bits: int, dims: int, tables: int = 1,
    plane_stride: int | None = None,
):
    """The hyperplane model as a tiny broadcastable table:
    ``(__t, __j, __plane array<double>, __w = 2^j)`` — tables×bits rows.
    Column names are __-reserved so the crossJoin in
    :func:`srp_buckets_long` can never collide with a corpus column
    (short names like ``t``/``w`` are common in caller frames). Plane
    components come from the same md5 derivation as :func:`srp_signature`
    (identical doubles), just computed driver-side once.

    ``plane_stride`` fixes table ``t``'s flat plane indices at
    ``t*stride .. t*stride+bits-1`` (default ``stride=bits``, the
    :func:`srp_signatures` layout). Callers that derive ``bits`` from
    the corpus size pass a CONSTANT stride ≥ max bits so the plane
    family is a prefix-stable function of (t, j): growing ``bits`` adds
    planes without re-seeding the ones already in use — and the oracle
    twin can enumerate a fixed plane set gated by a runtime bit count.
    """
    stride = bits if plane_stride is None else plane_stride
    if stride < bits:
        raise ValueError(f"plane_stride {stride} < bits {bits}: tables overlap")
    rows = [
        (
            t,
            j,
            [_srp_plane(t * stride + j, i) for i in range(dims)],
            1 << j,
        )
        for t in range(tables)
        for j in range(bits)
    ]
    return local_df(
        spark, rows, "__t INT, __j INT, __plane ARRAY<DOUBLE>, __w BIGINT"
    )


def srp_buckets_long(
    corpus,
    id_col: str,
    vec_col: str,
    bits: int,
    dims: int,
    tables: int = 1,
    extra_cols: tuple[str, ...] = (),
    plane_stride: int | None = None,
) -> "DataFrame":
    """Multi-table SRP buckets in long form: ``(id, *extra, __table,
    __bucket)`` — one row per (vector, table).

    Planes enter as a broadcast TABLE (:func:`srp_planes_df`), so the
    per-row expression is one ``dims``-term dot product — small enough to
    whole-stage-codegen no matter how many tables/bits, with text that is
    identical across invocations (codegen cache hit). The bucket integer
    is an order-independent BIGINT sum of ``2^j`` votes, so the map-side
    combined groupBy carries (tables) rows per vector and the result is
    bit-identical to :func:`srp_signature`'s fused chain (same plane
    doubles, same left-associative projection fold).
    """
    planes = srp_planes_df(
        corpus.sparkSession, bits, dims, tables, plane_stride=plane_stride
    )
    return (
        corpus.crossJoin(F.broadcast(planes))
        .withColumn("__proj", F.expr(dot_sql(vec_col, "__plane", dims)))
        .groupBy(F.col(id_col), *[F.col(c) for c in extra_cols], F.col("__t"))
        .agg(
            F.sum(
                F.when(F.col("__proj") > 0, F.col("__w")).otherwise(
                    F.lit(0).cast("bigint")
                )
            ).alias("__bucket")
        )
        .select(
            F.col(id_col),
            *[F.col(c) for c in extra_cols],
            F.col("__t").alias("__table"),
            F.col("__bucket"),
        )
    )
