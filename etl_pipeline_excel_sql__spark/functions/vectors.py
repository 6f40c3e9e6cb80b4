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


def dot(a: Column, b: Column, dims: int | None = None) -> Column:
    """Sequential dot product: ``sum_i a[i]*b[i]`` in doubles.

    With ``dims`` given, the sum is unrolled into a flat left-associative
    expression chain — plain codegen'd arithmetic, ~50× faster than the
    higher-order ``aggregate`` fold (HOF lambdas are interpreted per
    element, outside whole-stage codegen). The unrolled chain computes the
    exact same IEEE result as the fold (``0.0 + p1 == p1``), so oracle
    parity is unaffected. Without ``dims`` (unknown width) it falls back to
    the fold.
    """
    if dims is not None:
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


def l2_norm_sq(a: Column, dims: int | None = None) -> Column:
    if dims is not None:
        terms = [
            F.element_at(a, i + 1).cast("double")
            * F.element_at(a, i + 1).cast("double")
            for i in range(dims)
        ]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column, dims: int | None = None) -> Column:
    """Cosine similarity with deterministic evaluation order."""
    return dot(a, b, dims) / (
        F.sqrt(l2_norm_sq(a, dims)) * F.sqrt(l2_norm_sq(b, dims))
    )


def srp_signature(
    a: Column, bits: int, dims: int, plane_offset: int = 0
) -> Column:
    """Signed-random-projection LSH signature (for ANN bucketing).

    Hyperplane component (j, i) is a deterministic pseudo-random value in
    [-0.5, 0.5) derived from md5 — reproducible anywhere, no stored model.
    Returns a ``bits``-bit integer bucket id. ``plane_offset`` selects an
    independent hyperplane family (table t of a multi-table LSH scheme uses
    ``plane_offset = t * bits``).
    """

    def plane_component(j: int, i: Column) -> Column:
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"srp:{j}:"), i.cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("bigint")
        return (h % 100000).cast("double") / 100000.0 - 0.5

    # Factory closure: a default-arg lambda would change the arity PySpark
    # sees and rebind the captured variable to a generated column.
    def _proj_lambda(j: int):
        return lambda x, i: x.cast("double") * plane_component(j, i)

    bit_cols = []
    for jj in range(bits):
        j = plane_offset + jj
        proj = F.aggregate(
            F.zip_with(a, F.sequence(F.lit(0), F.lit(dims - 1)), _proj_lambda(j)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit_cols.append(
            F.when(proj > 0, F.lit(1 << jj).cast("bigint")).otherwise(
                F.lit(0).cast("bigint")
            )
        )
    out = bit_cols[0]
    for b in bit_cols[1:]:
        out = out + b
    return out


def srp_signatures(
    a: Column, bits: int, dims: int, tables: int
) -> Column:
    """``tables`` independent SRP signatures → ``array<bigint>``.

    Table ``t`` uses hyperplanes ``t*bits .. (t+1)*bits-1``, so every table
    is an independent ``bits``-bit hash family; a multi-table LSH candidate
    filter keeps pairs matching in ANY table (recall ``1-(1-p^bits)^tables``
    for per-plane agreement probability ``p = 1 - θ/π``).
    """
    return F.array(
        *[srp_signature(a, bits, dims, plane_offset=t * bits) for t in range(tables)]
    )
