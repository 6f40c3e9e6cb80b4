"""Deterministic, engine-portable hashing expressions.

All content hashing in the engine is built on MD5 (available and
bit-identical in Spark, DuckDB, and every other engine), truncated to 60
bits. We deliberately avoid ``xxhash64``/``F.hash`` — fast but Spark-private,
so results could never be verified by an external oracle or reproduced by a
downstream system reading our outputs.

At 100 TB scale these expressions are all codegen'd JVM work (md5 + string
slicing + conv), fully parallel, no shuffle of their own.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: 60-bit hash space (15 hex digits) — fits comfortably in a signed int64,
#: so arithmetic on hashes can never overflow ANSI-mode bigint checks.
HASH_BITS = 60

#: The DuckDB-oracle twin of :func:`md5_hash60`, as a format template
#: (``{x}`` = the SQL string expression to hash). Single source of truth:
#: every plan module's oracle imports THIS instead of restating the
#: definition, so a change to the hash contract cannot silently leave a
#: stringly-typed copy behind.
H60_SQL = "CAST('0x' || substr(md5({x}), 1, 15) AS BIGINT)"


def md5_hash60(col: Column | str) -> Column:
    """60-bit integer hash of a string column via md5 (portable, exact).

    DuckDB-oracle equivalent: ``CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def md5_hash60_seeded(col: Column | str, seed: int) -> Column:
    """Seeded variant: hash of ``'<seed>:' || x`` — gives k independent
    hash families for MinHash permutations from one primitive."""
    c = F.col(col) if isinstance(col, str) else col
    return md5_hash60(F.concat(F.lit(f"{seed}:"), c))


def minhash_signature(shingles: Column, num_hashes: int) -> Column:
    """MinHash signature: array of ``num_hashes`` min-over-shingles values.

    ``array_min(transform(shingles, s -> hash_i(s)))`` per hash family —
    all vectorized array expressions, no UDF, no shuffle. Empty shingle sets
    yield NULL entries (callers filter empty docs first).
    """
    # NB: the per-seed lambda must be built by a factory — a default-arg
    # lambda (``lambda s, i=i``) would be treated by PySpark as the two-arg
    # (element, index) form and silently rebind ``i`` to the index column.
    def _seeded(seed: int):
        prefix = f"{seed}:"
        return lambda s: F.conv(
            F.substring(F.md5(F.concat(F.lit(prefix), s)), 1, 15), 16, 10
        ).cast("bigint")

    sigs = [
        F.array_min(F.transform(shingles, _seeded(i))) for i in range(num_hashes)
    ]
    return F.array(*sigs)


def simhash_expr(tokens_col_name: str, bits: int = 32) -> Column:
    """SimHash over a token-array column: sign of the per-bit vote sum.

    For each bit j, every token votes +1 if bit j of its 60-bit hash is set,
    else -1; the fingerprint sets bit j when the vote sum is positive.

    Built as a SQL lambda expression (``F.expr``) because the shift amount is
    itself a lambda variable, which the Python ``shiftright`` API doesn't
    accept. Still fully codegen'd — no UDF. Takes a column *name* (attach the
    token array with ``withColumn`` first).
    """
    t = tokens_col_name
    hs = f"transform({t}, tk -> cast(conv(substring(md5(tk), 1, 15), 16, 10) as bigint))"
    votes = (
        f"transform(sequence(0, {bits - 1}), j -> "
        f"CASE WHEN aggregate({hs}, cast(0 as bigint), "
        f"(acc, h) -> acc + (shiftright(h, j) & 1) * 2 - 1) > 0 "
        f"THEN cast(1 as bigint) ELSE cast(0 as bigint) END)"
    )
    return F.expr(
        f"aggregate(zip_with({votes}, sequence(0, {bits - 1}), "
        f"(b, j) -> shiftleft(b, j)), cast(0 as bigint), (acc, v) -> acc + v)"
    )


def rolling_fingerprint(tokens: Column, modulus: int = 1 << 40) -> Column:
    """Polynomial rolling hash of a token sequence (order-sensitive).

    ``acc = (acc * 31 + md5_60(token) % mod) % mod`` left fold. The modulus
    keeps every intermediate below 2**46, safely inside ANSI bigint. Unlike
    :func:`md5_hash60` of the whole text, this fingerprint is stable under
    chunked/streaming computation (fold is associative-composable by segment).
    """
    return F.aggregate(
        tokens,
        F.lit(0).cast("bigint"),
        lambda acc, t: (
            acc * 31
            + F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint") % modulus
        )
        % modulus,
    )
