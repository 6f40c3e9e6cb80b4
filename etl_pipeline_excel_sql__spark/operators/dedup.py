"""Deduplication operators for training-data pipelines.

Five strategies, all shuffle-conscious:

* **exact** — hash-groupBy on a content hash. One shuffle on a 60-bit key;
  at 100 TB the hash (16 bytes) shuffles instead of the document bodies.
* **MinHash + LSH** — shingle → k-minhash signature → band buckets →
  candidate pairs via self-join *on the band key only* → exact Jaccard
  verification of candidates. The band join is the classic LSH trick: near
  pairs collide in ≥1 band with high probability, so the O(n²) pair space
  never materializes. Banding keys are small ints+hashes — the shuffle
  carries signatures, not documents.
* **SimHash** — per-document fingerprint; grouping by fingerprint (or by
  fingerprint prefix + hamming verification) catches near-identical docs.
* **n-gram Jaccard** — exact verification primitive, also usable standalone
  with a cheap blocking key.
* **embedding cosine** — near-dup by vector similarity (see similarity.py
  for the ANN machinery).

All expression-only (no UDFs): portable, codegen'd, and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_pipeline_excel_sql__spark.functions.hashing import (
    md5_hash60,
    minhash_signature,
    simhash_expr,
)
from etl_pipeline_excel_sql__spark.functions.text import shingles, ws_tokens


def exact_dedup(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Exact dedup: one keeper (min id) per distinct content hash.

    Output: ``content_hash, keeper_id, dup_count`` — join back on the hash to
    drop losers. Map-side partial aggregation makes the shuffle carry one row
    per distinct hash per partition.
    """
    return (
        df.select(md5_hash60(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).cast("bigint").alias("keeper_id"),
            F.count(F.lit(1)).cast("bigint").alias("dup_count"),
        )
    )


def with_minhash(
    df: DataFrame,
    text_col: str,
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Attach ``__shingles`` and ``__minhash`` (array<bigint>) columns."""
    toks = ws_tokens(F.col(text_col))
    sh = shingles(toks, shingle_n)
    return df.withColumn("__shingles", sh).withColumn(
        "__minhash", minhash_signature(F.col("__shingles"), num_hashes)
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two (distinct-element) string arrays."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 8,
    band_rows: int = 2,
    shingle_n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Near-dup pairs via MinHash banding + exact Jaccard verification.

    Bands of ``band_rows`` signature entries become bucket keys; documents
    sharing any band bucket are candidates; candidates are verified with
    exact Jaccard over their shingle sets and filtered by ``threshold``.

    Output: ``id_a, id_b, jaccard_sim`` with ``id_a < id_b``, one row per
    pair (distinct across bands). The only shuffles are the band-bucket
    self-join and the final distinct — both on compact keys.
    """
    assert num_hashes % band_rows == 0
    num_bands = num_hashes // band_rows
    sig = with_minhash(df, text_col, num_hashes, shingle_n).select(
        F.col(id_col).alias("__id"), "__shingles", "__minhash"
    )
    bands = sig.select(
        "__id",
        "__shingles",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        ",",
                        *[
                            F.element_at(F.col("__minhash"), b * band_rows + r + 1)
                            for r in range(band_rows)
                        ],
                    )
                    for b in range(num_bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    left = bands.select(
        F.col("__id").alias("id_a"),
        F.col("__shingles").alias("sh_a"),
        "band",
        "bucket",
    )
    right = bands.select(
        F.col("__id").alias("id_b"),
        F.col("__shingles").alias("sh_b"),
        "band",
        "bucket",
    )
    cand = (
        left.join(right, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("jaccard_sim", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", "jaccard_sim")
    )


def simhash_signatures(
    df: DataFrame, text_col: str, id_col: str, bits: int = 32
) -> DataFrame:
    """Per-document SimHash fingerprint (bigint)."""
    return (
        df.withColumn("__toks", ws_tokens(F.col(text_col)))
        .select(
            F.col(id_col).alias("doc_id"),
            simhash_expr("__toks", bits).alias("simhash"),
        )
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bits: int = 32,
    max_hamming: int = 3,
    prefix_bits: int = 16,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, blocked on a prefix.

    Documents sharing the top ``prefix_bits`` of their fingerprint are
    candidates (at most ``bits - prefix_bits`` differing low bits can pass
    anyway when ``max_hamming`` is small relative to the prefix). Verification
    is ``bit_count(xor) <= max_hamming``.
    """
    sigs = simhash_signatures(df, text_col, id_col, bits)
    pref = F.shiftright(F.col("simhash"), bits - prefix_bits)
    blocked = sigs.withColumn("block", pref)
    a = blocked.select(
        F.col("doc_id").alias("id_a"), F.col("simhash").alias("sh_a"), "block"
    )
    b = blocked.select(
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("sh_b"), "block"
    )
    return (
        a.join(b, on="block")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    threshold: float = 0.1,
) -> DataFrame:
    """Blocked exact n-gram Jaccard (no probabilistic step).

    Blocking key: first whitespace token + token-count bucket — documents
    that can't plausibly be near-dups never pair up. This is the exact-but-
    blocked fallback when MinHash recall guarantees aren't wanted.
    """
    toks = ws_tokens(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("__id"),
        shingles(toks, shingle_n).alias("__sh"),
        F.element_at(toks, 1).alias("__first_tok"),
        F.floor(F.size(toks) / 10).cast("bigint").alias("__len_bucket"),
    )
    a = base.select(
        F.col("__id").alias("id_a"),
        F.col("__sh").alias("sh_a"),
        "__first_tok",
        "__len_bucket",
    )
    b = base.select(
        F.col("__id").alias("id_b"),
        F.col("__sh").alias("sh_b"),
        "__first_tok",
        "__len_bucket",
    )
    return (
        a.join(b, on=["__first_tok", "__len_bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard_sim", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", "jaccard_sim")
    )
