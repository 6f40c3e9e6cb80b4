"""Deterministic N× scale-up of the driver's synthetic testdata.

``/root/testdata`` tops out at sf0.1 (600k lineitem rows) and is
read-only, but the scaling claims in SCALING.md need at least one
measured decade:  a superlinear cliff in the dedup/ANN/cluster family is
invisible if the largest bench ever run is sf0.1.  This tool reads an
existing sf directory and emits a FACTOR× copy into a gitignored local
dir (default ``.localdata/sf1``), preserving the properties the heavy
queries are sensitive to:

- **Foreign keys survive.**  Every replicated fact/dim key is offset by
  ``copy * 10_000_000`` on BOTH sides of each FK edge
  (orders.o_custkey ↔ customer.c_custkey, lineitem.l_{order,part,supp}key
  ↔ their parents), so join cardinalities scale exactly linearly.
  ``nation``/``region`` are fixed-size dimensions in TPC-H and are
  copied verbatim; int32 FKs into them stay valid.
- **Dedup structure scales linearly, not quadratically.**  Document text
  in copies > 0 has every whitespace token prefixed with ``c{copy}_``,
  which makes cross-copy shingle sets disjoint while keeping each
  copy's internal duplicate/near-duplicate graph byte-identical in
  shape.  The sf1 corpus is therefore 10 independent sf0.1 dedup
  workloads — the correct target for a "grew ≤ data ratio" assertion.
  (Naive replication would make every doc a 10-way exact duplicate and
  MinHash pair counts would grow ~factor² — a different workload, not a
  scaled one.)  ``n_chars`` is recomputed from the mutated text.
- **Embedding geometry is preserved within a copy, scrambled across
  copies.**  Copies > 0 rotate the vector elements by ``copy*7 mod dim``;
  rotation preserves norms and within-copy inner products, so each
  copy's ANN/near-dup neighborhood structure is intact while cross-copy
  cosines are decorrelated.
- **Bounded inputs stay bounded.**  Copy 0 keeps original ids, so
  queries that select a small probe/query set by id (``ann_*``) keep a
  fixed-size query side — at scale the query set does not grow with the
  corpus, matching the production shape.

Everything runs JVM-side (explode + built-in expressions, no Python
UDFs) so generating sf1 takes seconds.  For a second decade generate
sf10 DIRECTLY from sf0.1 with ``--factor 100`` — chaining from sf1
would collide keys, because sf1 ids already span many KEY_OFFSET
blocks (copy 8 of sf1 + offset 1 == copy 9 of sf1 + offset 0).

Usage:
    python tools/gen_scaled_testdata.py \
        [--src /root/testdata/sf0.1] [--dst .localdata/sf1] [--factor 10]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession, functions as F

from etl_pipeline_excel_sql__spark.session import get_session

#: Per-copy key offset.  Far above any key in the ORIGINAL sf0.1 data
#: (o_orderkey ≈ 600k), so replicated key spaces never collide as long
#: as the SOURCE is original driver data; already-scaled dirs exceed
#: one offset block and must not be used as a source (see module doc).
KEY_OFFSET = 10_000_000

#: int64 key columns to offset per table (both sides of every FK edge).
OFFSET_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

#: Fixed-size dimensions copied verbatim (TPC-H keeps these constant
#: across scale factors; int32 FKs into them remain valid).
VERBATIM = ["region", "nation"]

#: Output partition count per replicated table — enough to keep sf1
#: scans parallel on local[32] without a forest of tiny files.
OUT_PARTITIONS = 32


def _replicate(df: DataFrame, table: str, factor: int) -> DataFrame:
    out = df.withColumn(
        "copy", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
    )
    for key in OFFSET_KEYS[table]:
        out = out.withColumn(
            key, F.col(key) + F.col("copy").cast("long") * KEY_OFFSET
        )
    if table == "documents":
        # Tokenize on \s+ — the SAME rule the dedup pipeline's ws_tokens
        # uses. A plain split(' ') would leave tokens after tabs/newlines/
        # double spaces unprefixed, re-creating cross-copy shingle overlap
        # and quadratic pair growth. The rejoin single-spaces the mutated
        # copies (whitespace normalization is an acceptable synthetic-
        # corpus change; copy 0 keeps the original text verbatim).
        mutated = F.array_join(
            F.transform(
                F.filter(
                    F.split(F.col("text"), r"\s+"), lambda t: t != ""
                ),
                lambda w: F.concat(
                    F.lit("c"), F.col("copy").cast("string"), F.lit("_"), w
                ),
            ),
            " ",
        )
        out = out.withColumn(
            "text", F.when(F.col("copy") == 0, F.col("text")).otherwise(mutated)
        ).withColumn("n_chars", F.length("text").cast("long"))
    if table == "embeddings":
        dim = F.size("embedding")
        rot = F.pmod(F.col("copy") * 7, dim)
        rotated = F.concat(
            F.slice(F.col("embedding"), rot + F.lit(1), dim - rot),
            F.slice(F.col("embedding"), F.lit(1), rot),
        )
        out = out.withColumn(
            "embedding",
            F.when(F.col("copy") == 0, F.col("embedding")).otherwise(rotated),
        )
    return out.drop("copy")


def _lengthen_documents(df: DataFrame, factor: int) -> DataFrame:
    """LONG-DOCUMENT variant: same rows, ``factor``× tokens per doc.

    The span-dedup family's cost scales with per-doc token counts
    (k-gram rows = tokens/doc), which row replication never exercises.
    Each document becomes ``factor`` concatenated segments: segment 0 is
    the original text verbatim; segment s ≥ 1 prefixes every whitespace
    token with ``s{s}_``. Cross-doc duplication structure is therefore
    REPLICATED per segment (docs sharing a span originally share its
    prefixed image in every segment) while segments stay mutually
    disjoint — duplicated-token FRACTION holds ~constant as k-gram rows
    grow ``factor``×, which is the scaled workload (not a new one)."""
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    segs = F.transform(
        F.sequence(F.lit(0), F.lit(factor - 1)),
        lambda s: F.when(s == 0, F.col("text")).otherwise(
            F.array_join(
                F.transform(
                    toks,
                    lambda w: F.concat(
                        F.lit("s"), s.cast("string"), F.lit("_"), w
                    ),
                ),
                " ",
            )
        ),
    )
    return df.withColumn("text", F.array_join(segs, " ")).withColumn(
        "n_chars", F.length("text").cast("long")
    )


def generate(
    spark: SparkSession, src: str, dst: str, factor: int,
    mode: str = "replicate",
) -> dict[str, int]:
    """Scale every table from ``src`` by ``factor`` into ``dst``.

    ``mode="replicate"`` multiplies ROWS (FK-preserving copies);
    ``mode="longdoc"`` multiplies TOKENS PER DOCUMENT (documents only,
    every other table verbatim) — the decade the span family's per-doc
    windows actually scale along. Returns {table: output_row_count}.
    """
    counts: dict[str, int] = {}
    if mode == "longdoc":
        for table in VERBATIM + list(OFFSET_KEYS):
            df = spark.read.parquet(f"{src}/{table}.parquet")
            cols = df.columns
            if table == "documents":
                df = _lengthen_documents(df, factor).select(*cols)
            df.repartition(OUT_PARTITIONS if table == "documents" else 1)\
                .write.mode("overwrite").parquet(f"{dst}/{table}.parquet")
            counts[table] = spark.read.parquet(
                f"{dst}/{table}.parquet"
            ).count()
        return counts
    for table in VERBATIM:
        df = spark.read.parquet(f"{src}/{table}.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(
            f"{dst}/{table}.parquet"
        )
        counts[table] = df.count()
    for table in OFFSET_KEYS:
        src_df = spark.read.parquet(f"{src}/{table}.parquet")
        cols = src_df.columns  # preserve original column order
        out = _replicate(src_df, table, factor).select(*cols)
        out.repartition(OUT_PARTITIONS).write.mode("overwrite").parquet(
            f"{dst}/{table}.parquet"
        )
        counts[table] = spark.read.parquet(f"{dst}/{table}.parquet").count()
    return counts


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--dst",
        default=str(Path(__file__).resolve().parent.parent / ".localdata/sf1"),
    )
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--mode",
        choices=["replicate", "longdoc"],
        default="replicate",
        help="replicate = factor× rows; longdoc = factor× tokens/doc "
        "(documents only, other tables verbatim)",
    )
    args = ap.parse_args()

    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    counts = generate(spark, args.src, args.dst, args.factor, mode=args.mode)
    for table, n in counts.items():
        print(f"{table:12s} {n:>10,d}")


if __name__ == "__main__":
    main()
