"""Batch MERGE (SCD-1 upsert) and soft-delete — the lakehouse write patterns.

Without a transactional table format in this container (Delta/Iceberg), the
engine expresses MERGE as a full-outer join + coalesce rewrite — exactly the
shuffle work a format's MERGE does under the hood, minus the commit
protocol. One shuffle on the key for both sides; at scale the join benefits
from both tables being bucketed on the merge key (sinks/bucketed.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame, source: DataFrame, key: str, update_cols: list[str]
) -> DataFrame:
    """SCD-1 MERGE: source rows update matching keys and insert new ones.

    Output contains every target row (updated where matched) plus all
    source-only rows. Column set: ``key`` + ``update_cols``.

    Standard SQL MERGE UPDATE semantics: a matched source row's values win
    unconditionally, including NULLs (an explicit matched flag, not
    ``coalesce``, so a source NULL nulls the target column rather than
    silently keeping the old value).
    """
    t = target.select(key, *[F.col(c).alias(f"__t_{c}") for c in update_cols])
    s = source.select(
        key, *[F.col(c).alias(f"__s_{c}") for c in update_cols]
    ).withColumn("__matched", F.lit(True))
    joined = t.join(s, on=key, how="full")
    return joined.select(
        key,
        *[
            F.when(F.col("__matched"), F.col(f"__s_{c}"))
            .otherwise(F.col(f"__t_{c}"))
            .alias(c)
            for c in update_cols
        ],
    )


def merge_with_deletes(
    target: DataFrame,
    source: DataFrame,
    key: str,
    update_cols: list[str],
    delete_flag: str,
) -> DataFrame:
    """MERGE with delete semantics: source rows flagged ``delete_flag=true``
    remove the key; others upsert as in :func:`merge_upsert`."""
    deletes = source.filter(F.col(delete_flag)).select(key)
    upserts = source.filter(~F.col(delete_flag))
    merged = merge_upsert(target, upserts.drop(delete_flag), key, update_cols)
    return merged.join(deletes, on=key, how="left_anti")
