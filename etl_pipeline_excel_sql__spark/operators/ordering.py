"""Categorical block ordering (SURVEY.md §2.7 O1).

The reference writes ministry blocks in the declaration order of its
MINISTRY_LIST, not alphabetically (Upload.py:193-196), preserving source row
order inside each block. Spark-first: an ``array_position`` sort key plus an
explicit intra-block ordinal — one sort, no per-block scans (the reference
re-filters the frame once per ministry; at scale that would be N full passes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def categorical_order(
    df: DataFrame,
    col: str,
    categories: list[str],
    tiebreak_cols: list[str] | None = None,
    keep_unlisted: bool = False,
) -> DataFrame:
    """Order rows by the fixed category list, with explicit tiebreaks.

    Unlisted category values sort last (``array_position`` = 0 → remapped to
    +inf rank) and are dropped unless ``keep_unlisted`` — the reference's ALL
    path only writes listed ministries (its IN-list filter runs first).
    """
    cats = F.array(*[F.lit(c) for c in categories])
    pos = F.array_position(cats, F.col(col))
    rank = F.when(pos == 0, F.lit(len(categories) + 1)).otherwise(pos)
    out = df.withColumn("_ord", rank.cast("int"))
    if not keep_unlisted:
        out = out.filter(F.col("_ord") <= len(categories))
    return out.orderBy("_ord", *(tiebreak_cols or []))
