"""Name/text normalizers (SURVEY.md §2.6 T3-T5).

These operate on *metadata* (column names, filenames) so they are pure Python
driver functions — no executor involvement. ``norm_header_col`` /
``normalize_colname_col`` expose the same semantics as Column expressions for
use on data (text analysis, §2.9 tokenization paths).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def norm_header(s: str | None) -> str:
    """Space-canonical normalizer (reference Upload.py:137-145 semantics).

    NBSP/CR/LF → space, strip, lowercase, collapse ``[\\s_]+`` runs to one
    space, drop everything outside ``[a-z0-9 ]``.

    >>> norm_header(' Total\\xa0Project_Cost ($M) ')
    'total project cost m'
    """
    if s is None:
        return ""
    s = s.replace("\xa0", " ").replace("\r", " ").replace("\n", " ")
    s = s.strip().lower()
    s = re.sub(r"[\s_]+", " ", s)
    s = re.sub(r"[^a-z0-9 ]+", "", s)
    return re.sub(r" +", " ", s).strip()


def normalize_colname(s: str | None) -> str:
    """Underscore-canonical normalizer (reference Compare.py:34-39 semantics).

    Collapse whitespace, strip, lowercase, runs of non-alphanumerics → ``_``,
    strip leading/trailing underscores. Deliberately distinct from
    :func:`norm_header` (space vs underscore canonical form) — the reference
    keeps both and so do we.

    >>> normalize_colname(' Total\\xa0Project_Cost ($M) ')
    'total_project_cost_m'
    """
    if s is None:
        return ""
    s = re.sub(r"\s+", " ", str(s)).strip().lower()
    s = re.sub(r"[^a-z0-9]+", "_", s)
    return s.strip("_")


def safe_fname_token(s: str) -> str:
    """Filename sanitizer: ``\\/:*?"<>|`` → ``_`` (reference Upload.py:105-107)."""
    return re.sub(r'[\\/:*?"<>|]', "_", s)


def norm_header_col(col: Column | str) -> Column:
    """:func:`norm_header` as a codegen'd Column expression (for data, not names)."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.regexp_replace(c, r"[\xa0\r\n]", " ")
    s = F.lower(F.trim(s))
    s = F.regexp_replace(s, r"[\s_]+", " ")
    s = F.regexp_replace(s, r"[^a-z0-9 ]+", "")
    return F.trim(F.regexp_replace(s, r" +", " "))


def normalize_colname_col(col: Column | str) -> Column:
    """:func:`normalize_colname` as a Column expression."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))
    s = F.regexp_replace(s, r"[^a-z0-9]+", "_")
    return F.regexp_replace(s, r"^_+|_+$", "")
