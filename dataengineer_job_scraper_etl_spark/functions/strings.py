"""String scalar ops (SURVEY §2.7 C4-C9, §2.4 F3).

All native expressions; each documents the reference semantics it
preserves.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def jobid_from_urn(urn: Column) -> Column:
    """C4 — ``data_entity_urn.split(':')[-1]`` (reference main.py:100,
    etl/job_scrape.py:47): last segment of the LinkedIn entity URN.
    ``try_element_at`` keeps null-on-missing under ANSI mode."""
    return F.try_element_at(F.split(urn, ":"), F.lit(-1))


def not_containing(col: Column, pattern: str) -> Column:
    """F3 — the reference's only filter operator
    (etl/job_scrape.py:63): ``df[df['title'].str.contains("Software")
    == False]``. pandas ``== False`` also drops null titles (NaN ==
    False -> False); Spark ``~rlike`` yields null for null input, which
    ``filter`` drops too — semantics align, and we document rather than
    "fix" the null-drop."""
    return ~col.rlike(pattern)


def normalize_ws_lower(col: Column) -> Column:
    """Canonical text normalization used by dedup/fingerprint ops:
    lowercase, collapse whitespace runs, trim (C5/C6 generalized)."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def ws_tokens(col: Column) -> Column:
    r"""THE corpus-wide whitespace tokenization contract (lowercase,
    collapse whitespace runs, trim, split on single space) — shared by
    every tokenizing operator so the cross-engine oracle parity the
    catalog depends on cannot drift copy-by-copy. DuckDB twin:
    ``string_split(trim(regexp_replace(lower(x), '\s+', ' ', 'g')), ' ')``."""
    return F.split(normalize_ws_lower(col), " ")


def ddmmyyyy(col: Column | None = None) -> Column:
    """C7 — the reference's file-naming date format
    (``strftime('%d%m%Y')``, main.py:19)."""
    return F.date_format(col if col is not None else F.current_date(), "ddMMyyyy")
