"""C3 — seniority classification.

Reference semantics (main.py:164-171): a first-match-wins when-chain
over case-insensitive substring matches on the title. Branch order is
load-bearing ("Senior Engineering Manager" -> "Senior", never
"Manager"):

    senior            -> Senior
    junior|graduate   -> Junior
    manager|head      -> Manager
    principal|lead    -> Lead
    otherwise         -> null   (null title -> null, three-valued logic)

Native ``F.when`` chain — identical shape to the reference's
pl.when/then, but Catalyst-visible and codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (regex, label) in first-match-wins order.
SENIORITY_RULES: tuple[tuple[str, str], ...] = (
    (r"(?i)senior", "Senior"),
    (r"(?i)junior|graduate", "Junior"),
    (r"(?i)manager|head", "Manager"),
    (r"(?i)principal|lead", "Lead"),
)


def classify_seniority(title: Column) -> Column:
    expr: Column | None = None
    for pattern, label in SENIORITY_RULES:
        cond = title.rlike(pattern)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    assert expr is not None
    return expr.otherwise(F.lit(None).cast("string"))


def seniority_oracle_sql(title_expr: str) -> str:
    """Same chain as a DuckDB CASE expression (regexp_matches is RE2;
    the inline (?i) flag works in both engines)."""
    branches = " ".join(
        f"WHEN regexp_matches({title_expr}, '{pattern}') THEN '{label}'"
        for pattern, label in SENIORITY_RULES
    )
    return f"CASE {branches} ELSE NULL END"
