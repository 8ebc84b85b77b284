"""U2/U3 + J2 — skill extraction: match a broadcast pattern dictionary
against document text, emit a deduped array of matched skills.

Reference semantics (main.py:132-139, etl/transform.py:26-49): a spaCy
EntityRuler holds ~2.4k token-sequence patterns
(assets/skills_no_en.jsonl shape); each description yields the set of
matched patterns, lowercased and deduped (``list(set(...))``,
main.py:139). The reference's own Spark variant already chose
``pandas_udf(ArrayType(StringType()))`` + Arrow for this step
(etl/transform.py:46-49) — we keep that design and harden it.

Canonical matching semantics (engine + oracle agree on this):
a pattern phrase matches a document iff its tokens appear as a
contiguous subsequence of the whitespace-tokenized, lowercased text.
Output = sorted distinct matched phrases (array_sort replaces the
reference's nondeterministic set() ordering — SURVEY §7 risk register).

Two implementations, equal by construction (tested against each other):

1. ``extract_skills_native`` — pure Catalyst expression: filter a
   broadcast array literal of phrases by substring containment on the
   normalized text. Zero shuffle, zero Python, codegen'd; this is the
   oracle-checkable formulation.
2. ``extract_skills_udf`` — Arrow-batched pandas UDF running a token
   trie (Aho-Corasick-lite) built ONCE per Python worker from a
   broadcast variable; O(tokens) per document instead of
   O(patterns x text). This is the scale path for dictionaries far
   larger than a few thousand entries and is also where a real spaCy
   pipeline would slot in (import-gated; not available in this image).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_PATTERNS_PATH = "assets/skill_patterns.jsonl"


def phrases_from_patterns(patterns: list[dict]) -> list[str]:
    """JSONL pattern rows ({"label","pattern":[{"LOWER": tok},...]}) ->
    lowercase space-joined phrases. Mirrors how the reference's
    EntityRuler consumes the file (main.py:132-133)."""
    out = []
    for row in patterns:
        toks = [
            str(tok.get("LOWER") or tok.get("TEXT") or "").lower()
            for tok in row.get("pattern", [])
        ]
        phrase = " ".join(t for t in toks if t)
        if phrase:
            out.append(phrase)
    return sorted(set(out))


def _normalized(text: Column) -> Column:
    # lowercase + collapse whitespace, padded so every token boundary is
    # a single space — makes phrase containment == token-subsequence.
    return F.concat(
        F.lit(" "), F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")), F.lit(" ")
    )


def extract_skills_native(text: Column, phrases: list[str]) -> Column:
    """Pure-expression formulation: the phrase dictionary is a literal
    array (Catalyst constant, shipped with the plan — the broadcast of
    a small dim without a join). Each row evaluates `contains` per
    phrase inside codegen; no shuffle, no Python worker.

    Null text -> null skills (matches reference: rows with null
    description are dropped before this runs, main.py:152)."""
    padded = _normalized(text)
    arr = F.filter(
        F.array(*[F.lit(p) for p in phrases]),
        lambda p: padded.contains(F.concat(F.lit(" "), p, F.lit(" "))),
    )
    return F.when(text.isNotNull(), F.array_sort(F.array_distinct(arr)))


def skills_oracle_sql(text_expr: str, phrases: list[str]) -> str:
    """DuckDB scalar expression computing the same sorted skill list."""
    quoted = ", ".join("'" + p.replace("'", "''") + "'" for p in phrases)
    padded = (
        f"(' ' || trim(regexp_replace(lower({text_expr}), '\\s+', ' ', 'g')) || ' ')"
    )
    return (
        f"CASE WHEN {text_expr} IS NOT NULL THEN "
        f"list_sort(list_filter([{quoted}], "
        f"p -> contains({padded}, ' ' || p || ' '))) END"
    )


class _TokenTrie:
    """Token-sequence matcher: trie over phrase tokens, one pass over
    the document tokens with all active partial matches advanced per
    token. Equivalent output to the native formulation."""

    __slots__ = ("root",)

    def __init__(self, phrases: list[str]):
        self.root: dict = {}
        for phrase in phrases:
            node = self.root
            for tok in phrase.split():
                node = node.setdefault(tok, {})
            node[""] = phrase  # terminal

    def match(self, text: str) -> list[str]:
        toks = text.lower().split()
        found: set[str] = set()
        active: list[dict] = []
        for tok in toks:
            nxt = []
            for node in active:
                child = node.get(tok)
                if child is not None:
                    nxt.append(child)
                    if "" in child:
                        found.add(child[""])
            child = self.root.get(tok)
            if child is not None:
                nxt.append(child)
                if "" in child:
                    found.add(child[""])
            active = nxt
        return sorted(found)


def make_skills_udf(spark: SparkSession, phrases: list[str]):
    """Build the pandas UDF with the dictionary as a Spark broadcast
    variable (pickled once per executor, not per task closure). The
    trie is constructed lazily on first batch in each Python worker —
    the 'load the model once per worker' rule the reference applies to
    its spaCy pipeline (etl/transform.py:23-27)."""
    bc = spark.sparkContext.broadcast(phrases)
    state: dict = {}

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def skills_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        trie = state.get("trie")
        if trie is None:
            trie = state["trie"] = _TokenTrie(bc.value)
        for batch in it:
            yield batch.map(lambda s: trie.match(s) if isinstance(s, str) else None)

    return skills_udf


def extract_skills_udf(
    spark: SparkSession, df: DataFrame, text_col: str, phrases: list[str],
    out_col: str = "skills",
) -> DataFrame:
    """U2/U3 assembled: df + sorted distinct skills array column."""
    udf = make_skills_udf(spark, phrases)
    return df.withColumn(out_col, udf(F.col(text_col)))


def skill_counts(df: DataFrame, skills_col: str = "skills",
                 group_cols: tuple[str, ...] = ("job_type",)) -> DataFrame:
    """The flagship consumer query (SURVEY §2.6): explode(skills) ->
    groupBy(skill, *group_cols) -> count. Partial aggregation
    (map-side combine) keeps the shuffle small: the shuffled rows are
    (skill, group, partial_count), bounded by |dictionary| x |groups|
    per partition regardless of input size."""
    return (
        df.select(*group_cols, F.explode(F.col(skills_col)).alias("skill"))
        .groupBy("skill", *group_cols)
        .agg(F.count(F.lit(1)).alias("n"))
    )
