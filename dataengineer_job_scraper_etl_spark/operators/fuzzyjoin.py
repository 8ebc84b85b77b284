"""Blocked fuzzy self-join — the entity-resolution primitive (dedupe
variant spellings, merge near-identical records) done the only way it
scales: NEVER all-pairs. Candidates come from an equi-join on a cheap
BLOCKING KEY (here: a token of the string; in production a soundex,
a prefix, a sorted-token fingerprint, or several such keys unioned),
and the expensive verifier (edit distance) runs only inside blocks.

Same two-phase candidate/verify shape as the MinHash-LSH and SimHash
near-dup operators (operators/dedup.py) — this is the EXACT-threshold,
short-string member of that family. The verifier is Spark's built-in
``levenshtein`` (JVM, codegen'd; identical to DuckDB's, so entries
built on this are fully oracle-checkable).

Scale notes: cost is sum over blocks of |block|^2 — the blocking
function is the knob. A skewed block (one giant key) is the classic
failure; at 100 TB compose keys (e.g. noun + type) until the largest
block is bounded, or cap blocks with a deterministic per-block limit
and route the overflow to a sketch-based near-dup pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: Column,
    max_dist: int,
) -> DataFrame:
    """(id_a, id_b, block, dist) for every within-block pair with
    levenshtein(text_a, text_b) <= max_dist, id_a < id_b (each
    unordered pair once). The join is a plain equi-join on the block
    key — shuffle-partitioned by block, verifier runs post-join."""
    side = df.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__txt"),
        block_col.alias("__block"),
    )
    a = side.alias("a")
    b = side.alias("b")
    dist = F.levenshtein(F.col("a.__txt"), F.col("b.__txt"))
    return (
        a.join(
            b,
            (F.col("a.__block") == F.col("b.__block"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__block").alias("block"),
            dist.alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
    )


def symdelete_pairs(
    df: DataFrame,
    text_col: str,
) -> DataFrame:
    """(text_a, text_b, dist): every UNORDERED pair of distinct
    ``text_col`` values within Levenshtein distance 1, via
    symmetric-delete (SymSpell-style) blocking — the formulation that
    stays LINEAR where key-equality blocking goes quadratic.

    Why: real corpora repeat values heavily (column domains are small
    relative to row counts), so ER runs on the DISTINCT-value frame
    and multiplicities ride along arithmetically. Candidate keys are
    each value's 1-deletion neighborhood plus the value itself; two
    strings at distance exactly 1 ALWAYS share a key (substitution:
    both delete position i; insert/delete: the shorter string IS a
    deletion variant of the longer), so the blocking is provably
    complete for dist <= 1 — no recall loss, unlike single-key
    blocking. Explode factor is |s|+1 keys per distinct value
    (linear); block sizes are near-singleton instead of
    domain-sized. Depth-d neighborhoods generalize to distance d.

    All candidate generation is JVM array expressions; the verifier
    is the built-in levenshtein over deduped candidate pairs only."""
    name = F.col("__name")
    i_del = lambda i: F.concat(  # noqa: E731 — delete char at i
        F.substr(name, F.lit(1), i - 1),
        F.substr(name, i + 1, F.length(name)),
    )
    keys = F.array_union(
        F.array(name),
        F.transform(F.sequence(F.lit(1), F.length(name)), i_del),
    )
    keyed = (
        df.select(F.col(text_col).alias("__name"))
        .distinct()
        .select("__name", F.explode(keys).alias("__key"))
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.__key") == F.col("b.__key"))
            & (F.col("a.__name") < F.col("b.__name")),
        )
        .select(
            F.col("a.__name").alias("text_a"),
            F.col("b.__name").alias("text_b"),
        )
        .distinct()
    )
    dist = F.levenshtein(F.col("text_a"), F.col("text_b"))
    return cand.withColumn("dist", dist).filter(F.col("dist") <= 1)
