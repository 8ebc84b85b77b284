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
