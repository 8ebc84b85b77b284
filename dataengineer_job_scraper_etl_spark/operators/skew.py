"""Skew-handling primitives.

AQE's skew-join splitting (enabled in session.py) handles most hot
keys at runtime by splitting oversized shuffle partitions. These
explicit formulations cover the cases AQE can't:

- ``salted_join``: a single join key so hot that even a split
  partition is dominated by one key's rows. The left (large, skewed)
  side gets a deterministic salt in [0, n_salt); the right side is
  replicated once per salt value; the join key becomes (key, salt),
  spreading the hot key over n_salt tasks. Right-side cost: n_salt x
  |right| rows — use for small-to-medium right sides only (a tiny
  right side should just be broadcast instead).

- ``two_stage_agg_count``: aggregation where one group dwarfs the
  rest. Stage 1 aggregates on (key, salt) — the hot group's rows
  split across n_salt partial groups — stage 2 merges the partials.
  (For algebraic aggs Spark's map-side partial aggregation usually
  makes this unnecessary; it matters for high-cardinality state per
  group, e.g. collect_set/distinct.)

Both are deterministic: salts come from xxhash64 of row content, not
rand(), so re-runs and task retries produce identical plans/results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side salted and the right side
    replicated across all salt values. Result equals
    ``left.join(right, on, how)`` for left-oriented joins ONLY: with
    'right'/'full', every unmatched right row would be emitted once
    per salt replica (n_salt duplicate null-extended rows), so those
    modes are rejected up front."""
    allowed = {
        "inner", "left", "left_outer", "leftouter",
        "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti",
    }
    if how.lower().replace(" ", "") not in allowed:
        raise ValueError(
            f"salted_join is only correct for left-oriented joins "
            f"(got how={how!r}): the right side is replicated per salt, "
            f"so right/full-outer would duplicate unmatched right rows"
        )
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salt)
    ).alias("__salt")
    left_s = left.select("*", salt)
    spark = right.sparkSession
    salts = spark.range(n_salt).select(F.col("id").cast("int").alias("__salt"))
    right_s = right.crossJoin(salts)
    out = left_s.join(right_s, on + ["__salt"], how)
    return out.drop("__salt")


def two_stage_agg_distinct_count(
    df: DataFrame, key_cols: list[str], value_col: str, n_salt: int = 8
) -> DataFrame:
    """count(DISTINCT value) per key without concentrating any single
    key's distinct-set in one task: stage 1 dedups (key, salt, value)
    with the salt derived from the VALUE (same value -> same salt, so
    cross-salt double counting is impossible); stage 2 sums per-salt
    distinct counts."""
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salt)).alias("__salt")
    stage1 = (
        df.select(*key_cols, value_col, salt)
        .groupBy(*key_cols, "__salt")
        .agg(F.countDistinct(value_col).alias("__partial"))
    )
    return stage1.groupBy(*key_cols).agg(
        F.sum("__partial").alias(f"n_distinct_{value_col}")
    )
