"""As-of join (point-in-time join): for each left row, attach the most
recent right row with ``right.ts <= left.ts`` within the same key.

Spark has no built-in as-of join (pandas has merge_asof; Flink/kdb
have temporal joins). The scalable formulation here is the classic
union + ordered window:

1. tag both sides and union them (schema-aligned structs),
2. one shuffle on (key), ordered by (ts, side-tag) — right rows sort
   BEFORE left rows at equal ts, so 'as of' is inclusive,
3. ``last(right_payload, ignorenulls=True)`` over rows
   UNBOUNDED PRECEDING..CURRENT carries the latest right payload
   forward onto every left row.

Cost: ONE shuffle of left+right on the key — no range join, no
per-row subquery, no broadcast requirement on either side. A skewed
key degrades to a single-task sort for that key (the profile of any
keyed window); for a known-hot key, pre-partition by (key,
time-bucket) and stitch bucket boundaries.

Why not a join at all? The correlated max-ts subquery (the oracle
formulation in queries/events_asof) materializes O(matching pairs)
before the argmax; the union+window never forms pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the latest right payload
    at-or-before its timestamp (nulls when no prior right row).

    ``right_cols`` — right payload columns to carry (default: all
    except the key and timestamp). ``right_tiebreak`` — column that
    totally orders right rows sharing (key, ts); the LARGEST wins
    (without it, equal-ts right rows carry nondeterministically)."""
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]

    left_struct_t = left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
    right_struct = F.struct(*[F.col(c) for c in right_cols])
    right_struct_t = right.select(right_struct.alias("s")).schema["s"].dataType

    tie = (
        F.col(right_tiebreak)
        if right_tiebreak is not None
        else F.lit(0)
    )
    lhs = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(
            right.select(tie.alias("t")).schema["t"].dataType
        ).alias("__tie"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
        F.lit(None).cast(right_struct_t).alias("__right"),
    )
    rhs = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        tie.alias("__tie"),
        F.lit(None).cast(left_struct_t).alias("__left"),
        right_struct.alias("__right"),
    )

    # right rows at equal (k, ts) order by tiebreak ascending -> the
    # largest is nearest the window end and wins last(); left rows
    # (side=1) sort after every equal-ts right row regardless of tie.
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side", F.asc_nulls_first("__tie"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = lhs.unionByName(rhs).withColumn(
        "__carried", F.last("__right", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("__side") == 1).select(
        *[F.col("__left").getField(c).alias(c) for c in left.columns],
        *[F.col("__carried").getField(c).alias(c + suffix) for c in right_cols],
    )
