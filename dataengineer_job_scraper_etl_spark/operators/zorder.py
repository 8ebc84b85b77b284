"""Z-order (Morton) keys for multi-dimensional data-skipping layouts.

At 100 TB, a table sorted by ONE key only prunes scans filtered on that
key. Interleaving the bits of several keys into a single Morton key and
range-partitioning + sorting by it gives every participating dimension
locality: parquet row-group min/max zone maps then prune selective
predicates on ANY of the interleaved columns (the technique behind
Delta/Iceberg ``OPTIMIZE ZORDER BY``). The key is a pure JVM-side
integer expression — no shuffle beyond the final range partitioning,
no UDF.

Everything here is exact integer arithmetic (shift/and/or), so the
layout query is fully oracle-checkable in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of each column.

    Bit ``b`` of column ``j`` (of ``k`` columns) lands at output
    position ``b * k + j`` — the standard Z-curve layout. Columns are
    masked to ``bits`` bits first, so out-of-range values wrap rather
    than poison the high bits (callers bucketing real keys should mask
    or hash into range themselves; wrapping keeps the expression total).
    """
    k = len(cols)
    if k == 0:
        raise ValueError("zorder_key needs at least one column")
    if bits * k > 62:
        raise ValueError("interleaved width must fit a signed 64-bit long")
    out = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        col = F.col(c) if isinstance(c, str) else c
        masked = col.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
        for b in range(bits):
            bit = F.shiftright(masked, b).bitwiseAND(F.lit(1))
            out = out + F.shiftleft(bit, b * k + j)
    return out


def zorder_key_sql(cols: list[str], bits: int = 16) -> str:
    """The identical Morton key as an ANSI-SQL expression (DuckDB /
    Spark SQL compatible) — used by the oracle so both engines compute
    the same key from the same arithmetic."""
    k = len(cols)
    terms = []
    for j, c in enumerate(cols):
        masked = f"(CAST({c} AS BIGINT) & {(1 << bits) - 1})"
        for b in range(bits):
            terms.append(f"((({masked} >> {b}) & 1) << {b * k + j})")
    return " + ".join(terms)


def write_zordered(
    df: DataFrame, path: str, cols: list[str], bits: int = 16, files: int = 32
) -> None:
    """Materialize ``df`` range-partitioned and sorted by the Morton key
    of ``cols``: each output file covers a compact Z-curve range, so
    parquet zone maps prune on every interleaved dimension."""
    keyed = df.withColumn("__z", zorder_key(list(cols), bits))
    (
        keyed.repartitionByRange(files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
