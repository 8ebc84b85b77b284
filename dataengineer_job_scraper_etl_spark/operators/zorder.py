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


def zorder_bits_for_domain(df: DataFrame, cols: list[str]) -> int:
    """Derive the per-dimension bit width from the ACTUAL key domain:
    enough bits to hold max(col) for every interleaved column, capped
    so the Morton key fits a signed 64-bit long. Fixed ``bits=16`` wraps
    keys above 65535 under the mask — distant key ranges then alias into
    the same Z-bucket and the per-bucket min/max spans silently widen
    (the data-skipping property degrades even though the arithmetic
    stays total). One tiny all-columns min/max aggregate — a scan-time
    cost paid once per layout write, nothing at query time.

    NON-NEGATIVE domains only: ``zorder_key`` masks the raw
    two's-complement long, so a negative value wraps to a LARGE
    masked value and aliases with small positives no matter how wide
    the mask (-3 and 1 collide at 2 bits) — a width can't fix that.
    Raises ValueError on a negative minimum; bias such columns to
    >= 0 first (e.g. ``col - min``) and note the bias is part of the
    layout key, so query-time predicates must apply the same shift."""
    row = df.agg(
        *[
            c
            for col in cols
            for c in (
                F.min(F.col(col).cast("long")).alias(f"__min_{col}"),
                F.max(F.col(col).cast("long")).alias(f"__max_{col}"),
            )
        ]
    ).first()
    negative = [c for c in cols if int(row[f"__min_{c}"] or 0) < 0]
    if negative:
        raise ValueError(
            f"zorder_bits_for_domain: negative key domain in {negative}; "
            "the Morton mask wraps negatives into aliasing positives — "
            "bias these columns to >= 0 before layout"
        )
    widest = max((int(row[f"__max_{c}"] or 0)).bit_length() for c in cols)
    return max(1, min(widest, 62 // len(cols)))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int | None = None,
    files: int = 32,
) -> None:
    """Materialize ``df`` range-partitioned and sorted by the Morton key
    of ``cols``: each output file covers a compact Z-curve range, so
    parquet zone maps prune on every interleaved dimension.

    ``bits=None`` (default) derives the width from the key domain via
    ``zorder_bits_for_domain`` — a fixed width silently aliases keys
    beyond 2^bits (see that helper's doc). Pass an explicit width only
    when the domain is known and stable."""
    if bits is None:
        bits = zorder_bits_for_domain(df, list(cols))
    keyed = df.withColumn("__z", zorder_key(list(cols), bits))
    (
        keyed.repartitionByRange(files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
