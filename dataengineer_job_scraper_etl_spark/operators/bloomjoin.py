"""Bloom-filter semi-join pruning — the runtime-filter pattern that
makes selective star joins feasible at 100 TB: build a tiny Bloom
filter from the (filtered) dim side's join keys, broadcast it, and
drop non-matching fact rows AT THE SCAN, before they ever reach the
shuffle. Spark's own engine injects these automatically in some shapes
(`spark.sql.optimizer.runtime.bloomFilter.enabled`), but the injected
filter uses engine-private hashing; this operator is the explicit,
engine-portable version — every hash is an md5 window, so DuckDB can
replay the exact same filter and the whole construction is
oracle-checkable (same reason the sampling family uses md5: see
queries/sampling.py).

Semantics: the classic one-sided-error contract. A fact row whose key
IS in the build set always passes (no false negatives — the final
exact join loses nothing); a row whose key is NOT in the build set
passes with probability ~(1 - e^{-kn/m})^k (false positives cost only
wasted post-filter work, never wrong answers).

Scale shape:
- The build side is aggregated to DISTINCT BIT POSITIONS, and only
  those are collected — bounded by min(k * |build keys|, m_bits) rows,
  i.e. by the FILTER's size, never the data's. This is exactly the
  merge-to-driver step of Spark's native runtime bloom (and of every
  distributed bloom build); m_bits is chosen by the caller to fit the
  false-positive budget. Each hash draws 16 bits, so m_bits is capped
  at 65536 and must be a power of two (enforced in
  build_bloom_bitmap) — a non-divisor of 2^16 would bias low
  positions and a larger m would silently use only 65536 of its
  bits; beyond 2^16 bits, widen the hash windows (md5 has 32 hex
  digits; 8-digit windows give 32 bits) rather than the modulus.
- The filter ships to executors as an array-of-longs literal (32 bits
  used per long, so m_bits/32 entries — 128 longs at 4096 bits) in the
  row predicate — broadcast-by-constant-folding, no join, no shuffle. The
  membership test is integer bit arithmetic inside whole-stage
  codegen; at the parquet scan it behaves like any other residual
  filter (the md5 itself blocks pushdown INTO the reader, but the
  fact rows die in the first map stage, before any exchange — which
  is where the 100 TB win lives).

Reference parity: the reference engine has no runtime filters (its
joins are single-process pandas merges — etl/transform.py); this is
part of the added large-scale join toolkit, alongside operators/
skew.py's salting and the AQE skew tests.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Three independent 16-bit hashes from disjoint md5 hex windows (the
# digest has 32 hex digits; windows at 1, 9, 17 never overlap).
_OFFSETS = (1, 9, 17)
K_HASHES = len(_OFFSETS)


def bloom_position(key: Column, offset: int, m_bits: int) -> Column:
    """Bit position for one hash: a 4-hex-digit (16-bit) window of
    md5(key) reduced mod m_bits. Engine-portable: DuckDB computes the
    identical value with nibble-position arithmetic (bloom_pos_sql)."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), offset, 4), 16, 10)
        .cast("long")
        % m_bits
    )


def bloom_pos_sql(key: str, offset: int, m_bits: int) -> str:
    """DuckDB twin of bloom_position (DuckDB has no conv())."""
    terms = " + ".join(
        f"(position(substring(md5(CAST({key} AS VARCHAR)), {offset + i}, 1) "
        f"in '0123456789abcdef') - 1) * {16 ** (3 - i)}"
        for i in range(4)
    )
    return f"(({terms}) % {m_bits})"


def build_bloom_bitmap(
    build: DataFrame, key_col: str, m_bits: int = 4096
) -> list[int]:
    """Build the filter as a list of m_bits/32 longs (32 bits used per
    long: the sign bit never participates, so the executor-side test
    needs no unsigned gymnastics). ONE aggregate jobs the build side
    down to distinct positions; the collect is bounded by
    min(K_HASHES * |build|, m_bits) ints — filter-sized, not
    data-sized."""
    # 16-bit hash windows: m_bits beyond 2^16 would silently never
    # set high bits; non-powers-of-two would bias low positions.
    assert m_bits % 32 == 0 and m_bits <= 65536
    assert m_bits & (m_bits - 1) == 0, "m_bits must be a power of two"
    key = F.col(key_col)
    positions = (
        build.select(
            F.explode(
                F.array(
                    *[bloom_position(key, off, m_bits) for off in _OFFSETS]
                )
            ).alias("pos")
        )
        .distinct()
        .collect()
    )
    words = [0] * (m_bits // 32)
    for row in positions:
        p = int(row["pos"])
        words[p // 32] |= 1 << (p % 32)
    return words


def bloom_prune(
    fact: DataFrame, key_col: str, bitmap: list[int], m_bits: int
) -> DataFrame:
    """Keep fact rows whose key passes all K_HASHES bit tests against
    the broadcast bitmap. Pure JVM bit arithmetic in one codegen'd
    predicate; adds no columns."""
    return fact.filter(bloom_pass_flag(F.col(key_col), bitmap, m_bits))


def bloom_pass_flag(key: Column, bitmap: list[int], m_bits: int) -> Column:
    """Boolean membership-test column (exposed separately so callers
    can COUNT false positives instead of dropping rows)."""

    def bit_test(off: int) -> Column:
        pos = bloom_position(key, off, m_bits)
        word = F.element_at(
            F.lit(bitmap), (pos / 32).cast("int") + 1
        )
        # pyspark's shiftleft() takes only a literal shift amount, so
        # the mask is pow(2, bit): exact in a double through bit 52,
        # and only bits 0..31 occur here.
        mask = F.pow(F.lit(2.0), pos % 32).cast("long")
        return word.bitwiseAND(mask) != 0

    return reduce(lambda a, b: a & b, [bit_test(off) for off in _OFFSETS])
