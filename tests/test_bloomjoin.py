"""Bloom runtime-filter semi-join pruning (operators/bloomjoin.py)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.operators.bloomjoin import (
    _OFFSETS,
    bloom_pass_flag,
    bloom_position,
    bloom_prune,
    build_bloom_bitmap,
)


def _pos_py(key, offset, m_bits):
    h = hashlib.md5(str(key).encode()).hexdigest()
    return int(h[offset - 1 : offset + 3], 16) % m_bits


def test_positions_match_python_md5(spark):
    df = spark.range(0, 200).select(F.col("id").cast("long").alias("k"))
    got = df.select(
        "k", *[bloom_position(F.col("k"), o, 4096).alias(f"p{o}") for o in _OFFSETS]
    ).collect()
    for row in got:
        for o in _OFFSETS:
            assert row[f"p{o}"] == _pos_py(row["k"], o, 4096)


def test_no_false_negatives_and_bounded_false_positives(spark):
    build = spark.range(0, 300).select((F.col("id") * 7).alias("k"))
    fact = spark.range(0, 5000).select(F.col("id").alias("k"))
    bitmap = build_bloom_bitmap(build, "k", 4096)
    passed = {r["k"] for r in bloom_prune(fact, "k", bitmap, 4096).collect()}
    members = {r["k"] for r in build.collect()} & set(range(5000))
    # one-sided error: every true member passes
    assert members <= passed
    # false positives exist but are a small fraction of non-members
    fp = len(passed - members)
    assert fp / (5000 - len(members)) < 0.10


def test_bitmap_is_filter_sized_not_data_sized(spark):
    build = spark.range(0, 10000).select(F.col("id").alias("k"))
    bitmap = build_bloom_bitmap(build, "k", 1024)
    # 1024 bits = 32 longs regardless of 10k build keys
    assert len(bitmap) == 32
    # saturated filter: everything passes (the degenerate-but-safe end)
    fact = spark.range(0, 50).select(F.col("id").alias("k"))
    assert bloom_prune(fact, "k", bitmap, 1024).count() == 50


def test_pruning_predicate_is_jvm_only_no_join(spark):
    build = spark.range(0, 100).select(F.col("id").alias("k"))
    fact = spark.range(0, 1000).select(F.col("id").alias("k"))
    bitmap = build_bloom_bitmap(build, "k", 4096)
    plan = (
        bloom_prune(fact, "k", bitmap, 4096)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in ("Join", "Exchange", "BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan, f"{marker} in bloom-prune plan"


def test_flag_column_counts_false_positives(spark):
    build = spark.range(0, 10).select(F.col("id").alias("k"))
    bitmap = build_bloom_bitmap(build, "k", 64)  # tiny -> many FPs
    fact = spark.range(0, 2000).select(F.col("id").alias("k"))
    n_pass = fact.filter(bloom_pass_flag(F.col("k"), bitmap, 64)).count()
    assert n_pass >= 10  # members always pass; tiny m forces extras
