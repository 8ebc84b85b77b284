"""Skew primitives: salted formulations must equal their plain
counterparts on skewed data (one key holding most rows).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.operators.skew import (
    salted_join,
    two_stage_agg_distinct_count,
)


def _skewed(spark):
    # key 0 holds 90% of rows; keys 1..10 the rest
    hot = spark.range(900).select(
        F.lit(0).alias("k"), F.col("id").alias("v")
    )
    rest = spark.range(100).select(
        (F.col("id") % 10 + 1).alias("k"), (F.col("id") + 10_000).alias("v")
    )
    return hot.unionByName(rest)


def test_salted_join_equals_plain_join(spark):
    left = _skewed(spark)
    right = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(8)], "k long, label string"
    )
    plain = left.join(right, ["k"]).select("k", "v", "label")
    salted = salted_join(left, right, ["k"]).select("k", "v", "label")
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_left_join_keeps_unmatched(spark):
    left = _skewed(spark)
    right = spark.createDataFrame([(1, "one")], "k long, label string")
    out = salted_join(left, right, ["k"], how="left")
    assert out.count() == left.count()
    assert out.filter(F.col("label").isNull()).count() == left.filter(
        F.col("k") != 1
    ).count()


def test_two_stage_distinct_count(spark):
    df = _skewed(spark)
    # add duplicate values inside the hot key to make DISTINCT matter
    df = df.unionByName(df.filter(F.col("k") == 0))
    plain = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    salted = {
        r["k"]: r["n_distinct_v"]
        for r in two_stage_agg_distinct_count(df, ["k"], "v").collect()
    }
    assert plain == salted


def test_salted_join_rejects_right_oriented_modes(spark):
    import pytest

    left = _skewed(spark)
    right = spark.createDataFrame([(1, "one")], "k long, label string")
    for how in ("right", "full", "full_outer", "cross"):
        with pytest.raises(ValueError, match="left-oriented"):
            salted_join(left, right, ["k"], how=how)
