"""Topic-balanced sampling (queries/topicsample.py): per-topic quota
semantics, the two-phase window rewrite's exactness, and composition
with the hashed-TF k-means stratum source."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.catalog import all_queries
from dataengineer_job_scraper_etl_spark.queries.topicsample import (
    _QUOTA,
    topic_balanced_quota,
)


def _naive_quota(assigned, quota):
    """The single-window reference rendering (the oracle's shape)."""
    rank_key = F.substring(F.md5(F.col("doc_id").cast("string")), 17, 4)
    w = Window.partitionBy("topic").orderBy(rank_key, "doc_id")
    return (
        assigned.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= quota)
        .select(
            "doc_id",
            F.col("topic").cast("bigint").alias("topic"),
            F.col("sample_rank").cast("bigint").alias("sample_rank"),
        )
    )


def test_per_topic_counts_hit_quota_or_stratum_size(spark, sf_dir):
    from dataengineer_job_scraper_etl_spark.queries.topics import (
        docs_hashtf_kmeans_topics,
    )

    strata = {
        r.topic: r.n
        for r in docs_hashtf_kmeans_topics(spark, sf_dir)
        .groupBy("topic")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {
        r.topic: r.n
        for r in all_queries()["docs_topic_balanced_sample"]
        .spark_fn(spark, sf_dir)
        .groupBy("topic")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == {t: min(_QUOTA, n) for t, n in strata.items()}


def test_sample_rank_is_dense_from_one(spark, sf_dir):
    out = (
        all_queries()["docs_topic_balanced_sample"]
        .spark_fn(spark, sf_dir)
        .groupBy("topic")
        .agg(
            F.min("sample_rank").alias("lo"),
            F.max("sample_rank").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    for r in out:
        assert (r.lo, r.hi) == (1, r.n)
        assert r.hi <= _QUOTA


def test_two_phase_equals_single_window_under_skew(spark):
    """Phase-1 losslessness on a SKEWED planted stratum set: one
    500-doc topic (each salt bucket well above the quota, so phase 1
    discards aggressively), one 5-doc topic (below quota — nothing may
    drop), and salt collisions guaranteed (500 docs over 8 buckets).
    The two-phase result must equal the naive single-window rendering
    row for row."""
    assigned = spark.createDataFrame(
        [(i, 0) for i in range(500)] + [(1000 + i, 1) for i in range(5)],
        "doc_id long, topic long",
    )
    got = sorted(
        (r.doc_id, r.topic, r.sample_rank)
        for r in topic_balanced_quota(assigned).collect()
    )
    want = sorted(
        (r.doc_id, r.topic, r.sample_rank)
        for r in _naive_quota(assigned, _QUOTA).collect()
    )
    assert got == want
    counts = {t: sum(1 for g in got if g[1] == t) for t in (0, 1)}
    assert counts == {0: _QUOTA, 1: 5}


def test_no_stratum_sized_window_frame(spark, sf_dir):
    """The plan must show BOTH windows partition-keyed (topic+salt,
    then topic over the quota-bounded survivors) — no empty
    partitionBy anywhere in the chain."""
    df = all_queries()["docs_topic_balanced_sample"].spark_fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
        assert m.group(1).strip(), "unpartitioned window in the plan"
