"""Bucketed tables: a join between two tables bucketed on the join key
must plan WITHOUT a shuffle on either side (the pay-once-at-ingest
co-location contract of write_bucketed_table).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.io import write_bucketed_table


def test_bucketed_join_has_no_exchange(spark):
    # NB managed tables land in the session's warehouse dir (static
    # conf); both are dropped in the finally block.
    orders = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("amount")
    )
    customers = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("c"), F.col("id")).alias("name")
    )
    write_bucketed_table(orders, "b_orders", ("k",), 8, sort_cols=("k",))
    write_bucketed_table(customers, "b_customers", ("k",), 8, sort_cols=("k",))

    joined = (
        spark.table("b_orders")
        .join(spark.table("b_customers"), "k")
        .filter(F.col("amount") > 0)
    )
    # disable broadcast so the join strategy actually tests co-location
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # SortMergeJoin without any Exchange: bucket layout replaces the
        # shuffle on BOTH sides
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        # orders k in 0..999, customers k in 0..99 -> 100 matches,
        # minus k=0 whose amount (0) fails the >0 filter
        assert joined.count() == 99
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customers")


def test_band_index_candidate_generation_has_no_exchange(spark, sf_dir):
    """The 100 TB incremental-dedup layout end-to-end: persist the
    MinHash banded sketch bucketed on (band_id, band_hash) once, then
    (a) candidate generation over the bucketed index plans with ZERO
    exchange below the join, and (b) its pairs equal the one-shot
    minhash_lsh_pairs over the same corpus/params."""
    from dataengineer_job_scraper_etl_spark.operators.dedup import (
        lsh_pairs_from_band_index,
        minhash_lsh_pairs,
        write_band_index,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(300)
    )
    write_band_index(docs, "doc_id", "text", "b_band_index", n_buckets=8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pairs = lsh_pairs_from_band_index(spark, "b_band_index")
        # plan-assert the candidate JOIN itself (pre pair-dedup: the
        # dropDuplicates on sparse matched pairs is the one intended
        # shuffle and would otherwise mask the join's exchanges)
        from dataengineer_job_scraper_etl_spark.operators.dedup import (
            pairs_from_banded,
        )

        banded = spark.table("b_band_index")
        join_only = banded.alias("a").join(
            banded.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        plan = join_only._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        # one-shot formulation (shuffles the sketch) must agree exactly
        got = {
            (r["id_a"], r["id_b"], r["est_jaccard"])
            for r in pairs.collect()
        }
        want = {
            (r["id_a"], r["id_b"], r["est_jaccard"])
            for r in minhash_lsh_pairs(docs, "doc_id", "text").collect()
        }
        assert got == want and len(want) > 0
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS b_band_index")
