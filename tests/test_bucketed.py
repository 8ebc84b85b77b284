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
