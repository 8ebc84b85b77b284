"""Oracle-checked entries for the skew toolkit (operators/skew.py).

Salting is an internal rewrite — the result is salt-invariant by
construction — so plain SQL oracles the salted plans directly. These
entries promote the toolkit from pytest-only evidence to driver-hashed
correctness: if the salting ever double-counted or dropped rows, the
checksums below would flip.

Reference parity: the reference engine has no skew handling (its
single-node engine never shuffles); these cover the 100 TB posture the
Spark build adds (SURVEY §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.catalog import register
from dataengineer_job_scraper_etl_spark.operators.skew import (
    salted_join,
    two_stage_agg_distinct_count,
)
from dataengineer_job_scraper_etl_spark.queries.events import _events


@register(
    "skew_salted_join_type_stats",
    """
WITH r AS (SELECT event_type, CAST(CAST(sum(CAST(value AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE) / count(value) AS type_avg
           FROM events GROUP BY event_type)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(e.event_id) AS BIGINT) AS id_checksum,
       r.type_avg
FROM events e JOIN r USING (event_type)
GROUP BY e.event_type, r.type_avg
""",
    doc="events joined to a per-type dimension THROUGH salted_join "
    "(hot join key spread over 8 salt buckets, right side replicated "
    "per salt). The id_checksum pins the exact joined row multiset: "
    "any salt-induced duplication or loss flips it. Oracle is the "
    "plain unsalted join — salt invariance is the contract.",
)
def skew_salted_join_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    right = e.groupBy("event_type").agg(
        (
            F.sum(F.col("value").cast("decimal(30,6)")).cast("double")
            / F.count("value")
        ).alias("type_avg")
    )
    joined = salted_join(
        e.select("event_id", "event_type"), right, ["event_type"], n_salt=8
    )
    return joined.groupBy("event_type", "type_avg").agg(
        F.count("*").alias("n_rows"),
        F.sum("event_id").alias("id_checksum"),
    ).select("event_type", "n_rows", "id_checksum", "type_avg")


@register(
    "skew_two_stage_distinct_users",
    """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct_user_id
FROM events GROUP BY event_type
""",
    doc="count(DISTINCT user_id) per event_type via the two-stage "
    "salted rewrite (stage 1 dedups on (key, value-derived salt), "
    "stage 2 sums partials) — no single task ever holds a hot key's "
    "whole distinct set. Oracle is the direct COUNT(DISTINCT).",
)
def skew_two_stage_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return two_stage_agg_distinct_count(
        e, ["event_type"], "user_id", n_salt=8
    )
