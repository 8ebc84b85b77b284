"""First-order Markov transition model over the ``events`` clickstream
(analytics extension, SURVEY §2.10/§2.20).

The classic user-journey summary: P(next event type | current event
type), estimated from every consecutive pair in each user's ordered
stream. Feeds funnel diagnostics ("what follows a view?"), anomaly
scoring (improbable transitions), and session simulation — the same
per-user lag machinery as events_sessionization (queries/events.py),
re-aggregated globally. (Reference parity note: the reference repo,
lalelisealstad/dataengineer-job-scraper-etl, has no clickstream stage;
this extends the events battery like the interval-join family.)

Scale shape (the 100 TB story): ONE shuffle — the per-user window
(partitionBy user_id, the natural key: billions of short independent
sequences parallelize perfectly, no global ordering exists) — then a
groupBy on (prev_type, next_type), whose key space is |event types|²
(single digits squared here; at worst vocabulary-sized), so the agg is
map-side-combined down to almost nothing before the exchange. The
normalizing per-prev totals come from a SECOND window over the COUNTS
table (type-squared rows, not event rows) — never a rescan of the
stream. Ordering ties break on event_id (the catalog-wide convention,
events.py), so the transition stream is deterministic under any
partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.catalog import register

_MARKOV_ORACLE = """
WITH ev AS (
  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type
  FROM events),
tr AS (
  SELECT lag(event_type) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
         event_type AS next_type
  FROM ev)
SELECT prev_type, next_type,
       CAST(count(*) AS BIGINT) AS n,
       round(count(*) * 1.0
             / sum(count(*)) OVER (PARTITION BY prev_type), 6) AS p
FROM tr WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
"""


@register(
    "events_type_markov_transitions",
    _MARKOV_ORACLE,
    doc="First-order Markov transition matrix over the clickstream: "
    "per-user lag(event_type) ordered by (ts, event_id), global "
    "(prev, next) counts, and row-normalized probabilities. One "
    "event-scale shuffle (the per-user window); the count table is "
    "|types|^2 rows, so normalization is a window over a frame that "
    "fits in one partition at any corpus size.",
)
def events_type_markov_transitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = ev.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    counts = trans.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    per_prev = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(per_prev), 6).alias("p"),
    )
