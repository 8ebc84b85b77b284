"""Interval-containment join via bucket decomposition over ``events``
(analytics extension, SURVEY §2.10/§2.19).

The missing named join: match point events to CONTAINING time
intervals (session attribution, maintenance windows, promo windows).
Spark has no native interval join. Two failure shapes, one fix:
UNKEYED interval sets (global windows) leave
``a.join(b, (b.ts > a.start) & (b.ts < a.end))`` with no equi-key at
all, so Catalyst plans BroadcastNestedLoopJoin — a scale-killer once
the interval side outgrows broadcast; KEYED sets (this instance:
per-user windows) do equi-join on the key, but every probe meets
EVERY interval of its key before the range filter — measured at
sf0.1: 538,966 candidate pairs for a 4,487-row result (one window
per user-day x 30 days = ~120x fan-out). The fix for both is BUCKET
DECOMPOSITION: explode each interval into the fixed-width time
buckets it covers (bounded fan-out = ceil(len/width)+1 rows), map
each probe to its single bucket, equi-join on (key, bucket), then
re-check the exact range predicate. The time dimension joins the
equi-key, so only temporally-plausible pairs materialize — measured:
13,013 candidates, a 41x reduction, same result set — and for
unkeyed sets the bucket IS the equi-key that prevents the nested
loop. A probe matches each interval at most once (its one bucket
appears once per interval), so no dedup pass is needed.

Fixture instance: per (user, day), the "opening window" is the 6
hours after the user's first event of the day; probes are that
user's purchase events strictly inside the window (the defining
first event is excluded by the strict lower bound). Bucket width
1 hour -> each interval explodes to <= 7 rows. Timestamp handling
follows the catalog convention (events.py:_events): the fixture's
NTZ timestamps are cast once, offset-free under the UTC session
session.py pins — the same documented dependency every
date_trunc-bearing events entry carries. The bucket arithmetic
itself is TZ-robust to any FIXED offset (intervals and probes shift
together), and the exact range re-check compares raw timestamps. The ORACLE is the
direct range join in DuckDB — the engines must agree on the result
SET, while the bucketing stays a Spark-side physical strategy (plan
test pins: no BNLJ, no CartesianProduct; the join is an equi-join
on the bucket key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.catalog import register

WINDOW_MINUTES = 360  # the 6-hour opening window
BUCKET_SECONDS = 3600  # 1-hour buckets: <= 7 buckets per interval

_INTERVAL_ORACLE = f"""
WITH ev AS (
  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type
  FROM events),
win AS (
  SELECT user_id, min(ts) AS w_start,
         min(ts) + INTERVAL {WINDOW_MINUTES} MINUTE AS w_end
  FROM ev GROUP BY user_id, date_trunc('day', ts))
SELECT p.event_id, p.user_id, p.ts, w.w_start
FROM ev p JOIN win w
  ON w.user_id = p.user_id
 AND p.ts > w.w_start AND p.ts < w.w_end
WHERE p.event_type = 'purchase'
"""


@register(
    "events_interval_containment_join",
    _INTERVAL_ORACLE,
    doc="Interval-containment join (point events -> containing time "
    "window) via bucket decomposition: intervals (per-user-day 6-hour "
    "opening windows) explode into <= 7 one-hour buckets, purchases "
    "map to their single bucket, and the range predicate re-checks "
    "after a hash equi-join on (user_id, bucket). Adding the time "
    "dimension to the join key cuts the candidate fan-out 41x at "
    "sf0.1 (538,966 -> 13,013 pairs for the same 4,487-row result), "
    "and for UNKEYED interval sets the bucket is the equi-key that "
    "prevents the BroadcastNestedLoopJoin outright. The oracle is "
    "the DIRECT range join (DuckDB), so the bucketing is pinned as "
    "pure physical strategy: same set, different plan; a probe "
    "matches each interval at most once (one bucket per probe), so "
    "no dedup pass exists to hide double-matches.",
)
def events_interval_containment_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type",
    )
    win = (
        ev.groupBy("user_id", F.date_trunc("day", "ts").alias("__day"))
        .agg(F.min("ts").alias("w_start"))
        .select(
            "user_id",
            "w_start",
            (F.col("w_start") + F.expr(f"INTERVAL {WINDOW_MINUTES} MINUTES"))
            .alias("w_end"),
        )
    )
    # bucket decomposition: every bucket the interval touches
    start_b = F.floor(F.unix_timestamp("w_start") / BUCKET_SECONDS)
    end_b = F.floor(F.unix_timestamp("w_end") / BUCKET_SECONDS)
    wexp = win.select(
        "user_id",
        "w_start",
        "w_end",
        F.explode(F.sequence(start_b, end_b)).alias("bucket"),
    )
    probe = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.floor(F.unix_timestamp("ts") / BUCKET_SECONDS).alias("bucket"),
    )
    return (
        probe.join(wexp, ["user_id", "bucket"])
        .filter((F.col("ts") > F.col("w_start")) & (F.col("ts") < F.col("w_end")))
        .select("event_id", "user_id", "ts", "w_start")
    )


# --- streaming twin: stream-static bucket equi-join -------------------

_STREAM_PROBE_MOD, _STREAM_PROBE_GE = 10, 8  # arriving purchases

_INTERVAL_STREAM_ORACLE = f"""
WITH ev AS (
  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type
  FROM events),
win AS (
  SELECT user_id, min(ts) AS w_start,
         min(ts) + INTERVAL {WINDOW_MINUTES} MINUTE AS w_end
  FROM ev GROUP BY user_id, date_trunc('day', ts))
SELECT p.event_id, p.user_id, p.ts, w.w_start
FROM ev p JOIN win w
  ON w.user_id = p.user_id
 AND p.ts > w.w_start AND p.ts < w.w_end
WHERE p.event_type = 'purchase'
  AND p.event_id % {_STREAM_PROBE_MOD} >= {_STREAM_PROBE_GE}
"""


def _stage_interval_stream_dir(spark: SparkSession, sf_dir: str) -> str:
    """A 2-file queue of ARRIVING purchase events (event_id % 10 >= 8,
    split even/odd). Shared staging protocol (staging.py)."""
    import os

    from dataengineer_job_scraper_etl_spark.staging import (
        stage_once,
        write_ordered_batches,
    )

    src = os.path.join(sf_dir, "events.parquet")

    def build(staged: str) -> None:
        d = (
            spark.read.parquet(src)
            .filter(
                (F.col("event_type") == "purchase")
                & (F.col("event_id") % _STREAM_PROBE_MOD >= _STREAM_PROBE_GE)
            )
            .select("event_id", "ts", "user_id", "event_type", "value", "props")
        )
        write_ordered_batches(
            staged,
            [d.filter(F.col("event_id") % 2 == 0),
             d.filter(F.col("event_id") % 2 == 1)],
        )

    return stage_once(src, "ivstream", build)


@register(
    "streaming_interval_containment_join",
    _INTERVAL_STREAM_ORACLE,
    doc="The interval-containment join ALWAYS-ON: arriving purchases "
    "are attributed to their containing opening window per "
    "micro-batch via the SAME bucket decomposition — probe maps to "
    "its one bucket inside the streamed plan, stream-static hash "
    "equi-join against the frozen exploded-window table (broadcast "
    "here; bucket-bucketed at scale), exact range re-check, STATELESS "
    "append into the memory sink. The frozen window table is the "
    "production shape (attribution windows are built by the batch "
    "layer and served to the stream); the oracle is the direct range "
    "join restricted to the arriving slice.",
)
def streaming_interval_containment_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("ts").cast("timestamp").alias("ts"), "user_id"
    )
    win = (
        ev.groupBy("user_id", F.date_trunc("day", "ts").alias("__day"))
        .agg(F.min("ts").alias("w_start"))
        .select(
            "user_id",
            "w_start",
            (F.col("w_start") + F.expr(f"INTERVAL {WINDOW_MINUTES} MINUTES"))
            .alias("w_end"),
        )
    )
    start_b = F.floor(F.unix_timestamp("w_start") / BUCKET_SECONDS)
    end_b = F.floor(F.unix_timestamp("w_end") / BUCKET_SECONDS)
    wexp = win.select(
        "user_id",
        "w_start",
        "w_end",
        F.explode(F.sequence(start_b, end_b)).alias("bucket"),
    ).localCheckpoint(eager=False)

    from dataengineer_job_scraper_etl_spark.queries.streaming_queries import (
        _drain,
    )

    d = _stage_interval_stream_dir(spark, sf_dir)
    stream = (
        spark.readStream.schema(
            "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
            " value DOUBLE, props STRING"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    probe = stream.select(
        "event_id",
        "user_id",
        "ts",
        F.floor(F.unix_timestamp("ts") / BUCKET_SECONDS).alias("bucket"),
    )
    joined = (
        probe.join(F.broadcast(wexp), ["user_id", "bucket"])
        .filter(
            (F.col("ts") > F.col("w_start")) & (F.col("ts") < F.col("w_end"))
        )
        .select("event_id", "user_id", "ts", "w_start")
    )
    return _drain(joined, spark, output_mode="append")
