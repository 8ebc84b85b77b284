"""Multi-touch purchase attribution over ``events``
(analytics extension, SURVEY §2.10/§2.20).

The as-of join (events_asof_purchase_view, queries/events.py) is
LAST-touch attribution: all credit to the latest view. Real marketing
attribution splits the credit across EVERY qualifying touch — here,
each of a user's views in the 24 hours before a purchase gets

  linear credit  = 1 / n_touches                 (position-blind)
  decay credit   = w / sum(w), w = exp(-age/tau) (recent touches win)

with tau = 6 h. Determinism device (the graphrank/anomaly rule): each
raw decay weight quantizes to a ppm BIGINT before the per-purchase
normalization, so the denominator is an EXACT integer sum —
summation-order-independent under any partitioning — and the final
credit is one IEEE division of exact integers, identical in both
engines. Ages use microsecond-exact timestamp arithmetic
(timestamp→double, the interval-join lesson: unix_timestamp's
second-floor drifts vs DuckDB's fractional epoch()).

Scale shape: a user-keyed equi-join (purchases × views per user) with
the 24 h range predicate re-checked after the join — the same keyed
interval shape as events_interval_containment_join; at production
fan-outs the identical bucket decomposition drops in (the window here
is purchase-anchored, so the probe side buckets and the purchase side
explodes). One window per purchase group for the normalization sums,
over groups bounded by per-user daily activity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.catalog import register

_LOOKBACK_H = 24
_TAU_S = 6 * 3600.0

_ATTRIBUTION_ORACLE = f"""
WITH ev AS (
  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type
  FROM events),
touch AS (
  SELECT p.event_id AS purchase_id, v.event_id AS view_id,
         CAST(round(exp(-(epoch(p.ts) - epoch(v.ts)) / {_TAU_S})
                    * 1e6) AS BIGINT) AS w_ppm
  FROM ev p JOIN ev v
    ON v.user_id = p.user_id
   AND v.ts < p.ts
   AND v.ts >= p.ts - INTERVAL {_LOOKBACK_H} HOUR
  WHERE p.event_type = 'purchase' AND v.event_type = 'view')
SELECT purchase_id, view_id,
       CAST(round(1e6 / count(*) OVER (PARTITION BY purchase_id))
         AS BIGINT) AS linear_credit_ppm,
       CAST(round(w_ppm * 1e6
                  / sum(w_ppm) OVER (PARTITION BY purchase_id))
         AS BIGINT) AS decay_credit_ppm
FROM touch
"""


@register(
    "events_multitouch_attribution",
    _ATTRIBUTION_ORACLE,
    doc="Multi-touch attribution: every view in the 24h before a "
    "purchase shares the credit — linear (1/n) and exponential "
    "time-decay (tau=6h, recent touches win), the complement of the "
    "as-of join's last-touch rule. Decay weights quantize to ppm "
    "BIGINTs BEFORE the per-purchase normalization (exact integer "
    "denominator, summation-order-independent); user-keyed equi-join "
    "+ range re-check, same shape as the interval-containment join "
    "(whose bucket decomposition drops in at production fan-outs).",
)
def events_multitouch_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type",
    ).localCheckpoint(eager=False)  # both join sides read it
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("vu"),
        F.col("ts").alias("vts"),
    )
    age_s = F.col("pts").cast("double") - F.col("vts").cast("double")
    touch = (
        p.join(v, F.col("vu") == F.col("pu"))
        .filter(
            (F.col("vts") < F.col("pts"))
            & (
                F.col("vts")
                >= F.col("pts") - F.expr(f"INTERVAL {_LOOKBACK_H} HOURS")
            )
        )
        .select(
            "purchase_id",
            "view_id",
            F.round(F.exp(-age_s / _TAU_S) * 1e6, 0)
            .cast("bigint")
            .alias("w_ppm"),
        )
    )
    per_p = Window.partitionBy("purchase_id")
    return touch.select(
        "purchase_id",
        "view_id",
        F.round(1e6 / F.count(F.lit(1)).over(per_p), 0)
        .cast("bigint")
        .alias("linear_credit_ppm"),
        F.round(F.col("w_ppm") * 1e6 / F.sum("w_ppm").over(per_p), 0)
        .cast("bigint")
        .alias("decay_credit_ppm"),
    )
