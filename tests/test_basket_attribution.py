"""Planted semantics for the round-11 analytics tail: market-basket
association metrics (queries/basket.py), multi-touch attribution +
its streaming twin (queries/attribution.py), RFM segmentation
(queries/rfm.py), seasonality autocorrelation (queries/seasonality.py),
and hashed-TF topic k-means (queries/topics.py)."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.catalog import all_queries


def test_copurchase_metrics_exact_values(spark, tmp_path):
    """6 orders: parts (1,2) co-occur in 3, part 1 in 5, part 2 in 4,
    part 3 in 2 (below the pair floor with anything). Expected:
    support 3/6, conf(1->2) 3/5, conf(2->1) 3/4, lift 3*6/(5*4)."""
    rows = []
    orders = [
        (100, [1, 2]),
        (101, [1, 2]),
        (102, [1, 2, 3]),
        (103, [1]),
        (104, [1, 3]),
        (105, [2]),
    ]
    ln = 0
    for o, parts in orders:
        for p in parts:
            ln += 1
            rows.append((o, p, 500, ln, 1.0, 10.0, 0.0, 0.0, "N", "O",
                         datetime(2024, 3, 1).date()))
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate date",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    out = all_queries()["lineitem_copurchase_lift"].spark_fn(
        spark, str(tmp_path)
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.part_a, r.part_b, r.co) == (1, 2, 3)
    assert r.support_ppm == round(3 / 6 * 1e6)
    assert r.conf_a_b_ppm == round(3 / 5 * 1e6)
    assert r.conf_b_a_ppm == round(3 / 4 * 1e6)
    assert r.lift_ppm == round(3 * 6 / (5 * 4) * 1e6)


def test_copurchase_prunes_infrequent_parts_before_pairing(spark, sf_dir):
    """Plan shape: the pair self-join keys on the order id only (plus
    the part inequality) — no cross join; every emitted pair clears
    the absolute floor."""
    df = all_queries()["lineitem_copurchase_lift"].spark_fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    rows = df.collect()
    assert all(r.co >= 3 for r in rows)
    # lift is symmetric; confidences are direction-specific
    assert all(r.conf_a_b_ppm >= r.support_ppm for r in rows)


def test_multitouch_attribution_planted_credits(spark, tmp_path):
    """One purchase at 12:00 with views at 11:00, 06:00 and (outside)
    36h earlier: linear = 1/2 each; decay splits by exp(-age/6h)
    quantized to ppm BEFORE normalization."""
    t0 = datetime(2024, 3, 2, 12, 0, 0)
    rows = [
        (1, t0, 7, "purchase", 1.0, "{}"),
        (2, t0 - timedelta(hours=1), 7, "view", 1.0, "{}"),
        (3, t0 - timedelta(hours=6), 7, "view", 1.0, "{}"),
        (4, t0 - timedelta(hours=36), 7, "view", 1.0, "{}"),  # outside
        (5, t0 + timedelta(hours=1), 7, "view", 1.0, "{}"),   # after
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {
        r.view_id: r
        for r in all_queries()["events_multitouch_attribution"]
        .spark_fn(spark, str(tmp_path))
        .collect()
    }
    assert set(out) == {2, 3}
    w2 = round(math.exp(-3600 / 21600.0) * 1e6)
    w3 = round(math.exp(-21600 / 21600.0) * 1e6)
    assert out[2].linear_credit_ppm == 500000
    assert out[3].linear_credit_ppm == 500000
    assert out[2].decay_credit_ppm == round(w2 * 1e6 / (w2 + w3))
    assert out[3].decay_credit_ppm == round(w3 * 1e6 / (w2 + w3))
    # the recent touch gets strictly more decay credit
    assert out[2].decay_credit_ppm > out[3].decay_credit_ppm


def test_multitouch_credits_sum_to_one_per_purchase(spark, sf_dir):
    sums = (
        all_queries()["events_multitouch_attribution"]
        .spark_fn(spark, sf_dir)
        .groupBy("purchase_id")
        .agg(
            F.sum("linear_credit_ppm").alias("lin"),
            F.sum("decay_credit_ppm").alias("dec"),
        )
        .collect()
    )
    assert sums
    for r in sums:
        # ppm rounding leaves at most n_touches/2 ppm of drift
        assert abs(r.lin - 1_000_000) < 500, r
        assert abs(r.dec - 1_000_000) < 500, r


def test_rfm_quartiles_rank_exact_rule(spark, tmp_path):
    """8 users with strictly increasing spend and frequency: the
    rank-exact rule puts exactly 2 users in each quartile (N=8
    divides evenly, edges at cum >= 2/4/6)."""
    from datetime import datetime as dt, timedelta

    rows = []
    eid = 0
    t0 = dt(2024, 3, 1, 12)
    for u in range(8):
        for k in range(u + 1):  # frequency u+1, spend 10*(u+1)
            eid += 1
            rows.append((eid, t0 + timedelta(minutes=k), u, "purchase",
                         10.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {
        r.user_id: r
        for r in all_queries()["events_user_rfm_segments"]
        .spark_fn(spark, str(tmp_path))
        .collect()
    }
    assert len(out) == 8
    # frequency quartiles: users 0-1 -> 1, 2-3 -> 2, 4-5 -> 3, 6-7 -> 4
    assert [out[u].f_q for u in range(8)] == [1, 1, 2, 2, 3, 3, 4, 4]
    assert [out[u].m_q for u in range(8)] == [1, 1, 2, 2, 3, 3, 4, 4]
    assert out[5].frequency == 6
    assert out[5].monetary_ppm == 6 * 10_000_000


def test_streaming_attribution_matches_batch_subset(spark, sf_dir):
    """Differential: the streamed attribution equals the batch entry
    restricted to the arriving (event_id % 10 >= 8) purchase slice."""
    batch = {
        (r.purchase_id, r.view_id, r.decay_credit_ppm)
        for r in all_queries()["events_multitouch_attribution"]
        .spark_fn(spark, sf_dir)
        .collect()
        if r.purchase_id % 10 >= 8
    }
    streamed = {
        (r.purchase_id, r.view_id, r.decay_credit_ppm)
        for r in all_queries()["streaming_multitouch_attribution"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    assert streamed == batch and streamed


def test_autocorrelation_finds_planted_daily_rhythm(spark, tmp_path):
    """10 days of a strict 24h volume rhythm (3 events in 'day' hours,
    1 in 'night' hours): r(24) must be exactly 1e6 ppm (the series
    repeats perfectly at lag 24) and r(1) well below it."""
    from datetime import datetime as dt, timedelta

    rows = []
    eid = 0
    t0 = dt(2024, 3, 1)
    for day in range(10):
        for hour in range(24):
            n = 3 if hour < 12 else 1
            for k in range(n):
                eid += 1
                rows.append(
                    (eid, t0 + timedelta(days=day, hours=hour, minutes=k),
                     1, "view", 1.0, "{}")
                )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {
        r.lag_hours: r.autocorr_ppm
        for r in all_queries()["events_hourly_autocorrelation"]
        .spark_fn(spark, str(tmp_path))
        .collect()
    }
    assert out[24] == 1_000_000        # perfect daily repetition
    assert out[168] == 1_000_000       # and weekly (24 | 168)
    assert out[1] < 900_000            # the hour-to-hour series is not flat


def test_hashtf_topics_cover_all_docs_and_use_multiple_clusters(
    spark, sf_dir
):
    """Every non-empty doc under the bound gets exactly one topic;
    the clustering actually separates (>= 2 occupied clusters on the
    real corpus) and topics are within range."""
    rows = all_queries()["docs_hashtf_kmeans_topics"].spark_fn(
        spark, sf_dir
    ).collect()
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids)) == 300
    topics = {r.topic for r in rows}
    assert topics <= {0, 1, 2, 3}
    assert len(topics) >= 2
