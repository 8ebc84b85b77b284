"""Interval-containment join via bucket decomposition
(queries/intervaljoin.py): planted semantics + the plan contract
(equi-join, never a nested-loop range join)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.catalog import all_queries


@pytest.fixture(scope="module")
def iv_dir(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("ivjoin")
    t0 = datetime(2024, 3, 1, 0, 0, 0)

    def r(eid, uid, minutes, etype):
        return (eid, t0 + timedelta(minutes=minutes), uid, etype, 1.0, "{}")

    rows = [
        # user 1: first event 00:00 (defines the 6h window)
        r(1, 1, 0, "view"),
        r(2, 1, 30, "purchase"),      # inside, same hour-bucket
        r(3, 1, 359, "purchase"),     # inside, LAST bucket (cross-bucket)
        r(4, 1, 361, "purchase"),     # outside (> 6h)
        # user 2: first event IS a purchase -> excluded by strict >
        r(5, 2, 0, "purchase"),
        r(6, 2, 100, "purchase"),     # inside
        # user 2, next day: fresh window
        r(7, 2, 24 * 60, "view"),
        r(8, 2, 24 * 60 + 90, "purchase"),  # inside day-2 window
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{base}/events.parquet")
    return str(base)


def test_interval_join_planted_semantics(spark, iv_dir):
    out = (
        all_queries()["events_interval_containment_join"]
        .spark_fn(spark, iv_dir)
        .collect()
    )
    ids = sorted(r.event_id for r in out)
    # 2: inside first bucket; 3: inside but in a LATER bucket than the
    # window start (the decomposition must catch it); 6, 8: inside
    # their windows. 4 is past the window; 5 sits ON w_start (strict).
    assert ids == [2, 3, 6, 8]


def test_interval_join_plan_is_equi_join(spark, iv_dir):
    df = all_queries()["events_interval_containment_join"].spark_fn(
        spark, iv_dir
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the join is keyed on (user_id, bucket) — an equi-join
    join_lines = [
        ln for ln in plan.splitlines()
        if "HashJoin" in ln or "SortMergeJoin" in ln
    ]
    assert join_lines and any("bucket" in ln for ln in join_lines), plan


def test_streaming_interval_join_matches_batch_subset(spark, sf_dir):
    """Differential: the streamed attribution equals the batch join
    restricted to the arriving (event_id %10 >= 8) purchase slice."""
    batch = {
        (r.event_id, r.w_start)
        for r in all_queries()["events_interval_containment_join"]
        .spark_fn(spark, sf_dir)
        .collect()
        if r.event_id % 10 >= 8
    }
    streamed = {
        (r.event_id, r.w_start)
        for r in all_queries()["streaming_interval_containment_join"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    assert streamed == batch and streamed
