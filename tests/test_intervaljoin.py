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


# --- multi-scale (tiered) variant: mixed-duration intervals ------------


@pytest.fixture(scope="module")
def ms_dir(spark, tmp_path_factory):
    """Mixed-duration planted fixture: window length depends on
    user_id % 3 — 15 min (user 3), 6 h (user 1), 2 days (user 2) —
    a 192x spread, >= 2 orders of magnitude."""
    base = tmp_path_factory.mktemp("ivmulti")
    t0 = datetime(2024, 3, 1, 0, 0, 0)

    def r(eid, uid, minutes, etype):
        return (eid, t0 + timedelta(minutes=minutes), uid, etype, 1.0, "{}")

    rows = [
        # user 3 (uid % 3 == 0): 15-MINUTE window from 00:00
        r(1, 3, 0, "view"),
        r(2, 3, 10, "purchase"),        # inside the 15-min window
        r(3, 3, 20, "purchase"),        # outside (> 15 min)
        # user 1 (uid % 3 == 1): 6-HOUR window
        r(4, 1, 0, "view"),
        r(5, 1, 359, "purchase"),       # inside, near the end
        r(6, 1, 361, "purchase"),       # outside
        # user 2 (uid % 3 == 2): 2-DAY window — crosses into day 2,
        # where a FRESH day-2 window also opens (defined by event 8),
        # so event 9 is inside BOTH (two attribution rows)
        r(7, 2, 0, "view"),
        r(8, 2, 24 * 60, "view"),       # opens the day-2 window
        r(9, 2, 24 * 60 + 90, "purchase"),   # inside day-1 AND day-2 windows
        r(10, 2, 2 * 24 * 60 + 30, "purchase"),  # inside day-2 window only
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{base}/events.parquet")
    return str(base)


def test_multiscale_planted_semantics(spark, ms_dir):
    out = (
        all_queries()["events_interval_join_multiscale"]
        .spark_fn(spark, ms_dir)
        .collect()
    )
    pairs = sorted((r.event_id, r.w_start.isoformat()) for r in out)
    assert pairs == [
        (2, "2024-03-01T00:00:00"),   # 15-min window catches only eid 2
        (5, "2024-03-01T00:00:00"),   # 6-h window, near its end
        (9, "2024-03-01T00:00:00"),   # 2-day window spans into day 2...
        (9, "2024-03-02T00:00:00"),   # ...where the fresh window ALSO matches
        (10, "2024-03-02T00:00:00"),  # day-2 window only
    ]


def test_multiscale_tier_explode_is_bounded(spark, ms_dir):
    """Every interval explodes to <= _TIER_FANOUT + 1 buckets in its
    ONE tier — the bound a single fixed width cannot give mixed
    durations (2 days over 1-hour buckets would be 49 rows)."""
    from dataengineer_job_scraper_etl_spark.queries.intervaljoin import (
        _TIER_FANOUT,
        _tiered_windows,
    )

    ev = spark.read.parquet(f"{ms_dir}/events.parquet").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type",
    )
    per_interval = (
        _tiered_windows(ev)
        .groupBy("user_id", "w_start")
        .agg(
            F.count("*").alias("n_buckets"),
            F.count_distinct("tier").alias("n_tiers"),
        )
        .collect()
    )
    assert per_interval
    for row in per_interval:
        assert row.n_tiers == 1, row          # one tier per interval
        assert row.n_buckets <= _TIER_FANOUT + 1, row


def test_multiscale_plan_is_equi_join_on_tier_and_bucket(spark, ms_dir):
    df = all_queries()["events_interval_join_multiscale"].spark_fn(
        spark, ms_dir
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    join_lines = [
        ln for ln in plan.splitlines()
        if "HashJoin" in ln or "SortMergeJoin" in ln
    ]
    assert join_lines and any(
        "bucket" in ln and "tier" in ln for ln in join_lines
    ), plan


# --- interval x interval overlap join ----------------------------------


@pytest.fixture(scope="module")
def ov_dir(spark, tmp_path_factory):
    """Planted overlaps: a promo window spanning SEVERAL shared
    1-hour buckets (the single-assignment rule must emit it once),
    a cross-day promo that starts BEFORE the next window opens, and
    a promo with zero overlap."""
    base = tmp_path_factory.mktemp("ivoverlap")
    t0 = datetime(2024, 3, 1, 0, 0, 0)

    def r(eid, uid, minutes, etype):
        return (eid, t0 + timedelta(minutes=minutes), uid, etype, 1.0, "{}")

    rows = [
        # user 1: window 00:00-06:00; purchase at 00:30 -> promo
        # [00:30, 02:00] shares buckets 0, 1, 2 with the window
        r(1, 1, 0, "view"),
        r(2, 1, 30, "purchase"),
        # purchase at 05:30 -> promo [05:30, 07:00] overlaps the
        # window's tail only (overlap 30 min)
        r(3, 1, 330, "purchase"),
        # purchase at 07:00 -> promo [07:00, 08:30], no overlap
        r(4, 1, 420, "purchase"),
        # user 2: day-1 window opens 23:00 (6h -> 05:00 day 2); the
        # day-2 window opens at 01:00 with the purchase ITSELF, so its
        # promo [01:00, 02:30] overlaps day-1's window (p inside w)
        # AND day-2's own window (p_start == w_start -> strict < on
        # both sides still overlaps: w_start < p_end and p_start < w_end)
        r(5, 2, 23 * 60, "view"),
        r(6, 2, 25 * 60, "purchase"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{base}/events.parquet")
    return str(base)


def test_overlap_join_planted_semantics(spark, ov_dir):
    out = (
        all_queries()["events_interval_overlap_join"]
        .spark_fn(spark, ov_dir)
        .collect()
    )
    got = sorted(
        (r.event_id, r.w_start.isoformat(), r.overlap_minutes) for r in out
    )
    assert got == [
        # promo 2 spans 3 shared buckets -> exactly ONE row (90 min)
        (2, "2024-03-01T00:00:00", 90.0),
        # promo 3 overlaps the window tail: 05:30-06:00 = 30 min
        (3, "2024-03-01T00:00:00", 30.0),
        # promo 6 vs user-2 day-1 window (23:00-05:00): full 90 min
        (6, "2024-03-01T23:00:00", 90.0),
        # promo 6 vs its OWN day-2 window (01:00-07:00): full 90 min
        (6, "2024-03-02T01:00:00", 90.0),
    ]
    # single-assignment held: no (event_id, w_start) pair repeats
    keys = [(r.event_id, r.w_start) for r in out]
    assert len(keys) == len(set(keys))


def test_overlap_join_plan_is_equi_join(spark, ov_dir):
    df = all_queries()["events_interval_overlap_join"].spark_fn(
        spark, ov_dir
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    join_lines = [
        ln for ln in plan.splitlines()
        if "HashJoin" in ln or "SortMergeJoin" in ln
    ]
    assert join_lines and any("bucket" in ln for ln in join_lines), plan


# --- hypothesis differentials: random event sets vs pure-Python ---------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# random (user_id, minute-offset, is_purchase) triples over a 4-day
# span: minute granularity hits tier/bucket boundaries (offsets around
# multiples of 15 min / 6 h / 1 day) and day rollovers
_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),          # user_id
        st.integers(min_value=0, max_value=4 * 1440),   # minutes from t0
        st.booleans(),                                  # purchase?
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda t: (t[0], t[1]),  # one event per (user, minute)
)


def _mk_events(spark, tmp_path, evs):
    from datetime import datetime as dt, timedelta

    t0 = dt(2024, 3, 1)
    rows = [
        (i, t0 + timedelta(minutes=m), u,
         "purchase" if p else "view", 1.0, "{}")
        for i, (u, m, p) in enumerate(evs)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    path = f"{tmp_path}/events.parquet"
    df.write.mode("overwrite").parquet(path)
    return t0, rows


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(evs=_EVENTS)
def test_multiscale_property_matches_python_reference(
    spark, tmp_path_factory, evs
):
    """Differential property: the tiered decomposition must equal the
    direct range semantics (per-user-day window of 15min/6h/2d by
    user_id % 3; purchases strictly inside ANY of the user's windows)
    on arbitrary small event sets."""
    tmp = tmp_path_factory.mktemp("ivprop")
    t0, rows = _mk_events(spark, tmp, evs)
    from datetime import timedelta

    dur = {0: 15, 1: 360, 2: 2880}
    windows = {}
    for eid, ts, u, et, _, _ in rows:
        day = ts.date()
        key = (u, day)
        if key not in windows or ts < windows[key]:
            windows[key] = ts
    expected = set()
    for eid, ts, u, et, _, _ in rows:
        if et != "purchase":
            continue
        for (wu, _), w_start in windows.items():
            if wu != u:
                continue
            w_end = w_start + timedelta(minutes=dur[u % 3])
            if w_start < ts < w_end:
                expected.add((eid, w_start))
    got = {
        (r.event_id, r.w_start)
        for r in all_queries()["events_interval_join_multiscale"]
        .spark_fn(spark, str(tmp))
        .collect()
    }
    assert got == expected


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(evs=_EVENTS)
def test_overlap_property_matches_python_reference(
    spark, tmp_path_factory, evs
):
    """Differential property: the single-assignment bucket overlap
    join must emit every (promo, window) pair with a strict overlap
    EXACTLY ONCE, with the exact overlap length."""
    tmp = tmp_path_factory.mktemp("ovprop")
    t0, rows = _mk_events(spark, tmp, evs)
    from datetime import timedelta

    windows = {}
    for eid, ts, u, et, _, _ in rows:
        key = (u, ts.date())
        if key not in windows or ts < windows[key]:
            windows[key] = ts
    expected = {}
    for eid, ts, u, et, _, _ in rows:
        if et != "purchase":
            continue
        p_start, p_end = ts, ts + timedelta(minutes=90)
        for (wu, _), w_start in windows.items():
            if wu != u:
                continue
            w_end = w_start + timedelta(minutes=360)
            if w_start < p_end and p_start < w_end:
                ov = (min(w_end, p_end) - max(w_start, p_start))
                expected[(eid, w_start)] = round(
                    ov.total_seconds() / 60.0, 6
                )
    got = {}
    for r in (
        all_queries()["events_interval_overlap_join"]
        .spark_fn(spark, str(tmp))
        .collect()
    ):
        assert (r.event_id, r.w_start) not in got, "pair emitted twice"
        got[(r.event_id, r.w_start)] = r.overlap_minutes
    assert got == expected
