"""Planted semantics for the round-11 analytics additions: the
first-order Markov transition matrix (queries/markov.py) and Broder
shingle containment (queries/containment.py)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.catalog import all_queries


@pytest.fixture(scope="module")
def mk_dir(spark, tmp_path_factory):
    """Two users with known transition chains:
    user 1: view -> click -> view -> click -> purchase
    user 2: view -> view
    Global: view->click 2, click->view 1, view->view 1,
    click->purchase 1; P(click|view) = 2/3, P(view|view) = 1/3."""
    base = tmp_path_factory.mktemp("markov")
    t0 = datetime(2024, 3, 1)
    rows = []
    for i, et in enumerate(["view", "click", "view", "click", "purchase"]):
        rows.append((i, t0 + timedelta(minutes=i), 1, et, 1.0, "{}"))
    for i, et in enumerate(["view", "view"]):
        rows.append((10 + i, t0 + timedelta(minutes=i), 2, et, 1.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{base}/events.parquet")
    return str(base)


def test_markov_planted_transitions(spark, mk_dir):
    out = {
        (r.prev_type, r.next_type): (r.n, r.p)
        for r in all_queries()["events_type_markov_transitions"]
        .spark_fn(spark, mk_dir)
        .collect()
    }
    assert out == {
        ("view", "click"): (2, 0.666667),
        ("view", "view"): (1, 0.333333),
        ("click", "view"): (1, 0.5),
        ("click", "purchase"): (1, 0.5),
    }


def test_markov_rows_sum_to_one(spark, sf_dir):
    rows = (
        all_queries()["events_type_markov_transitions"]
        .spark_fn(spark, sf_dir)
        .groupBy("prev_type")
        .agg(F.round(F.sum("p"), 3).alias("s"))
        .collect()
    )
    assert rows and all(abs(r.s - 1.0) < 0.005 for r in rows)


def test_containment_catches_planted_excerpts(spark, sf_dir):
    """Every planted excerpt (doc_id % 20 == 0, < 150) must surface
    with containment 1.0 toward its source while the SAME pair's
    Jaccard sits well under the 0.5 near-dup bar — the inclusion
    shape symmetric Jaccard misses."""
    out = all_queries()["docs_shingle_containment"].spark_fn(
        spark, sf_dir
    ).collect()
    planted = {
        (r.doc_a, r.doc_b): r
        for r in out
        if r.doc_a >= 2_000_000 and r.doc_b == r.doc_a - 2_000_000
    }
    expected_sources = {d for d in range(0, 150, 20)}
    assert {b for (_, b) in planted} == expected_sources
    for r in planted.values():
        assert r.containment == 1.0, r
        # excerpt/source ratio bounds Jaccard: ~0.3 for full-length
        # (~100-token) sources, up to 0.5 when the source is barely
        # longer than the 30-token excerpt — always under containment
        assert r.jaccard <= 0.6, r
    assert min(r.jaccard for r in planted.values()) < 0.4


def test_containment_plan_has_no_cartesian(spark, sf_dir):
    df = all_queries()["docs_shingle_containment"].spark_fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
