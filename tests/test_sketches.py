"""Mergeable-sketch entries (queries/sketches.py): contract booleans
must hold at fixture scale, and the merge path must agree with the
single-shot sketch (the associativity that makes sketches a 100 TB
primitive)."""

from __future__ import annotations

from dataengineer_job_scraper_etl_spark.queries.sketches import (
    agg_countmin_type_freq,
    agg_hll_union_tol,
    agg_theta_set_ops_tol,
)
from pyspark.sql import functions as F


def test_hll_union_contract(spark, sf_dir):
    row = agg_hll_union_tol(spark, sf_dir).collect()[0]
    assert row["union_within_tol"]
    assert row["n_exact"] > 0


def test_hll_merge_equals_single_shot(spark, sf_dir):
    """Union of per-group partial sketches must estimate the same as
    one corpus-wide sketch — sketches are associative summaries, so
    splitting the aggregation cannot change the answer."""
    from dataengineer_job_scraper_etl_spark.queries.events import _events

    e = _events(spark, sf_dir)
    merged = (
        e.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]["est"]
    )
    single = e.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    ).collect()[0]["est"]
    assert merged == single


def test_theta_set_ops_contract(spark, sf_dir):
    row = agg_theta_set_ops_tol(spark, sf_dir).collect()[0]
    assert row["union_ok"] and row["intersect_ok"] and row["diff_ok"]
    # inclusion-exclusion consistency of the exact side
    assert (
        row["n_intersect"]
        == row["n_click"] + row["n_purchase"] - row["n_union"]
    )
    assert 0 <= row["n_intersect"] <= min(row["n_click"], row["n_purchase"])


def test_countmin_bounds(spark, sf_dir):
    rows = agg_countmin_type_freq(spark, sf_dir).collect()
    assert len(rows) == 5
    assert all(r["cms_ok"] for r in rows)
