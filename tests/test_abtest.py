"""CUPED A/B readout (queries/abtest.py): planted covariate
structures with closed-form answers, degenerate guards, and the
entry surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.queries.abtest import (
    cuped_readout,
)


def _per_user(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, variant long, x long, y long"
    )


def test_perfect_covariate_equalizes_arms(spark):
    # y = 2x exactly: theta = 2, rho2 = 1, and the adjusted means of
    # BOTH arms collapse to 2 * global mean(x) — CUPED removes all
    # pre-period imbalance when the metric is fully explained by it
    rows = [(u, u % 2, 100 * (u + 1), 200 * (u + 1)) for u in range(10)]
    out = {r.variant: r for r in cuped_readout(_per_user(spark, rows)).collect()}
    assert out[0].theta_ppm == 2_000_000
    assert out[0].var_reduction_ppm == 1_000_000
    # raw means differ (odd users have larger x), adjusted means equal
    assert out[0].mean_post_millicents != out[1].mean_post_millicents
    assert out[0].mean_adj_millicents == out[1].mean_adj_millicents
    # and equal 2 * mean(x) * 1000 = 2 * 550 * 1000
    assert out[0].mean_adj_millicents == 1_100_000
    # adjusted individuals are CONSTANT (y - 2x + 2*mean = const):
    # zero adjusted variance -> zero CI halfwidth, zero lift, and a
    # zero-lift readout must not claim significance
    assert out[0].ci_halfwidth_millicents == 0
    assert out[0].lift_millicents == 0
    assert out[0].significant is False


def test_constant_covariate_is_a_noop(spark):
    # var(x) = 0: theta and rho2 guard to 0, adjusted == raw
    rows = [(u, u % 2, 500, 100 * (u + 1)) for u in range(8)]
    out = cuped_readout(_per_user(spark, rows)).collect()
    for r in out:
        assert r.theta_ppm == 0
        assert r.var_reduction_ppm == 0
        assert r.mean_adj_millicents == r.mean_post_millicents


def test_hand_computed_theta(spark):
    # 4 users: x = (0, 2, 0, 2), y = (1, 3, 3, 5) ->
    # n=4 Sx=4 Sy=12 Sxx=8 Sxy=16 : theta = (64-48)/(32-16) = 1.0
    rows = [(0, 0, 0, 1), (1, 1, 2, 3), (2, 0, 0, 3), (3, 1, 2, 5)]
    out = {r.variant: r for r in cuped_readout(_per_user(spark, rows)).collect()}
    assert out[0].theta_ppm == 1_000_000
    # arm 0: mean_y 2, mean_x 0, global mean_x 1 -> adj 2 - 1*(0-1) = 3
    assert out[0].mean_adj_millicents == 3_000
    # arm 1: mean_y 4, mean_x 2 -> adj 4 - 1*(2-1) = 3 — balanced
    assert out[1].mean_adj_millicents == 3_000
    # delta-method by hand: adjusted individuals y - x are (1, 3) in
    # BOTH arms -> var 1 each (population), SE^2 = 1/2 + 1/2 = 1,
    # halfwidth = 1.96 * 1000; lift 0 -> not significant
    assert out[0].lift_millicents == 0
    assert out[0].ci_halfwidth_millicents == 1_960
    assert out[0].significant is False


def test_planted_effect_is_significant(spark):
    # constant covariate (theta guards to 0) + a planted 1000-cent
    # treatment shift with +-0.5-cent noise: lift = exactly 1000,
    # halfwidth = 1.96 * sqrt(0.25/4 + 0.25/4) = 0.693 -> flagged
    rows = [
        (u, u % 2, 7, 10 + (u % 2) * 1000 + (u // 2) % 2)
        for u in range(8)
    ]
    out = {r.variant: r for r in cuped_readout(_per_user(spark, rows)).collect()}
    assert out[0].lift_millicents == 1_000_000
    assert out[0].ci_halfwidth_millicents == 693
    assert out[0].significant is True


def test_entry_surface(spark, sf_dir):
    from dataengineer_job_scraper_etl_spark.catalog import all_queries

    out = (
        all_queries()["events_cuped_ab_adjustment"]
        .spark_fn(spark, sf_dir)
        .collect()
    )
    assert sorted(r.variant for r in out) == [0, 1]
    pooled = {(r.theta_ppm, r.var_reduction_ppm) for r in out}
    assert len(pooled) == 1  # pooled stats identical on both rows
    for r in out:
        assert r.n_users > 0
        assert 0 <= r.var_reduction_ppm <= 1_000_000
        assert r.ci_halfwidth_millicents >= 0
        # significance is consistent with its own interval
        assert r.significant == (
            abs(r.lift_millicents) > r.ci_halfwidth_millicents
        ) or abs(abs(r.lift_millicents) - r.ci_halfwidth_millicents) <= 1


def test_variant_assignment_matches_user_parity(spark, sf_dir):
    from dataengineer_job_scraper_etl_spark.queries.abtest import (
        METRIC_EVENT,
    )

    e = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("event_type") == METRIC_EVENT
    )
    n_users = e.select("user_id").distinct().count()
    from dataengineer_job_scraper_etl_spark.catalog import all_queries

    out = (
        all_queries()["events_cuped_ab_adjustment"]
        .spark_fn(spark, sf_dir)
        .collect()
    )
    assert sum(r.n_users for r in out) == n_users
