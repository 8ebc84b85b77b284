"""events_value_trend_regression: the closed-form moment-sum
regression must agree with an INDEPENDENT implementation (DuckDB's
built-in regr_slope/regr_intercept) — a formulation cross-check, not
just the shared-formula oracle."""

from __future__ import annotations

import duckdb


def test_trend_matches_duckdb_builtin_regression(spark, sf_dir):
    from dataengineer_job_scraper_etl_spark.catalog import all_queries

    got = {
        r["event_type"]: (r["slope_ppm"], r["intercept_ppm"])
        for r in all_queries()["events_value_trend_regression"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    con = duckdb.connect()
    ref = con.execute(
        f"""
        WITH ev AS (
          SELECT event_type,
                 date_diff('hour', TIMESTAMP '2024-01-01',
                           CAST(ts AS TIMESTAMP)) AS x,
                 round(value * 100) AS y
          FROM '{sf_dir}/events.parquet')
        SELECT event_type,
               1e6 * regr_slope(y, x), 1e6 * regr_intercept(y, x)
        FROM ev GROUP BY event_type
        """
    ).fetchall()
    assert len(ref) == len(got) > 0
    for etype, slope, intercept in ref:
        s_ppm, i_ppm = got[etype]
        # regr_* accumulates floats (different summation order) —
        # agreement within 1 ppm is formulation equivalence
        assert abs(s_ppm - slope) <= 1, etype
        assert abs(i_ppm - intercept) <= 1, etype


def test_calibrated_quantization_actually_clips(spark, sf_dir):
    """p99.9 calibration must clip SOME components (else the entry is
    vacuously absmax) while keeping the clipped fraction ~0.1%."""
    from pyspark.sql import functions as F

    from dataengineer_job_scraper_etl_spark.catalog import all_queries

    df = all_queries()["vec_quantize_int8_calibrated"].spark_fn(spark, sf_dir)
    row = df.agg(
        F.sum("n_clipped").alias("clipped"),
        F.count(F.lit(1)).alias("vecs"),
    ).collect()[0]
    total_components = row["vecs"] * 64
    assert 0 < row["clipped"] <= 0.005 * total_components
