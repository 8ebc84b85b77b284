"""Hand-computable fixture for the two-sample KS drift entry."""

from __future__ import annotations


def test_ks_matches_hand_computed_d(spark, tmp_path):
    from dataengineer_job_scraper_etl_spark.queries.events import (
        events_value_ks_drift,
    )

    # Slice A = event_id%10<8, slice B = rest. Values chosen so the
    # merged empirical CDFs differ by exactly 1/2 at x in [2..4]:
    # F_A over {1,2,3,4}, F_B over {3,4,5,6} -> D = 0.5.
    rows = [
        (0, 1.0), (1, 2.0), (2, 3.0), (3, 4.0),  # A
        (8, 3.0), (9, 4.0), (18, 5.0), (19, 6.0),  # B
        (4, None),  # null value: excluded from both CDFs
    ]
    d = str(tmp_path / "fix")
    spark.createDataFrame(
        [(i, "2024-01-01 00:00:00", i, "t", v, "{}") for i, v in rows],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value", "props",
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")

    row = events_value_ks_drift(spark, d).collect()[0]
    assert (row["n_a"], row["n_b"]) == (4, 4)
    assert row["ks_ppm"] == 500000  # D = 1/2, integer-exact


def test_ks_scaling_is_exact_past_the_old_int64_wrap(spark):
    """ADVICE r7: the all-int64 formulation silently wrapped at
    mx * 1e6 > 9.2e18 (~3e6 rows per balanced slice). The DECIMAL /
    HUGEINT scaling step must agree across engines right at and past
    that boundary, up to the documented ~3e9-rows-per-slice bound."""
    import duckdb

    cases = [
        # mx <= na*nb by construction (D <= 1); max out both
        (9_000_000_000_000_000_000, 3_000_000_000, 3_000_000_000),
        (9_223_372_036_854, 3_037_000, 3_037_000),  # old wrap point
        (1, 3_000_000_000, 3_000_000_000),
        (8_999_999_999_999_999_999, 2_999_999_999, 3_000_000_000),
    ]
    for mx, na, nb in cases:
        got = spark.sql(
            f"SELECT CAST(CAST({mx} AS DECIMAL(38,0)) * 1000000"
            f" div (CAST({na} AS DECIMAL(19,0)) * {nb}) AS BIGINT) AS x"
        ).collect()[0]["x"]
        want = duckdb.sql(
            f"SELECT CAST(CAST({mx} AS HUGEINT) * 1000000"
            f" // (CAST({na} AS HUGEINT) * {nb}) AS BIGINT) AS x"
        ).fetchone()[0]
        assert got == want, (mx, na, nb, got, want)
        assert 0 <= got <= 1_000_000  # a KS statistic in ppm
