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
