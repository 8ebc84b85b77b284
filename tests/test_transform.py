"""EP1 transform assembly + the F1-vs-F2 null-drop ordering divergence
the SURVEY flags as test-worthy (§2.4): the reference's own Spark
variant runs dropna(any) AFTER the NLP UDF (etl/transform.py:64-66),
the Polars variant drops null DESCRIPTIONS before (main.py:152). The
engine standardizes on filter-first + subset; this test pins the
semantic difference.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.plans.jobs import transform_postings
from dataengineer_job_scraper_etl_spark.schemas import JOB_POSTING_RAW

ROWS = [
    # (jobid, title, description, job_type)
    ("1", "Senior Engineer", "uses python daily £50K", "DE"),
    ("2", None, "spark experience", "DE"),  # null title, good description
    ("3", "Junior Dev", None, "DS"),  # null description -> dropped
]


def _postings(spark):
    return spark.createDataFrame(
        [dict(zip(("jobid", "title", "description", "job_type"), r)) for r in ROWS],
        JOB_POSTING_RAW,
    )


def test_transform_filters_first_keeps_null_titles(spark):
    out = transform_postings(_postings(spark), ["python", "spark"])
    rows = {r["jobid"]: r for r in out.collect()}
    # row 3 (null description) dropped; row 2 (null title) KEPT —
    # subset-filter semantics, null title -> null seniority
    assert set(rows) == {"1", "2"}
    assert rows["1"]["pay"] == 50000.0
    assert rows["1"]["skills"] == ["python"]
    assert rows["1"]["seniority"] == "Senior"
    assert rows["2"]["skills"] == ["spark"]
    assert rows["2"]["seniority"] is None
    assert set(out.columns) == {"jobid", "job_type", "pay", "skills",
                                "seniority", "date"}


def test_f2_dropna_any_divergence(spark):
    """The reference Spark variant's dropna() (F2, any-null) would ALSO
    drop row 2 (null title) and row 1 (null pay would not occur here,
    but null seniority does NOT count — dropna runs before those cols
    in the reference). Pin the divergence explicitly."""
    raw = _postings(spark)
    f1 = raw.na.drop(subset=["description"])  # engine / main.py:152
    f2 = raw.na.drop("any")  # reference etl/transform.py:66 shape
    assert f1.count() == 2  # keeps null-title row
    assert f2.count() == 1  # any-null drops it — different semantics


def test_mad_flags_planted_outlier(spark, tmp_path):
    """A single wild value must be flagged by the MAD rule while
    leaving the median/MAD essentially unmoved (the robustness that
    distinguishes it from a z-score)."""
    import shutil

    from dataengineer_job_scraper_etl_spark.queries.events import (
        events_value_mad_outliers,
    )

    d = str(tmp_path / "sf")
    import os

    os.makedirs(d)
    rows = [
        {
            "event_id": i,
            "ts": "2026-01-01 00:00:00",
            "user_id": 1,
            "event_type": "click",
            "value": float(10 + (i % 5)),  # tight cluster 10..14
            "props": "{}",
        }
        for i in range(50)
    ]
    rows.append(
        {
            "event_id": 999,
            "ts": "2026-01-01 00:00:00",
            "user_id": 1,
            "event_type": "click",
            "value": 1e6,
            "props": "{}",
        }
    )
    df = spark.createDataFrame(rows).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    df.write.parquet(f"{d}/events.parquet")
    out = {r["event_type"]: r for r in events_value_mad_outliers(spark, d).collect()}
    r = out["click"]
    assert r["n_outliers"] == 1  # only the planted wild value
    assert 10 <= r["med"] <= 14  # median unmoved by the outlier
    shutil.rmtree(d, ignore_errors=True)
