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
