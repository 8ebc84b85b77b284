"""C4/F3/C7 — string scalar semantics (SURVEY §2.7, §2.4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.functions.strings import (
    ddmmyyyy,
    jobid_from_urn,
    not_containing,
)


def test_jobid_from_urn(spark):
    df = spark.createDataFrame(
        [("urn:li:jobPosting:123456",), ("plain",), (None,)], "urn string"
    )
    got = [r["id"] for r in df.select(jobid_from_urn(F.col("urn")).alias("id")).collect()]
    assert got == ["123456", "plain", None]


def test_not_containing_drops_nulls(spark):
    # pandas `== False` drops null titles (NaN == False -> False);
    # Spark ~rlike yields null for null input and filter drops it —
    # assert the alignment, don't assume it (reference etl/job_scrape.py:63).
    df = spark.createDataFrame(
        [("Software Engineer",), ("Data Engineer",), (None,)], "title string"
    )
    kept = [
        r["title"]
        for r in df.filter(not_containing(F.col("title"), "Software")).collect()
    ]
    assert kept == ["Data Engineer"]


def test_ddmmyyyy_shape(spark):
    got = spark.range(1).select(ddmmyyyy().alias("d")).first()["d"]
    assert len(got) == 8 and got.isdigit()
