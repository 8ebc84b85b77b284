"""F4/EP1 — the Pub/Sub message guard chain (reference main.py:54-65)
and the run_from_message entry shape.
"""

from __future__ import annotations

from dataengineer_job_scraper_etl_spark.plans.pipeline import (
    job_title_from_message,
    run_from_message,
)

GOOD = {"data": "ZGF0YQ==", "attributes": {"job_title": "Data%20Engineer"}}


def test_guard_chain():
    assert job_title_from_message(GOOD) == "Data Engineer"  # C9 decode
    assert job_title_from_message({}) is None  # no 'data' -> abort
    assert job_title_from_message({"attributes": {"job_title": "X"}}) is None
    assert job_title_from_message({"data": "x"}) is None  # no attributes
    assert job_title_from_message({"data": "x", "attributes": {}}) is None
    assert job_title_from_message({"data": "x", "attributes": None}) is None
    # plain title passes through unchanged
    assert (
        job_title_from_message({"data": "x", "attributes": {"job_title": "DE"}})
        == "DE"
    )


def test_run_from_message_aborts_without_running(spark, tmp_path):
    calls = {"n": 0}

    def fetcher(url):
        calls["n"] += 1
        return None

    out = run_from_message(
        spark, {}, fetcher, ["python"], str(tmp_path / "s")
    )
    assert out is None and calls["n"] == 0  # aborted before any fetch


def test_run_from_message_runs_decoded_title(spark, tmp_path):
    # one-card list page + detail page; self-contained closure (runs in
    # Spark workers — cannot reference this module, capture by value)
    list_html = (
        '<div class="job-search-card" data-entity-urn="urn:li:jobPosting:9">'
        '<h3 class="base-search-card__title">DE</h3></div>'
    )
    detail_html = '<div class="description__text">python role £40K</div>'

    def fetcher(url):
        return list_html if "seeMoreJobPostings" in url else detail_html

    out = run_from_message(
        spark, GOOD, fetcher, ["python"], str(tmp_path / "s2")
    )
    assert out is not None and out.wrote_silver
    # the DECODED title is the job_type partition value end-to-end
    assert (tmp_path / "s2" / "job_type=Data Engineer").exists()
