"""The job_postings Python DataSource (PySpark 4 Data Source API):
S1-S4 consumed via spark.read.format(...), fully offline on staged
HTML fixtures (SURVEY §5.2 — never live LinkedIn in tests)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.sources.datasource import (
    JobPostingsDataSource,
    stage_fixture,
)
from dataengineer_job_scraper_etl_spark.sources.scrape import (
    DETAIL_URL_TEMPLATE,
    LIST_URL_TEMPLATE,
)


def _card(jobid: int, title: str | None) -> str:
    h3 = (
        f'<h3 class="base-search-card__title">{title}</h3>'
        if title is not None
        else ""
    )
    return (
        f'<div class="job-search-card" '
        f'data-entity-urn="urn:li:jobPosting:{jobid}">{h3}</div>'
    )


def _stage_title(
    fixture_dir: str,
    title: str,
    n_cards: int,
    missing_details: set[int] = frozenset(),
) -> None:
    list_url = LIST_URL_TEMPLATE.format(
        keywords=title.replace(" ", "%20"),
        location="London",
        geo_id="102257491",
    )
    cards = "".join(_card(i, f"{title} {i}") for i in range(n_cards))
    stage_fixture(fixture_dir, list_url, f"<html><body>{cards}</body></html>")
    for i in range(n_cards):
        if i in missing_details:
            continue  # unstaged detail == fetch gave up -> null desc
        stage_fixture(
            fixture_dir,
            DETAIL_URL_TEMPLATE.format(jobid=str(i)),
            '<html><body><div class="description__text">'
            f"We need <b>Python, Spark.</b> Job {i} pays £55K."
            "</div></body></html>",
        )


def _read(spark, fixture_dir: str, titles: str):
    spark.dataSource.register(JobPostingsDataSource)
    return (
        spark.read.format("job_postings")
        .option("job_titles", titles)
        .option("fixture_dir", fixture_dir)
        .load()
    )


def test_datasource_reads_titles_as_partitions(spark, tmp_path):
    d = str(tmp_path / "fx")
    _stage_title(d, "Data Engineer", 3)
    _stage_title(d, "Data Scientist", 2)
    df = _read(spark, d, "Data Engineer, Data Scientist")
    assert df.schema.simpleString() == (
        "struct<jobid:string,title:string,description:string,job_type:string>"
    )
    rows = df.collect()
    assert len(rows) == 5  # 3 + 2 cards
    by_type = {
        r["job_type"]
        for r in rows
    }
    assert by_type == {"Data Engineer", "Data Scientist"}
    # one input split per title: the scheduler owns the fan-out
    assert df.rdd.getNumPartitions() == 2
    assert all("Python, Spark." in r["description"] for r in rows)


def test_datasource_missing_detail_yields_null_description(spark, tmp_path):
    d = str(tmp_path / "fx2")
    _stage_title(d, "Data Engineer", 3, missing_details={1})
    df = _read(spark, d, "Data Engineer")
    by_id = {r["jobid"]: r["description"] for r in df.collect()}
    assert by_id["1"] is None and by_id["0"] is not None


def test_datasource_missing_list_skips_title(spark, tmp_path):
    d = str(tmp_path / "fx3")
    _stage_title(d, "Data Engineer", 2)
    # "Data Scientist" list page never staged -> give-up -> no rows
    df = _read(spark, d, "Data Engineer, Data Scientist")
    assert df.filter(F.col("job_type") == "Data Scientist").count() == 0
    assert df.count() == 2


def test_datasource_streaming_polls_and_dedups(spark, tmp_path):
    """readStream.format('job_postings'): each micro-batch is one poll
    round over all titles (offset = round counter in the checkpoint).
    Two batches re-deliver the same postings; keyed streaming dedup
    collapses them — the productionized shape of the reference's
    scheduled nightly re-scrape (main.yml:36-37)."""
    import os
    import uuid

    d = str(tmp_path / "fxs")
    _stage_title(d, "Data Engineer", 3)
    spark.dataSource.register(JobPostingsDataSource)
    stream = (
        spark.readStream.format("job_postings")
        .option("job_titles", "Data Engineer")
        .option("fixture_dir", d)
        .load()
        .dropDuplicates(["jobid"])
    )
    name = "ds_stream_" + uuid.uuid4().hex[:8]
    # append mode: the sink receives only first-seen jobids, so the
    # second poll round contributes zero rows — dedup visible in the
    # output size itself.
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option(
            "checkpointLocation", os.path.join(str(tmp_path), "cp", name)
        )
        .start()
    )
    try:
        # wait until at least 2 poll rounds (micro-batches) committed
        import time

        deadline = time.time() + 120
        while time.time() < deadline:
            progress = q.lastProgress
            if progress and progress["batchId"] >= 2:
                break
            time.sleep(0.5)
        assert progress and progress["batchId"] >= 2, "no second poll"
    finally:
        q.stop()
    rows = spark.table(name).collect()
    # 3 postings per poll, re-delivered every round, deduped to 3
    assert sorted(r["jobid"] for r in rows) == ["0", "1", "2"]
    assert all(r["description"] for r in rows)


def test_datasource_composes_with_downstream_transform(spark, tmp_path):
    """The point of the DataSource form: the scrape is a normal source
    under the full transform (EP1 shape) with no special plumbing."""
    from dataengineer_job_scraper_etl_spark.plans.jobs import (
        transform_postings,
    )

    d = str(tmp_path / "fx4")
    _stage_title(d, "Data Engineer", 4)
    raw = _read(spark, d, "Data Engineer")
    out = transform_postings(raw, ["python", "spark", "airflow"])
    rows = out.collect()
    assert len(rows) == 4
    assert all(r["pay"] == 55000.0 for r in rows)
    assert all(r["skills"] == ["python", "spark"] for r in rows)
