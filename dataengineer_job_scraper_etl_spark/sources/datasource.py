"""S1-S4 as a first-class Spark DataSource (PySpark 4 Python Data
Source API): ``spark.read.format("job_postings")`` — the idiomatic
packaging of the scrape source, so the reference's extract stage
(main.py:76-125) is consumable exactly like parquet/csv.

Why a DataSource on top of ``scrape.scrape_postings`` (which stays the
injectable library form):

- **Planning is Spark's, not ours**: ``partitions()`` declares one
  input split per job title, so the scheduler owns fan-out, retry of
  failed tasks, and locality — instead of a repartitioned seed frame.
  Politeness still holds: one list fetch + sequential detail fetches
  per partition, ``per_request_delay`` between them (reference
  main.py:27's 3s delay).
- **Catalog-ready**: any consumer can `.format("job_postings")
  .option("job_titles", ...)` with no imports from this package,
  and the source composes with every DataFrame operator downstream.
- **Options are the contract**: everything the reader needs travels as
  string options (serialized to the Python workers by the engine), so
  the source works from SQL/connect clients too.

Offline mode (tests; SURVEY §5.2's never-live-LinkedIn rule): set
``fixture_dir`` and every URL resolves to ``<dir>/<md5(url)>.html``
(missing file == fetch exhausted retries -> None, the reference's
give-up path, main.py:124-125). ``stage_fixture`` writes files under
that naming so tests and docs share one scheme. Without
``fixture_dir`` the reader uses the live requests fetcher with the
reference's retry envelope (scrape.default_fetcher).
"""

from __future__ import annotations

import hashlib
import os
import time

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from dataengineer_job_scraper_etl_spark.sources.scrape import (
    DETAIL_URL_TEMPLATE,
    LIST_URL_TEMPLATE,
    MAX_CARDS,
    parse_job_cards,
    parse_job_description,
)

FORMAT_NAME = "job_postings"
_SCHEMA = "jobid string, title string, description string, job_type string"


def _fixture_path(fixture_dir: str, url: str) -> str:
    return os.path.join(
        fixture_dir, hashlib.md5(url.encode()).hexdigest() + ".html"
    )


def stage_fixture(fixture_dir: str, url: str, html: str) -> str:
    """Write ``html`` where the offline reader will look for ``url``."""
    os.makedirs(fixture_dir, exist_ok=True)
    p = _fixture_path(fixture_dir, url)
    with open(p, "w", encoding="utf-8") as f:
        f.write(html)
    return p


class _TitlePartition(InputPartition):
    """One input split per job title — the unit of scrape parallelism
    (the reference's per-title Pub/Sub message, main.py:54-76)."""

    def __init__(self, job_type: str, list_url: str) -> None:
        self.job_type = job_type
        self.list_url = list_url


class JobPostingsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        titles = options.get("job_titles", "")
        self.job_titles = [t.strip() for t in titles.split(",") if t.strip()]
        if not self.job_titles:
            raise ValueError(
                "job_postings source requires option 'job_titles' "
                "(comma-separated)"
            )
        self.location = options.get("location", "London")
        self.geo_id = options.get("geo_id", "102257491")
        self.max_cards = int(options.get("max_cards", MAX_CARDS))
        self.per_request_delay = float(options.get("per_request_delay", "0"))
        self.fixture_dir = options.get("fixture_dir")

    def partitions(self) -> list[InputPartition]:
        return [
            _TitlePartition(
                t,
                LIST_URL_TEMPLATE.format(
                    keywords=t.replace(" ", "%20"),
                    location=self.location,
                    geo_id=self.geo_id,
                ),
            )
            for t in self.job_titles
        ]

    def _fetch(self, url: str) -> str | None:
        if self.fixture_dir is not None:
            p = _fixture_path(self.fixture_dir, url)
            if not os.path.exists(p):
                return None  # == retries exhausted (main.py:124-125)
            with open(p, encoding="utf-8") as f:
                return f.read()
        from dataengineer_job_scraper_etl_spark.sources.scrape import (
            default_fetcher,
        )

        return default_fetcher()(url)

    def read(self, partition: _TitlePartition):
        html = self._fetch(partition.list_url)
        if html is None:
            return  # give-up -> skip this title entirely
        for card in parse_job_cards(html, self.max_cards):
            if self.per_request_delay:
                time.sleep(self.per_request_delay)
            detail = self._fetch(
                DETAIL_URL_TEMPLATE.format(jobid=card["jobid"])
            )
            desc = (
                parse_job_description(detail) if detail is not None else None
            )
            yield (card["jobid"], card["title"], desc, partition.job_type)


class JobPostingsStreamReader(SimpleDataSourceStreamReader):
    """``spark.readStream.format('job_postings')`` — the reference's
    scheduled nightly re-scrape (main.yml:36-37, Cloud Scheduler ->
    Pub/Sub -> function) as a STREAMING source: every micro-batch is
    one poll round over all titles, the offset is the round counter,
    and exactly-once bookkeeping (which rounds landed in which batch)
    is the engine's checkpoint, not cron-and-hope.

    A posting surfacing in consecutive polls is the same posting, so
    the natural downstream is keyed dedup
    (``dropDuplicatesWithinWatermark`` on jobid — tested). Round
    bookkeeping lives in the OFFSET (the engine's checkpoint), not in
    the rows: the stream shares the batch schema exactly.
    ``readBetweenOffsets`` replays rounds for recovery: at-least-once
    against a live site (content may differ by replay time),
    exactly-once in fixture mode (deterministic files)."""

    def __init__(self, options: dict) -> None:
        self._batch = JobPostingsReader(options)

    def initialOffset(self) -> dict:
        return {"round": 0}

    def _scrape_round(self) -> list[tuple]:
        # materialized list, not a generator: the engine's simple-reader
        # wrapper prefetches on the driver and PICKLES the row cache for
        # the workers — a generator cannot be copied or pickled.
        return [
            row
            for p in self._batch.partitions()
            for row in self._batch.read(p)
        ]

    def read(self, start: dict):
        rnd = start["round"]
        return self._scrape_round(), {"round": rnd + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows: list[tuple] = []
        for _ in range(start["round"], end["round"]):
            rows.extend(self._scrape_round())
        return rows


class JobPostingsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> JobPostingsReader:  # noqa: ANN001
        return JobPostingsReader(self.options)

    def simpleStreamReader(self, schema):  # noqa: ANN001
        return JobPostingsStreamReader(self.options)


def register(spark) -> None:  # noqa: ANN001
    """Register the format on a session:
    ``spark.read.format('job_postings')`` afterwards."""
    spark.dataSource.register(JobPostingsDataSource)
