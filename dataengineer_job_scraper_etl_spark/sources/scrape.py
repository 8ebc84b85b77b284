"""S1-S4 — the scrape source: LinkedIn job-list + job-detail fetch and
HTML parse, re-expressed as a distributed Spark source.

Reference behavior being preserved (SURVEY §2.1, §3 EP1/EP3):
- S1 list scan: GET a search URL with the 24h window pushed into the
  source (``f_TPR=r86400``, reference main.py:76,85); <=5 attempts with
  randomized 2-12s backoff (main.py:120-123).
- S2 parse: job cards -> (jobid from ``data-entity-urn`` split ':',
  title text) (main.py:88-102).
- S3 keyed detail fetch: GET /jobPosting/{jobid}, <=5 retries with 3s
  delay, None on exhaustion -> null description propagates
  (main.py:22-37).
- S4 row limit: first 25 cards (main.py:97).

Spark-first design:
- a tiny seed DataFrame of (job_type, url) fans out via ``repartition``
  — the partition count IS the politeness rate limit: one in-flight
  request per partition, sleeps happen inside the partition loop, so
  cluster-wide concurrency is explicit and bounded.
- fetch + parse run in ``mapInPandas`` (Arrow batches, one Python
  worker per partition) and emit typed rows; nulls flow through the
  normal plan. No collect() on the driver at any point.
- the HTTP client is injected (``fetcher``): tests inject a local
  fixture reader and run fully offline (SURVEY §5.2 rule: never live
  LinkedIn in tests); the default is requests-with-retries matching
  the reference's backoff envelope.

Parsing uses stdlib html.parser (BeautifulSoup is not in this image;
import-gated — if bs4 is present it is used, same selectors as the
reference's find_all/select calls).
"""

from __future__ import annotations

import random
import re
import time
from collections.abc import Callable, Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from dataengineer_job_scraper_etl_spark.schemas import JOB_POSTING_RAW

Fetcher = Callable[[str], str | None]

LIST_URL_TEMPLATE = (
    "https://www.linkedin.com/jobs-guest/jobs/api/seeMoreJobPostings/search"
    "?keywords={keywords}&location={location}&geoId={geo_id}&f_TPR=r86400"
)
DETAIL_URL_TEMPLATE = (
    "https://www.linkedin.com/jobs-guest/jobs/api/jobPosting/{jobid}"
)

MAX_CARDS = 25  # S4 (reference main.py:97)
LIST_RETRIES = 5  # main.py:79,120-123
DETAIL_RETRIES = 5  # main.py:24-37


def default_fetcher(
    retries: int = LIST_RETRIES,
    backoff: tuple[float, float] = (2.0, 12.0),
    timeout: float = 30.0,
) -> Fetcher:
    """requests-based fetcher with the reference's retry envelope:
    <=``retries`` attempts, a randomized backoff sleep BETWEEN
    attempts only (the reference sleeps under ``attempt <
    max_retries - 1``, main.py:120-123 — no sleep after the final
    failure before giving up), give-up returns None (main.py:124-125).
    Non-200 responses and transport errors retry identically. The
    envelope is pinned network-free by
    tests/test_scrape.py::test_default_fetcher_* (fake clock/fake
    transport)."""
    import requests

    def fetch(url: str) -> str | None:
        for attempt in range(retries):
            try:
                resp = requests.get(url, timeout=timeout)
                if resp.status_code == 200:
                    return resp.text
            except requests.RequestException:
                pass
            if attempt < retries - 1:
                time.sleep(random.uniform(*backoff))
        return None

    return fetch


class _CardParser(HTMLParser):
    """Extract (data-entity-urn, title) pairs from a job-list page:
    stdlib equivalent of find_all('div', class_='job-search-card') +
    h3.base-search-card__title (reference main.py:88-102).

    A card with a data-entity-urn but no h3 title is KEPT with
    title=None — the reference keeps the row with a null title
    (main.py:101-102); pending cards are flushed when the next card
    starts or the feed ends."""

    def __init__(self) -> None:
        super().__init__()
        self.cards: list[dict] = []
        self._urn: str | None = None
        self._in_title = False
        self._title_parts: list[str] = []

    def _flush(self) -> None:
        if self._urn is not None:
            self.cards.append({"urn": self._urn, "title": None})
            self._urn = None

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        cls = a.get("class", "")
        if tag == "div" and "job-search-card" in cls.split():
            self._flush()  # previous card had no title
            self._urn = a.get("data-entity-urn")
        if tag == "h3" and "base-search-card__title" in cls.split():
            self._in_title = True
            self._title_parts = []

    def handle_data(self, data):
        if self._in_title:
            self._title_parts.append(data)

    def handle_endtag(self, tag):
        if tag == "h3" and self._in_title:
            self._in_title = False
            title = "".join(self._title_parts).strip()  # C6 strip
            if self._urn is not None:
                self.cards.append({"urn": self._urn, "title": title})
                self._urn = None

    def close(self) -> None:
        super().close()
        self._flush()  # trailing card with no title


def parse_job_cards(html: str, limit: int = MAX_CARDS) -> list[dict]:
    """(jobid, title) rows from a list page; jobid = urn.split(':')[-1]
    (C4, main.py:100); first ``limit`` cards only (S4)."""
    try:
        from bs4 import BeautifulSoup  # optional; same selectors as ref

        soup = BeautifulSoup(html, "html.parser")
        cards = []
        for div in soup.find_all("div", class_="job-search-card")[:limit]:
            urn = div.get("data-entity-urn")
            h3 = div.select_one("h3.base-search-card__title")
            if urn is None:
                continue
            cards.append(
                {
                    "jobid": urn.split(":")[-1],
                    # null-title convention matches the reference
                    # (main.py:101-102 keeps the row, title=None).
                    "title": h3.get_text(strip=True) if h3 else None,
                }
            )
        return cards
    except ImportError:
        parser = _CardParser()
        parser.feed(html)
        parser.close()
        return [
            {"jobid": c["urn"].split(":")[-1], "title": c["title"]}
            for c in parser.cards[:limit]
        ]


_DESC_RE = re.compile(
    r'<div[^>]*class="[^"]*description__text[^"]*"[^>]*>(.*?)</div>',
    re.DOTALL,
)
_TAG_RE = re.compile(r"<[^>]+>")


def parse_job_description(html: str) -> str | None:
    """Description text from a job-detail page (reference main.py:29-32
    parses div.description__text and get_text)."""
    try:
        from bs4 import BeautifulSoup

        soup = BeautifulSoup(html, "html.parser")
        div = soup.find(
            "div", class_=lambda c: c and "description__text" in c
        )
        return div.get_text(strip=True) if div else None
    except ImportError:
        m = _DESC_RE.search(html)
        if not m:
            return None
        return _TAG_RE.sub(" ", m.group(1)).strip() or None


def seed_frame(
    spark: SparkSession,
    job_titles: list[str],
    location: str = "London",
    geo_id: str = "102257491",
) -> DataFrame:
    """S1 seed: one row per job title -> list URL (the per-title
    Pub/Sub fan-out of the reference, main.py:54-76, as data)."""
    rows = [
        {
            "job_type": t,
            "list_url": LIST_URL_TEMPLATE.format(
                keywords=t.replace(" ", "%20"), location=location, geo_id=geo_id
            ),
        }
        for t in job_titles
    ]
    schema = T.StructType(
        [
            T.StructField("job_type", T.StringType(), False),
            T.StructField("list_url", T.StringType(), False),
        ]
    )
    return spark.createDataFrame(rows, schema)


def scrape_postings(
    seeds: DataFrame,
    fetcher: Fetcher,
    detail_url_template: str = DETAIL_URL_TEMPLATE,
    per_request_delay: float = 0.0,
    max_cards: int = MAX_CARDS,
    concurrency: int | None = None,
) -> DataFrame:
    """The scrape source: seeds (job_type, list_url) -> raw postings
    (jobid, title, description, job_type) per JOB_POSTING_RAW.

    ``concurrency`` repartitions the seed frame — at most that many
    partitions fetch at once, and each partition sleeps
    ``per_request_delay`` between detail fetches (the reference's 3s
    politeness delay, main.py:27; 0 in tests)."""
    if concurrency is not None:
        seeds = seeds.repartition(concurrency)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for row in batch.itertuples(index=False):
                html = fetcher(row.list_url)
                if html is None:
                    continue  # give-up -> skip title (main.py:124-125)
                for card in parse_job_cards(html, max_cards):
                    if per_request_delay:
                        time.sleep(per_request_delay)
                    detail = fetcher(
                        detail_url_template.format(jobid=card["jobid"])
                    )
                    desc = (
                        parse_job_description(detail)
                        if detail is not None
                        else None
                    )
                    out.append(
                        {
                            "jobid": card["jobid"],
                            "title": card["title"],
                            "description": desc,
                            "job_type": row.job_type,
                        }
                    )
            yield pd.DataFrame(
                out, columns=["jobid", "title", "description", "job_type"]
            )

    return seeds.mapInPandas(run, JOB_POSTING_RAW)
