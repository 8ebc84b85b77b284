"""S1-S4 — scrape source on canned HTML fixtures (never live LinkedIn,
SURVEY §5.2), plus the fused pipeline E2E (EP1 shape) with bronze/
silver checkpoints and the K4 empty-scrape no-write guard.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.plans.pipeline import run_pipeline
from dataengineer_job_scraper_etl_spark.sources.scrape import (
    DETAIL_URL_TEMPLATE,
    parse_job_cards,
    parse_job_description,
    scrape_postings,
    seed_frame,
)


def _card(jobid: int, title: str | None) -> str:
    h3 = (
        f'<h3 class="base-search-card__title">\n  {title}\n</h3>'
        if title is not None
        else ""
    )
    return (
        f'<div class="job-search-card" '
        f'data-entity-urn="urn:li:jobPosting:{jobid}">{h3}</div>'
    )


def _list_page(n_cards: int, titleless: set[int] = frozenset()) -> str:
    cards = "".join(
        _card(i, None if i in titleless else f"Data Engineer {i}")
        for i in range(n_cards)
    )
    return f"<html><body><ul>{cards}</ul></body></html>"


def _detail_page(jobid: str) -> str:
    return (
        "<html><body><div class='top'></div>"
        f'<div class="description__text description__text--rich">'
        f"We need <b>Python, Spark.</b> Job {jobid} pays £55K."
        "</div></body></html>"
    )


def test_parse_cards_limit_25():
    cards = parse_job_cards(_list_page(30))
    assert len(cards) == 25  # S4: first 25 only (main.py:97)
    assert cards[0] == {"jobid": "0", "title": "Data Engineer 0"}


def test_parse_cards_title_stripped_and_null_convention():
    cards = parse_job_cards(_list_page(3, titleless={1}))
    assert [c["title"] for c in cards] == [
        "Data Engineer 0",
        None,  # card kept with null title (reference main.py:101-102)
        "Data Engineer 2",
    ]
    assert [c["jobid"] for c in cards] == ["0", "1", "2"]


def test_parse_trailing_titleless_card():
    html = _list_page(1, titleless={0})
    assert parse_job_cards(html) == [{"jobid": "0", "title": None}]


def test_parse_description():
    text = parse_job_description(_detail_page("7"))
    assert text is not None and "Job 7" in text and "£55K" in text
    assert parse_job_description("<html><body>no desc</body></html>") is None


def _fixture_fetcher(n_cards=4, fail_details: set[str] = frozenset()):
    # NB: the fetcher runs inside Spark Python workers, which cannot
    # import this test module — capture everything by VALUE (strings /
    # sets), never by reference to module-level helpers.
    list_html = _list_page(n_cards)
    detail_template = (
        "<html><body>"
        '<div class="description__text description__text--rich">'
        "We need <b>Python, Spark.</b> Job {jobid} pays £55K."
        "</div></body></html>"
    )
    fail = frozenset(fail_details)

    def fetch(url: str) -> str | None:
        if "seeMoreJobPostings" in url:
            return list_html
        jobid = url.rsplit("/", 1)[-1]
        if jobid in fail:
            return None  # detail fetch exhausted retries -> null desc
        return detail_template.format(jobid=jobid)

    return fetch


def test_scrape_postings_offline(spark):
    seeds = seed_frame(spark, ["Data Engineer", "Data Scientist"])
    raw = scrape_postings(seeds, _fixture_fetcher(3), concurrency=2)
    rows = raw.collect()
    assert len(rows) == 6  # 3 cards x 2 titles
    assert {r["job_type"] for r in rows} == {"Data Engineer", "Data Scientist"}
    assert all(r["description"] and "Python, Spark." in r["description"] for r in rows)


def test_scrape_failed_detail_yields_null_description(spark):
    seeds = seed_frame(spark, ["Data Engineer"])
    raw = scrape_postings(seeds, _fixture_fetcher(3, fail_details={"1"}))
    by_id = {r["jobid"]: r["description"] for r in raw.collect()}
    assert by_id["1"] is None and by_id["0"] is not None


def test_scrape_failed_list_skips_title(spark):
    seeds = seed_frame(spark, ["Data Engineer"])
    raw = scrape_postings(seeds, lambda url: None)
    assert raw.count() == 0  # give-up -> skip title (main.py:124-125)


def test_pipeline_e2e(spark, tmp_path):
    silver_path = str(tmp_path / "silver")
    bronze_path = str(tmp_path / "bronze")
    result = run_pipeline(
        spark,
        ["Data Engineer"],
        _fixture_fetcher(4),
        phrases=["python", "spark", "airflow"],
        silver_path=silver_path,
        bronze_path=bronze_path,
        concurrency=1,
    )
    assert result.wrote_bronze and result.wrote_silver
    silver = spark.read.parquet(silver_path)
    assert set(silver.columns) == {
        "jobid", "job_type", "pay", "skills", "seniority", "date", "ingest_date",
    }
    rows = silver.collect()
    assert len(rows) == 4
    # pay extracted from the canned detail page; skills tokenize past
    # the punctuation; partition layout is real partition columns
    assert all(r["pay"] == 55000.0 for r in rows)
    assert all(r["skills"] == ["python", "spark"] for r in rows)
    assert (tmp_path / "silver" / "job_type=Data Engineer").exists()


def test_pipeline_empty_scrape_writes_nothing(spark, tmp_path):
    silver_path = str(tmp_path / "silver_empty")
    result = run_pipeline(
        spark,
        ["Data Engineer"],
        lambda url: None,  # every fetch fails
        phrases=["python"],
        silver_path=silver_path,
    )
    assert not result.wrote_silver  # K4 (main.py:129,189-190)
    assert not (tmp_path / "silver_empty").exists()


def test_detail_url_template_shape():
    assert DETAIL_URL_TEMPLATE.format(jobid="42").endswith("/jobPosting/42")


# --- retry/backoff politeness envelope (VERDICT r6 ask #8) -----------
# Network-free: fake transport (requests.get), fake clock (time.sleep),
# pinned RNG (random.uniform). Pins the reference's contract
# (main.py:120-125): <=5 attempts, randomized 2-12s sleep BETWEEN
# attempts only (none after the final failure), give-up returns None,
# non-200 and transport errors retried identically.


class _Resp:
    def __init__(self, status_code, text=""):
        self.status_code = status_code
        self.text = text


def _fake_env(monkeypatch, responses):
    """Install fakes; returns (calls, sleeps, uniform_bounds) logs.
    ``responses`` items are status codes or Exception instances."""
    import requests

    from dataengineer_job_scraper_etl_spark.sources import scrape

    calls, sleeps, bounds = [], [], []
    it = iter(responses)

    def fake_get(url, timeout):
        calls.append((url, timeout))
        r = next(it)
        if isinstance(r, Exception):
            raise r
        return _Resp(r, text=f"body-{len(calls)}")

    monkeypatch.setattr(requests, "get", fake_get)
    monkeypatch.setattr(scrape.time, "sleep", sleeps.append)
    monkeypatch.setattr(
        scrape.random,
        "uniform",
        lambda a, b: bounds.append((a, b)) or 7.25,
    )
    return calls, sleeps, bounds


def test_default_fetcher_gives_up_after_five_attempts(monkeypatch):
    import requests

    from dataengineer_job_scraper_etl_spark.sources.scrape import (
        default_fetcher,
    )

    calls, sleeps, bounds = _fake_env(
        monkeypatch,
        [500, 503, requests.RequestException("reset"), 500, 500],
    )
    assert default_fetcher()("http://x") is None
    assert len(calls) == 5  # <=5 attempts (main.py:79)
    # sleeps happen BETWEEN attempts only: 4 for 5 attempts, none
    # appended after the final failure before the give-up return
    assert sleeps == [7.25] * 4
    assert bounds == [(2.0, 12.0)] * 4  # the randomized 2-12s window


def test_default_fetcher_stops_on_first_success(monkeypatch):
    from dataengineer_job_scraper_etl_spark.sources.scrape import (
        default_fetcher,
    )

    calls, sleeps, _ = _fake_env(monkeypatch, [200, 500, 500])
    assert default_fetcher()("http://x") == "body-1"
    assert len(calls) == 1 and sleeps == []  # no sleep on success


def test_default_fetcher_recovers_mid_retry(monkeypatch):
    import requests

    from dataengineer_job_scraper_etl_spark.sources.scrape import (
        default_fetcher,
    )

    calls, sleeps, _ = _fake_env(
        monkeypatch, [requests.RequestException("timeout"), 404, 200]
    )
    assert default_fetcher()("http://x") == "body-3"
    assert len(calls) == 3
    assert sleeps == [7.25] * 2  # one backoff per failed attempt

def test_default_fetcher_custom_envelope(monkeypatch):
    from dataengineer_job_scraper_etl_spark.sources.scrape import (
        default_fetcher,
    )

    calls, sleeps, bounds = _fake_env(monkeypatch, [500, 500])
    assert default_fetcher(retries=2, backoff=(0.5, 1.5))("u") is None
    assert len(calls) == 2
    assert sleeps == [7.25] and bounds == [(0.5, 1.5)]
