"""Global boilerplate-span removal (queries/spans.py): planted
boilerplate must be stripped from every doc, rare spans must survive,
ordering and counts must be exact."""

from __future__ import annotations

from dataengineer_job_scraper_etl_spark.queries.spans import (
    remove_boilerplate_spans,
    span_array,
)
from pyspark.sql import functions as F


def test_span_array_chunks_in_order(spark):
    df = spark.createDataFrame([("a b c d e",)], "text string")
    got = df.select(
        span_array(F.split(F.col("text"), " ")).alias("s")
    ).collect()[0]["s"]
    assert got == ["a b", "c d", "e"]  # last span short, order kept


def test_planted_boilerplate_stripped_everywhere(spark):
    # "cookie banner" span in 8/10 docs (DF 80% >= 20%); the unique
    # payload spans differ per doc and must survive in order.
    rows = []
    for i in range(10):
        payload = f"u{i}a u{i}b u{i}c u{i}d"
        text = (
            f"cookie banner {payload}" if i < 8 else payload
        )
        rows.append((i, text))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_spans(docs).collect()
    }
    assert len(out) == 10
    for i in range(10):
        r = out[i]
        assert r["cleaned"] == f"u{i}a u{i}b u{i}c u{i}d"
        assert r["n_kept"] == 2
        assert r["n_spans"] == (3 if i < 8 else 2)


def test_all_boilerplate_doc_becomes_empty(spark):
    rows = [(i, "nav bar") for i in range(5)] + [(5, "real content here x")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in remove_boilerplate_spans(docs).collect()}
    for i in range(5):
        assert out[i]["cleaned"] == ""
        assert out[i]["n_kept"] == 0
        assert out[i]["n_spans"] == 1
    assert out[5]["cleaned"] == "real content here x"


def test_below_threshold_spans_survive(spark):
    # span in 1/10 docs (10% < 20%): not boilerplate
    rows = [(0, "rare pair w0 w1")] + [
        (i, f"x{i} y{i} z{i} q{i}") for i in range(1, 10)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in remove_boilerplate_spans(docs).collect()}
    assert out[0]["cleaned"] == "rare pair w0 w1"
