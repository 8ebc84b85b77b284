"""BM25 differential test: the JVM plan must reproduce a pure-Python
BM25 over the same tokenization to float precision, and the plan must
stay JVM-only with the corpus never broadcast."""

from __future__ import annotations

import math
import re

import pytest

from dataengineer_job_scraper_etl_spark.operators.ranking import bm25_scores

DOCS = [
    (1, "spark streaming joins and spark sql"),
    (2, "python pandas and  numpy   arrays"),
    (3, "spark python interop via arrow"),
    (4, "the quick brown fox"),
    (5, "SPARK Spark spark"),  # tf saturation case
    (6, ""),
]


def _tokens(text: str) -> list[str]:
    return re.sub(r"\s+", " ", text.lower()).strip().split(" ")


def _ref_bm25(query: list[str], k1=1.2, b=0.75) -> dict[int, float]:
    toks = {i: _tokens(t) for i, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(t) for t in toks.values()) / n
    out: dict[int, float] = {}
    for term in sorted(set(q.lower() for q in query)):
        df = sum(1 for t in toks.values() if term in t)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for i, t in toks.items():
            tf = t.count(term)
            if tf == 0:
                continue
            dl = len(t)
            s = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
            out[i] = out.get(i, 0.0) + s
    return out


def test_bm25_matches_python_reference(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(docs, ["spark", "python", "Missing"]).collect()
    }
    expected = _ref_bm25(["spark", "python", "missing"])
    assert set(got) == set(expected)
    for i in expected:
        assert got[i] == pytest.approx(expected[i], rel=1e-9)
    # tf saturation: doc 5 is all 'spark' but must not dominate
    # unboundedly — its score stays within (k1+1) x idf
    assert got[5] < 2.2 * math.log(1 + (6 - 3 + 0.5) / (3 + 0.5))


def test_bm25_plan_is_jvm_only_and_corpus_not_broadcast(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    df = bm25_scores(docs, ["spark", "python"])
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "PythonUDF" not in plan and "MapInPandas" not in plan
    # the ONLY broadcast is the 1-row stats frame; the corpus side
    # carries no broadcast hint from us
    assert plan.count("strategy=broadcast") == 1


def test_bm25_tokenizes_corpus_once(spark, tmp_path):
    """The 100 TB contract: ONE scan+tokenize of the text column per
    scoring run. The serve plan must read the materialized per-doc
    index (LogicalRDD), with zero tokenize expressions and zero file
    scans left in it — round 4's lazy branches re-tokenized the corpus
    for lengths, tf, and stats separately."""
    path = str(tmp_path / "docs")
    spark.createDataFrame(DOCS, "doc_id long, text string").write.parquet(path)
    df = bm25_scores(spark.read.parquet(path), ["spark", "python"])
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "regexp_replace" not in optimized  # tokenize not in serve plan
    assert "Relation" not in optimized or "parquet" not in optimized
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in executed  # text read only at index build
    assert executed.count("ExistingRDD") >= 1
    # and the result is still right end-to-end from the parquet source
    got = {r["doc_id"]: r["bm25"] for r in df.collect()}
    expected = _ref_bm25(["spark", "python"])
    for i in expected:
        assert got[i] == pytest.approx(expected[i], rel=1e-9)
