"""Planted-fixture semantics for the Gopher structural quality rules
(queries/gopher.py); cross-engine hash parity is the driver's job."""

from __future__ import annotations

from dataengineer_job_scraper_etl_spark.catalog import all_queries


def _fixture(spark, base, rows):
    docs = spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(f"{base}/documents.parquet")
    return str(base)


def test_gopher_rules_classify_planted_docs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("gopher")
    sixty = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(20))
    rows = [
        # id 1: 25 words -> word-count rule fails (and %2==1: no
        # stopword seed either)
        (1, " ".join(f"w{i}" for i in range(25))),
        # id 2: 60 clean words; %2==0 seeds the stopword sentence; no
        # bullet/ellipsis/symbol seeds (%3,%5,%7,%11 != 0) -> keep
        (2, sixty),
        # id 3: %3==0 seeds bullet lines -> bullet fraction fails
        (3, sixty),
    ]
    out = {
        r.doc_id: r
        for r in all_queries()["docs_gopher_quality_rules"]
        .spark_fn(spark, _fixture(spark, base, rows))
        .collect()
    }
    assert out[1].keep == 0 and out[1].n_words < 50
    assert out[2].keep == 1 and out[2].n_stopwords >= 2
    assert out[3].keep == 0 and out[3].bullet_line_ppm > 100_000
    # metrics are integer-exact ppm
    assert all(isinstance(out[i].mean_wlen_ppm, int) for i in out)
