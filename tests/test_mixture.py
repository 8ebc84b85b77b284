"""Training-mixture construction: deterministic source-weighted
sampling (queries/sampling.py). Pins the three properties that matter
for reproducible data mixtures: realized proportions track the target,
runs are bit-deterministic, and threshold samples are NESTED (raising
a rate adds rows, never swaps them — ablations stay comparable)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.queries.sampling import (
    deterministic_source_sample,
    mixture_rates,
)


def _corpus(spark):
    rows = (
        [(i, "web") for i in range(1000)]
        + [(10_000 + i, "books") for i in range(500)]
        + [(20_000 + i, "code") for i in range(100)]
    )
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_mixture_rates_scarcest_source_limits_total():
    rates = mixture_rates(
        {"web": 1000, "books": 500, "code": 100},
        {"web": 0.5, "books": 0.3, "code": 0.2},
    )
    # code is scarcest: 100/0.2 = 500 total -> code kept whole
    assert rates["code"] == 1.0
    assert rates["web"] == pytest.approx(0.25)
    assert rates["books"] == pytest.approx(0.3)
    with pytest.raises(ValueError):
        mixture_rates({"web": 10}, {"web": 0.5, "missing": 0.5})


def test_mixture_sample_proportions_and_determinism(spark):
    df = _corpus(spark)
    weights = {"web": 0.5, "books": 0.3, "code": 0.2}
    counts = {
        r["source"]: r["n"]
        for r in df.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    rates = mixture_rates(counts, weights)
    sampled = deterministic_source_sample(df, rates)
    got = {
        r["source"]: r["n"]
        for r in sampled.groupBy("source").agg(
            F.count("*").alias("n")
        ).collect()
    }
    assert got["code"] == 100  # scarcest source kept whole
    # realized proportions track the target (hash sampling is
    # approximate; 10% relative slack on a 500-row target)
    total = sum(got.values())
    for s, w in weights.items():
        assert got[s] / total == pytest.approx(w, rel=0.15)
    # bit-determinism: same input -> same membership
    again = {
        r["doc_id"] for r in deterministic_source_sample(df, rates).collect()
    }
    assert again == {r["doc_id"] for r in sampled.collect()}


def test_downsampled_source_fills_all_splits(spark):
    """Regression for the correlated-hash bug: the sampler bucket must
    be independent of hash_split's digit, so a source downsampled at
    rate <= 0.75 still lands in train AND val AND test (with digits
    1-4 as the bucket, bucket < 0.5*65536 forced hex digit 1 < '8'
    and val/test came out EMPTY)."""
    from dataengineer_job_scraper_etl_spark.queries.sampling import hash_split

    df = _corpus(spark).filter(F.col("source") == "web")
    sampled = deterministic_source_sample(df, {"web": 0.5})
    got = {
        r["split"]
        for r in hash_split(sampled, "doc_id").select("split").collect()
    }
    assert got == {"train", "val", "test"}


def test_mixture_samples_are_nested(spark):
    """Threshold sampling: a lower-rate sample is a SUBSET of any
    higher-rate sample of the same source — rerunning with a bigger
    budget only adds rows."""
    df = _corpus(spark).filter(F.col("source") == "web")
    small = {
        r["doc_id"]
        for r in deterministic_source_sample(df, {"web": 0.2}).collect()
    }
    big = {
        r["doc_id"]
        for r in deterministic_source_sample(df, {"web": 0.6}).collect()
    }
    assert small < big  # strict subset: nested and actually larger


def test_select_by_token_budget_greedy_semantics(spark):
    """Budget selection: quality-descending prefix per source, ties by
    id, and the doc that CROSSES the budget line is kept (budgets met,
    not undershot)."""
    from dataengineer_job_scraper_etl_spark.queries.sampling import (
        select_by_token_budget,
    )

    rows = [
        # (doc_id, source, n_toks, quality_millionths)
        (1, "a", 40, 900), (2, "a", 50, 800), (3, "a", 30, 700),
        (4, "a", 10, 600),
        (5, "b", 100, 100), (6, "b", 100, 100),  # tie -> id order
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, n_toks long, quality_millionths long"
    )
    got = {
        r["doc_id"]
        for r in select_by_token_budget(df, 100).collect()
    }
    # source a: 40 (off 0) + 50 (off 40) + 30 (off 90 < 100, crosses)
    # -> 1,2,3 kept, 4 dropped (off 120). source b: 5 (off 0), 6 (off
    # 100, NOT < 100) -> only 5.
    assert got == {1, 2, 3, 5}


def test_es_weighted_sample_semantics(spark):
    from dataengineer_job_scraper_etl_spark.queries.sampling import (
        weighted_sample_without_replacement,
    )

    df = spark.createDataFrame(
        [(i, float(1 + i % 7)) for i in range(200)],
        "doc_id long, w double",
    )
    # k >= n returns everything
    assert (
        weighted_sample_without_replacement(df, 500, "w").count() == 200
    )
    # bit-deterministic across runs
    a = sorted(
        r["doc_id"]
        for r in weighted_sample_without_replacement(df, 40, "w").collect()
    )
    b = sorted(
        r["doc_id"]
        for r in weighted_sample_without_replacement(df, 40, "w").collect()
    )
    assert a == b
    # same hashed u (same key col value), higher weight must win:
    # key = ln(u)/w is monotone increasing in w for ln(u) < 0
    pair = spark.createDataFrame(
        [(7, 1.0, "lo"), (7, 100.0, "hi")], "doc_id long, w double, tag string"
    )
    top = weighted_sample_without_replacement(pair, 1, "w").collect()[0]
    assert top["tag"] == "hi"


def test_dsir_scores_target_like_docs_higher(spark):
    from dataengineer_job_scraper_etl_spark.queries.sampling import (
        dsir_importance_topk,
    )

    # target (src0) speaks vocab A; the raw pool speaks vocab B; one
    # pool doc (id 100) speaks vocab A and must out-score every B doc.
    rows = [(i, "src0", "alpha beta gamma delta") for i in range(10)]
    rows += [(100, "pool", "alpha beta gamma delta")]
    rows += [
        (200 + i, "pool", "omega sigma tau rho") for i in range(10)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = dsir_importance_topk(
        docs, F.col("source") == "src0", k=21
    ).collect()
    scores = {r["doc_id"]: r["imp_score"] for r in out}
    assert len(scores) == 21
    b_scores = [scores[200 + i] for i in range(10)]
    assert all(scores[100] > s for s in b_scores)
    # A-speakers (target and the planted pool doc) share one score
    assert scores[100] == scores[0]


def test_temperature_weights_endpoints_and_monotonicity():
    from dataengineer_job_scraper_etl_spark.queries.sampling import (
        mixture_rates,
        mixture_weights_temperature,
    )

    counts = {"web": 8000, "books": 1500, "code": 500}
    # alpha=1: natural shares
    w1 = mixture_weights_temperature(counts, 1.0)
    assert abs(w1["web"] - 0.8) < 1e-12
    # alpha=0: uniform
    w0 = mixture_weights_temperature(counts, 0.0)
    assert all(abs(v - 1 / 3) < 1e-12 for v in w0.values())
    # cooling monotonically boosts the smallest source's share
    shares = [
        mixture_weights_temperature(counts, a)["code"]
        for a in (1.0, 0.7, 0.4, 0.0)
    ]
    assert shares == sorted(shares)
    # weights always sum to 1 and compose with mixture_rates
    for a in (0.0, 0.3, 0.7, 1.0):
        w = mixture_weights_temperature(counts, a)
        assert abs(sum(w.values()) - 1.0) < 1e-12
        rates = mixture_rates(counts, w)
        assert all(0 < r <= 1 for r in rates.values())
    # alpha=1 keeps every source whole (natural mixture = no-op)
    r1 = mixture_rates(counts, w1)
    assert all(abs(r - 1.0) < 1e-12 for r in r1.values())
