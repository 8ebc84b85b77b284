"""Graded IR eval harness (queries/ireval.py) + the MRL dimension
ladder (queries/annladder.py): metric arithmetic falsifiability,
entry-level contracts, and the determinism devices the oracle parity
rests on."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.queries.ireval import (
    DISCOUNT_PPB,
    GOLD_DEPTH,
    IDCG_PPB,
    SYS_K,
    graded_metrics,
    mlt_bm25_scores,
)


def test_discount_and_idcg_constants():
    # 1/log2(r+1) in ppb: rank 1 is exactly 1e9, strictly decreasing
    assert DISCOUNT_PPB[0] == 1_000_000_000
    assert all(
        a > b for a, b in zip(DISCOUNT_PPB, DISCOUNT_PPB[1:])
    )
    assert len(DISCOUNT_PPB) == SYS_K == 10
    # ideal gain vector of the fixed gold multiset: 7 x5 then 3 x5
    manual = sum(7 * d for d in DISCOUNT_PPB[:5]) + sum(
        3 * d for d in DISCOUNT_PPB[5:]
    )
    assert IDCG_PPB == manual
    # each constant is the correctly-rounded ppb of 1/log2(r+1)
    for r, d in enumerate(DISCOUNT_PPB, start=1):
        assert d == round(1e9 / math.log2(r + 1))


def _judged(spark, rels):
    rows = [(0, r + 1, rel) for r, rel in enumerate(rels)]
    return spark.createDataFrame(rows, "qid long, rnk int, rel int")


def test_graded_metrics_perfect_ranking_is_ppm_one(spark):
    # system returns the ideal ordering of the gold grade multiset
    m = graded_metrics(
        _judged(spark, [3, 3, 3, 3, 3, 2, 2, 2, 2, 2])
    ).collect()[0]
    assert m.ndcg10_ppm == 1_000_000
    assert m.mrr_ppm == 1_000_000
    assert m.hits_at10 == 10
    assert m.dcg_ppb == IDCG_PPB


def test_graded_metrics_no_relevant_is_zero(spark):
    m = graded_metrics(_judged(spark, [0] * 10)).collect()[0]
    assert m.ndcg10_ppm == 0
    assert m.mrr_ppm == 0
    assert m.hits_at10 == 0
    assert m.dcg_ppb == 0


def test_graded_metrics_rank_position_matters(spark):
    # the SAME grade multiset scores strictly lower when the top
    # grade sinks: {3 at rank 1} vs {3 at rank 10} with rest 0
    top = graded_metrics(_judged(spark, [3] + [0] * 9)).collect()[0]
    bottom = graded_metrics(_judged(spark, [0] * 9 + [3])).collect()[0]
    assert top.ndcg10_ppm > bottom.ndcg10_ppm
    assert top.mrr_ppm == 1_000_000
    assert bottom.mrr_ppm == 100_000  # 1e6 / 10
    assert top.hits_at10 == bottom.hits_at10 == 1


def test_mlt_excludes_the_query_doc_and_scores_positive(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    s = mlt_bm25_scores(docs)
    assert s.filter(F.col("qid") == F.col("doc_id")).count() == 0
    assert s.filter(F.col("score_ppb") <= 0).count() == 0


def test_entry_surface_and_bounds(spark, sf_dir):
    from dataengineer_job_scraper_etl_spark.catalog import all_queries

    rows = {
        r.qid: r
        for r in all_queries()["retrieval_mlt_eval_metrics"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    assert sorted(rows) == [0, 1, 2, 3, 4]
    for r in rows.values():
        assert 0 <= r.ndcg10_ppm <= 1_000_000
        assert r.mrr_ppm == 0 or 100_000 <= r.mrr_ppm <= 1_000_000
        assert 0 <= r.hits_at10 <= SYS_K
        assert 0 <= r.dcg_ppb <= IDCG_PPB
        # hits bound the achievable DCG: each hit contributes at most
        # gain 7 x discount(1)
        assert r.dcg_ppb <= r.hits_at10 * 7 * DISCOUNT_PPB[0]
    # gold pool depth is what the grading assumed
    assert GOLD_DEPTH == 20


def test_dim_ladder_full_rung_is_self_check(spark, sf_dir):
    from dataengineer_job_scraper_etl_spark.catalog import all_queries
    from dataengineer_job_scraper_etl_spark.queries.annladder import (
        DIM_LADDER,
    )

    out = (
        all_queries()["ann_dim_truncation_tradeoff"]
        .spark_fn(spark, sf_dir)
        .collect()
    )
    assert len(out) == len(DIM_LADDER) * 5
    by_dim = {}
    for r in out:
        assert 0 <= r.hits <= 10
        assert r.recall_ppm == r.hits * 100_000
        by_dim.setdefault(r.dim, []).append(r.hits)
    # the untruncated rung IS the gold: recall is 1.0 by identity
    assert by_dim[DIM_LADDER[-1]] == [10] * 5
