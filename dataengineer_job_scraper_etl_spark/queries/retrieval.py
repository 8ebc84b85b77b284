"""Hybrid retrieval with reciprocal-rank fusion over ``documents`` +
``embeddings`` (LLM-curation extension, SURVEY §2.10/§2.19).

Production corpus-curation search is hybrid: a lexical ranker (BM25)
and a dense ranker (embedding cosine) each produce a bounded top-DEPTH
list, fused by reciprocal-rank fusion (Cormack et al. 2009):

    rrf(d) = sum over lists of 1 / (K + rank_in_list(d)),  K = 60

with absent-from-list contributing 0. RRF is THE standard fusion in
retrieval-backed dataset curation (and in every hybrid search engine)
because it needs no score calibration between rankers — only ranks.

The engine composes two already-oracle-checked components: the BM25
index/scorer (operators/ranking.py, entry text_bm25_ranking) and the
brute-force cosine ranker (queries/vectors.py, entry vec_cosine_topk);
documents and embeddings align on doc_id == vec_id (TESTDATA.md).

Scale shape (the 100 TB story): each ranker reduces the corpus to a
DEPTH-row list via orderBy().limit() — Spark plans TakeOrdered, a
per-partition partial top-k plus a DEPTH-row merge, never a global
sort. Rank assignment and the fusion join then run on two DEPTH-row
frames — driver-trivial at any corpus size. The dense side broadcasts
one query vector; at production scale it swaps for the IVF/OPQ index
(operators/similarity.py) with identical downstream fusion — the
bounded-list interface is exactly why RRF composes with ANN.

Determinism: ranks are assigned over the ppm-QUANTIZED scores (ties
broken by id), so rank order is hash-stable across engines; the RRF
arithmetic is IEEE division of small integers (exact-rounded,
engine-independent) summed over two terms, then ppm-floored.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.catalog import register
from dataengineer_job_scraper_etl_spark.queries.text import (
    _BM25_B,
    _BM25_K1,
    BM25_QUERY_TERMS,
    _bm25_oracle_sql,
)

RRF_K = 60
DEPTH = 50  # per-ranker candidate-list length
TOP_N = 20  # fused rows returned
QUERY_VEC_ID = 0  # the dense query: embeddings row vec_id = 0


def _rrf_oracle_sql() -> str:
    bm25 = _bm25_oracle_sql(BM25_QUERY_TERMS, _BM25_K1, _BM25_B)
    return f"""
WITH bm_ranked AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY bm25_ppm DESC, doc_id ASC) AS INT)
           AS rank_bm25
  FROM ({bm25}) bm
  ORDER BY rank_bm25 LIMIT {DEPTH}),
qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings
       WHERE vec_id = {QUERY_VEC_ID}),
vec_scored AS (
  SELECT e.vec_id AS doc_id,
         CAST(round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), qv.qe)
                    * 1e6) AS BIGINT) AS cos_ppm
  FROM embeddings e CROSS JOIN qv
  WHERE e.vec_id <> {QUERY_VEC_ID}),
vec_ranked AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY cos_ppm DESC, doc_id ASC) AS INT)
           AS rank_vec
  FROM vec_scored
  ORDER BY rank_vec LIMIT {DEPTH}),
fused AS (
  SELECT coalesce(b.doc_id, v.doc_id) AS doc_id,
         coalesce(b.rank_bm25, 0) AS rank_bm25,
         coalesce(v.rank_vec, 0) AS rank_vec,
         (CASE WHEN b.rank_bm25 IS NOT NULL
               THEN 1.0 / ({RRF_K} + b.rank_bm25) ELSE 0.0 END)
         + (CASE WHEN v.rank_vec IS NOT NULL
                 THEN 1.0 / ({RRF_K} + v.rank_vec) ELSE 0.0 END) AS rrf
  FROM bm_ranked b FULL OUTER JOIN vec_ranked v ON v.doc_id = b.doc_id)
SELECT doc_id, rank_bm25, rank_vec,
       CAST(round(rrf * 1e6) AS BIGINT) AS rrf_ppm,
       CAST(row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS INT)
         AS fused_rank
FROM fused
ORDER BY fused_rank LIMIT {TOP_N}
"""


def _ranked_topk(scored: DataFrame, score_col: str, rank_name: str) -> DataFrame:
    """Bounded top-DEPTH list with deterministic ranks: TakeOrdered
    (orderBy + limit — per-partition partial top-k, no global sort)
    reduces to DEPTH rows, then row_number runs on the tiny frame.
    The window's constant partition key makes the single-task
    collapse EXPLICIT and bounded: the frame is <= DEPTH rows by
    construction (post-limit), so this is the constant-bounded
    exception to the no-unpartitioned-window rule (the
    operators/prefix.py offsets-pass argument, with DEPTH standing in
    for the partition count)."""
    top = scored.orderBy(F.desc(score_col), F.asc("doc_id")).limit(DEPTH)
    w = Window.partitionBy(F.lit(0)).orderBy(
        F.desc(score_col), F.asc("doc_id")
    )
    return top.select(
        "doc_id", F.row_number().over(w).cast("int").alias(rank_name)
    )


@register(
    "retrieval_hybrid_rrf",
    _rrf_oracle_sql(),
    doc="Hybrid lexical+dense retrieval fused by reciprocal-rank "
    "fusion (K=60): BM25 top-50 (operators/ranking.py index) and "
    "cosine top-50 vs the vec_id=0 query embedding, each reduced via "
    "TakeOrdered and ranked on ppm-quantized scores, full-outer-joined "
    "and scored 1/(K+rank) per list (absent = 0). Returns the fused "
    "top-20 with both source ranks — the standard no-calibration "
    "fusion for retrieval-backed corpus curation.",
)
def retrieval_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataengineer_job_scraper_etl_spark.functions.vector_math import cosine
    from dataengineer_job_scraper_etl_spark.operators.ranking import bm25_scores

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    bm = bm25_scores(docs, BM25_QUERY_TERMS, k1=_BM25_K1, b=_BM25_B).select(
        "doc_id",
        F.round(F.col("bm25") * 1e6, 0).cast("bigint").alias("bm25_ppm"),
    )
    bm_ranked = _ranked_topk(bm, "bm25_ppm", "rank_bm25")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qe")
    )
    qe = F.transform(F.col("qe"), lambda x: x.cast("double"))
    ee = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    vec_scored = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(ee, qe) * 1e6, 0).cast("bigint").alias("cos_ppm"),
        )
    )
    vec_ranked = _ranked_topk(vec_scored, "cos_ppm", "rank_vec")

    rb, rv = F.col("rank_bm25"), F.col("rank_vec")
    fused = (
        bm_ranked.join(vec_ranked, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce(rb, F.lit(0)).alias("rank_bm25"),
            F.coalesce(rv, F.lit(0)).alias("rank_vec"),
            (
                F.when(rb.isNotNull(), F.lit(1.0) / (F.lit(RRF_K) + rb))
                .otherwise(F.lit(0.0))
                + F.when(rv.isNotNull(), F.lit(1.0) / (F.lit(RRF_K) + rv))
                .otherwise(F.lit(0.0))
            ).alias("rrf"),
        )
    )
    # fused is <= 2*DEPTH rows (union of two bounded lists) — the same
    # constant-bounded single-task window as _ranked_topk.
    w = Window.partitionBy(F.lit(0)).orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.select(
            "doc_id",
            "rank_bm25",
            "rank_vec",
            F.round(F.col("rrf") * 1e6, 0).cast("bigint").alias("rrf_ppm"),
            F.row_number().over(w).cast("int").alias("fused_rank"),
        )
        .orderBy("fused_rank")
        .limit(TOP_N)
    )
