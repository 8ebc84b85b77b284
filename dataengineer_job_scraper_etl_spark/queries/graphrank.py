"""kNN-graph PageRank centrality over ``embeddings`` (LLM-curation
extension, SURVEY §2.10/§2.19) — graph-based representativeness
scoring for data selection, and the catalog's canonical ITERATIVE
JOIN workload.

Curation pipelines use graph centrality over a similarity graph to
pick representative documents (and, inverted, to find isolated
outliers): build the k-nearest-neighbor graph over the embedding
space, run PageRank, sample by centrality. The engine's rendering is
hash-checked end to end with the trajectory-contract device the
k-means / PCA / logistic-regression entries established — here taken
one step FURTHER, to INTEGER FIXED-POINT: ranks are ppm BIGINTs and
every operation is integer (r DIV K edge shares, (85*x) DIV 100
damping), so iterates are order-independent BY CONSTRUCTION and both
engines replay the whole 8-step trajectory bit-identically (one CTE
per iteration, like the logreg oracle). Measured reason for the
fixed-point choice: the first cut quantized DOUBLE iterates with the
half-up rule and 6 of 500 nodes flipped by exactly 1 ppm —
grid-quantized addends summed in different orders land within an ulp
of a floor boundary; per-iterate quantization absorbs drift in ONE
corpus-sum per step (the logreg case) but not drift INSIDE a sum
whose addends are themselves quantized. Fixed-point is how
production makes iterative graph algorithms reproducible across
partitionings; the floored mass (<= K-1 ppm per node per step) is
documented, deterministic leakage, not model error.

Graph: nodes are the ``vec_id < 500`` slice (the
vec_neardup_cosine_pairs bounding precedent — constant across sfs, so
N is a literal in both texts); directed edges are each node's top-5
cosine neighbors (ppm-quantized scores, id tiebreaks — the
hash-stable ranking rule of ann_recall_sq8). Every node has
out-degree exactly 5, so there are no dangling nodes and the Google
matrix needs no dangling patch; in-degree varies — that variance IS
the centrality signal.

Scale shape (the 100 TB story): one corpus pass scores pairs (at real
scale the kNN edges come from the IVF/OPQ index — the bounded-list
interface again), then each PageRank step is ONE edge-keyed shuffle
join + a node-keyed aggregate — the aggregateMessages shape every
distributed graph engine reduces to. Each iterate is
localCheckpoint'ed: iterative self-joins otherwise double the logical
plan per step (2^8 leaf scans by step 8 — the classic iterative-Spark
trap; the checkpoint truncates lineage so step T+1 plans against T's
MATERIALIZED ranks, constant-size plans forever).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.catalog import register

N_NODES = 500  # vec_id < 500 — constant at every sf (min fixture size)
KNN_K = 5
PR_ITER = 8
_Q = 1_000_000
_R0_PPM = _Q // N_NODES  # 2000 — exact
_BASE_PPM = 150_000 // N_NODES  # 0.15 * 1e6 / N = 300 — exact
_DAMP_NUM, _DAMP_DEN = 85, 100  # d = 0.85 as an integer ratio


def _pagerank_oracle() -> str:
    # r0 = 1e6/N ppm for every node; step t (ALL integer ops):
    #   r = BASE_PPM + (85 * sum of in-neighbor (r // K)) // 100
    # Out-degree is exactly K for every node, so r // K is each
    # neighbor's edge share.
    steps = []
    for t in range(1, PR_ITER + 1):
        steps.append(f"""r{t} AS (
  SELECT n.vec_id,
         CAST({_BASE_PPM} + ({_DAMP_NUM} * coalesce(c.contrib, 0))
              // {_DAMP_DEN} AS BIGINT) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS vec_id, CAST(sum(p.r // {KNN_K}) AS BIGINT) AS contrib
    FROM edges e JOIN r{t - 1} p ON p.vec_id = e.src
    GROUP BY e.dst) c USING (vec_id))""")
    chain = ",\n".join(steps)
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
           FROM embeddings WHERE vec_id < {N_NODES}),
nodes AS (SELECT vec_id FROM v),
scored AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         CAST(round(list_cosine_similarity(a.e, b.e) * 1e6) AS BIGINT)
           AS cos_ppm
  FROM v a JOIN v b ON a.vec_id <> b.vec_id),
edges AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src
                              ORDER BY cos_ppm DESC, dst ASC) AS rn
    FROM scored) WHERE rn <= {KNN_K}),
r0 AS (SELECT vec_id, CAST({_R0_PPM} AS BIGINT) AS r FROM nodes),
{chain}
SELECT vec_id, CAST(r AS BIGINT) AS rank_ppm
FROM r{PR_ITER}
"""


@register(
    "vec_knn_pagerank_centrality",
    _pagerank_oracle(),
    doc="Graph-based representativeness scoring: PageRank (d=0.85, 8 "
    "iterations) over the directed top-5 cosine kNN graph of the "
    "vec_id<500 embedding slice, in INTEGER FIXED-POINT (ppm bigint "
    "ranks, r DIV K edge shares, (85*x) DIV 100 damping) so the "
    "iterates are summation-order-independent by construction and "
    "the oracle replays the full trajectory (one CTE per step — the "
    "k-means/PCA/logreg contract applied to the canonical "
    "iterative-join workload). Each step is one edge-keyed shuffle "
    "join + node aggregate, iterates localCheckpoint'ed to stop the "
    "2^T lineage blow-up. High centrality = representative cluster "
    "cores; low = isolated outliers — both ends are curation signals.",
)
def vec_knn_pagerank_centrality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from dataengineer_job_scraper_etl_spark.functions.vector_math import cosine
    from dataengineer_job_scraper_etl_spark.operators.topk import grouped_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < N_NODES
    )
    ed = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    v = emb.select("vec_id", ed.alias("e")).localCheckpoint(eager=False)
    nodes = v.select("vec_id")

    a = v.select(F.col("vec_id").alias("src"), F.col("e").alias("ea"))
    b = v.select(F.col("vec_id").alias("dst"), F.col("e").alias("eb"))
    scored = (
        a.join(b, F.col("src") != F.col("dst"))
        .select(
            "src",
            "dst",
            F.round(cosine(F.col("ea"), F.col("eb")) * 1e6, 0)
            .cast("bigint")
            .alias("cos_ppm"),
        )
    )
    edges = grouped_topk(
        scored, ["src"], [F.desc("cos_ppm"), F.asc("dst")], KNN_K
    ).select("src", "dst").localCheckpoint(eager=False)

    ranks = nodes.select(
        "vec_id", F.lit(_R0_PPM).cast("bigint").alias("r")
    )
    for _ in range(PR_ITER):
        contrib = (
            edges.join(
                ranks.select(F.col("vec_id").alias("src"), "r"), "src"
            )
            .groupBy(F.col("dst").alias("vec_id"))
            .agg(
                F.sum(F.expr(f"r DIV {KNN_K}")).cast("bigint").alias("contrib")
            )
        )
        ranks = (
            nodes.join(contrib, "vec_id", "left")
            .select(
                "vec_id",
                (
                    F.lit(_BASE_PPM)
                    + F.expr(
                        f"({_DAMP_NUM} * coalesce(contrib, 0))"
                        f" DIV {_DAMP_DEN}"
                    )
                )
                .cast("bigint")
                .alias("r"),
            )
            # truncate lineage: step T+1 plans against T's materialized
            # ranks, not the whole join tree since r0
            .localCheckpoint(eager=False)
        )
    return ranks.select("vec_id", F.col("r").cast("bigint").alias("rank_ppm"))
