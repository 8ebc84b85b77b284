"""Approximate nearest-neighbor search over embedding columns (north
star, SURVEY §2.10).

Three tiers, trading recall for scan cost:

1. ``brute_force_topk`` — exact cosine top-k; the correctness baseline
   (oracle-checked variant in queries/vectors.py). At 100 TB this is a
   full corpus scan per query batch: fine for offline eval, wrong for
   serving.
2. ``rhp_lsh_topk`` — random-hyperplane LSH: project each vector onto
   ``n_bits`` fixed hyperplanes -> sign bits -> bucket id. Queries only
   score vectors sharing a bucket (optionally multi-probe over
   neighboring buckets). The hyperplanes are deterministic literals
   (seeded), so the plan is reproducible; the only shuffle is the
   bucket equi-join.
3. ``ivf_topk`` — IVF coarse quantizer: k-means-lite centroids
   (deterministic seeded init + ``n_iter`` Lloyd rounds, all DataFrame
   ops), assign corpus to nearest centroid, probe ``n_probe`` nearest
   lists per query. Centroid table is tiny -> broadcast everywhere.

No Python in the scoring path: dot products / norms are zip_with +
aggregate built-ins.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.functions.vector_math import cosine, dot
from dataengineer_job_scraper_etl_spark.operators.topk import grouped_topk


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qe",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k of corpus rows per query row (queries small,
    broadcast)."""
    scored = (
        F.broadcast(queries)
        .crossJoin(corpus)
        .select(
            F.col(qid_col),
            F.col(id_col),
            cosine(_as_double(F.col(qvec_col)), _as_double(F.col(vec_col))).alias(
                "cos_sim"
            ),
        )
    )
    return grouped_topk(
        scored, [qid_col], [F.desc("cos_sim"), F.asc(id_col)], k
    )


def _hyperplanes(dim: int, n_bits: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_bits)
    ]


def rhp_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id for one vector against fixed hyperplanes."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        proj = dot(vec, F.array(*[F.lit(p) for p in plane]))
        bit = F.when(
            proj >= 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseXOR(bit)
    return bucket


def rhp_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qe",
    k: int = 10,
    n_bits: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane LSH ANN: candidates = bucket collisions in any
    of ``n_tables`` independent tables, then exact rerank of candidates
    only. Shuffles (table_id, bucket) keys — corpus vectors are hashed
    in place, never all-pairs-joined."""
    c_tabs, q_tabs = [], []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_bits, seed + 1000 * t)
        c_tabs.append(
            corpus.select(
                F.col(id_col),
                F.col(vec_col),
                F.lit(t).alias("tab"),
                rhp_bucket(_as_double(F.col(vec_col)), planes).alias("bucket"),
            )
        )
        q_tabs.append(
            queries.select(
                F.col(qid_col),
                F.col(qvec_col),
                F.lit(t).alias("tab"),
                rhp_bucket(_as_double(F.col(qvec_col)), planes).alias("bucket"),
            )
        )
    c_all = c_tabs[0]
    for x in c_tabs[1:]:
        c_all = c_all.unionByName(x)
    q_all = q_tabs[0]
    for x in q_tabs[1:]:
        q_all = q_all.unionByName(x)

    cand = (
        c_all.join(F.broadcast(q_all), ["tab", "bucket"])
        .select(qid_col, id_col, qvec_col, vec_col)
        .dropDuplicates([qid_col, id_col])
    )
    scored = cand.select(
        F.col(qid_col),
        F.col(id_col),
        cosine(_as_double(F.col(qvec_col)), _as_double(F.col(vec_col))).alias(
            "cos_sim"
        ),
    )
    return grouped_topk(
        scored, [qid_col], [F.desc("cos_sim"), F.asc(id_col)], k
    )


def kmeans_lite(
    corpus: DataFrame,
    vec_col: str,
    dim: int,
    n_clusters: int,
    n_iter: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Deterministic Lloyd iterations with seeded-literal init, pure
    DataFrame ops. Centroids: (cluster_id, centroid array<double>).
    Each round: broadcast centroids -> argmin assign -> posexplode ->
    per-(cluster, dim) mean. The per-round shuffle carries (cluster,
    dim, partial sums) only."""
    rng = random.Random(seed)
    cents = [
        (cid, [rng.gauss(0.0, 0.2) for _ in range(dim)])
        for cid in range(n_clusters)
    ]
    spark = corpus.sparkSession
    for _ in range(n_iter):
        cent_df = spark.createDataFrame(
            [(cid, vec) for cid, vec in cents], "cluster_id int, centroid array<double>"
        )
        assigned = assign_to_centroid(corpus, cent_df, vec_col)
        new = (
            assigned.select(
                "cluster_id", F.posexplode(_as_double(F.col(vec_col))).alias("i", "x")
            )
            .groupBy("cluster_id", "i")
            .agg(F.avg("x").alias("m"))
            .groupBy("cluster_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct(F.col("i"), F.col("m")))
                ).alias("pairs")
            )
            .select(
                "cluster_id",
                F.transform(F.col("pairs"), lambda p: p.getField("m")).alias(
                    "centroid"
                ),
            )
        )
        got = {r["cluster_id"]: list(r["centroid"]) for r in new.collect()}
        cents = [
            (cid, got.get(cid, vec)) for cid, vec in cents
        ]  # empty clusters keep previous position
    return spark.createDataFrame(
        cents, "cluster_id int, centroid array<double>"
    )


def assign_to_centroid(
    df: DataFrame, centroids: DataFrame, vec_col: str, id_col: str = "vec_id"
) -> DataFrame:
    """Nearest-centroid assignment: argmin over the (small, broadcast)
    centroid set, computed as array_sort of (d2, cluster_id) structs —
    per-row, no window, no shuffle at all. Cost O(n_clusters) per row."""
    rows = centroids.select(
        F.array_sort(
            F.collect_list(F.struct(F.col("cluster_id"), F.col("centroid")))
        ).alias("cents")
    )
    d2 = lambda c: F.aggregate(  # noqa: E731
        F.zip_with(
            _as_double(F.col(vec_col)),
            c,
            lambda x, cc: (x - cc) * (x - cc),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = F.transform(
        F.col("cents"),
        lambda s: F.struct(
            d2(s.getField("centroid")).alias("d2"),
            s.getField("cluster_id").alias("cluster_id"),
        ),
    )
    best = F.array_sort(scored)[0].getField("cluster_id")
    return (
        df.crossJoin(F.broadcast(rows))
        .withColumn("cluster_id", best)
        .drop("cents")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qe",
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    n_iter: int = 2,
    seed: int = 42,
) -> DataFrame:
    """IVF ANN: build centroids, invert the corpus by nearest centroid,
    and for each query score only the ``n_probe`` nearest lists.

    At scale the inverted corpus is written bucketed by cluster_id so
    repeated query batches prune to the probed lists at scan time."""
    cents = kmeans_lite(corpus, vec_col, dim, n_clusters, n_iter, seed)
    inverted = assign_to_centroid(corpus, cents, vec_col)

    qd = F.aggregate(
        F.zip_with(
            _as_double(F.col(qvec_col)),
            F.col("centroid"),
            lambda x, c: (x - c) * (x - c),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    qw = Window.partitionBy(qid_col).orderBy(F.asc("qd"), F.asc("cluster_id"))
    probes = (
        queries.crossJoin(F.broadcast(cents))
        .withColumn("qd", qd)
        .withColumn("__r", F.row_number().over(qw))
        .filter(F.col("__r") <= n_probe)
        .select(qid_col, qvec_col, "cluster_id")
    )
    cand = inverted.join(F.broadcast(probes), "cluster_id")
    scored = cand.select(
        F.col(qid_col),
        F.col(id_col),
        cosine(_as_double(F.col(qvec_col)), _as_double(F.col(vec_col))).alias(
            "cos_sim"
        ),
    )
    return grouped_topk(
        scored, [qid_col], [F.desc("cos_sim"), F.asc(id_col)], k
    )
