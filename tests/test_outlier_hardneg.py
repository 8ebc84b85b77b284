"""Planted-fixture tests for the round-7 curation additions:
centroid-distance outlier flags and contrastive hard-negative mining
(queries/clustering.py). The oracle entries pin cross-engine hash
equality on the fixtures; these pin the SEMANTIC contracts on planted
geometry the fixture tables can't guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F


def _write(spark, tmp_path, rows):
    d = str(tmp_path / "fix")
    spark.createDataFrame(
        [(i, [float(x) for x in v], lab) for i, v, lab in rows],
        "vec_id long, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    return d


def test_outlier_flags_far_point_only(spark, tmp_path):
    from dataengineer_job_scraper_etl_spark.queries.clustering import (
        vec_centroid_outlier_flags,
    )

    # One tight blob along axis 0; id 99 sits ~1 unit out — close
    # enough to stay assigned to a populated blob cluster (a 10x-out
    # point would be argmin-assigned to a cluster it then owns alone:
    # distance 0, NULL stddev, unflaggable by construction), far
    # enough to clear that cluster's mean + 2*stddev by a wide margin.
    dim = 64
    rows = []
    for i in range(60):
        v = [0.0] * dim
        # continuous spread: with only a handful of DISTINCT values,
        # the 8 lowest-id init vectors duplicate, k-means strands the
        # planted point in a singleton, and a singleton is unflaggable
        v[0] = 1.0 + i * 0.01
        rows.append((i, v, 0))
    far = [0.0] * dim
    far[0] = 2.6
    rows.append((99, far, 0))
    d = _write(spark, tmp_path, rows)
    out = {r["vec_id"]: r["is_outlier"] for r in
           vec_centroid_outlier_flags(spark, d).collect()}
    assert len(out) == 61
    assert out[99] == 1  # the planted far point is flagged
    # ... and flagging is sparse: the blob interior stays unflagged
    # (tight subclusters can flag a stray member at their own tiny
    # scale, so allow a couple, never a mass flag).
    assert sum(out.values()) <= 3


def test_hard_negative_prefers_closest_wrong_label(spark, tmp_path):
    from dataengineer_job_scraper_etl_spark.queries.clustering import (
        vec_hard_negative_mining,
    )

    dim = 64

    def v(axis, x):
        a = [0.0] * dim
        a[axis] = x
        a[2] = 0.1  # shared component so same-cluster cosines > 0
        return a

    # The 8 LOWEST ids must be the padding blob: init seeds are the k
    # lowest-id vectors, and an interesting row that seeds its own
    # centroid stays a singleton cluster (no same-cluster pairs at
    # all). Padding (ids 0-7, label 2) spreads continuously on axis 1;
    # the interesting group (ids 20-23) lives on axis 0, nearly
    # orthogonal to every padding vector (shared axis-2 component
    # gives cross-group cosine ~0.01, far below tau=0.4), and its
    # members co-assign to whichever padding centroid is nearest.
    rows = [(i, v(1, 1.0 + i * 0.01), 2) for i in range(8)]
    rows += [
        (20, v(0, 1.0), 0),
        (21, v(0, 1.001), 0),  # same label: never a hard negative
        (22, [0.99 if j == 0 else (0.12 if j == 2 else 0.0)
              for j in range(dim)], 1),
        (23, [0.8 if j == 0 else (0.5 if j == 2 else 0.0)
              for j in range(dim)], 1),
    ]
    d = _write(spark, tmp_path, rows)
    got = {r["vec_id"]: (r["hard_neg_id"], r["sim_q"]) for r in
           vec_hard_negative_mining(spark, d).collect()}
    # Anchor 20's hardest negative is id 22 (closest wrong-label row,
    # cos ~0.9998), never its same-label twin 21 (cos ~1.0 but same
    # label) and not the angularly-farther 23 (cos ~0.90).
    assert got[20][0] == 22
    # Symmetric direction exists too: id 22's hardest negative is one
    # of the label-0 rows.
    assert got[22][0] in (20, 21)
    # Every mined pair crosses labels.
    labels = {i: lab for i, _, lab in rows}
    for a, (n, _) in got.items():
        assert labels[a] != labels[n]
