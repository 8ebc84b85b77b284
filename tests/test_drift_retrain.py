"""The drift -> retrain -> re-freeze lifecycle (queries/pca.py:
serve_and_maybe_retrain): a planted-shift queue drives the monitor
through detect (PSI vs frozen deciles), retrain trigger (stale caches
cleared, new slice tag), and re-freeze (new monitor stable on the
shifted distribution), with the old monitor serving untouched until
the swap."""

from __future__ import annotations

import copy

from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.queries.pca import (
    _MONITOR_CACHE,
    PSI_RETRAIN_THRESHOLD_PPM,
    monitor_psi_ppm,
    serve_and_maybe_retrain,
    train_pc1_monitor,
)


def _ref(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .filter(F.col("vec_id") % 10 < 8)
    )


def _cur(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .filter(F.col("vec_id") % 10 >= 8)
    )


def _shift_along_pc1(df, v, scale=3.0):
    """Planted shift: translate every vector by scale * PC1 loading —
    moves every frozen-monitor score by ~scale (score std is ~0.15 on
    the fixture), pushing the whole batch into the top bucket."""
    lits = F.array(*[F.lit(float(x) * scale) for x in v])
    return df.select(
        "vec_id",
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            lits,
            lambda x, c: x + c,
        ).alias("embedding"),
    )


def test_planted_shift_queue_detect_retrain_refreeze(spark, sf_dir):
    pca_key_v1 = ("test-retrain-pca", "v1")
    monitor = train_pc1_monitor(_ref(spark, sf_dir), pca_key=pca_key_v1)
    mon_key = ("pc1-monitor", "test-retrain")
    _MONITOR_CACHE[mon_key] = monitor
    snapshot = copy.deepcopy(monitor)

    # --- batch 1: in-distribution -> serve, no retrain ---
    b1 = _cur(spark, sf_dir)
    served, psi1, retrained = serve_and_maybe_retrain(
        monitor, b1, new_ref_rows=b1
    )
    assert not retrained
    assert served is monitor  # same frozen object keeps serving
    assert psi1 <= PSI_RETRAIN_THRESHOLD_PPM

    # --- batch 2: planted shift -> detect + retrain + re-freeze ---
    v = monitor[1]
    b2 = _shift_along_pc1(_cur(spark, sf_dir), v)
    pca_key_v2 = ("test-retrain-pca", "v2")  # NEW slice tag
    fresh, psi2, retrained = serve_and_maybe_retrain(
        monitor,
        b2,
        new_ref_rows=b2,
        new_pca_key=pca_key_v2,
        stale_monitor_keys=(mon_key,),
    )
    assert retrained
    assert psi2 > PSI_RETRAIN_THRESHOLD_PPM
    # the old monitor served the detecting batch and was never torn:
    assert monitor == snapshot
    # stale frozen state is gone; the new monitor is a re-freeze, not
    # a mutation of the old one
    assert mon_key not in _MONITOR_CACHE
    assert fresh is not monitor
    assert fresh[2] != monitor[2]  # new decile edges

    # --- batch 3: post-swap serving — the shifted distribution is the
    # new normal, PSI against the re-frozen monitor is back under the
    # bar and no further retrain fires ---
    served3, psi3, retrained3 = serve_and_maybe_retrain(
        fresh, b2, new_ref_rows=b2
    )
    assert not retrained3
    assert served3 is fresh
    assert psi3 <= PSI_RETRAIN_THRESHOLD_PPM


def test_retrain_clears_stale_ann_indexes(spark, sf_dir):
    """A drift-triggered retrain must also drop ANN index artifacts
    trained on the pre-shift corpus (IVF centroids / PQ codebooks /
    OPQ rotations) — serving them degrades recall silently."""
    from dataengineer_job_scraper_etl_spark.operators.opq import (
        _ROTATION_CACHE,
        opq_train,
    )

    key = "test-retrain-index"
    ref = _ref(spark, sf_dir)
    opq_train(ref, "embedding", 64, m=8, cache_key=key)
    assert (key, 64, 8) in _ROTATION_CACHE

    monitor = train_pc1_monitor(ref)
    b = _shift_along_pc1(_cur(spark, sf_dir), monitor[1])
    _, _, retrained = serve_and_maybe_retrain(
        monitor, b, new_ref_rows=b, stale_index_key=key
    )
    assert retrained
    assert (key, 64, 8) not in _ROTATION_CACHE


def test_streaming_lifecycle_detect_retrain_refreeze(spark, sf_dir, tmp_path):
    """VERDICT r8 ask #6: the lifecycle composed with a LIVE
    micro-batch stream. A 3-file queue (in-distribution, planted
    shift, shifted again) drains through foreachBatch with
    maxFilesPerTrigger=1: batch 0 serves clean, batch 1 breaches PSI
    and triggers retrain + re-freeze + stale-cache invalidation (incl.
    an OPQ rotation trained on the pre-shift corpus), batch 2 is
    served by the SWAPPED monitor and stays under the bar — proving
    the re-frozen monitor, not the stale one, serves subsequent
    batches."""
    from dataengineer_job_scraper_etl_spark.operators.opq import (
        _ROTATION_CACHE,
        opq_train,
    )
    from dataengineer_job_scraper_etl_spark.queries.pca import (
        _MONITOR_CACHE,
        PSI_RETRAIN_THRESHOLD_PPM,
    )
    from dataengineer_job_scraper_etl_spark.streaming.jobs import (
        streaming_drift_lifecycle,
    )

    ref = _ref(spark, sf_dir)
    monitor = train_pc1_monitor(ref, pca_key=("stream-test-pca", "v1"))
    mon_key = ("pc1-monitor", "stream-test")
    _MONITOR_CACHE[mon_key] = monitor
    idx_key = "stream-test-index"
    opq_train(ref, "embedding", 64, m=8, cache_key=idx_key)
    assert (idx_key, 64, 8) in _ROTATION_CACHE

    # stage the ordered queue: lexicographic file order = batch order
    cur = _cur(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    shifted = _shift_along_pc1(_cur(spark, sf_dir), monitor[1])
    qdir = str(tmp_path / "queue")
    cur.coalesce(1).write.parquet(qdir + "/b0")
    shifted.coalesce(1).write.parquet(qdir + "/b1")
    shifted.coalesce(1).write.parquet(qdir + "/b2")

    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(qdir)
    )
    history, final = streaming_drift_lifecycle(
        stream,
        monitor,
        checkpoint=str(tmp_path / "cp"),
        pca_key_tag=("stream-test-pca", "retrain"),
        stale_monitor_keys=(mon_key,),
        stale_index_key=idx_key,
    )

    assert [h["retrained"] for h in history] == [False, True, False]
    assert history[0]["psi_ppm"] <= PSI_RETRAIN_THRESHOLD_PPM
    assert history[1]["psi_ppm"] > PSI_RETRAIN_THRESHOLD_PPM
    # post-swap: the re-frozen monitor serves batch 2 under the bar
    assert history[2]["psi_ppm"] <= PSI_RETRAIN_THRESHOLD_PPM
    assert final is not monitor
    # stale artifacts dropped during the in-stream retrain
    assert mon_key not in _MONITOR_CACHE
    assert (idx_key, 64, 8) not in _ROTATION_CACHE


def test_refreeze_entry_statistics_and_branch_agree(spark, sf_dir):
    """The oracle entry (vec_drift_retrain_refreeze) hashes the
    SUM-OF-FLOORS ppm statistic and branches on it; the lifecycle
    helper decides on FLOOR-OF-SUM. The two differ by at most
    n_buckets ppm, so they must sit on the same side of the 200k
    threshold on the fixture — pin that, plus: the served edges after
    a breach are the v2 monitor's (not v1's), and a NO-shift slice
    keeps the v1 monitor (the entry's CASE would then emit v1 edges)."""
    from dataengineer_job_scraper_etl_spark.queries.pca import (
        _SHIFT,
        vec_drift_retrain_refreeze,
    )

    ref = _ref(spark, sf_dir)
    mon1 = train_pc1_monitor(ref, pca_key=("t-refreeze-v1", sf_dir))

    # no shift -> no retrain -> serving IS mon1
    serving, psi, retrained = serve_and_maybe_retrain(
        mon1, _cur(spark, sf_dir), new_ref_rows=_cur(spark, sf_dir),
        new_pca_key=("t-refreeze-nope", sf_dir),
    )
    assert not retrained and serving is mon1

    # planted +_SHIFT -> retrain -> new monitor trained on the shift
    shifted = _cur(spark, sf_dir).select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: x + F.lit(_SHIFT),
        ).alias("embedding"),
    )
    serving2, psi2, retrained2 = serve_and_maybe_retrain(
        mon1, shifted, new_ref_rows=shifted,
        new_pca_key=("t-refreeze-v2", sf_dir),
    )
    assert retrained2 and serving2 is not mon1
    assert psi2 > PSI_RETRAIN_THRESHOLD_PPM

    # the registered entry's hashed rows agree with the lifecycle run
    rows = vec_drift_retrain_refreeze(spark, sf_dir).collect()
    assert len(rows) == 9
    assert all(r["retrained"] == 1 for r in rows)
    got_edges = [r["edge"] for r in sorted(rows, key=lambda r: r["k"])]
    assert got_edges == [float(e) for e in serving2[2]]
    # sum-of-floors vs floor-of-sum: within n_buckets ppm, same side
    hashed_psi = rows[0]["psi_ppm"]
    assert abs(hashed_psi - psi2) <= 10
    assert (hashed_psi > PSI_RETRAIN_THRESHOLD_PPM) == retrained2
