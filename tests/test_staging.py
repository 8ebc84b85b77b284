"""Shared staging protocol (dataengineer_job_scraper_etl_spark/
staging.py): fingerprint reuse, rename-publish, and the
mtime-ordering guarantee the stream queues depend on."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.staging import (
    stage_once,
    write_ordered_batches,
)


def test_write_ordered_batches_stamps_strictly_increasing_mtimes(
    spark, tmp_path
):
    d = str(tmp_path / "queue")
    b1 = spark.range(0, 5).select(F.col("id"))
    b2 = spark.range(5, 10).select(F.col("id"))
    before = set()
    write_ordered_batches(d, [b1, b2])
    files = sorted(
        (os.stat(os.path.join(d, n)).st_mtime, n)
        for n in os.listdir(d)
        if n.endswith(".parquet")
    )
    assert len(files) == 2
    # batch 2's file is strictly newer: FileStreamSource replays in
    # write order even on coarse-mtime filesystems
    assert files[0][0] < files[1][0]
    del before


def test_stage_once_reuses_and_refreshes_by_fingerprint(spark, tmp_path):
    src = str(tmp_path / "src.txt")
    with open(src, "w") as f:
        f.write("v1")
    calls = []

    def build(staged):
        calls.append(staged)
        os.makedirs(staged)
        open(os.path.join(staged, "out"), "w").write("data")

    r1 = stage_once(src, "testtag", build)
    r2 = stage_once(src, "testtag", build)
    assert r1 == r2 and len(calls) == 1  # cached by fingerprint
    # regenerating the source (mtime_ns changes) re-stages
    with open(src, "w") as f:
        f.write("v2")
    r3 = stage_once(src, "testtag", build)
    assert r3 != r1 and len(calls) == 2


def test_stage_once_cleans_temp_on_build_failure(spark, tmp_path):
    import glob
    import tempfile

    src = str(tmp_path / "src2.txt")
    open(src, "w").write("x")

    def boom(staged):
        raise RuntimeError("build failed")

    try:
        stage_once(src, "failtag", boom)
    except RuntimeError:
        pass
    leftovers = glob.glob(
        os.path.join(tempfile.gettempdir(), "spark_graft_failtag_stage_*")
    )
    assert leftovers == []  # private temp dir removed even on failure
