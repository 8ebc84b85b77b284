"""Multimodal columns (SURVEY §2.10): real Spark-side plumbing around
a stubbed decoder — schema, batch shape, null handling, and the
binary-column-pruning property of metadata-only plans.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.operators.multimodal import (
    documents_as_assets,
    extract_features,
    fake_decoder,
    meta_stats,
    real_decoder_unavailable,
)


def test_fake_decoder_deterministic():
    a = fake_decoder(b"same payload")
    b = fake_decoder(b"same payload")
    assert a == b and a["feat_dim"] == 8 and len(a["features"]) == 8
    assert all(0.0 <= x <= 1.0 for x in a["features"])
    assert fake_decoder(b"") is None and fake_decoder(None) is None


def test_real_decoder_is_an_explicit_stub():
    with pytest.raises(NotImplementedError):
        real_decoder_unavailable(b"x")


def test_extract_features_roundtrip(spark, sf_dir):
    assets = documents_as_assets(spark, sf_dir).limit(20)
    feats = extract_features(assets).collect()
    assert len(feats) == 20
    assert all(r["decode_ok"] for r in feats)
    assert all(r["feat_dim"] == 8 and len(r["features"]) == 8 for r in feats)
    # deterministic: same payload bytes -> same features as direct call
    one = assets.select("asset_id", "payload").first()
    expected = fake_decoder(bytes(one["payload"]))["features"]
    got = next(r for r in feats if r["asset_id"] == one["asset_id"])["features"]
    assert [round(x, 6) for x in got] == [round(x, 6) for x in expected]


def test_extract_features_null_payload(spark):
    assets = spark.createDataFrame(
        [(1, "image", None), (2, "image", bytearray(b"bytes"))],
        "asset_id long, modality string, payload binary",
    )
    got = {r["asset_id"]: r for r in extract_features(assets).collect()}
    assert got[1]["decode_ok"] is False and got[1]["features"] is None
    assert got[2]["decode_ok"] is True


def test_meta_stats_matches_manual_agg(spark, sf_dir):
    assets = documents_as_assets(spark, sf_dir)
    got = meta_stats(assets).first()
    n = assets.count()
    total = assets.select(
        F.sum(F.col("meta").getField("n_bytes")).alias("t")
    ).first()["t"]
    assert got["modality"] == "text"
    assert got["n_assets"] == n and got["total_bytes"] == total


def test_meta_stats_prunes_payload_column(spark, tmp_path):
    # Write a real asset parquet, then check the meta-only plan's scan
    # ReadSchema excludes the binary payload (the scale property).
    path = str(tmp_path / "assets")
    spark.createDataFrame(
        [(1, "image", bytearray(b"\x01\x02"), ("image/png", 2, 2, None, 2))],
        "asset_id long, modality string, payload binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:bigint,n_bytes:bigint>",
    ).write.parquet(path)
    plan = meta_stats(spark.read.parquet(path))._jdf.queryExecution().executedPlan().toString()
    schemas = [
        l.split("ReadSchema:", 1)[1] for l in plan.splitlines() if "ReadSchema" in l
    ]
    assert schemas and all("payload" not in s for s in schemas)
    # nested-field pruning too: only meta.n_bytes is read
    assert any("n_bytes" in s for s in schemas)


def test_resize_assets_plumbing(spark):
    from dataengineer_job_scraper_etl_spark.operators.multimodal import (
        fake_resizer,
        resize_assets,
    )

    assets = spark.createDataFrame(
        [(1, "image", bytearray(b"abc")), (2, "image", None)],
        "asset_id long, modality string, payload binary",
    )
    got = {r["asset_id"]: r for r in resize_assets(assets, 4, 2).collect()}
    assert got[1]["resize_ok"] and len(got[1]["payload"]) == 8
    assert bytes(got[1]["payload"]) == fake_resizer(b"abc", 4, 2)
    assert got[1]["width"] == 4 and got[1]["height"] == 2
    assert not got[2]["resize_ok"] and got[2]["payload"] is None


def test_sample_frames_flatmap_shape(spark):
    from dataengineer_job_scraper_etl_spark.operators.multimodal import sample_frames

    assets = spark.createDataFrame(
        [(1, bytearray(bytes(range(200)))), (2, None), (3, bytearray(b"tiny"))],
        "asset_id long, payload binary",
    )
    got = sample_frames(assets, frame_bytes=64, max_frames=8).collect()
    by_asset: dict = {}
    for r in got:
        by_asset.setdefault(r["asset_id"], []).append(r)
    assert len(by_asset[1]) == 3  # 200 // 64 frames
    assert [r["frame_idx"] for r in sorted(by_asset[1], key=lambda r: r["frame_idx"])] == [0, 1, 2]
    assert bytes(sorted(by_asset[1], key=lambda r: r["frame_idx"])[0]["frame"]) == bytes(range(64))
    assert 2 not in by_asset  # null payload -> no frames
    assert len(by_asset[3]) == 1 and bytes(by_asset[3][0]["frame"]) == b"tiny"
