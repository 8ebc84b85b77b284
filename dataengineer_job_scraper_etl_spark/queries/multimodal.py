"""Multimodal-column queries (north star, SURVEY §2.10) over the
asset table derived from ``documents`` (text payload as utf-8 bytes —
identical plumbing to an image/audio corpus; operators/multimodal.py).

Both entries are ORACLE-CHECKED: the metadata profile is plain SQL,
and the fake_decoder's sha256-derived features are reproduced in
DuckDB via hex-byte extraction from sha256(text) — DuckDB's sha256
hashes the VARCHAR's utf-8 bytes, exactly the payload bytes the
decoder sees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.catalog import register
from dataengineer_job_scraper_etl_spark.operators.multimodal import (
    documents_as_assets,
    extract_features,
    meta_stats,
)


@register(
    "multimodal_meta_stats",
    """
SELECT 'text' AS modality,
       count(*) AS n_assets,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       round(avg(octet_length(encode(text))), 4) AS avg_bytes
FROM documents
""",
    doc="Metadata-only profile of the multimodal asset table: the plan "
    "never reads the binary payload (nested-pruning asserted in "
    "tests/test_multimodal.py). encode() on both sides = utf-8 byte "
    "length, not char count.",
)
def multimodal_meta_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return meta_stats(documents_as_assets(spark, sf_dir))


def _features_oracle() -> str:
    cols = ", ".join(
        f"round(('0x' || substr(sha256(text), {2 * i + 1}, 2))::INT / 255.0, 4)"
        f" AS f{i}"
        for i in range(8)
    )
    return f"""
SELECT doc_id AS asset_id, TRUE AS decode_ok, {cols}
FROM documents WHERE doc_id < 200
"""


@register(
    "multimodal_features",
    _features_oracle(),
    doc="Decode/feature-extract stage through the REAL mapInPandas "
    "plumbing (Arrow batches, injected decoder): fake_decoder derives "
    "8 features from sha256(payload); DuckDB reproduces them from "
    "sha256(text) hex bytes. Values are /255 fractions, which have no "
    "exact .5 ties at 4 decimals, so float32->double rounding agrees.",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = documents_as_assets(spark, sf_dir).filter(F.col("asset_id") < 200)
    feats = extract_features(assets)
    cols = [
        F.round(F.element_at("features", i + 1).cast("double"), 4).alias(f"f{i}")
        for i in range(8)
    ]
    return feats.select("asset_id", "decode_ok", *cols)
