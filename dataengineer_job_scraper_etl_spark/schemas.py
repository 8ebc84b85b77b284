"""Canonical typed schemas.

The reference declares its job-postings frame as an empty *typed* frame
before any rows exist (reference main.py:78) and widens it through the
pipeline (pay -> skills -> seniority -> date, main.py:155-175). We keep
that declared-schema discipline: every source and every pipeline stage
has an explicit StructType; nothing in the hot path relies on inference
(the one inferSchema mode the reference uses, etl/transform.py:62, is
exposed as an option on the CSV reader in io.py).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Extract stage (reference main.py:78,108-112): one row per job posting.
JOB_POSTING_RAW = T.StructType(
    [
        T.StructField("jobid", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("job_type", T.StringType(), True),
    ]
)

# Final load stage (reference main.py:175): title/description dropped,
# derived columns appended (main.py:155-173).
JOB_POSTING_FINAL = T.StructType(
    [
        T.StructField("jobid", T.StringType(), True),
        T.StructField("job_type", T.StringType(), True),
        T.StructField("pay", T.DoubleType(), True),
        T.StructField("skills", T.ArrayType(T.StringType(), True), True),
        T.StructField("seniority", T.StringType(), True),
        T.StructField("date", T.TimestampType(), True),
    ]
)

# Skill-pattern table (reference assets/skills_no_en.jsonl):
# {"label": "SKILL", "pattern": [{"LOWER": "apache"}, {"LOWER": "spark"}]}
SKILL_PATTERN = T.StructType(
    [
        T.StructField("label", T.StringType(), False),
        T.StructField(
            "pattern",
            T.ArrayType(T.MapType(T.StringType(), T.StringType()), True),
            False,
        ),
    ]
)

# Driver testdata tables (TESTDATA.md / FIXTURES.md).
EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType(), True), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

# Multimodal: opaque binary payload + typed metadata (north star).
MULTIMODAL_ASSET = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video|text
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)
