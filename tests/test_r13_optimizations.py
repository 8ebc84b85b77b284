"""Equivalence pins for the round-13 optimization rewrites.

Each optimization replaced an expression-level formulation with a
cheaper one that must be VALUE-IDENTICAL (the oracle hashes would
catch corpus-level drift, but these tests pin the operator in
isolation against the ORIGINAL formulation — including edge rows the
fixtures may not exercise — so a future edit that reintroduces a
subtle difference fails here with a readable diff, not as an opaque
hash mismatch three layers up).

Original formulations are inlined VERBATIM from the pre-r13 code so
the comparison target cannot drift with the production code.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataengineer_job_scraper_etl_spark.functions.strings import ws_tokens
from dataengineer_job_scraper_etl_spark.operators.dedup import (
    _MERSENNE_31,
    _hash_params,
    _signature_from_hashes,
    shingles,
)

# Edge battery: empty text, whitespace runs, null, 1/2-token docs
# (below the shingle width), repeated tokens (array_distinct path).
_EDGE_ROWS = [
    (1, "one two three four five"),
    (2, "a b"),
    (3, ""),
    (4, None),
    (5, "x  y \t z  w"),
    (6, "a a a a a"),
    (7, "solo"),
    (8, "  leading and trailing  "),
]


@pytest.fixture(scope="module")
def edge_docs(spark):
    return spark.createDataFrame(_EDGE_ROWS, "doc_id int, text string")


@pytest.fixture(scope="module")
def real_docs(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(300)
    )


def _shingles_pre_r13(text, n=3):
    """Pre-r13 shingles: transform over an index sequence, with the
    tokenization re-evaluated inside the lambda (the formulation the
    zip-of-shifted-slices rewrite replaced)."""
    toks = ws_tokens(text)
    n_sh = F.size(toks) - F.lit(n - 1)
    idx = F.sequence(F.lit(1), n_sh)
    windows = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i, n), " ")
    )
    return F.when(
        text.isNotNull(),
        F.array_distinct(
            F.when(n_sh >= 1, windows).otherwise(
                F.array().cast(T.ArrayType(T.StringType()))
            )
        ),
    )


def _assert_col_equal(df, old_col, new_col):
    bad = (
        df.select(old_col.alias("o"), new_col.alias("n"))
        .filter(
            ~(
                (F.col("o").isNull() & F.col("n").isNull())
                | (F.col("o") == F.col("n"))
            )
        )
        .count()
    )
    assert bad == 0


@pytest.mark.parametrize("n", [2, 3, 4])
def test_shingles_zip_formulation_matches_original(edge_docs, n):
    _assert_col_equal(
        edge_docs,
        _shingles_pre_r13(F.col("text"), n),
        shingles(F.col("text"), n),
    )


def test_shingles_zip_formulation_matches_original_on_corpus(real_docs):
    _assert_col_equal(
        real_docs,
        _shingles_pre_r13(F.col("text"), 3),
        shingles(F.col("text"), 3),
    )


def _signature_pre_r13(base_hashes, num_hashes, seed):
    """Pre-r13 fold: two zip_with arrays per shingle, mod inside the
    inner lambda (the formulation the fused struct-zip replaced)."""
    params = _hash_params(num_hashes, seed)
    a_arr = F.array(*[F.lit(a) for a, _ in params])
    b_arr = F.array(*[F.lit(b) for _, b in params])
    p = F.lit(_MERSENNE_31)

    def step(acc, x):
        xm = F.pmod(x, p)
        hashes = F.zip_with(
            a_arr, b_arr, lambda a, b: F.pmod(a * xm + b, p)
        )
        return F.zip_with(acc, hashes, lambda m, h: F.least(m, h))

    init = F.array_repeat(p.cast("long"), num_hashes)
    return F.aggregate(base_hashes, init, step)


def test_minhash_signature_fused_fold_matches_original(real_docs):
    base = real_docs.select(
        "doc_id",
        F.transform(
            shingles(F.col("text"), 3), lambda s: F.xxhash64(s)
        ).alias("base"),
    )
    _assert_col_equal(
        base,
        _signature_pre_r13(F.col("base"), 64, 42),
        _signature_from_hashes(F.col("base"), 64, 42),
    )


def test_hashtf_histogram_single_pass_matches_16_pass(real_docs):
    """The featurizer's aggregate histogram vs the original
    per-bucket filter scan (topics.hashtf_unit_embeddings and
    pipeline_ops.docs_chunk_hashtf_retrieval)."""
    dim = 16
    toks = F.split(
        F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")), " "
    )
    d = real_docs.select("doc_id", toks.alias("t")).filter(
        F.size("t") > 0
    )
    tok_f = F.filter(F.col("t"), lambda tk: tk != "")
    bucket = lambda tk: (  # noqa: E731
        F.conv(F.substring(F.md5(tk), 1, 1), 16, 10).cast("int")
    )
    bks = F.transform(tok_f, bucket)
    old = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.size(F.filter(bks, lambda b: b == i)).cast("double"),
    )
    new = F.aggregate(
        bks,
        F.array_repeat(F.lit(0.0), dim),
        lambda acc, b: F.transform(
            acc,
            lambda x, i: x
            + F.when(b == i, F.lit(1.0)).otherwise(F.lit(0.0)),
        ),
    )
    _assert_col_equal(d, old, new)


def test_hoisted_norm_cosine_matches_cosine(spark, sf_dir):
    """dot/(na*nb) with per-row precomputed norms must be
    BIT-identical to cosine(a, b) — same ops, same order (the
    graphrank / brute_force_topk / ivf_topk / rhp_lsh_topk device).
    Asserted with === (no tolerance): a formulation that merely
    approximates would round differently at the ppm quantizer."""
    from dataengineer_job_scraper_etl_spark.functions.vector_math import (
        cosine,
        dot,
        l2_norm,
    )

    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .limit(40)
    )
    ed = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    v = emb.select("vec_id", ed.alias("e")).withColumn(
        "nrm", l2_norm(F.col("e"))
    )
    a = v.select(
        F.col("vec_id").alias("ia"),
        F.col("e").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = v.select(
        F.col("vec_id").alias("ib"),
        F.col("e").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    pairs = a.join(b, F.col("ia") < F.col("ib"))
    bad = pairs.filter(
        ~(
            cosine(F.col("ea"), F.col("eb"))
            == dot(F.col("ea"), F.col("eb"))
            / (F.col("na") * F.col("nb"))
        )
    ).count()
    assert bad == 0
