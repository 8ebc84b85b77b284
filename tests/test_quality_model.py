"""Hash-checked quality-classifier training (queries/quality_model.py):
determinism, cache contract, and the quantized-GD mechanics."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.queries.quality_model import (
    _WEIGHT_CACHE,
    _features,
    _half_up,
    _z,
    train_quality_logreg,
)


def _toy(spark):
    rows = [
        (1, "the a of and to " * 10),              # stopword-heavy, long
        (2, "alpha beta gamma delta epsilon"),      # diverse, short
        (3, "x " * 40),                            # repetitive, long
        (4, "one two three four five six seven eight nine ten "
            "eleven twelve thirteen fourteen fifteen sixteen "
            "seventeen eighteen nineteen twenty twentyone twentytwo "
            "twentythree twentyfour twentyfive twentysix twentyseven "
            "twentyeight twentynine thirty"),      # diverse, >=30 toks
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_features_are_exact_ratios(spark):
    f = {r["doc_id"]: r for r in _features(_toy(spark)).collect()}
    # doc 2: 5 tokens, 5 distinct, 0 stopwords, 26 chars (5+4+5+5+7)
    assert f[2]["x1"] == 0.05
    assert f[2]["x2"] == 0.0
    assert f[2]["x3"] == 1.0
    assert f[2]["x4"] == 26 / (8.0 * 5)
    assert f[2]["y"] == 0.0          # diverse but < 30 tokens
    assert f[4]["y"] == 1.0          # diverse AND >= 30 tokens
    assert f[3]["y"] == 0.0          # repetitive


def test_training_is_deterministic_and_quantized(spark):
    feats = _features(_toy(spark))
    w1 = train_quality_logreg(feats, n_iter=4, lr=1.0)
    w2 = train_quality_logreg(feats, n_iter=4, lr=1.0)
    assert w1 == w2
    # every iterate lands on the 1e-6 grid
    assert all(wj == _half_up(wj) for wj in w1)
    # zero iterations -> zero weights (the documented init)
    assert train_quality_logreg(feats, n_iter=0) == [0.0] * 5


def test_weight_cache_trains_once_per_key(spark):
    feats = _features(_toy(spark))
    key = ("qlr-test", id(feats))
    _WEIGHT_CACHE.pop(key, None)
    w1 = train_quality_logreg(feats, n_iter=2, cache_key=key)
    # a DIFFERENT frame under the same key must return the cached fit
    other = _features(_toy(spark).limit(2))
    w2 = train_quality_logreg(other, n_iter=2, cache_key=key)
    assert w1 == w2
    _WEIGHT_CACHE.pop(key, None)


def test_gradient_moves_toward_labels(spark):
    """One step from zero: sigmoid(0)=0.5 for every row, so the bias
    gradient is mean(y - 0.5) — sign must follow the label balance."""
    feats = _features(_toy(spark))  # one positive of four
    w = train_quality_logreg(feats, n_iter=1, lr=1.0)
    assert w[0] == _half_up((1 / 4) * ((1 - 0.5) + 3 * (0 - 0.5)))


def test_scoring_projection_matches_weights(spark):
    feats = _features(_toy(spark))
    w = train_quality_logreg(feats, n_iter=3, lr=2.0)
    sig = F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(w)))
    got = feats.select(
        F.floor(sig * F.lit(1e6) + F.lit(0.5)).cast("bigint").alias("s")
    ).collect()
    assert all(0 <= r["s"] <= 1_000_000 for r in got)
