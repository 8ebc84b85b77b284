"""Distributed BPE training (operators/bpe.py): the learned merge
table must be IDENTICAL to the single-process reference loop — same
counting (overlaps included), same greedy apply, same tie-break — and
the corpus-facing stages must keep their scale shape."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.operators.bpe import (
    END_OF_WORD,
    learn_bpe_merges,
    pair_counts,
    reference_bpe,
    word_counts,
    word_symbols,
)

_DOCS = [
    "low low low lower lower lowest",
    "new newer newest new new",
    "wide wider widest wide",
    "low new wide widest",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(_DOCS)], ["doc_id", "text"]
    )


def _py_word_counts():
    c = Counter()
    for t in _DOCS:
        c.update(t.split())
    return dict(c)


def test_word_counts_match_python(docs):
    got = {r["word"]: r["c"] for r in word_counts(docs).collect()}
    assert got == _py_word_counts()


def test_pair_counts_include_overlaps(spark):
    # 'aaa' must contribute 2 to the ('a','a') pair — Sennrich counting
    df = spark.createDataFrame([(0, "aaa")], ["doc_id", "text"])
    vocab = word_symbols(word_counts(df))
    got = {r["pair"]: r["pair_count"] for r in pair_counts(vocab).collect()}
    assert got["a a"] == 2
    assert got[f"a {END_OF_WORD}"] == 1


def test_learned_merges_match_reference_exactly(docs):
    n = 12
    merges, vocab = learn_bpe_merges(docs, n)
    ref_merges, ref_vocab = reference_bpe(_py_word_counts(), n)
    assert merges == ref_merges
    got = {r["word"]: list(r["syms"]) for r in vocab.collect()}
    assert got == ref_vocab


def test_merge_monotonically_shrinks_weighted_symbol_count(docs):
    wc = _py_word_counts()
    _, vocab = learn_bpe_merges(docs, 5)
    after = sum(
        len(r["syms"]) * wc[r["word"]] for r in vocab.collect()
    )
    before = sum((len(w) + 1) * c for w, c in wc.items())
    # each merge round with a winning pair strictly reduces total symbols
    assert after <= before - 5


def test_training_exhausts_gracefully(spark):
    df = spark.createDataFrame([(0, "ab ab")], ["doc_id", "text"])
    # 'ab</w>' needs 2 merges; asking for 10 stops at exhaustion
    merges, vocab = learn_bpe_merges(df, 10)
    ref_merges, _ = reference_bpe({"ab": 2}, 10)
    assert merges == ref_merges
    assert len(merges) == 2
    [row] = vocab.collect()
    assert list(row["syms"]) == ["ab" + END_OF_WORD]


def test_pair_counting_stays_vocab_sized(docs):
    """The corpus text is scanned once (word_counts); pair_counts runs
    over the vocab with array-side bigrams — no Python nodes, and the
    only exchanges are the two aggregates' partial->final shuffles."""
    plan = (
        pair_counts(word_symbols(word_counts(docs)))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    import re

    assert len(re.findall(r"\bExchange hash", plan)) <= 2


def test_token_counts_under_learned_merges_match_reference(docs):
    from dataengineer_job_scraper_etl_spark.operators.bpe import (
        bpe_token_counts,
    )

    merges, _ = learn_bpe_merges(docs, 8)
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_token_counts(docs, merges).collect()
    }
    _, ref_vocab = reference_bpe(_py_word_counts(), 8)
    want = {
        i: sum(len(ref_vocab[w]) for w in t.split())
        for i, t in enumerate(_DOCS)
    }
    assert got == want


def test_zero_merges_counts_chars_plus_marker(spark):
    from dataengineer_job_scraper_etl_spark.operators.bpe import (
        bpe_token_counts,
    )

    df = spark.createDataFrame([(0, "ab abc")], ["doc_id", "text"])
    [row] = bpe_token_counts(df, []).collect()
    assert row["n_bpe_tokens"] == (2 + 1) + (3 + 1)


def test_segmenter_python_runs_on_distinct_words_only(docs):
    """The Python segmenter must sit above the DISTINCT-word frame,
    never the corpus explode: in the plan, the Arrow eval's subtree
    contains the dedup aggregate."""
    from dataengineer_job_scraper_etl_spark.operators.bpe import (
        bpe_token_counts,
    )

    plan = (
        bpe_token_counts(docs, [("l", "o")])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan
    arrow_subtree = plan[plan.index("ArrowEvalPython"):]
    assert "HashAggregate" in arrow_subtree  # the distinct below it


def test_empty_and_whitespace_docs_count_zero_not_dropped(spark):
    from dataengineer_job_scraper_etl_spark.operators.bpe import (
        bpe_token_counts,
    )

    df = spark.createDataFrame(
        [(0, "ab"), (1, ""), (2, "   "), (3, "ab ab")],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_token_counts(df, []).collect()
    }
    # every doc present; empty/whitespace docs are explicit zeros
    assert got == {0: 3, 1: 0, 2: 0, 3: 6}
