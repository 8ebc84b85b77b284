"""Blocked fuzzy self-join (operators/fuzzyjoin.py) and k-fold
assignment (queries/sampling.py::kfold_assign)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.operators.fuzzyjoin import (
    blocked_fuzzy_pairs,
)
from dataengineer_job_scraper_etl_spark.queries.sampling import kfold_assign


@pytest.fixture(scope="module")
def names(spark):
    rows = [
        (1, "red bolt"), (2, "rad bolt"), (3, "blue bolt"),
        (4, "red ring"), (5, "red rung"), (6, "green gear"),
    ]
    return spark.createDataFrame(rows, ["id", "name"])


def _block(names):
    return F.element_at(F.split(F.col("name"), " "), -1)


def test_within_block_distance_pairs_only(names):
    got = {
        (r["id_a"], r["id_b"])
        for r in blocked_fuzzy_pairs(names, "id", "name", _block(names), 1).collect()
    }
    # red/rad bolt: dist 1, same 'bolt' block -> found.
    # red/blue bolt: same block but dist 3 -> verifier rejects.
    # red ring / red rung: dist 1 BUT different blocks ('ring' vs
    # 'rung') -> never compared: the documented recall trade-off of
    # single-key blocking (production composes/unions keys to cover).
    assert got == {(1, 2)}


def test_each_unordered_pair_emitted_once(names):
    pairs = blocked_fuzzy_pairs(names, "id", "name", _block(names), 10)
    df = pairs.groupBy("id_a", "id_b").count().filter(F.col("count") > 1)
    assert df.count() == 0
    assert pairs.filter(F.col("id_a") >= F.col("id_b")).count() == 0


def test_blocking_bounds_comparisons(names):
    # dist=100 admits every within-block pair; blocks bolt={1,2,3},
    # ring={4}, rung={5}, gear={6} give 3 pairs — all-pairs would be 15
    assert blocked_fuzzy_pairs(names, "id", "name", _block(names), 100).count() == 3


def test_kfold_partitions_exactly_and_deterministically(spark):
    df = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    folded = kfold_assign(df, "doc_id", 5)
    counts = {r["fold"]: r["n"] for r in folded.groupBy("fold").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == set(range(5))  # every fold non-empty
    assert sum(counts.values()) == 1000  # a partition: no loss, no dup
    again = kfold_assign(df, "doc_id", 5)
    assert folded.exceptAll(again).count() == 0  # rerun-stable


def test_kfold_decorrelated_from_train_val_test_split(spark):
    """Every (split, fold) cell populated — the digit-window
    decorrelation that makes CV-inside-train legitimate."""
    from dataengineer_job_scraper_etl_spark.queries.sampling import hash_split

    df = spark.range(0, 3000).select(F.col("id").alias("doc_id"))
    both = kfold_assign(hash_split(df, "doc_id"), "doc_id", 4)
    cells = both.groupBy("split", "fold").count()
    assert cells.count() == 12  # 3 splits x 4 folds, all non-empty


def test_kfold_rejects_degenerate_k(spark):
    df = spark.range(3).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError):
        kfold_assign(df, "doc_id", 1)


def _brute_pairs(vals, maxd=1):
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[-1]

    return {
        (a, b, lev(a, b))
        for a, b in itertools.combinations(sorted(set(vals)), 2)
        if lev(a, b) <= maxd
    }


def test_symdelete_matches_brute_force_all_edit_kinds(spark):
    from dataengineer_job_scraper_etl_spark.operators.fuzzyjoin import (
        symdelete_pairs,
    )

    vals = [
        "red ring", "red rung",     # substitution
        "bolt", "bolts",            # insertion at end
        "gear", "gea",              # deletion
        "wheel", "wheels", "whee",  # chain: each within 1 of 'wheel'
        "blue bolt",                # dist >1 from everything else
        "red ring",                 # duplicate value: distinct first
    ]
    df = spark.createDataFrame([(v,) for v in vals], ["name"])
    got = {
        (r["text_a"], r["text_b"], r["dist"])
        for r in symdelete_pairs(df, "name").collect()
    }
    assert got == _brute_pairs(vals)


def test_symdelete_candidate_generation_is_jvm_only(spark):
    from dataengineer_job_scraper_etl_spark.operators.fuzzyjoin import (
        symdelete_pairs,
    )

    df = spark.createDataFrame([("abc",), ("abd",)], ["name"])
    plan = (
        symdelete_pairs(df, "name")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_symdelete_randomized_dense_edit_space(spark):
    """Seeded randomized differential: all strings over {a,b} up to
    length 3 plus a seeded sample of length-4/5 strings — a DENSE edit
    space (many dist-1 pairs, incl. the empty string and single
    chars), checked pair-for-pair against brute force."""
    import itertools
    import random

    from dataengineer_job_scraper_etl_spark.operators.fuzzyjoin import (
        symdelete_pairs,
    )

    vals = [
        "".join(t)
        for n in range(4)
        for t in itertools.product("ab", repeat=n)
    ]
    rng = random.Random(42)
    vals += [
        "".join(rng.choice("abc") for _ in range(rng.choice((4, 5))))
        for _ in range(15)
    ]
    df = spark.createDataFrame([(v,) for v in vals], ["name"])
    got = {
        (r["text_a"], r["text_b"], r["dist"])
        for r in symdelete_pairs(df, "name").collect()
    }
    assert got == _brute_pairs(vals)
