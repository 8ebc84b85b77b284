"""End-to-end pre-training corpus pipeline (plans/corpus.py): the
catalog's LLM-data operators composed into one lazy plan. Pins the
stage semantics on a corpus with planted quality failures, exact dups,
and near-dups, plus the partitioned materialization."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.plans.corpus import (
    build_pretraining_corpus,
    write_pretraining_corpus,
)

def _doc_text(i: int) -> str:
    # 25 tokens, all unique to doc i: distinct docs share NO shingles,
    # so only the PLANTED duplicates cluster in the near-dup stage.
    return " ".join(f"t{i}w{j}" for j in range(25))


def _corpus(spark):
    rows = []
    for i in range(40):  # clean web docs
        rows.append((i, "web", _doc_text(i)))
    for i in range(100, 110):  # clean book docs
        rows.append((i, "books", _doc_text(i)))
    # exact duplicate of doc 0 (higher id -> must be dropped)
    rows.append((500, "web", _doc_text(0)))
    # near-duplicate of doc 1: first word changed, one token appended
    # (longer text -> the canonical rule must prefer IT over doc 1)
    rows.append((501, "web", "XX " + _doc_text(1)[len("t1w0 "):] + " tail"))
    # too short -> gated
    rows.append((502, "web", "tiny doc"))
    # low diversity -> gated ('spam' * 30)
    rows.append((503, "web", " ".join(["spam"] * 30)))
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_pipeline_stages_compose(spark):
    out = build_pretraining_corpus(_corpus(spark)).collect()
    ids = {r["doc_id"] for r in out}
    assert 502 not in ids and 503 not in ids  # quality gate
    assert 500 not in ids and 0 in ids        # exact dedup keeps min id
    # near-dup cluster {1, 501}: doc 501 is LONGER (appended token), so
    # the canonical rule (longest text, doc_id tiebreak) keeps 501
    assert 501 in ids and 1 not in ids
    assert len(ids) == 50                     # 40 + 10 planted clean
    # split labels present and shards start at 0 per (source, split)
    rows = {(r["source"], r["split"]) for r in out}
    assert all(r["split"] in {"train", "val", "test"} for r in out)
    first_shards = {}
    for r in sorted(out, key=lambda r: r["doc_id"]):
        key = (r["source"], r["split"])
        first_shards.setdefault(key, r["shard_id"])
    assert all(s == 0 for s in first_shards.values()), first_shards
    assert rows  # non-empty


def test_pipeline_mixture_bounds_sources(spark):
    out = build_pretraining_corpus(
        _corpus(spark), mixture_weights={"web": 0.5, "books": 0.5}
    ).collect()
    by_src = {}
    for r in out:
        by_src[r["source"]] = by_src.get(r["source"], 0) + 1
    # books (10 survivors) is the scarcest source -> kept whole, web
    # downsampled toward it
    assert by_src["books"] == 10
    assert by_src["web"] <= 16  # ~10 expected; threshold-hash slack


def test_pipeline_writes_partitioned_layout(spark, tmp_path):
    path = str(tmp_path / "corpus")
    n = write_pretraining_corpus(spark, _corpus(spark), path)
    assert n == 50
    back = spark.read.parquet(path)
    assert set(back.columns) == {
        "doc_id", "source", "split", "shard_id", "n_toks",
    }
    assert (tmp_path / "corpus" / "split=train" / "source=web").exists()


def test_pipeline_clean_stage_unifies_markup_variants(spark):
    """clean=True: two docs whose texts differ only by markup/entity
    noise become EXACT duplicates after stage-0 cleaning, so dedup
    collapses them — the reason cleaning must run before digests."""
    # per-token tags: every shingle differs from the clean twin, so
    # neither exact NOR near-dup can unify them without cleaning
    marked = " ".join(f"<b>{t}</b>" for t in _doc_text(1).split(" "))
    rows = [(1, "web", _doc_text(1)), (2, "web", marked)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = build_pretraining_corpus(df, clean=True).collect()
    assert [r["doc_id"] for r in out] == [1]  # exact dedup keeps min id
    dirty = build_pretraining_corpus(df, clean=False).collect()
    assert len(dirty) == 2  # without cleaning they do NOT collapse


def test_pipeline_downsampled_sources_fill_all_splits(spark):
    """End-to-end rendering of the round-4 HIGH advisory: a mixture
    that downsamples sources must still produce train AND val AND
    test (the correlated-hash bug emptied val/test for any source
    sampled at rate <= 0.75)."""
    rows = [(i, "web" if i % 2 else "books", _doc_text(i)) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = build_pretraining_corpus(
        df, mixture_weights={"web": 0.7, "books": 0.3}
    ).collect()
    for src in ("web", "books"):
        got = {r["split"] for r in out if r["source"] == src}
        assert got == {"train", "val", "test"}, (src, got)


def test_pipeline_boilerplate_strip_unifies_chromed_duplicates(spark):
    """Two docs with identical payload, one wrapped in nav chrome that
    8/10 docs share (DF 80% >= 20%): WITHOUT the strip they survive
    dedup as distinct docs; WITH strip_boilerplate=True the chrome is
    gone before digests are taken and exact dedup collapses them."""
    chrome = "cookie banner accept all terms apply privacy notice"  # 8 toks
    payload = {
        i: " ".join(f"b{i}w{j}" for j in range(24)) for i in range(18)
    }
    # chrome on 16/20 docs (DF 80% >= 20%); the payload shared by docs
    # 15 and 16 sits at DF 2/20 = 10%, safely BELOW the boilerplate bar
    rows = [(i, "web", f"{chrome} {payload[i]}") for i in range(16)]
    rows.append((16, "web", payload[15]))  # doc 15's payload, chrome-free
    rows.append((17, "web", payload[16]))  # unique, chrome-free
    rows.append((18, "web", payload[17]))  # unique, chrome-free
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )

    def no_pairs(df):
        return spark.createDataFrame([], "id_a long, id_b long")

    kept_plain = build_pretraining_corpus(docs, pair_fn=no_pairs)
    assert kept_plain.count() == 19  # chrome defeats exact dedup

    kept = build_pretraining_corpus(
        docs, strip_boilerplate=True, pair_fn=no_pairs
    )
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert len(ids) == 18  # docs 15 and 16 collapsed to one canonical
    assert (15 in ids) != (16 in ids)
    # survivors' token counts reflect the POST-strip text
    toks = {r["doc_id"]: r["n_toks"] for r in kept.collect()}
    assert all(v == 24 for v in toks.values())


def test_intake_default_minhash_path_classifies_planted_copies(spark):
    """corpus_pipeline_intake's oracle injects exact Jaccard (SQL-
    checkable but df-pruned); production uses the DEFAULT pair_fn —
    MinHash+LSH cross pairs, no df cap. Pin that the default path
    classifies a planted near-copy as near_dup, an exact copy as
    exact_dup, and that everything it discards never reaches the trim
    stages (removed counts stay 0 on dups)."""
    from dataengineer_job_scraper_etl_spark.plans.corpus import (
        incremental_intake,
    )

    base = [
        (i, " ".join(f"w{i}x{j}" for j in range(30)) + " common tail here")
        for i in range(8)
    ]
    corpus = spark.createDataFrame(base, "doc_id long, text string")
    evald = spark.createDataFrame(
        [(100, "benchmark question alpha beta gamma delta epsilon zeta "
               "eta theta iota kappa")],
        "doc_id long, text string",
    )
    near_text = "xxnear " + " ".join(f"w3x{j}" for j in range(1, 30)) \
        + " common tail here"
    batch = spark.createDataFrame(
        [
            (50, base[2][1]),              # exact copy of corpus doc 2
            (51, near_text),               # near copy of corpus doc 3
            (52, " ".join(f"q{j}" for j in range(40))),  # genuinely new
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in incremental_intake(
            batch, corpus, evald, min_tokens=5, max_tokens=200
        ).collect()
    }
    assert out[50]["status"] == "exact_dup"
    assert out[51]["status"] == "near_dup"
    assert out[52]["status"] == "new"
    for d in (50, 51):
        assert out[d]["removed_decon"] == 0
        assert out[d]["removed_exsub"] == 0


def test_pipeline_ppl_filter_drops_per_source_tail_tercile(spark):
    """ppl_keep_buckets=2: the LM trains on the dedup canonicals and
    each source's least-fluent tercile drops BEFORE the mixture — the
    kept set must be a subset of the unfiltered survivors with exactly
    ntile-2/3 of each source's canonicals."""
    corpus = _corpus(spark)
    base = build_pretraining_corpus(corpus).collect()
    filt = build_pretraining_corpus(corpus, ppl_keep_buckets=2).collect()
    base_ids = {r["doc_id"] for r in base}
    filt_ids = {r["doc_id"] for r in filt}
    assert filt_ids < base_ids  # strict subset: the tail really drops
    # per source: ntile(3) keeps buckets 1-2 = n - floor-ish n/3
    from collections import Counter

    base_n = Counter(r["source"] for r in base)
    filt_n = Counter(r["source"] for r in filt)
    for src, n in base_n.items():
        # ntile(3) keep-2-of-3: the dropped bucket is the LAST, which
        # ntile sizes at exactly n // 3 rows (extras go to early buckets)
        assert filt_n[src] == n - n // 3, (src, n, filt_n[src])


def test_pipeline_ppl_filter_prefers_fluent_docs(spark):
    """A doc whose transitions all repeat the corpus's dominant bigram
    must survive the ppl filter; gibberish-unique docs fill the tail."""
    rows = []
    # 9 fluent docs: "c1 c2 u" units repeat the common bigram (c1,c2)
    # 8x per doc (72 corpus-wide -> high-prob transition) while the
    # u-tokens keep diversity at 11/25 = 44% (over the 40% gate) and
    # pairwise Jaccard at 2/20 = 0.1 (under the 0.5 near-dup bar)
    for i in range(9):
        units = " ".join(f"c1 c2 u{i}x{j}" for j in range(8))
        rows.append((i, "web", f"{units} z{i}"))
    # 3 gibberish docs, ids chosen OFF the reference slice (% 5 != 0):
    # a reference member would self-score fluent — the exact CCNet
    # property the reference-trained design documents
    for i in range(21, 24):
        rows.append((i, "web", " ".join(f"g{i}x{j}" for j in range(25))))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = build_pretraining_corpus(docs, ppl_keep_buckets=2).collect()
    ids = {r["doc_id"] for r in out}
    # 12 canonicals -> tail tercile (4 worst) drops: all 3 gibberish
    # docs are in it (OOV against the reference-trained LM; the
    # fluent docs share the reference's dominant bigram)
    assert not ids & {21, 22, 23}
    assert len(ids) == 8
