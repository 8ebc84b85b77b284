"""Planted semantics + hypothesis differentials for the round-11
Markov family (queries/markov.py: transitions, stateful streaming
twin, anomaly scoring, incremental update), the Broder containment
family (queries/containment.py), PRF expansion (queries/prf.py), the
streaming multiscale interval twin, and the IVF probe ladder
(queries/annladder.py)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.catalog import all_queries


@pytest.fixture(scope="module")
def mk_dir(spark, tmp_path_factory):
    """Two users with known transition chains:
    user 1: view -> click -> view -> click -> purchase
    user 2: view -> view
    Global: view->click 2, click->view 1, view->view 1,
    click->purchase 1; P(click|view) = 2/3, P(view|view) = 1/3."""
    base = tmp_path_factory.mktemp("markov")
    t0 = datetime(2024, 3, 1)
    rows = []
    for i, et in enumerate(["view", "click", "view", "click", "purchase"]):
        rows.append((i, t0 + timedelta(minutes=i), 1, et, 1.0, "{}"))
    for i, et in enumerate(["view", "view"]):
        rows.append((10 + i, t0 + timedelta(minutes=i), 2, et, 1.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{base}/events.parquet")
    return str(base)


def test_markov_planted_transitions(spark, mk_dir):
    out = {
        (r.prev_type, r.next_type): (r.n, r.p)
        for r in all_queries()["events_type_markov_transitions"]
        .spark_fn(spark, mk_dir)
        .collect()
    }
    assert out == {
        ("view", "click"): (2, 0.666667),
        ("view", "view"): (1, 0.333333),
        ("click", "view"): (1, 0.5),
        ("click", "purchase"): (1, 0.5),
    }


def test_markov_rows_sum_to_one(spark, sf_dir):
    rows = (
        all_queries()["events_type_markov_transitions"]
        .spark_fn(spark, sf_dir)
        .groupBy("prev_type")
        .agg(F.round(F.sum("p"), 3).alias("s"))
        .collect()
    )
    assert rows and all(abs(r.s - 1.0) < 0.005 for r in rows)


def test_containment_catches_planted_excerpts(spark, sf_dir):
    """Every planted excerpt (doc_id % 20 == 0, < 150) must surface
    with containment 1.0 toward its source while the SAME pair's
    Jaccard sits well under the 0.5 near-dup bar — the inclusion
    shape symmetric Jaccard misses."""
    out = all_queries()["docs_shingle_containment"].spark_fn(
        spark, sf_dir
    ).collect()
    planted = {
        (r.doc_a, r.doc_b): r
        for r in out
        if r.doc_a >= 2_000_000 and r.doc_b == r.doc_a - 2_000_000
    }
    expected_sources = {d for d in range(0, 150, 20)}
    assert {b for (_, b) in planted} == expected_sources
    for r in planted.values():
        assert r.containment == 1.0, r
        # excerpt/source ratio bounds Jaccard: ~0.3 for full-length
        # (~100-token) sources, up to 0.5 when the source is barely
        # longer than the 30-token excerpt — always under containment
        assert r.jaccard <= 0.6, r
    assert min(r.jaccard for r in planted.values()) < 0.4


def test_containment_plan_has_no_cartesian(spark, sf_dir):
    df = all_queries()["docs_shingle_containment"].spark_fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_containment_dedup_drops_exactly_the_excerpts(spark, sf_dir):
    """Every planted excerpt is dominated (its source doc is always a
    valid dominator); kept docs carry no dominator; an excerpt never
    dominates its own strictly-larger source."""
    rows = all_queries()["docs_containment_dedup"].spark_fn(
        spark, sf_dir
    ).collect()
    dropped = {r.doc_id: r.dominated_by for r in rows if r.is_dropped}
    # the PLANTED guarantee: every excerpt is dominated (its source is
    # always a valid dominator; min-id may name another container —
    # on this ~30-word vocabulary a handful of short BASE docs are
    # genuinely >=95% contained in larger docs too, which the oracle
    # hash confirms as real corpus behavior, not a bug)
    for d in range(0, 150, 20):
        assert d + 2_000_000 in dropped, d
        assert dropped[d + 2_000_000] is not None
    kept = [r for r in rows if not r.is_dropped]
    assert all(r.dominated_by is None for r in kept)
    # full accounting: 150 base + 8 excerpts
    assert len(rows) == 158
    # an excerpt can never dominate its own strictly-larger source
    assert all(
        dropped.get(d) != d + 2_000_000 for d in range(0, 150, 20)
    )


def test_prf_expansion_is_deterministic_and_bounded(spark, sf_dir):
    """Two runs pick identical expansion-driven rankings (the mined
    terms are ppm-quantized with term tiebreaks); the output is the
    bounded top-20 with rank audit columns."""
    q = all_queries()["retrieval_prf_expansion"].spark_fn
    a = [tuple(r) for r in q(spark, sf_dir).collect()]
    b = [tuple(r) for r in q(spark, sf_dir).collect()]
    assert a == b
    assert len(a) == 20
    ranks = [r[2] for r in a]
    assert ranks == list(range(1, 21))
    # rank_first is 0 (absent) or within the feedback depth
    assert all(r[3] == 0 or 1 <= r[3] <= 10 for r in a)


def test_prf_second_pass_differs_from_first(spark, sf_dir):
    """The expansion must actually change retrieval: the expanded
    top-20 is not just the first-pass BM25 top-20 reordered —
    at least one doc enters on expansion terms alone."""
    from dataengineer_job_scraper_etl_spark.operators.ranking import (
        bm25_scores,
    )
    from dataengineer_job_scraper_etl_spark.queries.text import (
        _BM25_B,
        _BM25_K1,
        BM25_QUERY_TERMS,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    first20 = {
        r.doc_id
        for r in bm25_scores(
            docs, BM25_QUERY_TERMS, k1=_BM25_K1, b=_BM25_B
        )
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(20)
        .collect()
    }
    expanded20 = {
        r.doc_id
        for r in all_queries()["retrieval_prf_expansion"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    assert expanded20 - first20, "expansion changed nothing"


def test_streaming_multiscale_matches_batch_subset(spark, sf_dir):
    """Differential: the streamed tiered attribution equals the batch
    multiscale join restricted to the arriving purchase slice."""
    batch = {
        (r.event_id, r.w_start)
        for r in all_queries()["events_interval_join_multiscale"]
        .spark_fn(spark, sf_dir)
        .collect()
        if r.event_id % 10 >= 8
    }
    streamed = {
        (r.event_id, r.w_start)
        for r in all_queries()["streaming_interval_join_multiscale"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    assert streamed == batch and streamed


def test_prf_plan_nested_loops_are_only_1row_cross_folds(spark, sf_dir):
    """The PRF plan's only BroadcastNestedLoopJoins are the
    condition-free 1-row Cross folds (the corpus stats broadcast);
    an Inner/LeftOuter BNLJ here would be a data-sized broadcast
    regression (the curve-entry lint, extended to retrieval)."""
    df = all_queries()["retrieval_prf_expansion"].spark_fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    bad = [
        ln.strip()
        for ln in plan.splitlines()
        if "BroadcastNestedLoopJoin" in ln and "Cross" not in ln
    ]
    assert not bad, bad
    assert "CartesianProduct" not in plan


def test_streaming_markov_bridges_the_batch_boundary(spark, tmp_path):
    """A user whose consecutive events straddle the day-15 batch split
    must still produce the boundary transition — the per-user state is
    what carries it (a stateless per-batch lag would lose it)."""
    from datetime import datetime as dt

    rows = [
        # user 1: click on day 14 (batch 1), purchase on day 16
        # (batch 2) -> the ONLY click->purchase in the fixture crosses
        # the boundary
        (1, dt(2024, 3, 14, 12), 1, "click", 1.0, "{}"),
        (2, dt(2024, 3, 16, 12), 1, "purchase", 1.0, "{}"),
        # user 2: both in batch 1 (control)
        (3, dt(2024, 3, 1, 1), 2, "view", 1.0, "{}"),
        (4, dt(2024, 3, 1, 2), 2, "click", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {
        (r.prev_type, r.next_type): r.n
        for r in all_queries()["streaming_markov_transitions"]
        .spark_fn(spark, str(tmp_path))
        .collect()
    }
    assert out == {("click", "purchase"): 1, ("view", "click"): 1}


def test_markov_anomaly_scores_rare_transitions_higher(spark, tmp_path):
    """10 users take the common view->click path; one takes the rare
    view->purchase path — the rare journey's mean surprise must be
    the -ln(1/11) ppm value, the common ones -ln(10/11)."""
    import math
    from datetime import datetime as dt

    rows = []
    for u in range(10):
        rows.append((u * 2, dt(2024, 3, 1, 1), u, "view", 1.0, "{}"))
        rows.append((u * 2 + 1, dt(2024, 3, 1, 2), u, "click", 1.0, "{}"))
    rows.append((100, dt(2024, 3, 1, 1), 99, "view", 1.0, "{}"))
    rows.append((101, dt(2024, 3, 1, 2), 99, "purchase", 1.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {
        r.user_id: r.avg_surprise_ppm
        for r in all_queries()["events_user_markov_anomaly"]
        .spark_fn(spark, str(tmp_path))
        .collect()
    }
    rare = round(-math.log(1 / 11) * 1e6)
    common = round(-math.log(10 / 11) * 1e6)
    assert out[99] == rare
    assert all(out[u] == common for u in range(10))
    assert rare > 20 * common


def test_ivf_probe_ladder_measured_totals(spark, sf_dir):
    """The floors the oracle enforces are stated against measured
    totals; re-measure here so a silent recall regression (or an
    operator change) shows up as a failing NUMBER, not just a flipped
    boolean. Nested probing also makes per-probe totals monotone."""
    from dataengineer_job_scraper_etl_spark.operators.similarity import (
        ivf_topk,
    )
    from dataengineer_job_scraper_etl_spark.queries.annladder import (
        PROBE_FLOORS,
        PROBE_LADDER,
    )
    from dataengineer_job_scraper_etl_spark.queries.neardup import (
        EMBED_DIM,
        _vectors,
    )
    from dataengineer_job_scraper_etl_spark.queries.vectors import (
        vec_cosine_topk,
    )

    e, q = _vectors(spark, sf_dir)
    exact = vec_cosine_topk(spark, sf_dir).select("qid", "vec_id")
    totals = []
    for probes in PROBE_LADDER:
        ann = ivf_topk(
            e, q, dim=EMBED_DIM, k=10, n_probe=probes,
            centroid_cache_key=sf_dir,
        )
        totals.append(
            ann.join(exact, ["qid", "vec_id"], "left_semi").count()
        )
    assert totals == sorted(totals), totals
    for probes, total in zip(PROBE_LADDER, totals):
        assert total >= PROBE_FLOORS[probes], (probes, total)
    # full probe saturates at the fixture's tie ceiling, not 50
    assert totals[-1] == 45


def test_markov_incremental_counts_the_boundary_pair(spark, tmp_path):
    """The frozen-tail -> first-arriving boundary transition must be
    counted exactly once; a user with no corpus history contributes
    only within-slice transitions."""
    from datetime import datetime as dt

    rows = [
        # user 1: corpus click (day 14) -> arriving purchase (day 16)
        (1, dt(2024, 3, 14, 12), 1, "click", 1.0, "{}"),
        (2, dt(2024, 3, 16, 12), 1, "purchase", 1.0, "{}"),
        # user 2: arriving-only pair (no tail row -> no boundary)
        (3, dt(2024, 3, 17, 1), 2, "view", 1.0, "{}"),
        (4, dt(2024, 3, 17, 2), 2, "click", 1.0, "{}"),
        # user 3: corpus-only pair (frozen counts carry it)
        (5, dt(2024, 3, 2, 1), 3, "view", 1.0, "{}"),
        (6, dt(2024, 3, 2, 2), 3, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {
        (r.prev_type, r.next_type): r.n
        for r in all_queries()["events_markov_incremental_update"]
        .spark_fn(spark, str(tmp_path))
        .collect()
    }
    assert out == {
        ("click", "purchase"): 1,  # the boundary pair
        ("view", "click"): 1,      # within the arriving slice
        ("view", "purchase"): 1,   # frozen corpus counts
    }


# --- hypothesis differentials ------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_EV = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),            # user_id
        st.integers(min_value=0, max_value=30 * 1440),    # minutes
        st.sampled_from(["view", "click", "purchase"]),
    ),
    min_size=2,
    max_size=25,
    unique_by=lambda t: (t[0], t[1]),
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(evs=_EV)
def test_markov_incremental_equals_full_recount_property(
    spark, tmp_path_factory, evs
):
    """Differential property: frozen counts + tail index + arriving
    slice must equal the full recount on arbitrary event sets — users
    entirely before, entirely after, and straddling the day-15 split
    all occur under this generator."""
    from datetime import datetime as dt, timedelta

    tmp = tmp_path_factory.mktemp("mkivm")
    t0 = dt(2024, 3, 1)
    rows = [
        (i, t0 + timedelta(minutes=m), u, et, 1.0, "{}")
        for i, (u, m, et) in enumerate(evs)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp}/events.parquet")

    # pure-Python full recount
    from collections import Counter, defaultdict

    by_user = defaultdict(list)
    for eid, ts, u, et, _, _ in rows:
        by_user[u].append((ts, eid, et))
    counts = Counter()
    for u, seq in by_user.items():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            counts[(a, b)] += 1
    got = {
        (r.prev_type, r.next_type): r.n
        for r in all_queries()["events_markov_incremental_update"]
        .spark_fn(spark, str(tmp))
        .collect()
    }
    assert got == dict(counts)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]),
            min_size=3,
            max_size=40,
        ),
        min_size=2,
        max_size=10,
    )
)
def test_containment_dedup_matches_python_reference(
    spark, tmp_path_factory, texts
):
    """Differential property over a 4-letter alphabet (maximal shingle
    collisions): the dominated set and dominators must equal a pure-
    Python replay of the df-prune + containment + strictly-larger
    rule. Docs are sized past the excerpt-planting bound's slice so
    the planted excerpts (from docs at ids 0, 20, ... with >= 13
    tokens) also participate, exactly as in the entry."""
    tmp = tmp_path_factory.mktemp("ctprop")
    rows = [(i, " ".join(t), "en", "src0", len(" ".join(t)))
            for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")

    # pure-Python replay, mirroring queries/containment.py exactly
    docs = {i: t.split(" ") for i, t, _, _, _ in rows}
    # planted excerpts: doc_id % 20 == 0 -> tokens 11..40, id + 2e6
    for i in list(docs):
        if i % 20 == 0:
            docs[i + 2_000_000] = docs[i][10:40]
    sh = {
        i: {
            " ".join(t[j:j + 3]) for j in range(len(t) - 2)
        } if len(t) >= 3 else set()
        for i, t in docs.items()
    }
    from collections import Counter

    df_ct = Counter(s for ss in sh.values() for s in ss)
    kept = {i: {s for s in ss if df_ct[s] <= 10} for i, ss in sh.items()}
    expected = {}
    for a, sa in kept.items():
        if not sa:
            continue
        doms = []
        for b, sb in kept.items():
            if a == b or not sb:
                continue
            c = len(sa & sb) / len(sa)
            if c >= 0.95 and (
                len(sb) > len(sa) or (len(sb) == len(sa) and b < a)
            ):
                doms.append(b)
        expected[a] = min(doms) if doms else None
    # docs with empty kept sets are kept (never dominated)
    for i, ss in kept.items():
        if not ss:
            expected[i] = None

    got = {
        r.doc_id: r.dominated_by
        for r in all_queries()["docs_containment_dedup"]
        .spark_fn(spark, str(tmp))
        .collect()
    }
    assert got == expected
