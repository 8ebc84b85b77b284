"""Planted semantics for the round-11 analytics tail: market-basket
association metrics (queries/basket.py), multi-touch attribution +
its streaming twin (queries/attribution.py), RFM segmentation
(queries/rfm.py), seasonality autocorrelation (queries/seasonality.py),
and hashed-TF topic k-means (queries/topics.py)."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.catalog import all_queries


def test_copurchase_metrics_exact_values(spark, tmp_path):
    """6 orders: parts (1,2) co-occur in 3, part 1 in 5, part 2 in 4,
    part 3 in 2 (below the pair floor with anything). Expected:
    support 3/6, conf(1->2) 3/5, conf(2->1) 3/4, lift 3*6/(5*4)."""
    rows = []
    orders = [
        (100, [1, 2]),
        (101, [1, 2]),
        (102, [1, 2, 3]),
        (103, [1]),
        (104, [1, 3]),
        (105, [2]),
    ]
    ln = 0
    for o, parts in orders:
        for p in parts:
            ln += 1
            rows.append((o, p, 500, ln, 1.0, 10.0, 0.0, 0.0, "N", "O",
                         datetime(2024, 3, 1).date()))
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate date",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    out = all_queries()["lineitem_copurchase_lift"].spark_fn(
        spark, str(tmp_path)
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.part_a, r.part_b, r.co) == (1, 2, 3)
    assert r.support_ppm == round(3 / 6 * 1e6)
    assert r.conf_a_b_ppm == round(3 / 5 * 1e6)
    assert r.conf_b_a_ppm == round(3 / 4 * 1e6)
    assert r.lift_ppm == round(3 * 6 / (5 * 4) * 1e6)


def test_copurchase_prunes_infrequent_parts_before_pairing(spark, sf_dir):
    """Plan shape: the pair self-join keys on the order id only (plus
    the part inequality) — no cross join; every emitted pair clears
    the absolute floor."""
    df = all_queries()["lineitem_copurchase_lift"].spark_fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    rows = df.collect()
    assert all(r.co >= 3 for r in rows)
    # lift is symmetric; confidences are direction-specific
    assert all(r.conf_a_b_ppm >= r.support_ppm for r in rows)


def test_copurchase_mega_basket_capped(spark, tmp_path):
    """VERDICT r11 ask #4: a planted 200-part bot order — which would
    contribute C(200,2) = 19,900 pairs in a single task uncapped —
    is dropped BEFORE pair generation, marginals included: co(1,2)
    and the support denominator both read the 6 normal orders only,
    and every basket entering the self-join is bounded by the cap
    (the per-task pair bound is C(_MAX_BASKET, 2), not data-sized)."""
    from dataengineer_job_scraper_etl_spark.queries.basket import (
        _MAX_BASKET,
        _capped_baskets,
        basket_cap_audit,
    )

    rows = []
    orders = [
        (100, [1, 2]),
        (101, [1, 2]),
        (102, [1, 2, 3]),
        (103, [1]),
        (104, [1, 3]),
        (105, [2]),
        # the bot order: parts 1..200, including the (1, 2) pair that
        # would inflate co to 4 if the cap leaked
        (999, list(range(1, 201))),
    ]
    ln = 0
    for o, parts in orders:
        for p in parts:
            ln += 1
            rows.append((o, p, 500, ln, 1.0, 10.0, 0.0, 0.0, "N", "O",
                         datetime(2024, 3, 1).date()))
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate date",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")

    out = all_queries()["lineitem_copurchase_lift"].spark_fn(
        spark, str(tmp_path)
    ).collect()
    # identical to the 6-normal-order fixture: the mega basket is
    # invisible to counts AND to the support denominator
    assert len(out) == 1
    r = out[0]
    assert (r.part_a, r.part_b, r.co) == (1, 2, 3)
    assert r.support_ppm == round(3 / 6 * 1e6)

    # the audit row makes the drop observable
    audit = basket_cap_audit(spark, str(tmp_path)).collect()[0]
    assert (audit.n_baskets, audit.n_capped, audit.max_basket) == (7, 1, 200)

    # bounded per-task pair work: nothing entering the self-join
    # exceeds the cap, so per-order pair fan-out <= C(cap, 2)
    kept_sizes = (
        _capped_baskets(spark.read.parquet(f"{tmp_path}/lineitem.parquet"))
        .groupBy("o")
        .count()
        .agg(F.max("count").alias("mx"))
        .collect()[0]
        .mx
    )
    assert kept_sizes <= _MAX_BASKET


def test_copurchase_cap_is_identity_on_tpch(spark, sf_dir):
    """On every shipped fixture the largest basket is far below the
    cap, so the capped entry is the uncapped formulation bit-for-bit
    (which is why the driver oracle hash is unchanged by ask #4)."""
    from dataengineer_job_scraper_etl_spark.queries.basket import (
        _MAX_BASKET,
        basket_cap_audit,
    )

    audit = basket_cap_audit(spark, sf_dir).collect()[0]
    assert audit.n_capped == 0
    assert audit.max_basket <= _MAX_BASKET


def test_multitouch_attribution_planted_credits(spark, tmp_path):
    """One purchase at 12:00 with views at 11:00, 06:00 and (outside)
    36h earlier: linear = 1/2 each; decay splits by exp(-age/6h)
    quantized to ppm BEFORE normalization."""
    t0 = datetime(2024, 3, 2, 12, 0, 0)
    rows = [
        (1, t0, 7, "purchase", 1.0, "{}"),
        (2, t0 - timedelta(hours=1), 7, "view", 1.0, "{}"),
        (3, t0 - timedelta(hours=6), 7, "view", 1.0, "{}"),
        (4, t0 - timedelta(hours=36), 7, "view", 1.0, "{}"),  # outside
        (5, t0 + timedelta(hours=1), 7, "view", 1.0, "{}"),   # after
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {
        r.view_id: r
        for r in all_queries()["events_multitouch_attribution"]
        .spark_fn(spark, str(tmp_path))
        .collect()
    }
    assert set(out) == {2, 3}
    w2 = round(math.exp(-3600 / 21600.0) * 1e6)
    w3 = round(math.exp(-21600 / 21600.0) * 1e6)
    assert out[2].linear_credit_ppm == 500000
    assert out[3].linear_credit_ppm == 500000
    assert out[2].decay_credit_ppm == round(w2 * 1e6 / (w2 + w3))
    assert out[3].decay_credit_ppm == round(w3 * 1e6 / (w2 + w3))
    # the recent touch gets strictly more decay credit
    assert out[2].decay_credit_ppm > out[3].decay_credit_ppm


def test_multitouch_credits_sum_to_one_per_purchase(spark, sf_dir):
    sums = (
        all_queries()["events_multitouch_attribution"]
        .spark_fn(spark, sf_dir)
        .groupBy("purchase_id")
        .agg(
            F.sum("linear_credit_ppm").alias("lin"),
            F.sum("decay_credit_ppm").alias("dec"),
        )
        .collect()
    )
    assert sums
    for r in sums:
        # ppm rounding leaves at most n_touches/2 ppm of drift
        assert abs(r.lin - 1_000_000) < 500, r
        assert abs(r.dec - 1_000_000) < 500, r


def test_rfm_quartiles_rank_exact_rule(spark, tmp_path):
    """8 users with strictly increasing spend and frequency: the
    rank-exact rule puts exactly 2 users in each quartile (N=8
    divides evenly, edges at cum >= 2/4/6)."""
    from datetime import datetime as dt, timedelta

    rows = []
    eid = 0
    t0 = dt(2024, 3, 1, 12)
    for u in range(8):
        for k in range(u + 1):  # frequency u+1, spend 10*(u+1)
            eid += 1
            rows.append((eid, t0 + timedelta(minutes=k), u, "purchase",
                         10.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {
        r.user_id: r
        for r in all_queries()["events_user_rfm_segments"]
        .spark_fn(spark, str(tmp_path))
        .collect()
    }
    assert len(out) == 8
    # frequency quartiles: users 0-1 -> 1, 2-3 -> 2, 4-5 -> 3, 6-7 -> 4
    assert [out[u].f_q for u in range(8)] == [1, 1, 2, 2, 3, 3, 4, 4]
    assert [out[u].m_q for u in range(8)] == [1, 1, 2, 2, 3, 3, 4, 4]
    assert out[5].frequency == 6
    assert out[5].monetary_ppm == 6 * 10_000_000


def test_streaming_attribution_matches_batch_subset(spark, sf_dir):
    """Differential: the streamed attribution equals the batch entry
    restricted to the arriving (event_id % 10 >= 8) purchase slice."""
    batch = {
        (r.purchase_id, r.view_id, r.decay_credit_ppm)
        for r in all_queries()["events_multitouch_attribution"]
        .spark_fn(spark, sf_dir)
        .collect()
        if r.purchase_id % 10 >= 8
    }
    streamed = {
        (r.purchase_id, r.view_id, r.decay_credit_ppm)
        for r in all_queries()["streaming_multitouch_attribution"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    assert streamed == batch and streamed


def test_autocorrelation_finds_planted_daily_rhythm(spark, tmp_path):
    """10 days of a strict 24h volume rhythm (3 events in 'day' hours,
    1 in 'night' hours): r(24) must be exactly 1e6 ppm (the series
    repeats perfectly at lag 24) and r(1) well below it."""
    from datetime import datetime as dt, timedelta

    rows = []
    eid = 0
    t0 = dt(2024, 3, 1)
    for day in range(10):
        for hour in range(24):
            n = 3 if hour < 12 else 1
            for k in range(n):
                eid += 1
                rows.append(
                    (eid, t0 + timedelta(days=day, hours=hour, minutes=k),
                     1, "view", 1.0, "{}")
                )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {
        r.lag_hours: r.autocorr_ppm
        for r in all_queries()["events_hourly_autocorrelation"]
        .spark_fn(spark, str(tmp_path))
        .collect()
    }
    assert out[24] == 1_000_000        # perfect daily repetition
    assert out[168] == 1_000_000       # and weekly (24 | 168)
    assert out[1] < 900_000            # the hour-to-hour series is not flat


def test_hashtf_topics_cover_all_docs_and_use_multiple_clusters(
    spark, sf_dir
):
    """Every non-empty doc under the bound gets exactly one topic;
    the clustering actually separates (>= 2 occupied clusters on the
    real corpus) and topics are within range."""
    rows = all_queries()["docs_hashtf_kmeans_topics"].spark_fn(
        spark, sf_dir
    ).collect()
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids)) == 300
    topics = {r.topic for r in rows}
    assert topics <= {0, 1, 2, 3}
    assert len(topics) >= 2


# --- hypothesis differentials ------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    purchases=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),          # user
            st.integers(min_value=0, max_value=10 * 1440),  # minutes
            st.integers(min_value=1, max_value=500),        # value*10
        ),
        min_size=1,
        max_size=15,
        unique_by=lambda t: (t[0], t[1]),
    )
)
def test_rfm_property_matches_python_reference(
    spark, tmp_path_factory, purchases
):
    """Differential property: quartile assignment under the rank-exact
    rule (edge_k = min metric with cum >= ceil(k*N/4); bucket = 1 +
    #edges strictly below) must equal a pure-Python replay on
    arbitrary purchase sets — heavy ties included (values quantized
    to 0.1 steps, minute-grain recency collisions)."""
    from datetime import datetime as dt, timedelta
    import math

    tmp = tmp_path_factory.mktemp("rfmprop")
    t0 = dt(2024, 3, 1)
    rows = [
        (i, t0 + timedelta(minutes=m), u, "purchase", v / 10.0, "{}")
        for i, (u, m, v) in enumerate(purchases)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp}/events.parquet")

    # pure-Python replay of queries/rfm.py
    from collections import defaultdict

    per_user = defaultdict(list)
    for eid, ts, u, _, v, _ in rows:
        per_user[u].append((ts, v))
    now_ts = max(ts for _, ts, *_ in [(0, r[1]) for r in rows])
    metrics = {}
    for u, evs in per_user.items():
        last = max(ts for ts, _ in evs)
        rec = round((now_ts - last).total_seconds() / 86400.0 * 1e6)
        freq = len(evs)
        mon = sum(round(v * 1e6) for _, v in evs)
        metrics[u] = (rec, freq, mon)
    n = len(metrics)

    def buckets(idx):
        vals = sorted(m[idx] for m in metrics.values())
        edges = []
        for k in (1, 2, 3):
            t = math.ceil(k * n / 4)
            edges.append(vals[t - 1])
        return {
            u: 1 + sum(1 for e in edges if m[idx] > e)
            for u, m in metrics.items()
        }

    rq, fq, mq = buckets(0), buckets(1), buckets(2)
    got = {
        r.user_id: (r.r_q, r.f_q, r.m_q, r.frequency, r.monetary_ppm)
        for r in all_queries()["events_user_rfm_segments"]
        .spark_fn(spark, str(tmp))
        .collect()
    }
    assert set(got) == set(metrics)
    for u in metrics:
        assert got[u] == (
            rq[u], fq[u], mq[u], metrics[u][1], metrics[u][2]
        ), (u, got[u])


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),
            st.integers(min_value=0, max_value=5 * 1440),
            st.booleans(),
        ),
        min_size=1,
        max_size=20,
        unique_by=lambda t: (t[0], t[1]),
    )
)
def test_attribution_property_matches_python_reference(
    spark, tmp_path_factory, evs
):
    """Differential property: every (purchase, prior-24h view) pair
    with the exact ppm-quantized linear and decay credits, on
    arbitrary event sets (boundary timestamps included)."""
    from datetime import datetime as dt, timedelta
    import math

    tmp = tmp_path_factory.mktemp("attrprop")
    t0 = dt(2024, 3, 1)
    rows = [
        (i, t0 + timedelta(minutes=m), u,
         "purchase" if p else "view", 1.0, "{}")
        for i, (u, m, p) in enumerate(evs)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp}/events.parquet")

    expected = {}
    for pid, pts, pu, pet, _, _ in rows:
        if pet != "purchase":
            continue
        touches = [
            (vid, vts)
            for vid, vts, vu, vet, _, _ in rows
            if vet == "view" and vu == pu
            and vts < pts and vts >= pts - timedelta(hours=24)
        ]
        if not touches:
            continue
        ws = {
            vid: round(
                math.exp(-(pts - vts).total_seconds() / 21600.0) * 1e6
            )
            for vid, vts in touches
        }
        tot = sum(ws.values())
        for vid, w in ws.items():
            expected[(pid, vid)] = (
                round(1e6 / len(ws)),
                round(w * 1e6 / tot),
            )
    got = {
        (r.purchase_id, r.view_id): (
            r.linear_credit_ppm, r.decay_credit_ppm
        )
        for r in all_queries()["events_multitouch_attribution"]
        .spark_fn(spark, str(tmp))
        .collect()
    }
    assert got == expected


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    hours=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=200),  # hour offset
            st.integers(min_value=1, max_value=5),    # events that hour
        ),
        min_size=4,
        max_size=30,
        unique_by=lambda t: t[0],
    )
)
def test_autocorrelation_property_matches_numpy(
    spark, tmp_path_factory, hours
):
    """Differential property vs numpy: for every lag with >= 2
    aligned pairs and nonzero variance on both sides, the engine's
    ppm autocorrelation equals numpy's Pearson r (+-1 ppm for the
    rounding); degenerate lags (absent or zero-variance) produce no
    finite row on either side."""
    import numpy as np
    from datetime import datetime as dt, timedelta

    tmp = tmp_path_factory.mktemp("acprop")
    t0 = dt(2024, 3, 1)
    rows = []
    eid = 0
    for h, n in hours:
        for k in range(n):
            eid += 1
            rows.append(
                (eid, t0 + timedelta(hours=h, minutes=k), 1, "view",
                 1.0, "{}")
            )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp}/events.parquet")

    series = dict(hours)
    got = {
        r.lag_hours: (r.n_pairs, r.autocorr_ppm)
        for r in all_queries()["events_hourly_autocorrelation"]
        .spark_fn(spark, str(tmp))
        .collect()
    }
    for lag in (1, 24, 168):
        pairs = [
            (series[h], series[h + lag])
            for h in series
            if h + lag in series
        ]
        if not pairs:
            assert lag not in got or got[lag][0] == 0
            continue
        n_pairs, r_ppm = got[lag]
        assert n_pairs == len(pairs)
        x = np.array([p[0] for p in pairs], dtype=float)
        y = np.array([p[1] for p in pairs], dtype=float)
        if len(pairs) < 2 or x.std() == 0 or y.std() == 0:
            assert r_ppm is None
            continue
        ref = float(np.corrcoef(x, y)[0, 1])
        assert r_ppm is not None and abs(r_ppm - round(ref * 1e6)) <= 1, (
            lag, r_ppm, ref
        )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    baskets=st.lists(
        st.lists(
            st.integers(min_value=1, max_value=6),  # part ids
            min_size=1,
            max_size=4,
            unique=True,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_copurchase_property_matches_python_reference(
    spark, tmp_path_factory, baskets
):
    """Differential property: support/confidence/lift for every pair
    clearing the co >= 3 floor equals a pure-Python replay over
    arbitrary small basket sets."""
    from collections import Counter
    from datetime import datetime as dt
    from itertools import combinations

    tmp = tmp_path_factory.mktemp("bkprop")
    rows = []
    ln = 0
    for o, parts in enumerate(baskets):
        for p in parts:
            ln += 1
            rows.append((100 + o, p, 1, ln, 1.0, 1.0, 0.0, 0.0, "N",
                         "O", dt(2024, 3, 1).date()))
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate date",
    ).write.mode("overwrite").parquet(f"{tmp}/lineitem.parquet")

    n_orders = len(baskets)
    pc = Counter(p for b in baskets for p in set(b))
    co = Counter()
    for b in baskets:
        for a, c in combinations(sorted(set(b)), 2):
            co[(a, c)] += 1
    expected = {}
    for (a, c), k in co.items():
        if k >= 3:
            expected[(a, c)] = (
                k,
                round(k * 1e6 / n_orders),
                round(k * 1e6 / pc[a]),
                round(k * 1e6 / pc[c]),
                round(k * n_orders * 1e6 / (pc[a] * pc[c])),
            )
    got = {
        (r.part_a, r.part_b): (
            r.co, r.support_ppm, r.conf_a_b_ppm, r.conf_b_a_ppm,
            r.lift_ppm,
        )
        for r in all_queries()["lineitem_copurchase_lift"]
        .spark_fn(spark, str(tmp))
        .collect()
    }
    assert got == expected


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d", "e", "f"]),
            min_size=1,
            max_size=20,
        ),
        min_size=5,
        max_size=12,
    )
)
def test_topics_property_matches_python_lloyd(
    spark, tmp_path_factory, texts
):
    """Differential property: the full featurize -> normalize ->
    quantized-Lloyd -> assign chain equals a pure-Python replay
    (same md5-nibble buckets, same round(mean, 6) quantization, same
    (d2, cid) tie-break) on arbitrary small corpora."""
    import hashlib

    tmp = tmp_path_factory.mktemp("tpprop")
    rows = [(i, " ".join(t), "en", "src0", len(" ".join(t)))
            for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")

    DIM, K = 16, 4

    def featurize(tokens):
        v = [0.0] * DIM
        for tk in tokens:
            if tk:
                v[int(hashlib.md5(tk.encode()).hexdigest()[0], 16)] += 1
        n = sum(x * x for x in v) ** 0.5
        return [x / n for x in v] if n > 0 else None

    emb = {}
    for i, t in enumerate(texts):
        e = featurize(t)
        if e is not None:
            emb[i] = e
    if len(emb) == 0:
        return  # nothing to cluster on either side

    def d2(a, b):
        # SEQUENTIAL sum, exactly the engines' list_sum order
        s = 0.0
        for x, y in zip(a, b):
            s += (x - y) ** 2
        return s

    cents = [list(emb[i]) for i in sorted(emb)[:K]]

    def assign(cs):
        out = {}
        for i, e in emb.items():
            best = min(range(len(cs)), key=lambda c: (d2(e, cs[c]), c))
            out[i] = best
        return out

    for _ in range(2):
        a = assign(cents)
        new = []
        for c in range(len(cents)):
            members = [emb[i] for i, cc in a.items() if cc == c]
            if members:
                new.append([
                    round(sum(m[j] for m in members) / len(members), 6)
                    for j in range(DIM)
                ])
            else:
                new.append(cents[c])
        cents = new
    expected = assign(cents)

    got = {
        r.doc_id: r.topic
        for r in all_queries()["docs_hashtf_kmeans_topics"]
        .spark_fn(spark, str(tmp))
        .collect()
    }
    assert got == expected


def test_copurchase_salted_equals_uncapped_on_mega_basket(spark, tmp_path):
    """VERDICT r12 ask #6: the salted variant INCLUDES the planted
    200-part bot order and must be bit-identical to the plain
    uncapped formulation — triangle replication is pure physical
    strategy. The plain reference is the same pipeline with the cap
    raised above the largest basket (s = 1 everywhere == the plain
    self-join), and per-posting replication stays bounded by
    s = ceil(B / cap)."""
    from dataengineer_job_scraper_etl_spark.queries.basket import (
        _MAX_BASKET,
        _salted_pairs,
        lineitem_copurchase_lift_salted,
    )

    rows = []
    orders = [
        (100, [1, 2]),
        (101, [1, 2]),
        (102, [1, 2, 3]),
        (103, [1]),
        (104, [1, 3]),
        (105, [2]),
        (999, list(range(1, 201))),  # the bot order, now KEPT
    ]
    ln = 0
    for o, parts in orders:
        for p in parts:
            ln += 1
            rows.append((o, p, 500, ln, 1.0, 10.0, 0.0, 0.0, "N", "O",
                         datetime(2024, 3, 1).date()))
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate date",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")

    got = sorted(
        tuple(r) for r in lineitem_copurchase_lift_salted(
            spark, str(tmp_path)
        ).collect()
    )
    # the mega basket participates: co(1,2) = 4 (orders 100/101/102/999)
    # over 7 orders total
    by_pair = {(r[0], r[1]): r for r in got}
    assert by_pair[(1, 2)][2] == 4
    assert by_pair[(1, 2)][3] == round(4 / 7 * 1e6)

    # bit-identical to the plain join (cap above the largest basket
    # degenerates every order to s=1, i.e. the unsalted self-join)
    op = (
        spark.read.parquet(f"{tmp_path}/lineitem.parquet")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    pc = op.groupBy("p").agg(F.count(F.lit(1)).alias("cnt"))
    freq = op.join(
        pc.filter(F.col("cnt") >= 3).select("p"), "p", "left_semi"
    )
    plain = sorted(
        (r["part_a"], r["part_b"], r["co"])
        for r in _salted_pairs(freq, 1_000_000).collect()
    )
    salted = sorted(
        (r["part_a"], r["part_b"], r["co"])
        for r in _salted_pairs(freq, _MAX_BASKET).collect()
    )
    assert salted == plain

    # replication bound: the 200-part basket splits into
    # s = ceil(200/64) = 4 groups -> each posting carried 4x, never
    # basket-sized
    from math import ceil
    assert ceil(200 / _MAX_BASKET) == 4
