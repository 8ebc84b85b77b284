"""PCA top-component scores over the ``embeddings`` fixture
(LLM-curation extension, SURVEY §2.16).

The whole algorithm is hash-checked, not just a variance floor: the
distributed one-pass Gram (``operators/pca.py``) quantizes the column
means, every covariance entry, and every power-iteration iterate with
the EXPLICIT half-up rule ``floor(x * 1e6 + 0.5) / 1e6`` that DuckDB
replays verbatim — one tie rule on both engines (the rounding-mode
seam ADVICE r6 flagged on the k-means quantizer is designed out here).
The oracle recomputes means -> covariance -> 8 unrolled matvec CTEs ->
the per-vector projection, so a drift anywhere in the trajectory flips
the hash.

Why it belongs in the curation block: PCA projection/whitening is the
standard precursor to OPQ/IVF index builds (the ann_* entries) and the
1-D score is the classic embedding-drift monitor statistic. The
reference repo (366-LoC Polars ETL) has no linear algebra; this is
north-star scope like the k-means/SemDeDup family.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.catalog import register
from dataengineer_job_scraper_etl_spark.operators.pca import (
    pca_top_component,
)

DIM = 64
N_ITER = 8
_Q = 1_000_000  # 6-decimal half-up quantum, shared with operators/pca.py


def _pca_common(
    train_where: str = "",
    p: str = "",
    emb_sql: str | None = None,
    with_kw: bool = True,
) -> str:
    """CTE chain: means -> upper-triangle Gram -> quantized covariance
    -> {N_ITER} unrolled power-iteration rounds, every stage quantized
    with the shared explicit half-up rule. ``train_where`` restricts
    the TRAINING rows (frozen-baseline monitor entries train on the
    reference slice only); ``emb`` always holds the full corpus so
    downstream CTEs can score everything against the trained axes.

    ``p`` prefixes every CTE name so the chain can be instantiated
    MORE THAN ONCE in one statement (the retrain entry trains v1 on
    the reference slice and v2 on the shifted slice — VERDICT r9 ask
    #4); ``emb_sql`` swaps the corpus source (e.g. the planted-shift
    projection); ``with_kw=False`` drops the leading WITH for a
    second instantiation. Defaults emit the exact pre-r10 text, so
    every existing oracle is byte-identical.

    Every multiply-referenced CTE is AS MATERIALIZED: DuckDB 1.0
    INLINES plain CTEs per reference, and each ``v{{t}}`` references
    ``w{{t}}`` twice (matvec + norm subquery), so without
    materialization the plan tree doubles per unrolled round —
    2^{N_ITER} re-evaluations of the Gram scan (observed: minutes
    instead of milliseconds)."""
    if emb_sql is None:
        emb_sql = "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings"
    lead = "\nWITH " if with_kw else ",\n"
    parts = [
        f"""{lead}{p}emb AS MATERIALIZED (
  {emb_sql}),
{p}tr AS MATERIALIZED (SELECT vec_id, e FROM {p}emb{train_where}),
{p}nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM {p}tr),
{p}mean AS MATERIALIZED (
  SELECT i, floor(sum(e[i]) / (SELECT n FROM {p}nn) * {_Q} + 0.5) / {_Q} AS m
  FROM {p}tr, range(1, {DIM + 1}) r(i) GROUP BY i),
{p}gram AS (
  SELECT i, j, sum(e[i] * e[j]) AS g
  FROM {p}tr, range(1, {DIM + 1}) r(i), range(1, {DIM + 1}) r2(j)
  WHERE i <= j GROUP BY i, j),
{p}covu AS (
  SELECT g.i, g.j,
         floor((g.g / (SELECT n FROM {p}nn) - mi.m * mj.m) * {_Q} + 0.5)
           / {_Q} AS c
  FROM {p}gram g JOIN {p}mean mi ON g.i = mi.i JOIN {p}mean mj ON g.j = mj.i),
{p}cov AS MATERIALIZED (
  SELECT i, j, c FROM {p}covu
  UNION ALL SELECT j AS i, i AS j, c FROM {p}covu WHERE i < j),
{p}v0 AS (SELECT i AS j, {1.0 / (DIM ** 0.5)!r} AS x
       FROM range(1, {DIM + 1}) r(i))"""
    ]
    for t in range(1, N_ITER + 1):
        parts.append(
            f""",
{p}w{t} AS MATERIALIZED (
  SELECT {p}cov.i AS j, sum({p}cov.c * v.x) AS w
  FROM {p}cov JOIN {p}v{t - 1} v ON {p}cov.j = v.j GROUP BY {p}cov.i),
{p}v{t} AS MATERIALIZED (
  SELECT j, floor(w / sqrt((SELECT sum(w * w) FROM {p}w{t}))
                * {_Q} + 0.5) / {_Q} AS x FROM {p}w{t})"""
        )
    return "".join(parts)


def _pca_chain(train_where: str = "") -> str:
    """_pca_common + the per-vector PC1 projection CTE."""
    return (
        _pca_common(train_where)
        + f""",
scores AS MATERIALIZED (
  SELECT emb.vec_id,
         floor(sum((emb.e[v.j] - mn.m) * v.x) * {_Q} + 0.5) / {_Q} AS pc1
  FROM emb CROSS JOIN v{N_ITER} v JOIN mean mn ON v.j = mn.i
  GROUP BY emb.vec_id)"""
    )


def _pca_top2_common() -> str:
    """PC1 chain + Hotelling deflation (cov2 = quantize(cov - lam1 *
    v v^T); lam1 and v are already quantized, so cov2 is made of
    engine-shared doubles) + a second run of quantized power-iteration
    rounds, ending in a ``scores2`` CTE with BOTH projections."""
    parts = [
        _pca_common(),
        f""",
lam1 AS MATERIALIZED (
  SELECT floor(sqrt(sum(w * w)) * {_Q} + 0.5) / {_Q} AS l FROM w{N_ITER}),
cov2 AS MATERIALIZED (
  SELECT c.i, c.j,
         floor((c.c - (SELECT l FROM lam1) * vi.x * vj.x) * {_Q} + 0.5)
           / {_Q} AS c
  FROM cov c JOIN v{N_ITER} vi ON vi.j = c.i
             JOIN v{N_ITER} vj ON vj.j = c.j),
b0 AS (SELECT i AS j, {1.0 / (DIM ** 0.5)!r} AS x
       FROM range(1, {DIM + 1}) r(i))""",
    ]
    for t in range(1, N_ITER + 1):
        parts.append(
            f""",
y{t} AS MATERIALIZED (
  SELECT cov2.i AS j, sum(cov2.c * v.x) AS w
  FROM cov2 JOIN b{t - 1} v ON cov2.j = v.j GROUP BY cov2.i),
b{t} AS MATERIALIZED (
  SELECT j, floor(w / sqrt((SELECT sum(w * w) FROM y{t}))
                * {_Q} + 0.5) / {_Q} AS x FROM y{t})"""
        )
    parts.append(
        f""",
scores2 AS MATERIALIZED (
  SELECT emb.vec_id,
         floor(sum((emb.e[v.j] - mn.m) * v.x) * {_Q} + 0.5) / {_Q} AS pc1,
         floor(sum((emb.e[v.j] - mn.m) * b.x) * {_Q} + 0.5) / {_Q} AS pc2
  FROM emb CROSS JOIN v{N_ITER} v
  JOIN b{N_ITER} b ON b.j = v.j
  JOIN mean mn ON v.j = mn.i
  GROUP BY emb.vec_id)"""
    )
    return "".join(parts)


def _pca_oracle() -> str:
    return _pca_chain() + "\nSELECT vec_id, pc1 FROM scores\n"


def _pca_top2_oracle() -> str:
    return _pca_top2_common() + "\nSELECT vec_id, pc1, pc2 FROM scores2\n"


# Frozen-baseline drift monitor: the PCA axes AND the decile edges are
# learned on the reference slice only (vec_id % 10 < 8 — the repo's
# incremental-ingest convention), then the arriving slice is scored
# against them. Population Stability Index per decile bucket, with
# Laplace-style smoothing (n + 0.5) / (N + 5) so an empty bucket never
# hits ln(0) — emitted in ppm as an integer so the only doubles in the
# hash are engine-shared.
_REF_WHERE = " WHERE vec_id % 10 < 8"
_CUR_PRED = "vec_id % 10 >= 8"
_N_BUCKETS = 10


def _psi_oracle() -> str:
    # Outer parens are load-bearing: these strings are substituted into
    # `ln({smooth_c} / {smooth_r}}` — without them SQL's left-
    # associative division turns the ratio into a/(b*c*d).
    smooth_r = "((n_ref + 0.5) / ((SELECT n FROM nr) + 5.0))"
    smooth_c = "((n_cur + 0.5) / ((SELECT n FROM nc) + 5.0))"
    return (
        _pca_chain(_REF_WHERE)
        + f""",
ref AS MATERIALIZED (
  SELECT vec_id, pc1 FROM scores WHERE NOT ({_CUR_PRED})),
cur AS MATERIALIZED (
  SELECT vec_id, pc1 FROM scores WHERE {_CUR_PRED}),
nr AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM ref),
nc AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM cur),
hist AS (SELECT pc1, count(*) AS c FROM ref GROUP BY pc1),
cum AS MATERIALIZED (
  SELECT pc1, sum(c) OVER (ORDER BY pc1) AS cum FROM hist),
edges AS MATERIALIZED (
  SELECT k, min(pc1) AS e
  FROM range(1, {_N_BUCKETS}) r(k) JOIN cum
    ON cum.cum >= (k * (SELECT n FROM nr) + {_N_BUCKETS - 1})
                  // {_N_BUCKETS}
  GROUP BY k),
bref AS (
  SELECT r.vec_id, 1 + count(e.k) AS b
  FROM ref r LEFT JOIN edges e ON e.e < r.pc1 GROUP BY r.vec_id),
bcur AS (
  SELECT r.vec_id, 1 + count(e.k) AS b
  FROM cur r LEFT JOIN edges e ON e.e < r.pc1 GROUP BY r.vec_id),
cref AS (SELECT b, count(*) AS n FROM bref GROUP BY b),
ccur AS (SELECT b, count(*) AS n FROM bcur GROUP BY b),
joined AS (
  SELECT k AS bucket,
         coalesce(cr.n, 0) AS n_ref, coalesce(cc.n, 0) AS n_cur
  FROM range(1, {_N_BUCKETS + 1}) r(k)
  LEFT JOIN cref cr ON cr.b = k LEFT JOIN ccur cc ON cc.b = k)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(n_ref AS BIGINT) AS n_ref,
       CAST(n_cur AS BIGINT) AS n_cur,
       CAST(floor(({smooth_c} - {smooth_r})
                  * ln({smooth_c} / {smooth_r}) * {_Q} + 0.5)
            AS BIGINT) AS psi_contrib_ppm
FROM joined
"""
    )


def pc1_score_expr(m: list[float], v: list[float]):
    """Quantized mean-centered PC1 projection of ``embedding`` as a
    pure codegen column (64 literal terms — the k-means literal-argmin
    shape; streaming-safe: no state, no join).

    Built as ONE ``F.expr`` SQL string (r14): the Column-API loop this
    replaces issued ~6 py4j roundtrips per term (~400 per call), and
    the monitor entries build this projection several times per run —
    profiling showed the refreeze entry spending more DRIVER time
    constructing these trees than running its jobs (guide §7.3,
    driver-side work). The SQL string parses to the same operator
    tree: left-associative term sum, per-term
    (CAST(embedding[j] AS DOUBLE) - m_j) * v_j, and the same
    floor-half-up quantization. Literals ride as CAST('<repr>' AS
    DOUBLE) — Python float repr round-trips exactly through
    Double.parseDouble, so every literal is the bit-identical double
    F.lit produced (pinned value-identical against the verbatim old
    formulation in tests/test_r14_optimizations.py)."""
    terms = " + ".join(
        f"(CAST(embedding[{j}] AS DOUBLE) - CAST('{m[j]!r}' AS DOUBLE))"
        f" * CAST('{v[j]!r}' AS DOUBLE)"
        for j in range(DIM)
    )
    q = float(_Q)
    return F.expr(
        f"FLOOR(({terms}) * CAST('{q!r}' AS DOUBLE)"
        f" + CAST('0.5' AS DOUBLE)) / CAST('{q!r}' AS DOUBLE)"
    )


def bucket_expr(edges: list[float], col: str = "pc1"):
    """1 + number of frozen edges strictly below the score. One
    ``F.expr`` string for the same ~50-py4j-roundtrip reason as
    ``pc1_score_expr``; CASE WHEN mirrors when/otherwise exactly
    (NULL score -> every branch 0, same as before)."""
    cases = " + ".join(
        f"(CASE WHEN `{col}` > CAST('{ek!r}' AS DOUBLE)"
        " THEN 1 ELSE 0 END)"
        for ek in edges
    )
    return F.expr(f"({cases}) + 1")


def rank_exact_edges(
    scored: DataFrame, col: str, n_buckets: int, n_total: int
) -> list[float]:
    """Rank-exact bucket edges: distinct-score histogram -> cumulative
    sum over the COMPRESSED histogram via the two-stage parallel
    prefix (operators/prefix.py — the histogram is distinct quantized
    scores, corpus-cardinality-bounded, NOT cluster-width-bounded, so
    it gets the real prefix, not a single-task window) -> edge_k =
    min score with cum >= ceil(k*N/n_buckets). Engine-portable where
    percentile_disc/approx semantics diverge; the (n_buckets - 1)-row
    collect is bounded."""
    from dataengineer_job_scraper_etl_spark.operators.prefix import (
        global_prefix,
    )

    hist = scored.groupBy(col).count()
    cum = global_prefix(hist, [F.asc(col)], sums={"cum": "count"})
    thresholds = [
        (k * n_total + n_buckets - 1) // n_buckets
        for k in range(1, n_buckets)
    ]
    row = cum.agg(
        *[
            F.min(F.when(F.col("cum") >= t, F.col(col))).alias(f"e{k}")
            for k, t in enumerate(thresholds, start=1)
        ]
    ).collect()[0]
    return [row[f"e{k}"] for k in range(1, n_buckets)]


def rank_exact_edges_n(
    scored: DataFrame, col: str, n_buckets: int
) -> tuple[list[float], int]:
    """(edges, n_total) in ONE action (r14 optimization): the separate
    ``scored.count()`` every monitor train ran before the edge collect
    was a full extra pass over the scored frame for a number the
    cumulative histogram already ends at. n_total rides the same
    bounded collect as a ``max(cum)`` cross-join (the total subtree
    re-reads the prefix pass's lazily-checkpointed scan, never the
    corpus), and the threshold rule is applied in its algebraically
    identical integer form: for integer cum,
        cum >= ceil(k*n/b)  <=>  cum * b >= k * n
    so the returned edges are value-identical to
    ``rank_exact_edges(scored, col, n_buckets, scored.count())``
    (pinned in tests/test_r14_optimizations.py)."""
    from dataengineer_job_scraper_etl_spark.operators.prefix import (
        global_prefix,
    )

    hist = scored.groupBy(col).count()
    cum = global_prefix(hist, [F.asc(col)], sums={"cum": "count"})
    tot = cum.agg(F.max("cum").alias("__n"))
    row = (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.max("__n").alias("n"),
            *[
                F.min(
                    F.when(
                        F.col("cum") * F.lit(n_buckets)
                        >= F.lit(k) * F.col("__n"),
                        F.col(col),
                    )
                ).alias(f"e{k}")
                for k in range(1, n_buckets)
            ],
        )
        .collect()[0]
    )
    n = int(row["n"]) if row["n"] is not None else 0
    return [row[f"e{k}"] for k in range(1, n_buckets)], n


# (means, loadings, edges, n_ref) keyed by sf_dir: the frozen monitor
# is trained once on the reference slice and served to both the batch
# and the streaming entry (same train-once contract as the centroid
# caches; the key names the corpus AND the slice convention).
_MONITOR_CACHE: dict[object, tuple] = {}


def frozen_pc1_monitor(
    spark: SparkSession, sf_dir: str
) -> tuple[list[float], list[float], list[float], int]:
    """(means, loadings, decile_edges, n_ref), all learned on the
    REFERENCE slice only (``vec_id % 10 < 8``). Edges are rank-exact:
    distinct-score histogram -> cumulative sum -> min score whose
    cumulative count reaches ceil(k*N/10). The ordered prefix sum runs
    over the COMPRESSED histogram (distinct quantized scores), and
    becomes a two-stage parallel prefix at real scale; the 9-edge
    collect is bounded."""
    key = ("pc1-monitor", sf_dir)
    if key in _MONITOR_CACHE:
        return _MONITOR_CACHE[key]
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    ref_rows = e.filter(~F.expr(_CUR_PRED))
    out = train_pc1_monitor(ref_rows, pca_key=("pca-ref", sf_dir))
    _MONITOR_CACHE[key] = out
    return out


def train_pc1_monitor(
    ref_rows: DataFrame, pca_key: object = None, stage_ref: bool = True
) -> tuple[list[float], list[float], list[float], int]:
    """Freeze a PC1 drift monitor on a reference frame: (means,
    loadings, rank-exact decile edges, n_ref). The reusable core of
    ``frozen_pc1_monitor`` — the retrain path re-freezes through this
    with a NEW pca_key (slice tag) so stale cache entries can never
    shadow the new axes.

    ``stage_ref`` (r14, VERDICT r13 ask #5): the reference slice feeds
    TWO corpus-scale consumers — the Gram pass and the edge-scoring
    histogram — so by default it is staged once and the second
    consumer reads the checkpoint instead of re-running the scan +
    filter. Callers whose ref frame is ALREADY checkpointed (the
    refreeze entry's shifted slice) pass False — a second checkpoint
    of the same rows would only add a redundant block-manager copy."""
    if stage_ref:
        ref_rows = ref_rows.localCheckpoint(eager=False)
    _, m, v, _ = pca_top_component(
        ref_rows, "embedding", DIM, n_iter=N_ITER, cache_key=pca_key
    )
    # No checkpoint on the scored frame (r14): after rank_exact_edges_n
    # folded the count() into the edge collect, the scored projection
    # has exactly ONE consumer — the edge histogram — and global_prefix
    # stages ITS input (the compressed histogram) internally, so the
    # r13 scored-frame checkpoint had become a corpus-sized
    # materialization + one sequential job protecting nothing.
    ref = ref_rows.select(pc1_score_expr(m, v).alias("pc1"))
    # ONE action for count + edges (r14 optimization): the former
    # separate ref.count() was a full pass over the scored frame
    # for a number the edge histogram's cumulative sum already ends
    # at — rank_exact_edges_n folds it into the edge collect.
    edges, n_ref = rank_exact_edges_n(ref, "pc1", _N_BUCKETS)
    return (m, v, edges, n_ref)


# The industry-standard PSI decision bar: < 0.1 stable, 0.1-0.2 drifting,
# > 0.2 significant shift -> retrain. Integer ppm like every monitor
# statistic in this engine.
PSI_RETRAIN_THRESHOLD_PPM = 200_000


def monitor_bucket_counts(
    monitor: tuple[list[float], list[float], list[float], int],
    cur_rows: DataFrame,
) -> dict[int, int]:
    """Frozen-monitor bucket counts of ``cur_rows`` in ONE action:
    score with the frozen axes, bucket by the frozen edges, 10-row
    bounded collect. Factored out (r13 optimization) so a caller that
    needs the counts AND the PSI decision (the refreeze entry builds
    its hashed per-bucket statistic from them) scores the slice once
    instead of once per consumer."""
    m, v, edges, _n_ref = monitor
    scored = cur_rows.select(pc1_score_expr(m, v).alias("pc1"))
    return {
        r["b"]: r["n"]
        for r in scored.select(bucket_expr(edges).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }


def monitor_psi_ppm(
    monitor: tuple[list[float], list[float], list[float], int],
    cur_rows: DataFrame,
    counts: dict[int, int] | None = None,
) -> int:
    """Total PSI (integer ppm) of ``cur_rows`` against a frozen
    monitor: score with the frozen axes, bucket by the frozen edges,
    sum the smoothed per-decile contributions. One stateless
    projection + a 10-row bounded aggregate — the per-batch serving
    cost of the always-on monitor. ``counts`` short-circuits the
    scoring pass with precomputed ``monitor_bucket_counts`` output."""
    m, v, edges, n_ref = monitor
    # ONE action (r13 optimization): every scored row lands in exactly
    # one bucket (bucket_expr is total, 1..N_BUCKETS), so n_cur is the
    # sum of the bucket counts — the separate count() was a second
    # full scan + a second sequential job for a number the bucket
    # aggregate already contains.
    if counts is None:
        counts = monitor_bucket_counts(monitor, cur_rows)
    n_cur = sum(counts.values())
    # frozen deciles: the reference proportion per bucket is the
    # rank-exact decile mass; reconstruct counts from n_ref the same
    # way the edge rule split them (uniform up to rank ties)
    total = 0.0
    for b in range(1, _N_BUCKETS + 1):
        ref_b = n_ref / _N_BUCKETS
        cur_b = counts.get(b, 0)
        p_r = (ref_b + 0.5) / (n_ref + 5.0)
        p_c = (cur_b + 0.5) / (n_cur + 5.0)
        total += (p_c - p_r) * math.log(p_c / p_r)
    return int(math.floor(total * _Q + 0.5))


def serve_and_maybe_retrain(
    monitor: tuple[list[float], list[float], list[float], int],
    cur_rows: DataFrame,
    new_ref_rows: DataFrame,
    threshold_ppm: int = PSI_RETRAIN_THRESHOLD_PPM,
    new_pca_key: object = None,
    stale_monitor_keys: tuple = (),
    stale_index_key: str | None = None,
    counts: dict[int, int] | None = None,
    stage_new_ref: bool = True,
) -> tuple[tuple, int, bool]:
    """The detect -> retrain -> re-freeze lifecycle (VERDICT r7 #6):

    1. DETECT: score the arriving slice against the FROZEN monitor
       (the old monitor serves this batch — and keeps serving until
       the swap below returns; monitors are immutable tuples, so
       in-flight readers are never torn).
    2. below threshold: keep the monitor, report (monitor, psi, False).
    3. above threshold: drop the stale trained artifacts —
       ``stale_monitor_keys`` out of _MONITOR_CACHE and, when the
       corpus key also names ANN indexes, ``stale_index_key`` via
       similarity.clear_trained_indexes (IVF centroids / PQ codebooks
       / OPQ rotations trained on the pre-shift corpus degrade recall
       silently, the staleness contract at _CENTROID_CACHE) — then
       RE-FREEZE on ``new_ref_rows`` under ``new_pca_key`` (a NEW
       slice tag: the r6 advisory — never reuse a cache key across
       retrains) and return the new monitor.

    Returns (serving_monitor, psi_ppm, retrained). ``counts`` feeds
    precomputed ``monitor_bucket_counts`` through to the PSI decision
    (one scoring pass for callers that also consume the counts)."""
    psi = monitor_psi_ppm(monitor, cur_rows, counts=counts)
    if psi <= threshold_ppm:
        return monitor, psi, False
    from dataengineer_job_scraper_etl_spark.operators.similarity import (
        clear_trained_indexes,
    )

    for k in stale_monitor_keys:
        _MONITOR_CACHE.pop(k, None)
    if stale_index_key is not None:
        clear_trained_indexes(stale_index_key)
    fresh = train_pc1_monitor(
        new_ref_rows, pca_key=new_pca_key, stage_ref=stage_new_ref
    )
    return fresh, psi, True


# Planted distribution shift for the retrain-lifecycle entry: +0.25 on
# every (double-cast) coordinate. Measured PSI of the shifted slice
# against the v1 monitor: ~4.5M ppm at sf0.01, ~5.9M at sf0.1 — 20-30x
# the 200k retrain threshold, so the refreeze branch provably fires at
# every sf (a pure mean shift; picked over scale-up, which only moved
# PSI to ~0.19 and would flicker around the threshold).
_SHIFT = 0.25


def _refreeze_oracle() -> str:
    """Full lifecycle replay (VERDICT r9 ask #4): train v1 on the
    reference slice, score the PLANTED-SHIFT current slice against the
    frozen v1 monitor, decide, and — the part no oracle checked before
    — train v2 on the shifted slice and emit the RE-FROZEN monitor's
    decile edges. The quantized PCA chain instantiates TWICE via
    _pca_common's CTE-name prefix (p='' for v1, p='s' for v2)."""
    thr = PSI_RETRAIN_THRESHOLD_PPM
    p_r = (
        f"(((SELECT n FROM nr) / 10.0 + 0.5) / ((SELECT n FROM nr) + 5.0))"
    )
    p_c = "((coalesce(cc.n_cur, 0) + 0.5) / ((SELECT n FROM nc) + 5.0))"
    return (
        _pca_chain(_REF_WHERE)
        + f""",
ref AS MATERIALIZED (
  SELECT vec_id, pc1 FROM scores WHERE NOT ({_CUR_PRED})),
nr AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM ref),
hist AS (SELECT pc1, count(*) AS c FROM ref GROUP BY pc1),
cum AS MATERIALIZED (
  SELECT pc1, sum(c) OVER (ORDER BY pc1) AS cum FROM hist),
edges1 AS MATERIALIZED (
  SELECT k, min(pc1) AS e
  FROM range(1, {_N_BUCKETS}) r(k) JOIN cum
    ON cum.cum >= (k * (SELECT n FROM nr) + {_N_BUCKETS - 1})
                  // {_N_BUCKETS}
  GROUP BY k),
scur AS MATERIALIZED (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]), x -> x + {_SHIFT})
           AS e
  FROM embeddings WHERE {_CUR_PRED}),
nc AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM scur),
cscore AS MATERIALIZED (
  SELECT s.vec_id,
         floor(sum((s.e[v.j] - mn.m) * v.x) * {_Q} + 0.5) / {_Q} AS pc1
  FROM scur s CROSS JOIN v{N_ITER} v JOIN mean mn ON v.j = mn.i
  GROUP BY s.vec_id),
bcur AS (
  SELECT r.vec_id, 1 + count(e.k) AS b
  FROM cscore r LEFT JOIN edges1 e ON e.e < r.pc1 GROUP BY r.vec_id),
ccur AS (SELECT b, count(*) AS n_cur FROM bcur GROUP BY b),
psix AS MATERIALIZED (
  SELECT CAST(sum(CAST(floor(({p_c} - {p_r}) * ln({p_c} / {p_r})
                             * {_Q} + 0.5) AS BIGINT)) AS BIGINT)
           AS psi_ppm
  FROM range(1, {_N_BUCKETS + 1}) r(k) LEFT JOIN ccur cc ON cc.b = k)"""
        + _pca_common(
            "", p="s", emb_sql="SELECT vec_id, e FROM scur", with_kw=False
        )
        + f""",
sscore AS MATERIALIZED (
  SELECT semb.vec_id,
         floor(sum((semb.e[v.j] - mn.m) * v.x) * {_Q} + 0.5) / {_Q} AS pc1
  FROM semb CROSS JOIN sv{N_ITER} v JOIN smean mn ON v.j = mn.i
  GROUP BY semb.vec_id),
shist AS (SELECT pc1, count(*) AS c FROM sscore GROUP BY pc1),
scum AS MATERIALIZED (
  SELECT pc1, sum(c) OVER (ORDER BY pc1) AS cum FROM shist),
edges2 AS MATERIALIZED (
  SELECT k, min(pc1) AS e
  FROM range(1, {_N_BUCKETS}) r(k) JOIN scum
    ON scum.cum >= (k * (SELECT n FROM nc) + {_N_BUCKETS - 1})
                   // {_N_BUCKETS}
  GROUP BY k)
SELECT CAST(e1.k AS BIGINT) AS k,
       CASE WHEN (SELECT psi_ppm FROM psix) > {thr}
            THEN e2.e ELSE e1.e END AS edge,
       (SELECT psi_ppm FROM psix) AS psi_ppm,
       CAST(CASE WHEN (SELECT psi_ppm FROM psix) > {thr}
                 THEN 1 ELSE 0 END AS BIGINT) AS retrained
FROM edges1 e1 JOIN edges2 e2 ON e1.k = e2.k
"""
    )


@register(
    "vec_drift_retrain_refreeze",
    _refreeze_oracle(),
    doc="The drift lifecycle's POST-SWAP state, oracle-checked "
    "(VERDICT r9 ask #4 — serve_and_maybe_retrain was previously "
    "pinned only by pytest): monitor v1 freezes on the reference "
    "slice, the arriving slice carries a planted +0.25 mean shift "
    "(~5M ppm PSI, 25x the retrain threshold), the lifecycle helper "
    "detects the breach, drops stale monitor/ANN cache keys, and "
    "RE-FREEZES on the shifted slice under a new slice tag. The hash "
    "pins the SERVING monitor's rank-exact decile edges after the "
    "swap (the v2 train replayed in SQL via _pca_common's second, "
    "s-prefixed CTE instantiation), the breach statistic in integer "
    "ppm (per-bucket floored contributions summed — order-independent "
    "integers), and the branch taken. The oracle replays the "
    "conditional too: edges come from the v2 chain only when psi "
    "crosses the threshold, so a silent no-retrain would flip the "
    "hash, not just a flag.",
)
def vec_drift_retrain_refreeze(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    ref = e.filter(~F.expr(_CUR_PRED))
    # Staged once (r14 optimization): the shifted slice feeds THREE
    # consumers — the v1 bucket-count scoring pass, the v2 Gram pass,
    # and the v2 edge-scoring pass — each of which re-ran the parquet
    # scan + filter + 64-term shift projection without it.
    shifted = e.filter(F.expr(_CUR_PRED)).select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: x + F.lit(_SHIFT),
        ).alias("embedding"),
    ).localCheckpoint(eager=False)
    mon1 = train_pc1_monitor(ref, pca_key=("drift-v1", sf_dir))
    # Score + bucket the shifted slice ONCE (r13 optimization): the
    # bounded 10-row counts feed BOTH the PSI decision inside
    # serve_and_maybe_retrain and the hashed per-bucket statistic
    # below — previously the entry re-ran the full scoring projection
    # a second time to rebuild the identical counts as a DataFrame.
    counts_map = monitor_bucket_counts(mon1, shifted)
    serving, _psi_dec, retrained = serve_and_maybe_retrain(
        mon1,
        shifted,
        new_ref_rows=shifted,
        new_pca_key=("drift-v2", sf_dir),
        stale_monitor_keys=(("pc1-monitor", sf_dir),),
        counts=counts_map,
        stage_new_ref=False,  # shifted is already checkpointed above
    )
    m1, v1, edges1, n_ref = mon1
    n_cur = serving[3] if retrained else sum(counts_map.values())

    # The hashed breach statistic: per-bucket floored ppm contributions
    # summed (integer, order-independent — unlike floor-of-total, whose
    # float sum order differs across engines). The frozen v1 reference
    # mass per decile is uniform n_ref/10 (monitor_psi_ppm semantics).
    counts = spark.createDataFrame(
        [(int(b), int(n)) for b, n in sorted(counts_map.items())],
        "b long, n_b long",
    )
    base = spark.range(1, _N_BUCKETS + 1).select(F.col("id").alias("b"))
    jd = base.join(F.broadcast(counts), "b", "left").select(
        F.coalesce("n_b", F.lit(0)).alias("n_b")
    )
    p_r = (F.lit(float(n_ref)) / F.lit(10.0) + F.lit(0.5)) / (
        F.lit(float(n_ref)) + F.lit(5.0)
    )
    p_c = (F.col("n_b") + F.lit(0.5)) / F.lit(float(n_cur) + 5.0)
    contrib = F.floor(
        (p_c - p_r) * F.log(p_c / p_r) * F.lit(float(_Q)) + F.lit(0.5)
    ).cast("long")
    psi_df = jd.agg(F.sum(contrib).cast("long").alias("psi_ppm"))

    edges_df = spark.createDataFrame(
        [(k, float(ek)) for k, ek in enumerate(serving[2], start=1)],
        "k long, edge double",
    )
    return edges_df.crossJoin(F.broadcast(psi_df)).select(
        F.col("k").cast("bigint").alias("k"),
        "edge",
        "psi_ppm",
        F.lit(1 if retrained else 0).cast("bigint").alias("retrained"),
    )


@register(
    "vec_pc1_drift_psi",
    _psi_oracle(),
    doc="Embedding-drift monitor: PCA axes AND decile edges are frozen "
    "on the reference slice (vec_id%10<8), the arriving slice is "
    "scored against them, and the Population Stability Index "
    "contribution per decile comes out in integer ppm (smoothed "
    "(n+0.5)/(N+5) proportions, so empty buckets are finite). Edges "
    "are rank-exact from a distinct-score histogram + cumulative sum "
    "(combiner-friendly groupBy; the ordered prefix sum runs over the "
    "COMPRESSED histogram, and becomes a two-stage parallel prefix at "
    "real scale), edge_k = min score with cum >= ceil(k*N/10) — an "
    "engine-portable rank rule where percentile_disc/approx semantics "
    "diverge. Bucketing is a 9-edge literal expression (bounded "
    "collect, same shape as the k-means literal argmin).",
)
def vec_pc1_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    m, v, edges, n_ref = frozen_pc1_monitor(spark, sf_dir)
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    scored = e.select(
        "vec_id",
        pc1_score_expr(m, v).alias("pc1"),
        F.expr(_CUR_PRED).alias("is_cur"),
    )
    n_cur = e.count() - n_ref

    bucket = bucket_expr(edges)
    counts = (
        scored.select("is_cur", bucket.alias("b"))
        .groupBy("is_cur", "b")
        .count()
    )
    base = spark.range(1, _N_BUCKETS + 1).select(
        F.col("id").alias("bucket")
    )
    cref = counts.filter(~F.col("is_cur")).select(
        F.col("b").alias("bucket"), F.col("count").alias("n_ref")
    )
    ccur = counts.filter(F.col("is_cur")).select(
        F.col("b").alias("bucket"), F.col("count").alias("n_cur")
    )
    joined = (
        base.join(F.broadcast(cref), "bucket", "left")
        .join(F.broadcast(ccur), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    p_r = (F.col("n_ref") + F.lit(0.5)) / F.lit(float(n_ref + 5))
    p_c = (F.col("n_cur") + F.lit(0.5)) / F.lit(float(n_cur + 5))
    psi = F.floor(
        (p_c - p_r) * F.log(p_c / p_r) * F.lit(float(_Q)) + F.lit(0.5)
    ).cast("bigint")
    return joined.select(
        F.col("bucket").cast("bigint").alias("bucket"),
        F.col("n_ref").cast("bigint").alias("n_ref"),
        F.col("n_cur").cast("bigint").alias("n_cur"),
        psi.alias("psi_contrib_ppm"),
    )


@register(
    "vec_pca_pc1_scores",
    _pca_oracle(),
    doc="Distributed PCA top component, hash-checked end to end: ONE "
    "corpus pass emits d(d+1)/2+d+1 Gram/mean/count partials per Arrow "
    "batch (numpy BLAS on the dense block — batch-count-proportional, "
    "never corpus-proportional), one tiny triplet shuffle, a bounded "
    "2145-row collect, then driver-side 64x64 power iteration with "
    "every iterate quantized by the explicit half-up rule the oracle "
    "replays. Output = each vector's mean-centered projection onto "
    "PC1 (the embedding-drift monitor statistic / OPQ rotation seed).",
)
def vec_pca_pc1_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    _, m, v, _ = pca_top_component(
        e, "embedding", DIM, n_iter=N_ITER, cache_key=("pca", sf_dir)
    )
    return e.select("vec_id", pc1_score_expr(m, v).alias("pc1"))


@register(
    "vec_pca_top2_scores",
    _pca_top2_oracle(),
    doc="Top-2 PCA via Hotelling deflation, hash-checked end to end: "
    "after PC1's quantized power iteration, the driver-side 64x64 "
    "covariance is deflated C <- quantize(C - lam1 * v1 v1^T) — lam1 "
    "and v1 are already quantized, so the deflated matrix is made of "
    "engine-shared doubles and PC2's trajectory replays bit-"
    "identically too. ONE corpus pass feeds both components (the Gram "
    "is computed once; deflation is pure driver arithmetic), and the "
    "projection emits both scores in one codegen expression — the 2-D "
    "embedding map behind whitening, OPQ rotation seeds, and drift "
    "dashboards.",
)
def vec_pca_top2_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataengineer_job_scraper_etl_spark.operators.pca import (
        pca_top_components,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    _, m, comps, _ = pca_top_components(
        e, "embedding", DIM, n_components=2, n_iter=N_ITER,
        cache_key=("pca", sf_dir),
    )
    return e.select(
        "vec_id",
        pc1_score_expr(m, comps[0]).alias("pc1"),
        pc1_score_expr(m, comps[1]).alias("pc2"),
    )


_GRID_BUCKETS = 4  # 4x4 = 16 cells over (pc1, pc2)
_GRID_PER_CELL = 10


def _grid_sample_oracle() -> str:
    def axis_edges(src_col: str, tag: str) -> str:
        return f""",
h{tag} AS (SELECT {src_col} AS s, count(*) AS c
           FROM scores2 GROUP BY {src_col}),
c{tag} AS MATERIALIZED (
  SELECT s, sum(c) OVER (ORDER BY s) AS cum FROM h{tag}),
e{tag} AS MATERIALIZED (
  SELECT k, min(s) AS e
  FROM range(1, {_GRID_BUCKETS}) r(k) JOIN c{tag}
    ON c{tag}.cum >= (k * (SELECT n FROM n2) + {_GRID_BUCKETS - 1})
                     // {_GRID_BUCKETS}
  GROUP BY k)"""

    return (
        _pca_top2_common()
        + f""",
n2 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM scores2)"""
        + axis_edges("pc1", "x")
        + axis_edges("pc2", "y")
        + f""",
bxs AS (
  SELECT s.vec_id, 1 + count(e.k) AS bin_x
  FROM scores2 s LEFT JOIN ex e ON e.e < s.pc1 GROUP BY s.vec_id),
bys AS (
  SELECT s.vec_id, 1 + count(e.k) AS bin_y
  FROM scores2 s LEFT JOIN ey e ON e.e < s.pc2 GROUP BY s.vec_id),
cells AS (
  SELECT bxs.vec_id, bxs.bin_x, bys.bin_y
  FROM bxs JOIN bys ON bxs.vec_id = bys.vec_id),
ranked AS (
  SELECT vec_id, bin_x, bin_y, row_number() OVER (
    PARTITION BY bin_x, bin_y
    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
  FROM cells)
SELECT CAST(bin_x AS BIGINT) AS bin_x, CAST(bin_y AS BIGINT) AS bin_y,
       CAST(count(*) AS BIGINT) AS n_sampled,
       CAST(sum(vec_id) AS BIGINT) AS id_checksum
FROM ranked WHERE rn <= {_GRID_PER_CELL} GROUP BY bin_x, bin_y
"""
    )


@register(
    "vec_pca_grid_sample",
    _grid_sample_oracle(),
    doc="Coverage-balanced (diversity) sampling in embedding space: "
    f"the corpus is quartile-gridded on (PC1, PC2) — {_GRID_BUCKETS}x"
    f"{_GRID_BUCKETS} cells from rank-exact per-axis edges — and up to "
    f"{_GRID_PER_CELL} rows per cell are kept by the md5 hash-rank "
    "trick (deterministic, engine-portable, exact-n where occupancy "
    "allows). The curation move behind 'cover the embedding space, "
    "don't oversample the dense blob': strata come from the LEARNED "
    "2-D projection, not a static column. Same scale shape as the "
    "PSI edges: per-axis compressed-histogram prefix sums, 3-edge "
    "bounded collects, one window over (cell, id) pairs.",
)
def vec_pca_grid_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from dataengineer_job_scraper_etl_spark.operators.pca import (
        pca_top_components,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    _, m, comps, _ = pca_top_components(
        e, "embedding", DIM, n_components=2, n_iter=N_ITER,
        cache_key=("pca", sf_dir),
    )
    scored = e.select(
        "vec_id",
        pc1_score_expr(m, comps[0]).alias("pc1"),
        pc1_score_expr(m, comps[1]).alias("pc2"),
    ).localCheckpoint(eager=False)
    # first axis folds the count into its edge collect (r14
    # optimization — one fewer full pass over the scored checkpoint);
    # the second axis reuses the same n through the original rule
    ex, n = rank_exact_edges_n(scored, "pc1", _GRID_BUCKETS)
    ey = rank_exact_edges(scored, "pc2", _GRID_BUCKETS, n)
    cells = scored.select(
        "vec_id",
        bucket_expr(ex, "pc1").alias("bin_x"),
        bucket_expr(ey, "pc2").alias("bin_y"),
    )
    w = Window.partitionBy("bin_x", "bin_y").orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id"
    )
    return (
        cells.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _GRID_PER_CELL)
        .groupBy("bin_x", "bin_y")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
            F.sum("vec_id").cast("bigint").alias("id_checksum"),
        )
        .select(
            F.col("bin_x").cast("bigint").alias("bin_x"),
            F.col("bin_y").cast("bigint").alias("bin_y"),
            "n_sampled",
            "id_checksum",
        )
    )
