"""Approximate nearest-neighbor search over embedding columns (north
star, SURVEY §2.10).

Three tiers, trading recall for scan cost:

1. ``brute_force_topk`` — exact cosine top-k; the correctness baseline
   (oracle-checked variant in queries/vectors.py). At 100 TB this is a
   full corpus scan per query batch: fine for offline eval, wrong for
   serving.
2. ``rhp_lsh_topk`` — random-hyperplane LSH: project each vector onto
   ``n_bits`` fixed hyperplanes -> sign bits -> bucket id. Queries only
   score vectors sharing a bucket (optionally multi-probe over
   neighboring buckets). The hyperplanes are deterministic literals
   (seeded), so the plan is reproducible; the only shuffle is the
   bucket equi-join.
3. ``ivf_topk`` — IVF coarse quantizer: k-means-lite centroids
   (deterministic seeded init + ``n_iter`` Lloyd rounds, all DataFrame
   ops), assign corpus to nearest centroid, probe ``n_probe`` nearest
   lists per query. Centroid table is tiny -> broadcast everywhere.

No Python in the scoring path: dot products / norms are zip_with +
aggregate built-ins.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.functions.vector_math import (
    cosine,
    dot,
    l2_norm,
)
from dataengineer_job_scraper_etl_spark.operators.topk import grouped_topk
from dataengineer_job_scraper_etl_spark.session import ensure_min_parallelism


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _sq_dist(a: Column, b: Column) -> Column:
    """Squared L2 distance as ONE sequential left-to-right fold —
    deterministic given identical inputs, which is what lets oracles
    replay it bit-identically. Shared by centroid assignment, the
    SemDeDup survivor ranking, and the profile query."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qe",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k of corpus rows per query row (queries small,
    broadcast). The corpus is fanned out to all cores first — a
    single-row-group parquet scan is 1 partition, which would run the
    whole scoring pass on one core (no-op at scale)."""
    # Per-side norms computed ONCE per row before the cross join (r13
    # optimization, the graphrank device): dot/(qn*cn) is the
    # bit-identical cosine (same ops, same order) with the two norm
    # folds hoisted out of the |queries| x |corpus| scoring loop.
    q2 = queries.withColumn("__qn", l2_norm(_as_double(F.col(qvec_col))))
    c2 = ensure_min_parallelism(corpus).withColumn(
        "__cn", l2_norm(_as_double(F.col(vec_col)))
    )
    scored = (
        F.broadcast(q2)
        .crossJoin(c2)
        .select(
            F.col(qid_col),
            F.col(id_col),
            (
                dot(_as_double(F.col(qvec_col)), _as_double(F.col(vec_col)))
                / (F.col("__qn") * F.col("__cn"))
            ).alias("cos_sim"),
        )
    )
    return grouped_topk(
        scored, [qid_col], [F.desc("cos_sim"), F.asc(id_col)], k
    )


def _hyperplanes(dim: int, n_bits: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_bits)
    ]


def rhp_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qe",
    k: int = 10,
    n_bits: int = 8,
    n_tables: int = 4,
    multiprobe: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane LSH ANN: candidates = bucket collisions in any
    of ``n_tables`` independent tables, then exact rerank of candidates
    only. Shuffles (table_id, bucket) keys — corpus vectors are hashed
    in place, never all-pairs-joined.

    ``multiprobe=1`` additionally probes every bucket at hamming
    distance 1 from each QUERY's bucket (classic multi-probe LSH):
    the query side fans out to ``n_bits + 1`` bucket keys per table,
    the corpus side is untouched — recall rises steeply (a near
    neighbor only needs n_bits-1 of n_bits agreeing sign bits in some
    table) for a bounded rerank-cost increase. 0 disables.

    The hyperplanes travel as a tiny broadcast TABLE (one row per
    hash table), not as plan literals: n_tables * n_bits * dim literal
    nodes made analysis + codegen the dominant cost (14s at sf0.01 on
    500 vectors), and a per-table union re-scanned the corpus once per
    table. One scan, one cross join against <=16 rows, one projection.
    """
    spark = corpus.sparkSession
    corpus = ensure_min_parallelism(corpus)  # 1-partition scans would
    # otherwise pin the bucket+rerank stages to one core (no-op at scale)
    planes_rows = [
        (t, _hyperplanes(dim, n_bits, seed + 1000 * t))
        for t in range(n_tables)
    ]
    planes_df = spark.createDataFrame(
        planes_rows, "tab int, planes array<array<double>>"
    )

    def bucket_for(vec: Column) -> Column:
        # sign bit per plane, folded MSB-first into a bigint bucket id
        bits = F.transform(
            F.col("planes"),
            lambda p: F.when(dot(vec, p) >= 0, F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            ),
        )
        return F.aggregate(
            bits, F.lit(0).cast("long"), lambda acc, b: acc * 2 + b
        )

    # Corpus-side norm computed once per row BEFORE the planes cross
    # join (r13 optimization): the rerank's cosine becomes dot/(qn*cn)
    # — the bit-identical expression with the two norm folds hoisted
    # out of the candidate loop (and out of the n_tables fan-out).
    c_all = (
        corpus.withColumn("__cn", l2_norm(_as_double(F.col(vec_col))))
        .crossJoin(F.broadcast(planes_df))
        .select(
            F.col(id_col),
            F.col(vec_col),
            F.col("__cn"),
            F.col("tab"),
            bucket_for(_as_double(F.col(vec_col))).alias("bucket"),
        )
    )
    qb = bucket_for(_as_double(F.col(qvec_col)))
    if multiprobe not in (0, 1):
        # only hamming-distance-1 probing is implemented; accepting
        # larger values silently delivered distance-1 recall while the
        # caller believed they bought more (review finding)
        raise ValueError(
            "rhp_lsh_topk: multiprobe must be 0 (exact buckets) or 1 "
            "(hamming-distance-1 probes)"
        )
    if multiprobe == 1:
        probe_buckets = F.array(
            qb, *[qb.bitwiseXOR(F.lit(1 << i)) for i in range(n_bits)]
        )
    else:
        probe_buckets = F.array(qb)
    q_all = (
        queries.withColumn("__qn", l2_norm(_as_double(F.col(qvec_col))))
        .crossJoin(F.broadcast(planes_df))
        .select(
            F.col(qid_col),
            F.col(qvec_col),
            F.col("__qn"),
            F.col("tab"),
            F.explode(probe_buckets).alias("bucket"),
        )
    )

    cand = (
        c_all.join(F.broadcast(q_all), ["tab", "bucket"])
        .select(qid_col, id_col, qvec_col, vec_col, "__qn", "__cn")
        .dropDuplicates([qid_col, id_col])
    )
    scored = cand.select(
        F.col(qid_col),
        F.col(id_col),
        (
            dot(_as_double(F.col(qvec_col)), _as_double(F.col(vec_col)))
            / (F.col("__qn") * F.col("__cn"))
        ).alias("cos_sim"),
    )
    return grouped_topk(
        scored, [qid_col], [F.desc("cos_sim"), F.asc(id_col)], k
    )


def _centroids_sql(cents: list[tuple[int, list[float]]]) -> str:
    """Render centroids as ONE SQL literal: array of (cluster_id,
    centroid) structs. A single Py4J round trip that Catalyst constant-
    folds into a plan Literal — vs shipping an n_clusters x dim local
    relation + collect_list sub-aggregation + crossJoin(broadcast) per
    Lloyd round. CAST('<repr>' AS DOUBLE) round-trips every IEEE-754
    value exactly on both build (Python repr) and parse (JVM) sides."""
    structs = ", ".join(
        "named_struct('cluster_id', {cid}, 'centroid', array({vals}))".format(
            cid=int(cid),
            vals=", ".join(f"CAST('{x!r}' AS DOUBLE)" for x in vec),
        )
        for cid, vec in cents
    )
    return f"array({structs})"


def _kmeans_rounds(
    corpus: DataFrame,
    vec_col: str,
    dim: int,
    cents: list[tuple[int, list[float]]],
    n_iter: int,
    round_decimals: int | None = None,
) -> list[tuple[int, list[float]]]:
    """Run ``n_iter`` Lloyd rounds over an already-parallelized (and
    ideally checkpointed) corpus; returns the updated centroid list.

    Each round is ONE job and ONE shuffle: literal-centroid argmin
    assign (no join) -> per-cluster mean of every dimension as ``dim``
    avg aggregates over projected element columns (dim is a known
    argument). Partial aggregation bounds the shuffle at
    n_clusters x dim running means per map partition regardless of
    corpus size. For very wide vectors (dim > 256) the wide-agg plan
    would strain codegen, so the round falls back to posexplode ->
    per-(cluster, dim) mean — two shuffles, but rows instead of
    columns.

    ``round_decimals`` quantizes every centroid coordinate after each
    mean update. Two reasons: (a) cross-engine determinism — an oracle
    replaying the same rounds in another engine accumulates means in a
    different summation order; for a per-coordinate mean over ~10^6
    members the order-dependent drift is around 1e-13..1e-12, so the
    quantum must sit far ABOVE that (6 decimals = 5e-7 half-step,
    a ~5x10^5 safety factor; 9 decimals would leave only ~500x —
    thin for a hash contract that cascades through assignment).
    Quantizing makes the round's OUTPUT bit-identical on both sides
    so assignment argmins can't diverge. (b) It is the same
    centroid-quantization trade serving systems make. None (default)
    keeps full precision for the IVF/PQ internal-cache paths, whose
    contracts are recall floors, not hash equality.

    Rounding-MODE assumption (ADVICE r6): Python round() here is
    banker's (half-to-even) while DuckDB's round() is half-away-from-
    zero (and Spark's F.round is HALF_UP) — the modes differ ONLY at
    exact decimal halves (x.xxxxx5 as a binary double). A float64
    mean of float inputs landing exactly on a representable decimal
    half is measure-zero in practice, and the drift-margin analysis
    above already requires means to sit >>5e-7-half-step away from
    quantum boundaries for the contract to hold at all; the same
    margin covers the mode seam. If a future caller feeds
    exact-decimal vectors (where halves ARE reachable), switch both
    sides to one explicit rule, e.g. floor(x*10^d + 0.5)/10^d
    mirrored in SQL."""
    for _ in range(n_iter):
        assigned = assign_to_centroid(corpus, cents, vec_col)
        if dim <= 256:
            # dim avg aggregates as F.expr strings (r14): the Column-
            # API form (avg(element_at(transform(vec, cast), i+1)))
            # issued ~5 py4j roundtrips per dimension PER ROUND —
            # driver-side construction time on par with the round's
            # job time at fixture scale (guide §7.3). CAST(vec[i] AS
            # DOUBLE) averages the identical doubles (element-of-cast
            # == cast-of-element; [i] is the 0-based twin of
            # element_at(·, i+1)), so partials and results are
            # bit-identical (pinned in tests/test_r14_optimizations.py).
            new = assigned.groupBy("cluster_id").agg(
                *[
                    F.expr(
                        f"avg(CAST(`{vec_col}`[{i}] AS DOUBLE)) AS m{i}"
                    )
                    for i in range(dim)
                ]
            )
            got = {
                r["cluster_id"]: [r[f"m{i}"] for i in range(dim)]
                for r in new.collect()
            }
        else:
            new = (
                assigned.select(
                    "cluster_id",
                    F.posexplode(_as_double(F.col(vec_col))).alias("i", "x"),
                )
                .groupBy("cluster_id", "i")
                .agg(F.avg("x").alias("m"))
                .groupBy("cluster_id")
                .agg(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("i"), F.col("m")))
                    ).alias("pairs")
                )
                .select(
                    "cluster_id",
                    F.transform(
                        F.col("pairs"), lambda p: p.getField("m")
                    ).alias("centroid"),
                )
            )
            got = {r["cluster_id"]: list(r["centroid"]) for r in new.collect()}
        if round_decimals is not None:
            got = {
                cid: [round(x, round_decimals) for x in vec]
                for cid, vec in got.items()
            }
        cents = [
            (cid, got.get(cid, vec)) for cid, vec in cents
        ]  # empty clusters keep previous position
    return cents


def _seeded_init(
    dim: int, n_clusters: int, seed: int
) -> list[tuple[int, list[float]]]:
    rng = random.Random(seed)
    return [
        (cid, [rng.gauss(0.0, 0.2) for _ in range(dim)])
        for cid in range(n_clusters)
    ]


def kmeans_lite(
    corpus: DataFrame,
    vec_col: str,
    dim: int,
    n_clusters: int,
    n_iter: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Deterministic Lloyd iterations with seeded-literal init, pure
    DataFrame ops. Centroids: (cluster_id, centroid array<double>).
    See ``_kmeans_rounds`` for the per-round plan shape."""
    spark = corpus.sparkSession
    # Fan the corpus out once and truncate lineage: every Lloyd round
    # re-reads it (assign + per-dim partial means), so a 1-partition
    # scan would serialize all rounds on one core.
    corpus = ensure_min_parallelism(corpus).localCheckpoint(eager=False)
    cents = _kmeans_rounds(
        corpus, vec_col, dim, _seeded_init(dim, n_clusters, seed), n_iter
    )
    return spark.createDataFrame(
        cents, "cluster_id int, centroid array<double>"
    )


def assign_to_centroid(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str,
) -> DataFrame:
    """Nearest-centroid assignment: argmin over the constant-folded
    literal centroid set, computed as array_sort of (d2, cluster_id)
    structs — per-row, no join, no shuffle, no extra job at all. Cost
    O(n_clusters x dim) per row."""
    cents = F.expr(_centroids_sql(centroids))
    scored = F.transform(
        cents,
        lambda s: F.struct(
            _sq_dist(_as_double(F.col(vec_col)), s.getField("centroid")).alias(
                "d2"
            ),
            s.getField("cluster_id").alias("cluster_id"),
        ),
    )
    best = F.array_sort(scored)[0].getField("cluster_id")
    return df.withColumn("cluster_id", best)


def kmeans_corpus_init(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_clusters: int,
    n_iter: int = 2,
    round_decimals: int | None = 6,
    cache_key: str | None = None,
    slice_tag: str | None = None,
) -> list[tuple[int, list[float]]]:
    """Lloyd's k-means with DATA-DERIVED init: cluster ``cid`` starts at
    the vector of the ``cid``-th lowest ``id_col`` row. Unlike the
    seeded-gaussian init (``kmeans_lite``), every step here is a pure
    function of the table contents — an independent engine can replay
    init + rounds exactly, which is what makes the clustering entries
    ORACLE-CHECKABLE (hash equality, not just recall floors). Centroids
    are quantized to ``round_decimals`` after each mean update; see
    ``_kmeans_rounds`` for why that pins cross-engine equality.

    The init collect is ``n_clusters`` rows (bounded, like the IVF
    centroid collects); each round is one shuffle of n_clusters x dim
    partial means. Returns the trained (cluster_id, centroid) list —
    feed to ``assign_to_centroid`` for the final assignment.

    ``cache_key`` memoizes the trained list in _CENTROID_CACHE (same
    staleness contract and ``clear_trained_indexes`` hook as IVF):
    pass it for FROZEN-index semantics — the incremental/streaming
    ingest entries, where training once and serving many batches IS
    the production contract. Batch dedup entries leave it None so
    each run honestly pays its own training.

    ``cache_key`` must uniquely name the CORPUS; ``slice_tag`` must
    name the training SUBSET within it (ADVICE r6: the key carries no
    fingerprint of the frame's contents, so two callers sharing a
    cache_key but training on different filters of the same corpus
    would silently share centroids). Callers that train on a slice
    pass a tag naming the predicate (the incremental/streaming
    entries use "mod10_lt8" for their vec_id %% 10 < 8 split); None
    means whole-corpus training."""
    ckey = (
        (cache_key, slice_tag, "corpus_init", id_col, vec_col, dim,
         n_clusters, n_iter, round_decimals)
        if cache_key is not None
        else None
    )
    if ckey is not None and ckey in _CENTROID_CACHE:
        return _CENTROID_CACHE[ckey]
    init_rows = (
        corpus.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
        .orderBy(F.col(id_col))
        .limit(n_clusters)
        .collect()
    )
    cents = [(cid, list(r["v"])) for cid, r in enumerate(init_rows)]
    corpus = ensure_min_parallelism(corpus).localCheckpoint(eager=False)
    trained = _kmeans_rounds(
        corpus, vec_col, dim, cents, n_iter, round_decimals=round_decimals
    )
    if ckey is not None:
        _CENTROID_CACHE[ckey] = trained
    return trained


def semdedup_n_clusters(
    n_rows: int, target_occupancy: int = 256
) -> int:
    """The SemDeDup cluster-count sizing rule (VERDICT r6 ask #4):
    k = ceil(n_rows / target_occupancy), floor 2. Mean occupancy is
    then <= target_occupancy, so the quadratic within-cluster pair
    pass does ~target_occupancy^2 / 2 comparisons per cluster — the
    number that must stay bounded as the corpus grows. At 100 TB with
    1e9 embeddings and the default target, k ~= 4M clusters: centroid
    training cost grows with k*dim (one shuffle of partial means per
    Lloyd round), which is the right trade — training is linear,
    the pair pass is quadratic in occupancy. The rule bounds the
    MEAN; an adversarial dense blob can still concentrate into one
    cluster (k-means cannot split points nearer one centroid than any
    other) — that residual skew is what ``max_occupancy`` pre-split
    in semdedup_survivors bounds."""
    if n_rows < 0:
        raise ValueError("n_rows must be >= 0")
    if target_occupancy <= 0:
        raise ValueError("target_occupancy must be > 0")
    return max(2, -(-n_rows // target_occupancy))


def semdedup_survivors(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_clusters: int | None,
    n_iter: int = 2,
    tau: float = 0.4,
    target_occupancy: int = 256,
    max_occupancy: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup by clustering the
    embedding space, then pruning near-identical pairs WITHIN each
    cluster only — the clustering bounds candidate generation, so the
    quadratic cosine pass runs per cluster, never corpus-wide.

    Rule (deterministic lowest-id-anchor variant): a row is dropped iff
    some SAME-CLUSTER row with a LOWER id has cosine > ``tau`` with it.
    The paper keeps the member closest to the centroid per near-dup
    group; anchoring on the id instead makes survivorship a pure
    function of the data, replayable by the SQL oracle. Like SemDeDup,
    recall is bounded by the clustering: a cross-cluster near-dup pair
    is NOT pruned (by design — that miss rate is the price of never
    going all-pairs; the RHP-bucket variant in this module covers the
    hash-bucket alternative).

    Returns (id_col, cluster_id, kept: int 1/0). Plan shape: centroid
    train (bounded collects) -> literal-argmin assignment (no join) ->
    ONE equi-self-join on cluster_id for the pair pass -> left-anti
    mark. Vectors are L2-NORMALIZED once per row BEFORE the join, so
    the per-pair predicate is a single dot-product fold — cosine()
    inline would re-fold both norms per candidate pair, tripling the
    quadratic stage's cost (measured 3x at sf1). At 100 TB the
    self-join shuffles each cluster to one task pair-set; a degenerate
    giant cluster (skew) is the known SemDeDup failure mode, bounded
    two ways here (VERDICT r6 ask #4):

    - ``n_clusters=None`` derives k from the corpus via
      semdedup_n_clusters(count, target_occupancy) — one count()
      action — so MEAN occupancy never outgrows the target as the
      corpus scales (fixed k was the unenforced failure mode).
    - ``max_occupancy`` (opt-in) pre-splits hot clusters for the pair
      join with triangle-join replication: a cluster of occupancy O >
      max_occupancy is hashed into s = ceil(O / max_occupancy)
      groups, each row replicated to the s tasks (g1 <= g2) that
      contain its group, and the join runs on (cluster_id, g1, g2) —
      every within-cluster pair lands in EXACTLY one task (cross-
      group pairs in (min,max); same-group pairs kept only in (g,g)),
      so the RESULT IS IDENTICAL to the plain path (the
      vec_semdedup_presplit catalog entry pins this against the same
      oracle) while per-task pair work is bounded by ~max_occupancy^2
      regardless of skew. Cost: s-way replication of hot-cluster rows
      only; occupancy <= max_occupancy clusters have s=1 (no
      overhead)."""
    if n_clusters is None:
        n_clusters = semdedup_n_clusters(emb.count(), target_occupancy)
    _, assigned = _assigned_normalized(
        emb, id_col, vec_col, dim, n_clusters, n_iter
    )
    if max_occupancy is not None:
        dropped = _presplit_dropped(assigned, id_col, tau, max_occupancy)
    else:
        a = assigned.alias("a")
        b = assigned.alias("b")
        dropped = (
            a.join(b, on="cluster_id")
            .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .filter(dot(F.col("a.nv"), F.col("b.nv")) > tau)
            .select(
                F.col(f"b.{id_col}").alias(id_col), F.lit(0).alias("kept")
            )
            .distinct()
        )
    return assigned.join(dropped, on=id_col, how="left").select(
        id_col, "cluster_id", F.coalesce(F.col("kept"), F.lit(1)).alias("kept")
    )


def _presplit_dropped(
    assigned: DataFrame, id_col: str, tau: float, max_occupancy: int
) -> DataFrame:
    """Hot-cluster-bounded dropped-row set, pair-semantics-identical
    to the plain cluster self-join. Triangle-join replication: with a
    cluster split into s hash groups, the s*(s+1)/2 group pairs
    (g1 <= g2) are the join tasks; a row in group g joins under task
    keys {(min(g,h), max(g,h)) : h in 0..s-1} (s copies). A cross-
    group pair {gi != gj} meets in exactly task (min, max); a same-
    group pair {g, g} would meet in every task containing g, so it is
    filtered to task (g, g) only — each unordered pair is therefore
    examined exactly once and the distinct() below dedups nothing new
    (it mirrors the plain path's). Per-task work is
    ~(occupancy/s)^2 <= ~max_occupancy^2 comparisons; the join key
    (cluster_id, t1, t2) spreads a hot cluster over s*(s+1)/2 tasks
    instead of one."""
    occ = assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("__occ")
    )
    splits = occ.select(
        "cluster_id",
        F.ceil(F.col("__occ") / F.lit(max_occupancy))
        .cast("int")
        .alias("__s"),
    )
    # k rows — always broadcastable (k is the cluster count).
    g = assigned.join(F.broadcast(splits), "cluster_id").withColumn(
        "__g", F.pmod(F.xxhash64(F.col(id_col)), F.col("__s")).cast("int")
    )
    tasks = g.select(
        id_col,
        "cluster_id",
        "nv",
        "__g",
        F.explode(F.sequence(F.lit(0), F.col("__s") - 1)).alias("__h"),
    ).select(
        id_col,
        "cluster_id",
        "nv",
        "__g",
        F.least("__g", "__h").alias("__t1"),
        F.greatest("__g", "__h").alias("__t2"),
    )
    a = tasks.alias("a")
    b = tasks.alias("b")
    same_group_once = (F.col("a.__g") != F.col("b.__g")) | (
        (F.col("a.__t1") == F.col("a.__g"))
        & (F.col("a.__t2") == F.col("a.__g"))
    )
    return (
        a.join(b, on=["cluster_id", "__t1", "__t2"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .filter(same_group_once)
        .filter(dot(F.col("a.nv"), F.col("b.nv")) > tau)
        .select(F.col(f"b.{id_col}").alias(id_col), F.lit(0).alias("kept"))
        .distinct()
    )


def _assigned_normalized(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_clusters: int,
    n_iter: int,
) -> tuple[list[tuple[int, list[float]]], DataFrame]:
    """Shared SemDeDup front half: train (data-derived init), assign,
    L2-normalize each vector ONCE, and stage the result — the pair
    join consumes it on both sides and the survivor mark a third time,
    so without the lazy localCheckpoint the argmin + upstream scan
    would recompute per consumer. Keeps the raw double vector ``v``
    (centroid distances need it) beside the unit vector ``nv``.
    Returns (trained centroids, staged frame)."""
    emb = emb.select(F.col(id_col), F.col(vec_col))
    cents = kmeans_corpus_init(
        emb, id_col, vec_col, dim, n_clusters, n_iter=n_iter
    )
    return cents, normalize_assigned(emb, cents, id_col, vec_col)


def normalize_assigned(
    emb: DataFrame,
    cents: list[tuple[int, list[float]]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Assign rows to the given (frozen) centroids and L2-normalize
    each vector once, staged: (id, cluster_id, v, nv). The norm fold
    is MATERIALIZED as a checkpointed column — deriving nv inside the
    same projection would inline the fold into the transform lambda
    and re-evaluate it per element. Post-checkpoint, nv is dim
    divisions per row against the stored scalar."""
    vd = _as_double(F.col(vec_col))
    # Fan the narrow (id, vec) frame out BEFORE assign/normalize (r13
    # optimization, guide §2.5): a small parquet fixture scans as ONE
    # partition, and since this checkpointed frame feeds BOTH sides of
    # the quadratic within-cluster pair join, the entire pair pass ran
    # on one task (measured: a single-task 3.5 s CPU stage inside the
    # ``dropped`` broadcast build at sf0.1 — half the semdedup entry
    # cost). No-op at real scale: never repartitions down.
    emb = ensure_min_parallelism(emb)
    # nullif guard: an all-zero vector has norm 0 — dividing raises
    # under ANSI mode (on by default) and yields NaN otherwise, where
    # Spark's NaN > tau is TRUE but DuckDB's 0/0 is NULL (engines
    # diverge). NULL-norm -> NULL elements -> NULL dot -> every
    # comparison false on BOTH engines: zero vectors never match
    # anything and never anchor. Same formula on the oracle side.
    base = (
        assign_to_centroid(emb, cents, vec_col)
        .select(
            id_col,
            "cluster_id",
            vd.alias("v"),
            F.nullif(l2_norm(vd), F.lit(0.0)).alias("vnorm"),
        )
        .localCheckpoint(eager=False)
    )
    return base.select(
        id_col,
        "cluster_id",
        "v",
        F.transform(F.col("v"), lambda x: x / F.col("vnorm")).alias("nv"),
    )


def semdedup_centroid_survivors(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_clusters: int,
    n_iter: int = 2,
    tau: float = 0.4,
    max_iter: int = 10,
) -> DataFrame:
    """Paper-faithful SemDeDup survivor rule (Abbas et al. 2023 §3):
    near-dup GROUPS are the connected components of the within-cluster
    cosine>tau graph, and each group keeps the member with the LOWEST
    similarity to its cluster centroid — i.e. the farthest-out example
    — because near the centroid the group is most redundant with the
    rest of the cluster. ``semdedup_survivors`` is the cheap
    lowest-id-anchor variant (no component pass); this one matches the
    paper at the cost of the iterative label propagation
    (operators/components.py, bounded by ``max_iter`` rounds over the
    PAIR set only — never the corpus).

    Distances are quantized to 9 decimals before ranking (same
    rationale as the centroid quantization: a last-ulp distance
    difference must not flip survivor choice across engines); exact
    ties fall back to lowest id. Returns (id_col, cluster_id, kept)."""
    from dataengineer_job_scraper_etl_spark.operators.components import (
        connected_components,
    )

    cents, assigned = _assigned_normalized(
        emb, id_col, vec_col, dim, n_clusters, n_iter
    )
    a = assigned.alias("a")
    b = assigned.alias("b")
    pairs = (
        a.join(b, on="cluster_id")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .filter(dot(F.col("a.nv"), F.col("b.nv")) > tau)
        .select(
            F.col(f"a.{id_col}").alias("src"), F.col(f"b.{id_col}").alias("dst")
        )
    )
    comp = connected_components(pairs, max_iter=max_iter)
    # distance of every grouped member to its own centroid, quantized
    cdf = F.broadcast(
        assigned.sparkSession.createDataFrame(
            cents, "cluster_id int, centroid array<double>"
        )
    )
    d2 = _sq_dist(F.col("v"), F.col("centroid"))
    grouped = (
        assigned.join(comp, assigned[id_col] == comp["node"])
        .join(cdf, on="cluster_id")
        .select(
            id_col,
            "cluster_id",
            "component",
            F.round(F.sqrt(d2), 9).alias("cdist"),
        )
    )
    # survivor per component: farthest from centroid, tie -> lowest id
    w_best = Window.partitionBy("component").orderBy(
        F.desc("cdist"), F.asc(id_col)
    )
    survivors = (
        grouped.withColumn("rn", F.row_number().over(w_best))
        .select(
            id_col,
            "cluster_id",
            F.when(F.col("rn") == 1, F.lit(1)).otherwise(F.lit(0)).alias("kept"),
        )
    )
    # rows never touched by any pair keep themselves
    untouched = assigned.join(
        comp, assigned[id_col] == comp["node"], how="left_anti"
    ).select(id_col, "cluster_id", F.lit(1).alias("kept"))
    return survivors.unionByName(untouched)


def semdedup_incremental_status(
    existing: DataFrame,
    batch: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_clusters: int,
    n_iter: int = 2,
    tau: float = 0.4,
    cache_key: str | None = None,
    slice_tag: str | None = None,
) -> DataFrame:
    """Incremental SemDeDup: classify a NEW batch of vectors against
    the EXISTING corpus WITHOUT retraining or rescanning it
    quadratically — the production ingest shape (same contract family
    as dedup.py's incremental_ingest_status for text digests). The
    comparison set is ALL existing same-cluster rows as given — if
    dedup-survivor semantics are wanted, pass a pre-filtered
    survivors frame as ``existing`` (ADVICE r6: this function does
    not itself dedup the corpus side).

    The cluster index is FROZEN: centroids train on ``existing`` only
    (in production they'd be loaded from the persisted index; the
    train-once cache keys apply). Each new row is assigned by
    literal-argmin and compared only against same-cluster rows:

    - 'dup_existing'  — some existing same-cluster row has dot > tau
    - 'dup_batch'     — else some LOWER-id batch row does (the same
                        lowest-id-anchor rule as semdedup_survivors,
                        applied within the arriving batch)
    - 'unique'        — otherwise; only these enter the corpus

    Per-batch cost is |batch| x avg-cluster-occupancy dot products —
    proportional to the batch, never to the corpus squared. Returns
    (id_col, cluster_id, status) for batch rows only."""
    cents = kmeans_corpus_init(
        existing, id_col, vec_col, dim, n_clusters, n_iter=n_iter,
        cache_key=cache_key, slice_tag=slice_tag,
    )
    ex = normalize_assigned(existing, cents, id_col, vec_col).select(
        F.col(id_col).alias("ex_id"), "cluster_id", F.col("nv").alias("ex_nv")
    )
    nb = normalize_assigned(batch, cents, id_col, vec_col).select(
        id_col, "cluster_id", F.col("nv").alias("b_nv")
    )
    hit_existing = (
        nb.join(ex, on="cluster_id")
        .filter(dot(F.col("b_nv"), F.col("ex_nv")) > tau)
        .select(id_col)
        .distinct()
        .withColumn("hit_ex", F.lit(1))
    )
    n2 = nb.select(
        F.col(id_col).alias("p_id"), "cluster_id", F.col("b_nv").alias("p_nv")
    )
    hit_batch = (
        nb.join(n2, on="cluster_id")
        .filter(F.col("p_id") < F.col(id_col))
        .filter(dot(F.col("b_nv"), F.col("p_nv")) > tau)
        .select(id_col)
        .distinct()
        .withColumn("hit_b", F.lit(1))
    )
    return (
        nb.join(hit_existing, on=id_col, how="left")
        .join(hit_batch, on=id_col, how="left")
        .select(
            id_col,
            "cluster_id",
            F.when(F.col("hit_ex") == 1, F.lit("dup_existing"))
            .when(F.col("hit_b") == 1, F.lit("dup_batch"))
            .otherwise(F.lit("unique"))
            .alias("status"),
        )
    )


def pq_train(
    corpus: DataFrame,
    vec_col: str,
    dim: int,
    m: int = 8,
    k: int = 16,
    n_iter: int = 2,
    seed: int = 42,
    cache_key: str | None = None,
    pre_staged: bool = False,
) -> list[list[tuple[int, list[float]]]]:
    """Product-quantization codebooks: split the vector into ``m``
    subspaces of dim/m and train an independent ``k``-centroid
    quantizer per subspace (seeded, deterministic — same Lloyd
    machinery as IVF). Returns m codebooks of (code, sub_centroid).

    PQ is the memory tier below int8: dim=64 float32 (256 B) becomes
    m=8 one-byte codes (8 B, 32x), and distances are computed against
    codes via lookup tables without ever decoding. Training is a
    build-time artifact like IVF centroids — train once, encode and
    serve many times: ``cache_key`` names the corpus and memoizes the
    codebooks under (key, dim, m, k, n_iter, seed), exactly like
    ``ivf_topk``'s ``centroid_cache_key`` (a hit is bit-identical to
    retraining; see the staleness contract at _CENTROID_CACHE)."""
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    ckey = (
        (cache_key, dim, m, k, n_iter, seed)
        if cache_key is not None
        else None
    )
    if ckey is not None and ckey in _CODEBOOK_CACHE:
        return _CODEBOOK_CACHE[ckey]
    d_sub = dim // m
    if not pre_staged:
        # skipped when the caller (ivfpq_topk) already repartitioned +
        # checkpointed this exact frame — a second localCheckpoint
        # would materialize the corpus in the block manager TWICE
        # (review finding)
        corpus = ensure_min_parallelism(corpus).localCheckpoint(eager=False)
    books: list[list[tuple[int, list[float]]]] = []
    for j in range(m):
        sub = corpus.select(
            F.slice(_as_double(F.col(vec_col)), j * d_sub + 1, d_sub).alias(
                "__sub"
            )
        )
        books.append(
            _kmeans_rounds(
                sub,
                "__sub",
                d_sub,
                _seeded_init(d_sub, k, seed + 7919 * j),
                n_iter,
            )
        )
    if ckey is not None:
        _CODEBOOK_CACHE[ckey] = books
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list[list[tuple[int, list[float]]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors as ``pq_codes`` (array<int>, one code per
    subspace): per-row argmin against each subspace's literal codebook
    — the same constant-folded scored-struct trick as
    assign_to_centroid, no join, no shuffle."""
    d_sub = len(codebooks[0][0][1])

    def _argmin_code(sub: Column, book) -> Column:
        # NB: capture `sub` via this factory, NOT a two-arg lambda with
        # a default — PySpark reads a second lambda parameter as the
        # (element, index) transform form and binds the INDEX to it.
        cents = F.expr(_centroids_sql(book))
        scored = F.transform(
            cents,
            lambda s: F.struct(
                F.aggregate(
                    F.zip_with(
                        sub,
                        s.getField("centroid"),
                        lambda x, c: (x - c) * (x - c),
                    ),
                    F.lit(0.0),
                    lambda a, v: a + v,
                ).alias("d2"),
                s.getField("cluster_id").alias("cluster_id"),
            ),
        )
        return F.array_sort(scored)[0].getField("cluster_id")

    code_cols = [
        _argmin_code(
            F.slice(_as_double(F.col(vec_col)), j * d_sub + 1, d_sub), book
        )
        for j, book in enumerate(codebooks)
    ]
    return df.withColumn("pq_codes", F.array(*code_cols))


def pq_topk_adc(
    corpus_codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[tuple[int, list[float]]]],
    id_col: str = "vec_id",
    qid_col: str = "qid",
    qvec_col: str = "qe",
    k: int = 10,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes, fully relational:

    1. distance tables: queries x (subspace, code, sub_centroid) —
       the codebooks join in as a broadcast table (n_q x m x k rows,
       e.g. 5 x 8 x 16 = 640), squared distance per cell; no driver
       collect of query vectors.
    2. scoring: corpus codes posexplode to (id, subspace, code), join
       the broadcast tables on (subspace, code), sum per (qid, id) —
       approximate distance = sum of per-subspace cell distances.
    3. two-stage grouped top-k on ascending distance.

    At 100 TB the corpus side carries only 1-byte codes through the
    explode, the tables stay broadcast-sized, and the sum is a partial
    aggregate — the classic IVF-PQ serving plan's ADC half.

    Contract (pinned by tests/test_similarity.py): PQ is a COARSE
    ranker — same-cluster vectors collapse to near-identical codes, so
    ADC top-k lands in the right cluster but does not resolve
    within-cluster order. Serve as shortlist (k ~ a few x final k)
    followed by exact rerank of the shortlist against the raw vectors
    (brute_force_topk over the candidate join)."""
    spark = corpus_codes.sparkSession
    d_sub = len(codebooks[0][0][1])
    book_rows = [
        (j, int(code), sub)
        for j, book in enumerate(codebooks)
        for code, sub in book
    ]
    books_df = spark.createDataFrame(
        book_rows, "j int, code int, sub array<double>"
    )
    qsub = F.slice(
        _as_double(F.col(qvec_col)), F.col("j") * d_sub + 1, d_sub
    )
    tables = (
        queries.crossJoin(F.broadcast(books_df))
        .select(
            qid_col,
            "j",
            "code",
            F.aggregate(
                F.zip_with(qsub, F.col("sub"), lambda x, c: (x - c) * (x - c)),
                F.lit(0.0),
                lambda a, v: a + v,
            ).alias("d2"),
        )
    )
    exploded = corpus_codes.select(
        id_col, F.posexplode("pq_codes").alias("j", "code")
    )
    scored = (
        exploded.join(F.broadcast(tables), ["j", "code"])
        .groupBy(qid_col, id_col)
        .agg(F.sum("d2").alias("adc_d2"))
    )
    return grouped_topk(
        scored, [qid_col], [F.asc("adc_d2"), F.asc(id_col)], k
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qe",
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    m: int = 8,
    k_codes: int = 64,
    n_iter: int = 2,
    shortlist: int = 200,
    seed: int = 42,
    centroid_cache_key: str | None = None,
) -> DataFrame:
    """IVF-PQ serving plan (the FAISS IndexIVFPQ shape), composed from
    the pieces above and fully relational:

    1. coarse: corpus inverted by nearest IVF centroid; each query
       probes its ``n_probe`` nearest lists (constant-folded literal
       centroids — no shuffle on the query side).
    2. fine: probed candidates are scored by PQ ADC — 1-byte codes
       join broadcast distance tables; the corpus's raw vectors never
       enter the candidate join.
    3. rerank: the per-query ADC ``shortlist`` joins BACK to the raw
       vectors for exact cosine, and the final top-k is exact over
       that shortlist (PQ's coarse-ranker contract — see pq_topk_adc).

    At 100 TB: lists bucket-prune the scan, candidates travel as
    (id, m bytes), only ``shortlist`` rows per query ever touch raw
    vectors again. Everything shuffles at most once per stage on its
    natural key.

    ``centroid_cache_key`` makes this train-once/probe-many like
    ``ivf_topk``, covering the WHOLE index build: coarse centroids
    memoize under the SAME cache tuple as plain IVF (one warm-up
    trains both serving paths), PQ codebooks under their own, and the
    ENCODED corpus — (id, cluster_id, pq_codes), FAISS's add() output
    — as a checkpointed frame, so a keyed second call runs zero Lloyd
    rounds AND zero per-row encodes: probe + ADC + rerank only
    (pinned by tests/test_similarity.py's poison-pill).

    Recall-vs-scale note (the sf0.1 audit that set these defaults):
    recall@10 degrades with corpus size through TWO knobs, and both
    must grow with quantization error — the original (k_codes=16,
    shortlist=50) passed the >=2-of-top-10 floor at 500 vectors but
    dropped to 1 hit at 5,000 (4-bit sub-codes mis-rank true
    neighbors out of a 1%-of-corpus shortlist). k_codes=64 +
    shortlist=200 holds >=3 hits at sf0.001/0.01/0.1; the rerank
    budget stays O(shortlist) rows per query, so the serve cost is
    unchanged. FAISS practice is the same escalation (nbits, then
    the rerank factor) as the index grows."""
    corpus = ensure_min_parallelism(corpus).localCheckpoint(eager=False)
    ivf_key = (
        (centroid_cache_key, dim, n_clusters, n_iter, seed)
        if centroid_cache_key is not None
        else None
    )
    cents = _CENTROID_CACHE.get(ivf_key) if ivf_key is not None else None
    if cents is None:
        cents = _kmeans_rounds(
            corpus, vec_col, dim, _seeded_init(dim, n_clusters, seed), n_iter
        )
        if ivf_key is not None:
            _CENTROID_CACHE[ivf_key] = cents
    books = pq_train(
        corpus, vec_col, dim, m=m, k=k_codes, n_iter=n_iter, seed=seed,
        cache_key=centroid_cache_key, pre_staged=True,
    )
    coded_key = (
        (centroid_cache_key, "coded", dim, id_col, vec_col, n_clusters,
         m, k_codes, n_iter, seed)
        if centroid_cache_key is not None
        else None
    )
    # NB the ADC stages below intentionally mirror pq_topk_adc's
    # machinery (distance-table build, posexplode+join+sum) rather
    # than calling it: this path interleaves the coarse probe join.
    # Keep the two in sync — tests pin both, but edits must visit both.
    coded = _cached_coded(coded_key) if coded_key is not None else None
    if coded is None:
        coded = pq_encode(
            assign_to_centroid(corpus, cents, vec_col), books,
            vec_col=vec_col,
        ).select(id_col, "cluster_id", "pq_codes", vec_col)
        coded = coded.localCheckpoint(eager=False)
        if coded_key is not None:
            _CODED_CORPUS_CACHE[coded_key] = coded

    qd = lambda c: F.aggregate(  # noqa: E731
        F.zip_with(
            _as_double(F.col(qvec_col)), c, lambda x, cc: (x - cc) * (x - cc)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored_cents = F.transform(
        F.expr(_centroids_sql(cents)),
        lambda s: F.struct(
            qd(s.getField("centroid")).alias("qd"),
            s.getField("cluster_id").alias("cluster_id"),
        ),
    )
    probed = F.transform(
        F.slice(F.array_sort(scored_cents), 1, n_probe),
        lambda s: s.getField("cluster_id"),
    )
    probes = queries.select(
        qid_col, qvec_col, F.explode(probed).alias("cluster_id")
    )
    cand = coded.select(id_col, "cluster_id", "pq_codes").join(
        F.broadcast(probes.select(qid_col, "cluster_id")), "cluster_id"
    )

    d_sub = dim // m
    book_rows = [
        (j, int(code), sub)
        for j, book in enumerate(books)
        for code, sub in book
    ]
    books_df = corpus.sparkSession.createDataFrame(
        book_rows, "j int, code int, sub array<double>"
    )
    qsub = F.slice(_as_double(F.col(qvec_col)), F.col("j") * d_sub + 1, d_sub)
    tables = queries.crossJoin(F.broadcast(books_df)).select(
        qid_col,
        "j",
        "code",
        F.aggregate(
            F.zip_with(qsub, F.col("sub"), lambda x, c: (x - c) * (x - c)),
            F.lit(0.0),
            lambda a, v: a + v,
        ).alias("d2"),
    )
    adc = (
        cand.select(qid_col, id_col, F.posexplode("pq_codes").alias("j", "code"))
        .join(F.broadcast(tables), [qid_col, "j", "code"])
        .groupBy(qid_col, id_col)
        .agg(F.sum("d2").alias("adc_d2"))
    )
    short = grouped_topk(
        adc, [qid_col], [F.asc("adc_d2"), F.asc(id_col)], shortlist
    ).select(qid_col, id_col)

    # exact rerank reads raw vectors from the resident index frame —
    # the source table is not rescanned at serve time
    rerank = (
        short.join(coded.select(id_col, vec_col), id_col)
        .join(F.broadcast(queries), qid_col)
        .select(
            qid_col,
            id_col,
            cosine(
                _as_double(F.col(qvec_col)), _as_double(F.col(vec_col))
            ).alias("cos_sim"),
        )
    )
    return grouped_topk(
        rerank, [qid_col], [F.desc("cos_sim"), F.asc(id_col)], k
    )


# Trained index artifacts, keyed by (corpus identity, training params).
# An IVF index is train-once / probe-many: the coarse quantizer (and
# for IVF-PQ, the per-subspace codebooks) is a build artifact (FAISS
# trains it offline; a warehouse materializes it as a tiny table), so
# re-running Lloyd rounds on every query batch against an unchanged
# corpus is pure waste. Artifacts are plain Python floats —
# session-independent, deterministic for a given (corpus, seed), and
# a few KB per entry.
#
# Staleness contract: the caller-supplied key NAMES a corpus snapshot
# (e.g. its sf_dir). The cache performs NO invalidation of its own —
# if the data under a key mutates in-process, the caller must either
# use a new key (include a snapshot version / row count in the name)
# or call clear_trained_indexes(). Serving stale centroids degrades
# recall silently; it never affects exact results.
_CENTROID_CACHE: dict[tuple, list[tuple[int, list[float]]]] = {}
_CODEBOOK_CACHE: dict[tuple, list[list[tuple[int, list[float]]]]] = {}
# The ENCODED corpus (id, cluster_id, pq_codes) is an index artifact
# too — FAISS's add() populates it offline and search() never touches
# raw vectors for it. Cached as a checkpointed DataFrame: its RDD
# blocks persist in the block manager, so a hit skips the per-row
# centroid-assign + m-subspace argmin encode entirely. Session-scoped
# BY VALIDATION: a cached frame is bound to the SparkSession that
# built it, so hits are checked against the live session and stale
# entries retrain instead of raising Py4J errors from a dead JVM
# (review finding — the old comment claimed this without implementing
# it).
_CODED_CORPUS_CACHE: dict[tuple, DataFrame] = {}
# Trained-artifact caches owned by OTHER modules (e.g. operators/
# opq.py's rotations) append themselves here so clear_trained_indexes
# covers them under the same staleness contract. Convention: keys are
# tuples whose first element is the caller cache_key.
_EXTRA_TRAINED_CACHES: list[dict] = []


def _cached_coded(key):
    """Session-validated _CODED_CORPUS_CACHE lookup: a frame built by
    a stopped SparkSession is dropped and treated as a miss."""
    df = _CODED_CORPUS_CACHE.get(key)
    if df is None:
        return None
    try:
        alive = not df.sparkSession._sc._jsc.sc().isStopped()
    except Exception:  # noqa: BLE001 — any introspection failure = dead
        alive = False
    if not alive:
        del _CODED_CORPUS_CACHE[key]
        return None
    return df


def clear_trained_indexes(cache_key: str | None = None) -> None:
    """Drop memoized IVF centroids / PQ codebooks / encoded corpora —
    all of them, or only entries trained under ``cache_key`` (any
    params). Call when the corpus a key names has changed in this
    process."""
    for cache in (
        _CENTROID_CACHE,
        _CODEBOOK_CACHE,
        _CODED_CORPUS_CACHE,
        *_EXTRA_TRAINED_CACHES,
    ):
        if cache_key is None:
            cache.clear()
        else:
            # composite first elements ("<key>\x00opq", "<key>\x00plain")
            # belong to the same corpus snapshot as <key>. The NUL
            # separator can't appear in sf_dir-style caller keys, so a
            # key like "a" never clears a DISTINCT corpus "a:b"
            # (ADVICE r8: ':' collided with plausible caller keys).
            for k in [
                k
                for k in cache
                if k[0] == cache_key
                or (
                    isinstance(k[0], str)
                    and k[0].startswith(f"{cache_key}\x00")
                )
            ]:
                del cache[k]


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qe",
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    n_iter: int = 2,
    seed: int = 42,
    centroid_cache_key: str | None = None,
) -> DataFrame:
    """IVF ANN: build centroids, invert the corpus by nearest centroid,
    and for each query score only the ``n_probe`` nearest lists.

    The corpus is checkpointed ONCE and shared by the Lloyd rounds and
    the final inversion; the probed-list choice is a per-row
    slice(array_sort(...)) over the literal centroid set — no window,
    no crossJoin, no shuffle on the query side at all. At scale the
    inverted corpus is written bucketed by cluster_id so repeated
    query batches prune to the probed lists at scan time.

    ``centroid_cache_key`` names the corpus (e.g. its sf_dir): when
    set, the trained centroids are memoized under (key, dim,
    n_clusters, n_iter, seed) and later calls skip the Lloyd rounds
    entirely — the train-once / probe-many split every serving IVF
    index makes. Training is deterministic (seeded init, fixed corpus)
    so a cache hit is bit-identical to retraining."""
    corpus = ensure_min_parallelism(corpus).localCheckpoint(eager=False)
    ckey = (
        (centroid_cache_key, dim, n_clusters, n_iter, seed)
        if centroid_cache_key is not None
        else None
    )
    cents = _CENTROID_CACHE.get(ckey) if ckey is not None else None
    if cents is None:
        cents = _kmeans_rounds(
            corpus, vec_col, dim, _seeded_init(dim, n_clusters, seed), n_iter
        )
        if ckey is not None:
            _CENTROID_CACHE[ckey] = cents
    inverted = assign_to_centroid(corpus, cents, vec_col)

    qd = lambda c: F.aggregate(  # noqa: E731
        F.zip_with(
            _as_double(F.col(qvec_col)),
            c,
            lambda x, cc: (x - cc) * (x - cc),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored_cents = F.transform(
        F.expr(_centroids_sql(cents)),
        lambda s: F.struct(
            qd(s.getField("centroid")).alias("qd"),
            s.getField("cluster_id").alias("cluster_id"),
        ),
    )
    probed = F.transform(
        F.slice(F.array_sort(scored_cents), 1, n_probe),
        lambda s: s.getField("cluster_id"),
    )
    probes = queries.select(
        qid_col,
        qvec_col,
        # query norm once per query row, not once per probed candidate
        # (r13 optimization; same device as brute_force_topk)
        l2_norm(_as_double(F.col(qvec_col))).alias("__qn"),
        F.explode(probed).alias("cluster_id"),
    )
    # corpus-side norm once per inverted row, before the probe join
    cand = inverted.withColumn(
        "__cn", l2_norm(_as_double(F.col(vec_col)))
    ).join(F.broadcast(probes), "cluster_id")
    scored = cand.select(
        F.col(qid_col),
        F.col(id_col),
        (
            dot(_as_double(F.col(qvec_col)), _as_double(F.col(vec_col)))
            / (F.col("__qn") * F.col("__cn"))
        ).alias("cos_sim"),
    )
    return grouped_topk(
        scored, [qid_col], [F.desc("cos_sim"), F.asc(id_col)], k
    )


def embedding_neardup_lsh_pairs(
    corpus: DataFrame,
    dim: int,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS at corpus scale (the
    SemDeDup-style semantic-dedup stage): candidates are vectors
    sharing an RHP-LSH bucket in ANY of ``n_tables`` tables; only
    candidates get the exact cosine, and pairs below ``threshold`` are
    dropped. The exact all-pairs twin is queries/vectors.py::
    vec_neardup_cosine_pairs — a corpus^2 scan this replaces with a
    shuffle on (table, bucket) keys.

    Recall shape: cos >= 0.95 pairs disagree on a given sign bit with
    prob <= acos(0.95)/pi ~ 0.1, so P(collide in one 8-bit table)
    ~ 0.9^8 ~ 0.43 and P(miss all 4 tables) ~ (1-0.43)^4 ~ 0.1; the
    oracle-checked floor lives in vec_neardup_lsh_planted_recall,
    where EXACTLY-parallel planted copies collide in EVERY table
    (positive scaling preserves every sign bit) — recall 1.0 by
    construction, not by luck."""
    spark = corpus.sparkSession
    corpus = ensure_min_parallelism(corpus)
    planes_rows = [
        (t, _hyperplanes(dim, n_bits, seed + 1000 * t))
        for t in range(n_tables)
    ]
    planes_df = spark.createDataFrame(
        planes_rows, "tab int, planes array<array<double>>"
    )

    def bucket_for(vec: Column) -> Column:
        bits = F.transform(
            F.col("planes"),
            lambda p: F.when(
                dot(vec, p) >= 0, F.lit(1).cast("long")
            ).otherwise(F.lit(0).cast("long")),
        )
        return F.aggregate(
            bits, F.lit(0).cast("long"), lambda acc, b: acc * 2 + b
        )

    hashed = (
        corpus.crossJoin(F.broadcast(planes_df))
        .select(
            F.col(id_col),
            F.col(vec_col),
            F.col("tab"),
            bucket_for(_as_double(F.col(vec_col))).alias("bucket"),
        )
        # materialized once: the self-join would recompute the
        # hyperplane projections per side (same device as the minhash
        # banding / simhash chunk joins)
        .localCheckpoint(eager=False)
    )
    a, b = hashed.alias("a"), hashed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tab") == F.col("b.tab"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{vec_col}").alias("__va"),
            F.col(f"b.{vec_col}").alias("__vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.select(
            "id_a",
            "id_b",
            cosine(_as_double(F.col("__va")), _as_double(F.col("__vb"))).alias(
                "cos_sim"
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
