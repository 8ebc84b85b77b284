"""Structured-Streaming queries as ORACLE-CHECKED catalog entries.

Each entry stages the ``events`` fixture into a stream directory
(micro-batch file queue), runs the watermarked streaming job with
``Trigger.AvailableNow`` (drain everything, then stop — the
reference's nightly-batch semantics, SURVEY §2.9), and returns the
memory-sink result. The oracle is plain batch SQL over the same
events — so the STREAMING execution path itself (watermarks, state
store, micro-batch planner) is hash-verified against DuckDB, not just
the batch twin.

Staging notes: the fixture parquet stores TIMESTAMP(NANOS), which the
streaming reader's declared TimestampType schema cannot scan directly;
the stage pass truncates to micros (Spark's native precision — same
values every downstream consumer sees) and writes two micro-batch
files so the run exercises multi-batch state handoff.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.catalog import register
from dataengineer_job_scraper_etl_spark.staging import (
    stage_once,
    write_ordered_batches,
)
from dataengineer_job_scraper_etl_spark.queries.events import _events
from dataengineer_job_scraper_etl_spark.streaming.jobs import (
    run_available_now,
    stream_events,
    tumbling_counts,
)

_EV_CTE = (
    "WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, "
    "event_type, value, props FROM events)"
)


def _stage_stream_dir(spark: SparkSession, sf_dir: str) -> str:
    """The events fixture as a 2-file stream queue — fingerprint-keyed,
    rename-published, and mtime-ordered via the SHARED staging
    protocol (dataengineer_job_scraper_etl_spark/staging.py, which
    documents the crash/race/ordering rules once for every stager)."""

    def build(staged: str) -> None:
        e = _events(spark, sf_dir)
        write_ordered_batches(
            staged,
            [
                e.filter(F.col("event_id") % 2 == 0),
                e.filter(F.col("event_id") % 2 == 1),
            ],
        )

    return stage_once(os.path.join(sf_dir, "events.parquet"), "stream", build)


def _drain(
    out: DataFrame, spark: SparkSession, output_mode: str = "complete"
) -> DataFrame:
    import shutil

    name = "q" + uuid.uuid4().hex[:12]
    cp = os.path.join(tempfile.gettempdir(), "spark_graft_cp", name)
    run_available_now(out, name, cp, output_mode=output_mode)
    # the drained query never resumes, so its checkpoint tree is dead
    # weight — without this, every entry invocation leaks one
    # uuid-named checkpoint into the temp root (review finding). The
    # memory-sink view stays: the returned frame reads it lazily.
    shutil.rmtree(cp, ignore_errors=True)
    return spark.table(name)


def _stage_redelivery_dir(spark: SparkSession, sf_dir: str) -> str:
    """A 2-file stream queue WITH at-least-once redelivery: batch 1 is
    the even-id events; batch 2 is the odd-id events PLUS a re-send of
    every id%10==0 event with its timestamp jittered +1s (the payload a
    retrying producer actually emits: same id, drifted ts). The
    first-delivery-wins contract REQUIRES batch order, which the
    shared stager enforces with explicit mtimes — FileStreamSource
    orders by mtime with random tie-break, so two quick appends in
    one timestamp tick could otherwise replay reversed and keep the
    jittered copy (review finding)."""

    def build(staged: str) -> None:
        e = _events(spark, sf_dir)
        first = e.filter(F.col("event_id") % 2 == 0)
        redelivered = first.filter(F.col("event_id") % 10 == 0).withColumn(
            "ts", F.col("ts") + F.expr("INTERVAL 1 SECOND")
        )
        second = e.filter(F.col("event_id") % 2 == 1).unionByName(redelivered)
        write_ordered_batches(staged, [first, second])

    return stage_once(
        os.path.join(sf_dir, "events.parquet"), "redeliver", build
    )


@register(
    "streaming_dedup_redelivery",
    f"""
{_EV_CTE}
SELECT event_id, user_id, event_type, ts, round(value, 2) AS value
FROM ev
""",
    doc="Exactly-once dedup over an at-least-once queue, executed "
    "through the STREAMING path: batch 2 redelivers every id%10==0 "
    "event with ts jittered +1s, and dropDuplicatesWithinWatermark "
    "keyed on event_id ALONE drops the re-sends across the micro-batch "
    "boundary (state from batch 1 survives to batch 2). The oracle is "
    "the PLAIN events table — hash equality proves the FIRST delivery "
    "won (original ts, not the jittered copy) and nothing else was "
    "dropped. Watermark spans the fixture so the check isolates dedup "
    "semantics from lateness eviction (production uses ~1 hour: state "
    "per id is evicted once redelivery can no longer occur).",
)
def streaming_dedup_redelivery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataengineer_job_scraper_etl_spark.streaming.jobs import (
        streaming_dedup,
    )

    d = _stage_redelivery_dir(spark, sf_dir)
    out = streaming_dedup(
        stream_events(spark, d), watermark="3650 days"
    ).select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.round("value", 2).alias("value"),
    )
    return _drain(out, spark, output_mode="append")


@register(
    "streaming_attribution_join",
    f"""
{_EV_CTE}
SELECT p.event_id AS p_id, p.user_id AS p_user, p.ts AS p_ts,
       v.event_id AS v_id, v.ts AS v_ts
FROM ev p JOIN ev v
  ON v.user_id = p.user_id
 AND v.ts >= p.ts - INTERVAL 15 MINUTE AND v.ts <= p.ts
WHERE p.event_type = 'purchase' AND v.event_type = 'view'
""",
    doc="Stream-stream interval self-join through the STREAMING path: "
    "purchases and views filtered from ONE file-queue stream, each "
    "purchase joined to same-user views in its trailing 15 minutes. "
    "Drained with AvailableNow over the 2-file queue, so pairs whose "
    "two sides arrive in DIFFERENT micro-batches must match from "
    "buffered join state — hash-checked against the batch interval-"
    "join SQL (the equi key user_id bounds the pair space; the range "
    "predicate prunes within key groups). Watermarks span the fixture "
    "to isolate join semantics from state eviction; production uses "
    "tight ones so buffered views age out once no future purchase can "
    "reach back.",
)
def streaming_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataengineer_job_scraper_etl_spark.streaming.jobs import (
        stream_stream_attribution,
    )

    d = _stage_stream_dir(spark, sf_dir)
    ev = stream_events(spark, d)
    out = stream_stream_attribution(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "view"),
        within="15 minutes",
        p_watermark="3650 days",
        v_watermark="3650 days",
    )
    return _drain(out, spark, output_mode="append")


@register(
    "streaming_session_dynamic_gap",
    f"""
{_EV_CTE}
, g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'click' THEN 600 ELSE 1800 END AS gap_s
  FROM ev),
m AS (
  SELECT user_id, ts, event_id,
         max(epoch_us(ts) + gap_s * 1000000) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max_end
  FROM g),
s AS (
  SELECT user_id, ts, event_id,
         CASE WHEN prev_max_end IS NULL
                OR epoch_us(ts) >= prev_max_end THEN 1 ELSE 0 END AS new_s
  FROM m),
sess AS (
  -- (ts, event_id) is a TOTAL order: every window in this chain must
  -- use it, or tied timestamps at a session boundary let different
  -- CTEs enumerate the tie in different orders (review finding)
  SELECT user_id, ts,
         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
  FROM s)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events
FROM sess GROUP BY user_id, sid
""",
    doc="DYNAMIC-gap session windows through the STREAMING path: each "
    "event proposes [ts, ts + gap(event_type)) — clicks 10 minutes, "
    "everything else 30 — and overlapping intervals merge. The oracle "
    "is variable-gap gaps-and-islands: a session breaks where ts "
    "reaches the running MAX of preceding interval ends (the merge "
    "rule; plain lag-gap is wrong under variable gaps because an "
    "earlier event's long gap can bridge over a later event's short "
    "one). Tie ordering is unobservable: same-ts events always merge, "
    "and the grouped output depends only on membership.",
)
def streaming_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataengineer_job_scraper_etl_spark.streaming.jobs import session_windows

    d = _stage_stream_dir(spark, sf_dir)
    gap = F.when(
        F.col("event_type") == "click", F.lit("10 minutes")
    ).otherwise(F.lit("30 minutes"))
    out = session_windows(stream_events(spark, d), gap=gap)
    return _drain(out, spark).select(
        "user_id", F.col("session_start"), "n_events"
    )


@register(
    "streaming_append_finalized_windows",
    f"""
{_EV_CTE}
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n, CAST(CAST(sum(CAST(value AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE) AS total_value
FROM ev
WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR
      <= (SELECT max(ts) - INTERVAL 30 MINUTE FROM ev)
GROUP BY 1, 2
""",
    doc="APPEND-mode watermark finalization semantics, hash-checked: "
    "tumbling hourly counts with a 30-minute watermark emit a window "
    "exactly once, when the watermark passes its END (boundary probed "
    "empirically: end == watermark still emits, so the oracle's "
    "predicate is <=). The final table is therefore the batch "
    "aggregation RESTRICTED to windows with end <= max(ts) - 30min — "
    "the tail of in-flight windows is withheld, which is precisely "
    "what an append-mode consumer (e.g. a downstream parquet sink) "
    "must expect. Rows arriving late but before their window's "
    "finalization batch still merge (probed: a window emits with its "
    "full count, not the on-time subset); only post-eviction arrivals "
    "would drop, which the 2-batch queue never produces.",
)
def streaming_append_finalized_windows(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = _stage_stream_dir(spark, sf_dir)
    out = tumbling_counts(
        stream_events(spark, d), watermark="30 minutes"
    )
    return _drain(out, spark, output_mode="append")


@register(
    "streaming_static_enrich",
    f"""
{_EV_CTE}
SELECT e.event_id, e.user_id, c.c_mktsegment AS segment,
       round(e.value, 2) AS value
FROM ev e LEFT JOIN customer c ON c.c_custkey = e.user_id + 1
""",
    doc="Stream-static join through the STREAMING path: the event "
    "stream enriched per micro-batch with a broadcast customer "
    "dimension (keyed c_custkey = user_id + 1 — the fixture's id "
    "spaces are offset by one). The static side is re-read every "
    "micro-batch, which is the slowly-changing-dimension semantics "
    "an always-on enrichment job wants; hash-checked against the "
    "batch left-join oracle across the 2-file queue.",
)
def streaming_static_enrich_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataengineer_job_scraper_etl_spark.streaming.jobs import (
        stream_static_enrich,
    )

    d = _stage_stream_dir(spark, sf_dir)
    dim = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select(
            (F.col("c_custkey") - 1).alias("user_id"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    out = stream_static_enrich(stream_events(spark, d), dim).select(
        "event_id",
        "user_id",
        "segment",
        F.round("value", 2).alias("value"),
    )
    return _drain(out, spark, output_mode="append")


@register(
    "streaming_tumbling_hourly",
    f"""
{_EV_CTE}
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n, CAST(CAST(sum(CAST(value AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE) AS total_value
FROM ev GROUP BY 1, 2
""",
    doc="events_tumbling_hourly executed through the STREAMING path: "
    "watermarked tumbling windows, AvailableNow drain over a 2-file "
    "micro-batch queue, memory sink — hash-checked against the same "
    "batch SQL oracle as the batch twin (complete output mode, so the "
    "final state is total).",
)
def streaming_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _stage_stream_dir(spark, sf_dir)
    return _drain(tumbling_counts(stream_events(spark, d)), spark)


@register(
    "streaming_session_counts",
    f"""
{_EV_CTE}
, gaps AS (
  -- NB '>=': session_window's end is EXCLUSIVE (an event exactly
  -- gap-after the previous one starts a NEW session), unlike the
  -- batch lag-gap query's '>' — mirror the streaming semantics here.
  SELECT user_id, ts,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= 1800000000
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session,
         event_id
  FROM ev),
sessions AS (
  SELECT user_id, ts,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM gaps)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events
FROM sessions GROUP BY user_id, session_id
""",
    doc="Native streaming session windows (F.session_window, 30-minute "
    "gap) drained with AvailableNow, checked against the batch lag-gap "
    "sessionization SQL: a session's window start == min(ts) of the "
    "lag-gap group, so the two formulations must produce identical "
    "(user, start, count) rows. Every window in the oracle chain "
    "orders by the TOTAL key (ts, event_id): with ts alone, tied "
    "timestamps at a session boundary could be enumerated in "
    "different orders by the gaps and running-sum windows and split "
    "a session nondeterministically (latent-only today — the "
    "fixtures contain no same-user ts ties).",
)
def streaming_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataengineer_job_scraper_etl_spark.streaming.jobs import session_windows

    d = _stage_stream_dir(spark, sf_dir)
    out = session_windows(stream_events(spark, d))
    return _drain(out, spark).select(
        "user_id", F.col("session_start"), "n_events"
    )


@register(
    "streaming_latest_per_user",
    f"""
{_EV_CTE}
SELECT user_id, event_id, event_type, ts FROM (
  SELECT user_id, event_id, event_type, ts,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM ev)
WHERE rn = 1
""",
    doc="Keyed dedup-to-latest executed through the STREAMING path: "
    "max over a (ts, event_id) struct per user in complete mode, "
    "drained with AvailableNow across the 2-file micro-batch queue "
    "(so per-key state merges across batches), hash-checked against "
    "the batch row_number()=1 oracle. State is one struct per key — "
    "bounded by key cardinality, not event volume.",
)
def streaming_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataengineer_job_scraper_etl_spark.streaming.jobs import latest_per_user

    d = _stage_stream_dir(spark, sf_dir)
    return _drain(latest_per_user(stream_events(spark, d)), spark)


# --- streaming corpus ingestion dedup --------------------------------

_DOCS_STREAM_SCHEMA = (
    "doc_id LONG, source STRING, text STRING"
)


def _stage_docs_ingest_dir(spark: SparkSession, sf_dir: str) -> str:
    """A 2-file queue of INCOMING documents for the continuous-
    ingestion entry: the doc_id%3==0 slice of the fixture split across
    two micro-batches, batch 2 additionally carrying planted EXACT
    COPIES of index docs (doc_id%5==1 rows re-keyed +2000000) so both
    classifications provably occur in the stream. Shared staging
    protocol (staging.py): fingerprint-keyed, rename-published,
    mtime-ordered."""

    src = os.path.join(sf_dir, "documents.parquet")

    def build(staged: str) -> None:
        d = spark.read.parquet(src).select("doc_id", "source", "text")
        incoming = d.filter(F.col("doc_id") % 3 == 0)
        planted = (
            d.filter(F.col("doc_id") % 3 != 0)
            .filter(F.col("doc_id") % 5 == 1)
            .select(
                (F.col("doc_id") + 2000000).alias("doc_id"), "source", "text"
            )
        )
        b1 = incoming.filter(F.col("doc_id") % 2 == 0)
        b2 = incoming.filter(F.col("doc_id") % 2 == 1).unionByName(planted)
        write_ordered_batches(staged, [b1, b2])

    return stage_once(src, "ingest", build)


@register(
    "streaming_ingest_dedup_status",
    """
WITH index AS (
  SELECT DISTINCT md5(text) AS dg FROM documents WHERE doc_id % 3 <> 0),
incoming AS (
  SELECT doc_id, source, md5(text) AS dg FROM documents
  WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + 2000000, source, md5(text) FROM documents
  WHERE doc_id % 3 <> 0 AND doc_id % 5 = 1)
SELECT source,
       CASE WHEN dg IN (SELECT dg FROM index)
            THEN 'exact_dup' ELSE 'new' END AS status,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum
FROM incoming GROUP BY source, status
""",
    doc="CONTINUOUS corpus ingestion dedup, executed through the "
    "streaming path: a 2-batch queue of incoming documents (with "
    "planted exact copies of index docs in batch 2) is classified per "
    "micro-batch against the static corpus digest index via a "
    "stream-static broadcast join — the always-on twin of the batch "
    "docs_incremental_ingest entry, and the shape a training corpus's "
    "intake actually runs (index re-read per batch = slowly-growing-"
    "index semantics; only 16-byte digests are joined, text never "
    "shuffles). The memory-sink rows are aggregated after the drain "
    "and hash-checked against the batch oracle: the micro-batch "
    "planner, the per-batch static re-scan, and the batch-boundary "
    "handoff all sit inside the verified path.",
)
def streaming_ingest_dedup_status(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = _stage_docs_ingest_dir(spark, sf_dir)
    index = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") % 3 != 0)
        .select(F.md5("text").alias("dg"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    stream = (
        spark.readStream.schema(_DOCS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    classified = (
        stream.select("doc_id", "source", F.md5("text").alias("dg"))
        .join(F.broadcast(index), "dg", "left")
        .select(
            "doc_id",
            "source",
            F.when(F.col("__hit").isNotNull(), "exact_dup")
            .otherwise("new")
            .alias("status"),
        )
    )
    rows = _drain(classified, spark, output_mode="append")
    return rows.groupBy("source", "status").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("doc_id").cast("bigint").alias("id_checksum"),
    )


def _stage_vec_ingest_dir(spark: SparkSession, sf_dir: str) -> str:
    """A 2-file queue of INCOMING embedding rows for the streaming
    SemDeDup entry: the vec_id%10>=8 batch slice split across two
    micro-batches, batch 2 additionally carrying planted EXACT COPIES
    of index vectors (vec_id%25==3 rows of the existing slice,
    re-keyed +2000000) so the dup_existing classification provably
    occurs in the stream at every sf. Shared staging protocol
    (staging.py): fingerprint-keyed, rename-published, mtime-ordered."""

    src = os.path.join(sf_dir, "embeddings.parquet")

    def build(staged: str) -> None:
        e = spark.read.parquet(src).select("vec_id", "embedding")
        batch = e.filter(F.col("vec_id") % 10 >= 8)
        planted = (
            e.filter((F.col("vec_id") % 10 < 8) & (F.col("vec_id") % 25 == 3))
            .select((F.col("vec_id") + 2000000).alias("vec_id"), "embedding")
        )
        b1 = batch.filter(F.col("vec_id") % 2 == 0)
        b2 = batch.filter(F.col("vec_id") % 2 == 1).unionByName(planted)
        write_ordered_batches(staged, [b1, b2])

    return stage_once(src, "vecingest", build)


def _semdedup_stream_oracle() -> str:
    from dataengineer_job_scraper_etl_spark.queries.clustering import (
        TAU,
        _kmeans_body,
        _normalized_cte,
    )

    return (
        "WITH "
        + _kmeans_body(" WHERE vec_id % 10 < 8")
        + _normalized_cte("a2", "a2n")
        + f""",
incoming AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
  WHERE vec_id % 10 >= 8
  UNION ALL
  SELECT vec_id + 2000000, CAST(embedding AS DOUBLE[]) FROM embeddings
  WHERE vec_id % 10 < 8 AND vec_id % 25 = 3),
ab AS (
  SELECT vec_id, e, cid FROM (
    SELECT incoming.vec_id, incoming.e, c2.cid,
           row_number() OVER (PARTITION BY incoming.vec_id
             ORDER BY list_distance(incoming.e, c2.c), c2.cid) AS rn
    FROM incoming CROSS JOIN c2) WHERE rn = 1)
"""
        + _normalized_cte("ab", "abn")
        + f""",
hit AS (
  SELECT b.vec_id FROM abn b JOIN a2n x ON b.cid = x.cid
  WHERE list_inner_product(b.ne, x.ne) > {TAU}
  GROUP BY b.vec_id)
SELECT abn.cid AS cluster_id,
       CASE WHEN h.vec_id IS NOT NULL THEN 'dup_existing'
            ELSE 'new' END AS status,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(abn.vec_id) AS BIGINT) AS id_checksum
FROM abn LEFT JOIN hit h ON abn.vec_id = h.vec_id
GROUP BY 1, 2
"""
    )


@register(
    "streaming_semdedup_ingest",
    _semdedup_stream_oracle(),
    doc="CONTINUOUS semantic-dedup ingestion: a 2-batch queue of "
    "incoming embedding rows (batch 2 carries planted exact copies of "
    "index vectors) is classified per micro-batch against a FROZEN "
    "cluster index — literal-argmin centroid assignment is a pure "
    "projection (streaming-safe, no state), then a stream-static "
    "broadcast join against the normalized per-cluster members: "
    "dup_existing / new. The always-on twin of vec_semdedup_"
    "incremental, mirroring streaming_ingest_dedup_status's digest "
    "shape; intra-batch (dup_batch) pruning stays in the batch "
    "operator — a stream-stream self-join would add watermark "
    "machinery the per-batch operator already covers. Memory-sink "
    "rows are aggregated after the drain and hash-checked against "
    "the batch oracle.",
)
def streaming_semdedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataengineer_job_scraper_etl_spark.operators.similarity import (
        assign_to_centroid,
        kmeans_corpus_init,
        normalize_assigned,
    )
    from dataengineer_job_scraper_etl_spark.functions.vector_math import l2_norm
    from dataengineer_job_scraper_etl_spark.queries.clustering import (
        DIM,
        N_CLUSTERS,
        N_ITER,
        TAU,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    existing = e.filter(F.col("vec_id") % 10 < 8).select("vec_id", "embedding")
    cents = kmeans_corpus_init(
        existing, "vec_id", "embedding", DIM, N_CLUSTERS, n_iter=N_ITER,
        cache_key=sf_dir,  # FROZEN index: train once, serve every batch
        slice_tag="mod10_lt8",  # names the vec_id % 10 < 8 training slice
    )
    index = normalize_assigned(existing, cents, "vec_id", "embedding").select(
        "cluster_id", F.col("nv").alias("ex_nv")
    )
    d = _stage_vec_ingest_dir(spark, sf_dir)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    vd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    # Inline normalization on the STREAM side (no checkpoint boundary
    # in a streaming plan): the loop-invariant norm fold re-evaluates
    # per element — O(dim^2) flops per incoming row, which is noise
    # next to the per-pair join work; the static side IS staged.
    nv = F.transform(vd, lambda x: x / F.nullif(l2_norm(vd), F.lit(0.0)))
    assigned = assign_to_centroid(stream, cents, "embedding").select(
        "vec_id", "cluster_id", nv.alias("b_nv")
    )
    from dataengineer_job_scraper_etl_spark.functions.vector_math import dot

    classified = (
        assigned.join(F.broadcast(index), on="cluster_id", how="left")
        .withColumn(
            "__hit",
            F.when(dot(F.col("b_nv"), F.col("ex_nv")) > TAU, 1),
        )
        .groupBy("vec_id", "cluster_id")
        .agg(F.max("__hit").alias("__hit"))
        .select(
            "vec_id",
            "cluster_id",
            F.when(F.col("__hit").isNotNull(), "dup_existing")
            .otherwise("new")
            .alias("status"),
        )
    )
    rows = _drain(classified, spark, output_mode="complete")
    return rows.groupBy("cluster_id", "status").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.sum("vec_id").cast("bigint").alias("id_checksum"),
    )


def _pc1_drift_stream_oracle() -> str:
    """Batch replay of the streamed drift monitor: the full PCA chain
    trained on the reference slice, the streamed rows (current slice
    plus the stager's planted re-keyed copies of existing vectors —
    re-sends are exactly what a drift monitor sees in production),
    bucketed by the frozen rank-exact decile edges."""
    from dataengineer_job_scraper_etl_spark.queries.pca import (
        _N_BUCKETS,
        _REF_WHERE,
        _pca_chain,
    )

    return (
        _pca_chain(_REF_WHERE)
        + f""",
ref AS MATERIALIZED (
  SELECT vec_id, pc1 FROM scores WHERE vec_id % 10 < 8),
nr AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM ref),
hist AS (SELECT pc1, count(*) AS c FROM ref GROUP BY pc1),
cum AS MATERIALIZED (
  SELECT pc1, sum(c) OVER (ORDER BY pc1) AS cum FROM hist),
edges AS MATERIALIZED (
  SELECT k, min(pc1) AS e
  FROM range(1, {_N_BUCKETS}) r(k) JOIN cum
    ON cum.cum >= (k * (SELECT n FROM nr) + {_N_BUCKETS - 1})
                  // {_N_BUCKETS}
  GROUP BY k),
curstream AS MATERIALIZED (
  SELECT vec_id, pc1 FROM scores WHERE vec_id % 10 >= 8
  UNION ALL
  SELECT s.vec_id + 2000000 AS vec_id, s.pc1 FROM scores s
  WHERE s.vec_id % 10 < 8 AND s.vec_id % 25 = 3),
bcur AS (
  SELECT r.vec_id, 1 + count(e.k) AS b
  FROM curstream r LEFT JOIN edges e ON e.e < r.pc1
  GROUP BY r.vec_id),
agg AS (SELECT b, count(*) AS n, sum(vec_id) AS s FROM bcur GROUP BY b)
SELECT CAST(k AS BIGINT) AS bucket,
       CAST(coalesce(agg.n, 0) AS BIGINT) AS n_cur,
       CAST(coalesce(agg.s, 0) AS BIGINT) AS id_checksum
FROM range(1, {_N_BUCKETS + 1}) r(k) LEFT JOIN agg ON agg.b = k
"""
    )


@register(
    "streaming_pc1_drift_monitor",
    _pc1_drift_stream_oracle(),
    doc="ALWAYS-ON embedding-drift monitor: the PCA axes and decile "
    "edges are frozen on the reference slice (trained once, served "
    "every batch — same contract as the frozen SemDeDup index), and "
    "each arriving micro-batch is scored and bucketed by a PURE "
    "stateless projection (64-term literal PC1 expression + 9-edge "
    "literal bucketer: no join, no state — streaming-safe by "
    "construction), feeding a complete-mode per-bucket count. The "
    "stream re-uses the SemDeDup ingest queue (batch 2 carries "
    "re-keyed copies of existing vectors — producer re-sends), so "
    "multi-batch handoff and re-sent rows cross the verified path; "
    "the oracle replays training, edges, and bucket counts in batch "
    "SQL. id_checksum pins per-bucket membership, not just counts.",
)
def streaming_pc1_drift_monitor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from dataengineer_job_scraper_etl_spark.queries.pca import (
        _N_BUCKETS,
        bucket_expr,
        frozen_pc1_monitor,
        pc1_score_expr,
    )

    m, v, edges, _ = frozen_pc1_monitor(spark, sf_dir)
    d = _stage_vec_ingest_dir(spark, sf_dir)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    bucketed = stream.select(
        "vec_id", pc1_score_expr(m, v).alias("pc1")
    ).select("vec_id", bucket_expr(edges).alias("bucket"))
    counted = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_cur"),
        F.sum("vec_id").alias("id_checksum"),
    )
    rows = _drain(counted, spark, output_mode="complete")
    base = spark.range(1, _N_BUCKETS + 1).select(
        F.col("id").alias("bucket")
    )
    return (
        base.join(F.broadcast(rows), "bucket", "left")
        .select(
            F.col("bucket").cast("bigint").alias("bucket"),
            F.coalesce("n_cur", F.lit(0)).cast("bigint").alias("n_cur"),
            F.coalesce("id_checksum", F.lit(0))
            .cast("bigint")
            .alias("id_checksum"),
        )
    )


def _stage_exsub_ingest_dir(spark: SparkSession, sf_dir: str) -> str:
    """A 2-file queue of ARRIVING documents for the streaming
    ExactSubstr entry: the planted batch slice (doc_id%10>=8 of
    queries/spans._planted_docs — the shared 24-token suffix lands on
    doc_id%20==8 rows in batch 1 and doc_id%20==19 rows in batch 2, so
    BOTH micro-batches provably carry cross-corpus duplicated runs).
    Shared staging protocol (staging.py)."""
    src = os.path.join(sf_dir, "documents.parquet")

    def build(staged: str) -> None:
        from dataengineer_job_scraper_etl_spark.queries.spans import (
            _planted_docs,
        )

        d = _planted_docs(spark, sf_dir).filter(F.col("doc_id") % 10 >= 8)
        write_ordered_batches(
            staged,
            [d.filter(F.col("doc_id") % 2 == 0),
             d.filter(F.col("doc_id") % 2 == 1)],
        )

    return stage_once(src, "exsub", build)


def _exsub_stream_oracle() -> str:
    """Batch replay of the streamed trim under the INDEX-ONLY rule
    (intra-batch repetition stays in the batch operator — the same
    carve-out streaming_semdedup_ingest documents for dup_batch)."""
    from dataengineer_job_scraper_etl_spark.queries.spans import (
        EXSUB_MIN_RUN,
        EXSUB_SHINGLE,
        _PLANT,
        _PLANT_PRED,
    )

    k = EXSUB_SHINGLE
    return f"""
WITH raw AS (
  SELECT doc_id,
         CASE WHEN {_PLANT_PRED} THEN text || ' {_PLANT}'
              ELSE text END AS text
  FROM documents),
tok AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
  FROM raw),
co AS (SELECT doc_id, t FROM tok WHERE doc_id % 10 < 8),
ba AS (SELECT doc_id, t FROM tok WHERE doc_id % 10 >= 8),
idx AS (
  SELECT DISTINCT
         md5(array_to_string(list_slice(t, pos + 1, pos + {k}), ' ')) AS h
  FROM (SELECT t, unnest(range(0, greatest(len(t) - {k} + 1, 0))) AS pos
        FROM co)),
sh AS (
  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         md5(array_to_string(list_slice(t, pos + 1, pos + {k}), ' ')) AS h
  FROM (SELECT doc_id, t,
               unnest(range(0, greatest(len(t) - {k} + 1, 0))) AS pos
        FROM ba)),
cov AS (
  SELECT DISTINCT doc_id, cp
  FROM (SELECT s.doc_id, unnest(range(s.pos, s.pos + {k})) AS cp
        FROM sh s JOIN idx USING (h))),
isl AS (
  SELECT doc_id, cp,
         cp - row_number() OVER (PARTITION BY doc_id ORDER BY cp) AS g
  FROM cov),
runs AS (
  SELECT doc_id, min(cp) AS s, max(cp) AS e, count(*) AS len
  FROM isl GROUP BY doc_id, g HAVING count(*) >= {EXSUB_MIN_RUN}),
rm AS (SELECT doc_id, CAST(cp AS BIGINT) AS cp
       FROM (SELECT doc_id, unnest(range(s, e + 1)) AS cp FROM runs)),
pos AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS p, w
        FROM (SELECT doc_id, unnest(t) AS w,
                     generate_subscripts(t, 1) AS i
              FROM ba)),
kept AS (
  SELECT pos.doc_id, pos.p, pos.w
  FROM pos LEFT JOIN rm ON pos.doc_id = rm.doc_id AND pos.p = rm.cp
  WHERE rm.cp IS NULL),
reasm AS (SELECT doc_id, string_agg(w, ' ' ORDER BY p) AS cleaned
          FROM kept GROUP BY doc_id),
rem AS (SELECT doc_id, CAST(sum(len) AS BIGINT) AS removed_toks
        FROM runs GROUP BY doc_id),
tot AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_toks FROM ba)
SELECT t.doc_id AS doc_id, t.n_toks AS n_toks,
       CAST(coalesce(rem.removed_toks, 0) AS BIGINT) AS removed_toks,
       md5(coalesce(reasm.cleaned, '')) AS cleaned_md5
FROM tot t
LEFT JOIN rem USING (doc_id)
LEFT JOIN reasm USING (doc_id)
"""


@register(
    "streaming_exact_substring_ingest",
    _exsub_stream_oracle(),
    doc="CONTINUOUS ExactSubstr ingestion: arriving documents are "
    "trimmed per micro-batch against the FROZEN corpus shingle-digest "
    "index — the always-on twin of docs_exact_substring_ingest, under "
    "the INDEX-ONLY rule (a position is duplicated iff its digest is "
    "in the corpus index; intra-batch repetition stays in the batch "
    "operator, the streaming_semdedup_ingest carve-out). The streamed "
    "plan is STATELESS append: shingle -> md5 -> stream-static "
    "left-semi join (digests only travel; broadcast here, a bucketed "
    "digest table at scale) -> array-side position expansion into the "
    "memory sink, so the micro-batch planner and the per-batch static "
    "join sit inside the verified path; run assembly + trim reuse the "
    "per-doc core post-drain. cleaned_md5 pins exact reassembly of "
    "every arriving doc; both staged micro-batches carry planted "
    "cross-corpus duplicated runs.",
)
def streaming_exact_substring_ingest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from dataengineer_job_scraper_etl_spark.queries.spans import (
        EXSUB_MIN_RUN,
        EXSUB_SHINGLE,
        _planted_docs,
        _sliding_k_shingles,
        _trim_covered_runs,
        exact_substring_index,
    )
    from dataengineer_job_scraper_etl_spark.queries.text import _tokens

    corpus = _planted_docs(spark, sf_dir).filter(F.col("doc_id") % 10 < 8)
    idx = exact_substring_index(corpus)
    d = _stage_exsub_ingest_dir(spark, sf_dir)
    stream = (
        spark.readStream.schema(_DOCS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    sh = stream.select(
        "doc_id",
        F.posexplode(
            _sliding_k_shingles(_tokens(F.col("text")), EXSUB_SHINGLE)
        ).alias("pos", "shingle"),
    ).select("doc_id", "pos", F.md5(F.col("shingle")).alias("h"))
    cov = sh.join(F.broadcast(idx), "h", "left_semi").select(
        "doc_id",
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + EXSUB_SHINGLE - 1)
        ).alias("cp"),
    )
    rows = _drain(cov, spark, output_mode="append")
    base = spark.read.parquet(d).select(
        "doc_id", _tokens(F.col("text")).alias("t")
    )
    out = _trim_covered_runs(base, rows.distinct(), EXSUB_MIN_RUN)
    return out.select(
        "doc_id",
        "n_toks",
        "removed_toks",
        F.md5(F.col("cleaned")).alias("cleaned_md5"),
    )
