"""Streaming twins evidenced (SURVEY §2.9): each streaming job runs
with Trigger.AvailableNow over a file-queue of parquet micro-batches
and must agree with its batch twin on the same fixture.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.schemas import EVENTS
from dataengineer_job_scraper_etl_spark.streaming.jobs import (
    run_available_now,
    running_user_totals,
    session_windows,
    stream_events,
    streaming_dedup,
    tumbling_counts,
)

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _mk_events(spark, rows):
    return spark.createDataFrame(
        [
            {
                "event_id": eid,
                "ts": T0 + dt.timedelta(minutes=m),
                "user_id": u,
                "event_type": et,
                "value": float(v),
                "props": "{}",
            }
            for (eid, m, u, et, v) in rows
        ],
        EVENTS,
    )


def _fixture(spark, tmp_path, name):
    """Two parquet drops appended into one stream dir + the batch df."""
    rows1 = [(1, 0, 1, "click", 1.0), (2, 10, 1, "click", 2.0),
             (3, 70, 2, "view", 3.0)]
    rows2 = [(4, 75, 2, "view", 4.0), (5, 130, 1, "click", 5.0)]
    d = str(tmp_path / name)
    _mk_events(spark, rows1).coalesce(1).write.mode("append").parquet(d)
    _mk_events(spark, rows2).coalesce(1).write.mode("append").parquet(d)
    batch = _mk_events(spark, rows1 + rows2)
    stream = stream_events(spark, d)
    return stream, batch


def _canon(rows):
    return sorted(tuple(r) for r in rows)


def test_tumbling_counts_matches_batch(spark, tmp_path):
    stream, batch = _fixture(spark, tmp_path, "ev1")
    out = tumbling_counts(stream)
    # complete mode: append would withhold windows the watermark has
    # not passed yet (the fixture spans 130min < the 2h watermark)
    run_available_now(out, "t_tumbling", str(tmp_path / "cp1"),
                      output_mode="complete")
    got = spark.table("t_tumbling").collect()
    expected = (
        batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w").getField("start").alias("window_start"),
                "event_type", "n", "total_value")
        .collect()
    )
    assert _canon(got) == _canon(expected) and len(got) > 0


def test_session_windows_matches_batch(spark, tmp_path):
    stream, batch = _fixture(spark, tmp_path, "ev2")
    out = session_windows(stream, gap="30 minutes")
    run_available_now(out, "t_sessions", str(tmp_path / "cp2"),
                      output_mode="complete")
    got = spark.table("t_sessions").collect()
    expected = (
        batch.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("sw").getField("start").alias("session_start"),
                F.col("sw").getField("end").alias("session_end"),
                "user_id", "n_events")
        .collect()
    )
    assert _canon(got) == _canon(expected)
    # user 1: events at 0,10 (one session) and 130 (another); user 2: one
    assert len(got) == 3


def test_streaming_dedup_by_event_id(spark, tmp_path):
    rows1 = [(1, 0, 1, "click", 1.0), (2, 5, 1, "click", 2.0)]
    # event 2 redelivered with a PERTURBED timestamp -> still deduped
    rows2 = [(2, 6, 1, "click", 2.0), (3, 9, 2, "view", 3.0)]
    d = str(tmp_path / "ev3")
    _mk_events(spark, rows1).coalesce(1).write.mode("append").parquet(d)
    _mk_events(spark, rows2).coalesce(1).write.mode("append").parquet(d)
    out = streaming_dedup(stream_events(spark, d))
    run_available_now(out, "t_dedup", str(tmp_path / "cp3"))
    got = spark.table("t_dedup").collect()
    assert sorted(r["event_id"] for r in got) == [1, 2, 3]


def test_streaming_dedup_first_delivery_wins(spark, tmp_path):
    """Cross-batch redelivery: the SECOND copy arrives in a later
    micro-batch with a drifted ts — the surviving row must carry the
    FIRST delivery's timestamp (the property the oracle entry
    streaming_dedup_redelivery hash-checks corpus-wide)."""
    rows1 = [(1, 0, 1, "click", 1.0), (2, 5, 1, "click", 2.0)]
    rows2 = [(2, 6, 1, "click", 2.0), (3, 9, 2, "view", 3.0)]
    d = str(tmp_path / "ev_fdw")
    _mk_events(spark, rows1).coalesce(1).write.mode("append").parquet(d)
    _mk_events(spark, rows2).coalesce(1).write.mode("append").parquet(d)
    out = streaming_dedup(stream_events(spark, d))
    run_available_now(out, "t_fdw", str(tmp_path / "cp_fdw"))
    got = {r["event_id"]: r["ts"] for r in spark.table("t_fdw").collect()}
    assert got[2] == T0 + dt.timedelta(minutes=5)  # not the minute-6 copy


def test_running_user_totals_final_state_matches_batch(spark, tmp_path):
    stream, batch = _fixture(spark, tmp_path, "ev4")
    # idle_timeout_ms=None: processing-time timeouts would keep the
    # drain-mode query alive forever (see operator docstring)
    out = running_user_totals(stream, idle_timeout_ms=None)
    run_available_now(out, "t_running", str(tmp_path / "cp4"),
                      output_mode="update")
    got = spark.table("t_running").collect()
    # running totals are monotone, so the max-n row per user is the
    # final state regardless of micro-batch structure / row order
    last = {}
    for r in got:
        cur = last.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            last[r["user_id"]] = (r["n_events"], r["total_value"])
    expected = {
        r["user_id"]: (r["n"], r["total"])
        for r in batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert last == expected


def test_stream_static_enrich(spark, tmp_path):
    stream, batch = _fixture(spark, tmp_path, "ev5")
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id long, tier string"
    )
    from dataengineer_job_scraper_etl_spark.streaming.jobs import (
        stream_static_enrich,
    )

    out = stream_static_enrich(stream, dim)
    run_available_now(out, "t_enrich", str(tmp_path / "cp5"))
    got = spark.table("t_enrich").collect()
    assert len(got) == batch.count()
    tiers = {r["event_id"]: r["tier"] for r in got}
    assert tiers[1] == "gold" and tiers[3] == "silver"


def test_stream_stream_attribution(spark, tmp_path):
    from dataengineer_job_scraper_etl_spark.streaming.jobs import (
        stream_stream_attribution,
    )

    # views at minute 0 and 40; purchases at minute 10 (user 1) and 90
    rows = [(1, 0, 1, "view", 1.0), (2, 10, 1, "purchase", 5.0),
            (3, 40, 1, "view", 1.0), (4, 90, 1, "purchase", 7.0),
            (5, 0, 2, "view", 1.0)]
    d = str(tmp_path / "ev6")
    _mk_events(spark, rows).coalesce(1).write.mode("append").parquet(d)
    ev = stream_events(spark, d)
    out = stream_stream_attribution(
        ev.filter("event_type = 'purchase'"),
        ev.filter("event_type = 'view'"),
        within="30 minutes",
    )
    run_available_now(out, "t_attr", str(tmp_path / "cp6"))
    got = {(r["p_id"], r["v_id"]) for r in spark.table("t_attr").collect()}
    # purchase 2 reaches view 1 (10 min before); purchase 4 reaches
    # NEITHER view (50 min gap); user 2's view matches no purchase
    assert got == {(2, 1)}


def test_foreach_batch_parquet_sink(spark, tmp_path):
    from dataengineer_job_scraper_etl_spark.streaming.jobs import (
        run_foreach_batch_parquet,
    )

    stream, batch = _fixture(spark, tmp_path, "ev7")
    out_path = str(tmp_path / "fb_out")
    run_foreach_batch_parquet(stream, out_path, str(tmp_path / "cp7"))
    back = spark.read.parquet(out_path)
    assert back.count() == batch.count()
    assert "__batch_id" in back.columns

    # exactly-once: replaying the same batches (fresh checkpoint ->
    # same batch ids) must overwrite each batch's partition, not
    # append duplicates
    run_foreach_batch_parquet(stream, out_path, str(tmp_path / "cp7_retry"))
    assert spark.read.parquet(out_path).count() == batch.count()


def test_stage_dir_refreshes_on_fixture_change(spark, tmp_path):
    """A regenerated fixture (new mtime/size) must get a fresh stage
    dir — the round-2 cache keyed only by sf_dir path silently served
    stale batches after fixture changes."""
    import os
    import shutil

    from dataengineer_job_scraper_etl_spark.queries.streaming_queries import (
        _stage_stream_dir,
    )

    sf_copy = tmp_path / "sf"
    sf_copy.mkdir()
    src = "/root/testdata/sf0.001/events.parquet"
    dst = str(sf_copy / "events.parquet")
    (shutil.copytree if os.path.isdir(src) else shutil.copyfile)(src, dst)

    first = _stage_stream_dir(spark, str(sf_copy))
    assert os.path.isdir(first)
    again = _stage_stream_dir(spark, str(sf_copy))
    assert again == first  # cache hit while the fixture is unchanged

    # simulate regeneration: bump mtime
    os.utime(dst, (os.path.getmtime(dst) + 10, os.path.getmtime(dst) + 10))
    refreshed = _stage_stream_dir(spark, str(sf_copy))
    assert refreshed != first
    assert os.path.isdir(refreshed)


def test_rocksdb_state_store_agrees_with_default_provider(spark, tmp_path):
    """The 100 TB state posture: the default provider holds all state
    in executor heap; RocksDB spills to local disk with bounded block
    cache. Run the state-heavy latest-per-key aggregation under BOTH
    providers on the same queue and pin (a) identical results and
    (b) that RocksDB really served the query (rocksdb* custom metrics
    in the state operator's progress)."""
    from dataengineer_job_scraper_etl_spark.streaming.jobs import (
        latest_per_user,
        use_rocksdb_state_store,
    )

    stream, batch = _fixture(spark, tmp_path, "ev_rocks")
    out = latest_per_user(stream)

    run_available_now(
        out, "t_latest_heap", str(tmp_path / "cp_heap"),
        output_mode="complete",
    )
    heap_rows = _canon(spark.table("t_latest_heap").collect())

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = use_rocksdb_state_store(spark)
    try:
        stream2, _ = _fixture(spark, tmp_path, "ev_rocks")  # same dir
        q = run_available_now(
            latest_per_user(stream2),
            "t_latest_rocks",
            str(tmp_path / "cp_rocks"),
            output_mode="complete",
        )
        rocks_rows = _canon(spark.table("t_latest_rocks").collect())
        lp = q.lastProgress
        metrics = lp["stateOperators"][0].get("customMetrics", {})
        assert any(k.startswith("rocksdb") for k in metrics), metrics
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    assert rocks_rows == heap_rows and len(rocks_rows) == 2


def test_transform_with_state_matches_legacy_and_batch(spark, tmp_path):
    """running_user_totals via Spark 4's transformWithStateInPandas
    (typed ValueState, RocksDB-only) must agree with the
    applyInPandasWithState twin and the batch aggregate — same
    final-state-per-user contract as the legacy test.

    Environment gate: the transformWithState Python<->JVM state server
    speaks protobuf; without the package the driver worker crashes at
    plan time (verified: ImportError from StateMessage_pb2). Skipped
    where protobuf is absent — same convention as the spaCy/codec
    seams."""
    import pytest

    pytest.importorskip("google.protobuf")
    from dataengineer_job_scraper_etl_spark.streaming.jobs import (
        running_user_totals_tws,
        use_rocksdb_state_store,
    )

    stream, batch = _fixture(spark, tmp_path, "ev_tws")
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = use_rocksdb_state_store(spark)  # required by the API
    try:
        out = running_user_totals_tws(stream)
        run_available_now(
            out, "t_tws", str(tmp_path / "cp_tws"), output_mode="update"
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    got = spark.table("t_tws").collect()
    last = {}
    for r in got:
        cur = last.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            last[r["user_id"]] = (r["n_events"], r["total_value"])
    expected = {
        r["user_id"]: (r["n"], r["total"])
        for r in batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert last == expected


def test_append_mode_emits_window_at_exact_watermark_boundary(spark, tmp_path):
    """The oracle for streaming_append_finalized_windows encodes the
    emission predicate window_end <= watermark. Pin the boundary: with
    max(ts) - delay == window end EXACTLY, the window must emit (a
    Spark upgrade flipping this to strict < fails here, not in the
    driver)."""
    rows = [(1, 0, 1, "click", 1.0), (2, 90, 1, "click", 1.0)]
    d = str(tmp_path / "ev_wb")
    _mk_events(spark, rows).coalesce(1).write.mode("append").parquet(d)
    out = tumbling_counts(stream_events(spark, d), watermark="30 minutes")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_wb")
        .option("checkpointLocation", str(tmp_path / "cp_wb"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("t_wb").collect()
    # watermark = 01:30 - 30min = 01:00 == end of the 00:00 window
    assert [(str(r["window_start"]), r["n"]) for r in got] == [
        ("2026-01-01 00:00:00", 1)
    ]


def test_checkpoint_resume_continues_state(spark, tmp_path):
    """Exactly-once across RESTARTS: drain a queue with AvailableNow,
    stop, drop a new file, start a NEW query from the SAME checkpoint —
    the resumed run must (a) not reprocess committed batches and (b)
    merge new data into restored state, ending equal to the batch
    aggregation over everything."""
    d = str(tmp_path / "ev_resume")
    cp = str(tmp_path / "cp_resume")
    rows1 = [(1, 0, 1, "click", 1.0), (2, 10, 1, "click", 2.0)]
    rows2 = [(3, 20, 1, "click", 4.0), (4, 30, 2, "view", 8.0)]
    _mk_events(spark, rows1).coalesce(1).write.mode("append").parquet(d)

    def drain(name):
        out = tumbling_counts(stream_events(spark, d))
        q = (
            out.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q

    q1 = drain("t_resume_a")
    first_rows = sum(p["numInputRows"] for p in q1.recentProgress)
    assert first_rows == 2
    _mk_events(spark, rows2).coalesce(1).write.mode("append").parquet(d)
    q2 = drain("t_resume_b")
    # only the NEW file's rows were processed on resume
    resumed_rows = sum(p["numInputRows"] for p in q2.recentProgress)
    assert resumed_rows == 2
    got = {
        (str(r["window_start"]), r["event_type"]): (r["n"], r["total_value"])
        for r in spark.table("t_resume_b").collect()
    }
    assert got[("2026-01-01 00:00:00", "click")] == (3, 7.0)
    assert got[("2026-01-01 00:00:00", "view")] == (1, 8.0)


def test_watermark_drops_late_rows_and_reports_metric(spark, tmp_path):
    """Late-data accounting — the operational contract of a watermark:
    once a window is finalized (state evicted in append mode), a late
    redelivery for it is DROPPED, the finalized result never mutates,
    and the drop is OBSERVABLE in stateOperators'
    numRowsDroppedByWatermark — the metric a production pipeline
    alerts on.

    Empirical nuance this queue pins (verified on Spark 4.1): a late
    row landing in the SAME micro-batch in which its window is being
    evicted still merges into the final emission; the strict drop +
    metric applies from the NEXT batch on — so the redelivery here
    arrives two batches after the watermark passed its window."""
    d = str(tmp_path / "late_q")
    files = [
        [(1, 0, 1, "click", 1.0), (2, 10, 1, "click", 2.0)],  # window 00
        [(3, 600, 2, "click", 3.0)],   # advances watermark past 00:00
        [(5, 610, 2, "click", 5.0)],   # batch that evicts+emits 00:00
        [(6, 25, 1, "click", 6.0),     # 9 h late: must be dropped
         (7, 620, 2, "click", 7.0)],
    ]
    for rows in files:
        _mk_events(spark, rows).coalesce(1).write.mode("append").parquet(d)

    out = tumbling_counts(
        stream_events(spark, d), window="1 hour", watermark="30 minutes"
    )
    q = run_available_now(
        out, "late_metrics", str(tmp_path / "ck"), output_mode="append"
    )
    import json

    dropped = sum(
        so.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for so in json.loads(p.json).get("stateOperators", [])
    )
    assert dropped == 1  # exactly the event_id=6 redelivery

    emitted = sorted(
        (r["window_start"].isoformat(), r["n"])
        for r in spark.table("late_metrics").collect()
    )
    # hour 00 finalized WITHOUT the late row; hour 10 still withheld
    # (watermark never passed its end before the queue drained)
    assert emitted == [(T0.isoformat(), 2)]


def test_streaming_hopping_equals_batch_restricted_to_finalized(
    spark, sf_dir
):
    """The ask #5 device: the streamed hopping windows must equal the
    BATCH hopping entry restricted by the finalization predicate
    w_end <= max(ts) - watermark, column-for-column on the shared
    metrics (the twin carries n_events; exact distinct users is not
    streaming-expressible)."""
    from dataengineer_job_scraper_etl_spark.catalog import all_queries
    from dataengineer_job_scraper_etl_spark.queries.hopstream import (
        _WATERMARK_MIN,
    )

    streamed = sorted(
        (r.w_start, r.w_end, r.n_events)
        for r in all_queries()["streaming_hopping_window"]
        .spark_fn(spark, sf_dir)
        .collect()
    )
    batch = all_queries()["events_hopping_window_volume"].spark_fn(
        spark, sf_dir
    )
    mx = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .agg(F.max(F.col("ts").cast("timestamp")).alias("m"))
        .collect()[0]
        .m
    )
    from datetime import timedelta

    cutoff = mx - timedelta(minutes=_WATERMARK_MIN)
    restricted = sorted(
        (r.w_start, r.w_end, r.n_events)
        for r in batch.collect()
        if r.w_end <= cutoff
    )
    assert streamed == restricted
    # the restriction is real: some trailing window is withheld
    assert len(restricted) < batch.count()


def test_streaming_topic_assignment_matches_batch_and_is_stateless(
    spark, sf_dir
):
    """VERDICT r12 ask #7: the streamed per-topic digest equals the
    batch Spark replay (frozen centroids, shared featurizer), and the
    streaming query itself carries ZERO state operators — the
    assignment is a pure stream-static projection; the aggregation
    happens after the drain."""
    import json
    import tempfile
    import uuid

    from dataengineer_job_scraper_etl_spark.catalog import all_queries
    from dataengineer_job_scraper_etl_spark.operators.similarity import (
        assign_to_centroid,
        kmeans_corpus_init,
    )
    from dataengineer_job_scraper_etl_spark.queries.streaming_queries import (
        _DOCS_STREAM_SCHEMA,
        _stage_docs_ingest_dir,
    )
    from dataengineer_job_scraper_etl_spark.queries.topics import (
        _DIM,
        _DOC_BOUND,
        _K,
        hashtf_unit_embeddings,
    )

    got = sorted(
        (r["topic"], r["n_docs"], r["id_checksum"])
        for r in all_queries()["streaming_topic_assignment"]
        .spark_fn(spark, sf_dir)
        .collect()
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    train = docs.filter(F.col("doc_id") < _DOC_BOUND)
    cents = kmeans_corpus_init(
        hashtf_unit_embeddings(train), "doc_id", "e", _DIM, _K, n_iter=2
    )
    incoming = docs.filter(F.col("doc_id") % 3 == 0).unionByName(
        docs.filter(
            (F.col("doc_id") % 3 != 0) & (F.col("doc_id") % 5 == 1)
        ).select((F.col("doc_id") + 2000000).alias("doc_id"), "text")
    )
    exp = sorted(
        (r["topic"], r["n_docs"], r["id_checksum"])
        for r in assign_to_centroid(
            hashtf_unit_embeddings(incoming), cents, "e"
        )
        .select(
            F.col("cluster_id").cast("bigint").alias("topic"), "doc_id"
        )
        .groupBy("topic")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
        )
        .collect()
    )
    assert got == exp and len(got) >= 2  # real multi-topic traffic

    # statelessness: run the streaming side directly and inspect the
    # engine's own progress telemetry
    d = _stage_docs_ingest_dir(spark, sf_dir)
    stream = (
        spark.readStream.schema(_DOCS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    assigned = assign_to_centroid(
        hashtf_unit_embeddings(stream.select("doc_id", "text")), cents, "e"
    ).select("doc_id", F.col("cluster_id").cast("bigint").alias("topic"))
    q = (
        assigned.writeStream.format("memory")
        .queryName("topicstream_" + uuid.uuid4().hex[:8])
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="topicstream_cp_")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progs = [json.loads(p.json) for p in q.recentProgress]
    assert progs, "no progress recorded"
    assert all(not p.get("stateOperators") for p in progs), [
        p.get("stateOperators") for p in progs
    ]
