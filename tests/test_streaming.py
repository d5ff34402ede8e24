"""Streaming materialization tests (SURVEY §2.6).

File-stream transport (each parquet file = one micro-batch) drives the
foreachBatch latest-wins merge; the critical semantic is the late-data
rule implied by the reference's latest-cell-wins stores: a late row older
than the stored one must NOT win.
"""

import datetime as dt
import os
import time

import pytest
from pyspark.sql import functions as F

from feast_java_old_spark.streaming.ingest import (
    read_online_table,
    stream_materialize,
    stream_window_features,
)
from feast_java_old_spark.operators.materialize import online_table_path

T0 = dt.datetime(2024, 1, 1)


def t(mins):
    return T0 + dt.timedelta(minutes=mins)


def _write_batch(spark, src_dir, rows, n):
    df = spark.createDataFrame(
        rows, "user_id long, event_timestamp timestamp, value double"
    )
    df.coalesce(1).write.mode("append").parquet(src_dir)
    # wait for the file to land
    deadline = time.time() + 10
    while time.time() < deadline:
        files = [f for f in os.listdir(src_dir) if f.endswith(".parquet")]
        if len(files) >= n:
            return
        time.sleep(0.1)


def _run_until(query, path, spark, predicate, timeout=60):
    deadline = time.time() + timeout
    while time.time() < deadline:
        query.processAllAvailable()
        df = read_online_table(spark, path)
        if df is not None and predicate(df):
            return df
        time.sleep(0.5)
    raise AssertionError("stream did not converge in time")


def test_latest_wins_merge_with_late_data(spark, tmp_path):
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    _write_batch(spark, src, [(1, t(10), 1.0), (2, t(10), 2.0)], 1)

    stream = spark.readStream.schema(
        "user_id long, event_timestamp timestamp, value double"
    ).parquet(src)
    q = stream_materialize(
        spark, stream, store, "user_events", ["user_id"],
        checkpoint=ckpt, watermark="2 hours",
    )
    path = online_table_path(store, "default", "user_events")
    try:
        df = _run_until(q, path, spark, lambda d: d.count() == 2)
        state = {r.user_id: r.value for r in df.collect()}
        assert state == {1: 1.0, 2: 2.0}

        # batch 2: newer row for user 1, LATE OLDER row for user 2 (must not win)
        _write_batch(spark, src, [(1, t(30), 10.0), (2, t(5), 99.0)], 2)
        df = _run_until(
            q, path, spark,
            lambda d: {r.user_id: r.value for r in d.collect()} == {1: 10.0, 2: 2.0},
        )
        ts = {r.user_id: r.event_timestamp for r in df.collect()}
        assert ts[1] == t(30) and ts[2] == t(10)

        # batch 3: brand-new key
        _write_batch(spark, src, [(3, t(40), 3.0)], 3)
        df = _run_until(q, path, spark, lambda d: d.count() == 3)
    finally:
        q.stop()


def test_stream_then_serve(spark, tmp_path):
    """Streamed online table is readable by the serving path."""
    import feast_java_old_spark as fs
    from feast_java_old_spark.operators.retrieval import get_online_features
    from feast_java_old_spark.registry.model import FileSource

    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    os.makedirs(src)
    _write_batch(spark, src, [(7, t(10), 7.5)], 1)
    stream = spark.readStream.schema(
        "user_id long, event_timestamp timestamp, value double"
    ).parquet(src)
    q = stream_materialize(
        spark, stream, store, "user_events", ["user_id"],
        checkpoint=str(tmp_path / "ckpt"), trigger_once=True,
    )
    q.awaitTermination(60)

    reg = fs.Registry()
    reg.apply_entity(fs.Entity("user_id", fs.ValueType.INT64))
    reg.apply_feature_table(
        fs.FeatureTable(
            "user_events", ["user_id"],
            [fs.Feature("value", fs.ValueType.DOUBLE)],
            batch_source=FileSource(file_url=src, event_timestamp_column="event_timestamp"),
        )
    )
    path = online_table_path(store, "default", "user_events")
    online = read_online_table(spark, path)
    out = get_online_features(
        spark, reg, [{"user_id": 7}, {"user_id": 8}], ["user_events:value"],
        request_ts=t(60), online_frames={"user_events": online},
    ).collect()
    assert out[0].user_events__value == 7.5
    assert out[1].user_events__value__status == "NOT_FOUND"


def test_stream_window_features(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_batch(
        spark, src,
        [(1, t(1), 1.0), (1, t(5), 3.0), (1, t(12), 5.0), (2, t(2), 7.0)],
        1,
    )
    stream = spark.readStream.schema(
        "user_id long, event_timestamp timestamp, value double"
    ).parquet(src)
    feats = stream_window_features(
        stream,
        ["user_id"],
        {"sum_value": F.sum("value"), "n": F.count(F.lit(1))},
        window_duration="10 minutes",
        watermark="1 hour",
    )
    q = (
        feats.writeStream.format("memory")
        .queryName("winfeats")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = {
        (r.user_id, r.event_timestamp): (r.sum_value, r.n)
        for r in spark.sql("select * from winfeats").collect()
    }
    assert rows[(1, t(10))] == (4.0, 2)   # events at t1, t5
    assert rows[(1, t(20))] == (5.0, 1)   # event at t12
    assert rows[(2, t(10))] == (7.0, 1)


def test_stream_running_features_match_batch_aggregate(spark, tmp_path):
    """applyInPandasWithState running aggregates: the last emitted row per
    key equals the batch groupBy over all events, and each batch a key
    appears in emits an updated row."""
    from feast_java_old_spark.streaming.ingest import stream_running_features

    src = str(tmp_path / "src")
    os.makedirs(src)
    b1 = [(1, t(1), 1.0), (1, t(5), 2.0), (2, t(2), 10.0)]
    b2 = [(1, t(20), 4.0), (3, t(21), 100.0)]
    _write_batch(spark, src, b1, 1)

    stream = spark.readStream.schema(
        "user_id long, event_timestamp timestamp, value double"
    ).parquet(src)
    feats = stream_running_features(stream, ["user_id"], "value")
    q = (
        feats.writeStream.format("memory")
        .queryName("runfeats")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        _write_batch(spark, src, b2, 2)
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            if spark.sql("select * from runfeats").count() >= 5:
                break
            time.sleep(0.5)
    finally:
        q.stop()

    rows = spark.sql("select * from runfeats").collect()
    # one emission per (key, batch containing it): keys 1,2 in b1; 1,3 in b2
    assert len(rows) == 4
    final = {}
    for r in rows:
        if r.user_id not in final or r.n_events > final[r.user_id].n_events:
            final[r.user_id] = r
    batch = spark.createDataFrame(
        b1 + b2, "user_id long, event_timestamp timestamp, value double"
    )
    want = {
        r.user_id: r
        for r in batch.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("s"),
            F.max("event_timestamp").alias("ts"),
        )
        .collect()
    }
    for uid, w in want.items():
        g = final[uid]
        assert (g.n_events, g.sum_value, g.event_timestamp) == (w.n, w.s, w.ts)
        assert g.evicted is False
    # intermediate emission for key 1 after batch 1 (n=2) precedes final n=3
    assert sorted(r.n_events for r in rows if r.user_id == 1) == [2, 3]


def test_stream_running_features_evicts_idle_keys(spark, tmp_path):
    """EventTimeTimeout: a key idle past the timeout is evicted with a
    final evicted=true row once the watermark passes."""
    from feast_java_old_spark.streaming.ingest import stream_running_features

    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_batch(spark, src, [(1, t(0), 1.0), (2, t(0), 2.0)], 1)
    stream = spark.readStream.schema(
        "user_id long, event_timestamp timestamp, value double"
    ).parquet(src)
    feats = stream_running_features(
        stream, ["user_id"], "value",
        watermark="1 minute", idle_timeout_ms=10 * 60 * 1000,
    )
    q = (
        feats.writeStream.format("memory")
        .queryName("evictfeats")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        # advance event time far past key 2's timeout; only key 1 active
        _write_batch(spark, src, [(1, t(60), 1.0)], 2)
        q.processAllAvailable()
        # one more batch so the watermark from batch 2 triggers the timeout
        _write_batch(spark, src, [(1, t(120), 1.0)], 3)
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            evicted = [
                r
                for r in spark.sql("select * from evictfeats").collect()
                if r.evicted
            ]
            if evicted:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    assert len(evicted) == 1
    e = evicted[0]
    assert (e.user_id, e.n_events, e.sum_value) == (2, 1, 2.0)


def test_stream_session_features_match_batch_kernel(spark, tmp_path):
    """Session windows under readStream agree with the batch
    session_rollup kernel on the same data."""
    from feast_java_old_spark.operators import windows
    from feast_java_old_spark.streaming.ingest import stream_session_features

    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = [
        (1, t(0), 1.0), (1, t(10), 2.0),   # session A (gap 10 < 30)
        (1, t(55), 4.0),                   # session B (gap 45 > 30)
        (2, t(50), 8.0), (2, t(70), 16.0), # session C
    ]
    _write_batch(spark, src, rows, 1)
    stream = spark.readStream.schema(
        "user_id long, event_timestamp timestamp, value double"
    ).parquet(src)
    feats = stream_session_features(
        stream, ["user_id"],
        {"sum_value": F.sum("value"), "n": F.count(F.lit(1))},
        gap="30 minutes",
    )
    q = (
        feats.writeStream.format("memory")
        .queryName("sessfeats")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        (r.user_id, r.sum_value, r.n)
        for r in spark.sql("select * from sessfeats").collect()
    }
    batch = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    want = {
        (r.user_id, r.sum_value_cents / 100.0, r.n_events)
        for r in windows.session_rollup(batch, ["user_id"]).collect()
    }
    assert got == want


def test_stream_dedup_drops_reingested_docs(spark, tmp_path):
    """Exact-dup documents arriving in later micro-batches (within the
    watermark) are dropped; novel documents pass through."""
    from feast_java_old_spark.streaming.ingest import stream_dedup

    src = str(tmp_path / "docs_src")
    os.makedirs(src)
    schema = "doc_id long, event_timestamp timestamp, text string"

    def write(rows, n):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        deadline = time.time() + 10
        while time.time() < deadline:
            if len([f for f in os.listdir(src) if f.endswith(".parquet")]) >= n:
                return
            time.sleep(0.1)

    write([(1, t(0), "alpha beta"), (2, t(1), "gamma delta")], 1)
    stream = spark.readStream.schema(schema).parquet(src)
    deduped = stream_dedup(stream, watermark="2 hours")
    q = (
        deduped.writeStream.format("memory")
        .queryName("sdedup")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: doc 3 is an exact re-ingest of doc 1 (different id,
        # same content) -> dropped; doc 4 is novel -> kept
        write([(3, t(5), "alpha beta"), (4, t(6), "epsilon zeta")], 2)
        q.processAllAvailable()
        got = {r.doc_id for r in spark.sql("select * from sdedup").collect()}
        assert got == {1, 2, 4}
    finally:
        q.stop()


def test_stream_enrich_against_online_table(spark, tmp_path):
    """Stream-static join: events stream enriched with a materialized
    online table. The versioned (vNNN + _LATEST) layout keeps a running
    stream's snapshot valid across re-materializations; a re-planned
    join resolves the new version."""
    from feast_java_old_spark.streaming.ingest import stream_enrich

    store = str(tmp_path / "features")
    src = str(tmp_path / "events_src")
    os.makedirs(src)
    os.makedirs(os.path.join(store, "v001"))

    def write_version(v, rows):
        d = os.path.join(store, v)
        spark.createDataFrame(rows, "user_id long, score double").write.mode(
            "overwrite"
        ).parquet(d)
        with open(os.path.join(store, "_LATEST"), "w") as f:
            f.write(v)

    def latest_features():
        with open(os.path.join(store, "_LATEST")) as f:
            return spark.read.parquet(os.path.join(store, f.read().strip()))

    write_version("v001", [(1, 10.0), (2, 20.0)])

    schema = "user_id long, event_timestamp timestamp, amount double"
    spark.createDataFrame([(1, t(0), 5.0), (3, t(1), 7.0)], schema).coalesce(
        1
    ).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    enriched = stream_enrich(stream, latest_features(), on=["user_id"])
    q = (
        enriched.writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r.user_id: r.score for r in spark.sql("select * from enriched").collect()}
        assert got == {1: 10.0, 3: None}  # missing key -> NULL (left join)

        # re-materialize as a NEW version: the running stream keeps its
        # snapshot (no mid-flight file deletion), and streams on fine
        write_version("v002", [(1, 11.0), (3, 30.0)])
        spark.createDataFrame([(3, t(5), 9.0)], schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        deadline = time.time() + 10
        while time.time() < deadline and len(
            [f for f in os.listdir(src) if f.endswith(".parquet")]
        ) < 2:
            time.sleep(0.1)
        q.processAllAvailable()
        snap = {
            (r.user_id, r.amount): r.score
            for r in spark.sql("select * from enriched").collect()
        }
        assert snap[(3, 9.0)] is None  # still the v001 snapshot
    finally:
        q.stop()

    # a re-planned query resolves v002
    stream2 = spark.readStream.schema(schema).parquet(src)
    q2 = (
        stream_enrich(stream2, latest_features(), on=["user_id"])
        .writeStream.format("memory")
        .queryName("enriched2")
        .outputMode("append")
        .start()
    )
    try:
        q2.processAllAvailable()
        got2 = {
            (r.user_id, r.amount): r.score
            for r in spark.sql("select * from enriched2").collect()
        }
        assert got2[(3, 9.0)] == 30.0 and got2[(1, 5.0)] == 11.0
    finally:
        q2.stop()


def test_stream_clean_ingest_composition(spark, tmp_path):
    """Streaming corpus intake: low-quality rows gated out inside the
    micro-batch, PII scrubbed, re-ingested duplicates dropped across
    batches — same semantics as the batch builders it composes."""
    from feast_java_old_spark.streaming.ingest import stream_clean_ingest

    src = str(tmp_path / "intake_src")
    os.makedirs(src)
    schema = "doc_id long, event_timestamp timestamp, text string"
    good = (
        "the quick brown fox jumps over the lazy dog and then the small "
        "cat walks in to see what all of the noise is about today at two"
    )

    def write(rows, n):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        deadline = time.time() + 10
        while time.time() < deadline:
            if len([f for f in os.listdir(src) if f.endswith(".parquet")]) >= n:
                return
            time.sleep(0.1)

    write([(1, t(0), good + " mail a@b.co"), (2, t(1), "x! y! z!")], 1)
    stream = spark.readStream.schema(schema).parquet(src)
    out = stream_clean_ingest(stream, watermark="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("intake")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = {r.doc_id: r.text for r in spark.sql("select * from intake").collect()}
        assert set(rows) == {1}          # low-quality doc 2 gated
        assert "[EMAIL]" in rows[1] and "a@b.co" not in rows[1]

        # batch 2: doc 3 re-ingests doc 1's content (PII variant scrubs to
        # the same fingerprint) -> dropped; doc 4 is novel -> kept
        write([(3, t(5), good + " mail a@b.co"), (4, t(6), good + " but different")], 2)
        q.processAllAvailable()
        got = {r.doc_id for r in spark.sql("select * from intake").collect()}
        assert got == {1, 4}
    finally:
        q.stop()


def test_stream_stream_join_bounded_lag(spark, tmp_path):
    """Clicks join impressions within the lag window; out-of-window or
    unknown keys do not match."""
    from feast_java_old_spark.streaming.ingest import stream_stream_join

    imp_src = str(tmp_path / "impressions")
    clk_src = str(tmp_path / "clicks")
    os.makedirs(imp_src)
    os.makedirs(clk_src)
    ischema = "ad_id long, event_timestamp timestamp, slot string"
    cschema = "ad_id long, event_timestamp timestamp, cost double"

    spark.createDataFrame(
        [(1, t(0), "top"), (2, t(0), "side"), (3, t(100), "top")], ischema
    ).coalesce(1).write.mode("append").parquet(imp_src)
    spark.createDataFrame(
        [
            (1, t(10), 0.5),   # within 30 min of impression 1 -> match
            (2, t(50), 0.7),   # 50 min after impression 2 -> too late
            (9, t(10), 0.9),   # unknown ad -> no match
        ],
        cschema,
    ).coalesce(1).write.mode("append").parquet(clk_src)

    imps = spark.readStream.schema(ischema).parquet(imp_src)
    clicks = spark.readStream.schema(cschema).parquet(clk_src)
    joined = stream_stream_join(
        clicks, imps, on=["ad_id"],
        watermark="2 hours", max_lag="30 minutes",
    ).select(
        F.col("l.ad_id").alias("ad_id"), "slot", "cost",
        F.col("l.event_timestamp").alias("click_ts"),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("select * from ssj").collect()
        assert {(r.ad_id, r.slot, r.cost) for r in rows} == {(1, "top", 0.5)}
    finally:
        q.stop()


def _write_cdc_batch(spark, src_dir, rows, n):
    df = spark.createDataFrame(
        rows,
        "user_id long, event_timestamp timestamp, seq long, op string, "
        "value double",
    )
    df.coalesce(1).write.mode("append").parquet(src_dir)
    deadline = time.time() + 10
    while time.time() < deadline:
        files = [f for f in os.listdir(src_dir) if f.endswith(".parquet")]
        if len(files) >= n:
            return
        time.sleep(0.2)


def test_stream_apply_cdc_tombstones_and_late_deletes(spark, tmp_path):
    from feast_java_old_spark.streaming.ingest import stream_apply_cdc

    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    _write_cdc_batch(
        spark, src,
        [(1, t(10), 1, "I", 1.0), (2, t(10), 2, "I", 2.0)], 1,
    )
    stream = spark.readStream.schema(
        "user_id long, event_timestamp timestamp, seq long, op string, "
        "value double"
    ).parquet(src)
    q = stream_apply_cdc(
        spark, stream, store, "user_cdc", ["user_id"],
        checkpoint=ckpt, watermark="2 hours",
    )
    path = online_table_path(store, "default", "user_cdc")
    try:
        df = _run_until(q, path, spark, lambda d: d.count() == 2)

        # batch 2: delete user 1; update user 2
        _write_cdc_batch(
            spark, src,
            [(1, t(20), 3, "D", None), (2, t(20), 4, "U", 20.0)], 2,
        )
        df = _run_until(
            q, path, spark,
            lambda d: {r.user_id: r.value for r in d.collect()} == {2: 20.0},
        )
        assert "op" not in df.columns

        # batch 3: LATE delete for user 2 (older than current) must lose;
        # re-insert user 1 after its delete
        _write_cdc_batch(
            spark, src,
            [(2, t(5), 5, "D", None), (1, t(30), 6, "I", 11.0)], 3,
        )
        df = _run_until(
            q, path, spark,
            lambda d: {r.user_id: r.value for r in d.collect()}
            == {1: 11.0, 2: 20.0},
        )
    finally:
        q.stop()


def test_merge_batch_replay_is_idempotent_and_gcs_versions(spark, tmp_path):
    """foreachBatch delivery is at-least-once: re-running a batch (same
    id, same rows) must converge to the identical state — latest-wins is
    commutative and idempotent. The versioned writer must also GC old
    vNNN dirs and keep the _LATEST pointer on the newest."""
    from feast_java_old_spark.streaming.ingest import merge_latest_batch

    path = str(tmp_path / "tab")
    b1 = spark.createDataFrame(
        [(1, t(10), 1.0), (2, t(20), 2.0)],
        "user_id long, event_timestamp timestamp, value double",
    )
    merge_latest_batch(spark, b1, path, ["user_id"], 1)
    before = {
        r.user_id: (r.event_timestamp, r.value)
        for r in read_online_table(spark, path).collect()
    }

    # replay the SAME batch (at-least-once redelivery)
    merge_latest_batch(spark, b1, path, ["user_id"], 1)
    after = {
        r.user_id: (r.event_timestamp, r.value)
        for r in read_online_table(spark, path).collect()
    }
    assert after == before

    # a newer batch advances state; an older duplicate row cannot regress
    b2 = spark.createDataFrame(
        [(1, t(30), 10.0), (2, t(5), 99.0)],
        "user_id long, event_timestamp timestamp, value double",
    )
    merge_latest_batch(spark, b2, path, ["user_id"], 2)
    merge_latest_batch(spark, b2, path, ["user_id"], 2)  # replay again
    state = {
        r.user_id: r.value for r in read_online_table(spark, path).collect()
    }
    assert state == {1: 10.0, 2: 2.0}

    # version GC: only the newest vNNN dir remains, pointer matches it
    vdirs = sorted(d for d in os.listdir(path) if d.startswith("v"))
    assert len(vdirs) == 1
    with open(os.path.join(path, "_LATEST")) as f:
        assert f.read().strip() == vdirs[0]


def test_stream_incremental_dedup_probes_static_index(spark, tmp_path):
    """Live batch docs probe the static corpus LSH index: a near-dup of
    an indexed doc is flagged with dup_of; a novel doc is is_new. A
    second micro-batch updates the complete-mode result."""
    from feast_java_old_spark.streaming.ingest import stream_incremental_dedup

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    index = spark.createDataFrame(
        [(1, base), (2, "static corpus document about spark structured streaming state")],
        "doc_id long, text string",
    )
    src = str(tmp_path / "inc_src")
    os.makedirs(src)
    schema = "doc_id long, event_timestamp timestamp, text string"

    def write(rows, n):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        deadline = time.time() + 10
        while time.time() < deadline:
            if len([f for f in os.listdir(src) if f.endswith(".parquet")]) >= n:
                return
            time.sleep(0.1)

    write([(100, t(0), base.replace("river", "creek"))], 1)
    stream = spark.readStream.schema(schema).parquet(src)
    out = stream_incremental_dedup(stream, index, threshold=0.4)
    q = (
        out.writeStream.format("memory")
        .queryName("sincdedup")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r.doc_id: r for r in spark.sql("select * from sincdedup").collect()}
        assert got[100].dup_of == 1 and got[100].is_new is False
        assert got[100].n_dups == 1 and got[100].best_jaccard >= 0.4
        write([(101, t(1), "completely novel incoming text with zero overlapping shingles anywhere")], 2)
        q.processAllAvailable()
        got = {r.doc_id: r for r in spark.sql("select * from sincdedup").collect()}
        assert got[101].dup_of is None and got[101].is_new is True
        assert got[100].dup_of == 1  # earlier doc's verdict unchanged
    finally:
        q.stop()


def test_stream_substring_dedup_strips_known_grams(spark, tmp_path):
    """Incoming docs lose exactly the tokens covered by 8-grams present
    in the static corpus; within-doc repetition alone does NOT remove
    (the stream twin seeds only against the corpus); a second
    micro-batch extends the complete-mode result without touching the
    first doc's verdict."""
    from feast_java_old_spark.streaming.ingest import stream_substring_dedup

    shared = "the quick brown fox jumps over the lazy dog near the river"
    rep = "alpha beta gamma delta epsilon zeta eta theta"
    corpus = spark.createDataFrame(
        [(1, f"{shared} completely different ending material follows now")],
        "doc_id long, text string",
    )
    src = str(tmp_path / "sub_src")
    os.makedirs(src)
    schema = "doc_id long, text string"

    def write(rows, n):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        deadline = time.time() + 10
        while time.time() < deadline:
            if len([f for f in os.listdir(src) if f.endswith(".parquet")]) >= n:
                return
            time.sleep(0.1)

    write([(100, f"intro words here {shared} outro trailing words")], 1)
    stream = spark.readStream.schema(schema).parquet(src)
    out = stream_substring_dedup(stream, corpus, k=8)
    q = (
        out.writeStream.format("memory")
        .queryName("ssubdedup")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r.doc_id: r for r in spark.sql("select * from ssubdedup").collect()}
        assert got[100].text == "intro words here outro trailing words"
        assert got[100].n_removed == 12 and got[100].n_tokens == 18
        # within-doc repetition is not a corpus hit -> untouched
        write([(101, f"{rep} filler middle words {rep}")], 2)
        q.processAllAvailable()
        got = {r.doc_id: r for r in spark.sql("select * from ssubdedup").collect()}
        assert got[101].n_removed == 0
        assert got[100].n_removed == 12
    finally:
        q.stop()


def test_stream_drift_psi_matches_batch_feature_drift(spark, tmp_path):
    """With one window spanning every current row, the streaming PSI
    must equal the batch feature_drift PSI bit-for-bit: same edges from
    the static reference, same bucket rule, same Laplace smoothing —
    the stream is just the per-window incremental form."""
    import uuid

    from feast_java_old_spark.operators.drift import feature_drift
    from feast_java_old_spark.streaming.ingest import stream_drift_psi

    split = dt.datetime(2024, 1, 16)
    rows = []
    # ref: values clustered low; cur: shifted up for type 'a', stable 'b'
    for i in range(40):
        rows.append(("a", dt.datetime(2024, 1, 1 + i % 14), 1.0 + (i % 7)))
        rows.append(("b", dt.datetime(2024, 1, 1 + i % 14), 5.0 + (i % 3)))
    for i in range(30):
        rows.append(("a", dt.datetime(2024, 1, 17 + i % 10), 5.0 + (i % 7)))
        rows.append(("b", dt.datetime(2024, 1, 17 + i % 10), 5.0 + (i % 3)))
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )
    batch = {
        r.event_type: (r.psi, r.n_ref, r.n_cur)
        for r in feature_drift(
            df, "value", "ts", split, ["event_type"], bins=10
        ).collect()
    }

    src = str(tmp_path / "src")
    os.makedirs(src)
    df.where(F.col("ts") >= F.lit(split)).select(
        "event_type", F.col("ts").alias("event_timestamp"), "value"
    ).coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "event_type string, event_timestamp timestamp, value double"
    ).parquet(src)
    out = stream_drift_psi(
        stream,
        df.where(F.col("ts") < F.lit(split)).select("event_type", "value"),
        value_col="value",
        group_col="event_type",
        bins=10,
        window_duration="365 days",  # one epoch-aligned window
        # ([2023-12-20, 2024-12-19), day 19710+365) swallows every cur row;
        # 60-day windows would split Jan-17 from Jan-18+ at day 19740
        watermark="1 day",
    )
    name = f"sdp_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish"
    got = {
        r.event_type: (r.psi, r.n_ref, r.n_cur)
        for r in spark.table(name).collect()
    }
    assert got == batch
    # and the monitor actually detects the engineered shift
    assert got["a"][0] > 0.25 > got["b"][0]


def test_stream_cusum_carries_state_across_batches(spark, tmp_path):
    """The running S must survive micro-batch boundaries: batch 1
    drives S just below the threshold, batch 2's rows only alarm if
    the carry S0 is live in the state store — a fresh S=0 would stay
    silent. Alerts equal the textbook recursion over the concatenated
    sequence. (Memory sinks cannot resume from a checkpoint, so the
    carry is exercised across micro-batches of ONE query — the same
    state-store path a checkpoint restart replays.)"""
    import uuid

    from feast_java_old_spark.streaming.ingest import stream_cusum_alerts

    src = str(tmp_path / "src")
    os.makedirs(src)
    ref = spark.createDataFrame(
        [("g", 10.0)] * 10, "event_type string, value double"
    )
    # k0 = 1000 cents; threshold 500. batch1 deviations: +200 x2 -> S 400
    b1 = [("g", t(10 + i), i, 12.0) for i in range(2)]
    # batch2: +200 x2 -> S 600, 800: alarms ONLY with carry (fresh S
    # would reach 200, 400)
    b2 = [("g", t(20 + i), 10 + i, 12.0) for i in range(2)]

    def write(rows):
        spark.createDataFrame(
            rows,
            "event_type string, event_timestamp timestamp, "
            "event_id long, value double",
        ).coalesce(1).write.mode("append").parquet(src)

    write(b1)
    stream = spark.readStream.schema(
        "event_type string, event_timestamp timestamp, "
        "event_id long, value double"
    ).parquet(src)
    out = stream_cusum_alerts(
        stream, ref, "value", "event_type",
        allowance_cents=0, threshold_cents=500,
    )
    name = f"scu_{uuid.uuid4().hex[:6]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table(name).count() == 0  # S peaked at 400 <= 500
        write(b2)
        q.processAllAvailable()
        alerts = sorted(r.s_cents for r in spark.table(name).collect())
        # recursion over the full sequence: S = 200, 400, 600, 800
        assert alerts == [600, 800]
    finally:
        q.stop()


# ---------------------------------------------------------- delta sink twin


def _merge_two_batches(spark, store, fmt):
    """Drive merge_latest_batch twice (late-older row must lose, newer
    must win, fresh key inserts) and read the table back sorted."""
    import datetime as dt

    from feast_java_old_spark.streaming.ingest import (
        merge_latest_batch,
        read_online_table,
    )

    b1 = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 10), 10.0),
            (2, dt.datetime(2024, 1, 12), 20.0),
        ],
        "user_id long, event_timestamp timestamp, value double",
    )
    b2 = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 11), 11.0),  # newer → wins
            (2, dt.datetime(2024, 1, 5), 99.0),  # late-older → must lose
            (3, dt.datetime(2024, 1, 1), 30.0),  # fresh key → insert
        ],
        "user_id long, event_timestamp timestamp, value double",
    )
    merge_latest_batch(spark, b1, store, ["user_id"], 0, table_format=fmt)
    merge_latest_batch(spark, b2, store, ["user_id"], 1, table_format=fmt)
    out = read_online_table(spark, store, table_format=fmt)
    return sorted(
        (r.user_id, r.event_timestamp, r.value) for r in out.collect()
    )


def test_delta_merge_sink_matches_parquet_sink(spark, tmp_path):
    """Serving identity of the two sink variants: the Delta MERGE INTO
    body and the parquet pointer-swap body converge to the same online
    table from the same micro-batches (latest-wins, late-older rows
    rejected, inserts applied)."""
    from feast_java_old_spark.streaming.ingest import delta_available

    got_parquet = _merge_two_batches(spark, str(tmp_path / "pq"), "parquet")
    import datetime as dt

    assert got_parquet == [
        (1, dt.datetime(2024, 1, 11), 11.0),
        (2, dt.datetime(2024, 1, 12), 20.0),
        (3, dt.datetime(2024, 1, 1), 30.0),
    ]
    if not delta_available():
        pytest.skip("delta-spark not installed in this environment")
    got_delta = _merge_two_batches(spark, str(tmp_path / "dl"), "delta")
    assert got_delta == got_parquet


def test_delta_sink_unavailable_raises_actionable_error(spark, tmp_path):
    from feast_java_old_spark.streaming.ingest import (
        delta_available,
        stream_materialize,
    )

    if delta_available():
        pytest.skip("delta-spark present: the guard path is not reachable")
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    )
    with pytest.raises(RuntimeError, match="delta-spark"):
        stream_materialize(
            spark,
            stream.selectExpr(
                "value AS user_id", "timestamp AS event_timestamp"
            ),
            str(tmp_path),
            "t",
            ["user_id"],
            table_format="delta",
        )


def test_unknown_table_format_rejected(spark, tmp_path):
    import datetime as dt

    from feast_java_old_spark.streaming.ingest import merge_latest_batch

    b = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1.0)],
        "user_id long, event_timestamp timestamp, value double",
    )
    with pytest.raises(ValueError, match="table_format"):
        merge_latest_batch(
            spark, b, str(tmp_path), ["user_id"], 0, table_format="orc"
        )


def test_delta_table_autodetected_on_parquet_read(spark, tmp_path):
    """The serving read path never threads a table_format flag — a
    Delta dir read as raw parquet would serve tombstoned pre-MERGE
    rows. read_online_table must auto-detect `_delta_log` and either
    read through Delta or (delta-spark absent) fail actionably."""
    from feast_java_old_spark.streaming.ingest import (
        delta_available,
        read_online_table,
    )

    store = tmp_path / "dl"
    (store / "_delta_log").mkdir(parents=True)
    if delta_available():
        pytest.skip("delta-spark present: covered by the identity test")
    with pytest.raises(RuntimeError, match="Delta table"):
        read_online_table(spark, str(store))


def test_remote_delta_detection_is_memoized(spark):
    """r10 ADVICE: isDeltaTable on a remote URI is a metadata roundtrip
    paid per serving read / per micro-batch — the per-path memo must
    short-circuit it. A memoized True answers WITHOUT touching the
    Delta bindings at all (provable here whether or not delta-spark is
    installed: the cached branch returns before the import), and local
    paths must bypass the memo entirely (tmpdirs are deleted and
    recreated across tests — stale layout state would misclassify)."""
    from feast_java_old_spark.streaming import ingest

    remote = "s3://bucket/online/t1"
    ingest._delta_layout_memo[remote] = True
    try:
        assert ingest._is_delta_table(spark, remote, remote=True) is True
        # a local path never consults the memo, even when a same-string
        # key is present — the live probe runs (and with delta absent,
        # the call sites guard with delta_available() first).
        local = "/tmp/definitely/not/a/table"
        ingest._delta_layout_memo[local] = True
        if not ingest.delta_available():
            with pytest.raises(ImportError):
                ingest._is_delta_table(spark, local, remote=False)
        else:
            assert (
                ingest._is_delta_table(spark, local, remote=False) is False
            )
    finally:
        ingest._delta_layout_memo.clear()


def test_delta_probe_never_caches_false(spark, monkeypatch):
    """r11 self-review: a probe returning False must NOT be memoized —
    'not a Delta table YET' includes never-materialized remote paths,
    and pinning False would blind this process to a table a separate
    ingest bootstraps later. Only a successful parquet READ proves a
    live non-Delta layout (read_online_table caches False there)."""
    import sys
    import types

    from feast_java_old_spark.streaming import ingest

    fake_tables = types.ModuleType("delta.tables")

    class _FakeDeltaTable:
        @staticmethod
        def isDeltaTable(_spark, _path):
            return False

    fake_tables.DeltaTable = _FakeDeltaTable
    fake_delta = types.ModuleType("delta")
    fake_delta.tables = fake_tables
    monkeypatch.setitem(sys.modules, "delta", fake_delta)
    monkeypatch.setitem(sys.modules, "delta.tables", fake_tables)
    ingest._delta_layout_memo.clear()
    try:
        remote = "s3://bucket/online/not_yet"
        assert ingest._is_delta_table(spark, remote, remote=True) is False
        assert remote not in ingest._delta_layout_memo  # not pinned
        # ...while True IS pinned (layout never downgrades)
        _FakeDeltaTable.isDeltaTable = staticmethod(lambda s, p: True)
        assert ingest._is_delta_table(spark, remote, remote=True) is True
        assert ingest._delta_layout_memo[remote] is True
    finally:
        ingest._delta_layout_memo.clear()


def test_parquet_merge_onto_delta_table_is_refused_without_delta(
    spark, tmp_path
):
    """Write-side twin of the read auto-detect: a parquet-format merge
    onto a Delta-initialized table would write version dirs the
    Delta-dispatching reader never serves — refuse loudly when
    delta-spark can't upgrade the write."""
    import datetime as dt

    from feast_java_old_spark.streaming.ingest import (
        delta_available,
        merge_latest_batch,
    )

    if delta_available():
        pytest.skip("delta-spark present: the write auto-upgrades")
    store = tmp_path / "dl2"
    (store / "_delta_log").mkdir(parents=True)
    b = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1.0)],
        "user_id long, event_timestamp timestamp, value double",
    )
    with pytest.raises(RuntimeError, match="Delta table"):
        merge_latest_batch(spark, b, str(store), ["user_id"], 0)
