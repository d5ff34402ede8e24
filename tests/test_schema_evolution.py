"""Schema evolution across the materialize/serve boundary (parity:
``BigTableSchemaRegistry.java:33-107`` content-hash schema registry +
``BigTableOnlineRetriever.decodeFeatures:169-207`` per-row-schema decode;
``CassandraOnlineRetriever.java:225-246``): rows written under an old
feature-set revision stay servable after the spec adds / drops / retypes
a feature, conformed to the CURRENT schema at read time."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

import feast_java_old_spark as fs
from feast_java_old_spark.operators.materialize import (
    materialize_versioned,
    read_online_versioned,
    _load_schema_registry,
)
from feast_java_old_spark.registry.model import FileSource


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double, tag string"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def _table_v1(src):
    return fs.FeatureTable(
        name="ut",
        entities=["user_id"],
        features=[
            fs.Feature("value", fs.ValueType.DOUBLE),
            fs.Feature("tag", fs.ValueType.STRING),
        ],
        batch_source=src,
    )


def _table_v2(src):
    # drop: tag; retype: value DOUBLE -> STRING; add: vdup (field-mapped)
    return fs.FeatureTable(
        name="ut",
        entities=["user_id"],
        features=[
            fs.Feature("value", fs.ValueType.STRING),
            fs.Feature("vdup", fs.ValueType.DOUBLE),
        ],
        batch_source=src,
    )


@pytest.fixture()
def registry():
    reg = fs.Registry()
    reg.apply_entity(fs.Entity("user_id", fs.ValueType.INT64))
    return reg


def test_versioned_materialize_serves_across_schema_change(
    spark, registry, tmp_path
):
    src_path = str(tmp_path / "events.parquet")
    store = str(tmp_path / "store")
    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 1, 10)
    _write_events(
        spark,
        src_path,
        [(1, t0, 1.5, "a"), (2, t0, 2.5, "b")],
    )
    src1 = FileSource(file_url=src_path, event_timestamp_column="ts")
    v1 = registry.apply_feature_table(_table_v1(src1))
    assert v1.revision == 1
    materialize_versioned(spark, registry, "ut", store)

    # revise: user 2 gets a NEW event under the new spec; user 1's latest
    # row still lives in the v1 epoch.
    _write_events(spark, src_path, [(2, t1, 9.5, "z")])
    src2 = FileSource(
        file_url=src_path,
        event_timestamp_column="ts",
        field_mapping={"value": "vdup"},
    )
    # vdup is value renamed; the retyped `value` column is absent from
    # the v2 source after the rename -> stored NULL in the v2 epoch.
    v2 = registry.apply_feature_table(_table_v2(src2))
    assert v2.revision == 2
    materialize_versioned(spark, registry, "ut", store)

    out = read_online_versioned(
        spark, registry, "ut", store, revision_col="src_rev"
    ).orderBy("user_id")
    rows = {r.user_id: r for r in out.collect()}
    assert set(rows) == {1, 2}
    # user 1: served from the v1 epoch under the v2 schema —
    # value retyped double->string at read, vdup (added) -> NULL,
    # tag (dropped) gone entirely.
    assert rows[1].src_rev == 1
    assert rows[1].value == "1.5"
    assert rows[1].vdup is None
    assert "tag" not in out.columns
    # user 2: later event in the v2 epoch wins; value was never in the
    # v2 source (renamed away) -> NULL, vdup carries it.
    assert rows[2].src_rev == 2
    assert rows[2].value is None
    assert rows[2].vdup == 9.5


def test_versioned_epoch_idempotent_and_registry_contents(
    spark, registry, tmp_path
):
    src_path = str(tmp_path / "events.parquet")
    store = str(tmp_path / "store")
    _write_events(spark, src_path, [(1, dt.datetime(2024, 1, 1), 1.0, "a")])
    src = FileSource(file_url=src_path, event_timestamp_column="ts")
    registry.apply_feature_table(_table_v1(src))
    p1 = materialize_versioned(spark, registry, "ut", store)
    p2 = materialize_versioned(spark, registry, "ut", store)
    # content-hash epoch: unchanged spec overwrites its own directory
    assert p1 == p2
    reg = _load_schema_registry(p1.rsplit("/rev=", 1)[0])
    assert len(reg) == 1
    (meta,) = reg.values()
    assert meta["revision"] == 1
    assert [f["name"] for f in meta["features"]] == ["tag", "value"]


def test_versioned_event_time_beats_revision(spark, registry, tmp_path):
    """Latest event wins across epochs regardless of which revision wrote
    it; revision only breaks exact event-time ties (the later revision's
    write observed the earlier one)."""
    src_path = str(tmp_path / "events.parquet")
    store = str(tmp_path / "store")
    t_new = dt.datetime(2024, 1, 20)
    t_tie = dt.datetime(2024, 1, 5)
    _write_events(
        spark, src_path, [(1, t_new, 7.0, "new"), (2, t_tie, 1.0, "v1")]
    )
    src = FileSource(file_url=src_path, event_timestamp_column="ts")
    registry.apply_feature_table(_table_v1(src))
    materialize_versioned(spark, registry, "ut", store)

    # v2 epoch: user 1 only has an OLDER event; user 2 ties exactly.
    _write_events(
        spark, src_path,
        [(1, dt.datetime(2024, 1, 2), 3.0, "old"), (2, t_tie, 2.0, "v2")],
    )
    src2 = FileSource(file_url=src_path, event_timestamp_column="ts")
    t2 = _table_v1(src2)
    t2.features = t2.features + [fs.Feature("vdup", fs.ValueType.DOUBLE)]
    registry.apply_feature_table(t2)
    materialize_versioned(spark, registry, "ut", store)

    rows = {
        r.user_id: r
        for r in read_online_versioned(
            spark, registry, "ut", store, revision_col="src_rev"
        ).collect()
    }
    assert rows[1].value == 7.0 and rows[1].src_rev == 1  # newest event wins
    assert rows[2].value == 2.0 and rows[2].src_rev == 2  # tie -> later rev


def test_versioned_entity_change_raises(spark, registry, tmp_path):
    src_path = str(tmp_path / "events.parquet")
    store = str(tmp_path / "store")
    _write_events(spark, src_path, [(1, dt.datetime(2024, 1, 1), 1.0, "a")])
    src = FileSource(file_url=src_path, event_timestamp_column="ts")
    registry.apply_feature_table(_table_v1(src))
    materialize_versioned(spark, registry, "ut", store)

    registry.apply_entity(fs.Entity("other_id", fs.ValueType.INT64))
    t2 = _table_v1(src)
    t2.entities = ["other_id"]
    registry.apply_feature_table(t2)
    with pytest.raises(ValueError, match="entity-set"):
        read_online_versioned(spark, registry, "ut", store)


def test_versioned_never_materialized_returns_none(spark, registry, tmp_path):
    src = FileSource(
        file_url=str(tmp_path / "nope.parquet"), event_timestamp_column="ts"
    )
    registry.apply_feature_table(_table_v1(src))
    assert (
        read_online_versioned(spark, registry, "ut", str(tmp_path / "store"))
        is None
    )


def test_versioned_frame_serves_through_get_online_features(
    spark, registry, tmp_path
):
    """The conformed cross-epoch frame plugs straight into the J1 online
    lookup (``online_frames``) — versioning is invisible to serving."""
    from feast_java_old_spark.operators import get_online_features

    src_path = str(tmp_path / "events.parquet")
    store = str(tmp_path / "store")
    _write_events(
        spark, src_path,
        [(1, dt.datetime(2024, 1, 1), 1.5, "a")],
    )
    src = FileSource(file_url=src_path, event_timestamp_column="ts")
    registry.apply_feature_table(_table_v1(src))
    materialize_versioned(spark, registry, "ut", store)
    frame = read_online_versioned(spark, registry, "ut", store)
    out = get_online_features(
        spark,
        registry,
        [{"user_id": 1}, {"user_id": 404}],
        ["ut:value"],
        online_frames={"ut": frame},
        request_ts=dt.datetime(2024, 1, 31),
    ).collect()
    assert out[0]["ut__value"] == 1.5
    assert out[0]["ut__value__status"] == "PRESENT"
    assert out[1]["ut__value__status"] == "NOT_FOUND"


def test_compact_versioned_preserves_serving_and_bounds_epochs(
    spark, registry, tmp_path
):
    """Compaction contract: the served frame is IDENTICAL before and
    after (conformed latest-wins is what gets rewritten), exactly one
    epoch + one registry entry survive (under the CURRENT spec hash),
    and stale epoch dirs are gone from disk."""
    import os

    from feast_java_old_spark.operators.materialize import (
        compact_versioned,
        online_table_path,
    )

    src_path = str(tmp_path / "events.parquet")
    store = str(tmp_path / "store")
    _write_events(
        spark, src_path,
        [(1, dt.datetime(2024, 1, 1), 1.5, "a"), (2, dt.datetime(2024, 1, 1), 2.5, "b")],
    )
    src1 = FileSource(file_url=src_path, event_timestamp_column="ts")
    registry.apply_feature_table(_table_v1(src1))
    materialize_versioned(spark, registry, "ut", store)

    _write_events(spark, src_path, [(2, dt.datetime(2024, 1, 10), 9.5, "z")])
    src2 = FileSource(
        file_url=src_path, event_timestamp_column="ts",
        field_mapping={"value": "vdup"},
    )
    registry.apply_feature_table(_table_v2(src2))
    materialize_versioned(spark, registry, "ut", store)

    def snap():
        return sorted(
            map(tuple, read_online_versioned(
                spark, registry, "ut", store
            ).collect())
        )

    before = snap()
    epoch = compact_versioned(spark, registry, "ut", store)
    after = snap()
    assert after == before

    tpath = online_table_path(store, "default", "ut")
    revs = [d for d in os.listdir(tpath) if d.startswith("rev=")]
    assert revs == [os.path.basename(epoch)]
    reg = _load_schema_registry(tpath)
    assert len(reg) == 1
    (meta,) = reg.values()
    assert meta["revision"] == 2
    # compaction is idempotent
    compact_versioned(spark, registry, "ut", store)
    assert snap() == before


def test_compact_versioned_never_materialized_raises(
    spark, registry, tmp_path
):
    from feast_java_old_spark.operators.materialize import compact_versioned

    src = FileSource(
        file_url=str(tmp_path / "nope.parquet"), event_timestamp_column="ts"
    )
    registry.apply_feature_table(_table_v1(src))
    with pytest.raises(KeyError, match="no versioned epochs"):
        compact_versioned(spark, registry, "ut", str(tmp_path / "store"))


def test_stream_epoch_joins_batch_epoch_under_current_schema(
    spark, registry, tmp_path
):
    """Streaming half of schema evolution: a v1 BATCH epoch and a v2
    STREAMING epoch (written after the spec added `vdup` and retyped
    `value`) serve together through read_online_versioned — the stream
    lands in the current spec's content-hash epoch, late-vs-new rows
    merge latest-wins across the writers, and v1 rows conform to the
    v2 schema."""
    import os

    from feast_java_old_spark.streaming.ingest import (
        stream_materialize_versioned,
    )

    src_path = str(tmp_path / "events.parquet")
    store = str(tmp_path / "store")
    stream_src = str(tmp_path / "stream_src")
    os.makedirs(stream_src)
    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 1, 10)

    _write_events(
        spark, src_path,
        [(1, t0, 1.5, "a"), (2, t0, 2.5, "b")],
    )
    src1 = FileSource(file_url=src_path, event_timestamp_column="ts")
    registry.apply_feature_table(_table_v1(src1))
    materialize_versioned(spark, registry, "ut", store)

    # spec revision: value DOUBLE -> STRING (retype), tag dropped,
    # vdup DOUBLE added — the stream carries (value, vdup) natively.
    registry.apply_feature_table(
        _table_v2(FileSource(file_url=src_path, event_timestamp_column="ts"))
    )
    # stream: user 2 gets a NEWER row (wins over its batch epoch row);
    # user 3 is stream-only; value arrives as a double -> try_cast to
    # the declared STRING at ingest.
    spark.createDataFrame(
        [(2, t1, 9.5, 90.0), (3, t1, 3.5, 30.0)],
        "user_id long, event_timestamp timestamp, value double, vdup double",
    ).coalesce(1).write.mode("overwrite").parquet(stream_src)
    stream = spark.readStream.schema(
        "user_id long, event_timestamp timestamp, value double, vdup double"
    ).parquet(stream_src)
    q = stream_materialize_versioned(
        spark, registry, stream, "ut", store,
        checkpoint=str(tmp_path / "ckpt"), trigger_once=True,
    )
    assert q.awaitTermination(300), "stream did not finish"

    out = read_online_versioned(
        spark, registry, "ut", store, revision_col="src_rev"
    )
    rows = {r.user_id: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    # batch v1 row conformed to v2 schema
    assert rows[1].src_rev == 1 and rows[1].value == "1.5" and rows[1].vdup is None
    # stream v2 row wins over the batch v1 row for user 2
    assert rows[2].src_rev == 2 and rows[2].value == "9.5" and rows[2].vdup == 90.0
    assert rows[3].src_rev == 2 and rows[3].vdup == 30.0

    # and compaction folds the mixed batch/stream epochs into one
    from feast_java_old_spark.operators.materialize import compact_versioned

    before = sorted(map(tuple, out.drop("src_rev").collect()))
    compact_versioned(spark, registry, "ut", store)
    after = sorted(
        map(tuple, read_online_versioned(spark, registry, "ut", store).collect())
    )
    assert after == before


# ---------------------------------------------------------------- property

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# unique (entity, minute) pairs per epoch -> no intra-epoch tie ambiguity;
# the same (entity, minute) MAY appear in both epochs (the cross-epoch
# revision tiebreak is exactly what we want generated).
_epoch_hist = st.dictionaries(
    keys=st.tuples(st.integers(0, 3), st.integers(0, 50)),
    values=st.sampled_from([1.5, 2.0, -3.25, 0.5, 99.0]),
    min_size=0,
    max_size=12,
)


def _vers_oracle(h1: dict, h2: dict):
    """Pure-python versioned serve: per entity pick max (minute, rev);
    conform v1 winners to the v2 schema (b -> None, c dropped)."""
    best: dict[int, tuple[int, int, float]] = {}
    for rev, h in ((1, h1), (2, h2)):
        for (e, minute), v in h.items():
            cur = best.get(e)
            if cur is None or (minute, rev) > (cur[0], cur[1]):
                best[e] = (minute, rev, v)
    return {
        e: (v, (v * 10 if rev == 2 else None), rev)
        for e, (minute, rev, v) in best.items()
    }


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(h1=_epoch_hist, h2=_epoch_hist)
def test_property_versioned_serve_matches_python_oracle(
    spark, tmp_path_factory, h1, h2
):
    """Randomized two-epoch histories against an independent pure-python
    oracle: cross-epoch latest-wins with revision tiebreak + conformance
    of old-epoch rows to the current schema (added feature -> NULL,
    dropped feature -> absent)."""
    tmp = tmp_path_factory.mktemp("versprop")
    store = str(tmp / "store")
    src = str(tmp / "src.parquet")

    reg = fs.Registry()
    reg.apply_entity(fs.Entity("user_id", fs.ValueType.INT64))

    def write(h, with_b):
        rows = [
            (e, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), v,
             (v * 10 if with_b else None), -v)
            for (e, m), v in h.items()
        ] or [(999, dt.datetime(2024, 1, 1), 0.0, None, 0.0)]
        spark.createDataFrame(
            rows,
            "user_id long, ts timestamp, a double, b double, c double",
        ).coalesce(1).write.mode("overwrite").parquet(src)

    fsrc = FileSource(file_url=src, event_timestamp_column="ts")
    write(h1, with_b=False)
    reg.apply_feature_table(
        fs.FeatureTable(
            name="pt", entities=["user_id"],
            features=[fs.Feature("a", fs.ValueType.DOUBLE),
                      fs.Feature("c", fs.ValueType.DOUBLE)],
            batch_source=fsrc,
        )
    )
    materialize_versioned(spark, reg, "pt", store)

    write(h2, with_b=True)
    v2 = fs.FeatureTable(
        name="pt", entities=["user_id"],
        features=[fs.Feature("a", fs.ValueType.DOUBLE),
                  fs.Feature("b", fs.ValueType.DOUBLE)],
        batch_source=FileSource(file_url=src, event_timestamp_column="ts"),
    )
    reg.apply_feature_table(v2)
    materialize_versioned(spark, reg, "pt", store)

    got = {
        r.user_id: (r.a, r.b, r.src_rev)
        for r in read_online_versioned(
            spark, reg, "pt", store, revision_col="src_rev"
        ).collect()
        if r.user_id != 999  # the empty-epoch sentinel row
    }
    expected = _vers_oracle(h1, h2)
    expected.pop(999, None)
    assert got == expected


def test_dangling_epoch_registration_does_not_break_serving(
    spark, registry, tmp_path
):
    """The streaming writer registers its spec at stream start, BEFORE
    the first micro-batch commits. A registered-but-dataless epoch must
    be skipped — not make every other epoch unservable — and a table
    whose only epoch is dangling reads as never-materialized."""
    from feast_java_old_spark.operators.materialize import (
        register_epoch_schema,
    )

    src_path = str(tmp_path / "events.parquet")
    store = str(tmp_path / "store")
    t0 = dt.datetime(2024, 1, 1)
    _write_events(spark, src_path, [(1, t0, 1.5, "a")])
    src1 = FileSource(file_url=src_path, event_timestamp_column="ts")
    registry.apply_feature_table(_table_v1(src1))

    # dangling-only: registered, no data dir -> never-materialized
    register_epoch_schema(store, "default", registry.get_feature_table("ut"))
    assert read_online_versioned(spark, registry, "ut", store) is None

    # materialize v1, then register (but never write) a v2 epoch
    materialize_versioned(spark, registry, "ut", store)
    src2 = FileSource(
        file_url=src_path,
        event_timestamp_column="ts",
        field_mapping={"value": "vdup"},
    )
    registry.apply_feature_table(_table_v2(src2))
    register_epoch_schema(store, "default", registry.get_feature_table("ut"))
    out = read_online_versioned(spark, registry, "ut", store)
    rows = {r.user_id: r for r in out.collect()}
    assert set(rows) == {1}
    assert rows[1].value == "1.5"  # v1 row conformed to the v2 schema


def test_epoch_seq_monotone_across_registry_restarts(
    spark, registry, tmp_path
):
    """Event-time ties between epochs must break on *registration
    order*, not the in-memory Registry ``revision`` counter: a fresh
    Registry (the documented restart-the-stream workflow) restarts
    revisions at 1, so two epochs can share revision==1 — only the
    ``epoch_seq`` stamp persisted in ``_schemas.json`` under the file
    lock is restart-safe (ADVICE r7 materialize.py:719)."""
    src_path = str(tmp_path / "events.parquet")
    store = str(tmp_path / "store")
    t0 = dt.datetime(2024, 1, 1)

    # registry lifetime 1: v1 epoch, user 1 @ t0 with value 1.5
    _write_events(spark, src_path, [(1, t0, 1.5, "a")])
    src1 = FileSource(file_url=src_path, event_timestamp_column="ts")
    v1 = registry.apply_feature_table(_table_v1(src1))
    assert v1.revision == 1
    materialize_versioned(spark, registry, "ut", store)

    # registry lifetime 2 (fresh Registry => revision restarts at 1):
    # v2 epoch writes the SAME key at the SAME event timestamp
    reg2 = fs.Registry()
    reg2.apply_entity(fs.Entity("user_id", fs.ValueType.INT64))
    _write_events(spark, src_path, [(1, t0, 9.5, "z")])
    src2 = FileSource(
        file_url=src_path,
        event_timestamp_column="ts",
        field_mapping={"value": "vdup"},
    )
    v2 = reg2.apply_feature_table(_table_v2(src2))
    assert v2.revision == 1  # the collision the seq stamp exists for
    materialize_versioned(spark, reg2, "ut", store)

    schemas = _load_schema_registry(store + "/default/ut")
    seqs = sorted(m["epoch_seq"] for m in schemas.values())
    assert seqs == [1, 2]  # persisted max+1, not the reset revision

    # later-REGISTERED epoch wins the exact event-time tie
    rows = {
        r.user_id: r
        for r in read_online_versioned(
            spark, reg2, "ut", store, revision_col="src_rev"
        ).collect()
    }
    assert rows[1].src_rev == 2
    assert rows[1].vdup == 9.5  # v2 payload, not v1's


def test_compact_assigns_fresh_epoch_seq_under_lock(
    spark, registry, tmp_path
):
    """compact_versioned's surviving epoch outranks every epoch it
    absorbed: its seq is max-existing+1 (stamped before the prune), so
    a late writer re-registering an old spec can never tie with it."""
    from feast_java_old_spark.operators.materialize import (
        compact_versioned,
    )

    src_path = str(tmp_path / "events.parquet")
    store = str(tmp_path / "store")
    t0 = dt.datetime(2024, 1, 1)
    _write_events(spark, src_path, [(1, t0, 1.5, "a")])
    src1 = FileSource(file_url=src_path, event_timestamp_column="ts")
    registry.apply_feature_table(_table_v1(src1))
    materialize_versioned(spark, registry, "ut", store)

    _write_events(spark, src_path, [(2, t0, 2.5, "b")])
    src2 = FileSource(
        file_url=src_path,
        event_timestamp_column="ts",
        field_mapping={"value": "vdup"},
    )
    registry.apply_feature_table(_table_v2(src2))
    materialize_versioned(spark, registry, "ut", store)

    compact_versioned(spark, registry, "ut", store)
    schemas = _load_schema_registry(store + "/default/ut")
    assert len(schemas) == 1
    (meta,) = schemas.values()
    assert meta["epoch_seq"] == 3  # 1,2 absorbed -> survivor stamps 3
    out = read_online_versioned(spark, registry, "ut", store)
    assert {r.user_id for r in out.collect()} == {1, 2}


def test_time_travel_as_of_seq(spark, registry, tmp_path):
    """as_of_seq=N serves the table exactly as it served right after
    epoch N was registered: only epochs seq<=N participate, conformed
    to epoch N's RECORDED schema — independent of the live registry
    (which here has already moved to v2, and is then replaced by a
    fresh restarted registry entirely)."""
    src_path = str(tmp_path / "events.parquet")
    store = str(tmp_path / "store")
    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 1, 10)
    _write_events(spark, src_path, [(1, t0, 1.5, "a"), (2, t0, 2.5, "b")])
    src1 = FileSource(file_url=src_path, event_timestamp_column="ts")
    registry.apply_feature_table(_table_v1(src1))
    materialize_versioned(spark, registry, "ut", store)

    _write_events(spark, src_path, [(2, t1, 9.5, "z"), (3, t1, 3.5, "c")])
    src2 = FileSource(
        file_url=src_path,
        event_timestamp_column="ts",
        field_mapping={"value": "vdup"},
    )
    registry.apply_feature_table(_table_v2(src2))
    materialize_versioned(spark, registry, "ut", store)

    # snapshot at seq=1: v1 schema (value double + tag), v1 rows only
    snap = read_online_versioned(
        spark, registry, "ut", store, as_of_seq=1
    )
    # recorded entries store features sorted by name (spec-hash
    # canonicalization), so the snapshot serves name-ordered columns
    assert snap.columns == ["user_id", "event_timestamp", "tag", "value"]
    rows = {r.user_id: r for r in snap.collect()}
    assert set(rows) == {1, 2}
    assert rows[2].value == 2.5 and rows[2].tag == "b"  # pre-v2 state
    assert dict(snap.dtypes)["value"] == "double"  # v1 type, not string

    # snapshot works without the original registry (restart-safe) —
    # the recorded entry, not the live spec, defines the schema
    fresh = fs.Registry()
    fresh.apply_entity(fs.Entity("user_id", fs.ValueType.INT64))
    snap2 = read_online_versioned(
        spark, fresh, "ut", store, as_of_seq=1
    )
    assert {r.user_id for r in snap2.collect()} == {1, 2}

    # as_of the latest seq == the current serve frame
    cur = read_online_versioned(spark, registry, "ut", store)
    asof2 = read_online_versioned(
        spark, registry, "ut", store, as_of_seq=2
    )
    assert sorted(map(tuple, cur.collect())) == sorted(
        map(tuple, asof2.collect())
    )

    # below the first epoch -> KeyError
    with pytest.raises(KeyError):
        read_online_versioned(spark, registry, "ut", store, as_of_seq=0)


def test_compact_versioned_restores_epoch_from_crash_trash(
    spark, registry, tmp_path
):
    """Hard-crash recovery (ADVICE r9): a crash between
    ``os.replace(epoch, trash)`` and ``os.replace(staging, epoch)``
    leaves ``rev=<hash>.compact_old`` holding the ONLY live copy while
    the registry still lists the epoch. The next compaction must
    RESTORE it before cleaning — not rmtree it — or the data survives
    only in an orphaned staging dir."""
    import os
    import shutil

    from feast_java_old_spark.operators.materialize import (
        compact_versioned,
        online_table_path,
    )

    src_path = str(tmp_path / "events.parquet")
    store = str(tmp_path / "store")
    _write_events(
        spark,
        src_path,
        [
            (1, dt.datetime(2024, 1, 1), 1.5, "a"),
            (2, dt.datetime(2024, 1, 1), 2.5, "b"),
        ],
    )
    src1 = FileSource(file_url=src_path, event_timestamp_column="ts")
    registry.apply_feature_table(_table_v1(src1))
    materialize_versioned(spark, registry, "ut", store)

    def snap():
        return sorted(
            map(
                tuple,
                read_online_versioned(spark, registry, "ut", store).collect(),
            )
        )

    before = snap()
    tpath = online_table_path(store, "default", "ut")
    (rev,) = [d for d in os.listdir(tpath) if d.startswith("rev=")]
    epoch = os.path.join(tpath, rev)
    # Simulate the crash window: epoch renamed to trash, staging lost.
    os.replace(epoch, epoch + ".compact_old")
    assert not os.path.isdir(epoch)

    compact_versioned(spark, registry, "ut", store)
    assert snap() == before
    assert not os.path.isdir(epoch + ".compact_old")

    # A trash dir NEXT TO a present epoch is stale and must be removed,
    # never restored over live data.
    (rev2,) = [d for d in os.listdir(tpath) if d.startswith("rev=")]
    epoch2 = os.path.join(tpath, rev2)
    shutil.copytree(epoch2, epoch2 + ".compact_old")
    compact_versioned(spark, registry, "ut", store)
    assert snap() == before
    assert not os.path.isdir(epoch2 + ".compact_old")


def test_read_online_table_explicit_delta_on_parquet_dir_raises(
    spark, tmp_path
):
    """ADVICE r9 ingest.py:76 — ``table_format='delta'`` on a populated
    NON-Delta dir must raise, not return None (None means
    never-materialized; silently serving all-NOT_FOUND for a real table
    breaks the docstring's contract)."""
    import pytest as _pytest

    from feast_java_old_spark.streaming.ingest import read_online_table

    p = str(tmp_path / "tbl")
    spark.range(3).write.parquet(p)
    with _pytest.raises(ValueError, match="non-Delta"):
        read_online_table(spark, p, table_format="delta")
    # Missing and empty dirs keep the never-materialized contract.
    assert read_online_table(
        spark, str(tmp_path / "missing"), table_format="delta"
    ) is None


def test_read_online_table_remote_uri_not_misclassified(spark, tmp_path):
    """Self-review r10: a REMOTE URI (s3://...) under explicit
    table_format='delta' must reach the Delta reader path (here: the
    delta-unavailable RuntimeError, since delta-spark isn't installed
    in this environment), never the local never-materialized/None or
    wrong-format/ValueError shortcuts — os.path probes can't see
    remote filesystems. Behavior-guarded (second self-review pass):
    with delta-spark installed the same call reaches
    ``DeltaTable.isDeltaTable``, which this sandbox can't exercise
    against a real remote store, so the test skips rather than assert
    an environment accident."""
    import pytest as _pytest

    from feast_java_old_spark.streaming.ingest import (
        delta_available,
        read_online_table,
    )

    if delta_available():
        _pytest.skip(
            "delta-spark installed: the remote path goes to "
            "DeltaTable.isDeltaTable, which needs a reachable store"
        )
    with _pytest.raises(RuntimeError, match="delta-spark is not installed"):
        read_online_table(
            spark, "s3://bucket/online/tbl", table_format="delta"
        )


def test_read_online_table_file_uri_treated_as_local(spark, tmp_path):
    """Second self-review pass r10: a ``file:`` URI is LOCAL — the
    scheme must be stripped before the os.path probes, or a live
    file:// table is misclassified as never-materialized (None) and
    serving silently degrades to all-NOT_FOUND."""
    import pytest as _pytest

    from feast_java_old_spark.streaming.ingest import read_online_table

    p = tmp_path / "tbl"
    spark.range(3).write.parquet(str(p))
    # plain-parquet read through a file: URI resolves the table
    out = read_online_table(spark, f"file://{p}")
    assert out is not None and out.count() == 3
    # explicit delta on a populated file:-URI non-Delta dir: the
    # wrong-format error, NOT the never-materialized None
    with _pytest.raises(ValueError, match="non-Delta"):
        read_online_table(spark, f"file://{p}", table_format="delta")
    # missing file: path keeps the never-materialized contract
    assert (
        read_online_table(spark, f"file://{tmp_path}/missing") is None
    )


def test_compact_versioned_never_resurrects_pruned_epoch(
    spark, registry, tmp_path
):
    """Self-review r10: a post-swap trash dir whose hash is NO LONGER in
    the schema registry (pruned after a crash left the trash behind)
    must be REMOVED at entry, never restored as a ghost epoch."""
    import os
    import shutil

    from feast_java_old_spark.operators.materialize import (
        _load_schema_registry as load_reg,
        compact_versioned,
        online_table_path,
    )

    src_path = str(tmp_path / "events.parquet")
    store = str(tmp_path / "store")
    _write_events(
        spark, src_path, [(1, dt.datetime(2024, 1, 1), 1.5, "a")]
    )
    src1 = FileSource(file_url=src_path, event_timestamp_column="ts")
    registry.apply_feature_table(_table_v1(src1))
    materialize_versioned(spark, registry, "ut", store)
    tpath = online_table_path(store, "default", "ut")
    (rev,) = [d for d in os.listdir(tpath) if d.startswith("rev=")]

    # Fabricate the ghost state: stale trash for a hash the registry
    # no longer lists.
    ghost = os.path.join(tpath, "rev=deadbeef.compact_old")
    shutil.copytree(os.path.join(tpath, rev), ghost)
    assert "deadbeef" not in load_reg(tpath)

    compact_versioned(spark, registry, "ut", store)
    assert not os.path.isdir(ghost)
    assert not os.path.isdir(os.path.join(tpath, "rev=deadbeef"))
    # exactly one epoch remains: the current spec's
    revs = [d for d in os.listdir(tpath) if d.startswith("rev=")]
    assert len(revs) == 1 and not revs[0].endswith(".compact_old")
