"""Audit-logging parity tests.

Golden shapes mirror the reference's
``common/src/test/java/feast/common/logging/entry/AuditLogEntryTest.java``:
the three entry kinds built exactly as ``getTestAuditLogs`` builds them
(a getOnlineFeatures MESSAGE, a CREATE ACTION on a JOB, a READY
TRANSITION on a FEATURE_TABLE), then the JSON-representation assertions
(``shouldReturnJSONRepresentationOfAuditLog``: valid JSON, ``logType``
== "FeastAuditLogEntry", ``kind`` == the entry's kind).
"""

import datetime as dt
import json
import os

import pytest

import feast_java_old_spark as fs
from feast_java_old_spark.registry.audit import (
    APPLICATION,
    LOG_TYPE,
    AuditLogEntryKind,
    AuditLogger,
    ResourceType,
    read_audit_log,
)
from feast_java_old_spark.registry.model import FileSource
from feast_java_old_spark.registry.registry import Registry


def _counter_clock():
    it = iter(range(10_000))
    return lambda: next(it)


def _mem_logger(**kw):
    return AuditLogger(
        clock=_counter_clock(), id_factory=lambda: "fixed-id", **kw
    )


def _test_entries(log: AuditLogger):
    """The reference test's three golden entries
    (``AuditLogEntryTest.getTestAuditLogs``)."""
    m = log.log_message(
        service="ServingService",
        method="getOnlineFeatures",
        request={"features": "featuretable_1:feature1,featuretable_1:feature2"},
        response={"featuretable_1:feature_1": 32, "featuretable_1:feature2": 64},
        identity="adam@no.such.email",
        status_code="OK",
    )
    a = log.log_action("CREATE", ResourceType.JOB, "kafka-to-redis")
    t = log.log_transition("READY", ResourceType.FEATURE_TABLE, "featuretable_1")
    return m, a, t


def test_entry_json_shapes():
    log = _mem_logger()
    entries = _test_entries(log)
    kinds = [
        AuditLogEntryKind.MESSAGE,
        AuditLogEntryKind.ACTION,
        AuditLogEntryKind.TRANSITION,
    ]
    for entry, kind in zip(entries, kinds):
        # valid JSON round-trip with the reference's filter fields
        obj = json.loads(json.dumps(entry))
        assert obj["logType"] == LOG_TYPE
        assert obj["application"] == APPLICATION
        assert obj["kind"] == kind
        assert obj["component"] and obj["version"]
    m, a, t = entries
    # MessageAuditLogEntry fields (MessageAuditLogEntry.java builder set)
    assert m["id"] and m["service"] == "ServingService"
    assert m["method"] == "getOnlineFeatures"
    assert m["statusCode"] == "OK" and m["level"] == "INFO"
    assert m["identity"] == "adam@no.such.email"
    assert m["request"]["features"].startswith("featuretable_1:")
    assert m["response"]["featuretable_1:feature_1"] == "32"  # stringified
    # ActionAuditLogEntry: action + LogResource{type,id}
    assert a["action"] == "CREATE"
    assert a["resource"] == {"type": "JOB", "id": "kafka-to-redis"}
    # TransitionAuditLogEntry: status + resource
    assert t["status"] == "READY"
    assert t["resource"] == {"type": "FEATURE_TABLE", "id": "featuretable_1"}


def test_disabled_logger_emits_nothing(tmp_path):
    path = str(tmp_path / "audit.jsonl")
    log = AuditLogger(path=path, enabled=False)
    assert log.log_action("CREATE", ResourceType.JOB, "x") is None
    assert log.entries == [] and not os.path.exists(path)


def test_failed_call_logs_error_level():
    log = _mem_logger()
    log.log_message(
        service="ServingService",
        method="getOnlineFeatures",
        status_code="INVALID_ARGUMENT",
    )
    # GrpcMessageInterceptor.close: non-OK status → ERROR level
    assert log.entries[-1]["level"] == "ERROR"


def test_registry_mutations_emit_action_trail():
    log = _mem_logger()
    reg = Registry(audit=log)
    reg.apply_entity(fs.Entity("user_id", fs.ValueType.INT64))
    reg.apply_entity(fs.Entity("user_id", fs.ValueType.INT64))  # re-apply
    ft = fs.FeatureTable(
        name="t1",
        entities=["user_id"],
        features=[fs.Feature("v", fs.ValueType.DOUBLE)],
        batch_source=FileSource(file_url="/dev/null", event_timestamp_column="ts"),
    )
    reg.apply_feature_table(ft)
    reg.apply_feature_table(ft)  # equal spec hash → NO entry
    ft2 = fs.FeatureTable(
        name="t1",
        entities=["user_id"],
        features=[
            fs.Feature("v", fs.ValueType.DOUBLE),
            fs.Feature("w", fs.ValueType.INT64),
        ],
        batch_source=FileSource(file_url="/dev/null", event_timestamp_column="ts"),
    )
    reg.apply_feature_table(ft2)
    reg.delete_feature_table("t1")
    reg.create_project("p2")
    reg.archive_project("p2")
    got = [
        (e["action"], e["resource"]["type"], e["resource"]["id"])
        for e in log.entries
    ]
    assert got == [
        ("CREATE", "ENTITY", "default/user_id"),
        ("UPDATE", "ENTITY", "default/user_id"),
        ("CREATE", "FEATURE_TABLE", "default/t1"),
        ("UPDATE", "FEATURE_TABLE", "default/t1"),
        ("DELETE", "FEATURE_TABLE", "default/t1"),
        ("CREATE", "PROJECT", "p2"),
        ("ARCHIVE", "PROJECT", "p2"),
    ]
    # timestamps monotone under the injected clock
    ts = [e["timestamp"] for e in log.entries]
    assert ts == sorted(ts)


def _events_env(reg, sf_dir, max_age=7 * 86400):
    reg.apply_entity(fs.Entity("user_id", fs.ValueType.INT64))
    reg.apply_feature_table(
        fs.FeatureTable(
            name="user_events",
            entities=["user_id"],
            features=[fs.Feature("value", fs.ValueType.DOUBLE)],
            max_age_secs=max_age,
            batch_source=FileSource(
                file_url=f"{sf_dir}/events.parquet",
                event_timestamp_column="ts",
            ),
        )
    )


def test_materialize_transitions_and_serving_message(spark, sf_dir, tmp_store):
    from feast_java_old_spark.operators import materialize
    from feast_java_old_spark.plans.serving_json import serve_logged

    log = _mem_logger()
    reg = Registry(audit=log)
    _events_env(reg, sf_dir)
    n0 = len(log.entries)
    materialize(spark, reg, "user_events", tmp_store)
    trans = [e for e in log.entries[n0:] if e["kind"] == "TRANSITION"]
    assert [(e["status"], e["resource"]["id"]) for e in trans] == [
        ("RUNNING", "materialize:default/user_events"),
        ("READY", "materialize:default/user_events"),
    ]

    rows = serve_logged(
        spark,
        reg,
        [{"user_id": 1}, {"user_id": 999_999}],
        ["user_events:value"],
        store_path=tmp_store,
        request_ts=dt.datetime(2024, 1, 31),
    )
    assert len(rows) == 2
    msg = [e for e in log.entries if e["kind"] == "MESSAGE"][-1]
    assert msg["service"] == "ServingService"
    assert msg["method"] == "getOnlineFeatures"
    assert msg["statusCode"] == "OK"
    assert msg["request"]["entity_rows"] == "2"
    # data-dependent response summary: 1 PRESENT + 1 NOT_FOUND feature field
    assert msg["response"] == {"rows": "2", "PRESENT": "1", "NOT_FOUND": "1"}


def test_materialize_error_transition(spark, tmp_store):
    from feast_java_old_spark.operators import materialize

    log = _mem_logger()
    reg = Registry(audit=log)
    reg.apply_entity(fs.Entity("user_id", fs.ValueType.INT64))
    reg.apply_feature_table(
        fs.FeatureTable(
            name="broken",
            entities=["user_id"],
            features=[fs.Feature("v", fs.ValueType.DOUBLE)],
            batch_source=FileSource(
                file_url="/nonexistent/nope.parquet",
                event_timestamp_column="ts",
            ),
        )
    )
    with pytest.raises(Exception):
        materialize(spark, reg, "broken", tmp_store)
    last = log.entries[-1]
    assert last["kind"] == "TRANSITION" and last["status"] == "ERROR"
    assert last["level"] == "ERROR"


def test_serving_error_status_codes(spark, sf_dir, tmp_store):
    """Failure MESSAGE entries carry the mapped gRPC code: malformed
    request → INVALID_ARGUMENT, unknown registry object → NOT_FOUND;
    both at ERROR level."""
    from feast_java_old_spark.plans.serving_json import serve_logged

    log = _mem_logger()
    reg = Registry(audit=log)
    _events_env(reg, sf_dir)
    with pytest.raises(ValueError):
        serve_logged(
            spark, reg, [{"user_id": 1}], ["not_a_ref"], store_path=tmp_store
        )
    msg = [e for e in log.entries if e["kind"] == "MESSAGE"][-1]
    assert msg["statusCode"] == "INVALID_ARGUMENT"
    assert msg["level"] == "ERROR"
    with pytest.raises(KeyError):
        serve_logged(
            spark, reg, [{"user_id": 1}], ["no:such;ref!"], store_path=tmp_store
        )
    msg = [e for e in log.entries if e["kind"] == "MESSAGE"][-1]
    assert msg["statusCode"] == "NOT_FOUND"
    assert msg["level"] == "ERROR"


def test_jsonl_roundtrip_via_spark(spark, tmp_path):
    path = str(tmp_path / "audit.jsonl")
    log = AuditLogger(path=path, clock=_counter_clock(), id_factory=lambda: "id0")
    _test_entries(log)
    df = read_audit_log(spark, path)
    got = {r["kind"]: r for r in df.collect()}
    assert set(got) == {"MESSAGE", "ACTION", "TRANSITION"}
    assert got["ACTION"]["action"] == "CREATE"
    assert got["ACTION"]["resource"]["type"] == "JOB"
    assert got["TRANSITION"]["status"] == "READY"
    assert got["MESSAGE"]["statusCode"] == "OK"
    assert got["MESSAGE"]["response"]["featuretable_1:feature2"] == "64"
    # kind-specific fields are NULL on other kinds (one flat relation)
    assert got["ACTION"]["service"] is None
    assert got["MESSAGE"]["action"] is None


def test_auto_created_project_audited_after_successful_apply():
    """apply_entity into a new project logs CREATE PROJECT (after the
    save) then CREATE ENTITY; a FAILED apply into a new project logs
    NOTHING (an entry written before validation would durably record a
    creation that was never persisted)."""
    log = _mem_logger()
    reg = Registry(audit=log)
    reg.apply_entity(fs.Entity("k", fs.ValueType.INT64), project="p_new")
    got = [
        (e["action"], e["resource"]["type"], e["resource"]["id"])
        for e in log.entries
    ]
    assert got == [
        ("CREATE", "PROJECT", "p_new"),
        ("CREATE", "ENTITY", "p_new/k"),
    ]
    # failed apply (invalid entity name) into another fresh project
    n0 = len(log.entries)
    with pytest.raises(Exception):
        reg.apply_entity(
            fs.Entity("9bad name!", fs.ValueType.INT64),
            project="p_doomed",
        )
    assert len(log.entries) == n0  # no partial trail
