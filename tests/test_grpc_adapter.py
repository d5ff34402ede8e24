"""gRPC transport seam tests.

The adapter layer (method name + JSON-able dicts → controller →
status-coded failures) is fully testable without grpcio; the
``build_server`` half activates the moment the environment gains
grpcio (skip-marked loopback test at the bottom).

Parity pins: CoreServiceImpl.java RPC surface + status mapping,
ServingServiceGRpcController.java:81-95 ({fields, statuses} response —
the gRPC path does NOT flatten like REST), HealthServiceController
.check:41-59."""

import datetime as dt

import pytest
from pyspark.sql import types as T

from feast_java_old_spark.registry.core_service import CoreService
from feast_java_old_spark.registry.model import (
    Entity,
    Feature,
    FeatureTable,
    FileSource,
    ValueType,
)
from feast_java_old_spark.registry.registry import Registry
from feast_java_old_spark.transport.grpc_adapter import (
    HAVE_GRPC,
    CoreServiceServicer,
    GrpcCallError,
    HealthServicer,
    ServingServiceServicer,
    build_server,
)

TS = dt.datetime(2024, 1, 15, 12, 0, 0)


@pytest.fixture()
def core():
    reg = Registry()
    reg.apply_entity(Entity("driver", ValueType.INT64))
    src = FileSource(file_url="/tmp/x.parquet", event_timestamp_column="ts")
    reg.apply_feature_table(
        FeatureTable(
            "driver_stats",
            entities=["driver"],
            features=[Feature("rating", ValueType.DOUBLE)],
            batch_source=src,
        )
    )
    return CoreServiceServicer(CoreService(reg))


def test_core_reads_roundtrip(core):
    assert "version" in core.GetFeastCoreVersion({})
    assert core.GetEntity({"name": "driver"})["entity"]["name"] == "driver"
    assert [
        e["name"] for e in core.ListEntities({})["entities"]
    ] == ["driver"]
    assert [
        t["name"] for t in core.ListFeatureTables({})["tables"]
    ] == ["driver_stats"]
    feats = core.ListFeatures({"filter": {"entities": ["driver"]}})
    assert list(feats["features"]) == ["driver_stats:rating"]
    assert core.ListProjects({})["projects"] == ["default"]


def test_core_mutations_roundtrip(core):
    core.CreateProject({"name": "team_a"})
    assert "team_a" in core.ListProjects({})["projects"]
    out = core.ApplyEntity(
        {"spec": {"name": "zone", "value_type": "STRING"}, "project": "team_a"}
    )
    assert out["entity"]["name"] == "zone"
    core.ArchiveProject({"name": "team_a"})
    assert "team_a" not in core.ListProjects({})["projects"]


def test_core_status_codes_match_reference_mapping(core):
    """NOT_FOUND for unknown objects, INVALID_ARGUMENT for validation
    failures — the grpc_status_code vocabulary the audit trail uses."""
    with pytest.raises(GrpcCallError) as ei:
        core.GetFeatureTable({"name": "nope"})
    assert ei.value.code == "NOT_FOUND"
    with pytest.raises(GrpcCallError) as ei:
        core.ApplyEntity({"spec": {"name": "bad name!", "value_type": "INT64"}})
    assert ei.value.code == "INVALID_ARGUMENT"


def test_core_permission_denied_rides_metadata(core):
    """A subject-list provider denies an unlisted bearer identity —
    PERMISSION_DENIED, the metadata-borne Authentication reaching the
    controller's authorize step."""
    from feast_java_old_spark.registry.auth import (
        AuthorizationService,
        SubjectListAuthorizationProvider,
    )

    svc = CoreService(
        core.service.registry,
        auth=AuthorizationService(
            enabled=True,
            provider=SubjectListAuthorizationProvider(
                {"default": ["admin@example.com"]}
            ),
        ),
    )
    servicer = CoreServiceServicer(svc)
    import base64
    import json as _json

    def jwt_for(sub):
        payload = base64.urlsafe_b64encode(
            _json.dumps({"email": sub}).encode()
        ).rstrip(b"=")
        return b"h." + payload + b".s"

    md = [("authorization", "Bearer " + jwt_for("intruder@x.com").decode())]
    with pytest.raises(GrpcCallError) as ei:
        servicer.ApplyEntity(
            {"spec": {"name": "zone", "value_type": "STRING"}}, metadata=md
        )
    assert ei.value.code == "PERMISSION_DENIED"
    ok = [("authorization", "Bearer " + jwt_for("admin@example.com").decode())]
    out = servicer.ApplyEntity(
        {"spec": {"name": "zone", "value_type": "STRING"}}, metadata=ok
    )
    assert out["entity"]["name"] == "zone"


@pytest.fixture()
def serving(spark, tmp_path, tmp_store):
    from feast_java_old_spark.operators.materialize import materialize
    from feast_java_old_spark.plans.serving_rest import (
        ServingServiceRestController,
    )

    src = str(tmp_path / "src")
    schema = T.StructType(
        [
            T.StructField("driver", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("rating", T.DoubleType()),
        ]
    )
    spark.createDataFrame(
        [(1, TS - dt.timedelta(seconds=10), 4.5)], schema
    ).write.parquet(src)
    reg = Registry()
    reg.apply_entity(Entity("driver", ValueType.INT64))
    reg.apply_feature_table(
        FeatureTable(
            name="driver_stats",
            entities=["driver"],
            features=[Feature("rating", ValueType.DOUBLE)],
            max_age_secs=3600,
            batch_source=FileSource(file_url=src, event_timestamp_column="ts"),
        )
    )
    materialize(spark, reg, "driver_stats", tmp_store)
    ctl = ServingServiceRestController(spark, reg, tmp_store, request_ts=TS)
    return ServingServiceServicer(ctl)


def test_serving_grpc_keeps_fields_statuses_structure(serving):
    """The gRPC response is {fieldValues: [{fields, statuses}]} — NOT
    the REST-flattened maps (ResponseJSONMapper flattens only on the
    REST path)."""
    out = serving.GetOnlineFeaturesV2(
        {
            "features": ["driver_stats:rating"],
            "entityRows": [{"fields": {"driver": 1}}, {"fields": {"driver": 9}}],
        }
    )
    rows = out["fieldValues"]
    assert rows[0]["fields"]["driver_stats:rating"] == 4.5
    assert rows[0]["statuses"]["driver_stats:rating"] == "PRESENT"
    assert rows[1]["fields"]["driver_stats:rating"] is None
    assert rows[1]["statuses"]["driver_stats:rating"] == "NOT_FOUND"


def test_serving_validation_is_invalid_argument(serving):
    with pytest.raises(GrpcCallError) as ei:
        serving.GetOnlineFeaturesV2(
            {"features": [{"name": "rating"}], "entityRows": [{"fields": {}}]}
        )
    assert ei.value.code == "INVALID_ARGUMENT"
    assert "FeatureTable name must be provided" in ei.value.details


def test_health_servicer(serving):
    h = HealthServicer(serving.controller.registry)
    assert h.Check({}) == {"status": "SERVING"}

    class Broken:
        def list_projects(self):
            raise RuntimeError("down")

    assert HealthServicer(Broken()).Check({}) == {"status": "NOT_SERVING"}


def test_build_server_without_grpcio_raises_clear_error(core):
    if HAVE_GRPC:
        pytest.skip("grpcio present — the real-server test covers this")
    with pytest.raises(ImportError, match="grpcio is not installed"):
        build_server([core])


def test_real_grpc_loopback(core):
    """Activates when the environment gains grpcio: a real channel →
    generic JSON-codec handlers → controller → status codes."""
    if not HAVE_GRPC:
        pytest.skip("grpcio not installed in this environment")
    import json

    import grpc

    server, port = build_server([core])
    server.start()
    try:
        channel = grpc.insecure_channel(f"127.0.0.1:{port}")
        call = channel.unary_unary(
            "/feast.core.CoreService/GetFeastCoreVersion",
            request_serializer=lambda d: json.dumps(d).encode(),
            response_deserializer=lambda b: json.loads(b),
        )
        assert "version" in call({})
        missing = channel.unary_unary(
            "/feast.core.CoreService/GetFeatureTable",
            request_serializer=lambda d: json.dumps(d).encode(),
            response_deserializer=lambda b: json.loads(b),
        )
        with pytest.raises(grpc.RpcError) as ei:
            missing({"name": "nope"})
        assert ei.value.code() == grpc.StatusCode.NOT_FOUND
    finally:
        server.stop(0)


def test_serving_grpc_authorizes_explicit_project(serving):
    """ServingServiceGRpcController:86-91 — the gRPC serving path
    authorizes when the request names a project explicitly (a
    defaulted/empty project skips the check); the REST path never
    authorizes. Denial is PERMISSION_DENIED."""
    import base64
    import json as _json

    from feast_java_old_spark.registry.auth import (
        AuthorizationService,
        SubjectListAuthorizationProvider,
    )
    from feast_java_old_spark.transport.grpc_adapter import (
        ServingServiceServicer,
    )

    servicer = ServingServiceServicer(
        serving.controller,
        auth=AuthorizationService(
            enabled=True,
            provider=SubjectListAuthorizationProvider(
                {"default": ["admin@example.com"]}
            ),
        ),
    )

    def md(sub):
        payload = base64.urlsafe_b64encode(
            _json.dumps({"email": sub}).encode()
        ).rstrip(b"=")
        return [("authorization", "Bearer h." + payload.decode() + ".s")]

    req = {
        "features": ["driver_stats:rating"],
        "entityRows": [{"fields": {"driver": 1}}],
        "project": "default",
    }
    with pytest.raises(GrpcCallError) as ei:
        servicer.GetOnlineFeaturesV2(req, metadata=md("intruder@x.com"))
    assert ei.value.code == "PERMISSION_DENIED"
    out = servicer.GetOnlineFeaturesV2(req, metadata=md("admin@example.com"))
    assert out["fieldValues"][0]["fields"]["driver_stats:rating"] == 4.5
    # no explicit project -> no authorization (reference parity)
    anon = dict(req)
    anon.pop("project")
    out = servicer.GetOnlineFeaturesV2(anon, metadata=None)
    assert out["fieldValues"][0]["statuses"]["driver_stats:rating"] == "PRESENT"


def test_apply_feature_table_full_spec_roundtrip(core):
    """A full spec dict (nested batch+stream sources, labels, max_age)
    survives ApplyFeatureTable -> GetFeatureTable through the adapter's
    to_dict/from_dict wire shapes byte-for-byte."""
    from feast_java_old_spark.registry.model import KafkaSource

    spec = FeatureTable(
        name="rich",
        entities=["driver"],
        features=[Feature("r", ValueType.DOUBLE, labels={"a": "b"})],
        max_age_secs=3600,
        labels={"team": "x"},
        batch_source=FileSource(
            file_url="/tmp/x.parquet",
            event_timestamp_column="ts",
            field_mapping={"a": "b"},
            date_partition_column="d",
        ),
        stream_source=KafkaSource(
            bootstrap_servers="b:9092", topic="t", event_timestamp_column="ts"
        ),
    ).to_dict()
    applied = core.ApplyFeatureTable({"spec": spec})["table"]
    fetched = core.GetFeatureTable({"name": "rich"})["table"]
    for key in ("entities", "features", "labels", "max_age_secs",
                "batch_source", "stream_source"):
        assert applied[key] == spec[key], key
        assert fetched[key] == spec[key], key


# ---- r13: randomized gRPC-adapter ≡ native-serve equivalence (the
# REST property of r12, mirrored onto the servicer surface — catches
# JSON-codec drift the golden tests can't).


def test_grpc_rows_equal_native_serve_pointwise(serving):
    """Hypothesis sweep over randomized entity-row batches — mixed
    present/missing/NULL keys × absent/Z/offset/stale timestamps ×
    wrapper/native values — through ``ServingServiceServicer.
    GetOnlineFeaturesV2`` dicts: the {fields, statuses} response
    (ServingServiceGRpcController.java:81-95 structure) must agree
    POINTWISE with ``serve_online_features`` fed the equivalent native
    rows, on values AND statuses."""
    import datetime as _dt

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from feast_java_old_spark.plans.online_plan import serve_online_features
    from feast_java_old_spark.plans.serving_json import response_rows

    REF = "driver_stats:rating"
    FRESH = TS - _dt.timedelta(seconds=5)
    STALE = TS - _dt.timedelta(seconds=7200)  # beyond max_age 3600

    key_strategy = st.sampled_from([1, 9, None])
    wrap_strategy = st.booleans()
    ts_strategy = st.sampled_from(["absent", "z", "offset", "stale"])

    def iso(ts, mode):
        aware = ts.replace(tzinfo=_dt.timezone.utc)
        if mode == "z":
            return aware.isoformat().replace("+00:00", "Z")
        off = _dt.timezone(_dt.timedelta(hours=5))
        return aware.astimezone(off).isoformat()

    @given(
        st.lists(
            st.tuples(key_strategy, wrap_strategy, ts_strategy),
            min_size=1,
            max_size=4,
        )
    )
    @settings(max_examples=10, deadline=None)
    def check(batch):
        grpc_rows = []
        native_rows = []
        for key, wrap, ts_mode in batch:
            value = {"int64Val": key} if wrap and key is not None else key
            er = {"fields": {"driver": value}}
            native = {"driver": key}
            if ts_mode != "absent":
                ts = STALE if ts_mode == "stale" else FRESH
                er["timestamp"] = iso(ts, ts_mode)
                native["event_timestamp"] = ts
            grpc_rows.append(er)
            native_rows.append(native)

        out = serving.GetOnlineFeaturesV2(
            {"features": [REF], "entityRows": grpc_rows}
        )
        ctl = serving.controller
        oracle = response_rows(
            serve_online_features(
                ctl.spark,
                ctl.registry,
                native_rows,
                [REF],
                ctl.store_path,
                request_ts=TS,
            ),
            [REF],
        )
        rows = out["fieldValues"]
        assert len(rows) == len(oracle) == len(batch)
        for grow, orow in zip(rows, oracle):
            # gRPC keeps {fields, statuses} — compare both maps whole.
            assert grow["fields"]["driver"] == orow["fields"]["driver"]
            assert grow["fields"][REF] == orow["fields"][REF]
            assert grow["statuses"][REF] == orow["statuses"][REF]
            assert (grow["fields"][REF] is None) == (
                grow["statuses"][REF] != "PRESENT"
            )

    check()
