"""Client SDK tests — the ``sdk/java`` test suite re-expressed over a
REAL localhost socket.

Mirrors ``FeastClientTest.java`` (mock serving service asserting the
exact request; auth interceptor observing the Authorization header —
:49-197) and ``RequestUtilTest.java`` (valid/invalid ref parse matrix),
plus ``Row.java`` unit pins and a true end-to-end scenario against the
engine's serving controller through the gRPC-over-HTTP binding.
"""

import datetime as dt
import json

import pytest
from pyspark.sql import types as T

import feast_java_old_spark as fs
from feast_java_old_spark.operators.materialize import materialize
from feast_java_old_spark.registry.credentials import JwtCallCredentials
from feast_java_old_spark.registry.model import FileSource
from feast_java_old_spark.sdk import (
    NOT_FOUND,
    NULL_VALUE,
    PRESENT,
    FeastClient,
    HttpJsonChannel,
    Row,
    SecurityConfig,
    create_feature_refs,
    parse_feature_ref,
)
from feast_java_old_spark.transport.grpc_adapter import (
    SERVING_SERVICE,
    GrpcCallError,
)
from feast_java_old_spark.transport.grpc_http import GrpcHttpServer

AUTH_TOKEN = "test token"
TS = dt.datetime(2024, 1, 15, 12, 0, 0)


# ------------------------------------------------- the mock serving service
# (FeastClientTest.java:55-71 — a delegating mock that rejects any
# request not equal to getFakeRequest and answers getFakeResponse)


def fake_request():
    # FeastClientTest.getFakeRequest:157-172, with the SDK's JSON value
    # mapping (Python int → int64Val; the Java test pins int32Val).
    return {
        "features": [
            {"featureTable": "driver", "name": "name"},
            {"featureTable": "driver", "name": "rating"},
            {"featureTable": "driver", "name": "null_value"},
        ],
        "entityRows": [
            {
                "fields": {"driver_id": {"int64Val": 1}},
                "timestamp": "1970-01-01T00:01:40",
            }
        ],
        "project": "driver_project",
    }


def fake_response():
    # FeastClientTest.getFakeResponse:174-188 (native JSON values — the
    # transport's documented codec divergence).
    return {
        "fieldValues": [
            {
                "fields": {
                    "driver_id": 1,
                    "driver:name": "david",
                    "driver:rating": 3,
                    "driver:null_value": None,
                },
                "statuses": {
                    "driver_id": PRESENT,
                    "driver:name": PRESENT,
                    "driver:rating": PRESENT,
                    "driver:null_value": NULL_VALUE,
                },
            }
        ]
    }


class MockServingService:
    service_name = SERVING_SERVICE

    def GetOnlineFeaturesV2(self, request, metadata=None):
        if request != fake_request():
            raise GrpcCallError(
                "FAILED_PRECONDITION",
                f"unexpected request: {json.dumps(request, sort_keys=True)}",
            )
        return fake_response()


@pytest.fixture()
def mock_server():
    observed = {"authenticated": False, "authorization": None}

    def interceptor(method_path, metadata):
        # FeastClientTest.mockAuthInterceptor:75-87 — flag calls that
        # carry an Authorization key.
        for k, v in metadata:
            if k == "authorization":
                observed["authenticated"] = True
                observed["authorization"] = v
        return None

    with GrpcHttpServer(
        [MockServingService()], interceptor=interceptor
    ) as srv:
        yield srv, observed


def _request_rows():
    return [
        Row.create()
        .set("driver_id", 1)
        .set_entity_timestamp(dt.datetime(1970, 1, 1, 0, 1, 40))
    ]


def _assert_fake_rows(rows):
    # FeastClientTest.shouldGetOnlineFeaturesWithClient:127-155
    assert len(rows) == 1
    assert rows[0].get_fields() == {
        "driver_id": {"int64Val": 1},
        "driver:name": {"stringVal": "david"},
        "driver:rating": {"int64Val": 3},
        "driver:null_value": {},
    }
    assert rows[0].get_statuses() == {
        "driver_id": PRESENT,
        "driver:name": PRESENT,
        "driver:rating": PRESENT,
        "driver:null_value": NULL_VALUE,
    }
    assert rows[0].get_string("driver:name") == "david"
    assert rows[0].get_long("driver:rating") == 3
    assert rows[0].get_long("driver:null_value") is None


def test_should_get_online_features(mock_server):
    srv, observed = mock_server
    client = FeastClient.create(srv.host, srv.port)
    rows = client.get_online_features(
        ["driver:name", "driver:rating", "driver:null_value"],
        _request_rows(),
        "driver_project",
    )
    _assert_fake_rows(rows)
    assert observed["authenticated"] is False
    client.close()


def test_should_authenticate_and_get_online_features(mock_server):
    srv, observed = mock_server
    client = FeastClient.create_secure(
        srv.host,
        srv.port,
        SecurityConfig(credentials=JwtCallCredentials(AUTH_TOKEN)),
    )
    rows = client.get_online_features(
        ["driver:name", "driver:rating", "driver:null_value"],
        _request_rows(),
        "driver_project",
    )
    _assert_fake_rows(rows)
    # server-side observation, like the reference's interceptor flag
    assert observed["authenticated"] is True
    assert observed["authorization"] == f"Bearer {AUTH_TOKEN}"
    client.close()


def test_wrong_request_surfaces_failed_precondition(mock_server):
    srv, _ = mock_server
    with FeastClient.create(srv.host, srv.port) as client:
        with pytest.raises(GrpcCallError) as ei:
            client.get_online_features(
                ["driver:name"],
                [Row.create().set("driver_id", 2)],
                "driver_project",
            )
    assert ei.value.code == "FAILED_PRECONDITION"


def test_channel_keep_alive_reuses_one_connection(mock_server):
    """Two calls share the ManagedChannel-analog's persistent socket."""
    srv, _ = mock_server
    client = FeastClient.create(srv.host, srv.port)
    for _ in range(2):
        rows = client.get_online_features(
            ["driver:name", "driver:rating", "driver:null_value"],
            _request_rows(),
            "driver_project",
        )
        _assert_fake_rows(rows)
    assert isinstance(client._channel, HttpJsonChannel)
    assert client._channel._conn is not None  # still open, reused
    client.close()
    assert client._channel._conn is None


# ------------------------------------------------------------ RequestUtil


def test_create_feature_refs_valid():
    # RequestUtilTest.provideValidFeatureRefs
    assert create_feature_refs(["driver:driver_id"]) == [
        {"featureTable": "driver", "name": "driver_id"}
    ]


@pytest.mark.parametrize(
    "ref,msg",
    [
        ("project/feature", "not longer supported"),
        ("feature", "should be provided in string Feature References"),
        ("", "Cannot parse a empty feature reference"),
        ("   ", "Cannot parse a empty feature reference"),
        ("table:", "should be provided in string Feature References"),
    ],
)
def test_create_feature_refs_invalid(ref, msg):
    with pytest.raises(ValueError, match=msg):
        create_feature_refs([ref])


def test_create_feature_refs_null():
    with pytest.raises(ValueError, match="FeatureReferences cannot be null"):
        create_feature_refs(None)


def test_parse_feature_ref_extra_segments_quirk():
    """Java split(":") + parts[0]/parts[1]: extra segments silently
    dropped; an empty MIDDLE segment builds an empty feature name the
    server rejects (Java split drops only TRAILING empties, so "t::f"
    yields parts[1] == "") — both quirks mirrored
    (RequestUtil.java:71-76)."""
    assert parse_feature_ref("t:f:extra") == {
        "featureTable": "t",
        "name": "f",
    }
    assert parse_feature_ref("t::f") == {"featureTable": "t", "name": ""}
    # trailing empties dropped like Java: "t:f:" parses clean
    assert parse_feature_ref("t:f:") == {"featureTable": "t", "name": "f"}


# -------------------------------------------------------------------- Row


def test_row_type_switch_and_getters():
    row = Row.create()
    row.set("i", 7).set("d", 2.5).set("s", "x").set("b", b"\x01\x02")
    row.set("v32", {"int32Val": 9})  # Value passthrough (:86-87)
    row.set("unset", None, NULL_VALUE)
    assert row.get_fields()["i"] == {"int64Val": 7}
    assert row.get_long("i") == 7
    assert row.get_double("d") == 2.5
    assert row.get_string("s") == "x"
    assert row.get_bytes("b") == b"\x01\x02"
    assert row.get_int("v32") == 9
    # same-FAMILY arms widen (JSON has one integer type): get_int on an
    # int64-set Value reads the sibling; cross-FAMILY reads keep the
    # proto-default semantics (getStringVal on an int Value → "")
    assert row.get_int("i") == 7
    assert row.get_string("i") == ""
    assert row.get_long("v32") == 9  # int32 sibling read
    # unset → None from every getter
    assert row.get_long("unset") is None
    assert row.get_status("unset") == NULL_VALUE
    assert row.get_status("i") == PRESENT


def test_row_unsupported_type_message():
    with pytest.raises(ValueError, match="unsupported in Feast"):
        Row.create().set("x", [1, 2])
    with pytest.raises(ValueError, match="unsupported in Feast"):
        Row.create().set("x", True)  # no Boolean case in Row.java:64-94


def test_row_missing_field_raises():
    with pytest.raises(ValueError, match="Row does not contain field 'nope'"):
        Row.create().get_long("nope")


def test_row_str_renders_null():
    row = Row.create().set("a", 1).set("n", None, NULL_VALUE)
    s = str(row)
    assert "n:NULL" in s and "a:" in s


def test_row_entity_timestamp_overloads():
    row = Row.create()
    assert row.get_entity_timestamp() is not None  # stamped "now" (:40)
    row.set_entity_timestamp("2024-01-15T12:00:00Z")
    assert row.get_entity_timestamp() == dt.datetime(2024, 1, 15, 12, 0, 0)
    row.set_entity_timestamp(dt.datetime(2020, 5, 1))
    assert row.get_entity_timestamp() == dt.datetime(2020, 5, 1)
    with pytest.raises(TypeError):
        row.set_entity_timestamp(12345)


# ---------------------------------------------------------- SecurityConfig


def test_security_config_defaults():
    cfg = SecurityConfig()
    assert cfg.credentials is None
    assert cfg.tls_enabled is False
    assert cfg.certificate_path is None


def test_invalid_certificate_path_message():
    # FeastClient.createSecure:89-92
    with pytest.raises(ValueError, match="Invalid Certificate provided at path"):
        FeastClient.create_secure(
            "localhost",
            1,
            SecurityConfig(
                tls_enabled=True, certificate_path="/nonexistent/cert.pem"
            ),
        )


# ------------------------------------------- end-to-end against the engine


@pytest.fixture()
def engine_server(spark, tmp_path, tmp_store):
    """The real topology the SDK targets: serving controller over a
    materialized store, bound as the ServingService servicer on a
    localhost socket."""
    from feast_java_old_spark.plans.serving_rest import (
        ServingServiceRestController,
    )
    from feast_java_old_spark.transport.grpc_adapter import (
        ServingServiceServicer,
    )

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [
            (1, TS - dt.timedelta(seconds=10), 4.5, "david"),
            (2, TS - dt.timedelta(seconds=10), None, "ana"),
        ],
        T.StructType(
            [
                T.StructField("driver", T.LongType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("rating", T.DoubleType()),
                T.StructField("name", T.StringType()),
            ]
        ),
    ).write.parquet(src)
    reg = fs.Registry()
    reg.apply_entity(fs.Entity("driver", fs.ValueType.INT64))
    reg.apply_feature_table(
        fs.FeatureTable(
            name="driver_stats",
            entities=["driver"],
            features=[
                fs.Feature("rating", fs.ValueType.DOUBLE),
                fs.Feature("name", fs.ValueType.STRING),
            ],
            max_age_secs=3600,
            batch_source=FileSource(file_url=src, event_timestamp_column="ts"),
        )
    )
    materialize(spark, reg, "driver_stats", tmp_store)
    ctl = ServingServiceRestController(
        spark, reg, tmp_store, full_feature_names=True
    )
    with GrpcHttpServer([ServingServiceServicer(ctl)]) as srv:
        yield srv


def test_sdk_end_to_end_statuses(engine_server):
    """connect → getOnlineFeatures → Rows with PRESENT / NULL_VALUE /
    NOT_FOUND statuses, driven by per-row entity timestamps."""
    with FeastClient.create(engine_server.host, engine_server.port) as client:
        rows = client.get_online_features(
            ["driver_stats:rating", "driver_stats:name"],
            [
                Row.create().set("driver", 1).set_entity_timestamp(TS),
                Row.create().set("driver", 2).set_entity_timestamp(TS),
                Row.create().set("driver", 99).set_entity_timestamp(TS),
            ],
        )
    assert len(rows) == 3
    r1, r2, r9 = rows
    assert r1.get_double("driver_stats:rating") == 4.5
    assert r1.get_string("driver_stats:name") == "david"
    assert r1.get_status("driver_stats:rating") == PRESENT
    assert r2.get_double("driver_stats:rating") is None
    assert r2.get_status("driver_stats:rating") == NULL_VALUE
    assert r2.get_string("driver_stats:name") == "ana"
    assert r9.get_status("driver_stats:rating") == NOT_FOUND
    assert r9.get_long("driver") == 99  # entity echoed, PRESENT
    assert r9.get_status("driver") == PRESENT


def test_sdk_serving_info(engine_server):
    with FeastClient.create(engine_server.host, engine_server.port) as client:
        info = client.get_feast_serving_info()
    assert info["version"] == fs.__version__


def test_sdk_outside_max_age(engine_server):
    """A request timestamp a day after the store rows, with
    max_age=3600: every feature is OUTSIDE_MAX_AGE and unset."""
    with FeastClient.create(engine_server.host, engine_server.port) as client:
        rows = client.get_online_features(
            ["driver_stats:rating"],
            [
                Row.create()
                .set("driver", 1)
                .set_entity_timestamp(TS + dt.timedelta(days=1))
            ],
        )
    assert rows[0].get_status("driver_stats:rating") == "OUTSIDE_MAX_AGE"
    assert rows[0].get_double("driver_stats:rating") is None


def test_sdk_invalid_ref_rejected_client_side(engine_server):
    """RequestUtil validation happens in the client BEFORE any network
    call — the reference's createFeatureRefs runs first (:153)."""
    with FeastClient.create(engine_server.host, engine_server.port) as client:
        with pytest.raises(ValueError, match="not longer supported"):
            client.get_online_features(
                ["proj/driver:rating"], [Row.create().set("driver", 1)]
            )


def test_full_grpc_surface_topology(spark, tmp_path):
    """run_servers with both gRPC ports: the reference's primary-port
    deployment (core 6565 / serving 6566) — FeastClient speaks to the
    serving gRPC socket, the raw channel drives core RPCs and the
    health probe, all four sockets live at once."""
    from feast_java_old_spark.registry.registry import Registry
    from feast_java_old_spark.transport.app import run_servers
    from feast_java_old_spark.transport.grpc_adapter import (
        CORE_SERVICE,
        HEALTH_SERVICE,
    )

    reg = Registry(path=str(tmp_path / "registry_g.json"))
    reg.apply_entity(fs.Entity("driver", fs.ValueType.INT64))
    servers = run_servers(
        spark, reg, core_grpc_port=0, serving_grpc_port=0
    )
    assert len(servers) == 4
    core_rest, serving_rest, core_grpc, serving_grpc = servers
    try:
        chan = HttpJsonChannel(core_grpc.host, core_grpc.port)
        version = chan.unary(CORE_SERVICE, "GetFeastCoreVersion", {})
        assert version["version"] == fs.__version__
        entities = chan.unary(
            CORE_SERVICE, "ListEntities", {"filter": {"project": "default"}}
        )
        assert [
            e["name"] for e in entities.get("entities", [])
        ] == ["driver"]
        # unknown entity → NOT_FOUND over the socket, same code the
        # audit trail records
        with pytest.raises(GrpcCallError) as ei:
            chan.unary(CORE_SERVICE, "GetEntity", {"name": "nope"})
        assert ei.value.code == "NOT_FOUND"
        chan.close()

        schan = HttpJsonChannel(serving_grpc.host, serving_grpc.port)
        health = schan.unary(HEALTH_SERVICE, "Check", {})
        assert health["status"] == "SERVING"
        schan.close()

        with FeastClient.create(
            serving_grpc.host, serving_grpc.port
        ) as client:
            info = client.get_feast_serving_info()
            assert info["version"] == fs.__version__
    finally:
        for srv in servers:
            srv.stop()


def test_row_value_round_trip_property():
    """Hypothesis: any supported scalar survives Row.set → typed getter
    unchanged, the wrapper arm matches the Java type switch, and
    str(row) never raises; unsupported types always raise the
    reference's message."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    scalar = st.one_of(
        st.integers(-(2**62), 2**62),
        st.floats(allow_nan=False, allow_infinity=True),
        st.text(max_size=40),
        st.binary(max_size=40),
        st.none(),
    )

    @settings(max_examples=200, deadline=None)
    @given(st.dictionaries(st.text(min_size=1, max_size=20), scalar, max_size=6))
    def check(fields):
        row = Row.create()
        for name, value in fields.items():
            row.set(name, value)
        for name, value in fields.items():
            if value is None:
                assert row.get_long(name) is None
                assert row.get_fields()[name] == {}
            elif isinstance(value, int):
                assert row.get_fields()[name] == {"int64Val": value}
                assert row.get_long(name) == value
            elif isinstance(value, float):
                assert row.get_fields()[name] == {"doubleVal": value}
                assert row.get_double(name) == value
            elif isinstance(value, str):
                assert row.get_string(name) == value
            else:
                assert row.get_bytes(name) == value
            assert row.get_status(name) == PRESENT
        str(row)  # toString never raises

    check()


def test_sdk_to_transform_service_full_reference_path(spark, tmp_path, tmp_store):
    """The COMPLETE reference data path in one test: FeastClient →
    serving gRPC socket → retrieval + ODFV split → external
    transformation service socket (Arrow IPC per executor batch) →
    Rows with transformed outputs, statuses intact. Five live server
    sockets (core REST, serving REST, FTS, core gRPC, serving gRPC)
    via run_servers — the reference's whole deployment."""
    import pandas as pd

    from feast_java_old_spark.operators.odfv import OnDemandFeatureView
    from feast_java_old_spark.transport.app import run_servers

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, TS - dt.timedelta(seconds=10), 4.0), (2, TS - dt.timedelta(seconds=10), 3.0)],
        "driver long, ts timestamp, rating double",
    ).write.parquet(src)
    reg = fs.Registry()
    reg.apply_entity(fs.Entity("driver", fs.ValueType.INT64))
    reg.apply_feature_table(
        fs.FeatureTable(
            name="driver_stats",
            entities=["driver"],
            features=[fs.Feature("rating", fs.ValueType.DOUBLE)],
            max_age_secs=3600,
            batch_source=FileSource(file_url=src, event_timestamp_column="ts"),
        )
    )
    materialize(spark, reg, "driver_stats", tmp_store)
    odfv = OnDemandFeatureView(
        name="boosted",
        inputs=["driver_stats:rating", "boost"],
        output_schema=T.StructType(
            [T.StructField("boosted_rating", T.DoubleType())]
        ),
        transform=lambda pdf: pd.DataFrame(
            {"boosted_rating": pdf["rating"] + pdf["boost"]}
        ),
    )
    servers = run_servers(
        spark,
        reg,
        store_path=tmp_store,
        odfvs={"boosted": odfv},
        transform_port=0,
        core_grpc_port=0,
        serving_grpc_port=0,
    )
    assert len(servers) == 5
    serving_grpc = servers[4]
    try:
        servers[1].controller.serve_kwargs["request_ts"] = TS
        with FeastClient.create(
            serving_grpc.host, serving_grpc.port
        ) as client:
            rows = client.get_online_features(
                ["driver_stats:rating", "boosted:boosted_rating"],
                [
                    Row.create().set("driver", 1).set("boost", 0.5)
                    .set_entity_timestamp(TS),
                    Row.create().set("driver", 2).set("boost", 1.0)
                    .set_entity_timestamp(TS),
                ],
            )
    finally:
        for srv in servers:
            srv.stop()
    assert rows[0].get_double("boosted:boosted_rating") == 4.5
    assert rows[1].get_double("boosted:boosted_rating") == 4.0
    assert rows[0].get_status("boosted:boosted_rating") == PRESENT
    assert rows[0].get_double("driver_stats:rating") == 4.0


def test_client_thread_safety_shared_channel(engine_server):
    """The reference's client is usable from multiple threads over one
    channel; the keep-alive HttpJsonChannel serializes frames under a
    lock — 16 threads x 5 calls each all get their own correct rows."""
    from concurrent.futures import ThreadPoolExecutor

    with FeastClient.create(engine_server.host, engine_server.port) as client:

        def one(i):
            driver = 1 if i % 2 == 0 else 2
            rows = client.get_online_features(
                ["driver_stats:name"],
                [Row.create().set("driver", driver).set_entity_timestamp(TS)],
            )
            return rows[0].get_string("driver_stats:name"), driver

        with ThreadPoolExecutor(16) as pool:
            results = list(pool.map(one, range(80)))
    for name, driver in results:
        assert name == ("david" if driver == 1 else "ana")


def test_sdk_all_value_types_through_client(spark, tmp_path, tmp_store):
    """The reference IT's all-value-types serve (:691-801), driven
    through the CLIENT: bool, scalar, bytes and list-typed features
    arrive in Rows intact — the response mapping stores the wire Value
    verbatim (the set() passthrough arm, FeastClient.java:180-185),
    never the scalar switch that would reject bools and lists."""
    from feast_java_old_spark.plans.serving_rest import (
        ServingServiceRestController,
    )
    from feast_java_old_spark.transport.grpc_adapter import (
        ServingServiceServicer,
    )

    src = str(tmp_path / "src_all")
    schema = T.StructType(
        [
            T.StructField("entity", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("f_double", T.DoubleType()),
            T.StructField("f_string", T.StringType()),
            T.StructField("f_bool", T.BooleanType()),
            T.StructField("f_int64_list", T.ArrayType(T.LongType())),
            T.StructField("f_double_list", T.ArrayType(T.DoubleType())),
            T.StructField("f_string_list", T.ArrayType(T.StringType())),
        ]
    )
    spark.createDataFrame(
        [("key", TS - dt.timedelta(seconds=10), 10.0, "test", True,
          [10, 11], [1.5, 2.5], ["a", "b"])],
        schema,
    ).write.parquet(src)
    reg = fs.Registry()
    reg.apply_entity(fs.Entity("entity", fs.ValueType.STRING))
    feats = [
        fs.Feature(f.name, fs.ValueType.from_spark(f.dataType))
        for f in schema.fields
        if f.name.startswith("f_")
    ]
    reg.apply_feature_table(
        fs.FeatureTable(
            "all_types", ["entity"], feats, max_age_secs=7200,
            batch_source=FileSource(file_url=src, event_timestamp_column="ts"),
        )
    )
    materialize(spark, reg, "all_types", tmp_store)
    ctl = ServingServiceRestController(
        spark, reg, tmp_store, full_feature_names=True
    )
    with GrpcHttpServer([ServingServiceServicer(ctl)]) as srv:
        with FeastClient.create(srv.host, srv.port) as client:
            rows = client.get_online_features(
                [f"all_types:{f.name}" for f in feats],
                [Row.create().set("entity", "key").set_entity_timestamp(TS)],
            )
    r = rows[0]
    for f in feats:
        assert r.get_status(f"all_types:{f.name}") == PRESENT, f.name
    assert r.get_double("all_types:f_double") == 10.0
    assert r.get_string("all_types:f_string") == "test"
    assert r.get_bool("all_types:f_bool") is True
    assert r.get_list("all_types:f_int64_list") == [10, 11]
    assert r.get_list("all_types:f_double_list") == [1.5, 2.5]
    assert r.get_list("all_types:f_string_list") == ["a", "b"]
    # arm inference: ints landed int64ListVal, floats doubleListVal
    assert "int64ListVal" in r.get_fields()["all_types:f_int64_list"]
    assert "doubleListVal" in r.get_fields()["all_types:f_double_list"]
    assert r.get_fields()["all_types:f_bool"] == {"boolVal": True}


# ----------------------------------------------- review-finding pins (r14)


def test_typed_getters_read_widened_json_arms():
    """The JSON codec widens INT32→int64Val and FLOAT→doubleVal; the
    typed getters read the same-family sibling arm instead of silently
    returning the cross-arm proto default (0 / 0.0)."""
    row = Row()
    row.set("i", {"int64Val": 7})
    row.set("f", {"doubleVal": 2.5})
    assert row.get_int("i") == 7  # sibling read, not proto-default 0
    assert row.get_long("i") == 7
    assert row.get_float("f") == 2.5
    assert row.get_double("f") == 2.5
    # cross-FAMILY reads keep proto-default semantics
    assert row.get_string("i") == ""
    assert row.get_int("f") == 0


def test_get_bytes_decodes_string_widened_payload():
    """A bytes-typed FEATURE arrives as a base64 JSON string
    (stringVal after arm inference) — get_bytes decodes it; an invalid
    base64 string yields the proto default b'' like a cross-arm read."""
    import base64

    row = Row()
    row.set("b", {"stringVal": base64.b64encode(b"\x01\x02").decode()})
    assert row.get_bytes("b") == b"\x01\x02"
    row.set("s", {"stringVal": "not base64 !!"})
    assert row.get_bytes("s") == b""


def test_read_phase_failure_never_retries(mock_server):
    """A failure AFTER the status line (IncompleteRead mid-body) must
    propagate, never re-send — the server already ran a handler. Only
    the send phase and the keep-alive race (RemoteDisconnected before
    any status line) retry, and only on a reused socket."""
    import http.client as hc

    srv, _ = mock_server
    chan = HttpJsonChannel(srv.host, srv.port)
    calls = {"n": 0}

    class ExplodingConn:
        def request(self, *a, **k):
            calls["n"] += 1

        def getresponse(self):
            class R:
                status = 200

                def read(self):
                    raise hc.IncompleteRead(b"partial")

                def getheader(self, *a, **k):
                    return ""

            return R()

        def close(self):
            pass

    chan._conn = ExplodingConn()  # a REUSED (non-fresh) connection
    with pytest.raises(hc.IncompleteRead):
        chan.unary(SERVING_SERVICE, "GetOnlineFeaturesV2", {})
    assert calls["n"] == 1  # exactly one send — no blind re-send
    # the failure must not POISON the channel: the bad socket was
    # closed on the way out, so the next call re-dials and succeeds
    assert chan._conn is None
    out = chan.unary(SERVING_SERVICE, "GetOnlineFeaturesV2", fake_request())
    assert out == fake_response()
    chan.close()


def test_keep_alive_race_retries_once_on_reused_socket(mock_server):
    """RemoteDisconnected on getresponse over a REUSED socket is the
    keep-alive race (no status line ⇒ the server never read the
    request) — retried exactly once on a fresh dial."""
    import http.client as hc

    srv, _ = mock_server
    chan = HttpJsonChannel(srv.host, srv.port)
    sends = {"n": 0}

    class StaleConn:
        def request(self, *a, **k):
            sends["n"] += 1

        def getresponse(self):
            raise hc.RemoteDisconnected("server dropped idle socket")

        def close(self):
            pass

    chan._conn = StaleConn()
    out = chan.unary(SERVING_SERVICE, "GetOnlineFeaturesV2", fake_request())
    assert out == fake_response()  # second attempt hit the real server
    assert sends["n"] == 1  # stale conn sent once, then a real redial
    chan.close()


def test_bytes_entity_key_round_trip(spark, tmp_path, tmp_store):
    """A BYTES-typed entity key sent by the SDK ({'bytesVal': base64})
    must be base64-DECODED server-side before the lookup join — without
    the decode every bytes-keyed lookup silently misses."""
    from feast_java_old_spark.plans.serving_rest import (
        ServingServiceRestController,
    )
    from feast_java_old_spark.transport.grpc_adapter import (
        ServingServiceServicer,
    )

    src = str(tmp_path / "src_bytes")
    spark.createDataFrame(
        [(bytearray(b"\x01\x02"), TS - dt.timedelta(seconds=10), 7.0)],
        T.StructType(
            [
                T.StructField("bkey", T.BinaryType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("score", T.DoubleType()),
            ]
        ),
    ).write.parquet(src)
    reg = fs.Registry()
    reg.apply_entity(fs.Entity("bkey", fs.ValueType.BYTES))
    reg.apply_feature_table(
        fs.FeatureTable(
            "by_bytes", ["bkey"], [fs.Feature("score", fs.ValueType.DOUBLE)],
            max_age_secs=7200,
            batch_source=FileSource(file_url=src, event_timestamp_column="ts"),
        )
    )
    materialize(spark, reg, "by_bytes", tmp_store)
    ctl = ServingServiceRestController(
        spark, reg, tmp_store, full_feature_names=True
    )
    with GrpcHttpServer([ServingServiceServicer(ctl)]) as srv:
        with FeastClient.create(srv.host, srv.port) as client:
            rows = client.get_online_features(
                ["by_bytes:score"],
                [Row.create().set("bkey", b"\x01\x02").set_entity_timestamp(TS)],
            )
    assert rows[0].get_status("by_bytes:score") == PRESENT
    assert rows[0].get_double("by_bytes:score") == 7.0
    assert rows[0].get_bytes("bkey") == b"\x01\x02"  # entity echoed


def test_expression_odfv_allows_colliding_bare_names(spark):
    """Expression views reference aliased FULL columns — the bare-name
    collision rejection applies only to pandas-transform views."""
    from pyspark.sql import functions as F

    from feast_java_old_spark.operators.odfv import (
        OnDemandFeatureView,
        apply_odfv,
    )

    df = spark.createDataFrame(
        [(1, 1.0, 2.0)], "id long, a__x double, b__x double"
    )
    view = OnDemandFeatureView.from_expressions(
        "combo", ["a:x", "b:x"], {"y": F.col("a__x") + F.col("b__x")}
    )
    out = apply_odfv(df, view).collect()
    assert out[0].y == 3.0


# ----------------------------------------------------------- r15 hardening


def test_row_set_passthrough_validates_value_wrapper():
    """The Java passthrough arm is TYPED (``ValueProto.Value``,
    Row.java:86-87); the JSON analog rejects a dict that is not a Value
    wrapper — a typo'd arm name or a multi-arm dict fails client-side
    with the unsupported-type message instead of shipping as garbage."""
    row = Row()
    # valid: a known narrow arm, a list arm, snake_case, and unset
    row.set("narrow", {"int32Val": 7})
    assert row.get_int("narrow") == 7
    row.set("lst", {"int64ListVal": {"val": [1, 2]}})
    assert row.get_list("lst") == [1, 2]
    row.set("snake", {"int32_val": 7})
    row.set("unset", {})
    assert row.get_long("unset") is None
    # invalid: typo'd arm casing, unknown key, two arms at once
    for bad in (
        {"int64val": 7},
        {"notAnArm": 1},
        {"int64Val": 7, "stringVal": "x"},
    ):
        with pytest.raises(ValueError, match="unsupported in Feast"):
            row.set("bad", bad)


def test_get_bytes_malformed_passthrough_base64_yields_default():
    """A client-built {'bytesVal': '<str>'} wrapper whose payload is not
    valid base64 yields the proto default b'' — same contract as the
    stringVal-widened arm, never binascii.Error."""
    row = Row()
    row.set("b", {"bytesVal": "not base64 !!"})
    assert row.get_bytes("b") == b""


def test_response_rows_are_create_stamped(mock_server):
    """The reference's response mapper builds rows via Row.create()
    (FeastClient.java:180), so get_entity_timestamp() on a returned row
    is a now-stamp, never None."""
    srv, _ = mock_server
    with FeastClient.create(srv.host, srv.port) as client:
        rows = client.get_online_features(
            ["driver:name", "driver:rating", "driver:null_value"],
            _request_rows(),
            "driver_project",
        )
    assert rows[0].get_entity_timestamp() is not None


def test_send_timeout_never_retries(mock_server):
    """A send-phase TIMEOUT does not prove non-delivery (the bytes may
    be kernel-buffered and delivered after we give up) — it must
    propagate without a re-send, even on a reused socket; only
    peer-closed send errors (ECONNRESET/EPIPE) retry."""
    import socket

    srv, _ = mock_server
    chan = HttpJsonChannel(srv.host, srv.port)
    sends = {"n": 0}

    class TimingOutConn:
        def request(self, *a, **k):
            sends["n"] += 1
            raise socket.timeout("send timed out")

        def close(self):
            pass

    chan._conn = TimingOutConn()  # a REUSED (non-fresh) connection
    with pytest.raises(OSError):
        chan.unary(SERVING_SERVICE, "GetOnlineFeaturesV2", fake_request())
    assert sends["n"] == 1  # exactly one send — no blind re-send
    assert chan._conn is None  # and the socket was not left poisoned
    # peer-closed on send (the keep-alive race caught at write time)
    # DOES retry once on a fresh dial:
    class ResetConn:
        def request(self, *a, **k):
            sends["n"] += 1
            raise ConnectionResetError("peer closed idle socket")

        def close(self):
            pass

    chan._conn = ResetConn()
    out = chan.unary(SERVING_SERVICE, "GetOnlineFeaturesV2", fake_request())
    assert out == fake_response()
    assert sends["n"] == 2  # stale conn sent once, then the real redial
    chan.close()


def test_close_is_lock_safe_against_inflight_calls(mock_server):
    """close() takes the channel lock, so a close() racing an in-flight
    call serializes behind it instead of nulling _conn mid-request;
    and a call AFTER close re-dials cleanly."""
    import threading

    srv, _ = mock_server
    chan = HttpJsonChannel(srv.host, srv.port)
    assert chan.unary(
        SERVING_SERVICE, "GetOnlineFeaturesV2", fake_request()
    ) == fake_response()
    stop = threading.Event()
    errors = []

    def closer():
        while not stop.is_set():
            chan.close()

    t = threading.Thread(target=closer)
    t.start()
    try:
        for _ in range(50):
            try:
                out = chan.unary(
                    SERVING_SERVICE, "GetOnlineFeaturesV2", fake_request()
                )
                assert out == fake_response()
            except Exception as ex:  # noqa: BLE001 - recording any race
                errors.append(ex)
    finally:
        stop.set()
        t.join()
    chan.close()
    assert not errors  # no AttributeError-on-None, no half-state failures


def test_sdk_compound_entity_serve(spark, tmp_path, tmp_store):
    """``ServingServiceBigTableIT.
    shouldRegisterCompoundEntityAndGetOnlineFeatures:533-596`` through
    the FeastClient: a feature table on TWO entities, entity Rows
    carrying BOTH key fields, a present feature returning its value and
    a missing pair returning NOT_FOUND with the empty Value."""
    from feast_java_old_spark.plans.serving_rest import (
        ServingServiceRestController,
    )
    from feast_java_old_spark.transport.grpc_adapter import (
        ServingServiceServicer,
    )

    src = str(tmp_path / "rides_src")
    spark.createDataFrame(
        [(1, 1234, TS - dt.timedelta(seconds=10), 5)],
        T.StructType(
            [
                T.StructField("driver_id", T.LongType()),
                T.StructField("merchant_id", T.LongType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("trip_cost", T.LongType()),
            ]
        ),
    ).write.parquet(src)
    reg = fs.Registry()
    reg.apply_entity(fs.Entity("driver_id", fs.ValueType.INT64))
    reg.apply_entity(fs.Entity("merchant_id", fs.ValueType.INT64))
    reg.apply_feature_table(
        fs.FeatureTable(
            name="rides",
            entities=["driver_id", "merchant_id"],
            features=[fs.Feature("trip_cost", fs.ValueType.INT64)],
            batch_source=FileSource(file_url=src, event_timestamp_column="ts"),
        )
    )
    materialize(spark, reg, "rides", tmp_store)
    ctl = ServingServiceRestController(
        spark, reg, tmp_store, full_feature_names=True
    )
    with GrpcHttpServer([ServingServiceServicer(ctl)]) as srv:
        with FeastClient.create(srv.host, srv.port) as client:
            rows = client.get_online_features(
                ["rides:trip_cost"],
                [
                    # the IT's compound row (driver 1, merchant 1234)
                    Row.create()
                    .set("driver_id", 1)
                    .set("merchant_id", 1234)
                    .set_entity_timestamp(TS),
                    # an unknown compound pair → NOT_FOUND + empty Value
                    Row.create()
                    .set("driver_id", 1)
                    .set("merchant_id", 9999)
                    .set_entity_timestamp(TS),
                ],
            )
    assert len(rows) == 2
    hit, miss = rows
    assert hit.get_long("driver_id") == 1
    assert hit.get_long("merchant_id") == 1234
    assert hit.get_long("rides:trip_cost") == 5
    assert hit.get_status("rides:trip_cost") == PRESENT
    assert miss.get_long("rides:trip_cost") is None  # the empty Value
    assert miss.get_status("rides:trip_cost") == NOT_FOUND
    # entity fields echo back PRESENT, like the IT's expectedStatusMap
    assert miss.get_status("driver_id") == PRESENT
    assert miss.get_status("merchant_id") == PRESENT


def test_get_bytes_strict_dual_alphabet_decode():
    """Client/server parity on bytes payloads: URL-safe base64 decodes
    to the SAME bytes the server's _b64 would produce, and a payload
    with stray characters yields the proto default b'' (a lenient
    decode would silently discard the stray char and return garbage
    residue bytes)."""
    import base64

    row = Row()
    # URL-safe alphabet (canonical proto3 JSON permits both)
    url_safe = base64.urlsafe_b64encode(b"\xff" * 6).decode()
    assert "_" in url_safe  # proves the standard decoder alone fails
    row.set("u", {"bytesVal": url_safe})
    assert row.get_bytes("u") == b"\xff" * 6
    # stray character: strict decode rejects, proto default comes back
    row.set("g", {"bytesVal": "abc!d"})
    assert row.get_bytes("g") == b""
    # stringVal-widened arm takes the same dual-alphabet path
    row.set("w", {"stringVal": url_safe})
    assert row.get_bytes("w") == b"\xff" * 6
