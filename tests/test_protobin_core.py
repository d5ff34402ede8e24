"""Control-plane proto-binary codec tests (the r16 half of the binary
gap — CoreService messages; the serving data plane landed r15).

Same three layers as test_protobin.py: (1) golden wire vectors
hand-computed from the proto3 spec + the public feast core proto field
numbers, (2) engine-dict round-trips through the bridges for every
message family, (3) the negotiated socket — a ``codec="proto"``
channel against the real CoreServiceServicer agrees with the JSON
channel on one socket, and engine extensions the canonical protos
cannot express reject loudly instead of corrupting.
"""

import datetime as dt

import pytest

from feast_java_old_spark.registry.core_service import CoreService
from feast_java_old_spark.registry.model import (
    Entity,
    Feature,
    FeatureTable,
    FileSource,
    KafkaSource,
    Store,
    Subscription,
    ValueType,
)
from feast_java_old_spark.registry.registry import Registry
from feast_java_old_spark.sdk import HttpJsonChannel
from feast_java_old_spark.transport import protobin as pb
from feast_java_old_spark.transport import protobin_core as pbc
from feast_java_old_spark.transport.grpc_adapter import CoreServiceServicer
from feast_java_old_spark.transport.grpc_http import GrpcHttpServer

C = pbc.CORE_SERVICE


# ------------------------------------------------------- golden vectors


def test_golden_entity_spec():
    # EntitySpecV2: name=1 ("d"), value_type=2 (INT64=4), labels=8
    wire = pb.encode_message(
        {"name": "d", "valueType": "INT64"}, pbc.ENTITY_SPEC_V2
    )
    assert wire == bytes([0x0A, 0x01]) + b"d" + bytes([0x10, 0x04])
    # labels=8 → tag (8<<3)|2 = 0x42, map entry key=1 value=2
    wire = pb.encode_message({"labels": {"a": "b"}}, pbc.ENTITY_SPEC_V2)
    assert wire == bytes([0x42, 0x06, 0x0A, 0x01]) + b"a" + bytes(
        [0x12, 0x01]
    ) + b"b"


def test_golden_feature_table_spec_numbers():
    # entities=3 (tag 0x1A), features=4 (0x22), max_age=6 → Duration
    wire = pb.encode_message(
        {"entities": ["e"], "maxAge": {"seconds": 300}},
        pbc.FEATURE_TABLE_SPEC,
    )
    assert wire == (
        bytes([0x1A, 0x01]) + b"e"
        # maxAge tag (6<<3)|2=0x32, Duration seconds=1 varint 300
        + bytes([0x32, 0x03, 0x08, 0xAC, 0x02])
    )


def test_golden_data_source_file():
    # type=1 BATCH_FILE=1; file_options oneof = 11 → tag 0x5A;
    # FileOptions: fileFormat=1 (FileFormat.parquet_format=1), fileUrl=2
    src = {
        "kind": "file",
        "file_url": "/x",
        "file_format": "parquet",
        "schema_ddl": "",
        "event_timestamp_column": "",
        "created_timestamp_column": "",
        "date_partition_column": "",
        "field_mapping": {},
    }
    wire = pb.encode_message(pbc._source_to_proto(src), pbc.DATA_SOURCE)
    assert wire == (
        bytes([0x08, 0x01])  # type=1 varint BATCH_FILE
        + bytes([0x5A, 0x08])  # fileOptions, len 8
        + bytes([0x0A, 0x02, 0x0A, 0x00])  # fileFormat{parquetFormat{}}
        + bytes([0x12, 0x02])
        + b"/x"
    )


def test_golden_subscription_numbers():
    # Subscription: name=1, project=3 (field 2 reserved), exclude=4
    wire = pb.encode_message(
        {"project": "p", "name": "n", "exclude": True}, pbc.SUBSCRIPTION
    )
    assert wire == (
        bytes([0x1A, 0x01]) + b"p" + bytes([0x0A, 0x01]) + b"n"
        + bytes([0x20, 0x01])
    )


def test_golden_store_redis_cluster():
    # Store: redis_cluster_config oneof = 14 → tag 0x72
    store = {
        "name": "s",
        "store_type": "REDIS_CLUSTER",
        "config": {"connection_string": "h:1,h:2"},
        "subscriptions": [],
    }
    wire = pb.encode_message(pbc._store_to_proto(store), pbc.STORE)
    assert wire == (
        bytes([0x0A, 0x01]) + b"s"
        + bytes([0x10, 0x04])  # type=2 REDIS_CLUSTER=4
        + bytes([0x72, 0x09, 0x0A, 0x07]) + b"h:1,h:2"
    )


# ----------------------------------------------------- bridge round-trips


def _table_dict():
    return FeatureTable(
        "driver_stats",
        entities=["driver"],
        features=[
            Feature("rating", ValueType.DOUBLE),
            Feature("trips", ValueType.INT64, labels={"tier": "gold"}),
        ],
        max_age_secs=7200,
        labels={"team": "dx"},
        batch_source=FileSource(
            file_url="/data/driver.parquet",
            event_timestamp_column="ts",
            date_partition_column="dt",
            field_mapping={"r": "rating"},
        ),
        stream_source=KafkaSource(
            bootstrap_servers="k:9092",
            topic="drv",
            message_format="proto",
            event_timestamp_column="ts",
        ),
        revision=5,
    ).to_dict()


def test_feature_table_round_trip_through_wire():
    tbl = _table_dict()
    w = pb.encode_response(C, "GetFeatureTable", {"table": tbl})
    assert pb.decode_response(C, "GetFeatureTable", w) == {"table": tbl}
    # and from_dict accepts the decoded dict (full model fidelity)
    back = FeatureTable.from_dict(
        pb.decode_response(C, "GetFeatureTable", w)["table"]
    )
    assert back.spec_hash() == FeatureTable.from_dict(tbl).spec_hash()
    assert back.revision == 5


def test_entity_and_features_map_round_trip():
    ent = Entity(
        "driver", ValueType.INT64, description="the driver", labels={"x": "1"}
    ).to_dict()
    w = pb.encode_response(C, "ApplyEntity", {"entity": ent})
    assert pb.decode_response(C, "ApplyEntity", w) == {"entity": ent}
    feats = {
        "driver_stats:rating": {
            "name": "rating",
            "value_type": "DOUBLE",
            "labels": {},
        }
    }
    w = pb.encode_response(C, "ListFeatures", {"features": feats})
    assert pb.decode_response(C, "ListFeatures", w) == {"features": feats}


def test_store_round_trip_preserves_string_config():
    store = Store(
        "online",
        store_type="REDIS",
        config={"host": "r.example", "port": "6379", "ssl": "true",
                "max_retries": "3"},
        subscriptions=[Subscription("default", "*"),
                       Subscription("p", "secret", exclude=True)],
    ).to_dict()
    w = pb.encode_response(C, "ListStores", {"store": [store]})
    back = pb.decode_response(C, "ListStores", w)["store"][0]
    # Java getter parity: the decode side walks EVERY config getter, so
    # the full RedisConfig key set comes back — wire-present values
    # verbatim, wire-absent ones as proto defaults (proto3 elides
    # default-valued scalars like port=0, so "present on the wire"
    # cannot be the fidelity contract)
    assert back["name"] == store["name"]
    assert back["subscriptions"] == store["subscriptions"]
    assert back["store_type"] == "REDIS"
    assert back["config"] == {
        "host": "r.example", "port": "6379", "ssl": "true",
        "max_retries": "3", "initial_backoff_ms": "0",
        "flush_frequency_seconds": "0",
    }


def test_store_default_valued_config_survives_round_trip():
    """A config entry AT its proto default ({"port": "0"}) cannot ride
    the wire (proto3 elision) — the getter-parity decode restores it,
    so the two codecs agree that the key exists."""
    store = Store("s", store_type="REDIS",
                  config={"host": "h", "port": "0", "ssl": "false"}).to_dict()
    w = pb.encode_response(C, "UpdateStore", {"store": store})
    cfg = pb.decode_response(C, "UpdateStore", w)["store"]["config"]
    assert cfg["port"] == "0" and cfg["ssl"] == "false"
    assert cfg["host"] == "h"


def test_list_stores_skips_engine_local_store_types():
    """ListStores over binary OMITS non-representable engine-local
    stores (the default "parquet" sink layout) instead of failing the
    whole read — the JSON codec remains the full-fidelity listing;
    mutations (UpdateStore) still reject loudly."""
    parquet = Store("local_sink").to_dict()
    redis = Store("online", store_type="REDIS",
                  config={"host": "h"}).to_dict()
    w = pb.encode_response(C, "ListStores", {"store": [parquet, redis]})
    names = [s["name"] for s in pb.decode_response(C, "ListStores", w)["store"]]
    assert names == ["online"]
    with pytest.raises(pb.ProtoCodecError, match="Invalid store"):
        pb.encode_request(C, "UpdateStore", {"store": parquet})


def test_apply_table_unknown_request_key_raises():
    """_apply_table_req_to_proto preserves unknown keys so the codec's
    unknown-field error fires — a typo'd "Project" must not silently
    apply the table to the default project."""
    spec = {k: v for k, v in _table_dict().items()
            if k not in ("revision", "is_deleted")}
    with pytest.raises(pb.ProtoCodecError, match="unknown field"):
        pb.encode_request(
            C, "ApplyFeatureTable", {"spec": spec, "Project": "prod"}
        )


def test_apply_table_request_accepts_engine_and_canonical_keys():
    spec = {
        k: v
        for k, v in _table_dict().items()
        if k not in ("revision", "is_deleted")
    }
    w1 = pb.encode_request(C, "ApplyFeatureTable", {"spec": spec, "project": "p"})
    w2 = pb.encode_request(
        C, "ApplyFeatureTable", {"tableSpec": spec, "project": "p"}
    )
    assert w1 == w2
    assert pb.decode_request(C, "ApplyFeatureTable", w1) == {
        "spec": spec,
        "project": "p",
    }


def test_filter_requests_round_trip():
    # ListEntities Filter project=3/labels=4; ListFeatures Filter
    # labels=1/entities=2/project=3; ListFeatureTables project=1/labels=3
    req = {"filter": {"project": "p", "labels": {"a": "b"}}}
    w = pb.encode_request(C, "ListEntities", req)
    assert pb.decode_request(C, "ListEntities", w) == req
    req = {"filter": {"project": "p", "entities": ["e1", "e2"],
                      "labels": {"a": "b"}}}
    w = pb.encode_request(C, "ListFeatures", req)
    assert pb.decode_request(C, "ListFeatures", w) == req
    req = {"filter": {"project": "p", "labels": {"a": "b"}}}
    w = pb.encode_request(C, "ListFeatureTables", req)
    assert pb.decode_request(C, "ListFeatureTables", w) == req


# ------------------------------------------------ engine-extension gates


def test_engine_extensions_reject_loudly():
    # parquet-only FileFormat (DataSourceValidator.java:34-43 parity)
    csv = FileSource(file_url="/x.csv", file_format="csv",
                     event_timestamp_column="ts").to_dict()
    with pytest.raises(pb.ProtoCodecError, match="file_format"):
        pbc._source_to_proto(csv)
    ddl = FileSource(file_url="/x.parquet", schema_ddl="id BIGINT",
                     event_timestamp_column="ts").to_dict()
    with pytest.raises(pb.ProtoCodecError, match="schema_ddl"):
        pbc._source_to_proto(ddl)
    # StreamFormat has avro/proto arms only
    js = KafkaSource(bootstrap_servers="k", topic="t",
                     message_format="json").to_dict()
    with pytest.raises(pb.ProtoCodecError, match="avro/proto"):
        pbc._source_to_proto(js)
    # Store.fromProto parity: non-redis types throw
    with pytest.raises(pb.ProtoCodecError, match="Invalid store"):
        pbc._store_to_proto(Store("s").to_dict())
    # unknown config keys cannot silently drop
    with pytest.raises(pb.ProtoCodecError, match="config key"):
        pbc._store_to_proto(
            Store("s", store_type="REDIS",
                  config={"not_a_field": "x"}).to_dict()
        )


# ------------------------------------------------------- socket parity


@pytest.fixture()
def core_servicer():
    reg = Registry()
    reg.apply_entity(Entity("driver", ValueType.INT64, labels={"t": "1"}))
    reg.apply_feature_table(
        FeatureTable(
            "driver_stats",
            entities=["driver"],
            features=[Feature("rating", ValueType.DOUBLE)],
            max_age_secs=3600,
            batch_source=FileSource(
                file_url="/tmp/x.parquet", event_timestamp_column="ts"
            ),
        )
    )
    return CoreServiceServicer(CoreService(reg))


def test_core_socket_binary_json_parity(core_servicer):
    """Every descriptor-carrying CoreService method returns the same
    dict over codec='proto' and codec='json' on ONE socket, and binary
    mutations land in the shared registry."""
    with GrpcHttpServer([core_servicer]) as srv:
        pc = HttpJsonChannel(srv.host, srv.port, timeout=60, codec="proto")
        jc = HttpJsonChannel(srv.host, srv.port, timeout=60)
        try:
            for method, req in [
                ("GetFeastCoreVersion", {}),
                ("GetEntity", {"name": "driver"}),
                ("ListEntities", {"filter": {"project": "default"}}),
                ("GetFeatureTable", {"name": "driver_stats"}),
                ("ListFeatureTables", {"filter": {"project": "default"}}),
                ("ListFeatures", {"filter": {"project": "default"}}),
                ("ListProjects", {}),
            ]:
                a = pc.unary(C, method, req)
                b = jc.unary(C, method, req)
                assert a == b, (method, a, b)

            # binary mutation: ApplyEntity through proto, read over JSON
            spec = Entity("zone", ValueType.STRING).to_dict()
            a = pc.unary(C, "ApplyEntity", {"spec": spec})
            assert a["entity"]["name"] == "zone"
            names = [
                e["name"]
                for e in jc.unary(C, "ListEntities", {})["entities"]
            ]
            assert "zone" in names

            # binary UpdateStore with a REDIS store round-trips
            store = Store(
                "online",
                store_type="REDIS",
                config={"host": "localhost", "port": "6379"},
                subscriptions=[Subscription("default", "*")],
            ).to_dict()
            a = pc.unary(C, "UpdateStore", {"store": store})
            assert a["status"] == "UPDATED"
            assert a["store"]["config"]["port"] == "6379"
            got = jc.unary(C, "ListStores", {})["store"]
            assert {s["name"] for s in got} >= {"online"}

            # binary project lifecycle
            pc.unary(C, "CreateProject", {"name": "p2"})
            assert "p2" in pc.unary(C, "ListProjects", {})["projects"]
            pc.unary(C, "ArchiveProject", {"name": "p2"})
        finally:
            pc.close()
            jc.close()


def test_core_socket_binary_error_stays_json(core_servicer):
    from feast_java_old_spark.transport.grpc_adapter import GrpcCallError

    with GrpcHttpServer([core_servicer]) as srv:
        pc = HttpJsonChannel(srv.host, srv.port, timeout=60, codec="proto")
        try:
            with pytest.raises(GrpcCallError) as ei:
                pc.unary(C, "GetEntity", {"name": "nope"})
            assert ei.value.code == "NOT_FOUND"
        finally:
            pc.close()


def test_delete_feature_table_binary(core_servicer):
    with GrpcHttpServer([core_servicer]) as srv:
        pc = HttpJsonChannel(srv.host, srv.port, timeout=60, codec="proto")
        try:
            assert pc.unary(
                C, "DeleteFeatureTable", {"name": "driver_stats"}
            ) == {}
            with pytest.raises(Exception):
                pc.unary(C, "GetFeatureTable", {"name": "driver_stats"})
        finally:
            pc.close()


def test_apply_feature_table_key_selects_dialect(core_servicer):
    """The request key selects the body dialect: 'spec' carries the
    engine shape (documented JSON surface), 'tableSpec' carries the
    CANONICAL proto-JSON FeatureTableSpec (its proto json name) —
    bridged through the codec's converter."""
    engine = FeatureTable(
        "t2",
        entities=["driver"],
        features=[Feature("x", ValueType.INT64)],
        batch_source=FileSource(
            file_url="/tmp/y.parquet", event_timestamp_column="ts"
        ),
    ).to_dict()
    for k in ("revision", "is_deleted"):
        engine.pop(k)
    out = core_servicer.ApplyFeatureTable({"spec": engine})
    assert out["table"]["name"] == "t2"
    canonical = pbc._table_spec_to_proto(engine)
    out = core_servicer.ApplyFeatureTable({"tableSpec": canonical})
    assert out["table"]["name"] == "t2"
    assert out["table"]["batch_source"]["file_url"] == "/tmp/y.parquet"


# -------------------------------------------------------- property layer

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_names = st.text(alphabet="abcdefgh_", min_size=1, max_size=8)
_labels = st.dictionaries(_names, _names, max_size=3)
_vt = st.sampled_from(
    ["INT64", "DOUBLE", "STRING", "BOOL", "BYTES_LIST", "FLOAT_LIST"]
)
_features = st.lists(
    st.builds(
        lambda n, v, l: {"name": n, "value_type": v, "labels": l},
        _names,
        _vt,
        _labels,
    ),
    max_size=4,
)


@settings(max_examples=60, deadline=None)
@given(
    name=_names,
    entities=st.lists(_names, max_size=3),
    features=_features,
    max_age=st.integers(min_value=0, max_value=10**9),
    labels=_labels,
    revision=st.integers(min_value=0, max_value=1000),
    url=st.text(alphabet="abc/.", min_size=0, max_size=12),
)
def test_feature_table_wire_property(
    name, entities, features, max_age, labels, revision, url
):
    tbl = {
        "name": name,
        "entities": entities,
        "features": features,
        "max_age_secs": max_age,
        "labels": labels,
        "batch_source": {
            "kind": "file",
            "file_url": url,
            "file_format": "parquet",
            "schema_ddl": "",
            "event_timestamp_column": "ts",
            "created_timestamp_column": "",
            "date_partition_column": "",
            "field_mapping": {},
        },
        "stream_source": None,
        "revision": revision,
        "is_deleted": False,
    }
    w = pb.encode_response(C, "ApplyFeatureTable", {"table": tbl})
    assert pb.decode_response(C, "ApplyFeatureTable", w) == {"table": tbl}


def test_json_servicer_accepts_canonical_proto_json_bodies(core_servicer):
    """A real proto-JSON client's camelCase bodies work over plain
    JSON: canonical EntitySpecV2 (valueType) on ApplyEntity and
    canonical FeatureTableSpec (tableSpec + maxAge "300s" string +
    batchSource) on ApplyFeatureTable."""
    out = core_servicer.ApplyEntity(
        {"spec": {"name": "region", "valueType": "STRING",
                  "description": "geo"}}
    )
    assert out["entity"]["value_type"] == "STRING"

    out = core_servicer.ApplyFeatureTable(
        {
            "tableSpec": {
                "name": "canon_t",
                "entities": ["driver"],
                "features": [{"name": "f", "valueType": "INT64"}],
                "maxAge": "300s",
                "batchSource": {
                    "type": "BATCH_FILE",
                    "eventTimestampColumn": "ts",
                    "fileOptions": {
                        "fileFormat": {"parquetFormat": {}},
                        "fileUrl": "/tmp/c.parquet",
                    },
                },
            }
        }
    )
    t = out["table"]
    assert t["max_age_secs"] == 300
    assert t["features"][0]["value_type"] == "INT64"
    assert t["batch_source"]["file_url"] == "/tmp/c.parquet"
