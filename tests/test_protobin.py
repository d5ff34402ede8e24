"""Proto-binary wire codec tests — the data-plane half of the
transport layer's "proto-JSON instead of proto binary" divergence,
closed for the ServingService surface.

Pins three layers: (1) golden wire vectors hand-computed from the
proto3 encoding spec (so the bytes are canonical protobuf, not merely
self-consistent), (2) dict↔binary round-trip properties over every
Value arm, (3) the negotiated socket path — a ``codec="proto"``
FeastClient against the engine servicer returns Rows identical to the
JSON client's, errors stay JSON on both codecs, and descriptor-less
methods fall back to JSON transparently.
"""

import base64
import datetime as dt
import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from feast_java_old_spark.sdk import FeastClient, HttpJsonChannel, Row
from feast_java_old_spark.transport import protobin as pb
from feast_java_old_spark.transport.grpc_adapter import (
    SERVING_SERVICE,
    GrpcCallError,
)
from feast_java_old_spark.transport.grpc_http import GrpcHttpServer

SVC = SERVING_SERVICE
M = "GetOnlineFeaturesV2"


# ------------------------------------------------------- golden vectors
# (hand-computed from the proto3 encoding spec — the spec's own
# int32=150 example generalized to the feast field numbers)


def test_golden_value_int64():
    # Value.int64_val = 4 → tag 0x20; varint 150 → 0x96 0x01
    assert pb.encode_message({"int64Val": 150}, pb.VALUE) == bytes(
        [0x20, 0x96, 0x01]
    )


def test_golden_value_string():
    # Value.string_val = 2 → tag 0x12; "david" length 5
    assert pb.encode_message({"stringVal": "david"}, pb.VALUE) == bytes(
        [0x12, 0x05]
    ) + b"david"


def test_golden_zero_valued_oneof_arm_still_encodes():
    """proto3 oneof presence: a SET arm serializes even at its zero
    value (the dict key IS the oneof case) — unlike plain fields."""
    assert pb.encode_message({"int64Val": 0}, pb.VALUE) == bytes([0x20, 0x00])
    assert pb.encode_message({"stringVal": ""}, pb.VALUE) == bytes([0x12, 0x00])
    # plain (non-oneof) default IS omitted: empty project
    assert (
        pb.encode_message({"project": ""}, pb.GET_ONLINE_FEATURES_REQUEST_V2)
        == b""
    )


def test_golden_negative_int64_ten_byte_varint():
    wire = pb.encode_message({"int64Val": -1}, pb.VALUE)
    assert len(wire) == 1 + 10  # tag + two's-complement 64-bit varint
    assert pb.decode_message(wire, pb.VALUE) == {"int64Val": -1}


def test_golden_feature_reference():
    # feature_table = 1 (tag 0x0A), name = 2 (tag 0x12)
    wire = pb.encode_message(
        {"featureTable": "driver", "name": "rating"}, pb.FEATURE_REFERENCE_V2
    )
    assert wire == bytes([0x0A, 0x06]) + b"driver" + bytes([0x12, 0x06]) + b"rating"


def test_golden_packed_int64_list():
    # Int64List.val = 1, packed → tag 0x0A, len 3, varints 1 2 3
    inner = pb.encode_message({"val": [1, 2, 3]}, pb._INT64_LIST)
    assert inner == bytes([0x0A, 0x03, 0x01, 0x02, 0x03])
    # and nested under Value.int64_list_val = 14 → tag (14<<3)|2 = 0x72
    wire = pb.encode_message({"int64ListVal": {"val": [1, 2, 3]}}, pb.VALUE)
    assert wire == bytes([0x72, len(inner)]) + inner


def test_golden_timestamp_message():
    # Timestamp{seconds=100} under EntityRow.timestamp = 1
    wire = pb.encode_message(
        {"timestamp": "1970-01-01T00:01:40", "fields": {}}, pb.ENTITY_ROW
    )
    # field 1, len 2, {seconds=1 varint 100}
    assert wire == bytes([0x0A, 0x02, 0x08, 0x64])
    back = pb.decode_message(wire, pb.ENTITY_ROW)
    assert back["timestamp"] == "1970-01-01T00:01:40Z"


def test_golden_map_entry_shape():
    # map<string, Value> entry = embedded message {key=1, value=2}
    wire = pb.encode_message(
        {"fields": {"id": {"int64Val": 1}}}, pb.ENTITY_ROW
    )
    # ENTITY_ROW.fields = 2 → tag 0x12; entry: key "id" (0x0A 0x02 id),
    # value Value{int64Val:1} (0x12 0x02 0x20 0x01)
    entry = bytes([0x0A, 0x02]) + b"id" + bytes([0x12, 0x02, 0x20, 0x01])
    assert wire == bytes([0x12, len(entry)]) + entry


def test_unknown_fields_skipped_on_decode():
    """Forward compatibility: an unknown field number decodes to
    nothing, never an error (how protobuf evolves schemas)."""
    known = pb.encode_message({"stringVal": "x"}, pb.VALUE)
    # append unknown field 99 (varint): tag (99<<3)|0
    unknown = pb._write_varint((99 << 3) | 0) + pb._write_varint(7)
    assert pb.decode_message(known + unknown, pb.VALUE) == {"stringVal": "x"}


def test_truncated_payload_raises_codec_error():
    wire = pb.encode_message({"stringVal": "hello"}, pb.VALUE)
    with pytest.raises((pb.ProtoCodecError, ValueError)):
        pb.decode_message(wire[:-3], pb.VALUE)


# ----------------------------------------------------- round-trip props


_VALUE_DICTS = st.one_of(
    st.builds(lambda v: {"int64Val": v}, st.integers(-(2**63), 2**63 - 1)),
    st.builds(lambda v: {"int32Val": v}, st.integers(-(2**31), 2**31 - 1)),
    st.builds(
        lambda v: {"doubleVal": v},
        st.floats(allow_nan=False, allow_infinity=False),
    ),
    st.builds(lambda v: {"stringVal": v}, st.text(max_size=50)),
    st.builds(lambda v: {"boolVal": v}, st.booleans()),
    st.builds(
        lambda v: {"bytesVal": base64.b64encode(v).decode()},
        st.binary(max_size=50),
    ),
    st.builds(
        lambda v: {"int64ListVal": {"val": v}},
        st.lists(st.integers(-(2**63), 2**63 - 1), max_size=10),
    ),
    st.builds(
        lambda v: {"doubleListVal": {"val": v}},
        st.lists(
            st.floats(allow_nan=False, allow_infinity=False), max_size=10
        ),
    ),
    st.builds(
        lambda v: {"stringListVal": {"val": v}},
        st.lists(st.text(max_size=20), max_size=10),
    ),
    st.builds(
        lambda v: {"boolListVal": {"val": v}}, st.lists(st.booleans(), max_size=10)
    ),
    st.just({}),  # the UNSET Value
)


@settings(max_examples=200, deadline=None)
@given(_VALUE_DICTS)
def test_value_round_trip_property(value):
    wire = pb.encode_message(value, pb.VALUE)
    back = pb.decode_message(wire, pb.VALUE)
    # an EMPTY list wrapper's inner message encodes to zero bytes, so
    # it round-trips to the absent-val form {arm: {}} — same payload
    want = {
        k: ({} if k.endswith("ListVal") and not inner.get("val") else inner)
        for k, inner in value.items()
    }
    assert back == want


def test_float_arm_round_trips_representable_values():
    """floatVal is a 32-bit float on the wire — test values exactly
    representable in float32 (a general property would fail on the
    float64→float32 narrowing, which is proto semantics, not a bug)."""
    for v in (0.5, 2.5, -1.25, 0.0):
        wire = pb.encode_message({"floatVal": v}, pb.VALUE)
        assert pb.decode_message(wire, pb.VALUE) == {"floatVal": v}


def test_request_round_trip_with_native_scalars_and_snake_case():
    """The relaxed JSON request arms (native scalar entity values,
    snake_case entity_rows) normalize into typed Values on encode."""
    req = {
        "features": [{"featureTable": "t", "name": "f"}],
        "entity_rows": [
            {"fields": {"k": 7, "s": "x", "w": {"int32Val": 3}}}
        ],
        "project": "p",
    }
    back = pb.decode_request(SVC, M, pb.encode_request(SVC, M, req))
    assert back["project"] == "p"
    assert back["entityRows"][0]["fields"] == {
        "k": {"int64Val": 7},
        "s": {"stringVal": "x"},
        "w": {"int32Val": 3},
    }


def test_response_round_trip_wraps_native_fields():
    resp = {
        "fieldValues": [
            {
                "fields": {"id": 1, "name": "a", "nil": None, "flag": True},
                "statuses": {
                    "id": "PRESENT",
                    "nil": "NULL_VALUE",
                    "gone": "NOT_FOUND",
                },
            }
        ]
    }
    back = pb.decode_response(SVC, M, pb.encode_response(SVC, M, resp))
    fv = back["fieldValues"][0]
    assert fv["fields"]["id"] == {"int64Val": 1}
    assert fv["fields"]["name"] == {"stringVal": "a"}
    assert fv["fields"]["nil"] == {}  # unset Value = NULL_VALUE carrier
    assert fv["fields"]["flag"] == {"boolVal": True}
    assert fv["statuses"]["gone"] == "NOT_FOUND"


def test_serving_info_round_trip():
    info = {"version": "9.9.9", "type": "FEAST_SERVING_TYPE_ONLINE"}
    assert (
        pb.decode_response(
            SVC,
            "GetFeastServingInfo",
            pb.encode_response(SVC, "GetFeastServingInfo", info),
        )
        == info
    )


def test_descriptorless_method_has_no_binary_path():
    # (r16 closed the CoreService gap, so ApplyEntity now HAS
    # descriptors — the fallback contract is pinned on a method that
    # will never carry any)
    assert pb.descriptors_for(SVC, "NoSuchMethod") is None
    assert (
        pb.descriptors_for("feast.transformation.TransformationService", "X")
        is None
    )
    with pytest.raises(pb.ProtoCodecError, match="no binary descriptors"):
        pb.encode_request(SVC, "NoSuchMethod", {})


# ------------------------------------------------------ socket behavior


class EchoServicer:
    """Captures the decoded request and answers a canned response —
    enough to observe the negotiation without Spark."""

    service_name = SVC

    def __init__(self):
        self.seen = None

    def GetOnlineFeaturesV2(self, request, metadata=None):
        self.seen = request
        return {
            "fieldValues": [
                {
                    "fields": {"driver_id": 1, "driver:name": "david"},
                    "statuses": {
                        "driver_id": "PRESENT",
                        "driver:name": "PRESENT",
                    },
                }
            ]
        }

    def GetFeastServingInfo(self, request, metadata=None):
        self.seen = request
        return {"version": "x", "type": "FEAST_SERVING_TYPE_ONLINE"}


@pytest.fixture()
def echo_server():
    servicer = EchoServicer()
    with GrpcHttpServer([servicer]) as srv:
        yield srv, servicer


def test_binary_client_reaches_servicer_with_decoded_dict(echo_server):
    srv, servicer = echo_server
    chan = HttpJsonChannel(srv.host, srv.port, codec="proto")
    client = FeastClient(chan)
    with client:
        rows = client.get_online_features(
            ["driver:name"],
            [
                Row.create()
                .set("driver_id", 1)
                .set_entity_timestamp(dt.datetime(1970, 1, 1, 0, 1, 40))
            ],
            "driver_project",
        )
    # the servicer saw the canonical decoded dict — wrappers, Z stamp
    assert servicer.seen["project"] == "driver_project"
    assert servicer.seen["features"] == [
        {"featureTable": "driver", "name": "name"}
    ]
    assert servicer.seen["entityRows"][0]["fields"] == {
        "driver_id": {"int64Val": 1}
    }
    assert servicer.seen["entityRows"][0]["timestamp"] == "1970-01-01T00:01:40Z"
    # and the Rows match what the JSON codec would deliver
    assert rows[0].get_string("driver:name") == "david"
    assert rows[0].get_status("driver:name") == "PRESENT"


def test_both_codecs_share_one_socket_and_agree(echo_server):
    srv, _ = echo_server
    results = {}
    for codec in ("json", "proto"):
        with FeastClient(
            HttpJsonChannel(srv.host, srv.port, codec=codec)
        ) as client:
            rows = client.get_online_features(
                ["driver:name"], [Row.create().set("driver_id", 1)], "p"
            )
            results[codec] = (
                rows[0].get_fields(),
                rows[0].get_statuses(),
                client.get_feast_serving_info(),
            )
    assert results["json"] == results["proto"]


def test_binary_request_error_body_stays_json(echo_server):
    """A failing call on the binary codec still surfaces the JSON error
    body as a GrpcCallError with the status name — the documented
    trailer-less divergence."""
    srv, _ = echo_server

    class Failing(EchoServicer):
        def GetOnlineFeaturesV2(self, request, metadata=None):
            raise GrpcCallError("INVALID_ARGUMENT", "bad ref")

    with GrpcHttpServer([Failing()]) as fsrv:
        with FeastClient(
            HttpJsonChannel(fsrv.host, fsrv.port, codec="proto")
        ) as client:
            with pytest.raises(GrpcCallError) as ex:
                client.get_online_features(
                    ["driver:name"], [Row.create().set("driver_id", 1)], "p"
                )
    assert ex.value.code == "INVALID_ARGUMENT"
    assert "bad ref" in ex.value.details


def test_malformed_binary_request_is_internal(echo_server):
    """grpcio parity: a request_deserializer failure surfaces INTERNAL
    'Exception deserializing request', not INVALID_ARGUMENT."""
    srv, _ = echo_server
    import http.client as hc

    conn = hc.HTTPConnection(srv.host, srv.port, timeout=30)
    conn.request(
        "POST",
        f"/{SVC}/{M}",
        body=b"\xff\xff\xff\xff",
        headers={"Content-Type": pb.PROTO_CONTENT_TYPE},
    )
    resp = conn.getresponse()
    body = json.loads(resp.read())
    conn.close()
    assert resp.status == 500
    assert body["code"] == "INTERNAL"
    assert "Exception deserializing request" in body["details"]


def test_json_content_type_ignores_binary_path(echo_server):
    """Negotiation is by Content-Type: a JSON request to the same
    method gets a JSON response even though descriptors exist."""
    srv, _ = echo_server
    import http.client as hc

    conn = hc.HTTPConnection(srv.host, srv.port, timeout=30)
    conn.request(
        "POST",
        f"/{SVC}/GetFeastServingInfo",
        body=b"{}",
        headers={"Content-Type": "application/json"},
    )
    resp = conn.getresponse()
    ctype = resp.getheader("Content-Type", "")
    body = json.loads(resp.read())
    conn.close()
    assert resp.status == 200
    assert "json" in ctype
    assert body["version"] == "x"


def test_binary_response_content_type_negotiated(echo_server):
    srv, _ = echo_server
    import http.client as hc

    wire = pb.encode_request(SVC, "GetFeastServingInfo", {})
    conn = hc.HTTPConnection(srv.host, srv.port, timeout=30)
    conn.request(
        "POST",
        f"/{SVC}/GetFeastServingInfo",
        body=wire,
        headers={"Content-Type": pb.PROTO_CONTENT_TYPE},
    )
    resp = conn.getresponse()
    payload = resp.read()
    conn.close()
    assert resp.status == 200
    assert resp.getheader("Content-Type", "").startswith(
        pb.PROTO_CONTENT_TYPE
    )
    decoded = pb.decode_response(SVC, "GetFeastServingInfo", payload)
    assert decoded["version"] == "x"


# ------------------------------------------- review-pass pins (r15)


def test_truncated_fixed_fields_raise_codec_error_not_struct_error():
    """Truncation mid-double must stay inside the ProtoCodecError
    contract (struct.error is not a ValueError and would escape every
    deserializer handler)."""
    wire = pb.encode_message({"doubleVal": 2.5}, pb.VALUE)
    with pytest.raises(pb.ProtoCodecError, match="truncated fixed64"):
        pb.decode_message(wire[:-3], pb.VALUE)
    packed = pb.encode_message({"doubleListVal": {"val": [1.5, 2.5]}}, pb.VALUE)
    with pytest.raises(pb.ProtoCodecError, match="truncated"):
        pb.decode_message(packed[:-2], pb.VALUE)


def test_truncated_unknown_trailing_field_raises():
    """_skip must not run past the buffer: a truncated unknown field is
    corruption, not forward compatibility."""
    known = pb.encode_message({"stringVal": "x"}, pb.VALUE)
    bad = known + pb._write_varint((99 << 3) | 1) + b"\x00\x00"  # fixed64 cut
    with pytest.raises(pb.ProtoCodecError, match="truncated unknown"):
        pb.decode_message(bad, pb.VALUE)


def test_out_of_range_ints_reject_instead_of_wrapping():
    """2**63 silently round-tripping to -2**63 would corrupt an entity
    key (every lookup misses); the codec must reject what the wire
    cannot carry."""
    for bad in (2**63, -(2**63) - 1, 2**64 + 5):
        with pytest.raises(pb.ProtoCodecError, match="out of range"):
            pb.encode_message({"int64Val": bad}, pb.VALUE)
    with pytest.raises(pb.ProtoCodecError, match="out of range"):
        pb.encode_message({"int32Val": 2**31}, pb.VALUE)
    with pytest.raises(pb.ProtoCodecError, match="out of range"):
        pb.encode_message({"int64ListVal": {"val": [1, 2**63]}}, pb.VALUE)
    # boundary values pass
    ok = pb.encode_message({"int64Val": 2**63 - 1}, pb.VALUE)
    assert pb.decode_message(ok, pb.VALUE) == {"int64Val": 2**63 - 1}


def test_unknown_enum_name_is_codec_error_not_keyerror():
    with pytest.raises(pb.ProtoCodecError, match="unknown enum value"):
        pb.encode_response(
            SVC,
            M,
            {"fieldValues": [{"fields": {}, "statuses": {"x": "BOGUS"}}]},
        )
    with pytest.raises(pb.ProtoCodecError, match="unknown enum value"):
        pb.encode_response(
            SVC, "GetFeastServingInfo", {"version": "1", "type": "NOPE"}
        )


def test_oneof_last_wins_on_decode():
    """A non-canonical encoder emitting two arms in one Value: canonical
    protobuf parsers keep only the LAST arm — so must the decoder, or
    both typed getters would answer."""
    two_arms = pb.encode_message({"bytesVal": "AAE="}, pb.VALUE) + pb.encode_message(
        {"stringVal": "late"}, pb.VALUE
    )
    assert pb.decode_message(two_arms, pb.VALUE) == {"stringVal": "late"}
    # and message-kind arms participate too (scalar then list arm)
    scalar_then_list = pb.encode_message(
        {"int64Val": 7}, pb.VALUE
    ) + pb.encode_message({"int64ListVal": {"val": [1]}}, pb.VALUE)
    assert pb.decode_message(scalar_then_list, pb.VALUE) == {
        "int64ListVal": {"val": [1]}
    }


def test_relaxed_request_arms_match_json_transport():
    """String refs, snake_case feature_table, and BARE entity-row field
    maps — everything the JSON servicer accepts — must encode, so the
    two codecs accept the same requests."""
    req = {
        "features": [
            "driver:name",
            {"feature_table": "driver", "name": "rating"},
        ],
        "entityRows": [{"driver_id": 1, "timestamp": 5}],  # bare map
        "project": "p",
    }
    back = pb.decode_request(SVC, M, pb.encode_request(SVC, M, req))
    assert back["features"] == [
        {"featureTable": "driver", "name": "name"},
        {"featureTable": "driver", "name": "rating"},
    ]
    # bare-map semantics: 'timestamp' stays an ENTITY FIELD (int64Val),
    # exactly like _parse_entity_rows' bare-map rule
    assert back["entityRows"][0]["fields"] == {
        "driver_id": {"int64Val": 1},
        "timestamp": {"int64Val": 5},
    }
    assert "timestamp" not in {
        k for k in back["entityRows"][0] if k != "fields"
    }


def test_timestamp_integer_arithmetic_round_trip():
    """Integer timedelta math: exact at any epoch (float64 ULP exceeds
    1us beyond ~2**33 seconds)."""
    for iso, want_s, want_ns in (
        ("1970-01-01T00:01:40", 100, 0),
        ("2242-03-16T12:56:31.999999", 8589934591, 999999000),
        ("1969-12-31T23:59:59.500000", -1, 500000000),  # floored seconds
    ):
        s, ns = pb._ts_to_parts(iso)
        assert (s, ns) == (want_s, want_ns), iso
    wire = pb.encode_message(
        {"timestamp": "2242-03-16T12:56:31.999999", "fields": {}},
        pb.ENTITY_ROW,
    )
    back = pb.decode_message(wire, pb.ENTITY_ROW)
    assert back["timestamp"] == "2242-03-16T12:56:31.999999Z"


def test_health_check_binary_round_trip_and_socket():
    """grpc.health.v1.Health — the other service the reference binds on
    its serving gRPC socket — rides the binary codec too."""
    req = {"service": "feast.serving.ServingService"}
    wire = pb.encode_request("grpc.health.v1.Health", "Check", req)
    assert pb.decode_request("grpc.health.v1.Health", "Check", wire) == req
    resp = {"status": "SERVING"}
    w = pb.encode_response("grpc.health.v1.Health", "Check", resp)
    # ServingStatus.SERVING = 1 → field 1 varint 1
    assert w == bytes([0x08, 0x01])
    assert pb.decode_response("grpc.health.v1.Health", "Check", w) == resp

    class Health:
        service_name = "grpc.health.v1.Health"

        def Check(self, request, metadata=None):
            return {"status": "SERVING" if request.get("service") else "NOT_SERVING"}

    import http.client as hc

    with GrpcHttpServer([Health()]) as srv:
        conn = hc.HTTPConnection(srv.host, srv.port, timeout=30)
        conn.request(
            "POST",
            "/grpc.health.v1.Health/Check",
            body=wire,
            headers={"Content-Type": pb.PROTO_CONTENT_TYPE},
        )
        resp_http = conn.getresponse()
        payload = resp_http.read()
        conn.close()
    assert resp_http.status == 200
    assert pb.decode_response("grpc.health.v1.Health", "Check", payload) == {
        "status": "SERVING"
    }


def test_snake_case_and_bare_list_value_arms_encode():
    """ADVICE r16 (medium): dict Value wrappers on the relaxed surface —
    snake_case arm names ({"int64_val": 7}) and bare-array list arms
    ({"int64ListVal": [1, 2]}) — are accepted by the JSON servicer's
    _unwrap_value AND whitelisted by sdk.Row.set, so the proto channel
    must canonicalize them instead of raising ProtoCodecError (a Row
    the SDK validated as legal must not fail only when codec="proto")."""
    req = {
        "features": [{"featureTable": "t", "name": "f"}],
        "entityRows": [
            {
                "fields": {
                    "a": {"int64_val": 7},
                    "b": {"int64ListVal": [1, 2]},
                    "c": {"string_list_val": ["x", "y"]},
                    "d": {"double_val": 1.5},
                }
            }
        ],
        "project": "p",
    }
    back = pb.decode_request(SVC, M, pb.encode_request(SVC, M, req))
    assert back["entityRows"][0]["fields"] == {
        "a": {"int64Val": 7},
        "b": {"int64ListVal": {"val": [1, 2]}},
        "c": {"stringListVal": {"val": ["x", "y"]}},
        "d": {"doubleVal": 1.5},
    }


def test_truncated_map_entry_value_raises():
    """ADVICE r16 (low): a map-entry embedded-message value whose
    declared length overruns the entry must raise, not silently decode
    the short slice and drop the remaining entry fields."""
    # EntityRow.fields map entry: key "a" + Value message with declared
    # length 10 but only 2 payload bytes (int64Val=1)
    entry = b"\x0a\x01a" + b"\x12\x0a" + b"\x20\x01"
    wire = b"\x12" + bytes([len(entry)]) + entry
    with pytest.raises(pb.ProtoCodecError, match="truncated map entry value"):
        pb.decode_message(wire, pb.ENTITY_ROW)


def test_timestamp_out_of_range_is_codec_error():
    """ADVICE r16 (low): fromtimestamp raises OSError/OverflowError for
    out-of-range seconds — those must surface as ProtoCodecError so the
    channel decode handlers map them to GrpcCallError('INTERNAL')
    instead of leaking a raw OSError to the application."""
    for seconds in (2**60, -(2**60)):
        with pytest.raises(pb.ProtoCodecError, match="Timestamp out of range"):
            pb._parts_to_ts(seconds, 0)
    # end-to-end: a wire Timestamp with absurd seconds decodes to the
    # same contracted error (field 1 varint inside EntityRow.timestamp)
    ts_payload = b"\x08" + b"\x80" * 9 + b"\x10"  # 10-byte varint, huge
    wire = b"\x0a" + bytes([len(ts_payload)]) + ts_payload
    with pytest.raises(pb.ProtoCodecError):
        pb.decode_message(wire, pb.ENTITY_ROW)


def test_non_numeric_scalar_payloads_raise_codec_error():
    """r16 review: int()/float() on a non-numeric oneof payload (a list
    inside a scalar arm passes Row.set's name-only whitelist) must
    raise the contracted ProtoCodecError, not a bare TypeError the
    channel handlers don't catch."""
    for bad in ({"int64Val": [1, 2]}, {"int32Val": {"x": 1}}):
        with pytest.raises(pb.ProtoCodecError, match="non-numeric"):
            pb.encode_message(bad, pb.VALUE)
    with pytest.raises(pb.ProtoCodecError, match="non-numeric"):
        pb.encode_message({"doubleVal": "xyz"}, pb.VALUE)
    with pytest.raises(pb.ProtoCodecError, match="non-numeric"):
        pb.encode_message({"doubleListVal": {"val": [1.5, None]}}, pb.VALUE)


# ------------------------------------------- compiled-codec pins (r16)
# The encode/decode entry points dispatch to per-descriptor compiled
# closures with a generic fallback for non-canonical wire forms. These
# pin the wire shapes that must route through (or around) the fallback.


def test_unpacked_repeated_scalars_decode_via_fallback():
    """An old encoder may emit repeated scalars UNPACKED (one varint
    tag per element). That wire type bypasses the compiled packed
    handler and must decode identically through the generic fallback —
    including a mixed packed + unpacked run appending in order."""
    unpacked = bytes([0x08, 0x07, 0x08, 0x96, 0x01])  # val=7, val=150
    assert pb.decode_message(unpacked, pb._INT64_LIST) == {"val": [7, 150]}
    packed = pb.encode_message({"val": [1, 2]}, pb._INT64_LIST)
    assert pb.decode_message(
        packed + bytes([0x08, 0x03]), pb._INT64_LIST
    ) == {"val": [1, 2, 3]}


def test_map_entry_noncanonical_order_and_unknown_fields():
    """The spec does not require key(1)-then-value(2) order inside a
    map entry, and unknown entry fields must skip — both shapes decode
    to the same entry (the latter through the generic entry reparse)."""
    key_part = bytes([0x0A, 0x02]) + b"id"
    val_part = bytes([0x12, 0x02, 0x20, 0x01])  # Value{int64Val: 1}
    unknown_part = bytes([0x18, 0x05])  # entry field 3 varint — skipped
    for entry in (val_part + key_part, key_part + unknown_part + val_part):
        wire = bytes([0x12, len(entry)]) + entry
        assert pb.decode_message(wire, pb.ENTITY_ROW) == {
            "fields": {"id": {"int64Val": 1}}
        }


def test_scalar_map_default_value_round_trips():
    """map<string, string> with a default-valued entry: the value
    elides on encode (plain-field default rules) and the decoder's
    absent-value fill restores it."""
    from feast_java_old_spark.transport import protobin_core as pbc

    obj = {"fieldMapping": {"a": "x", "b": ""}}
    wire = pb.encode_message(obj, pbc.DATA_SOURCE)
    assert pb.decode_message(wire, pbc.DATA_SOURCE) == obj


def test_mixed_oneof_message_last_wins_keeps_plain_fields():
    """A message with both plain fields and a oneof group: last-wins
    clears only the OTHER arms, never the plain fields (only an
    all-oneof message like Value may clear the whole dict)."""
    from feast_java_old_spark.transport import protobin_core as pbc

    first = pb.encode_message(
        {"type": "BATCH_FILE", "fileOptions": {"fileUrl": "file:///x"}},
        pbc.DATA_SOURCE,
    )
    second = pb.encode_message(
        {"kafkaOptions": {"topic": "t"}}, pbc.DATA_SOURCE
    )
    decoded = pb.decode_message(first + second, pbc.DATA_SOURCE)
    assert decoded == {"type": "BATCH_FILE", "kafkaOptions": {"topic": "t"}}
