"""Python client SDK — the ``sdk/java`` module (``com.gojek.feast``).

Parity targets:

- ``FeastClient`` (``sdk/java/src/main/java/com/gojek/feast/
  FeastClient.java:45-211``): ``create`` / ``create_secure``
  constructors, ``get_feast_serving_info``, ``get_online_features``
  (refs + entity Rows + optional project → Rows with values AND
  statuses, :152-189), per-call credential attachment (:191-204),
  ``close`` (:206-210).
- ``Row`` (``Row.java:33-161``): ``create()`` stamping the entity
  timestamp "now" (:38-44), the two ``setEntityTimestamp`` overloads
  (:46-58), the value type switch in ``set`` (:60-98), the six typed
  getters with proto-default extraction (:104-126), ``get_fields`` /
  ``get_statuses`` / ``get_status``, and ``__str__``'s ``NULL`` for
  unset values (:136-148).
- ``RequestUtil`` (``RequestUtil.java:24-80``): ``create_feature_refs``
  with the reference's exact error messages — null list rejected
  (:33-35), empty ref (:53-55), project-qualified ref (:56-62), no
  ``:`` separator (:63-69) — and the quirk that a ref with EXTRA
  ``:`` segments silently keeps only the first two (``split(":")``
  then parts[0]/parts[1], :71-76).
- ``SecurityConfig`` (``SecurityConfig.java:25-66``): optional call
  credentials, TLS toggle, optional certificate path — defaults
  credentials-absent / TLS-off / path-absent (:60-65).

Transport: the reference client is a gRPC blocking stub over a
``ManagedChannel``. grpcio is absent here, so the default channel is
:class:`HttpJsonChannel` — the client half of
:class:`~feast_java_old_spark.transport.grpc_http.GrpcHttpServer`,
which serves the SAME servicer seam at the SAME method paths
(``/feast.serving.ServingService/GetOnlineFeaturesV2``) with the
seam's documented JSON codec. Credentials attach as the
``Authorization: Bearer`` header — byte-identical to what the
reference's ``CallCredentials`` put on the wire
(``JwtCallCredentials.java:27-49`` via ``registry.credentials``).
When grpcio exists, :func:`grpc_channel` yields the real-channel
twin over ``build_server``'s JSON-codec handlers.

Values ride proto-JSON ``Value`` wrappers (``{"int64Val": 7}``) in
requests — the serving side unwraps them (``plans/serving_rest.py``
``_unwrap_value``) — and come back as native JSON scalars, so a
response Row's oneof arm is inferred from the JSON type (int →
int64Val, float → doubleVal, str → stringVal): the documented
JSON-instead-of-protobuf divergence of the whole transport layer.
"""

from __future__ import annotations

import datetime as dt
import http.client
import json
import ssl
from dataclasses import dataclass
from typing import Optional, Sequence, Union

from feast_java_old_spark.registry.credentials import CallCredentials
from feast_java_old_spark.transport.grpc_adapter import (
    HAVE_GRPC,
    SERVING_SERVICE,
    GrpcCallError,
)
from feast_java_old_spark.transport.grpc_http import HTTP_GRPC_STATUS
from feast_java_old_spark.transport.keepalive import KeepAliveHttpMixin

# GetOnlineFeaturesResponse.FieldStatus names.
PRESENT = "PRESENT"
NULL_VALUE = "NULL_VALUE"
NOT_FOUND = "NOT_FOUND"
OUTSIDE_MAX_AGE = "OUTSIDE_MAX_AGE"

_UNSUPPORTED_TYPE_MSG = (
    "Type '{}' is unsupported in Feast. Please use one of these value "
    "types: Integer, Long, Float, Double, String, byte[]."
)

# Every Value oneof arm name the proto-JSON codec can carry — the
# canonical lowerCamel names plus the snake_case twins the server's
# ``_unwrap_value`` also accepts. Used to validate the ``Row.set``
# dict-passthrough arm: Java's passthrough case is TYPED
# (``ValueProto.Value``), so an arbitrary dict must at least LOOK like
# a Value wrapper or the client rejects it before it ships.
_VALUE_ARMS = frozenset(
    arm
    for base in ("bytes", "string", "int32", "int64", "double", "float", "bool")
    for arm in (
        f"{base}Val",
        f"{base}_val",
        f"{base}ListVal",
        f"{base}_list_val",
    )
)

# proto3 scalar defaults per oneof arm — what ``Value::get<Arm>Val``
# returns when a DIFFERENT arm is set (only VAL_NOT_SET yields null).
_PROTO_DEFAULT = {
    "int32Val": 0,
    "int64Val": 0,
    "floatVal": 0.0,
    "doubleVal": 0.0,
    "stringVal": "",
    "bytesVal": b"",
}


class Row:
    """``Row.java:33-161`` — a mutable bag of named proto-JSON
    ``Value`` wrappers plus per-field statuses, used both to SEND
    entity keys and to RECEIVE retrieved features."""

    def __init__(self) -> None:
        self._entity_timestamp: Optional[dt.datetime] = None
        self._fields: dict[str, dict] = {}
        self._statuses: dict[str, str] = {}

    @classmethod
    def create(cls) -> "Row":
        """``Row.create():38-44`` — entity timestamp defaults to now
        (``Timestamps.fromMillis(System.currentTimeMillis())``)."""
        row = cls()
        row._entity_timestamp = dt.datetime.now(dt.timezone.utc).replace(
            tzinfo=None
        )
        return row

    # -- entity timestamp (:46-58) --------------------------------------
    def set_entity_timestamp(self, timestamp: Union[dt.datetime, str]) -> "Row":
        """Both Java overloads: an Instant (datetime) or an ISO-8601
        string (``Instant.parse``)."""
        if isinstance(timestamp, str):
            timestamp = dt.datetime.fromisoformat(
                timestamp.replace("Z", "+00:00")
            )
        if not isinstance(timestamp, dt.datetime):
            raise TypeError(
                "entity timestamp must be a datetime or ISO-8601 string"
            )
        if timestamp.tzinfo is not None:
            timestamp = timestamp.astimezone(dt.timezone.utc).replace(
                tzinfo=None
            )
        self._entity_timestamp = timestamp
        return self

    def get_entity_timestamp(self) -> Optional[dt.datetime]:
        return self._entity_timestamp

    # -- setters (:60-98) ------------------------------------------------
    def set(self, field_name: str, value, status: str = PRESENT) -> "Row":
        """The value type switch (:64-94). Python's numeric model maps
        onto the Java cases as: ``int`` → Long/int64Val, ``float`` →
        Double/doubleVal (Python has no 32-bit scalars; pass an
        explicit wrapper dict like ``{"int32Val": 7}`` — the Java
        ``Value`` passthrough case :86-87 — to pin a narrower arm).
        ``None`` stores the UNSET ``Value`` (what the reference's
        response mapper puts for NULL_VALUE fields,
        ``FeastClientTest.java:184``). ``bool`` has no Java case and is
        rejected before the int check (Python ``bool`` subclasses
        ``int``)."""
        if value is None:
            self._fields[field_name] = {}
        elif isinstance(value, bool):
            raise ValueError(_UNSUPPORTED_TYPE_MSG.format("bool"))
        elif isinstance(value, int):
            self._fields[field_name] = {"int64Val": value}
        elif isinstance(value, float):
            self._fields[field_name] = {"doubleVal": value}
        elif isinstance(value, str):
            self._fields[field_name] = {"stringVal": value}
        elif isinstance(value, (bytes, bytearray)):
            self._fields[field_name] = {"bytesVal": bytes(value)}
        elif isinstance(value, dict):
            # the Value passthrough case (:86-87). Java's passthrough is
            # typed (``ValueProto.Value``); the JSON analog validates
            # the dict IS a Value wrapper — empty (unset) or exactly one
            # known oneof arm — so a typo'd arm ({"int64val": 7}) fails
            # loudly client-side instead of being served as NOT_FOUND-
            # shaped garbage.
            if value and (
                len(value) != 1 or next(iter(value)) not in _VALUE_ARMS
            ):
                raise ValueError(
                    _UNSUPPORTED_TYPE_MSG.format(
                        "Value{" + ", ".join(sorted(map(str, value))) + "}"
                    )
                )
            self._fields[field_name] = value
        else:
            raise ValueError(
                _UNSUPPORTED_TYPE_MSG.format(type(value).__name__)
            )
        self._statuses[field_name] = status
        return self

    # -- getters (:100-134) ----------------------------------------------
    def get_fields(self) -> dict[str, dict]:
        return self._fields

    def _value(self, field_name: str) -> Optional[dict]:
        """``getValue:150-160``: missing field raises; an UNSET value
        (no oneof arm) is None."""
        if field_name not in self._fields:
            raise ValueError(
                f"Row does not contain field '{field_name}'"
            )
        wrapper = self._fields[field_name]
        return wrapper if wrapper else None

    def _get(self, field_name: str, arm: str, *sibling_arms: str):
        """Typed getter semantics: None when unset; the arm's value when
        that arm is set; the PROTO DEFAULT when an unrelated arm is set
        (``Value::getInt32Val`` on a string-valued proto returns 0, not
        null — the reference getters inherit that). ``sibling_arms``
        are same-family arms the JSON codec widens into (JSON has one
        integer and one float type, so an INT32 feature arrives as
        ``int64Val`` and a FLOAT as ``doubleVal``) — reading the
        sibling returns the actual served value instead of silently
        yielding the cross-arm proto default."""
        wrapper = self._value(field_name)
        if wrapper is None:
            return None
        if arm in wrapper:
            return wrapper[arm]
        for sib in sibling_arms:
            if sib in wrapper:
                return wrapper[sib]
        return _PROTO_DEFAULT[arm]

    def get_int(self, field_name: str):
        return self._get(field_name, "int32Val", "int64Val")

    def get_long(self, field_name: str):
        return self._get(field_name, "int64Val", "int32Val")

    def get_float(self, field_name: str):
        return self._get(field_name, "floatVal", "doubleVal")

    def get_double(self, field_name: str):
        return self._get(field_name, "doubleVal", "floatVal")

    def get_string(self, field_name: str):
        return self._get(field_name, "stringVal")

    @staticmethod
    def _b64_or_default(payload: str) -> bytes:
        """STRICT base64 decode, both alphabets — the client half of
        the server's ``_b64`` contract (canonical proto3 JSON permits
        standard AND URL-safe): a lenient decode would silently discard
        stray characters and return garbage bytes, and a standard-only
        decode would disagree with the server on a URL-safe payload.
        Malformed payloads yield the proto default ``b""`` exactly as a
        cross-arm read would."""
        import base64
        import binascii

        for altchars in (None, b"-_"):
            try:
                return base64.b64decode(payload, altchars=altchars, validate=True)
            except (binascii.Error, ValueError):
                continue
        return b""

    def get_bytes(self, field_name: str):
        """``getByte:124-126`` (sic — the reference's name for the
        byte[] getter). JSON transports render bytes base64 — a
        bytes-typed FEATURE arrives indistinguishable from a string
        (the arm is re-inferred from the JSON type), so when only
        ``stringVal`` is set this getter base64-decodes it, and a
        client-built passthrough wrapper may likewise carry bytesVal as
        a base64 string; both paths share :meth:`_b64_or_default`."""
        v = self._get(field_name, "bytesVal")
        if v == b"":
            wrapper = self._value(field_name)
            if wrapper is not None and "stringVal" in wrapper:
                return self._b64_or_default(wrapper["stringVal"])
        if isinstance(v, str):
            return self._b64_or_default(v)
        return v

    def get_bool(self, field_name: str):
        """Engine extension beyond Row.java's six getters: the Value
        proto carries a ``boolVal`` arm the reference's response mapper
        CAN deliver (its all-14-types IT serves BOOL features,
        ``ServingServiceBigTableIT.java:691-801``) even though the Java
        Row never grew a getter for it."""
        wrapper = self._value(field_name)
        if wrapper is None:
            return None
        return wrapper.get("boolVal", False)

    def get_list(self, field_name: str):
        """Engine extension: the payload of whichever ``*ListVal`` arm
        is set (``{"int64ListVal": {"val": [...]}}`` → ``[...]``), None
        when the value is unset, the proto default ``[]`` when a
        non-list arm is set — list-typed features are first-class in
        the reference's serve (all-14-types IT), and the JSON codec
        delivers them as arrays."""
        wrapper = self._value(field_name)
        if wrapper is None:
            return None
        for key, inner in wrapper.items():
            if key.endswith("ListVal"):
                if isinstance(inner, dict):
                    return inner.get("val", [])
                return inner
        return []

    def get_statuses(self) -> dict[str, str]:
        return self._statuses

    def get_status(self, field_name: str) -> Optional[str]:
        return self._statuses.get(field_name)

    def __str__(self) -> str:  # Row.toString():136-148
        from feast_java_old_spark.transport.http import _json_default

        parts = []
        for key, wrapper in self._fields.items():
            parts.append(
                f"{key}:"
                + (
                    "NULL"
                    if not wrapper
                    # base64 for bytesVal, like proto-JSON renders bytes
                    else json.dumps(wrapper, default=_json_default)
                )
            )
        return ", ".join(parts)

    __repr__ = __str__


def _wrap_response_value(v) -> dict:
    """Native JSON response value → proto-JSON ``Value`` wrapper.

    The reference's response mapper stores the wire's ``Value`` proto
    into the Row VERBATIM (the ``set`` passthrough arm,
    ``FeastClient.java:180-185`` → ``Row.java:86-87``) — it never runs
    the scalar type switch, so list/bool-valued features flow through
    untouched. Over the JSON codec the arm must be re-inferred from the
    JSON type: bool → boolVal (checked before int — Python bool
    subclasses int), int → int64Val, float → doubleVal, str →
    stringVal, list → the element-inferred ``*ListVal`` arm (any float
    element promotes to doubleListVal; an EMPTY list defaults to
    stringListVal — proto-JSON without a schema cannot distinguish
    empty list arms, documented divergence of the JSON transport)."""
    if v is None:
        return {}
    if isinstance(v, dict):
        return v  # already a wrapper (proto-JSON server)
    if isinstance(v, bool):
        return {"boolVal": v}
    if isinstance(v, int):
        return {"int64Val": v}
    if isinstance(v, float):
        return {"doubleVal": v}
    if isinstance(v, str):
        return {"stringVal": v}
    if isinstance(v, (bytes, bytearray)):
        return {"bytesVal": bytes(v)}
    if isinstance(v, list):
        if v and all(isinstance(x, bool) for x in v):
            arm = "boolListVal"
        elif v and all(isinstance(x, int) and not isinstance(x, bool) for x in v):
            arm = "int64ListVal"
        elif v and all(
            isinstance(x, (int, float)) and not isinstance(x, bool) for x in v
        ):
            arm = "doubleListVal"
        elif v and all(isinstance(x, str) for x in v):
            arm = "stringListVal"
        else:
            arm = "stringListVal"  # empty/mixed: arm unknowable from JSON
        return {arm: {"val": list(v)}}
    raise ValueError(_UNSUPPORTED_TYPE_MSG.format(type(v).__name__))


# ----------------------------------------------------------- RequestUtil


def parse_feature_ref(feature_ref_string: str) -> dict:
    """``RequestUtil.parseFeatureRef:51-79`` with the reference's exact
    messages — returns the proto-JSON ``FeatureReferenceV2`` dict."""
    feature_ref_string = feature_ref_string.strip()
    if not feature_ref_string:
        raise ValueError("Cannot parse a empty feature reference")
    if "/" in feature_ref_string:
        raise ValueError(
            "Unsupported feature reference: Specifying project in string"
            f" Feature References is not longer supported: {feature_ref_string}"
        )
    if ":" not in feature_ref_string:
        raise ValueError(
            f"Unsupported feature reference: {feature_ref_string} - "
            "FeatureTable name and Feature name should be provided in "
            "string Feature References, in <featureTableName>:<featureName>"
            " format."
        )
    # Java `split(":")` + parts[0]/parts[1], quirks included: Java's
    # split DROPS trailing empty segments, so "t:" → ["t"] → no
    # parts[1] → fails, while "t::f" → ["t", "", "f"] → a reference
    # with an EMPTY feature name is silently built and sent (the
    # server's RequestHelper rejects it); extra segments are dropped.
    parts = feature_ref_string.split(":")
    while parts and parts[-1] == "":
        parts.pop()  # Java split semantics: trailing empties removed
    if len(parts) < 2:
        raise ValueError(
            f"Unsupported feature reference: {feature_ref_string} - "
            "FeatureTable name and Feature name should be provided in "
            "string Feature References, in <featureTableName>:<featureName>"
            " format."
        )
    return {"featureTable": parts[0], "name": parts[1]}


def create_feature_refs(feature_ref_strings) -> list[dict]:
    """``RequestUtil.createFeatureRefs:32-43``."""
    if feature_ref_strings is None:
        raise ValueError("FeatureReferences cannot be null")
    return [parse_feature_ref(s) for s in feature_ref_strings]


# -------------------------------------------------------- SecurityConfig


@dataclass
class SecurityConfig:
    """``SecurityConfig.java:25-66``: builder defaults = no
    credentials, TLS disabled, no certificate path (:60-65)."""

    credentials: Optional[CallCredentials] = None
    tls_enabled: bool = False
    certificate_path: Optional[str] = None


# ---------------------------------------------------------------- channels


class HttpJsonChannel(KeepAliveHttpMixin):
    """The ``ManagedChannel`` analog over the gRPC-over-HTTP binding:
    one persistent keep-alive connection (reconnected transparently if
    the server closed it), unary calls at ``/<service>/<Method>``.
    Dial/retry/thread-safety discipline lives in
    :class:`~feast_java_old_spark.transport.keepalive.
    KeepAliveHttpMixin` (shared with the transform-service client).

    TLS wiring mirrors ``FeastClient.createSecure:75-103``: a custom
    certificate path builds a trust context from that file — an
    unloadable file raises ``Invalid Certificate provided at path``
    (:89-92) — otherwise the system trust store; TLS off is plaintext
    (:99)."""

    def __init__(
        self,
        host: str,
        port: int,
        tls_enabled: bool = False,
        certificate_path: Optional[str] = None,
        timeout: float = 30.0,
        codec: str = "json",
    ) -> None:
        # codec="proto": methods with registered binary descriptors
        # (the ServingService data plane — transport.protobin) ride
        # canonical proto3 BINARY wire format end-to-end; methods
        # without descriptors, and all error bodies, stay JSON. The
        # default remains the seam's documented JSON codec.
        if codec not in ("json", "proto"):
            raise ValueError(f"unknown codec {codec!r}")
        self.codec = codec
        self.host = host
        self.port = port
        self.timeout = timeout
        self._init_keepalive()
        self._context: Optional[ssl.SSLContext] = None
        if tls_enabled:
            if certificate_path is not None:
                try:
                    self._context = ssl.create_default_context(
                        cafile=certificate_path
                    )
                except (OSError, ssl.SSLError) as ex:
                    raise ValueError(
                        "Invalid Certificate provided at path: "
                        f"{certificate_path}"
                    ) from ex
            else:
                self._context = ssl.create_default_context()

    def _dial(self) -> http.client.HTTPConnection:
        if self._context is not None:
            return http.client.HTTPSConnection(
                self.host,
                self.port,
                timeout=self.timeout,
                context=self._context,
            )
        return http.client.HTTPConnection(
            self.host, self.port, timeout=self.timeout
        )

    def unary(
        self,
        service: str,
        method: str,
        request: dict,
        headers: Optional[dict[str, str]] = None,
    ) -> dict:
        """One RPC. Raises :class:`GrpcCallError` on a non-OK status,
        reading the status name from the error body (falling back to
        the canonical HTTP→gRPC row for bodyless failures)."""
        from feast_java_old_spark.transport import protobin
        from feast_java_old_spark.transport.http import encode_json

        binary = (
            self.codec == "proto"
            and protobin.descriptors_for(service, method) is not None
        )
        if binary:
            body = protobin.encode_request(service, method, request)
            hdrs = {"Content-Type": protobin.PROTO_CONTENT_TYPE}
        else:
            # encode_json carries the transport's Jackson-parity
            # fallbacks: bytesVal payloads render base64 (canonical
            # proto-JSON bytes), datetimes ISO-8601 — same codec the
            # server side emits.
            body = encode_json(request)
            hdrs = {"Content-Type": "application/json"}
        if headers:
            hdrs.update(headers)
        # mutation-safe retry + poison-proof close discipline: see
        # transport.keepalive.KeepAliveHttpMixin.
        resp, payload = self._post(f"/{service}/{method}", body, hdrs)
        # same media-type parse as the server's negotiation (strip too:
        # an intermediary may pad whitespace before the ; parameter)
        resp_ctype = (
            (resp.getheader("Content-Type", "") or "").split(";")[0].strip()
        )
        if resp.status == 200 and resp_ctype == protobin.PROTO_CONTENT_TYPE:
            try:
                return protobin.decode_response(service, method, payload)
            except (protobin.ProtoCodecError, ValueError) as ex:
                raise GrpcCallError(
                    "INTERNAL", f"Exception deserializing response: {ex}"
                ) from ex
        try:
            decoded = json.loads(payload) if payload else {}
        except json.JSONDecodeError:
            decoded = {}
        if resp.status != 200:
            code = (
                decoded.get("code")
                if isinstance(decoded, dict) and decoded.get("code")
                else HTTP_GRPC_STATUS.get(resp.status, "UNKNOWN")
            )
            details = (
                decoded.get("details", "")
                if isinstance(decoded, dict)
                else ""
            )
            raise GrpcCallError(code, details or f"HTTP {resp.status}")
        return decoded

    # close() comes from KeepAliveHttpMixin


class GrpcChannel:
    """Real-channel twin when grpcio exists: unary calls over a
    ``grpc.Channel`` against :func:`~feast_java_old_spark.transport.
    grpc_adapter.build_server`'s generic handlers — JSON by default,
    canonical proto3 BINARY with ``codec="proto"`` for methods carrying
    binary descriptors (pair with a ``build_server(codec="proto")``).
    Import-guarded the same way the server half is."""

    def __init__(self, target: str, codec: str = "json") -> None:
        if not HAVE_GRPC:  # pragma: no cover - grpcio absent here
            raise ImportError(
                "grpcio is not installed — use HttpJsonChannel against "
                "transport.grpc_http.GrpcHttpServer instead"
            )
        import grpc

        if codec not in ("json", "proto"):
            raise ValueError(f"unknown codec {codec!r}")
        self.codec = codec
        self._channel = grpc.insecure_channel(target)

    def unary(self, service, method, request, headers=None):  # pragma: no cover
        import grpc

        from feast_java_old_spark.transport import protobin
        from feast_java_old_spark.transport.http import encode_json

        metadata = tuple((k.lower(), v) for k, v in (headers or {}).items())
        pair = protobin.descriptors_for(service, method)
        if self.codec == "proto" and pair is not None:
            fn = self._channel.unary_unary(
                f"/{service}/{method}",
                request_serializer=lambda r: protobin.encode_request(
                    service, method, r
                ),
                response_deserializer=lambda b: protobin.decode_response(
                    service, method, b or b""
                ),
            )
        else:
            fn = self._channel.unary_unary(
                f"/{service}/{method}",
                # encode_json, NOT plain json.dumps: bytes-bearing
                # payloads (bytesVal entity keys) and datetimes must
                # serialize the same way on both channel twins.
                request_serializer=encode_json,
                response_deserializer=lambda b: json.loads(b or b"{}"),
            )
        try:
            return fn(request, metadata=metadata)
        except grpc.RpcError as ex:
            # channel-agnostic error surface: both twins raise
            # GrpcCallError on a non-OK status (HttpJsonChannel maps the
            # HTTP row; here the code name comes off the RpcError).
            code = getattr(ex, "code", lambda: None)()
            details = getattr(ex, "details", lambda: "")() or str(ex)
            raise GrpcCallError(
                code.name if code is not None else "UNKNOWN", details
            ) from ex

    def close(self) -> None:  # pragma: no cover
        self._channel.close()


# -------------------------------------------------------------- the client


class FeastClient:
    """``FeastClient.java:45-211`` over a channel + optional call
    credentials. Context manager (`AutoCloseable` analog)."""

    def __init__(
        self,
        channel,
        credentials: Optional[CallCredentials] = None,
    ) -> None:
        # FeastClient(ManagedChannel, Optional<CallCredentials>):191-204
        self._channel = channel
        self._credentials = credentials

    @staticmethod
    def create(host: str, port: int) -> "FeastClient":
        """``create:60-63`` — no security config."""
        return FeastClient.create_secure(host, port, SecurityConfig())

    @staticmethod
    def create_secure(
        host: str, port: int, security_config: SecurityConfig
    ) -> "FeastClient":
        """``createSecure:75-103``: TLS / custom-cert / plaintext
        channel plus the config's credentials."""
        channel = HttpJsonChannel(
            host,
            port,
            tls_enabled=security_config.tls_enabled,
            certificate_path=security_config.certificate_path,
        )
        return FeastClient(channel, security_config.credentials)

    def _call_headers(self) -> dict[str, str]:
        if self._credentials is None:
            return {}
        return self._credentials.apply_request_metadata()

    def get_feast_serving_info(self) -> dict:
        """``getFeastServingInfo:110-112``."""
        return self._channel.unary(
            SERVING_SERVICE,
            "GetFeastServingInfo",
            {},
            headers=self._call_headers(),
        )

    def get_online_features(
        self,
        feature_refs: Sequence[str],
        rows: Sequence[Row],
        project: str = "",
    ) -> list[Row]:
        """``getOnlineFeatures:152-189``: parse refs (RequestUtil),
        build entity rows from the input Rows (fields + entity
        timestamp), call GetOnlineFeaturesV2, map each response
        FieldValues back into a Row carrying values AND statuses."""
        features = create_feature_refs(feature_refs)
        entity_rows = []
        for row in rows:
            er: dict = {"fields": row.get_fields()}
            ts = row.get_entity_timestamp()
            if ts is not None:
                er["timestamp"] = ts.isoformat()
            entity_rows.append(er)
        response = self._channel.unary(
            SERVING_SERVICE,
            "GetOnlineFeaturesV2",
            {
                "features": features,
                "entityRows": entity_rows,
                "project": project,
            },
            headers=self._call_headers(),
        )
        out = []
        for field_values in response.get("fieldValues", []):
            # Row.create(), not Row(): the reference's response mapper
            # builds each returned row via Row.create()
            # (FeastClient.java:180), so get_entity_timestamp() on a
            # response row reads a now-stamp, never null.
            row = Row.create()
            statuses = field_values.get("statuses", {})
            for name, value in field_values.get("fields", {}).items():
                # the reference stores the wire Value verbatim via the
                # set() passthrough arm (:180-185) — never the scalar
                # switch, so bool/list-valued features survive. Wrap
                # the JSON value back into its Value arm first.
                row.set(name, _wrap_response_value(value), statuses.get(name))
            out.append(row)
        return out

    def close(self) -> None:
        self._channel.close()

    def __enter__(self) -> "FeastClient":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
