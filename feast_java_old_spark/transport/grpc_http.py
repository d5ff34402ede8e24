"""JSON-over-HTTP binding of the gRPC seam — a real socket today.

The adapters in :mod:`~feast_java_old_spark.transport.grpc_adapter`
implement every reference RPC surface (core, serving, health,
transformation) as transport-independent servicers; grpcio being absent
from this environment, :func:`~feast_java_old_spark.transport.
grpc_adapter.build_server` cannot bind them. This module binds the SAME
servicers to the r12 stdlib HTTP transport instead, preserving the gRPC
addressing scheme so a client written against the seam works unchanged
the day grpcio appears:

- method path ``POST /<service_name>/<Method>`` — exactly the path
  ``build_server`` registers (``/feast.serving.ServingService/
  GetOnlineFeaturesV2``),
- request/response = JSON bytes by default (the seam's documented
  codec divergence; service names, method names, unary-unary shapes
  and status codes are the reference's) — OR canonical proto3 BINARY
  for methods with registered descriptors (the ServingService data
  plane, :mod:`~feast_java_old_spark.transport.protobin`), negotiated
  per request by ``Content-Type: application/x-protobuf``; both codecs
  share one socket,
- call metadata = HTTP headers, lower-cased — how the seam's
  ``auth_from_metadata`` reads the ``authorization`` bearer, and how
  gRPC itself transports ASCII metadata over HTTP/2,
- failures = the gRPC status name mapped through the canonical
  gRPC↔HTTP table (the grpc-gateway mapping), with a
  ``{"code": <STATUS_NAME>, "details": <msg>}`` body the client turns
  back into a :class:`~feast_java_old_spark.transport.grpc_adapter.
  GrpcCallError`.

``interceptor`` is the ``ServerInterceptor`` analog (the reference's
SDK test registers one to observe the ``Authorization`` header —
``FeastClientTest.java:75-87``): called before every dispatch with
``(method_path, metadata)``; raising ``GrpcCallError`` aborts the call
with that status, any other exception aborts INTERNAL.
"""

from __future__ import annotations

import json
from typing import Callable, Optional, Sequence

from feast_java_old_spark.transport.grpc_adapter import GrpcCallError
from feast_java_old_spark.transport.http import RestHttpServer

# The canonical gRPC status → HTTP status mapping (grpc-gateway /
# google.rpc.Code): what a JSON-HTTP front for a gRPC service answers.
GRPC_HTTP_STATUS = {
    "OK": 200,
    "INVALID_ARGUMENT": 400,
    "FAILED_PRECONDITION": 400,
    "OUT_OF_RANGE": 400,
    "UNAUTHENTICATED": 401,
    "PERMISSION_DENIED": 403,
    "NOT_FOUND": 404,
    "ALREADY_EXISTS": 409,
    "ABORTED": 409,
    "RESOURCE_EXHAUSTED": 429,
    "CANCELLED": 499,
    "UNKNOWN": 500,
    "INTERNAL": 500,
    "DATA_LOSS": 500,
    "UNIMPLEMENTED": 501,
    "UNAVAILABLE": 503,
    "DEADLINE_EXCEEDED": 504,
}

# Reverse direction for clients mapping a bare HTTP status (no JSON
# body) back to a gRPC status name. Ambiguous rows resolve to the
# status grpc-gateway itself picks for that HTTP code.
HTTP_GRPC_STATUS = {
    400: "INVALID_ARGUMENT",
    401: "UNAUTHENTICATED",
    403: "PERMISSION_DENIED",
    404: "NOT_FOUND",
    409: "ABORTED",
    429: "RESOURCE_EXHAUSTED",
    499: "CANCELLED",
    500: "INTERNAL",
    501: "UNIMPLEMENTED",
    503: "UNAVAILABLE",
    504: "DEADLINE_EXCEEDED",
}


def metadata_from_headers(headers) -> list[tuple[str, str]]:
    """HTTP headers → gRPC invocation-metadata shape: a list of
    lower-cased ``(key, value)`` pairs, repeated headers preserved —
    what ``auth_from_metadata`` and the servicers' ``metadata=``
    parameter expect."""
    items = headers.items() if hasattr(headers, "items") else headers
    return [(str(k).lower(), str(v)) for k, v in items]


class GrpcHttpServer(RestHttpServer):
    """Bind gRPC-seam servicers to a localhost HTTP socket.

    ``servicers`` is the same sequence ``build_server`` takes — any
    object with a ``service_name`` and Uppercase RPC methods
    ``(request_dict, metadata=...) -> response_dict``. Every method is
    served at ``POST /<service_name>/<Method>``.
    """

    def __init__(
        self,
        servicers: Sequence,
        host: str = "127.0.0.1",
        port: int = 0,
        interceptor: Optional[Callable] = None,
        **server_opts,
    ) -> None:
        super().__init__(host=host, port=port, **server_opts)
        self.interceptor = interceptor
        self.servicers = list(servicers)
        for servicer in self.servicers:
            for name in dir(servicer):
                if name[:1].isupper() and callable(getattr(servicer, name)):
                    path = f"/{servicer.service_name}/{name}"
                    self.route(
                        "POST",
                        path,
                        self._handler(servicer, name, path),
                        with_headers=True,
                    )

    def _handler(self, servicer, method_name: str, path: str):
        method = getattr(servicer, method_name)
        service_name = servicer.service_name

        def handle(query, body, headers):
            from feast_java_old_spark.transport import protobin
            from feast_java_old_spark.transport.http import RawBody

            metadata = metadata_from_headers(headers)
            # Codec negotiation by request Content-Type: an
            # ``application/x-protobuf`` request gets a binary response
            # (for methods with registered descriptors — the serving
            # data plane); everything else speaks the JSON codec. Error
            # bodies stay JSON on BOTH codecs: gRPC puts status in
            # trailers (no HTTP/1.1 analog), and a binary-undecodable
            # error body would strand the client exactly when it needs
            # the message — documented divergence.
            ctype = (headers.get("Content-Type") or "").split(";")[0].strip()
            binary = (
                ctype == protobin.PROTO_CONTENT_TYPE
                and protobin.descriptors_for(service_name, method_name)
                is not None
            )
            try:
                if self.interceptor is not None:
                    self.interceptor(path, metadata)
                if binary:
                    try:
                        request = protobin.decode_request(
                            service_name, method_name, body or b""
                        )
                    except (protobin.ProtoCodecError, ValueError) as ex:
                        raise GrpcCallError(
                            "INTERNAL",
                            f"Exception deserializing request: {ex}",
                        ) from ex
                    response = method(request, metadata=metadata)
                    return 200, RawBody(
                        protobin.encode_response(
                            service_name, method_name, response
                        ),
                        protobin.PROTO_CONTENT_TYPE,
                    )
                try:
                    request = json.loads(body or b"{}")
                except (json.JSONDecodeError, UnicodeDecodeError) as ex:
                    # a grpcio server surfaces a request_deserializer
                    # failure as INTERNAL ("Exception deserializing
                    # request"), not INVALID_ARGUMENT.
                    raise GrpcCallError(
                        "INTERNAL", f"Exception deserializing request: {ex}"
                    ) from ex
                return 200, method(request, metadata=metadata)
            except GrpcCallError as ex:
                return (
                    GRPC_HTTP_STATUS.get(ex.code, 500),
                    {"code": ex.code, "details": ex.details},
                )
            except Exception as ex:  # non-seam failure → INTERNAL
                return 500, {"code": "INTERNAL", "details": str(ex)}

        return handle
