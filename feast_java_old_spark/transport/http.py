"""Real localhost HTTP bindings for the two REST facades.

The reference runs each module as a Spring Boot web application: the
core module serves ``CoreServiceRestController`` (``/api/v2/*``,
``CoreServiceRestController.java:49-134``) with the
``@ControllerAdvice`` error bodies
(``RestResponseEntityExceptionHandler.java:34-118``) and a Prometheus
``/metrics`` servlet (``MonitoringConfig.java:33-45``); the serving
module serves ``ServingServiceRestController`` (``/api/v1/info`` +
``/api/v1/features/online``, ``ServingServiceRestController.java:48-66``)
with its own ``/metrics`` servlet (``InstrumentationConfig.java:40-43``)
and the Spring Boot actuator health endpoint (permitted unauthenticated
by ``WebSecurityConfig.java:41-48``).

This module is that web layer on the Python stdlib
(``ThreadingHTTPServer`` — one OS thread per in-flight request, like
the reference's servlet thread pool): the same routes, the same status
mapping, JSON in/out over an actual socket. No third-party server
framework; nothing here touches query semantics — both servers delegate
to the already-tested controllers.

Status mapping parity:

- Core routes run under :func:`~feast_java_old_spark.registry.rest.
  rest_call` (the advice): handled failures are ``(400|500,
  {"error": msg})``; an exception the advice re-raises falls through to
  Spring's DEFAULT error handling — a whitelabel JSON body
  ``{"timestamp", "status", "error", "path"}`` with status 500 (Spring
  Boot ≥2.3 masks the message by default).
- The serving module registers NO ``@ControllerAdvice``: a handler
  failure (e.g. ``RequestHelper``'s ``IllegalArgumentException``) gets
  Spring's default **500** whitelabel body, and an unreadable JSON
  request body is Spring's ``HttpMessageNotReadableException`` →
  **400** whitelabel. Mirrored exactly — the two transports'
  deliberate asymmetry (core: client faults become 400; serving:
  validation failures surface as 500) is reference behavior, pinned by
  tests.
- Unknown path → 404 whitelabel; wrong method on a known path → 405
  whitelabel (Spring's default for an unmatched ``RequestMethod``).
- ``/actuator/health`` (serving) → ``{"status": "UP"}`` 200 or
  ``{"status": "DOWN"}`` 503, the actuator's contract, driven by the
  same probe the gRPC ``HealthServiceController`` analog uses
  (``plans.serving_json.health_check``).

Request-parameter binding matches Spring's ``@RequestParam String[]``:
``?entities=a&entities=b`` and ``?entities=a,b`` both bind ``[a, b]``;
a present-but-empty ``?entities=`` binds ``[]`` (the empty-filter
list-all semantics, ``SpecService.java:158``); an absent required param
is rejected before the handler runs (400 via the advice's
``handleMissingServletRequestParameter`` analog).
"""

from __future__ import annotations

import datetime as dt
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional
from urllib.parse import parse_qsl, urlparse

from feast_java_old_spark.registry.rest import rest_call

HTTP_REASON = {
    400: "Bad Request",
    404: "Not Found",
    405: "Method Not Allowed",
    411: "Length Required",
    413: "Payload Too Large",
    500: "Internal Server Error",
    503: "Service Unavailable",
}

# Tomcat's default POST-body cap (maxPostSize, 2 MiB) is the analog; a
# declared Content-Length above this is rejected with 413 BEFORE any
# read, so a hostile "Content-Length: 10**12" never reaches rfile.read's
# allocation. Override per server via RestHttpServer(max_body_bytes=...).
DEFAULT_MAX_BODY_BYTES = 32 * 1024 * 1024

# Idle-connection socket timeout (Tomcat connectionTimeout analog,
# default 60 s there; BaseHTTPRequestHandler closes the connection on
# socket.timeout). Override per server via request_timeout=.
DEFAULT_REQUEST_TIMEOUT = 60.0


def whitelabel(status: int, path: str) -> dict:
    """Spring Boot's default error attributes (message masked, the
    ≥2.3 default): the body every unadvised failure produces."""
    return {
        "timestamp": dt.datetime.now(dt.timezone.utc).isoformat(),
        "status": status,
        "error": HTTP_REASON.get(status, "Error"),
        "path": path,
    }


def _json_default(obj):
    """Jackson-parity fallbacks for values JSON lacks: byte payloads
    render base64 (proto-JSON ``bytesVal`` / Jackson ``byte[]``
    convention), timestamps ISO-8601."""
    import base64

    if isinstance(obj, (bytes, bytearray)):
        return base64.b64encode(bytes(obj)).decode()
    if isinstance(obj, (dt.datetime, dt.date)):
        return obj.isoformat()
    raise TypeError(
        f"Object of type {type(obj).__name__} is not JSON serializable"
    )


def encode_json(payload) -> bytes:
    if isinstance(payload, str):
        return payload.encode()
    return json.dumps(payload, default=_json_default).encode()


class RawBody:
    """A handler return payload that bypasses the JSON encoder: the
    bytes go on the wire verbatim under the given content type. The
    escape hatch the proto-binary codec uses (a binary response must
    not be JSON-wrapped)."""

    __slots__ = ("data", "content_type")

    def __init__(self, data: bytes, content_type: str) -> None:
        self.data = data
        self.content_type = content_type


class _Route:
    __slots__ = ("method", "handler", "content_type", "wants_headers")

    def __init__(
        self,
        method: str,
        handler,
        content_type: str = "application/json",
        wants_headers: bool = False,
    ):
        self.method = method
        self.handler = handler
        self.content_type = content_type
        # handlers registered with route(..., with_headers=True) are
        # called as handler(query, body, headers) — the hook the
        # gRPC-over-HTTP binding uses to read call metadata
        # (Authorization bearer etc.) the way a gRPC server reads
        # invocation metadata. Plain routes keep the 2-arg shape.
        self.wants_headers = wants_headers


class _RestHandler(BaseHTTPRequestHandler):
    """One request → one route dispatch. The server instance carries
    the route table (``server.routes``: path → list[_Route])."""

    protocol_version = "HTTP/1.1"
    server_version = "FeastRest/1.0"

    def setup(self):
        # settimeout() on the connection BEFORE the first readline: an
        # idle keep-alive connection is dropped after the server's
        # request_timeout (handle_one_request catches socket.timeout
        # and closes).
        self.timeout = self.server.request_timeout
        super().setup()

    def log_message(self, fmt, *args):  # silence default stderr chatter
        pass

    def _dispatch(self, method: str, head_only: bool = False) -> None:
        parsed = urlparse(self.path)
        path = parsed.path.rstrip("/") or "/"
        routes = self.server.routes.get(path)
        if routes is None:
            return self._send(404, whitelabel(404, path))
        route = next((r for r in routes if r.method == method), None)
        if route is None:
            return self._send(405, whitelabel(405, path))
        query: dict[str, list[str]] = {}
        for k, v in parse_qsl(parsed.query, keep_blank_values=True):
            query.setdefault(k, []).append(v)
        body = None
        if method == "POST":
            if "chunked" in (
                self.headers.get("Transfer-Encoding") or ""
            ).lower():
                # chunked bodies aren't decoded by this transport —
                # reject explicitly (411) rather than misparse an empty
                # body into a misleading 400. Close the connection: the
                # undecoded chunk bytes still in the socket must not be
                # misread as a pipelined next request.
                self.close_connection = True
                return self._send(411, whitelabel(411, path))
            try:
                length = int(self.headers.get("Content-Length") or 0)
            except ValueError:
                # malformed Content-Length: reject with 400 and close
                # (Tomcat's invalid-header behavior) instead of dying
                # uncaught with no response at all.
                self.close_connection = True
                return self._send(400, whitelabel(400, path))
            if length < 0:
                # a negative Content-Length is as malformed as a
                # non-numeric one — without this check rfile.read(-N)
                # reads until EOF, parking the handler thread for the
                # full request_timeout and then dropping the connection
                # with no response.
                self.close_connection = True
                return self._send(400, whitelabel(400, path))
            if length > self.server.max_body_bytes:
                # reject BEFORE reading: the declared length must never
                # drive an allocation. Close the connection — the
                # unread body bytes must not be misread as a pipelined
                # next request.
                self.close_connection = True
                return self._send(413, whitelabel(413, path))
            body = self.rfile.read(length) if length else b""
        try:
            if route.wants_headers:
                status, payload = route.handler(query, body, self.headers)
            else:
                status, payload = route.handler(query, body)
            # serialize INSIDE the guard: a payload json.dumps cannot
            # encode (beyond the base64/ISO fallbacks) must still
            # produce a 500 body, not a dropped connection.
            if isinstance(payload, RawBody):
                data, content_type = payload.data, payload.content_type
            else:
                data, content_type = encode_json(payload), route.content_type
        except Exception:
            # the advice re-raised (no matching @ExceptionHandler) or
            # the serving module has no advice at all → Spring default.
            status, data, content_type = (
                500,
                encode_json(whitelabel(500, path)),
                route.content_type,
            )
        self._send_raw(status, data, content_type, head_only)

    def _send(self, status: int, payload, content_type: str = "application/json") -> None:
        self._send_raw(status, encode_json(payload), content_type)

    def _send_raw(
        self,
        status: int,
        data: bytes,
        content_type: str = "application/json",
        head_only: bool = False,
    ) -> None:
        self.send_response(status)
        self.send_header("Content-Type", content_type)
        self.send_header("Content-Length", str(len(data)))
        if self.close_connection:
            # advertise the close we are about to do (411/413 paths set
            # close_connection before responding) so a keep-alive client
            # doesn't try to reuse the socket.
            self.send_header("Connection", "close")
        self.end_headers()
        if not head_only:
            self.wfile.write(data)

    def do_GET(self):  # noqa: N802 - http.server API
        self._dispatch("GET")

    def do_POST(self):  # noqa: N802
        self._dispatch("POST")

    def do_HEAD(self):  # noqa: N802 - Spring answers HEAD for GET maps
        self._dispatch("GET", head_only=True)

    # unmapped methods on known paths are Spring's 405, not the
    # stdlib's 501 HTML error page
    def do_PUT(self):  # noqa: N802
        self._dispatch("PUT")

    def do_DELETE(self):  # noqa: N802
        self._dispatch("DELETE")

    def do_PATCH(self):  # noqa: N802
        self._dispatch("PATCH")


class RestHttpServer:
    """A localhost HTTP server over a route table. ``port=0`` binds an
    ephemeral port (read it back from :attr:`port`). Context manager:
    ``with CoreRestHttpServer(ctl) as srv: requests to srv.base_url``.
    """

    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 0,
        max_body_bytes: int = DEFAULT_MAX_BODY_BYTES,
        request_timeout: float = DEFAULT_REQUEST_TIMEOUT,
    ) -> None:
        self._httpd = ThreadingHTTPServer((host, port), _RestHandler)
        self._httpd.daemon_threads = True
        self._httpd.routes = {}
        self._httpd.max_body_bytes = max_body_bytes
        self._httpd.request_timeout = request_timeout
        self._thread: Optional[threading.Thread] = None

    def route(
        self,
        method: str,
        path: str,
        handler,
        content_type: str = "application/json",
        with_headers: bool = False,
    ) -> None:
        self._httpd.routes.setdefault(path, []).append(
            _Route(method, handler, content_type, wants_headers=with_headers)
        )

    @property
    def host(self) -> str:
        return self._httpd.server_address[0]

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    @property
    def base_url(self) -> str:
        return f"http://{self.host}:{self.port}"

    def start(self) -> "RestHttpServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        # shutdown() deadlocks unless serve_forever() is running — a
        # constructed-but-never-started server just closes its socket.
        if self._thread is not None:
            self._httpd.shutdown()
            self._thread.join(timeout=5)
            self._thread = None
        self._httpd.server_close()

    def __enter__(self) -> "RestHttpServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()


# ------------------------------------------------------------------ core


def _entities_param(query: dict[str, list[str]]) -> Optional[list[str]]:
    """Spring ``@RequestParam String[]`` binding: absent → None (the
    controller raises the required-param 400); repeated and
    comma-separated values both flatten; ``?entities=`` → []."""
    if "entities" not in query:
        return None
    out: list[str] = []
    for v in query["entities"]:
        out.extend(p for p in v.split(",") if p != "")
    return out


def _scalar(query: dict[str, list[str]], name: str) -> Optional[str]:
    vals = query.get(name)
    return vals[0] if vals else None


class CoreRestHttpServer(RestHttpServer):
    """The core module's web layer: the five ``/api/v2`` GETs under the
    ``@ControllerAdvice``, plus the Prometheus ``/metrics`` servlet when
    an exposition callable is wired (``MonitoringConfig.java:33-45`` —
    the servlet shares the controller's HTTP server)."""

    def __init__(
        self,
        controller,
        metrics_exposition: Optional[Callable[[], str]] = None,
        host: str = "127.0.0.1",
        port: int = 0,
        **server_opts,
    ) -> None:
        super().__init__(host=host, port=port, **server_opts)
        self.controller = controller
        c = controller

        self.route(
            "GET",
            "/api/v2/version",
            lambda q, b: rest_call(c.get_version),
        )
        self.route(
            "GET",
            "/api/v2/features",
            lambda q, b: rest_call(
                c.list_features,
                entities=_entities_param(q),
                project=_scalar(q, "project"),
            ),
        )
        self.route(
            "GET",
            "/api/v2/projects",
            lambda q, b: rest_call(c.list_projects),
        )
        self.route(
            "GET",
            "/api/v2/entities",
            lambda q, b: rest_call(
                c.list_entities,
                **({"project": _scalar(q, "project")} if _scalar(q, "project") else {}),
            ),
        )
        self.route(
            "GET",
            "/api/v2/feature-tables",
            lambda q, b: rest_call(
                c.list_feature_tables,
                **({"project": _scalar(q, "project")} if _scalar(q, "project") else {}),
            ),
        )
        if metrics_exposition is not None:
            self.route(
                "GET",
                "/metrics",
                lambda q, b: (200, metrics_exposition()),
                content_type="text/plain; version=0.0.4; charset=utf-8",
            )


# --------------------------------------------------------------- serving


class ServingRestHttpServer(RestHttpServer):
    """The serving module's web layer: ``/api/v1/info`` +
    ``/api/v1/features/online`` with Spring-DEFAULT error handling (no
    advice in the serving module), the ``/metrics`` servlet
    (``InstrumentationConfig.java:40-43``), and the actuator health
    endpoint backed by the gRPC health probe's logic."""

    def __init__(
        self,
        controller,
        metrics_exposition: Optional[Callable[[], str]] = None,
        host: str = "127.0.0.1",
        port: int = 0,
        **server_opts,
    ) -> None:
        super().__init__(host=host, port=port, **server_opts)
        self.controller = controller

        self.route("GET", "/api/v1/info", lambda q, b: (200, controller.get_info()))

        def online(query, body):
            path = "/api/v1/features/online"
            try:
                request = json.loads(body or b"")
            except (json.JSONDecodeError, UnicodeDecodeError):
                # HttpMessageNotReadableException → 400, before the
                # handler runs.
                return 400, whitelabel(400, path)
            if not isinstance(request, dict):
                return 400, whitelabel(400, path)
            # no @ControllerAdvice in serving: ANY handler failure —
            # including RequestHelper's IllegalArgumentException — is
            # Spring's default 500 (the _dispatch catch-all).
            return 200, controller.get_online_features(request)

        self.route("POST", "/api/v1/features/online", online)

        def health(q, b):
            from feast_java_old_spark.plans.serving_json import (
                SERVING,
                health_check,
            )

            up = health_check(controller.registry) == SERVING
            return (200, {"status": "UP"}) if up else (503, {"status": "DOWN"})

        self.route("GET", "/actuator/health", health)

        if metrics_exposition is not None:
            self.route(
                "GET",
                "/metrics",
                lambda q, b: (200, metrics_exposition()),
                content_type="text/plain; version=0.0.4; charset=utf-8",
            )
