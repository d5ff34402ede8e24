"""Loopback end-to-end tests for the real HTTP transport: an actual
client socket → ThreadingHTTPServer → controller → JSON back.

Parity pins: the five core GETs (CoreServiceRestController.java:69-134)
with the @ControllerAdvice status bodies
(RestResponseEntityExceptionHandler.java:34-118), Spring's
@RequestParam String[] binding, the serving routes
(ServingServiceRestController.java:48-66) with the serving module's
NO-advice Spring-default error handling, both /metrics servlets
(MonitoringConfig.java:33-45, InstrumentationConfig.java:40-43), and
the actuator health contract."""

import datetime as dt
import json
import urllib.error
import urllib.request

import pytest
from pyspark.sql import types as T

from feast_java_old_spark import __version__
from feast_java_old_spark.operators.materialize import materialize
from feast_java_old_spark.plans.serving_rest import (
    ServingServiceRestController,
)
from feast_java_old_spark.registry.core_service import CoreService
from feast_java_old_spark.registry.model import (
    Entity,
    Feature,
    FeatureTable,
    FileSource,
    ValueType,
)
from feast_java_old_spark.registry.registry import Registry
from feast_java_old_spark.registry.rest import CoreServiceRestController
from feast_java_old_spark.transport.http import (
    CoreRestHttpServer,
    ServingRestHttpServer,
)

TS = dt.datetime(2024, 1, 15, 12, 0, 0)


def http_get(url):
    try:
        with urllib.request.urlopen(url) as resp:
            return resp.status, resp.headers, resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.headers, e.read()


def http_post_json(url, obj=None, raw=None):
    data = raw if raw is not None else json.dumps(obj).encode()
    req = urllib.request.Request(
        url, data=data, headers={"Content-Type": "application/json"}
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def get_json(url):
    status, _, body = http_get(url)
    return status, json.loads(body)


# ------------------------------------------------------------------ core


@pytest.fixture()
def core_registry():
    reg = Registry()
    reg.apply_entity(Entity("driver", ValueType.INT64))
    reg.apply_entity(Entity("zone", ValueType.STRING))
    src = FileSource(file_url="/tmp/x.parquet", event_timestamp_column="ts")
    reg.apply_feature_table(
        FeatureTable(
            "driver_stats",
            entities=["driver"],
            features=[Feature("rating", ValueType.DOUBLE)],
            batch_source=src,
        )
    )
    reg.apply_feature_table(
        FeatureTable(
            "driver_zone",
            entities=["driver", "zone"],
            features=[Feature("surge", ValueType.DOUBLE)],
            batch_source=src,
        )
    )
    return reg


@pytest.fixture()
def core_srv(core_registry):
    from feast_java_old_spark.plans.metrics import core_exposition

    ctl = CoreServiceRestController(CoreService(core_registry))
    with CoreRestHttpServer(
        ctl, metrics_exposition=lambda: core_exposition(core_registry)
    ) as srv:
        yield srv


def test_core_five_gets_over_socket(core_srv):
    base = core_srv.base_url
    assert get_json(f"{base}/api/v2/version") == (
        200,
        {"version": __version__},
    )
    status, body = get_json(f"{base}/api/v2/projects")
    assert (status, body) == (200, {"projects": ["default"]})
    status, body = get_json(f"{base}/api/v2/entities")
    assert status == 200
    assert sorted(e["name"] for e in body["entities"]) == [
        "driver",
        "zone",
    ]
    status, body = get_json(f"{base}/api/v2/feature-tables")
    assert status == 200
    assert len(body["tables"]) == 2
    status, body = get_json(f"{base}/api/v2/features?entities=driver")
    assert status == 200
    assert list(body["features"]) == ["driver_stats:rating"]


def test_core_entities_param_binding(core_srv):
    base = core_srv.base_url
    # repeated params and comma-separated bind identically (Spring
    # String[] conversion)
    _, a = get_json(f"{base}/api/v2/features?entities=driver&entities=zone")
    _, b = get_json(f"{base}/api/v2/features?entities=driver,zone")
    assert a == b
    assert list(a["features"]) == ["driver_zone:surge"]
    # present-but-empty -> empty filter -> list ALL (SpecService.java:158)
    status, body = get_json(f"{base}/api/v2/features?entities=")
    assert status == 200
    assert sorted(body["features"]) == [
        "driver_stats:rating",
        "driver_zone:surge",
    ]


def test_core_missing_required_param_is_400_advice_body(core_srv):
    status, body = get_json(f"{core_srv.base_url}/api/v2/features")
    assert status == 400
    assert "entities" in body["error"]


def test_core_unknown_path_and_wrong_method_whitelabel(core_srv):
    status, body = get_json(f"{core_srv.base_url}/api/v2/nope")
    assert (status, body["error"], body["status"]) == (404, "Not Found", 404)
    assert body["path"] == "/api/v2/nope"
    status, body = http_post_json(
        f"{core_srv.base_url}/api/v2/version", obj={}
    )
    assert (status, json.loads(body)["error"]) == (405, "Method Not Allowed")


def test_core_unhandled_exception_is_default_500(core_srv):
    """An exception the advice re-raises (no matching @ExceptionHandler)
    falls through to Spring's default whitelabel 500 — message masked."""

    def boom(q, b):
        raise RuntimeError("secret internal detail")

    core_srv.route("GET", "/api/v2/boom", boom)
    status, body = get_json(f"{core_srv.base_url}/api/v2/boom")
    assert (status, body["error"]) == (500, "Internal Server Error")
    assert "secret" not in json.dumps(body)


def test_core_metrics_servlet(core_srv):
    status, headers, body = http_get(f"{core_srv.base_url}/metrics")
    assert status == 200
    assert headers["Content-Type"].startswith("text/plain")
    text = body.decode()
    assert "feast_core_feature_set_total" in text
    assert "# TYPE" in text


def test_core_concurrent_requests(core_srv):
    """ThreadingHTTPServer really is concurrent: parallel clients all
    complete (the servlet-thread-pool analog)."""
    from concurrent.futures import ThreadPoolExecutor

    url = f"{core_srv.base_url}/api/v2/projects"
    with ThreadPoolExecutor(8) as pool:
        results = list(pool.map(lambda _: get_json(url)[0], range(32)))
    assert results == [200] * 32


# --------------------------------------------------------------- serving


@pytest.fixture()
def serving_srv(spark, tmp_path, tmp_store):
    src = str(tmp_path / "ft1_src")
    schema = T.StructType(
        [
            T.StructField("driver", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("rating", T.DoubleType()),
        ]
    )
    rows = [
        (1, TS - dt.timedelta(seconds=10), 4.5),
        (2, TS - dt.timedelta(seconds=10), 3.0),
    ]
    spark.createDataFrame(rows, schema).write.parquet(src)
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
    from feast_java_old_spark.plans.metrics import ServingMetrics

    metrics = ServingMetrics()
    with ServingRestHttpServer(
        ctl, metrics_exposition=metrics.exposition
    ) as srv:
        yield srv


def test_serving_info_over_socket(serving_srv):
    status, body = get_json(f"{serving_srv.base_url}/api/v1/info")
    assert status == 200
    assert body["version"] == __version__


def test_serving_online_features_over_socket(serving_srv):
    status, body = http_post_json(
        f"{serving_srv.base_url}/api/v1/features/online",
        {
            "features": [{"featureTable": "driver_stats", "name": "rating"}],
            "entityRows": [
                {"fields": {"driver": 2}},
                {"fields": {"driver": 1}},
            ],
        },
    )
    assert status == 200
    assert json.loads(body) == [
        {"driver": 2, "driver_stats:rating": 3.0},
        {"driver": 1, "driver_stats:rating": 4.5},
    ]


def test_serving_malformed_body_is_400(serving_srv):
    """HttpMessageNotReadableException analog: unreadable JSON is
    rejected 400 BEFORE the handler runs."""
    status, body = http_post_json(
        f"{serving_srv.base_url}/api/v1/features/online", raw=b"{broken"
    )
    assert status == 400
    assert json.loads(body)["error"] == "Bad Request"
    # a JSON scalar is equally unbindable to the request message
    status, _ = http_post_json(
        f"{serving_srv.base_url}/api/v1/features/online", raw=b'"hi"'
    )
    assert status == 400


def test_serving_validation_failure_is_default_500(serving_srv):
    """The serving module registers NO @ControllerAdvice: the
    RequestHelper IllegalArgumentException surfaces as Spring's default
    500, not a 400 — deliberate reference asymmetry with core."""
    status, body = http_post_json(
        f"{serving_srv.base_url}/api/v1/features/online",
        {"features": [{"name": "rating"}], "entityRows": [{"fields": {}}]},
    )
    assert status == 500
    assert json.loads(body)["error"] == "Internal Server Error"


def test_serving_health_and_metrics(serving_srv):
    status, body = get_json(f"{serving_srv.base_url}/actuator/health")
    assert (status, body) == (200, {"status": "UP"})
    status, headers, text = http_get(f"{serving_srv.base_url}/metrics")
    assert status == 200
    assert headers["Content-Type"].startswith("text/plain")


def test_serving_health_down_is_503(spark):
    class BrokenRegistry:
        def list_projects(self):
            raise RuntimeError("registry unreachable")

    ctl = ServingServiceRestController(spark, BrokenRegistry())
    with ServingRestHttpServer(ctl) as srv:
        status, body = get_json(f"{srv.base_url}/actuator/health")
    assert (status, body) == (503, {"status": "DOWN"})


def test_serving_concurrent_posts_drive_spark_safely(serving_srv):
    """Multiple HTTP client threads POSTing simultaneously: every
    request completes with the right rows — the SparkSession is shared
    across servlet threads exactly like the reference's deployment."""
    from concurrent.futures import ThreadPoolExecutor

    url = f"{serving_srv.base_url}/api/v1/features/online"

    def one(driver_id):
        status, body = http_post_json(
            url,
            {
                "features": ["driver_stats:rating"],
                "entityRows": [{"fields": {"driver": driver_id}}],
            },
        )
        return status, json.loads(body)[0]

    with ThreadPoolExecutor(6) as pool:
        results = list(pool.map(one, [1, 2, 404, 1, 2, 404] * 2))
    for (status, row), driver_id in zip(results, [1, 2, 404, 1, 2, 404] * 2):
        assert status == 200
        assert row["driver"] == driver_id
        expect = {1: 4.5, 2: 3.0, 404: None}[driver_id]
        assert row["driver_stats:rating"] == expect


def test_keep_alive_connection_reuse(core_srv):
    """HTTP/1.1 with Content-Length: one TCP connection serves
    sequential requests (the transport doesn't close per request)."""
    import http.client

    conn = http.client.HTTPConnection(core_srv.host, core_srv.port)
    try:
        for _ in range(3):
            conn.request("GET", "/api/v2/projects")
            resp = conn.getresponse()
            assert resp.status == 200
            assert json.loads(resp.read()) == {"projects": ["default"]}
    finally:
        conn.close()


def test_full_deployment_scenario(spark, tmp_path, tmp_store):
    """The reference's two-service deployment over real sockets against
    ONE registry: register via objects, list via the core HTTP server,
    materialize, serve via the serving HTTP server."""
    from feast_java_old_spark.registry.core_service import CoreService

    src = str(tmp_path / "dep_src")
    schema = T.StructType(
        [
            T.StructField("driver", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("rating", T.DoubleType()),
        ]
    )
    spark.createDataFrame(
        [(7, TS - dt.timedelta(seconds=3), 4.9)], schema
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
    core_ctl = CoreServiceRestController(CoreService(reg))
    serving_ctl = ServingServiceRestController(
        spark, reg, tmp_store, request_ts=TS
    )
    with CoreRestHttpServer(core_ctl) as core, ServingRestHttpServer(
        serving_ctl
    ) as srv:
        status, body = get_json(
            f"{core.base_url}/api/v2/features?entities=driver"
        )
        assert (status, list(body["features"])) == (
            200,
            ["driver_stats:rating"],
        )
        # not yet materialized: served as NOT_FOUND null, not an error
        status, body = http_post_json(
            f"{srv.base_url}/api/v1/features/online",
            {
                "features": ["driver_stats:rating"],
                "entityRows": [{"fields": {"driver": 7}}],
            },
        )
        assert (status, json.loads(body)) == (
            200,
            [{"driver": 7, "driver_stats:rating": None}],
        )
        materialize(spark, reg, "driver_stats", tmp_store)
        status, body = http_post_json(
            f"{srv.base_url}/api/v1/features/online",
            {
                "features": ["driver_stats:rating"],
                "entityRows": [{"fields": {"driver": 7}}],
            },
        )
        assert (status, json.loads(body)) == (
            200,
            [{"driver": 7, "driver_stats:rating": 4.9}],
        )


# ---- r12 self-review fixes: serialization guard, method parity,
# lifecycle, malformed-shape rejection.


def test_head_and_unmapped_methods(core_srv):
    import http.client

    conn = http.client.HTTPConnection(core_srv.host, core_srv.port)
    try:
        # HEAD answered for a GET mapping: headers only, empty body
        conn.request("HEAD", "/api/v2/projects")
        resp = conn.getresponse()
        body = resp.read()
        assert resp.status == 200
        assert int(resp.headers["Content-Length"]) > 0
        assert body == b""
        # DELETE on a known path: 405 whitelabel JSON, not stdlib 501
        conn.request("DELETE", "/api/v2/projects")
        resp = conn.getresponse()
        out = json.loads(resp.read())
        assert (resp.status, out["error"]) == (405, "Method Not Allowed")
    finally:
        conn.close()


def test_bytes_and_datetime_payloads_serialize(core_srv):
    """A handler returning bytes/datetime values must produce a JSON
    response (base64 / ISO-8601), not a dropped connection; a payload
    no fallback covers still yields a 500 body."""
    payload = {"blob": b"\x00\x01", "when": dt.datetime(2024, 1, 15, 12)}
    core_srv.route("GET", "/api/v2/blob", lambda q, b: (200, payload))
    core_srv.route(
        "GET", "/api/v2/unserializable", lambda q, b: (200, {"x": object()})
    )
    status, body = get_json(f"{core_srv.base_url}/api/v2/blob")
    assert (status, body) == (
        200,
        {"blob": "AAE=", "when": "2024-01-15T12:00:00"},
    )
    status, body = get_json(f"{core_srv.base_url}/api/v2/unserializable")
    assert (status, body["error"]) == (500, "Internal Server Error")


def test_stop_before_start_does_not_deadlock():
    from feast_java_old_spark.transport.http import RestHttpServer

    srv = RestHttpServer()
    srv.stop()  # never started: must close the socket, not hang
    # and a started server stops idempotently
    srv2 = RestHttpServer().start()
    srv2.stop()
    srv2.stop()


def test_serving_non_dict_entity_row_is_named_validation(serving_srv):
    """A non-object EntityRow raises the named ValidationError at the
    parse layer (surfacing as serving's default 500 over HTTP, and
    INVALID_ARGUMENT over gRPC — not an AttributeError INTERNAL)."""
    from feast_java_old_spark.plans.serving_rest import _parse_entity_rows
    from feast_java_old_spark.registry.validation import ValidationError

    with pytest.raises(ValidationError, match="must be a JSON object"):
        _parse_entity_rows(["driver=1"])
    with pytest.raises(ValidationError, match="'fields' must be"):
        _parse_entity_rows([{"fields": "driver=1"}])
    # a non-empty List wrapper without 'val' is a typo, not []
    from feast_java_old_spark.plans.serving_rest import _unwrap_value

    with pytest.raises(ValidationError, match="got keys"):
        _unwrap_value({"int64ListVal": {"vals": [1, 2]}})


def test_app_run_servers_two_service_bootstrap(spark, tmp_path, tmp_store):
    """The CoreApplication/ServingApplication analog: one call stands
    up both servers over a file-backed registry; /metrics live on both."""
    from feast_java_old_spark.transport.app import run_servers

    reg = Registry(path=str(tmp_path / "registry.json"))
    reg.apply_entity(Entity("driver", ValueType.INT64))
    core, serving = run_servers(spark, reg, store_path=tmp_store)
    try:
        status, body = get_json(f"{core.base_url}/api/v2/entities")
        assert (status, [e["name"] for e in body["entities"]]) == (
            200,
            ["driver"],
        )
        status, _, text = http_get(f"{core.base_url}/metrics")
        assert status == 200 and b"feast_core" in text
        status, body = get_json(f"{serving.base_url}/api/v1/info")
        assert status == 200 and "version" in body
        status, _, _ = http_get(f"{serving.base_url}/metrics")
        assert status == 200
        status, body = get_json(f"{serving.base_url}/actuator/health")
        assert (status, body) == (200, {"status": "UP"})
    finally:
        core.stop()
        serving.stop()


def test_chunked_post_is_411_not_misparse(serving_srv):
    import http.client

    conn = http.client.HTTPConnection(serving_srv.host, serving_srv.port)
    try:
        conn.putrequest("POST", "/api/v1/features/online")
        conn.putheader("Transfer-Encoding", "chunked")
        conn.putheader("Content-Type", "application/json")
        conn.endheaders()
        body = b'{"features": []}'
        conn.send(b"%x\r\n%s\r\n0\r\n\r\n" % (len(body), body))
        resp = conn.getresponse()
        out = json.loads(resp.read())
        assert (resp.status, out["error"]) == (411, "Length Required")
    finally:
        conn.close()


def test_oversized_content_length_is_413_without_allocation(serving_srv):
    """A declared Content-Length over the cap is rejected BEFORE any
    body read — a hostile `Content-Length: 10**12` must never drive an
    rfile.read allocation (Tomcat maxPostSize analog). The connection
    closes so the unread bytes can't be misread as a next request."""
    import http.client

    conn = http.client.HTTPConnection(serving_srv.host, serving_srv.port)
    try:
        conn.putrequest("POST", "/api/v1/features/online")
        conn.putheader("Content-Type", "application/json")
        # declared only — the body is never sent; the server must
        # answer from the header alone.
        conn.putheader("Content-Length", str(10**12))
        conn.endheaders()
        resp = conn.getresponse()
        out = json.loads(resp.read())
        assert (resp.status, out["error"]) == (413, "Payload Too Large")
        assert resp.headers.get("Connection") == "close"
    finally:
        conn.close()


def test_body_exactly_at_cap_still_accepted(spark):
    """The cap is a strict greater-than: a body of exactly
    max_body_bytes goes through to the route handler."""
    from feast_java_old_spark.transport.http import RestHttpServer

    srv = RestHttpServer(max_body_bytes=64)
    srv.route("POST", "/echo", lambda q, b: (200, {"n": len(b)}))
    with srv:
        import http.client

        conn = http.client.HTTPConnection(srv.host, srv.port)
        try:
            conn.request("POST", "/echo", body=b"x" * 64)
            resp = conn.getresponse()
            assert (resp.status, json.loads(resp.read())["n"]) == (200, 64)
            conn.request("POST", "/echo", body=b"x" * 65)
            resp = conn.getresponse()
            assert resp.status == 413
        finally:
            conn.close()


def test_idle_connection_times_out():
    """An idle keep-alive socket is dropped after request_timeout (the
    Tomcat connectionTimeout analog): recv sees EOF, no thread leaks."""
    import socket
    import time

    from feast_java_old_spark.transport.http import RestHttpServer

    srv = RestHttpServer(request_timeout=0.5)
    srv.route("GET", "/ping", lambda q, b: (200, {"ok": True}))
    with srv:
        s = socket.create_connection((srv.host, srv.port), timeout=5)
        try:
            # send nothing; the server's settimeout fires on its
            # readline and closes the connection.
            s.settimeout(5)
            t0 = time.monotonic()
            data = s.recv(1024)
            assert data == b""  # orderly close, not a hang
            assert time.monotonic() - t0 < 4
        finally:
            s.close()


def test_happy_path_unaffected_by_timeout_between_requests(serving_srv):
    """Keep-alive reuse within the (default, 60 s) timeout still works
    after the hardening — two sequential requests on one connection."""
    import http.client

    conn = http.client.HTTPConnection(serving_srv.host, serving_srv.port)
    try:
        for _ in range(2):
            conn.request("GET", "/api/v1/info")
            resp = conn.getresponse()
            body = json.loads(resp.read())
            assert resp.status == 200 and "version" in body
    finally:
        conn.close()


def test_app_run_servers_three_service_topology(spark, tmp_path, tmp_store):
    """The reference's full deployment: core + serving + the external
    ODFV transformation service, three sockets from one run_servers
    call (OnlineTransformationService.java:62-66 — serving is
    constructed with the FTS endpoint). Register + materialize through
    the engine, then serve a mixed regular+ODFV request over the
    serving socket whose transform runs through the transform socket."""
    import pandas as pd

    from feast_java_old_spark.operators.odfv import OnDemandFeatureView
    from feast_java_old_spark.transport.app import run_servers

    src = str(tmp_path / "src3")
    spark.createDataFrame(
        [(1, TS - dt.timedelta(seconds=10), 4.5)],
        "driver long, ts timestamp, rating double",
    ).write.parquet(src)
    reg = Registry(path=str(tmp_path / "registry3.json"))
    reg.apply_entity(Entity("driver", ValueType.INT64))
    reg.apply_feature_table(
        FeatureTable(
            "driver_stats",
            entities=["driver"],
            features=[Feature("rating", ValueType.DOUBLE)],
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
    )
    assert len(servers) == 3
    core, serving, transform = servers
    try:
        # the serving controller was wired with the transform endpoint
        assert serving.controller.transform_endpoint == (
            f"{transform.host}:{transform.port}"
        )
        serving.controller.serve_kwargs["request_ts"] = TS
        status, rows = http_post_json(
            f"{serving.base_url}/api/v1/features/online",
            {
                "features": ["driver_stats:rating", "boosted:boosted_rating"],
                "entityRows": [{"fields": {"driver": 1, "boost": 0.5}}],
            },
        )
        rows = json.loads(rows) if isinstance(rows, bytes) else rows
        assert status == 200
        assert rows[0]["driver_stats:rating"] == 4.5
        assert rows[0]["boosted:boosted_rating"] == 5.0
    finally:
        core.stop()
        serving.stop()
        transform.stop()


def test_app_run_servers_odfv_in_process_without_transform_port(
    spark, tmp_path, tmp_store
):
    """odfvs without transform_port keeps two servers and runs the
    transform in-process — the engine default."""
    import pandas as pd

    from feast_java_old_spark.operators.odfv import OnDemandFeatureView
    from feast_java_old_spark.transport.app import run_servers

    reg = Registry(path=str(tmp_path / "registry2p.json"))
    reg.apply_entity(Entity("driver", ValueType.INT64))
    odfv = OnDemandFeatureView(
        name="echoed",
        inputs=["boost"],
        output_schema=T.StructType([T.StructField("echo", T.DoubleType())]),
        transform=lambda pdf: pd.DataFrame({"echo": pdf["boost"] * 1.0}),
    )
    servers = run_servers(spark, reg, odfvs={"echoed": odfv})
    assert len(servers) == 2
    core, serving = servers
    try:
        assert serving.controller.transform_endpoint is None
        status, rows = http_post_json(
            f"{serving.base_url}/api/v1/features/online",
            {
                "features": ["echoed:echo"],
                "entityRows": [{"fields": {"driver": 7, "boost": 2.5}}],
            },
        )
        rows = json.loads(rows) if isinstance(rows, bytes) else rows
        assert status == 200 and rows[0]["echoed:echo"] == 2.5
    finally:
        core.stop()
        serving.stop()


def test_malformed_content_length_is_400_not_dropped(serving_srv):
    """A non-numeric Content-Length gets a 400 whitelabel and a clean
    close — not an uncaught ValueError that drops the connection with
    no response."""
    import http.client

    conn = http.client.HTTPConnection(serving_srv.host, serving_srv.port)
    try:
        conn.putrequest("POST", "/api/v1/features/online", skip_host=False)
        conn.putheader("Content-Type", "application/json")
        conn.putheader("Content-Length", "not-a-number")
        conn.endheaders()
        resp = conn.getresponse()
        out = json.loads(resp.read())
        assert (resp.status, out["error"]) == (400, "Bad Request")
    finally:
        conn.close()


def test_negative_content_length_is_400_not_timeout(serving_srv):
    """A NEGATIVE Content-Length parses as an int, so it slips past the
    malformed-header guard; without its own check, rfile.read(-N) reads
    until EOF — parking the handler thread for the full request_timeout
    and dropping the connection with no response. It must get the same
    400 whitelabel + close as the non-numeric case."""
    import http.client
    import time

    conn = http.client.HTTPConnection(serving_srv.host, serving_srv.port)
    try:
        conn.putrequest("POST", "/api/v1/features/online", skip_host=False)
        conn.putheader("Content-Type", "application/json")
        conn.putheader("Content-Length", "-5")
        conn.endheaders()
        t0 = time.monotonic()
        resp = conn.getresponse()
        out = json.loads(resp.read())
        assert (resp.status, out["error"]) == (400, "Bad Request")
        # answered immediately, not after the 60 s idle timeout
        assert time.monotonic() - t0 < 5
        assert resp.headers.get("Connection") == "close"
    finally:
        conn.close()
