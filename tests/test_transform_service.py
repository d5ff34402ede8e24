"""Cross-process ODFV transformation service tests: real localhost
socket, Arrow IPC payloads both ways.

Parity pins (``OnlineTransformationService.java``):
- serializer type limit INT32/INT64/FLOAT/DOUBLE (:325-343) and
  full-ref → bare-name stripping (:320-321),
- response processing skips unrequested columns (:212-216), silently
  ignores non-int/float response columns (no trailing ``else``,
  :223-301), sets status PRESENT (:236-288),
- the serving plan produces IDENTICAL output whether the ODFV runs
  in-process (``mapInPandas`` transform) or through the service
  (``transform_endpoint=`` — the reference's deployment shape).
"""

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import types as T

import feast_java_old_spark as fs
from feast_java_old_spark.operators.materialize import materialize
from feast_java_old_spark.operators.odfv import OnDemandFeatureView
from feast_java_old_spark.plans import serve_online_features
from feast_java_old_spark.registry.model import FileSource
from feast_java_old_spark.transport.transform_service import (
    HttpTransformationService,
    TransformServer,
    TransformTypeError,
    arrow_ipc_from_pandas,
    process_transform_features_response,
    read_arrow_ipc,
    serialize_values_into_arrow_ipc,
)

TS = dt.datetime(2024, 1, 15, 12, 0, 0)


# ------------------------------------------------------------- serializer


def test_serializer_round_trip_all_four_wire_types():
    values = [
        {
            "rides:trip_cost": 10.0,
            "f32": np.float32(1.5),
            "i32": np.int32(7),
            "count": 3,
        },
        {
            "rides:trip_cost": 20.0,
            "f32": np.float32(2.5),
            "i32": np.int32(8),
            "count": 4,
        },
    ]
    table = read_arrow_ipc(serialize_values_into_arrow_ipc(values))
    # full feature refs stripped to bare names (:320-321)
    assert set(table.schema.names) == {"trip_cost", "f32", "i32", "count"}
    assert table.schema.field("trip_cost").type == "double"
    assert table.schema.field("f32").type == "float"
    assert table.schema.field("i32").type == "int32"
    assert table.schema.field("count").type == "int64"
    assert table.column("trip_cost").to_pylist() == [10.0, 20.0]
    assert table.column("count").to_pylist() == [3, 4]


def test_serializer_rejects_unhandled_types_reference_message():
    # Status.INTERNAL "type that is currently not handled" (:338-343)
    with pytest.raises(TransformTypeError, match="currently not handled"):
        serialize_values_into_arrow_ipc([{"name": "abc"}])
    with pytest.raises(TransformTypeError, match="currently not handled"):
        serialize_values_into_arrow_ipc([{"flag": True}])
    with pytest.raises(TransformTypeError):
        serialize_values_into_arrow_ipc([])


def test_pandas_batch_serializer_same_limit():
    pdf = pd.DataFrame({"a": [1, 2], "b": [1.0, 2.0]})
    table = read_arrow_ipc(arrow_ipc_from_pandas(pdf))
    assert table.column("a").to_pylist() == [1, 2]
    with pytest.raises(TransformTypeError, match="currently not handled"):
        arrow_ipc_from_pandas(pd.DataFrame({"s": ["x"]}))


# ------------------------------------------------------ response processing


def _response_bytes(pdf):
    import pyarrow as pa

    from feast_java_old_spark.transport.transform_service import (
        arrow_ipc_from_table,
    )

    return arrow_ipc_from_table(pa.Table.from_pandas(pdf, preserve_index=False))


def test_process_response_sets_present_and_skips_unrequested():
    resp = _response_bytes(
        pd.DataFrame({"score": [1.0, 2.0], "debug_extra": [9.0, 9.0]})
    )
    values = [{"e": 1}, {"e": 2}]
    statuses = [{}, {}]
    process_transform_features_response(
        resp, "scored", {"scored:score"}, values, statuses
    )
    assert values[0]["scored:score"] == 1.0
    assert statuses[1]["scored:score"] == "PRESENT"
    # unrequested response column skipped (:212-216)
    assert "scored:debug_extra" not in values[0]


def test_process_response_silently_skips_non_numeric_columns():
    # the reference's if/else-if chain has no trailing else (:223-301):
    # a requested STRING output is simply never decoded.
    resp = _response_bytes(
        pd.DataFrame({"label": ["a", "b"], "score": [1.0, 2.0]})
    )
    values = [{}, {}]
    statuses = [{}, {}]
    process_transform_features_response(
        resp, "v", {"v:label", "v:score"}, values, statuses
    )
    assert values[0] == {"v:score": 1.0}
    assert "v:label" not in statuses[0]


# ------------------------------------------------------------ server+client


@pytest.fixture()
def scored_view():
    return OnDemandFeatureView(
        name="scored",
        inputs=["rides:trip_cost", "surge"],
        output_schema=T.StructType([T.StructField("score", T.DoubleType())]),
        transform=lambda pdf: pd.DataFrame(
            {"score": pdf["trip_cost"] * pdf["surge"]}
        ),
    )


def test_loopback_transform_rpc(scored_view):
    with TransformServer({"scored": scored_view}) as srv:
        client = HttpTransformationService(f"{srv.host}:{srv.port}")
        arrow_in = serialize_values_into_arrow_ipc(
            [
                {"rides:trip_cost": 10.0, "surge": 2.0},
                {"rides:trip_cost": 20.0, "surge": 1.5},
            ]
        )
        out = read_arrow_ipc(client.transform_features("scored", arrow_in))
        assert out.column("score").to_pylist() == [20.0, 30.0]


def test_loopback_unknown_view_surfaces_internal_error(scored_view):
    with TransformServer({"scored": scored_view}) as srv:
        client = HttpTransformationService(f"{srv.host}:{srv.port}")
        arrow_in = serialize_values_into_arrow_ipc([{"surge": 1.0}])
        with pytest.raises(RuntimeError, match="no on-demand feature view"):
            client.transform_features("nope", arrow_in)


def test_loopback_undecodable_payload_is_internal_error(scored_view):
    with TransformServer({"scored": scored_view}) as srv:
        client = HttpTransformationService(f"{srv.host}:{srv.port}")
        with pytest.raises(RuntimeError):
            client.transform_features("scored", b"not arrow")


def test_transform_rows_full_sequence(scored_view):
    """serialize (:313-411) → RPC (:76-79) → process (:185-310)."""
    with TransformServer({"scored": scored_view}) as srv:
        client = HttpTransformationService(f"{srv.host}:{srv.port}")
        values = [
            {"rides:trip_cost": 10.0, "surge": 2.0},
            {"rides:trip_cost": 20.0, "surge": 1.5},
        ]
        statuses = [{}, {}]
        client.transform_rows("scored", {"scored:score"}, values, statuses)
        assert values[0]["scored:score"] == 20.0
        assert values[1]["scored:score"] == 30.0
        assert statuses[0]["scored:score"] == "PRESENT"


# --------------------------------------------- in-process ≡ cross-process


@pytest.fixture()
def env(spark, tmp_path, tmp_store):
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [
            (1, TS - dt.timedelta(seconds=100), 10.0, 3.0),
            (2, TS - dt.timedelta(seconds=200), 20.0, 5.0),
        ],
        "driver_id long, ts timestamp, trip_cost double, trip_distance double",
    ).write.parquet(src)
    reg = fs.Registry()
    reg.apply_entity(fs.Entity("driver_id", fs.ValueType.INT64))
    reg.apply_feature_table(
        fs.FeatureTable(
            "rides",
            ["driver_id"],
            [
                fs.Feature("trip_cost", fs.ValueType.DOUBLE),
                fs.Feature("trip_distance", fs.ValueType.DOUBLE),
            ],
            max_age_secs=7200,
            batch_source=FileSource(file_url=src, event_timestamp_column="ts"),
        )
    )
    materialize(spark, reg, "rides", tmp_store)
    # ONE view serves both topologies: the transform sees BARE input
    # names (:320-321) in-process AND through the service — toggling
    # transform_port on run_servers never changes what it receives.
    # (Both tuple slots carry the same object; the shape is kept so the
    # many unpack sites stay untouched.)
    view = OnDemandFeatureView(
        name="adjusted",
        inputs=["rides:trip_cost", "surge"],
        output_schema=T.StructType([T.StructField("adjusted_cost", T.DoubleType())]),
        transform=lambda pdf: pd.DataFrame(
            {"adjusted_cost": pdf["trip_cost"] * pdf["surge"]}
        ),
    )
    return reg, tmp_store, view, view


def _collect(df):
    return sorted((r.asDict() for r in df.collect()), key=lambda r: str(r))


def test_serving_plan_in_process_equals_cross_process(spark, env):
    """The one assertion that matters: routing the ODFV stage through a
    REAL localhost socket changes nothing about the result — columns,
    values, statuses, helper-drop, NOT_FOUND rows."""
    reg, store, inproc, service_side = env
    rows = [
        {"driver_id": 1, "surge": 2.0},
        {"driver_id": 2, "surge": 1.5},
        {"driver_id": 9, "surge": 3.0},  # NOT_FOUND entity
    ]
    refs = ["rides:trip_distance", "adjusted:adjusted_cost"]
    local = serve_online_features(
        spark, reg, rows, refs,
        store_path=store, odfvs={"adjusted": inproc}, request_ts=TS,
    )
    with TransformServer({"adjusted": service_side}) as srv:
        remote = serve_online_features(
            spark, reg, rows, refs,
            store_path=store, odfvs={"adjusted": service_side}, request_ts=TS,
            transform_endpoint=f"{srv.host}:{srv.port}",
        )
        remote_rows = _collect(remote)
    assert local.columns == remote.columns
    assert "rides__trip_cost" not in remote.columns  # helper dropped (J5)
    local_rows = _collect(local)
    assert local_rows == remote_rows
    present = [r for r in remote_rows if r["driver_id"] == 1][0]
    assert present["adjusted_cost"] == 20.0
    assert present["adjusted_cost__status"] == "PRESENT"


def test_cross_process_unrequested_output_skipped(spark, env):
    """A view with two outputs, one requested: the cross-process path
    must drop the unrequested one exactly like the in-process path
    (processTransformFeaturesResponse:212-216 ∘ apply_odfv)."""
    reg, store, _, _ = env
    two_out = OnDemandFeatureView(
        name="adjusted",
        inputs=["rides:trip_cost", "surge"],
        output_schema=T.StructType(
            [
                T.StructField("adjusted_cost", T.DoubleType()),
                T.StructField("double_cost", T.DoubleType()),
            ]
        ),
        transform=lambda pdf: pd.DataFrame(
            {
                "adjusted_cost": pdf["trip_cost"] * pdf["surge"],
                "double_cost": pdf["trip_cost"] * 2.0,
            }
        ),
    )
    with TransformServer({"adjusted": two_out}) as srv:
        out = serve_online_features(
            spark, reg,
            [{"driver_id": 1, "surge": 2.0}],
            ["adjusted:adjusted_cost"],
            store_path=store, odfvs={"adjusted": two_out}, request_ts=TS,
            transform_endpoint=f"{srv.host}:{srv.port}",
        )
        rows = out.collect()
    assert "double_cost" not in out.columns
    assert rows[0].adjusted_cost == 20.0


# ----------------------- ODFV refs through the serving transports
# (the reference topology: serving process + external transformation
# service, two sockets — OnlineServingServiceV2.java:89-98 ref split,
# ServingServiceRestController.java:55-66 route).


def test_rest_transport_serves_odfv_through_transform_service(spark, env):
    """Full deployment scenario over TWO real sockets: an HTTP client
    POSTs an ODFV ref to the serving REST server, whose controller
    retrieves the helper feature and runs the transform through the
    transformation-service socket. The flat REST response carries the
    transformed value."""
    import json
    import urllib.request

    from feast_java_old_spark.plans.serving_rest import (
        ServingServiceRestController,
    )
    from feast_java_old_spark.transport.http import ServingRestHttpServer

    reg, store, _, service_side = env
    with TransformServer({"adjusted": service_side}) as fts:
        ctl = ServingServiceRestController(
            spark,
            reg,
            store,
            odfvs={"adjusted": service_side},
            transform_endpoint=f"{fts.host}:{fts.port}",
            request_ts=TS,
        )
        with ServingRestHttpServer(ctl) as srv:
            body = json.dumps(
                {
                    "features": [
                        "rides:trip_distance",
                        "adjusted:adjusted_cost",
                    ],
                    "entityRows": [
                        {"fields": {"driver_id": 1, "surge": 2.0}},
                        {"fields": {"driver_id": 9, "surge": 3.0}},
                    ],
                }
            ).encode()
            req = urllib.request.Request(
                f"{srv.base_url}/api/v1/features/online",
                data=body,
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as resp:
                assert resp.status == 200
                rows = json.loads(resp.read())
    assert rows[0]["adjusted:adjusted_cost"] == 20.0
    assert rows[0]["rides:trip_distance"] == 3.0
    # NOT_FOUND entity: helper feature is None; the transform still ran
    assert rows[1]["rides:trip_distance"] is None


def test_grpc_servicer_serves_odfv_through_transform_service(spark, env):
    """Same dispatch through the gRPC adapter surface: the servicer's
    {fields, statuses} response carries the ODFV output with status
    PRESENT (processTransformFeaturesResponse:236-288)."""
    from feast_java_old_spark.plans.serving_rest import (
        ServingServiceRestController,
    )
    from feast_java_old_spark.transport.grpc_adapter import (
        ServingServiceServicer,
    )

    reg, store, _, service_side = env
    with TransformServer({"adjusted": service_side}) as fts:
        ctl = ServingServiceRestController(
            spark,
            reg,
            store,
            odfvs={"adjusted": service_side},
            transform_endpoint=f"{fts.host}:{fts.port}",
            request_ts=TS,
        )
        out = ServingServiceServicer(ctl).GetOnlineFeaturesV2(
            {
                "features": ["adjusted:adjusted_cost"],
                "entityRows": [{"fields": {"driver_id": 2, "surge": 1.5}}],
            }
        )
    row = out["fieldValues"][0]
    assert row["fields"]["adjusted:adjusted_cost"] == 30.0
    assert row["statuses"]["adjusted:adjusted_cost"] == "PRESENT"


def test_controller_without_odfvs_unchanged(spark, env):
    """Regression guard: a controller constructed WITHOUT odfvs keeps
    the plain retrieval path for ordinary refs."""
    from feast_java_old_spark.plans.serving_rest import (
        ServingServiceRestController,
    )

    reg, store, _, _ = env
    ctl = ServingServiceRestController(spark, reg, store, request_ts=TS)
    rows = ctl.get_online_features(
        {
            "features": ["rides:trip_cost"],
            "entityRows": [{"fields": {"driver_id": 1}}],
        }
    )
    assert rows[0]["rides:trip_cost"] == 10.0


# ------------------------------------------------- codec property sweep


def test_codec_round_trip_property():
    """Hypothesis: any batch of rows over the four wire types — mixed
    full refs and bare names, any magnitudes incl. negatives and
    non-finite doubles — survives serialize → IPC → read unchanged, and
    a full client round trip through an identity transform returns the
    same columns (the codec half of the r12 REST property pattern)."""
    import math as _math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    col_specs = {
        "t:i32": st.integers(-(2**31), 2**31 - 1).map(np.int32),
        "i64": st.integers(-(2**62), 2**62),
        "t:f32": st.floats(-1e30, 1e30).map(np.float32),
        "d": st.floats(allow_nan=False, allow_infinity=True),
    }

    @given(
        st.lists(
            st.fixed_dictionaries(col_specs), min_size=1, max_size=8
        )
    )
    @settings(max_examples=25, deadline=None)
    def check(rows):
        table = read_arrow_ipc(serialize_values_into_arrow_ipc(rows))
        assert table.num_rows == len(rows)
        # bare-name stripping is total: t:i32 -> i32, t:f32 -> f32
        assert set(table.schema.names) == {"i32", "i64", "f32", "d"}
        for i, row in enumerate(rows):
            assert table.column("i32")[i].as_py() == int(row["t:i32"])
            assert table.column("i64")[i].as_py() == row["i64"]
            got = table.column("d")[i].as_py()
            assert got == row["d"] or (
                _math.isinf(got) and _math.isinf(row["d"])
            )
            assert table.column("f32")[i].as_py() == pytest.approx(
                float(row["t:f32"]), rel=1e-6
            )

    check()


# ------------------------------------------ gRPC seam twin of the server


def test_transformation_servicer_matches_http_server(scored_view):
    """The gRPC servicer adapter (TransformationServiceGrpc seam) and
    the HTTP server share one transport-independent core — identical
    response payload for the same request, INTERNAL GrpcCallError where
    HTTP returns 500."""
    import base64
    import json
    import urllib.request

    from feast_java_old_spark.transport.grpc_adapter import GrpcCallError
    from feast_java_old_spark.transport.transform_service import (
        TransformationServicer,
    )

    arrow_in = serialize_values_into_arrow_ipc(
        [{"rides:trip_cost": 10.0, "surge": 2.0}]
    )
    request = {
        "on_demand_feature_view_name": "scored",
        "project": "default",
        "transformation_input": {
            "arrow_value": base64.b64encode(arrow_in).decode()
        },
    }
    servicer = TransformationServicer({"scored": scored_view})
    grpc_resp = servicer.TransformFeatures(dict(request))

    with TransformServer({"scored": scored_view}) as srv:
        req = urllib.request.Request(
            f"{srv.base_url}/transform",
            data=json.dumps(request).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as resp:
            http_resp = json.loads(resp.read())
    assert grpc_resp == http_resp
    out = read_arrow_ipc(
        base64.b64decode(grpc_resp["transformation_output"]["arrow_value"])
    )
    assert out.column("score").to_pylist() == [20.0]

    with pytest.raises(GrpcCallError) as ei:
        servicer.TransformFeatures(
            {**request, "on_demand_feature_view_name": "nope"}
        )
    assert ei.value.code == "INTERNAL"


def test_controller_with_full_feature_names_kwarg_still_dispatches_odfv(
    spark, env
):
    """Regression: a controller constructed with full_feature_names=True
    (the plain-retrieval path's common kwarg) must not crash the ODFV
    dispatch — the serving plan forces it True internally."""
    from feast_java_old_spark.plans.serving_rest import (
        ServingServiceRestController,
    )

    reg, store, inproc, _ = env
    ctl = ServingServiceRestController(
        spark,
        reg,
        store,
        odfvs={"adjusted": inproc},
        request_ts=TS,
        full_feature_names=True,
    )
    rows = ctl.get_online_features(
        {
            "features": ["rides:trip_cost", "adjusted:adjusted_cost"],
            "entityRows": [{"fields": {"driver_id": 1, "surge": 2.0}}],
        }
    )
    assert rows[0]["adjusted:adjusted_cost"] == 20.0
    assert rows[0]["rides:trip_cost"] == 10.0


def test_response_int8_int16_float16_raise_internal_analog():
    """The response decoder's inner switches THROW on an Int of
    non-32/64 bitwidth and on half-precision floats (the reference's
    `default: throw Status.INTERNAL` arms, :253-262/:294-303) — only
    non-Int/non-FloatingPoint Arrow types are silently skipped."""
    import pyarrow as pa

    def payload(arr, name="score"):
        from feast_java_old_spark.transport.transform_service import (
            arrow_ipc_from_table,
        )

        return arrow_ipc_from_table(pa.table({name: arr}))

    values, statuses = [{}], [{}]
    for arr, msg in [
        (pa.array([1], type=pa.int8()), "bitWidth 8"),
        (pa.array([1], type=pa.int16()), "bitWidth 16"),
        (pa.array([np.float16(1.0)], type=pa.float16()), "precision HALF"),
    ]:
        with pytest.raises(TransformTypeError, match=msg):
            process_transform_features_response(
                payload(arr), "v", {"v:score"}, values, statuses
            )
    # a string column is neither Int nor FloatingPoint: silently skipped
    process_transform_features_response(
        payload(pa.array(["x"])), "v", {"v:score"}, values, statuses
    )
    assert values == [{}] and statuses == [{}]
    # UNREQUESTED int8 columns are skipped BEFORE the type switch
    # (:212-216 runs first) — no raise.
    process_transform_features_response(
        payload(pa.array([1], type=pa.int8())),
        "v",
        {"v:other"},
        values,
        statuses,
    )
    assert values == [{}]


def test_one_view_serves_both_topologies_transparently(spark, env):
    """The ADVICE scenario pinned: the SAME OnDemandFeatureView object —
    its transform written against bare input names, the only contract —
    produces identical rows in-process and through run_servers'
    three-process topology (transform_port toggled on)."""
    import json
    import urllib.request

    from feast_java_old_spark.transport.app import run_servers

    reg, store, view, _ = env
    rows_req = {
        "features": ["adjusted:adjusted_cost"],
        "entityRows": [{"fields": {"driver_id": 1, "surge": 2.0}}],
    }

    def post(base_url):
        req = urllib.request.Request(
            f"{base_url}/api/v1/features/online",
            data=json.dumps(rows_req).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read())

    # in-process topology (no transform_port)
    core, serving = run_servers(
        spark, reg, store_path=store, odfvs={"adjusted": view}
    )
    try:
        serving.controller.serve_kwargs["request_ts"] = TS
        inproc_rows = post(serving.base_url)
    finally:
        core.stop()
        serving.stop()
    # three-process topology (transform_port=0 → ephemeral socket)
    core, serving, fts = run_servers(
        spark,
        reg,
        store_path=store,
        odfvs={"adjusted": view},
        transform_port=0,
    )
    try:
        serving.controller.serve_kwargs["request_ts"] = TS
        service_rows = post(serving.base_url)
    finally:
        core.stop()
        serving.stop()
        fts.stop()
    assert inproc_rows == service_rows
    assert inproc_rows[0]["adjusted:adjusted_cost"] == 20.0


def test_colliding_bare_input_names_rejected(spark):
    """Two feature-ref inputs collapsing to one bare name would be
    indistinguishable to the transform (the reference would write a
    duplicate-named Arrow field) — rejected at apply time."""
    from feast_java_old_spark.operators.odfv import apply_odfv

    df = spark.createDataFrame(
        [(1, 1.0, 2.0)], "id long, a__x double, b__x double"
    )
    view = OnDemandFeatureView(
        name="v",
        inputs=["a:x", "b:x"],
        output_schema=T.StructType([T.StructField("y", T.DoubleType())]),
        transform=lambda pdf: pd.DataFrame({"y": pdf["x"]}),
    )
    with pytest.raises(ValueError, match="collide on bare feature names"):
        apply_odfv(df, view)


def test_wide_arrow_batch_clears_transform_body_cap(spark):
    """Body-cap sizing (r13 verdict #5): a 10k-row x 512-double-column
    mapInPandas batch — ~41 MiB of Arrow, ~55 MiB base64-inflated,
    OVER the generic transport's 32 MiB control-plane cap — must flow
    through the transformation service without a 413, because
    TransformServer's data-plane default is sized for real batch
    geometry (rows * cols * 8 * 4/3). Result pinned pointwise equal to
    the in-process twin."""
    from pyspark.sql import functions as F

    from feast_java_old_spark.operators.odfv import apply_odfv
    from feast_java_old_spark.transport.transform_service import (
        DEFAULT_TRANSFORM_MAX_BODY_BYTES,
        service_transform,
    )

    n_rows, n_cols = 10_000, 512
    assert n_rows * n_cols * 8 * 4 / 3 > 32 * 1024 * 1024  # over old cap
    assert n_rows * n_cols * 8 * 4 / 3 < DEFAULT_TRANSFORM_MAX_BODY_BYTES

    cols = [f"c{i}" for i in range(n_cols)]
    df = spark.range(n_rows).select(
        F.col("id").alias("user_id"),
        *[(F.col("id") * 1.0 + i).alias(c) for i, c in enumerate(cols)],
    )
    view = OnDemandFeatureView(
        name="wide",
        inputs=cols,
        output_schema=T.StructType([T.StructField("total", T.DoubleType())]),
        transform=lambda pdf: pd.DataFrame({"total": pdf.sum(axis=1)}),
    )
    inproc = (
        apply_odfv(df, view, drop_helper_inputs=True)
        .select("user_id", "total")
        .orderBy("user_id")
        .collect()
    )
    with TransformServer({"wide": view}) as srv:
        client_view = OnDemandFeatureView(
            name="wide",
            inputs=cols,
            output_schema=view.output_schema,
            transform=service_transform(
                f"{srv.host}:{srv.port}", "wide", ["total"], timeout=300.0
            ),
        )
        remote = (
            apply_odfv(df, client_view, drop_helper_inputs=True)
            .select("user_id", "total")
            .orderBy("user_id")
            .collect()
        )
    assert len(remote) == n_rows
    assert inproc == remote


def test_concurrent_executor_batches_one_transform_socket(spark):
    """Concurrency stress (r13 verdict #6): 16 partitions of
    mapInPandas batches hammer ONE TransformServer socket in parallel
    (local[32] task slots, each Python worker holding a keep-alive
    connection) — the ThreadingHTTPServer analog must not serialize or
    cross-wire executor batches; results stay pointwise equal to the
    in-process twin."""
    from pyspark.sql import functions as F

    from feast_java_old_spark.operators.odfv import apply_odfv
    from feast_java_old_spark.transport.transform_service import (
        service_transform,
    )

    df = (
        spark.range(20_000)
        .repartition(16)
        .select(
            F.col("id").alias("user_id"),
            (F.col("id") % 97 * 1.5).alias("value"),
        )
    )
    view = OnDemandFeatureView(
        name="scored",
        inputs=["value"],
        output_schema=T.StructType([T.StructField("score", T.DoubleType())]),
        transform=lambda pdf: pd.DataFrame({"score": pdf["value"] * 2.0 + 1.0}),
    )
    inproc = (
        apply_odfv(df, view).select("user_id", "score").orderBy("user_id").collect()
    )
    with TransformServer({"scored": view}) as srv:
        client_view = OnDemandFeatureView(
            name="scored",
            inputs=["value"],
            output_schema=view.output_schema,
            transform=service_transform(
                f"{srv.host}:{srv.port}", "scored", ["score"], timeout=120.0
            ),
        )
        remote = (
            apply_odfv(df, client_view)
            .select("user_id", "score")
            .orderBy("user_id")
            .collect()
        )
    assert len(remote) == 20_000
    assert inproc == remote


def test_transformation_client_connection_reuse():
    """The serving-side client keeps ONE keep-alive socket across RPCs
    (the blocking-stub shape) and reconnects transparently after the
    server drops it."""
    view = OnDemandFeatureView(
        name="scored",
        inputs=["trip_cost"],
        output_schema=T.StructType([T.StructField("score", T.DoubleType())]),
        transform=lambda pdf: pd.DataFrame({"score": pdf["trip_cost"] * 2.0}),
    )
    payload = serialize_values_into_arrow_ipc([{"rides:trip_cost": 5.0}])
    with TransformServer({"scored": view}) as srv:
        client = HttpTransformationService(f"{srv.host}:{srv.port}")
        out1 = client.transform_features("scored", payload)
        conn1 = client._conn
        out2 = client.transform_features("scored", payload)
        assert client._conn is conn1  # reused, not redialed
        assert out1 == out2
        # server-side drop: force a stale socket, the next call recovers
        client._conn.close()
        out3 = client.transform_features("scored", payload)
        assert out3 == out1
        client.close()
        assert client._conn is None
