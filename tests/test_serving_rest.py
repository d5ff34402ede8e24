"""Serving REST controller goldens — ServingServiceRestController.java
:36-66 parity: /api/v1/info's version stamp, /api/v1/features/online's
RequestHelper validation messages, the proto-JSON request shapes
(camelCase / snake_case / bare field maps / Value-wrapper unwrap /
per-row timestamps), and the flat ResponseJSONMapper output."""

import datetime as dt

import pytest
from pyspark.sql import types as T

from feast_java_old_spark import __version__
from feast_java_old_spark.operators.materialize import materialize
from feast_java_old_spark.plans.serving_json import FEAST_SERVING_TYPE_ONLINE
from feast_java_old_spark.plans.serving_rest import (
    ServingServiceRestController,
)
from feast_java_old_spark.registry.model import (
    Entity,
    Feature,
    FeatureTable,
    FileSource,
    ValueType,
)
from feast_java_old_spark.registry.registry import Registry
from feast_java_old_spark.registry.validation import ValidationError

TS = dt.datetime(2024, 1, 15, 12, 0, 0)


@pytest.fixture()
def controller(spark, tmp_path, tmp_store):
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
    return ServingServiceRestController(
        spark, reg, tmp_store, request_ts=TS
    )


def test_info_stamps_version_over_service_response(controller):
    """getInfo:48-53 — the controller overwrites the version field with
    the build properties' version."""
    assert controller.get_info() == {
        "version": __version__,
        "type": FEAST_SERVING_TYPE_ONLINE,
    }
    stamped = ServingServiceRestController(
        controller.spark, controller.registry, version="7.7"
    )
    assert stamped.get_info()["version"] == "7.7"


def test_online_features_flat_json_rows(controller):
    """The ResponseJSONMapper shape: one flat field->value map per
    entity row, entities echoed back, input order preserved."""
    body = controller.get_online_features(
        {
            "features": [{"featureTable": "driver_stats", "name": "rating"}],
            "entityRows": [
                {"fields": {"driver": 2}},
                {"fields": {"driver": 1}},
            ],
        }
    )
    assert body == [
        {"driver": 2, "driver_stats:rating": 3.0},
        {"driver": 1, "driver_stats:rating": 4.5},
    ]


def test_online_features_accepts_snake_case_strings_and_wrappers(controller):
    """snake_case keys, "table:feature" ref strings, bare field maps,
    and single-key proto Value wrappers all parse to the same request."""
    body = controller.get_online_features(
        {
            "features": ["driver_stats:rating"],
            "entity_rows": [{"driver": {"int64Val": 1}}],
        }
    )
    assert body == [{"driver": 1, "driver_stats:rating": 4.5}]


def test_online_features_not_found_is_null(controller):
    body = controller.get_online_features(
        {
            "features": ["driver_stats:rating"],
            "entityRows": [{"fields": {"driver": 404}}],
        }
    )
    assert body == [{"driver": 404, "driver_stats:rating": None}]


def test_online_features_row_timestamp_feeds_max_age(controller):
    """A proto-JSON EntityRow timestamp (ISO-8601, Z suffix) becomes
    that row's request time in the reference's max-age math
    (OnlineServingServiceV2.java:365-370): the stored event is at
    11:59:50 and max_age is 3600 s, so a 12:00:00 request is inside the
    age window and a 14:00:00 request is OUTSIDE_MAX_AGE (null value in
    the flat JSON)."""
    body = controller.get_online_features(
        {
            "features": ["driver_stats:rating"],
            "entityRows": [
                {"fields": {"driver": 1}, "timestamp": "2024-01-15T12:00:00Z"},
                {"fields": {"driver": 1}, "timestamp": "2024-01-15T14:00:00Z"},
            ],
        }
    )
    assert body[0]["driver_stats:rating"] == 4.5
    assert body[1]["driver_stats:rating"] is None


def test_mixed_timestamp_rows_default_to_request_time(controller):
    """A batch mixing timestamped and untimestamped EntityRows: the
    unset timestamp falls back to the request time (the reference's
    proto-seconds-0 → now semantics, OnlineServingServiceV2.java:
    366-368) instead of a NULL request time poisoning the max-age
    check; and the event_timestamp input never echoes back as a
    response field (found by the end-to-end drive, late r11)."""
    body = controller.get_online_features(
        {
            "features": ["driver_stats:rating"],
            "entityRows": [
                {"fields": {"driver": 1}},
                {"fields": {"driver": 2}, "timestamp": "2024-01-15T12:00:00Z"},
            ],
        }
    )
    assert body == [
        {"driver": 1, "driver_stats:rating": 4.5},
        {"driver": 2, "driver_stats:rating": 3.0},
    ]


def test_request_helper_validation_messages(controller):
    """RequestHelper.java:25-42 — the reference's exact
    IllegalArgumentException messages, raised BEFORE any retrieval."""
    with pytest.raises(ValidationError, match="Entity value must be provided"):
        controller.get_online_features(
            {"features": ["driver_stats:rating"], "entityRows": []}
        )
    with pytest.raises(
        ValidationError,
        match="FeatureTable name must be provided in FeatureReference",
    ):
        controller.get_online_features(
            {
                "features": [{"name": "rating"}],
                "entityRows": [{"fields": {"driver": 1}}],
            }
        )
    with pytest.raises(
        ValidationError,
        match="Feature name must be provided in FeatureReference",
    ):
        controller.get_online_features(
            {
                "features": [{"featureTable": "driver_stats"}],
                "entityRows": [{"fields": {"driver": 1}}],
            }
        )


# ---- property tests (pure Python, no Spark): the request-parsing
# invariants behind /api/v1/features/online.


def test_parse_entity_rows_properties():
    """Hypothesis sweep: ISO-8601 Z / offset timestamps normalize to
    naive UTC; wrapper unwrap touches only single-key *Val dicts;
    bare maps and {"fields": ...} parse identically."""
    import datetime as _dt

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from feast_java_old_spark.plans.serving_rest import (
        _parse_entity_rows,
        _unwrap_value,
    )

    @given(
        st.datetimes(
            min_value=_dt.datetime(1980, 1, 1),
            max_value=_dt.datetime(2100, 1, 1),
        ),
        st.integers(min_value=-14 * 60, max_value=14 * 60),
    )
    @settings(max_examples=200, deadline=None)
    def iso_roundtrip(ts, off_min):
        off = _dt.timezone(_dt.timedelta(minutes=off_min))
        iso = ts.replace(tzinfo=off).isoformat()
        (row,) = _parse_entity_rows([{"fields": {"k": 1}, "timestamp": iso}])
        expect = (ts - _dt.timedelta(minutes=off_min)).replace(tzinfo=None)
        assert row["event_timestamp"] == expect

    iso_roundtrip()

    @given(
        st.one_of(
            st.integers(), st.floats(allow_nan=False), st.text(max_size=20)
        )
    )
    @settings(max_examples=100, deadline=None)
    def unwrap_passthrough(v):
        assert _unwrap_value(v) == v
        assert _unwrap_value({"int64Val": v}) == v
        # multi-key dicts are NOT wrappers
        assert _unwrap_value({"int64Val": v, "x": 1}) == {
            "int64Val": v,
            "x": 1,
        }

    unwrap_passthrough()

    # bare map == {"fields": map}
    a = _parse_entity_rows([{"k": 7}])
    b = _parse_entity_rows([{"fields": {"k": 7}}])
    assert a == b == [{"k": 7}]


# ---- ADVICE r12: list-Value unwrap, bare-map timestamp, bad timestamps.


def test_unwrap_list_value_wrappers():
    """Proto-JSON list oneof arms nest the payload one level deeper:
    {"int64ListVal": {"val": [...]}} must unwrap to the LIST, and a
    dict surviving unwrap is malformed, not forwarded."""
    from feast_java_old_spark.plans.serving_rest import _unwrap_value
    from feast_java_old_spark.registry.validation import ValidationError

    assert _unwrap_value({"int64ListVal": {"val": [1, 2]}}) == [1, 2]
    assert _unwrap_value({"string_list_val": {"val": ["a"]}}) == ["a"]
    # tolerated shortcut: the arm carrying the JSON array directly
    assert _unwrap_value({"doubleListVal": [1.5]}) == [1.5]
    # empty list message → empty list
    assert _unwrap_value({"int64ListVal": {}}) == []
    with pytest.raises(ValidationError, match="list Value wrapper"):
        _unwrap_value({"int64ListVal": {"val": 3}})
    with pytest.raises(ValidationError, match="scalar oneof"):
        _unwrap_value({"int64Val": {"val": 3}})


def test_bare_map_timestamp_stays_an_entity_field():
    """Only the {"fields": ...} EntityRow shape carries the proto
    'timestamp' field; on a bare map a field named timestamp is data."""
    from feast_java_old_spark.plans.serving_rest import _parse_entity_rows

    (row,) = _parse_entity_rows([{"driver": 1, "timestamp": "x"}])
    assert row == {"driver": 1, "timestamp": "x"}
    assert "event_timestamp" not in row


def test_bad_timestamp_is_validation_error_not_schema_crash():
    from feast_java_old_spark.plans.serving_rest import _parse_entity_rows
    from feast_java_old_spark.registry.validation import ValidationError

    with pytest.raises(ValidationError, match="not ISO-8601"):
        _parse_entity_rows(
            [{"fields": {"driver": 1}, "timestamp": "not-a-time"}]
        )
    with pytest.raises(ValidationError, match="ISO-8601 string or"):
        _parse_entity_rows(
            [{"fields": {"driver": 1}, "timestamp": {"seconds": 5}}]
        )


# ---- r12: randomized REST-parse ≡ native-rows equivalence (the r11
# mixed-timestamp bug class, generalized).


def test_rest_rows_equal_native_serve_pointwise(controller):
    """Hypothesis sweep over randomized entity-row batches — mixed
    present/missing/NULL keys × absent/Z/offset/stale timestamps ×
    wrapper/native values: the REST path (proto-JSON parse →
    get_online_features → flat maps) must agree POINTWISE with
    serve_online_features fed the equivalent native rows, both on
    values and on statuses (flat None ⟺ status != PRESENT)."""
    import datetime as _dt

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from feast_java_old_spark.plans.online_plan import serve_online_features
    from feast_java_old_spark.plans.serving_json import response_rows

    REF = "driver_stats:rating"
    FRESH = TS - _dt.timedelta(seconds=5)
    STALE = TS - _dt.timedelta(seconds=7200)  # beyond max_age 3600

    key_strategy = st.sampled_from([1, 2, 404, None])
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
        rest_rows = []
        native_rows = []
        for key, wrap, ts_mode in batch:
            value = {"int64Val": key} if wrap and key is not None else key
            er = {"fields": {"driver": value}}
            native = {"driver": key}
            if ts_mode != "absent":
                ts = STALE if ts_mode == "stale" else FRESH
                er["timestamp"] = iso(ts, ts_mode)
                native["event_timestamp"] = ts
            rest_rows.append(er)
            native_rows.append(native)

        flat = controller.get_online_features(
            {"features": [REF], "entityRows": rest_rows}
        )
        oracle = response_rows(
            serve_online_features(
                controller.spark,
                controller.registry,
                native_rows,
                [REF],
                controller.store_path,
                request_ts=TS,
            ),
            [REF],
        )
        assert len(flat) == len(oracle) == len(batch)
        for frow, orow in zip(flat, oracle):
            assert frow["driver"] == orow["fields"]["driver"]
            assert frow[REF] == orow["fields"][REF]
            status = orow["statuses"][REF]
            assert (frow[REF] is None) == (status != "PRESENT")

    check()
