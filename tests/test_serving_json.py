"""Golden tests for the REST-facing response JSON mapping.

Mirrors ``ResponseJSONMapper.java:28-72`` (flat field→value maps,
proto-unset → null) and the ``{fields, statuses}`` response assembly of
``OnlineServingServiceTest.java``'s three status scenarios:
PRESENT (:137-202), NOT_FOUND for absent keys (:205-265), and
OUTSIDE_MAX_AGE (:268-346) — same compound entity (entity1 int64 +
entity2 string), same featuretable_1:feature_1/feature_2 refs, entity
fields always PRESENT, non-PRESENT features null-valued.
"""

import datetime as dt

import pytest
from pyspark.sql import types as T

from feast_java_old_spark.operators.materialize import materialize
from feast_java_old_spark.operators.retrieval import get_online_features
from feast_java_old_spark.plans.serving_json import (
    response_rows,
    response_to_json,
)
from feast_java_old_spark.registry.model import (
    Entity,
    Feature,
    FeatureTable,
    FileSource,
    ValueType,
)
from feast_java_old_spark.registry.registry import Registry

TS = dt.datetime(2024, 1, 15, 12, 0, 0)
REFS = ["featuretable_1:feature_1", "featuretable_1:feature_2"]


def _env(spark, tmp_path, tmp_store, max_age_secs):
    src = str(tmp_path / "ft1_src")
    schema = T.StructType(
        [
            T.StructField("entity1", T.LongType()),
            T.StructField("entity2", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("feature_1", T.StringType()),
            T.StructField("feature_2", T.StringType()),
        ]
    )
    rows = [
        (1, "a", TS - dt.timedelta(seconds=10), "1", "2"),
        (2, "b", TS - dt.timedelta(seconds=10), "3", "4"),
    ]
    spark.createDataFrame(rows, schema).write.parquet(src)
    reg = Registry()
    reg.apply_entity(Entity("entity1", ValueType.INT64))
    reg.apply_entity(Entity("entity2", ValueType.STRING))
    reg.apply_feature_table(
        FeatureTable(
            name="featuretable_1",
            entities=["entity1", "entity2"],
            features=[
                Feature("feature_1", ValueType.STRING),
                Feature("feature_2", ValueType.STRING),
            ],
            max_age_secs=max_age_secs,
            batch_source=FileSource(file_url=src, event_timestamp_column="ts"),
        )
    )
    materialize(spark, reg, "featuretable_1", tmp_store)
    return reg


def _serve(spark, reg, store, rows, request_ts=TS):
    return get_online_features(
        spark, reg, rows, REFS, store, request_ts=request_ts
    )


def test_present_rows_map_to_fields_and_statuses(spark, tmp_path, tmp_store):
    reg = _env(spark, tmp_path, tmp_store, max_age_secs=7200)
    df = _serve(
        spark, reg, tmp_store,
        [{"entity1": 1, "entity2": "a"}, {"entity1": 2, "entity2": "b"}],
    )
    got = response_rows(df, REFS)
    assert got == [
        {
            "fields": {
                "entity1": 1,
                "entity2": "a",
                "featuretable_1:feature_1": "1",
                "featuretable_1:feature_2": "2",
            },
            "statuses": {
                "entity1": "PRESENT",
                "entity2": "PRESENT",
                "featuretable_1:feature_1": "PRESENT",
                "featuretable_1:feature_2": "PRESENT",
            },
        },
        {
            "fields": {
                "entity1": 2,
                "entity2": "b",
                "featuretable_1:feature_1": "3",
                "featuretable_1:feature_2": "4",
            },
            "statuses": {
                "entity1": "PRESENT",
                "entity2": "PRESENT",
                "featuretable_1:feature_1": "PRESENT",
                "featuretable_1:feature_2": "PRESENT",
            },
        },
    ]


def test_absent_keys_are_not_found_with_null_fields(spark, tmp_path, tmp_store):
    reg = _env(spark, tmp_path, tmp_store, max_age_secs=7200)
    df = _serve(
        spark, reg, tmp_store,
        [{"entity1": 1, "entity2": "a"}, {"entity1": 9, "entity2": "z"}],
    )
    got = response_rows(df, REFS)
    # row 1 fully PRESENT; row 2's features unset + NOT_FOUND, entities PRESENT
    assert got[0]["statuses"]["featuretable_1:feature_1"] == "PRESENT"
    assert got[1] == {
        "fields": {
            "entity1": 9,
            "entity2": "z",
            "featuretable_1:feature_1": None,
            "featuretable_1:feature_2": None,
        },
        "statuses": {
            "entity1": "PRESENT",
            "entity2": "PRESENT",
            "featuretable_1:feature_1": "NOT_FOUND",
            "featuretable_1:feature_2": "NOT_FOUND",
        },
    }


def test_max_age_exceeded_is_outside_max_age_with_null_fields(
    spark, tmp_path, tmp_store
):
    reg = _env(spark, tmp_path, tmp_store, max_age_secs=1)
    df = _serve(
        spark, reg, tmp_store, [{"entity1": 1, "entity2": "a"}],
    )
    [row] = response_rows(df, REFS)
    assert row["fields"]["featuretable_1:feature_1"] is None
    assert row["statuses"]["featuretable_1:feature_1"] == "OUTSIDE_MAX_AGE"
    assert row["statuses"]["entity1"] == "PRESENT"


def test_flat_json_mapper_shape(spark, tmp_path, tmp_store):
    """ResponseJSONMapper flattens to one map per row, unset → null."""
    reg = _env(spark, tmp_path, tmp_store, max_age_secs=7200)
    df = _serve(
        spark, reg, tmp_store,
        [{"entity1": 1, "entity2": "a"}, {"entity1": 9, "entity2": "z"}],
    )
    got = response_to_json(df, REFS)
    assert got == [
        {
            "entity1": 1,
            "entity2": "a",
            "featuretable_1:feature_1": "1",
            "featuretable_1:feature_2": "2",
        },
        {
            "entity1": 9,
            "entity2": "z",
            "featuretable_1:feature_1": None,
            "featuretable_1:feature_2": None,
        },
    ]


def test_bare_feature_names_still_map_to_refs(spark, tmp_path, tmp_store):
    reg = _env(spark, tmp_path, tmp_store, max_age_secs=7200)
    df = get_online_features(
        spark, reg, [{"entity1": 1, "entity2": "a"}], REFS, tmp_store,
        request_ts=TS, full_feature_names=False,
    )
    [row] = response_rows(df, REFS)
    assert row["fields"]["featuretable_1:feature_1"] == "1"


def test_response_rows_guards_table_sized_pull(spark):
    """r12 (verdict wart #2): response_rows is request-batch-sized by
    contract; a mis-wired table-sized frame errors instead of silently
    collecting onto the driver."""
    import pytest as _pytest

    from feast_java_old_spark.plans.serving_json import response_rows

    df = spark.range(50).withColumnRenamed("id", "driver")
    with _pytest.raises(ValueError, match="max_rows"):
        response_rows(df, max_rows=10)
    assert len(response_rows(df, max_rows=50)) == 50
