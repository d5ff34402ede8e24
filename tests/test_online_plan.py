"""Full serving-plan tests: mixed regular + ODFV requests (SURVEY §3.1)."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import types as T

import feast_java_old_spark as fs
from feast_java_old_spark.operators.materialize import materialize
from feast_java_old_spark.operators.odfv import OnDemandFeatureView
from feast_java_old_spark.plans import serve_online_features
from feast_java_old_spark.registry.model import FileSource

TS = dt.datetime(2024, 1, 15, 12, 0, 0)


@pytest.fixture()
def env(spark, tmp_path, tmp_store):
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, TS - dt.timedelta(seconds=100), 10.0, 3.0),
         (2, TS - dt.timedelta(seconds=200), 20.0, 5.0)],
        "driver_id long, ts timestamp, trip_cost double, trip_distance double",
    ).write.parquet(src)
    reg = fs.Registry()
    reg.apply_entity(fs.Entity("driver_id", fs.ValueType.INT64))
    reg.apply_feature_table(
        fs.FeatureTable(
            "rides", ["driver_id"],
            [fs.Feature("trip_cost", fs.ValueType.DOUBLE),
             fs.Feature("trip_distance", fs.ValueType.DOUBLE)],
            max_age_secs=7200,
            batch_source=FileSource(file_url=src, event_timestamp_column="ts"),
        )
    )
    materialize(spark, reg, "rides", tmp_store)
    odfv = OnDemandFeatureView(
        name="adjusted",
        inputs=["rides:trip_cost", "surge"],
        output_schema=T.StructType([T.StructField("adjusted_cost", T.DoubleType())]),
        transform=lambda pdf: pd.DataFrame(
            {"adjusted_cost": pdf["trip_cost"] * pdf["surge"]}
        ),
    )
    return reg, tmp_store, {"adjusted": odfv}


def test_mixed_request_with_helper_expansion(spark, env):
    """ODFV helper input (rides:trip_cost) is auto-retrieved and dropped;
    directly-requested features are kept."""
    reg, store, odfvs = env
    rows = [
        {"driver_id": 1, "surge": 2.0},
        {"driver_id": 2, "surge": 1.5},
        {"driver_id": 9, "surge": 3.0},
    ]
    out = serve_online_features(
        spark, reg, rows,
        ["rides:trip_distance", "adjusted:adjusted_cost"],
        store_path=store, odfvs=odfvs, request_ts=TS,
    )
    cols = out.columns
    assert "rides__trip_distance" in cols and "adjusted_cost" in cols
    assert "rides__trip_cost" not in cols  # helper dropped (J5)
    rs = out.collect()
    assert rs[0].adjusted_cost == 20.0  # 10 * 2
    assert rs[1].adjusted_cost == 30.0  # 20 * 1.5
    assert rs[0].rides__trip_distance == 3.0
    assert rs[2].rides__trip_distance__status == "NOT_FOUND"
    assert rs[0].adjusted_cost__status == "PRESENT"


def test_helper_also_requested_is_kept(spark, env):
    reg, store, odfvs = env
    rows = [{"driver_id": 1, "surge": 2.0}]
    out = serve_online_features(
        spark, reg, rows,
        ["rides:trip_cost", "adjusted:adjusted_cost"],
        store_path=store, odfvs=odfvs, request_ts=TS,
    )
    assert "rides__trip_cost" in out.columns
    assert out.collect()[0].rides__trip_cost == 10.0


def test_missing_request_data_rejected(spark, env):
    reg, store, odfvs = env
    with pytest.raises(ValueError, match="request data"):
        serve_online_features(
            spark, reg, [{"driver_id": 1}], ["adjusted:adjusted_cost"],
            store_path=store, odfvs=odfvs, request_ts=TS,
        )


def test_odfv_only_request(spark, env):
    reg, store, odfvs = env
    out = serve_online_features(
        spark, reg, [{"driver_id": 2, "surge": 2.0}],
        ["adjusted:adjusted_cost"], store_path=store, odfvs=odfvs, request_ts=TS,
    )
    assert out.collect()[0].adjusted_cost == 40.0
    assert "rides__trip_cost" not in out.columns
