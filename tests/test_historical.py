"""Point-in-time (as-of) retrieval tests — J3 historical form.

Both physical strategies (single-shuffle union-window and range-join)
must agree with each other and with hand-computed expectations.
"""

import datetime as dt

import pytest

from feast_java_old_spark.operators.historical import asof_join, get_historical_features

T0 = dt.datetime(2024, 1, 1)


def t(h):
    return T0 + dt.timedelta(hours=h)


@pytest.fixture(scope="module")
def frames(spark):
    history = spark.createDataFrame(
        [
            (1, t(0), 10.0),
            (1, t(2), 20.0),
            (1, t(4), None),   # latest value can be NULL — must not fall back
            (2, t(1), 5.0),
        ],
        "user_id long, event_timestamp timestamp, score double",
    )
    requests = spark.createDataFrame(
        [
            (1, t(1)),   # → row@t0 (10.0)
            (1, t(2)),   # → row@t2 inclusive (20.0)
            (1, t(5)),   # → row@t4 (NULL value, but matched)
            (2, t(0)),   # → no row yet (NOT_FOUND)
            (3, t(9)),   # → unknown key
        ],
        "user_id long, request_ts timestamp",
    )
    return history, requests


@pytest.mark.parametrize("strategy", ["union", "join", "bucketed"])
def test_asof_semantics(spark, frames, strategy):
    history, requests = frames
    out = asof_join(
        requests, history, ["user_id"], strategy=strategy,
        bucket_duration_secs=3600,
    ).orderBy("user_id", "request_ts")
    rows = [r.asDict() for r in out.collect()]
    assert [r["score"] for r in rows] == [10.0, 20.0, None, None, None]
    assert rows[2]["event_timestamp"] == t(4)  # matched row, null value
    assert rows[3]["event_timestamp"] is None  # no row before request
    assert rows[4]["event_timestamp"] is None  # unknown key


@pytest.mark.parametrize("strategy", ["union", "join", "bucketed"])
def test_asof_max_age(spark, frames, strategy):
    history, requests = frames
    out = asof_join(
        requests, history, ["user_id"], max_age_secs=3600, strategy=strategy,
        bucket_duration_secs=3600,
    ).orderBy("user_id", "request_ts")
    rows = [r.asDict() for r in out.collect()]
    # request t1 ← event t0: age exactly 3600 → within (inclusive)
    assert rows[0]["score"] == 10.0
    # request t5 ← event t4: 3600 within; value still null
    assert rows[2]["event_timestamp"] == t(4)


def test_statuses(spark, frames):
    history, requests = frames
    out = get_historical_features(
        requests, history, ["user_id"], max_age_secs=1800, include_statuses=True
    ).orderBy("user_id", "request_ts")
    rows = [r.asDict() for r in out.collect()]
    assert rows[0]["score__status"] == "OUTSIDE_MAX_AGE"  # t1←t0, 3600 > 1800
    assert rows[0]["score"] is None
    assert rows[1]["score__status"] == "PRESENT"          # t2←t2, age 0
    assert rows[3]["score__status"] == "NOT_FOUND"
    assert rows[4]["score__status"] == "NOT_FOUND"


def test_strategies_agree_on_real_data(spark, sf_dir):
    """Property check on the synthetic events table: the two physical
    strategies must produce identical results."""
    from feast_java_old_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    history = events.selectExpr(
        "user_id", "ts as event_timestamp", "value", "event_type"
    )
    requests = (
        events.groupBy("user_id")
        .agg({"ts": "max"})
        .selectExpr("user_id", "`max(ts)` - INTERVAL 1 DAY as request_ts")
    )
    a = asof_join(requests, history, ["user_id"], strategy="union")
    b = asof_join(requests, history, ["user_id"], strategy="join")
    c = asof_join(
        requests, history, ["user_id"], strategy="bucketed",
        bucket_duration_secs=86400,
    )
    cols = sorted(a.columns)
    for other in (b, c):
        assert a.select(*cols).exceptAll(other.select(*cols)).count() == 0
        assert other.select(*cols).exceptAll(a.select(*cols)).count() == 0


def test_tiebreak_agrees_across_strategies(spark):
    """Equal-timestamp history rows: highest tiebreak wins identically in
    the window path (union/bucketed carry-in) and the max(struct) path."""
    history = spark.createDataFrame(
        [(1, t(0), 100, 1.0), (1, t(0), 200, 2.0), (1, t(2), 50, 3.0),
         (1, t(2), 60, 4.0), (2, t(1), 7, 5.0)],
        "user_id long, event_timestamp timestamp, created long, score double",
    )
    requests = spark.createDataFrame(
        [(1, t(0)), (1, t(3)), (2, t(6))],
        "user_id long, request_ts timestamp",
    )
    outs = {}
    for strategy in ("union", "join", "bucketed"):
        rows = (
            asof_join(
                requests, history, ["user_id"], strategy=strategy,
                feature_cols=["score"], tiebreak_col="created",
                bucket_duration_secs=3600,
            )
            .orderBy("user_id", "request_ts")
            .collect()
        )
        outs[strategy] = [(r.user_id, r.score) for r in rows]
    assert outs["union"] == [(1, 2.0), (1, 4.0), (2, 5.0)]
    assert outs["join"] == outs["union"]
    assert outs["bucketed"] == outs["union"]


def test_get_training_dataset_multi_table(spark, tmp_path):
    """Registry-driven multi-table point-in-time export (the feast
    get_historical_features(entity_df, features) API)."""
    import feast_java_old_spark as fs
    from feast_java_old_spark.operators.historical import get_training_dataset
    from feast_java_old_spark.registry.model import FileSource

    clicks = str(tmp_path / "clicks")
    spark.createDataFrame(
        [(1, t(0), 10.0), (1, t(2), 20.0), (2, t(1), 5.0)],
        "user_id long, event_timestamp timestamp, n_clicks double",
    ).write.parquet(clicks)
    spend = str(tmp_path / "spend")
    spark.createDataFrame(
        [(1, t(1), 100.0), (2, t(3), 50.0)],
        "user_id long, event_timestamp timestamp, total double",
    ).write.parquet(spend)

    reg = fs.Registry()
    reg.apply_entity(fs.Entity("user_id", fs.ValueType.INT64))
    for name, src, feat in (
        ("clicks", clicks, "n_clicks"),
        ("spend", spend, "total"),
    ):
        reg.apply_feature_table(
            fs.FeatureTable(
                name, ["user_id"], [fs.Feature(feat, fs.ValueType.DOUBLE)],
                batch_source=FileSource(
                    file_url=src, event_timestamp_column="event_timestamp"
                ),
            )
        )

    entity_df = spark.createDataFrame(
        [(1, t(1)), (1, t(3)), (2, t(2)), (3, t(5))],
        "user_id long, event_timestamp timestamp",
    )
    out = get_training_dataset(
        spark, reg, entity_df, ["clicks:n_clicks", "spend:total"]
    ).collect()
    assert [r.user_id for r in out] == [1, 1, 2, 3]
    assert [r.clicks__n_clicks for r in out] == [10.0, 20.0, 5.0, None]
    assert [r.spend__total for r in out] == [100.0, 100.0, None, None]
