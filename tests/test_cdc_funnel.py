"""Goldens for CDC apply, per-group normalization, strict-order funnel,
and cohort retention."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from feast_java_old_spark.operators import features
from feast_java_old_spark.operators.materialize import apply_cdc


def ts(seconds: float):
    return dt.datetime(2024, 1, 1, 0) + dt.timedelta(seconds=seconds)


# --------------------------------------------------------------- CDC


def test_apply_cdc_latest_wins_and_tombstones(spark):
    rows = [
        (1, ts(0), 1, "I", 10.0),
        (1, ts(10), 2, "U", 20.0),   # key 1 final: 20.0
        (2, ts(0), 3, "I", 5.0),
        (2, ts(20), 4, "D", None),   # key 2 deleted
        (3, ts(5), 5, "I", 7.0),
        (3, ts(5), 6, "D", None),    # ts tie -> seq 6 wins -> deleted
        (4, ts(9), 8, "D", None),
        (4, ts(9), 7, "I", 3.0),     # tie -> seq 8 (D) wins -> deleted
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_timestamp timestamp, seq long, op string, value double"
    )
    out = {
        r.user_id: r.value
        for r in apply_cdc(df, ["user_id"], seq_col="seq").collect()
    }
    assert out == {1: 20.0}


def test_apply_cdc_reinsert_after_delete(spark):
    df = spark.createDataFrame(
        [(1, ts(0), 1, "I", 1.0), (1, ts(10), 2, "D", None), (1, ts(20), 3, "I", 9.0)],
        "user_id long, event_timestamp timestamp, seq long, op string, value double",
    )
    out = apply_cdc(df, ["user_id"], seq_col="seq").collect()
    assert len(out) == 1 and out[0].value == 9.0


# ----------------------------------------------------- normalization


def test_normalize_features_group_scalings(spark):
    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 2.0), ("a", 3, 3.0), ("b", 4, 5.0)],
        "grp string, event_id long, value double",
    )
    out = {r.event_id: r for r in features.normalize_features(df, ["grp"]).collect()}
    # group a: mean 2, sd 1, min 1, max 3
    assert out[1].zscore == -1.0 and out[3].zscore == 1.0 and out[2].zscore == 0.0
    assert out[1].minmax == 0.0 and out[2].minmax == 0.5 and out[3].minmax == 1.0
    assert out[1].pct_rank == 0.0 and out[3].pct_rank == 1.0
    # singleton group: degenerate scalings are NULL, rank 0
    assert out[4].zscore is None and out[4].minmax is None
    assert out[4].pct_rank == 0.0


def test_normalize_features_single_exchange_plan(spark):
    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 2.0)], "grp string, event_id long, value double"
    )
    plan = (
        features.normalize_features(df, ["grp"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


# ----------------------------------------------------------- funnel


@pytest.fixture(scope="module")
def funnel_events(spark):
    rows = [
        # user 1: full conversion in order
        (1, ts(0), "view"), (1, ts(10), "cart"), (1, ts(20), "buy"),
        # user 2: cart before any view -> only view counts later
        (2, ts(0), "cart"), (2, ts(10), "view"), (2, ts(5), "other"),
        # user 3: view and cart same instant -> strict order broken at cart
        (3, ts(0), "view"), (3, ts(0), "cart"), (3, ts(10), "buy"),
        # user 4: full funnel, uses SECOND cart (first is pre-view)
        (4, ts(0), "cart"), (4, ts(5), "view"), (4, ts(9), "cart"),
        (4, ts(12), "buy"),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")


def test_funnel_strict_order(spark, funnel_events):
    out = {
        r.user_id: r
        for r in features.funnel(
            funnel_events, ["user_id"], ["view", "cart", "buy"]
        ).collect()
    }
    us = lambda s: int(ts(s).timestamp() * 1_000_000)

    r1 = out[1]
    assert (r1.ts_1_us, r1.ts_2_us, r1.ts_3_us) == (us(0), us(10), us(20))
    assert r1.stages_reached == 3

    r2 = out[2]
    assert (r2.ts_1_us, r2.ts_2_us, r2.ts_3_us) == (us(10), None, None)
    assert r2.stages_reached == 1

    r3 = out[3]  # cart at the same instant as view does NOT count
    assert (r3.ts_1_us, r3.ts_2_us, r3.ts_3_us) == (us(0), None, None)

    r4 = out[4]  # second cart (after view) carries the funnel
    assert (r4.ts_1_us, r4.ts_2_us, r4.ts_3_us) == (us(5), us(9), us(12))


def test_funnel_user_with_no_stage_events_absent(spark):
    df = spark.createDataFrame(
        [(9, ts(0), "other")], "user_id long, ts timestamp, event_type string"
    )
    assert features.funnel(df, ["user_id"], ["view", "cart"]).count() == 0


# -------------------------------------------------- cohort retention


def test_cohort_retention_matrix(spark):
    day = 86400
    rows = [
        (1, ts(0)), (1, ts(8 * day)),        # cohort p0, active offsets 0 and 1
        (2, ts(1 * day)), (2, ts(2 * day)),  # cohort p0, offset 0 twice
        (3, ts(8 * day)),                    # cohort p1, offset 0
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (r.cohort_period, r.period_offset): r.n_active
        for r in features.cohort_retention(df, ["user_id"], period_days=7).collect()
    }
    p0 = int(ts(0).timestamp() * 1_000_000) // (7 * day * 1_000_000)
    assert out[(p0, 0)] == 2
    assert out[(p0, 1)] == 1
    assert out[(p0 + 1, 0)] == 1
    assert len(out) == 3
