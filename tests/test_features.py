"""Feature-engineering operators (features.py) + skew join — goldens."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from feast_java_old_spark.operators import features, joins


def ts(seconds: float):
    return dt.datetime(2024, 1, 1, 0) + dt.timedelta(seconds=seconds)


def us(seconds: float) -> int:
    return int(ts(seconds).timestamp() * 1_000_000)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # (user, ts, value, event_id)
        (1, ts(0), 1.0, 1),
        (1, ts(30), 2.0, 2),
        (1, ts(30), 4.0, 5),  # timestamp tie with id=2
        (1, ts(3630), 8.0, 3),
        (2, ts(100), 16.0, 4),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double, event_id long"
    )


# ------------------------------------------------------------ multi-horizon


def test_multi_window_features_horizons(spark, events):
    out = {
        r.user_id: r
        for r in features.multi_window_features(
            events,
            ["user_id"],
            anchor_ts="2024-01-01 00:01:40",  # = ts(100)
            horizons={"1m": 60, "1h": 3600},
            ts_col="ts",
            value_col="value",
        ).collect()
    }
    # user 1 events at/before anchor: t=0, 30, 30 — none in (t=40, t=100],
    # all three in the 1h horizon (zero-filled short horizon, not NULL)
    assert (out[1].n_1m, out[1].sum_cents_1m) == (0, 0)
    assert (out[1].n_1h, out[1].sum_cents_1h) == (3, 700)
    # user 2: one event exactly at the anchor — included
    assert (out[2].n_1m, out[2].sum_cents_1m) == (1, 1600)


def test_multi_window_boundary_exclusive_start(spark, events):
    # anchor - h falls exactly on t=0 → strict > excludes it
    out = features.multi_window_features(
        events, ["user_id"], "2024-01-01 00:01:00", {"1m": 60}
    ).collect()
    u1 = next(r for r in out if r.user_id == 1)
    assert u1.n_1m == 2  # the two t=30 events, not t=0


# --------------------------------------------------------------- rolling


def test_rolling_features_trailing_window_and_ties(spark, events):
    out = {
        r.event_id: r
        for r in features.rolling_features(
            events, ["user_id"], window_seconds=3600
        ).collect()
    }
    assert (out[1].n_trailing, out[1].sum_cents_trailing) == (1, 100)
    # RANGE frame: equal timestamps are peers — both tie rows see both
    assert (out[2].n_trailing, out[2].sum_cents_trailing) == (3, 700)
    assert (out[5].n_trailing, out[5].sum_cents_trailing) == (3, 700)
    # t=3630 sees [30, 3630]: both t=30 rows + itself, t=0 aged out
    assert (out[3].n_trailing, out[3].sum_cents_trailing) == (3, 1400)
    assert (out[4].n_trailing, out[4].sum_cents_trailing) == (1, 1600)


# ----------------------------------------------------------------- pivot


def test_feature_pivot_explicit_names(spark):
    rows = [
        (1, "click", 1.5),
        (1, "click", 2.0),
        (1, "view", 4.0),
        (2, "view", 8.0),
        (2, "error", 1.0),  # not in names → dropped
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, value double")
    out = {
        r.user_id: r
        for r in features.feature_pivot(
            df, ["user_id"], "event_type", ["click", "view"]
        ).collect()
    }
    assert (out[1].sum_cents_click, out[1].sum_cents_view) == (350, 400)
    assert (out[2].sum_cents_click, out[2].sum_cents_view) == (0, 800)
    assert set(out[1].asDict()) == {"user_id", "sum_cents_click", "sum_cents_view"}


# ----------------------------------------------------------- asof_nearest


def test_asof_nearest_tie_and_tolerance(spark):
    left = spark.createDataFrame(
        [(1, ts(100), 1), (1, ts(500), 2), (2, ts(100), 3)],
        "user_id long, ts timestamp, event_id long",
    )
    right = spark.createDataFrame(
        [
            (1, ts(130), 10, 5.0),
            (1, ts(70), 11, 7.0),
            (2, ts(400), 12, 9.0),
        ],
        "user_id long, ts timestamp, event_id long, value double",
    )
    out = {
        r.event_id: r
        for r in features.asof_nearest(
            left, right, ["user_id"], tolerance_seconds=60,
            right_payload=["value"],
        ).collect()
    }
    assert len(out) == 3
    # |Δ|=30s both directions → tie resolves to the EARLIER right ts
    assert out[1].nearest_event_id == 11
    assert out[1].delta_us == -30 * 1_000_000
    assert out[1].nearest_value == 7.0
    # nothing within 60s → kept with NULLs
    assert out[2].nearest_event_id is None and out[2].delta_us is None
    assert out[3].nearest_event_id is None


def test_asof_nearest_across_band_boundary(spark):
    # band size = tolerance = 60s; left at t=59 (band 0), right at t=61
    # (band 1) — must still match through the replicated band
    left = spark.createDataFrame(
        [(1, ts(59), 1)], "user_id long, ts timestamp, event_id long"
    )
    right = spark.createDataFrame(
        [(1, ts(61), 10)], "user_id long, ts timestamp, event_id long"
    )
    out = features.asof_nearest(
        left, right, ["user_id"], tolerance_seconds=60, right_id="event_id"
    ).collect()
    assert out[0].nearest_event_id == 10 and out[0].delta_us == 2_000_000


def test_asof_nearest_prefers_smaller_abs_delta(spark):
    left = spark.createDataFrame(
        [(1, ts(100), 1)], "user_id long, ts timestamp, event_id long"
    )
    right = spark.createDataFrame(
        [(1, ts(90), 10), (1, ts(104), 11), (1, ts(170), 12)],
        "user_id long, ts timestamp, event_id long",
    )
    out = features.asof_nearest(
        left, right, ["user_id"], tolerance_seconds=120
    ).collect()
    assert out[0].nearest_event_id == 11 and out[0].delta_us == 4_000_000


# -------------------------------------------------------------- skew_join


@pytest.fixture(scope="module")
def skew_tables(spark):
    # hot key 1 (8 rows), cold keys 2/3; key 4 misses the dim
    fact = spark.createDataFrame(
        [(1, i * 1.0) for i in range(8)]
        + [(2, 100.0), (3, 200.0), (4, 300.0)],
        "k long, v double",
    )
    dim = spark.createDataFrame(
        [(1, "hot"), (2, "cold"), (3, "cold")], "k long, attr string"
    )
    return fact, dim


def test_skew_join_matches_plain_join(spark, skew_tables):
    fact, dim = skew_tables
    for how in ("inner", "left"):
        got = sorted(
            (r.k, r.v, r.attr)
            for r in joins.skew_join(fact, dim, ["k"], salt=4, how=how).collect()
        )
        want = sorted(
            (r.k, r.v, r.attr) for r in fact.join(dim, "k", how).collect()
        )
        assert got == want, how


def test_skew_join_salts_the_join_key(spark, skew_tables):
    fact, dim = skew_tables
    out = joins.skew_join(fact, dim, ["k"], salt=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan
    with pytest.raises(ValueError):
        joins.skew_join(fact, dim, ["k"], how="full")


# ----------------------------------------------------------- target_encode


def test_target_encode_smoothed_toward_global_mean(spark):
    rows = [("a", 1.0), ("a", 3.0), ("b", 10.0)] + [("c", 2.0)] * 40
    df = spark.createDataFrame(rows, "cat string, value double")
    out = {
        r.cat: r
        for r in features.target_encode(df, ["cat"], "value", smoothing=2.0).collect()
    }
    # global mean cents = (100+300+1000+40*200)/43
    g = (100 + 300 + 1000 + 40 * 200) / 43
    exp_a = (400 + 2.0 * g) / (2 + 2.0)
    exp_b = (1000 + 2.0 * g) / (1 + 2.0)
    assert out["a"].enc_cents_micro == round(exp_a * 1e6)
    assert out["b"].enc_cents_micro == round(exp_b * 1e6)
    assert out["a"].n == 2
    # well-supported category barely moves from its own mean (200 cents)
    assert abs(out["c"].enc_cents_micro / 1e6 - 200) < 1


# --------------------------------------------------------------- winsorize


def test_winsorize_clips_tails_per_group(spark):
    rows = [("g", float(i), i) for i in range(1, 101)]  # 1..100
    rows += [("h", 5.0, 200), ("h", 6.0, 201), ("h", 7.0, 202)]
    df = spark.createDataFrame(rows, "grp string, value double, event_id long")
    out = {
        r.event_id: r
        for r in features.winsorize(
            df, ["grp"], "value", lo=0.05, hi=0.95
        ).collect()
    }
    # group g: p05 of 1..100 = 5.95, p95 = 95.05 (linear interpolation)
    assert out[1].value_winsorized == 5.95 and out[1].was_clipped == 1
    assert out[100].value_winsorized == 95.05 and out[100].was_clipped == 1
    assert out[50].value_winsorized == 50.0 and out[50].was_clipped == 0
    # group h: its own percentiles, middle value untouched
    assert out[201].was_clipped == 0
    assert out[200].was_clipped == 1 and out[202].was_clipped == 1


def test_robust_outliers_resists_extreme_value(spark):
    """One huge value must be flagged WITHOUT dragging the threshold:
    median/MAD ignore it, so the bulk stays inliers; a mean/std z-score
    on the same data would mask it (sd inflated by the outlier)."""
    from feast_java_old_spark.operators.features import robust_outliers

    vals = [10.0, 11.0, 12.0, 10.5, 11.5, 9.5, 10.8, 1000.0]
    rows = [("a", i, v) for i, v in enumerate(vals)]
    rows += [("b", 100 + i, 5.0) for i in range(4)] + [("b", 200, 7.0)]
    df = spark.createDataFrame(rows, "grp string, event_id long, value double")
    out = {(r.grp, r.event_id): r for r in
           robust_outliers(df, ["grp"], "value", id_col="event_id").collect()}
    flags = {k[1]: v.is_outlier for k, v in out.items() if k[0] == "a"}
    assert flags[7] is True           # the 1000.0
    assert all(not flags[i] for i in range(7))
    # degenerate group b: MAD = 0 -> null z, only exact deviants flagged
    assert out[("b", 200)].mod_z is None and out[("b", 200)].is_outlier is True
    assert out[("b", 100)].is_outlier is False


def test_weighted_quantiles_hand_computed(spark):
    """Weighted CDF inverse on hand-checkable data: values 10/20/30
    with weights 1/1/2 -> W=4: p25 is the first value reaching cw>=1
    (10), p50 the first reaching cw>=2 (20), p75 the first reaching
    cw>=3 (30). An unweighted twin (all weights 1) must reduce to the
    plain lower-quantile; duplicate values pre-aggregate (two w=1 rows
    of the same value act as one w=2 row)."""
    from feast_java_old_spark.operators.features import weighted_quantiles

    df = spark.createDataFrame(
        [
            ("a", 10, 1), ("a", 20, 1), ("a", 30, 2),
            # b: duplicates of 5 (1+1) then 9 (2): W=4, p50 at cw>=2 -> 5
            ("b", 5, 1), ("b", 5, 1), ("b", 9, 2),
        ],
        "g string, v long, w long",
    )
    out = {
        r.g: r
        for r in weighted_quantiles(
            df, "v", "w", ["g"], quantiles=[(1, 4), (2, 4), (3, 4)]
        ).collect()
    }
    assert (out["a"].p25, out["a"].p50, out["a"].p75) == (10, 20, 30)
    assert out["a"].total_weight == 4
    assert (out["b"].p25, out["b"].p50, out["b"].p75) == (5, 5, 9)

    # unweighted (w=1) == plain lower quantile over the multiset
    uw = spark.createDataFrame(
        [("u", v, 1) for v in [3, 1, 4, 1, 5, 9, 2, 6]],
        "g string, v long, w long",
    )
    r = weighted_quantiles(uw, "v", "w", ["g"], [(2, 4)]).collect()[0]
    # sorted: 1 1 2 3 4 5 6 9, W=8, first cw>=4 is value 3
    assert r.p50 == 3
