"""Tumbling / sliding / session rollup kernels — hand-computed goldens."""

import datetime as dt

import pytest

from feast_java_old_spark.operators import windows


def ts(minute: float):
    return dt.datetime(2024, 1, 1, 0) + dt.timedelta(minutes=minute)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: two sessions (gap at 45 min >= 30 min gap)
        (1, ts(0), 1.0, "a"),
        (1, ts(10), 2.0, "a"),
        (1, ts(55), 4.0, "b"),
        # user 2: one session spanning an hour boundary
        (2, ts(50), 8.0, "a"),
        (2, ts(70), 16.0, "a"),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double, event_type string"
    )


def test_tumbling(events):
    out = {
        (r.window_start_us, r.event_type): (r.n_events, r.sum_value_cents)
        for r in windows.tumbling_rollup(events, ["event_type"]).collect()
    }
    h0 = int(ts(0).timestamp() * 1_000_000)
    h1 = int(ts(60).timestamp() * 1_000_000)
    assert out == {
        (h0, "a"): (3, 1100),
        (h0, "b"): (1, 400),
        (h1, "a"): (1, 1600),
    }


def test_sliding_each_event_in_two_windows(events):
    out = windows.sliding_rollup(events, ["event_type"]).collect()
    # every event contributes to exactly duration/slide = 2 windows
    assert sum(r.n_events for r in out) == 2 * events.count()
    m30 = int(ts(30).timestamp() * 1_000_000)
    by = {(r.window_start_us, r.event_type): r.n_events for r in out}
    # window [00:30, 01:30) of type "a" holds events at 50 and 70 min
    assert by[(m30, "a")] == 2


def test_sessions(events):
    out = {
        (r.user_id, r.session_start_us): (r.n_events, r.sum_value_cents, r.span_us)
        for r in windows.session_rollup(events, ["user_id"]).collect()
    }
    us = lambda m: int(ts(m).timestamp() * 1_000_000)  # noqa: E731
    assert out == {
        (1, us(0)): (2, 300, 10 * 60_000_000),
        (1, us(55)): (1, 400, 0),
        (2, us(50)): (2, 2400, 20 * 60_000_000),
    }


def test_session_boundary_exact_gap_merges(spark):
    # Spark's session end is closed for merging: an event at exactly
    # last + gap joins the session; one microsecond past it does not.
    def mk(minutes):
        rows = [(1, ts(0), 1.0, "a"), (1, ts(minutes), 2.0, "a")]
        return spark.createDataFrame(
            rows, "user_id long, ts timestamp, value double, event_type string"
        )

    assert len(windows.session_rollup(mk(30), ["user_id"]).collect()) == 1
    assert len(windows.session_rollup(mk(30 + 1e-6 / 60), ["user_id"]).collect()) == 2


# ------------------------------------------------------------ interval_join


def test_interval_join_matches_theta_join(spark):
    import datetime as dt

    from feast_java_old_spark.operators.windows import interval_join

    t0 = dt.datetime(2024, 1, 1)
    events = spark.createDataFrame(
        [(i, t0 + dt.timedelta(hours=i)) for i in range(100)],
        "event_id long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [
            (1, t0, t0 + dt.timedelta(hours=10)),
            (2, t0 + dt.timedelta(hours=5), t0 + dt.timedelta(hours=7)),
            (3, t0 + dt.timedelta(hours=200), t0 + dt.timedelta(hours=300)),
        ],
        "interval_id long, start timestamp, end timestamp",
    )
    banded = interval_join(events, iv, ts_col="ts", band_seconds=3600 * 4)
    theta = events.join(
        iv, (events.ts >= iv.start) & (events.ts < iv.end)
    )
    a = sorted((r.event_id, r.interval_id) for r in banded.collect())
    b = sorted((r.event_id, r.interval_id) for r in theta.collect())
    assert a == b
    assert len(a) == 10 + 2  # [0,10) hours + [5,7) hours; interval 3 empty


def test_interval_join_is_equi_join_in_plan(spark, sf_dir):
    from feast_java_old_spark.operators.windows import interval_join
    from feast_java_old_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    events = load_table(spark, sf_dir, "events")
    iv = events.select(
        F.lit(1).alias("interval_id"),
        F.min("ts").alias("start"),
        F.max("ts").alias("end"),
    ).groupBy("interval_id").agg(
        F.min("start").alias("start"), F.max("end").alias("end")
    )
    plan = (
        interval_join(events, iv, ts_col="ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan


# --------------------------------------------------------------- sessionize


def test_sessionize_gap_rule_and_ordinals(spark):
    import datetime as dt

    from feast_java_old_spark.operators.windows import sessionize

    t0 = dt.datetime(2024, 1, 1)

    def t(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    df = spark.createDataFrame(
        [
            (1, 1, t(0)),
            (2, 1, t(10)),
            (3, 1, t(40)),   # exactly 30 min after -> same session (closed end)
            (4, 1, t(71)),   # 31 min -> new session
            (5, 2, t(0)),    # other key independent
        ],
        "event_id long, user_id long, ts timestamp",
    )
    out = {r.event_id: r for r in sessionize(df, ["user_id"]).collect()}
    assert out[1].session_seq == 1 and out[1].gap_us is None
    assert out[2].session_seq == 1
    assert out[3].session_seq == 1  # gap == 30 min merges
    assert out[4].session_seq == 2
    assert out[5].session_seq == 1


def test_sessionize_groups_match_session_rollup(spark, sf_dir):
    from feast_java_old_spark.operators.windows import sessionize, session_rollup
    from feast_java_old_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    events = load_table(spark, sf_dir, "events")
    per_event = sessionize(events, ["user_id"], gap="30 minutes")
    n_sessions = per_event.groupBy("user_id").agg(
        F.max("session_seq").alias("n")
    )
    rollup = session_rollup(events, ["user_id"], gap="30 minutes")
    n_rollup = rollup.groupBy("user_id").count()
    a = {r.user_id: r.n for r in n_sessions.collect()}
    b = {r.user_id: r["count"] for r in n_rollup.collect()}
    assert a == b  # same session partitioning per key


def test_sliding_distinct_exact_and_approx(spark):
    from feast_java_old_spark.operators.windows import sliding_distinct
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 30)
    rows = []
    # hour 0: users 1,2 (duplicated events); hour 3: users 2,3; hour 7: user 9
    for h, users in [(0, [1, 2, 2, 1]), (3, [2, 3]), (7, [9])]:
        for u in users:
            rows.append((u, base + dt.timedelta(hours=h)))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        r.window_start_us: r.n_distinct
        for r in sliding_distinct(
            df, "user_id", duration="6 hours", slide="2 hours"
        ).collect()
    }
    us = lambda h: int((dt.datetime(2024, 1, 1) + dt.timedelta(hours=h)).timestamp() * 1e6)  # noqa: E731
    # window [0,6): users {1,2,3}; window [2,8): {2,3,9}; window [-4,2): {1,2}
    assert out[us(0)] == 3
    assert out[us(2)] == 3
    assert out[us(-4)] == 2
    # every event appears in exactly 3 windows
    assert len(out) > 0
    approx = {
        r.window_start_us: r.n_distinct
        for r in sliding_distinct(
            df, "user_id", duration="6 hours", slide="2 hours",
            strategy="approx",
        ).collect()
    }
    assert set(approx) == set(out)
    for k in out:
        assert abs(approx[k] - out[k]) <= max(1, 0.1 * out[k])
