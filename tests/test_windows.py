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
