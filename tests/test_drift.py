"""Feature-drift (PSI) operator tests."""

import datetime as dt

import pytest

from feast_java_old_spark.operators.drift import feature_drift

T_REF = dt.datetime(2024, 1, 1)
T_CUR = dt.datetime(2024, 2, 1)
SPLIT = dt.datetime(2024, 1, 15)


def _rows(values_ref, values_cur, group="a"):
    return [(group, T_REF, float(v)) for v in values_ref] + [
        (group, T_CUR, float(v)) for v in values_cur
    ]


def test_psi_zero_for_identical_distributions(spark):
    vals = [i % 10 for i in range(1000)]
    df = spark.createDataFrame(
        _rows(vals, vals), "g string, ts timestamp, v double"
    )
    out = feature_drift(
        df, "v", "ts", SPLIT, group_cols=["g"], bins=10
    ).collect()
    assert len(out) == 1
    assert out[0].psi == pytest.approx(0.0, abs=1e-6)
    assert out[0].n_ref == 1000 and out[0].n_cur == 1000


def test_psi_large_for_shifted_distribution(spark):
    ref = [i % 10 for i in range(1000)]          # uniform on [0, 9]
    cur = [9 for _ in range(1000)]               # collapsed to one bucket
    df = spark.createDataFrame(
        _rows(ref, cur), "g string, ts timestamp, v double"
    )
    out = feature_drift(df, "v", "ts", SPLIT, group_cols=["g"], bins=10).collect()
    assert out[0].psi > 1.0  # way past the 0.25 action threshold


def test_psi_per_group_and_constant_reference(spark):
    rows = _rows([1, 2, 3, 4] * 50, [1, 2, 3, 4] * 50, group="stable") + _rows(
        [5.0] * 100, [5.0] * 60 + [50.0] * 40, group="const_ref"
    )
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    out = {r.g: r for r in feature_drift(df, "v", "ts", SPLIT, group_cols=["g"]).collect()}
    assert out["stable"].psi == pytest.approx(0.0, abs=1e-6)
    # vmax == vmin in reference -> everything lands in bucket 0, and the
    # out-of-range current values still count there (clamped) => PSI 0
    assert out["const_ref"].psi == pytest.approx(0.0, abs=1e-6)


def test_psi_ungrouped(spark):
    df = spark.createDataFrame(
        _rows(list(range(100)), list(range(50, 150))),
        "g string, ts timestamp, v double",
    )
    out = feature_drift(df, "v", "ts", SPLIT).collect()
    assert len(out) == 1 and out[0].psi > 0.1


def test_ks_drift_matches_pure_python_and_edges(spark):
    """Exact KS against a brute-force python CDF sweep, plus the
    analytic edges: identical samples -> 0, disjoint supports -> 1,
    one-sided groups -> NULL."""
    import datetime as dt

    from feast_java_old_spark.operators.drift import ks_drift

    split = dt.datetime(2024, 1, 16)
    t_ref, t_cur = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 20)
    import random

    random.seed(3)
    rows = []
    ref_a = [round(random.gauss(0, 1), 3) for _ in range(80)]
    cur_a = [round(random.gauss(0.7, 1.3), 3) for _ in range(60)]
    rows += [("a", t_ref, v) for v in ref_a]
    rows += [("a", t_cur, v) for v in cur_a]
    rows += [("same", t_ref, float(v % 7)) for v in range(50)]
    rows += [("same", t_cur, float(v % 7)) for v in range(50)]
    rows += [("disj", t_ref, float(v)) for v in range(10)]
    rows += [("disj", t_cur, float(v + 100)) for v in range(10)]
    rows += [("oneside", t_ref, 1.0)]
    # NULL measurements are not CDF sample points (and engines disagree
    # on NULL sort position) -- they must not move the statistic
    rows += [("a", t_ref, None), ("a", t_cur, None)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")

    def brute(ref, cur):
        vals = sorted(set(ref) | set(cur))
        nr, nc = len(ref), len(cur)
        return max(
            abs(
                sum(1 for x in ref if x <= v) * nc
                - sum(1 for x in cur if x <= v) * nr
            )
            for v in vals
        ) / (nr * nc)

    out = {
        r.event_type: r
        for r in ks_drift(df, "value", "ts", split, ["event_type"]).collect()
    }
    assert out["a"].ks == round(brute(ref_a, cur_a), 6)
    assert out["same"].ks == 0.0
    assert out["disj"].ks == 1.0
    assert out["oneside"].ks is None
    assert out["a"].n_ref == 80 and out["a"].n_cur == 60


def test_cusum_closed_form_equals_recursion(spark):
    """The windowed closed form C_i - min(0, min_j<=i C_j) must equal
    the textbook recursion S_i = max(0, S_{i-1} + d_i) point for point,
    and the detector fires on a sustained shift but not on noise."""
    import datetime as dt

    from feast_java_old_spark.operators.drift import cusum_alerts

    split = dt.datetime(2024, 1, 16)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # ref: mean 10.00 exactly
    for i in range(20):
        rows.append(("g", t0 + dt.timedelta(hours=i), i, 10.0))
    # cur: oscillates +-3 around 10 (no alarm), then sustained +2 shift
    cur_vals = [13.0, 7.0, 13.0, 7.0] + [12.0] * 12
    for i, v in enumerate(cur_vals):
        rows.append(
            ("g", dt.datetime(2024, 1, 20) + dt.timedelta(hours=i), 100 + i, v)
        )
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id long, value double"
    )
    out = cusum_alerts(
        df, "value", "ts", split, ["event_type"],
        allowance_cents=50,       # k = 10.00 + 0.50
        threshold_cents=400,      # alarm at S > 4.00
        id_col="event_id",
    ).collect()

    # python recursion over the same cur sequence
    s, alarms = 0, []
    for i, v in enumerate(cur_vals):
        d = round(v * 100) - 1000 - 50
        s = max(0, s + d)
        if s > 400:
            alarms.append((100 + i, s))
    got = sorted((r.s_cents) for r in out)
    assert got == sorted(s for _, s in alarms)
    assert len(alarms) > 0  # the shift IS detected
    # oscillation alone never alarms: first alarm index is in the
    # sustained-shift tail
    first = min(i for i, _ in alarms)
    assert first >= 104
