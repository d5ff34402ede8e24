"""Property-based checks of the round-3 operator algebra against
independent pure-python oracles (SURVEY §5 model: golden fixtures in the
reference, randomized-oracle checks here)."""

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from feast_java_old_spark.operators import features

T0 = dt.datetime(2024, 1, 1)

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (user, minute) -> value; unique minutes per user → no tie ambiguity
series = st.dictionaries(
    keys=st.tuples(st.integers(0, 2), st.integers(0, 60)),
    values=st.floats(-50, 50, allow_nan=False, width=32),
    min_size=1,
    max_size=30,
)


def _rows(data):
    return [
        (u, T0 + dt.timedelta(minutes=m), u * 1000 + m, float(v))
        for (u, m), v in data.items()
    ]


@SLOW
@given(data=series, alpha=st.sampled_from([0.1, 0.25, 0.5]))
def test_ewma_matches_pure_python(spark, data, alpha):
    df = spark.createDataFrame(
        _rows(data),
        "user_id long, event_timestamp timestamp, event_id long, value double",
    )
    got = {
        r.user_id: (r.n_events, r.ewma)
        for r in features.ewma_features(
            df, ["user_id"], "value", seq_col="event_id", alpha=alpha
        ).collect()
    }
    per_user: dict = {}
    for (u, m), v in sorted(data.items()):
        per_user.setdefault(u, []).append((m, float(v)))
    for u, seq in per_user.items():
        vals = [v for _, v in sorted(seq)]
        acc = vals[0]
        for x in vals[1:]:
            acc = acc * (1 - alpha) + x * alpha
        assert got[u][0] == len(vals)
        # HALF_UP like Spark's F.round (and the DuckDB gate oracle) —
        # Python's banker's round() diverges on binary-exact halves
        # (hypothesis found acc = 0.0390625: Spark 0.039063, round()
        # 0.039062)
        import decimal

        expect = float(
            decimal.Decimal(acc).quantize(
                decimal.Decimal("1e-6"), rounding=decimal.ROUND_HALF_UP
            )
        )
        assert abs(got[u][1] - expect) < 1e-6


@SLOW
@given(data=series, split=st.integers(0, 60))
def test_merge_rollups_any_split_equals_full(spark, data, split):
    df = spark.createDataFrame(
        _rows(data),
        "user_id long, event_timestamp timestamp, event_id long, value double",
    )
    cut = F.lit(T0 + dt.timedelta(minutes=split)).cast("timestamp")
    old = features.mergeable_rollup(
        df.where(F.col("event_timestamp") < cut), ["user_id"], "value"
    )
    delta = features.mergeable_rollup(
        df.where(F.col("event_timestamp") >= cut), ["user_id"], "value"
    )
    merged = {
        r.user_id: (r.n_events, r.sum_cents, r.min_cents, r.max_cents)
        for r in features.merge_rollups(["user_id"], old, delta).collect()
    }
    full = {
        r.user_id: (r.n_events, r.sum_cents, r.min_cents, r.max_cents)
        for r in features.mergeable_rollup(df, ["user_id"], "value").collect()
    }
    assert merged == full


@SLOW
@given(data=series)
def test_scd2_join_matches_per_row_scan(spark, data):
    """Each fact row must land on the SCD2 version whose interval covers
    its timestamp — compared against a brute-force python scan of the
    change log."""
    df = spark.createDataFrame(
        _rows(data),
        "user_id long, ts timestamp, event_id long, value double",
    ).withColumn("attr", (F.col("value") > 0).cast("string"))
    hist = features.scd2_history(df, ["user_id"], ["attr"])
    facts = df.select(
        "user_id", F.col("ts").alias("event_timestamp"), "event_id"
    )
    got = {
        r["event_id"]: r["version"]
        for r in features.scd2_join(facts, hist, ["user_id"]).select(
            F.col("f.event_id").alias("event_id"), F.col("h.version")
        ).collect()
    }
    # pure-python: change-collapse then interval scan
    per_user: dict = {}
    for (u, m), v in sorted(data.items()):
        per_user.setdefault(u, []).append((m, str(float(v) > 0)))
    for u, seq in per_user.items():
        seq.sort()
        versions = []  # (start_minute, attr)
        for m, a in seq:
            if not versions or versions[-1][1] != a:
                versions.append((m, a))
        for m, _ in seq:
            ver = max(
                i + 1 for i, (s, _) in enumerate(versions) if s <= m
            )
            assert got[u * 1000 + m] == ver
