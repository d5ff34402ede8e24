"""Property-based check of online-retrieval semantics (SURVEY §5: the
reference proves correctness with golden fixtures; we add randomized
histories/requests against an independent pure-python oracle)."""

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import feast_java_old_spark as fs
from feast_java_old_spark.operators import get_online_features
from feast_java_old_spark.operators.materialize import latest_per_key
from feast_java_old_spark.registry.model import FileSource

T0 = dt.datetime(2024, 1, 1)
REQ_TS = T0 + dt.timedelta(minutes=120)


def t(minute: int) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minute)


# unique (entity, minute) pairs → no latest-row tie ambiguity
histories = st.dictionaries(
    keys=st.tuples(st.integers(0, 4), st.integers(0, 100)),
    values=st.one_of(st.none(), st.floats(-100, 100, allow_nan=False)),
    min_size=0,
    max_size=25,
)
requests = st.lists(st.integers(0, 6), min_size=1, max_size=8)
max_ages = st.sampled_from([0, 3600])


def oracle(history: dict, keys: list[int], max_age: int):
    latest: dict[int, tuple[int, object]] = {}
    for (e, minute), v in history.items():
        if e not in latest or minute > latest[e][0]:
            latest[e] = (minute, v)
    out = []
    for k in keys:
        if k not in latest:
            out.append((k, None, "NOT_FOUND"))
            continue
        minute, v = latest[k]
        age = int((REQ_TS - t(minute)).total_seconds())
        if max_age and age > max_age:
            out.append((k, None, "OUTSIDE_MAX_AGE"))
        elif v is None:
            out.append((k, None, "NULL_VALUE"))
        else:
            out.append((k, v, "PRESENT"))
    return out


@pytest.fixture(scope="module")
def reg_factory():
    def make(max_age):
        reg = fs.Registry()
        reg.apply_entity(fs.Entity("user_id", fs.ValueType.INT64))
        reg.apply_feature_table(
            fs.FeatureTable(
                name="ft",
                entities=["user_id"],
                features=[fs.Feature("value", fs.ValueType.DOUBLE)],
                max_age_secs=max_age,
                batch_source=FileSource(
                    file_url="/nonexistent", event_timestamp_column="event_timestamp"
                ),
            )
        )
        return reg

    return make


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(history=histories, keys=requests, max_age=max_ages)
def test_online_retrieval_matches_pure_python_oracle(
    spark, reg_factory, history, keys, max_age
):
    rows = [(e, t(m), v) for (e, m), v in history.items()]
    if rows:
        hist_df = spark.createDataFrame(
            rows, "user_id long, event_timestamp timestamp, value double"
        )
        online = latest_per_key(hist_df, ["user_id"], "event_timestamp")
    else:
        online = spark.createDataFrame(
            [], "user_id long, event_timestamp timestamp, value double"
        )
    got = get_online_features(
        spark,
        reg_factory(max_age),
        [{"user_id": k} for k in keys],
        ["ft:value"],
        request_ts=REQ_TS,
        online_frames={"ft": online},
    ).collect()
    want = oracle(history, keys, max_age)
    assert len(got) == len(want)
    for g, (k, v, status) in zip(got, want):
        assert g.user_id == k
        assert g.ft__value__status == status
        if v is None:
            assert g.ft__value is None
        else:
            assert g.ft__value == pytest.approx(v)


# ---------------------------------------------------------- historical as-of

asof_histories = st.dictionaries(
    keys=st.tuples(st.integers(0, 3), st.integers(0, 48)),  # (entity, hour)
    values=st.floats(-100, 100, allow_nan=False),
    min_size=0,
    max_size=20,
)
asof_requests = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 48)), min_size=1, max_size=10
)


def asof_oracle(history: dict, reqs: list, max_age_hours):
    out = []
    for e, rh in reqs:
        cands = [
            (h, v)
            for (he, h), v in history.items()
            if he == e
            and h <= rh
            and (max_age_hours is None or rh - h <= max_age_hours)
        ]
        if cands:
            h, v = max(cands)
            out.append((e, rh, v))
        else:
            out.append((e, rh, None))
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    history=asof_histories,
    reqs=asof_requests,
    max_age_hours=st.sampled_from([None, 12]),
    strategy=st.sampled_from(["union", "join"]),
)
def test_asof_join_matches_pure_python_oracle(
    spark, history, reqs, max_age_hours, strategy
):
    from feast_java_old_spark.operators.historical import asof_join

    def th(h):
        return T0 + dt.timedelta(hours=h)

    hist_rows = [(e, th(h), v) for (e, h), v in history.items()]
    hist_df = spark.createDataFrame(
        hist_rows or [],
        "user_id long, event_timestamp timestamp, score double",
    )
    req_df = spark.createDataFrame(
        [(e, th(h)) for e, h in reqs],
        "user_id long, request_ts timestamp",
    )
    out = asof_join(
        req_df,
        hist_df,
        ["user_id"],
        max_age_secs=max_age_hours * 3600 if max_age_hours else None,
        strategy=strategy,
    ).collect()
    got = sorted((r.user_id, r.request_ts, r.score) for r in out)
    want = sorted((e, th(h), v) for e, h, v in asof_oracle(history, reqs, max_age_hours))
    assert len(got) == len(want)
    for (ge, gt_, gv), (we, wt, wv) in zip(got, want):
        assert (ge, gt_) == (we, wt)
        if wv is None:
            assert gv is None
        else:
            assert gv == pytest.approx(wv)
