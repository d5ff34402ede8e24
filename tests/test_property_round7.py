"""Property-based checks of the round-7 operators against independent
pure-python oracles (SURVEY §5 model: golden fixtures in the reference,
randomized-oracle checks here).

Three algebraic guarantees no single-fixture test pins:
* global_sort_ranks equals the naive global row_number on ANY data —
  duplicates, skew, negatives, NULLs — at any bucket count;
* bloom_prune_join is row-identical to the plain join for ANY key sets
  and any (k, bits), including saturated filters (correct, just
  unselective);
* event_transitions equals a pure-python per-key bigram count under
  arbitrary interleavings, with ties broken by the tiebreak column.
"""

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from feast_java_old_spark.operators import sketches
from feast_java_old_spark.operators.layout import global_sort_ranks
from feast_java_old_spark.operators.windows import event_transitions

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

T0 = dt.datetime(2024, 1, 1)


@SLOW
@given(
    vals=st.lists(
        st.one_of(
            st.none(), st.integers(-40, 40).map(float)
        ),
        min_size=1,
        max_size=120,
    ),
    buckets=st.sampled_from([2, 7, 64]),
)
def test_global_sort_ranks_any_data_any_buckets(spark, vals, buckets):
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v double")
    got = {
        r.id: r.global_rank
        for r in global_sort_ranks(
            df, "v", tiebreak_cols=["id"], buckets=buckets
        ).collect()
    }
    want = {
        rid: i + 1
        for i, (rid, _) in enumerate(
            sorted(rows, key=lambda t: (t[1] is not None, t[1] or 0.0, t[0]))
        )
    }
    assert got == want


@SLOW
@given(
    fact_keys=st.lists(st.integers(0, 60), min_size=1, max_size=150),
    dim_keys=st.sets(st.integers(0, 80), min_size=1, max_size=40),
    k=st.sampled_from([1, 3]),
    bits=st.sampled_from([64, 512]),
)
def test_bloom_prune_join_always_row_identical(
    spark, fact_keys, dim_keys, k, bits
):
    """Any key sets, any sizing — including a saturated 64-bit filter,
    which must stay CORRECT (unselective is allowed, wrong is not)."""
    fact = spark.createDataFrame(
        [(kk, i) for i, kk in enumerate(fact_keys)], "k long, payload long"
    )
    dim = spark.createDataFrame([(kk,) for kk in dim_keys], "k long")
    got = sorted(
        map(
            tuple,
            sketches.bloom_prune_join(
                fact, dim, "k", k=k, bits=bits
            ).collect(),
        )
    )
    want = sorted(map(tuple, fact.join(dim, "k").collect()))
    assert got == want


@SLOW
@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 2),           # user
            st.integers(0, 5),           # minute (ties likely)
            st.sampled_from("abc"),      # event type
        ),
        min_size=2,
        max_size=60,
    )
)
def test_event_transitions_matches_python_bigrams(spark, events):
    rows = [
        (u, i, t, T0 + dt.timedelta(minutes=m))
        for i, (u, m, t) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts timestamp"
    )
    got = {
        (r.prev_type, r.next_type): r.n
        for r in event_transitions(df).collect()
    }
    # python oracle: per user, order by (ts, event_id), count bigrams
    from collections import Counter, defaultdict

    seqs = defaultdict(list)
    for u, i, t, ts in rows:
        seqs[u].append((ts, i, t))
    want = Counter()
    for u, seq in seqs.items():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            want[(a, b)] += 1
    assert got == dict(want)
