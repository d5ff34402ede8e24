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


def test_q20_count_bug_edge_empty_window_filters_row(spark):
    """The classic decorrelation COUNT bug, pinned as a unit test: a
    (supplier, part) with pre-1998 stock but ZERO shipments in the
    1998 window must NOT qualify — sum() over the empty correlated
    group is NULL, the `2*avail > NULL` comparison is NULL, and the
    row falls out. A wrong decorrelation rewrite (outer join + 0-fill
    before the comparison) would flip it to qualifying, since
    2*avail > 0 always holds."""
    import datetime as dt

    rows = [
        # s1/p1: stock 10 before 1998, NOTHING shipped in 1998 → the
        # count-bug row (must not qualify)
        (100, 1, 1, 10.0, dt.datetime(1997, 5, 1)),
        # s2/p1: stock 10 before 1998, 30 shipped in 1998 → 2*10 > 30
        # is FALSE → not qualifying
        (101, 2, 1, 10.0, dt.datetime(1997, 5, 1)),
        (102, 2, 1, 30.0, dt.datetime(1998, 5, 1)),
        # s3/p1: stock 20 before 1998, 30 shipped in 1998 → 2*20 > 30
        # → qualifies
        (103, 3, 1, 20.0, dt.datetime(1997, 5, 1)),
        (104, 3, 1, 30.0, dt.datetime(1998, 5, 1)),
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_suppkey long, l_partkey long,"
        " l_quantity double, l_shipdate timestamp",
    ).createOrReplaceTempView("lineitem")
    spark.createDataFrame(
        [(1, "small widget")], "p_partkey long, p_name string"
    ).createOrReplaceTempView("part")
    spark.createDataFrame(
        [(1, "S1", 0, 1.0), (2, "S2", 0, 2.0), (3, "S3", 0, 3.0)],
        "s_suppkey long, s_name string, s_nationkey long, s_acctbal double",
    ).createOrReplaceTempView("supplier")
    spark.createDataFrame(
        [(0, "NATION_3")], "n_nationkey long, n_name string"
    ).createOrReplaceTempView("nation")

    import __spark_entry__ as e

    try:
        got = [r.s_name for r in spark.sql(e.SQL_TPCH_Q20).collect()]
        assert got == ["S3"]
    finally:
        # session-scoped fixture: don't leave toy tables shadowing the
        # names gate queries re-register from parquet
        for v in ("lineitem", "part", "supplier", "nation"):
            spark.catalog.dropTempView(v)
