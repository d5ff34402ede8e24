"""Goldens for the round-3 additions: SCD2 history, quantile binning,
grid resample + forward fill, one-pass column profiling, BPE pair
counting / merge application, and C4 line-level boilerplate removal."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from feast_java_old_spark.operators import curation, features, text
from feast_java_old_spark.operators.profile import profile_columns


def ts(seconds: float):
    return dt.datetime(2024, 1, 1, 0) + dt.timedelta(seconds=seconds)


# ------------------------------------------------------------- SCD2


@pytest.fixture(scope="module")
def change_log(spark):
    rows = [
        (1, ts(0), "A", 1),
        (1, ts(10), "A", 2),  # unchanged -> collapsed
        (1, ts(20), "B", 3),
        (1, ts(20), "C", 5),  # same ts, higher id -> later version
        (2, ts(5), "X", 4),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, status string, event_id long"
    )


def test_scd2_collapses_and_builds_intervals(spark, change_log):
    out = features.scd2_history(
        change_log, ["user_id"], ["status"], ts_col="ts", id_col="event_id"
    )
    rows = {(r.user_id, r.version): r for r in out.collect()}
    assert len(rows) == 4  # A, B, C for user 1 (dup collapsed); X for 2

    a = rows[(1, 1)]
    assert (a.status, a.valid_from, a.valid_to, a.is_current) == (
        "A", ts(0), ts(20), False
    )
    b = rows[(1, 2)]
    assert (b.status, b.valid_from, b.valid_to, b.is_current) == (
        "B", ts(20), ts(20), False
    )
    c = rows[(1, 3)]
    assert (c.status, c.valid_to, c.is_current) == ("C", None, True)
    x = rows[(2, 1)]
    assert (x.status, x.valid_from, x.is_current) == ("X", ts(5), True)


def test_scd2_null_attr_transitions(spark):
    df = spark.createDataFrame(
        [(1, ts(0), None, 1), (1, ts(10), None, 2), (1, ts(20), "A", 3)],
        "user_id long, ts timestamp, status string, event_id long",
    )
    out = features.scd2_history(df, ["user_id"], ["status"]).collect()
    # null==null is "unchanged" (eqNullSafe): two versions, not three
    assert sorted((r.version, r.status) for r in out) == [(1, None), (2, "A")]


# ---------------------------------------------------- quantile binning


def test_quantile_bin_equal_frequency(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 11)], "event_id long, value double"
    )
    out = {r.event_id: r.bin for r in features.quantile_bin(df, "value", k=4).collect()}
    # exact percentile edges of 1..10 at .25/.5/.75 = 3.25, 5.5, 7.75
    expected = {1: 1, 2: 1, 3: 1, 4: 2, 5: 2, 6: 3, 7: 3, 8: 4, 9: 4, 10: 4}
    assert out == expected


def test_quantile_bin_is_equal_frequency_on_uniform(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(200)], "event_id long, value double"
    )
    counts = (
        features.quantile_bin(df, "value", k=10)
        .groupBy("bin")
        .count()
        .collect()
    )
    assert len(counts) == 10
    assert all(r["count"] == 20 for r in counts)


def test_quantile_bin_approx_matches_exact_within_rank_error(spark):
    # GK with accuracy=10_000 on 2_000 rows has rank error < 1 — the
    # approx strategy must reproduce the exact bins verbatim here.
    df = spark.createDataFrame(
        [(i, float((i * 37) % 2000)) for i in range(2000)],
        "event_id long, value double",
    )
    exact = {
        r.event_id: r.bin
        for r in features.quantile_bin(df, "value", k=10).collect()
    }
    approx = {
        r.event_id: r.bin
        for r in features.quantile_bin(
            df, "value", k=10, strategy="approx"
        ).collect()
    }
    diff = sum(1 for k in exact if exact[k] != approx[k])
    assert diff / len(exact) <= 0.01


def test_quantile_bin_approx_plan_has_no_exact_percentile(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "event_id long, value double"
    )
    out = features.quantile_bin(df, "value", k=4, strategy="approx")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "percentile_approx" in plan
    assert "percentile(" not in plan  # the exact sort-heavy aggregate
    with pytest.raises(ValueError):
        features.quantile_bin(df, "value", strategy="nope")


# ------------------------------------------------- resample + ffill


def test_resample_ffill_grid_and_ties(spark):
    df = spark.createDataFrame(
        [
            (1, ts(30), 1.0, 1),
            (1, ts(30), 2.0, 2),  # tie -> higher id wins
            (1, ts(150), 3.0, 3),
            (2, ts(70), 5.0, 4),
        ],
        "user_id long, ts timestamp, value double, event_id long",
    )
    out = features.resample_ffill(
        df, ["user_id"], "2024-01-01 00:00:00", "2024-01-01 00:04:00", 60
    )
    got = {
        (r.user_id, r.grid_ts): r.value_ffill for r in out.collect()
    }
    assert len(got) == 10  # 2 users x 5 grid points
    assert got[(1, ts(0))] is None
    assert got[(1, ts(60))] == 2.0  # tie resolved to event_id=2
    assert got[(1, ts(120))] == 2.0
    assert got[(1, ts(180))] == 3.0
    assert got[(1, ts(240))] == 3.0
    assert got[(2, ts(0))] is None and got[(2, ts(60))] is None
    assert got[(2, ts(120))] == 5.0


def test_resample_probe_at_event_timestamp_sees_event(spark):
    df = spark.createDataFrame(
        [(1, ts(60), 7.0, 1)], "user_id long, ts timestamp, value double, event_id long"
    )
    out = features.resample_ffill(
        df, ["user_id"], "2024-01-01 00:00:00", "2024-01-01 00:02:00", 60
    ).collect()
    got = {r.grid_ts: r.value_ffill for r in out}
    assert got[ts(60)] == 7.0  # inclusive at-or-before


# ------------------------------------------------------- profiling


def test_profile_columns_one_pass(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "y"), (2, None), (None, None)],
        "a long, b string",
    )
    out = {r.column: r for r in profile_columns(df, ["a", "b"]).collect()}
    a = out["a"]
    assert (a.n, a.n_null, a.n_distinct) == (4, 1, 2)
    assert (a.min_num, a.max_num) == (1.0, 2.0)
    assert a.mean == pytest.approx(5 / 3, abs=1e-6)
    assert a.min_str is None and a.max_str is None
    b = out["b"]
    assert (b.n, b.n_null, b.n_distinct) == (4, 2, 2)
    assert (b.min_str, b.max_str) == ("x", "y")
    assert b.min_num is None and b.mean is None


def test_profile_columns_approx_mode_runs(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "a long")
    r = profile_columns(df, ["a"], approx_distinct=True).collect()[0]
    # HLL estimate: within default 5% rsd of 100
    assert abs(r.n_distinct - 100) <= 10


def test_profile_columns_approx_plan_has_no_expand(spark):
    # exact multi-column countDistinct plans an Expand (row fan-out per
    # profiled column); the HLL++ strategy must not.
    df = spark.createDataFrame(
        [(i, str(i % 7), float(i)) for i in range(100)],
        "a long, b string, c double",
    )
    exact_plan = (
        profile_columns(df, ["a", "b", "c"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    approx_plan = (
        profile_columns(df, ["a", "b", "c"], approx_distinct=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" in exact_plan
    assert "Expand" not in approx_plan


# ------------------------------------------------------------- BPE


def test_bpe_pair_counts_golden(spark):
    df = spark.createDataFrame(
        [(1, "low lower lowest")], "doc_id long, text string"
    )
    out = [
        (r.left, r.right, r.pair_count)
        for r in text.bpe_pair_counts(df, top_n=3).collect()
    ]
    # lo:3 ow:3 we:2 er/es/st:1 — ties break lexicographically
    assert out == [("l", "o", 3), ("o", "w", 3), ("w", "e", 2)]


def test_bpe_pair_counts_weighs_by_token_frequency(spark):
    df = spark.createDataFrame(
        [(1, "ab ab ab"), (2, "ab cd")], "doc_id long, text string"
    )
    out = {
        (r.left, r.right): r.pair_count
        for r in text.bpe_pair_counts(df, top_n=10).collect()
    }
    assert out == {("a", "b"): 4, ("c", "d"): 1}


def test_bpe_apply_merge_leftmost_first(spark):
    df = spark.createDataFrame(
        [(1, ["a", "a", "a"]), (2, ["l", "o", "w"]), (3, ["b"])],
        "id long, symbols array<string>",
    )
    out = {
        r.id: r.symbols
        for r in text.bpe_apply_merge(df, "a", "a").collect()
    }
    assert out[1] == ["aa", "a"]  # NOT ["a", "aa"]
    assert out[2] == ["l", "o", "w"]
    assert out[3] == ["b"]
    out2 = {
        r.id: r.symbols
        for r in text.bpe_apply_merge(
            spark.createDataFrame(
                [(2, ["l", "o", "w"])], "id long, symbols array<string>"
            ),
            "l",
            "o",
        ).collect()
    }
    assert out2[2] == ["lo", "w"]


# ----------------------------------------------------- line filtering


def test_line_filter_c4_rules(spark):
    doc = (
        "Good line right here.\n"
        "short\n"
        "Buy now cookie click here.\n"
        "Another good line!"
    )
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    r = curation.line_filter(
        df, min_words=3, blocklist=("cookie",), min_kept_lines=2
    ).collect()[0]
    assert (r.n_lines, r.n_kept, r.kept) == (4, 2, True)
    assert r.text == "Good line right here.\nAnother good line!"


def test_line_filter_custom_delimiter_no_punct(spark):
    df = spark.createDataFrame(
        [(1, "one two three | x | four five six seven")],
        "doc_id long, text string",
    )
    r = curation.line_filter(
        df,
        delimiter=" | ",
        min_words=3,
        require_terminal_punct=False,
    ).collect()[0]
    assert (r.n_lines, r.n_kept) == (3, 2)
    assert r.text == "one two three | four five six seven"


# ------------------------------------------------- plan-shape gates


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_funnel_single_shuffle_plan(spark):
    df = spark.createDataFrame(
        [(1, ts(0), "a")], "user_id long, ts timestamp, event_type string"
    )
    plan = _plan(features.funnel(df, ["user_id"], ["a", "b"]))
    assert plan.count("Exchange hashpartitioning") == 1


def test_quantile_bin_data_never_hash_shuffles(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0)], "event_id long, value double"
    )
    plan = _plan(features.quantile_bin(df, "value", k=4))
    # edges reduce through a single-partition aggregate; the data rows
    # themselves go scan -> broadcast join -> projection, no hash exchange
    assert plan.count("Exchange hashpartitioning") == 0
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_scd2_single_exchange_plan(spark, change_log):
    plan = _plan(
        features.scd2_history(change_log, ["user_id"], ["status"])
    )
    assert plan.count("Exchange hashpartitioning") == 1
