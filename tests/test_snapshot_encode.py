"""Goldens for SCD2 time travel, GDPR forget, and vocab encoding."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from feast_java_old_spark.operators import features, text
from feast_java_old_spark.operators.materialize import forget_keys


def ts(seconds: float):
    return dt.datetime(2024, 1, 1, 0) + dt.timedelta(seconds=seconds)


def test_snapshot_at_reconstructs_past_state(spark):
    log = spark.createDataFrame(
        [
            (1, ts(0), "A", 1),
            (1, ts(20), "B", 2),
            (2, ts(10), "X", 3),
        ],
        "user_id long, ts timestamp, status string, event_id long",
    )
    hist = features.scd2_history(log, ["user_id"], ["status"])

    at_5 = {
        r.user_id: r.status
        for r in features.snapshot_at(hist, "2024-01-01 00:00:05").collect()
    }
    assert at_5 == {1: "A"}  # user 2 not yet created

    at_25 = {
        r.user_id: r.status
        for r in features.snapshot_at(hist, "2024-01-01 00:00:25").collect()
    }
    assert at_25 == {1: "B", 2: "X"}

    # at exactly a transition instant the NEW version is visible
    at_20 = {
        r.user_id: r.status
        for r in features.snapshot_at(hist, "2024-01-01 00:00:20").collect()
    }
    assert at_20[1] == "B"


def test_forget_keys_anti_join(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0)], "user_id long, value double"
    )
    forget = spark.createDataFrame([(2,), (2,), (9,)], "user_id long")
    out = forget_keys(df, forget, ["user_id"])
    assert sorted(r.user_id for r in out.collect()) == [1, 3]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_build_vocab_rank_and_ties(spark):
    df = spark.createDataFrame(
        [(1, "b b a a c")], "doc_id long, text string"
    )
    v = {r.token: r.token_id for r in text.build_vocab(df, vocab_size=2).collect()}
    # a and b tie at 2 -> lexicographic; c cut by vocab_size
    assert v == {"a": 1, "b": 2}


def test_encode_tokens_order_and_unk(spark):
    docs = spark.createDataFrame(
        [(1, "a b z a"), (2, "z z")], "doc_id long, text string"
    )
    vocab = spark.createDataFrame(
        [("a", 1), ("b", 2)], "token string, token_id long"
    )
    out = {
        r.doc_id: list(r.token_ids)
        for r in text.encode_tokens(docs, vocab, unk_id=0).collect()
    }
    assert out == {1: [1, 2, 0, 1], 2: [0, 0]}
