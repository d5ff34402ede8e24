"""sf1 stress (r12 verdict item 4): historical/as-of + streaming
families at 10x the sf0.1 events table (100k -> 1M rows), reporting
per-family scale exponents — confirming the SCALING.md alphas and the
as-of strategy-selection rules (the bucketed variant's skew salt
especially) an order of magnitude above the bench SF.

Inflation models a genuinely BIGGER corpus:

- events: replica r gets a DISJOINT user/event-id namespace
  (user_id*mult+r) — 10x the users, same per-key history length: the
  linear-scale path every as-of strategy must hold on.
- skew frame: additionally, ALL replicas of user 0's events map onto
  ONE hot key with distinct event ids and second-jittered timestamps —
  a key whose history grows 10x while the rest stay bounded. This is
  the case the plain union-window strategy degrades on (single-key
  window = single partition) and the bucketed strategy's time-bucket
  salt exists for.
- streaming sources are the inflated frames staged to parquet dirs
  (outside the timers) and re-read with readStream — the same
  file-stream transport the gate queries use.

Run on an IDLE machine: python scripts/stress_sf1_hist_stream.py
"""

import math
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F  # noqa: E402

from feast_java_old_spark.sources.tables import (  # noqa: E402
    load_table,
    session_builder,
)
from feast_java_old_spark.operators.historical import (  # noqa: E402
    get_historical_features,
)

import __spark_entry__ as e  # noqa: E402  (gate constants + helpers)

spark = session_builder(
    "sf1stress_hist_stream",
    master="local[32]",
    **{
        "spark.sql.shuffle.partitions": "64",
        "spark.ui.enabled": "false",
        "spark.driver.memory": "48g",
        "spark.sql.autoBroadcastJoinThreshold": "64MB",
    },
).getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"
MULTS = (1, 10)
import datetime as dt  # noqa: E402

STAMPS = [dt.datetime(2024, 1, 15), dt.datetime(2024, 1, 5)]


def inflate_events(mult: int, hot_key: bool = False):
    ev = load_table(spark, SF, "events").select(
        "user_id",
        F.col("ts").alias("event_timestamp"),
        "event_id",
        "event_type",
        "value",
    )
    rep = ev.withColumn(
        "__r", F.explode(F.sequence(F.lit(0), F.lit(mult - 1)))
    )
    base = rep.select(
        (F.col("user_id") * mult + F.col("__r")).alias("user_id"),
        "event_timestamp",
        (F.col("event_id") * mult + F.col("__r")).alias("event_id"),
        "event_type",
        "value",
    )
    if hot_key:
        # user 0's history from EVERY replica lands on one key: distinct
        # ids, timestamps jittered by replica-seconds so the as-of
        # winner is deterministic and the key's history is mult x deep.
        hot = rep.where(F.col("user_id") == 0).select(
            F.lit(-1).cast("long").alias("user_id"),
            (
                F.timestamp_micros(
                    F.unix_micros("event_timestamp")
                    + F.col("__r").cast("long") * F.lit(1_000_000)
                )
            ).alias("event_timestamp"),
            (F.col("event_id") * mult + F.col("__r")).alias("event_id"),
            "event_type",
            "value",
        )
        base = base.unionByName(hot)
    return base.repartition(32 * mult if mult > 1 else 8).localCheckpoint(
        eager=True
    )


def requests_for(events):
    return (
        events.select("user_id")
        .distinct()
        .crossJoin(
            spark.createDataFrame(
                [(s,) for s in STAMPS], "request_ts timestamp"
            )
        )
        .localCheckpoint(eager=True)
    )


def run(name, build, results, mult):
    t0 = time.time()
    df = build()
    n = df.count()
    secs = round(time.time() - t0, 2)
    results.setdefault(name, {})[mult] = secs
    print(f"  {name}: {secs}s ({n} rows)", flush=True)


def stage_parquet(df) -> str:
    d = tempfile.mkdtemp(prefix="fjos_stress_stream_")
    df.write.mode("overwrite").parquet(os.path.join(d, "part"))
    return os.path.join(d, "part")


def stream_of(path):
    schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def run_stream(name, build_stream, results, mult, mode="append"):
    import uuid

    def thunk():
        qname = f"stress_{uuid.uuid4().hex[:8]}"
        q = (
            build_stream()
            .writeStream.format("memory")
            .queryName(qname)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(900):
            q.stop()
            raise TimeoutError(name)
        return spark.table(qname)

    run(name, thunk, results, mult)


results: dict[str, dict[int, float]] = {}
for mult in MULTS:
    events = inflate_events(mult)
    skewed = inflate_events(mult, hot_key=True)
    requests = requests_for(events)
    skew_requests = requests_for(skewed)
    print(
        f"--- mult={mult}: events={events.count()} "
        f"skewed={skewed.count()} requests={requests.count()}",
        flush=True,
    )

    for strat in ("union", "join", "bucketed"):
        run(
            f"asof_{strat}",
            lambda s=strat: get_historical_features(
                requests,
                events,
                ["user_id"],
                feature_cols=["value", "event_type"],
                max_age_secs=e.ASOF_MAX_AGE,
                include_statuses=True,
                tiebreak_col="event_id",
                strategy=s,
            ),
            results,
            mult,
        )
    # the skew case: hot key with mult-x history depth
    for strat in ("union", "bucketed"):
        run(
            f"asof_skew_{strat}",
            lambda s=strat: get_historical_features(
                skew_requests,
                skewed,
                ["user_id"],
                feature_cols=["value", "event_type"],
                max_age_secs=e.ASOF_MAX_AGE,
                include_statuses=True,
                tiebreak_col="event_id",
                strategy=s,
            ),
            results,
            mult,
        )

    # ---- streaming family (real Structured Streaming, availableNow)
    from feast_java_old_spark.streaming.ingest import (
        stream_dedup,
        stream_window_features,
    )

    src = stage_parquet(events)

    run_stream(
        "stream_dedup_2x",
        lambda: stream_dedup(
            stream_of(src).unionByName(stream_of(src)),
            dedup_cols=["event_id"],
            watermark="1 hour",
        ),
        results,
        mult,
    )
    run_stream(
        "stream_window_agg",
        lambda: stream_window_features(
            stream_of(src),
            ["user_id"],
            {
                "n": F.count("*"),
                "sum_value": F.sum("value"),
            },
            window_duration="1 day",
            watermark="1 hour",
        ),
        results,
        mult,
    )

    # latest-wins merge materialization end-to-end (foreachBatch)
    from feast_java_old_spark.streaming.ingest import (
        read_online_table,
        stream_materialize,
    )

    def latest_merge():
        store = tempfile.mkdtemp(prefix="fjos_stress_store_")
        ck = tempfile.mkdtemp(prefix="fjos_stress_ck_")
        q = stream_materialize(
            spark,
            stream_of(src),
            store,
            "events_latest",
            ["user_id"],
            watermark="1 hour",
            checkpoint=ck,
            trigger_once=True,
        )
        if not q.awaitTermination(900):
            q.stop()
            raise TimeoutError("latest_merge")
        from feast_java_old_spark.operators.materialize import (
            online_table_path,
        )

        return read_online_table(
            spark, online_table_path(store, "default", "events_latest")
        )

    run("stream_latest_merge", latest_merge, results, mult)

print("\nalpha (t ~ events^alpha, 1x -> 10x):")
for name, by_mult in results.items():
    a = math.log(by_mult[10] / by_mult[1]) / math.log(10)
    print(f"  {name}: {by_mult[1]}s -> {by_mult[10]}s  alpha={a:.2f}")
