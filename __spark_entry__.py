"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 (plus
the training-data-pipeline extensions) as (spark, sf_dir) -> DataFrame
callables; ``oracle_sql()`` carries the equivalent ANSI SQL for DuckDB.

Cross-engine determinism rules used throughout:
- timestamps are emitted as unix microseconds (``unix_micros`` /
  ``epoch_us``) — no tz or ns/µs ambiguity;
- double aggregates are either integer-exact (cents) or rounded after
  identical operation order;
- every ranking has an explicit unique tie-break column.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from feast_java_old_spark.operators import (
    classify,
    curation,
    dedup,
    features,
    joins,
    multimodal,
    pii,
    pipeline,
    search,
    similarity,
    sketches,
    text,
    windows,
)
from feast_java_old_spark.operators.historical import (
    get_historical_features,
    get_training_dataset,
)
from feast_java_old_spark.operators.materialize import (
    apply_cdc,
    latest_per_key,
    latest_per_key_for,
)
from feast_java_old_spark.operators.odfv import OnDemandFeatureView, apply_odfv
from feast_java_old_spark.operators.profile import profile_columns
from feast_java_old_spark.operators.retrieval import get_online_features
from feast_java_old_spark.registry.model import (
    Entity,
    Feature,
    FeatureTable,
    FileSource,
    ValueType,
)
from feast_java_old_spark.registry.registry import Registry
from feast_java_old_spark.sources.batch import read_batch_source
from feast_java_old_spark.sources.tables import load_table

# --------------------------------------------------------------------- S1/P1/P4


def q_s1_scan_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 parquet source + P4 field mapping + P1 projection + pushed filter."""
    src = FileSource(
        file_url=f"{sf_dir}/events.parquet",
        event_timestamp_column="ts",
        field_mapping={"value": "feature_value"},
    )
    df = read_batch_source(spark, src)
    return df.where(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "feature_value",
    )


SQL_S1 = """
SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
       value AS feature_value
FROM events WHERE event_type = 'click'
"""

# ------------------------------------------------------------------------- A1


def q_a1_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 latest-value-per-entity-key (the materialization kernel)."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").alias("event_timestamp"),
        "event_id",
        "event_type",
        "value",
    )
    latest = latest_per_key(events, ["user_id"], "event_timestamp")
    return latest.select(
        "user_id",
        F.unix_micros("event_timestamp").alias("ts_us"),
        "event_id",
        "event_type",
        "value",
    )


def q_a1_latest_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 by the window strategy (row_number rank) — hash-matched against
    the same oracle as the max(struct) aggregate strategy, proving the
    two physical plans interchangeable at the gate."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").alias("event_timestamp"),
        "event_id",
        "event_type",
        "value",
    )
    latest = latest_per_key(
        events, ["user_id"], "event_timestamp", strategy="window"
    )
    return latest.select(
        "user_id",
        F.unix_micros("event_timestamp").alias("ts_us"),
        "event_id",
        "event_type",
        "value",
    )


def q_j1_lookup_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 by the shuffle strategy (backfill-scale request sets too large
    to broadcast; AQE picks the join) — same oracle as the broadcast
    double-BHJ path."""
    reg, online, entities = _customer_orders_env(spark, sf_dir, max_age=0)
    return get_online_features(
        spark,
        reg,
        entities,
        ["customer_orders:total_price", "customer_orders:order_status"],
        request_ts=dt.datetime(1998, 12, 1),
        full_feature_names=False,
        online_frames={"customer_orders": online},
        strategy="shuffle",
    )


SQL_A1 = """
SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id,
       event_type, value
FROM (SELECT *, row_number() OVER (
        PARTITION BY user_id
        ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1
"""

# --------------------------------------------------------------- J1 + statuses


def _customer_orders_env(spark: SparkSession, sf_dir: str, max_age: int = 0):
    reg = Registry()
    reg.apply_entity(Entity("c_custkey", ValueType.INT64))
    reg.apply_feature_table(
        FeatureTable(
            name="customer_orders",
            entities=["c_custkey"],
            features=[
                Feature("total_price", ValueType.DOUBLE),
                Feature("order_status", ValueType.STRING),
            ],
            max_age_secs=max_age,
            batch_source=FileSource(
                file_url=f"{sf_dir}/orders.parquet",
                event_timestamp_column="o_orderdate",
            ),
        )
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_orderdate").alias("event_timestamp"),
        "o_orderkey",
        F.col("o_totalprice").alias("total_price"),
        F.col("o_orderstatus").alias("order_status"),
    )
    entities = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 7 == 0)
        .select("c_custkey")
        # Reused by the semi-join prune and the lookup join — cache the
        # small request key set instead of re-scanning customer.
        .persist()
    )
    # Request-restricted materialization: semi-join prune the order
    # history to the requested custkeys before the latest-per-key
    # reduction (identical rows; the lookup could never read the rest).
    online = latest_per_key_for(orders, entities, ["c_custkey"], "event_timestamp")
    return reg, online, entities


def q_j1_entity_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: the core entity-lookup query (broadcast point lookups +
    PRESENT/NOT_FOUND/NULL_VALUE statuses)."""
    reg, online, entities = _customer_orders_env(spark, sf_dir, max_age=0)
    return get_online_features(
        spark,
        reg,
        entities,
        ["customer_orders:total_price", "customer_orders:order_status"],
        request_ts=dt.datetime(1998, 12, 1),
        full_feature_names=False,
        online_frames={"customer_orders": online},
    )


def _sql_j1(status_of: str = "o_custkey") -> str:
    return f"""
WITH latest AS (
  SELECT o_custkey, o_totalprice AS total_price, o_orderstatus AS order_status,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders),
l1 AS (SELECT * FROM latest WHERE rn = 1)
SELECT c.c_custkey,
       l1.total_price,
       CASE WHEN l1.o_custkey IS NULL THEN 'NOT_FOUND'
            WHEN l1.total_price IS NULL THEN 'NULL_VALUE'
            ELSE 'PRESENT' END AS total_price__status,
       l1.order_status,
       CASE WHEN l1.o_custkey IS NULL THEN 'NOT_FOUND'
            WHEN l1.order_status IS NULL THEN 'NULL_VALUE'
            ELSE 'PRESENT' END AS order_status__status
FROM customer c LEFT JOIN l1 ON l1.o_custkey = c.c_custkey
WHERE c.c_custkey % 7 = 0
"""


SQL_J1 = _sql_j1()

# ----------------------------------------------------------------- J3 max_age

MAX_AGE_1Y = 365 * 24 * 3600
REQ_TS_J3 = dt.datetime(1998, 10, 1)


def q_j3_max_age(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: staleness — values older than max_age are emptied with
    OUTSIDE_MAX_AGE status."""
    reg, online, entities = _customer_orders_env(spark, sf_dir, max_age=MAX_AGE_1Y)
    return get_online_features(
        spark,
        reg,
        entities,
        ["customer_orders:total_price", "customer_orders:order_status"],
        request_ts=REQ_TS_J3,
        full_feature_names=False,
        online_frames={"customer_orders": online},
    )


SQL_J3 = f"""
WITH latest AS (
  SELECT o_custkey, o_orderdate, o_totalprice AS total_price,
         o_orderstatus AS order_status,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders),
l1 AS (SELECT *,
         (CAST(epoch(TIMESTAMP '1998-10-01 00:00:00') AS BIGINT)
          - CAST(epoch(o_orderdate) AS BIGINT)) > {MAX_AGE_1Y} AS outside
       FROM latest WHERE rn = 1)
SELECT c.c_custkey,
       CASE WHEN l1.outside THEN NULL ELSE l1.total_price END AS total_price,
       CASE WHEN l1.o_custkey IS NULL THEN 'NOT_FOUND'
            WHEN l1.outside THEN 'OUTSIDE_MAX_AGE'
            WHEN l1.total_price IS NULL THEN 'NULL_VALUE'
            ELSE 'PRESENT' END AS total_price__status,
       CASE WHEN l1.outside THEN NULL ELSE l1.order_status END AS order_status,
       CASE WHEN l1.o_custkey IS NULL THEN 'NOT_FOUND'
            WHEN l1.outside THEN 'OUTSIDE_MAX_AGE'
            WHEN l1.order_status IS NULL THEN 'NULL_VALUE'
            ELSE 'PRESENT' END AS order_status__status
FROM customer c LEFT JOIN l1 ON l1.o_custkey = c.c_custkey
WHERE c.c_custkey % 7 = 0
"""

# ------------------------------------------------------------ J2 compound key


def _supplier_part_env(spark: SparkSession, sf_dir: str):
    """The J2 compound-key environment, shared by the direct-operator
    gate (``q_j2_compound_key``) and the client-SDK twin
    (``q_sdk_compound_entity``): registry with TWO entities, the
    lineitem history keyed by (l_suppkey, l_partkey), the ~2% request
    key set (+ one guaranteed-missing pair), and the request-restricted
    latest-per-key online frame."""
    reg = Registry()
    reg.apply_entity(Entity("l_suppkey", ValueType.INT64))
    reg.apply_entity(Entity("l_partkey", ValueType.INT64))
    reg.apply_feature_table(
        FeatureTable(
            name="supplier_part",
            entities=["l_suppkey", "l_partkey"],
            features=[
                Feature("quantity", ValueType.DOUBLE),
                Feature("extended_price", ValueType.DOUBLE),
            ],
            batch_source=FileSource(
                file_url=f"{sf_dir}/lineitem.parquet",
                event_timestamp_column="l_shipdate",
            ),
        )
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_partkey",
        F.col("l_shipdate").alias("event_timestamp"),
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").alias("quantity"),
        F.col("l_extendedprice").alias("extended_price"),
    )
    entities = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_partkey") % 50 == 0)
        .select("l_suppkey", "l_partkey")
        .distinct()
        .unionByName(
            spark.createDataFrame([(-1, -1)], "l_suppkey long, l_partkey long")
        )
        # The request frame feeds three joins (semi-join prune, lookup,
        # status frame); persist the ~2% key set once instead of
        # re-scanning lineitem per consumer — a small-dim cache, the
        # same call a real serving path gets for free because requests
        # arrive as literal frames, not scans.
        .persist()
    )
    # Semi-join prune the 600k-row history to the ~2% requested compound
    # keys before the latest-per-key reduction (same result, far smaller
    # aggregate — the 100 TB shape for lookup-from-history).
    online = latest_per_key_for(
        li, entities, ["l_suppkey", "l_partkey"], "event_timestamp"
    )
    return reg, online, entities


def q_j2_compound_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: composite-entity-key lookup ((l_suppkey, l_partkey) pairs)."""
    reg, online, entities = _supplier_part_env(spark, sf_dir)
    return get_online_features(
        spark,
        reg,
        entities,
        ["supplier_part:quantity", "supplier_part:extended_price"],
        request_ts=dt.datetime(1998, 12, 1),
        full_feature_names=False,
        online_frames={"supplier_part": online},
    )


SQL_J2 = """
WITH latest AS (
  SELECT l_suppkey, l_partkey, l_quantity AS quantity,
         l_extendedprice AS extended_price,
         row_number() OVER (PARTITION BY l_suppkey, l_partkey
                            ORDER BY l_shipdate DESC, l_orderkey DESC,
                                     l_linenumber DESC) AS rn
  FROM lineitem),
l1 AS (SELECT * FROM latest WHERE rn = 1),
ent AS (
  SELECT DISTINCT l_suppkey, l_partkey FROM lineitem WHERE l_partkey % 50 = 0
  UNION ALL SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT))
SELECT e.l_suppkey, e.l_partkey,
       l1.quantity,
       CASE WHEN l1.l_suppkey IS NULL THEN 'NOT_FOUND'
            WHEN l1.quantity IS NULL THEN 'NULL_VALUE'
            ELSE 'PRESENT' END AS quantity__status,
       l1.extended_price,
       CASE WHEN l1.l_suppkey IS NULL THEN 'NOT_FOUND'
            WHEN l1.extended_price IS NULL THEN 'NULL_VALUE'
            ELSE 'PRESENT' END AS extended_price__status
FROM ent e LEFT JOIN l1
  ON l1.l_suppkey = e.l_suppkey AND l1.l_partkey = e.l_partkey
"""

# -------------------------------------------------------- historical (as-of)

ASOF_MAX_AGE = 7 * 24 * 3600


def q_historical_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time retrieval: latest event per (user, request_ts) with
    event_ts <= request_ts, max_age 7 days, full status vocabulary."""
    events = load_table(spark, sf_dir, "events")
    history = events.select(
        "user_id",
        F.col("ts").alias("event_timestamp"),
        "event_id",
        "value",
        "event_type",
    )
    stamps = [dt.datetime(2024, 1, 15), dt.datetime(2024, 1, 5)]
    requests = (
        events.select("user_id")
        .distinct()
        .crossJoin(
            spark.createDataFrame([(s,) for s in stamps], "request_ts timestamp")
        )
    )
    out = get_historical_features(
        requests,
        history,
        ["user_id"],
        feature_cols=["value", "event_type"],
        max_age_secs=ASOF_MAX_AGE,
        include_statuses=True,
        tiebreak_col="event_id",
    )
    return out.select(
        "user_id",
        F.unix_micros("request_ts").alias("request_ts_us"),
        F.unix_micros("event_timestamp").alias("event_ts_us"),
        "value",
        "value__status",
        "event_type",
        "event_type__status",
    )

def q_historical_asof_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same point-in-time semantics, executed by the range-join strategy
    (``strategy="join"``: range join + rank) — the third interchangeable
    physical plan, hash-matched against the identical oracle."""
    events = load_table(spark, sf_dir, "events")
    history = events.select(
        "user_id",
        F.col("ts").alias("event_timestamp"),
        "event_id",
        "value",
        "event_type",
    )
    stamps = [dt.datetime(2024, 1, 15), dt.datetime(2024, 1, 5)]
    requests = (
        events.select("user_id")
        .distinct()
        .crossJoin(
            spark.createDataFrame([(s,) for s in stamps], "request_ts timestamp")
        )
    )
    out = get_historical_features(
        requests,
        history,
        ["user_id"],
        feature_cols=["value", "event_type"],
        max_age_secs=ASOF_MAX_AGE,
        include_statuses=True,
        tiebreak_col="event_id",
        strategy="join",
    )
    return out.select(
        "user_id",
        F.unix_micros("request_ts").alias("request_ts_us"),
        F.unix_micros("event_timestamp").alias("event_ts_us"),
        "value",
        "value__status",
        "event_type",
        "event_type__status",
    )


def q_historical_asof_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same point-in-time semantics as ``historical_asof``, executed by the
    skew-resistant bucketed strategy (time-salted window partitions +
    per-bucket carry-in summaries) — hash-matched against the identical
    DuckDB oracle to prove the strategies are interchangeable."""
    events = load_table(spark, sf_dir, "events")
    history = events.select(
        "user_id",
        F.col("ts").alias("event_timestamp"),
        "event_id",
        "value",
        "event_type",
    )
    stamps = [dt.datetime(2024, 1, 15), dt.datetime(2024, 1, 5)]
    requests = (
        events.select("user_id")
        .distinct()
        .crossJoin(
            spark.createDataFrame([(s,) for s in stamps], "request_ts timestamp")
        )
    )
    out = get_historical_features(
        requests,
        history,
        ["user_id"],
        feature_cols=["value", "event_type"],
        max_age_secs=ASOF_MAX_AGE,
        include_statuses=True,
        tiebreak_col="event_id",
        strategy="bucketed",
    )
    return out.select(
        "user_id",
        F.unix_micros("request_ts").alias("request_ts_us"),
        F.unix_micros("event_timestamp").alias("event_ts_us"),
        "value",
        "value__status",
        "event_type",
        "event_type__status",
    )


SQL_ASOF = f"""
WITH req AS (
  SELECT u.user_id, t.request_ts
  FROM (SELECT DISTINCT user_id FROM events) u
  CROSS JOIN (SELECT unnest([TIMESTAMP '2024-01-15 00:00:00',
                             TIMESTAMP '2024-01-05 00:00:00']) AS request_ts) t),
j AS (
  SELECT r.user_id, r.request_ts, CAST(e.ts AS TIMESTAMP) AS ets,
         e.value, e.event_type,
         row_number() OVER (PARTITION BY r.user_id, r.request_ts
                            ORDER BY CAST(e.ts AS TIMESTAMP) DESC,
                                     e.event_id DESC) AS rn
  FROM req r LEFT JOIN events e
    ON e.user_id = r.user_id AND CAST(e.ts AS TIMESTAMP) <= r.request_ts),
m AS (
  SELECT *, ets IS NOT NULL AND
         (CAST(epoch(request_ts) AS BIGINT) - CAST(epoch(ets) AS BIGINT))
           > {ASOF_MAX_AGE} AS outside
  FROM j WHERE rn = 1)
SELECT user_id, epoch_us(request_ts) AS request_ts_us,
       epoch_us(ets) AS event_ts_us,
       CASE WHEN outside THEN NULL ELSE value END AS value,
       CASE WHEN ets IS NULL THEN 'NOT_FOUND'
            WHEN outside THEN 'OUTSIDE_MAX_AGE'
            WHEN value IS NULL THEN 'NULL_VALUE'
            ELSE 'PRESENT' END AS value__status,
       CASE WHEN outside THEN NULL ELSE event_type END AS event_type,
       CASE WHEN ets IS NULL THEN 'NOT_FOUND'
            WHEN outside THEN 'OUTSIDE_MAX_AGE'
            WHEN event_type IS NULL THEN 'NULL_VALUE'
            ELSE 'PRESENT' END AS event_type__status
FROM m
"""

# ------------------------------------------------------------------ A2 metrics


def q_historical_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table point-in-time training-set export: two orders-derived
    feature tables as-of joined to a customer entity frame at two cutoff
    dates, features merged back by row index (the feast
    get_historical_features(entity_df, features) API)."""
    reg = Registry()
    reg.apply_entity(Entity("c_custkey", ValueType.INT64))
    for tname, feats in (
        ("cust_orders_price", [Feature("o_totalprice", ValueType.DOUBLE)]),
        ("cust_orders_status", [Feature("o_orderstatus", ValueType.STRING)]),
    ):
        reg.apply_feature_table(
            FeatureTable(
                name=tname,
                entities=["c_custkey"],
                features=feats,
                batch_source=FileSource(
                    file_url=f"{sf_dir}/orders.parquet",
                    event_timestamp_column="o_orderdate",
                    created_timestamp_column="o_orderkey",  # unique tiebreak
                    field_mapping={"o_custkey": "c_custkey"},
                ),
            )
        )
    stamps = [dt.datetime(1996, 1, 1), dt.datetime(1998, 1, 1)]
    entity_df = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 10 == 0)
        .select("c_custkey")
        .crossJoin(
            spark.createDataFrame(
                [(s,) for s in stamps], "event_timestamp timestamp"
            )
        )
    )
    out = get_training_dataset(
        spark,
        reg,
        entity_df,
        ["cust_orders_price:o_totalprice", "cust_orders_status:o_orderstatus"],
    )
    return out.select(
        "c_custkey",
        F.unix_micros("event_timestamp").alias("request_ts_us"),
        F.col("cust_orders_price__o_totalprice").alias("total_price"),
        F.col("cust_orders_status__o_orderstatus").alias("order_status"),
    )


SQL_TRAINING_SET = """
WITH req AS (
  SELECT c_custkey, request_ts
  FROM (SELECT c_custkey FROM customer WHERE c_custkey % 10 = 0)
  CROSS JOIN (SELECT unnest([TIMESTAMP '1996-01-01 00:00:00',
                             TIMESTAMP '1998-01-01 00:00:00']) AS request_ts)),
j AS (
  SELECT req.c_custkey, req.request_ts, o.o_totalprice, o.o_orderstatus,
         row_number() OVER (PARTITION BY req.c_custkey, req.request_ts
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC)
           AS rn
  FROM req LEFT JOIN orders o
    ON o.o_custkey = req.c_custkey AND o.o_orderdate <= req.request_ts)
SELECT c_custkey, epoch_us(request_ts) AS request_ts_us,
       o_totalprice AS total_price, o_orderstatus AS order_status
FROM j WHERE rn = 1
"""


def q_a2_metrics_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: request-metrics aggregation shape (count / count-distinct /
    integer-exact sum)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("sum_value_cents"),
    )


SQL_A2 = """
SELECT event_type, count(*) AS n_events, count(DISTINCT user_id) AS n_users,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events GROUP BY event_type
"""


def q_a3_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: tumbling-window event rollup — the batch form of the
    streaming windowed feature views (SURVEY §2.6 extension).

    ``F.window`` buckets land on hour boundaries, so the DuckDB oracle is
    ``date_trunc('hour', ts)``. Grouped map-side partial aggregation;
    one shuffle keyed by (window, event_type).
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
                "sum_value_cents"
            ),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "n_users",
            "sum_value_cents",
        )
    )


SQL_A3 = """
SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us, event_type,
       count(*) AS n_events, count(DISTINCT user_id) AS n_users,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events GROUP BY 1, 2
"""


def q_a4_sliding_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: sliding-window rollup (1 h window, 30 min slide) — each event
    lands in two overlapping hour windows."""
    events = load_table(spark, sf_dir, "events")
    return windows.sliding_rollup(
        events, ["event_type"], duration="1 hour", slide="30 minutes"
    )


# Spark aligns slide buckets to the epoch: start ∈ {floor_S(t), floor_S(t)−S}
# for D = 2S — both shifts always contain t, so the oracle is a plain
# 2-way expansion, no validity filter needed.
SQL_A4 = """
SELECT (epoch_us(ts) // 1800000000 - i) * 1800000000 AS window_start_us,
       event_type, count(*) AS n_events,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events CROSS JOIN (SELECT unnest([0, 1]) AS i)
GROUP BY 1, 2
"""


def q_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling unique users (6 h window / 2 h slide, exact
    count_distinct): the audience-reach aggregate
    (operators/windows.py:sliding_distinct). Exact form carries each
    window's distinct value set through the shuffle — see
    sliding_distinct_approx for the sketch twin whose shuffle is
    windows × HLL sketches regardless of cardinality."""
    events = load_table(spark, sf_dir, "events")
    return windows.sliding_distinct(
        events, "user_id", duration="6 hours", slide="2 hours"
    )


def q_sliding_distinct_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ twin of sliding_distinct — the 100 TB path (mergeable
    sketch partials; rows-only gate like the other sketch twins)."""
    events = load_table(spark, sf_dir, "events")
    return windows.sliding_distinct(
        events, "user_id", duration="6 hours", slide="2 hours",
        strategy="approx",
    )


# Spark epoch-aligns slide buckets: for D = 3S each event's covering
# window starts are floor_S(t) − i·S for i ∈ {0,1,2} (all three always
# contain t), so the oracle is a plain 3-way expansion like SQL_A4.
SQL_SLIDING_DISTINCT = """
SELECT (epoch_us(ts) // 7200000000 - i) * 7200000000 AS window_start_us,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
FROM events CROSS JOIN (SELECT unnest([0, 1, 2]) AS i)
GROUP BY 1
"""


def q_a5_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: gap-based sessionization (30 min inactivity gap) via native
    ``session_window`` — the same aggregate runs under a stream with a
    watermark."""
    events = load_table(spark, sf_dir, "events")
    return windows.session_rollup(events, ["user_id"], gap="30 minutes")


# Session identity reproduced with the standard lag/cumsum formulation.
# Spark merges an event at exactly last_ts + gap into the session (closed
# end, verified empirically), so a new session starts strictly past it.
SQL_A5 = """
WITH o AS (
  SELECT user_id, event_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events),
m AS (
  SELECT user_id, ts, value,
         sum(CASE WHEN prev IS NULL
                  OR epoch_us(ts) - epoch_us(prev) > 1800000000
             THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess
  FROM o)
SELECT epoch_us(min(ts)) AS session_start_us, user_id,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_value_cents,
       epoch_us(max(ts)) - epoch_us(min(ts)) AS span_us
FROM m GROUP BY user_id, sess
"""

# --------------------------------------------------------- P5 type conformance


def q_p5_type_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: value whose stored type mismatches the declared type → NULL
    (try_cast), value round-trips preserved."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.col("props").try_cast("double").alias("props_as_double"),
        F.col("value").cast("string").try_cast("double").alias("value_roundtrip"),
    )


SQL_P5 = """
SELECT event_id, TRY_CAST(props AS DOUBLE) AS props_as_double,
       TRY_CAST(CAST(value AS VARCHAR) AS DOUBLE) AS value_roundtrip
FROM events
"""

# ------------------------------------------------------------------ dedup ops


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.dedup_exact(docs)


SQL_DEDUP_EXACT = """
SELECT md5(text) AS content_hash, min(doc_id) AS canonical_id,
       count(*) AS n_copies
FROM documents GROUP BY md5(text)
"""

MINHASH_K = 12
MINHASH_BANDS = 4


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_candidates(
        docs, k=MINHASH_K, bands=MINHASH_BANDS, n=3
    )


def _sql_minhash() -> str:
    # Mirrors dedup.minhash_lsh_candidates: 28-bit md5 base hash +
    # universal-hash family (A_i*h + B_i) mod P, per-band md5 buckets.
    P = 2147483647
    rows = MINHASH_K // MINHASH_BANDS
    mins = ",\n    ".join(
        f"min((h * {1000003 + 2 * i} + {12345 + 7919 * i}) % {P}) AS m{i}"
        for i in range(MINHASH_K)
    )
    bands = ",\n    ".join(
        "md5(concat_ws('|', "
        + ", ".join(f"m{b * rows + j}" for j in range(rows))
        + f")) AS b{b}"
        for b in range(MINHASH_BANDS)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, b{b} AS bucket FROM sig" for b in range(MINHASH_BANDS)
    )
    return f"""
WITH toks AS MATERIALIZED (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
sh AS (SELECT doc_id,
        list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                       FOR i IN range(1, len(t) - 1)]) AS s
       FROM toks WHERE len(t) >= 3),
ex AS MATERIALIZED (SELECT doc_id,
        ('0x' || substr(unnest(s), 1, 7))::BIGINT AS h
       FROM (SELECT doc_id, list_transform(s, x -> md5(x)) AS s FROM sh)),
sigm AS MATERIALIZED (SELECT doc_id,
    {mins}
  FROM ex GROUP BY doc_id),
sig AS (SELECT doc_id,
    {bands}
  FROM sigm),
bkt AS ({band_rows})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bkt a JOIN bkt b
  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
"""


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash(docs, bits=32)


def _sql_simhash(bits: int = 32) -> str:
    sums = ",\n    ".join(
        f"sum(CASE WHEN substr(md5(tok), {j}, 1) IN "
        f"('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS s{j}"
        for j in range(1, bits + 1)
    )
    concat = " || ".join(
        f"(CASE WHEN s{j} > 0 THEN '1' ELSE '0' END)" for j in range(1, bits + 1)
    )
    return f"""
WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
              FROM documents),
agg AS (SELECT doc_id,
    {sums}
  FROM toks GROUP BY doc_id)
SELECT doc_id, {concat} AS simhash FROM agg
"""


JACCARD_THRESHOLD = 0.5


JACCARD_MAX_DF = 500


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs with the document-frequency
    prune on the inverted-index self-join (shingles in > max_df docs are
    dropped from the JOIN input only — per-doc sizes stay exact, so
    jaccard is a conservative lower bound; see
    operators/dedup.py:ngram_jaccard_pairs). The oracle applies the
    identical prune."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(
        docs, n=3, threshold=JACCARD_THRESHOLD, max_df=JACCARD_MAX_DF
    )


SQL_JACCARD = f"""
WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
sh AS (SELECT doc_id,
        list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                       FOR i IN range(1, len(t) - 1)]) AS s
       FROM toks WHERE len(t) >= 3),
ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
rare AS (SELECT shingle FROM ex GROUP BY shingle
         HAVING count(*) <= {JACCARD_MAX_DF}),
exr AS (SELECT ex.doc_id, ex.shingle FROM ex JOIN rare USING (shingle)),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
  FROM exr a JOIN exr b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)
SELECT i.doc_a, i.doc_b,
       round(i.ni / (sa.n + sb.n - i.ni), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE round(i.ni / (sa.n + sb.n - i.ni), 6) >= {JACCARD_THRESHOLD}
"""


def q_dedup_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered set-similarity join (AllPairs/PPJoin family,
    operators/dedup.py:prefix_filter_pairs): EXACT Jaccard ≥ 0.5 pairs
    with candidates pruned by the prefix-filter theorem — order each
    doc's shingles by global rarity, index only the first
    |x|−⌈t|x|⌉+1, join on shared prefix shingles + symmetric length
    bound, verify by set intersection. Lossless (unlike LSH recall or
    the max_df lower bound), measured ~0.6% of all-pairs candidate
    volume on this corpus. Oracle is the UNpruned exact inverted-index
    jaccard — equality proves recall-completeness end-to-end."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.prefix_filter_pairs(docs, n=3, threshold=JACCARD_THRESHOLD)


SQL_JACCARD_EXACT = f"""
WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
sh AS (SELECT doc_id,
        list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                       FOR i IN range(1, len(t) - 1)]) AS s
       FROM toks WHERE len(t) >= 3),
ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)
SELECT i.doc_a, i.doc_b,
       round(i.ni / (sa.n + sb.n - i.ni), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE round(i.ni / (sa.n + sb.n - i.ni), 6) >= {JACCARD_THRESHOLD}
"""


CONTAIN_THRESHOLD = 0.8


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment pairs |A∩B|/min(|A|,|B|) ≥ 0.8 — the
    excerpt/superset detector symmetric Jaccard structurally misses
    (operators/dedup.py:containment_pairs): same inverted-index +
    document-frequency-prune shape as the Jaccard pass, ordered output
    (contained side first)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.containment_pairs(
        docs, n=3, threshold=CONTAIN_THRESHOLD, max_df=JACCARD_MAX_DF
    )


SQL_CONTAINMENT = f"""
WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
sh AS (SELECT doc_id,
        list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                       FOR i IN range(1, len(t) - 1)]) AS s
       FROM toks WHERE len(t) >= 3),
ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
rare AS (SELECT shingle FROM ex GROUP BY shingle
         HAVING count(*) <= {JACCARD_MAX_DF}),
exr AS (SELECT ex.doc_id, ex.shingle FROM ex JOIN rare USING (shingle)),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
  FROM exr a JOIN exr b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
sized AS (
  SELECT i.doc_a, i.doc_b, i.ni, sa.n AS na, sb.n AS nb
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.doc_a
  JOIN sizes sb ON sb.doc_id = i.doc_b)
SELECT CASE WHEN na < nb OR (na = nb AND doc_a < doc_b)
            THEN doc_a ELSE doc_b END AS doc_small,
       CASE WHEN na < nb OR (na = nb AND doc_a < doc_b)
            THEN doc_b ELSE doc_a END AS doc_big,
       round(ni / least(na, nb), 6) AS containment
FROM sized
WHERE round(ni / least(na, nb), 6) >= {CONTAIN_THRESHOLD}
"""


VERIFY_THRESHOLD = 0.4


def q_dedup_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale-path dedup composition: MinHash-LSH candidate generation
    followed by exact-Jaccard verification restricted to the candidates
    (cost bounded by |candidates| x shingles-per-doc, not the full
    inverted-index blow-up).

    Hash-matches the candidate-generator-INDEPENDENT exact all-pairs
    truth at the same threshold, proving MinHash-LSH achieves full
    recall on true near-dup pairs at jaccard >= 0.4. (Its one-time
    SimHash twin sharing this oracle is gone: simhash banding is
    provably not recall-complete at this distance — see
    ``q_dedup_verified_simhash``, now the hamming-screened Manku
    composition with its own exact oracle.)"""
    docs = load_table(spark, sf_dir, "documents")
    cands = dedup.minhash_lsh_candidates(
        docs, k=MINHASH_K, bands=MINHASH_BANDS, n=3
    )
    return dedup.verify_candidate_pairs(
        docs, cands, n=3, threshold=VERIFY_THRESHOLD
    )


SIMHASH_MAX_HAMMING = 3


def q_dedup_verified_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-screened exact-Jaccard dedup — the Manku et al. (WWW'07)
    composition: banded fingerprint candidates within a SMALL hamming
    radius, exact-verified. With 4 bands and max_hamming=3, recall of
    every hamming<=3 pair is GUARANTEED by pigeonhole (a pair differing
    in <=3 of 32 bits must agree exactly on one of 4 8-bit bands), so
    the oracle is exact: all pairs with fingerprint hamming <= 3 AND
    n-gram jaccard >= threshold, both conditions computed independently
    by DuckDB (the nibble simhash is digit-for-digit reproducible in
    SQL).

    Why this is the simhash query, and not a jaccard-0.4-recall twin of
    ``dedup_verified`` (its r1-r4 form): SimHash's hamming radius for a
    fixed jaccard is a fixed FRACTION of the fingerprint (P(bit
    differs) = theta/pi, ~0.22 at j=0.4), so no band width is both
    selective (wide) and pigeonhole-complete (narrow) at that distance
    regardless of fingerprint size; the r4 form (4x8 bands, h<=8)
    measured 252/256 truth pairs at sf0.1 — band collision is only
    guaranteed for h < bands — and its ~5M incidental candidates cost
    ~45s to verify. Small radii are simhash's real operating regime
    (Manku uses h<=3 at 64 bits for 8B-page web dedup); for
    jaccard-threshold recall the production generator is MinHash-LSH
    (``dedup_verified``, same verifier, generator-independent truth
    oracle). Cites reference test strategy: core/src/test (near-dup
    detection parity is SURVEY §2 LLM-pipeline surface, no Java
    counterpart).
    (operators/dedup.py:simhash_candidates/verify_candidate_pairs)."""
    docs = load_table(spark, sf_dir, "documents")
    cands = dedup.simhash_candidates(docs, max_hamming=SIMHASH_MAX_HAMMING)
    return dedup.verify_candidate_pairs(
        docs, cands, n=3, threshold=VERIFY_THRESHOLD, strategy="sets"
    )


def _sql_verified_simhash(bits: int = 32) -> str:
    """Exact oracle for the simhash-screened dedup: DuckDB recomputes
    the nibble fingerprints, takes ALL pairs (O(n^2) is fine at oracle
    SF), keeps hamming <= SIMHASH_MAX_HAMMING, and exact-verifies
    n-gram jaccard >= VERIFY_THRESHOLD — generator-independent within
    the hamming ball, which is the query's contract."""
    sums = ",\n    ".join(
        f"sum(CASE WHEN substr(md5(tok), {j}, 1) IN "
        f"('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS s{j}"
        for j in range(1, bits + 1)
    )
    concat = " || ".join(
        f"(CASE WHEN s{j} > 0 THEN '1' ELSE '0' END)" for j in range(1, bits + 1)
    )
    return f"""
WITH toks0 AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
               FROM documents),
agg AS (SELECT doc_id, {sums} FROM toks0 GROUP BY doc_id),
fp AS (SELECT doc_id, {concat} AS simhash FROM agg),
ball AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM fp a JOIN fp b ON a.doc_id < b.doc_id
         WHERE hamming(a.simhash, b.simhash) <= {SIMHASH_MAX_HAMMING}),
toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
shv AS (SELECT doc_id,
        list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                       FOR i IN range(1, len(t) - 1)]) AS s
       FROM toks WHERE len(t) >= 3),
exv AS (SELECT doc_id, unnest(s) AS shingle FROM shv),
sizes AS (SELECT doc_id, count(*) AS n FROM exv GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
  FROM exv a JOIN exv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  JOIN ball ON ball.doc_a = a.doc_id AND ball.doc_b = b.doc_id
  GROUP BY 1, 2)
SELECT i.doc_a, i.doc_b,
       round(i.ni / (sa.n + sb.n - i.ni), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE round(i.ni / (sa.n + sb.n - i.ni), 6) >= {VERIFY_THRESHOLD}
"""


def _sql_verified_truth() -> str:
    """Shared oracle for the dedup_verified strategy twins: exact
    all-pairs n-gram Jaccard at VERIFY_THRESHOLD, no candidate stage —
    any generator with full recall reproduces exactly this."""
    return f"""
WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
shv AS (SELECT doc_id,
        list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                       FOR i IN range(1, len(t) - 1)]) AS s
       FROM toks WHERE len(t) >= 3),
exv AS (SELECT doc_id, unnest(s) AS shingle FROM shv),
sizes AS (SELECT doc_id, count(*) AS n FROM exv GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
  FROM exv a JOIN exv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT i.doc_a, i.doc_b,
       round(i.ni / (sa.n + sb.n - i.ni), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE round(i.ni / (sa.n + sb.n - i.ni), 6) >= {VERIFY_THRESHOLD}
"""


def _sql_dedup_verified() -> str:
    return f"""
WITH cand AS ({_sql_minhash()}),
toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
shv AS (SELECT doc_id,
        list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                       FOR i IN range(1, len(t) - 1)]) AS s
       FROM toks WHERE len(t) >= 3),
exv AS (SELECT doc_id, unnest(s) AS shingle FROM shv),
sizes AS (SELECT doc_id, count(*) AS n FROM exv GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS ni
  FROM cand c
  JOIN exv a ON a.doc_id = c.doc_a
  JOIN exv b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b)
SELECT i.doc_a, i.doc_b,
       round(i.ni / (sa.n + sb.n - i.ni), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE round(i.ni / (sa.n + sb.n - i.ni), 6) >= {VERIFY_THRESHOLD}
"""


INC_BATCH_MOD = 5  # doc_id % 5 == 0 → the "incoming batch"; rest = indexed corpus


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup — the 100 TB corpus-growth pattern:
    new batch docs are signed and probe the PERSISTED LSH index of the
    existing corpus (operators/dedup.py:incremental_dedup via
    minhash_band_buckets); candidates are exact-Jaccard verified. Per
    batch the cost is O(|batch|) signatures + one bucket equi-join —
    never a corpus re-scan.

    Oracle is the generator-independent truth (exact all-pairs Jaccard
    between batch and index at the same threshold), so the gate proves
    the LSH index path has FULL RECALL against the exact answer — the
    same strategy-twin guarantee as dedup_verified/_simhash."""
    docs = load_table(spark, sf_dir, "documents")
    batch = docs.where(F.col("doc_id") % INC_BATCH_MOD == 0)
    index = docs.where(F.col("doc_id") % INC_BATCH_MOD != 0)
    return dedup.incremental_dedup(
        index, batch, k=MINHASH_K, bands=MINHASH_BANDS, n=3,
        threshold=VERIFY_THRESHOLD,
    )


SQL_DEDUP_INCREMENTAL = f"""
WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
shv AS (SELECT doc_id,
        list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                       FOR i IN range(1, len(t) - 1)]) AS s
       FROM toks WHERE len(t) >= 3),
exv AS (SELECT doc_id, unnest(s) AS shingle FROM shv),
sizes AS (SELECT doc_id, count(*) AS n FROM exv GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
  FROM exv a JOIN exv b ON a.shingle = b.shingle
  WHERE a.doc_id % {INC_BATCH_MOD} = 0 AND b.doc_id % {INC_BATCH_MOD} != 0
  GROUP BY 1, 2),
ver AS (
  SELECT i.doc_a, i.doc_b,
         round(i.ni / (sa.n + sb.n - i.ni), 6) AS jaccard
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.doc_a
  JOIN sizes sb ON sb.doc_id = i.doc_b
  WHERE round(i.ni / (sa.n + sb.n - i.ni), 6) >= {VERIFY_THRESHOLD}),
m AS (SELECT doc_a, min(doc_b) AS dup_of, max(jaccard) AS best_jaccard,
             CAST(count(*) AS BIGINT) AS n_dups
      FROM ver GROUP BY doc_a)
SELECT d.doc_id, m.dup_of, m.best_jaccard,
       CAST(coalesce(m.n_dups, 0) AS BIGINT) AS n_dups,
       m.dup_of IS NULL AS is_new
FROM documents d LEFT JOIN m ON m.doc_a = d.doc_id
WHERE d.doc_id % {INC_BATCH_MOD} = 0
"""


CLF_WEIGHTS = {"n_tokens": 0.02, "stopword_ratio": 4.0, "punct_ratio": -6.0}
CLF_BIAS = -1.5


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filter: sigmoid(w·signals + b) as a pure
    codegen projection (fasttext-style classifier inference without a
    UDF); returns score + keep decision at 0.5."""
    docs = load_table(spark, sf_dir, "documents")
    score = text.logistic_quality_cols(CLF_WEIGHTS, bias=CLF_BIAS)
    return docs.select(
        "doc_id",
        score.alias("clf_score"),
        (score >= 0.5).alias("keep"),
    )


SQL_QUALITY_CLF = f"""
WITH b AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(string_split(lower(text), ' ')) AS n_tokens,
         len(list_filter(string_split(lower(text), ' '),
             t -> list_contains({{stoplist}}, t))) AS n_stop,
         length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))
           AS n_alnum_space
  FROM documents),
z AS (
  SELECT doc_id,
         {CLF_BIAS}
         + CAST(n_tokens AS DOUBLE) * {CLF_WEIGHTS["n_tokens"]}
         + round((n_chars - n_alnum_space) / n_chars, 6) * ({CLF_WEIGHTS["punct_ratio"]})
         + round(n_stop / n_tokens, 6) * {CLF_WEIGHTS["stopword_ratio"]} AS z
  FROM b)
SELECT doc_id, round(1.0 / (1.0 + exp(-z)), 6) AS clf_score,
       round(1.0 / (1.0 + exp(-z)), 6) >= 0.5 AS keep
FROM z
"""


PACK_SEQ_LEN = 512
PACK_BUCKET = 100


def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (LLM training batches): docs assigned in id order
    to fixed seq_len token budgets via a DISTRIBUTED prefix sum —
    per-bucket subtotals prefix-summed on the driver and broadcast back,
    within-bucket windows run in parallel (a bare global-order window
    would funnel the corpus through one task). Oracle is the flat global
    cumsum — bit-equal by construction."""
    docs = load_table(spark, sf_dir, "documents")
    return text.sequence_pack(
        docs, seq_len=PACK_SEQ_LEN, bucket_size=PACK_BUCKET
    )


SQL_SEQUENCE_PACK = f"""
WITH t AS (
  SELECT doc_id, len(string_split(lower(text), ' ')) AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
           AS start_pos
  FROM t)
SELECT doc_id, n_tokens,
       CAST(floor(start_pos / {PACK_SEQ_LEN}) AS BIGINT) AS pack_id,
       CAST(start_pos % {PACK_SEQ_LEN} AS BIGINT) AS pack_offset
FROM c
"""


def q_corpus_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics ROLLUP: doc and token counts by
    (predicted_lang, quality_band) with subtotal and grand-total rows —
    the grouping-sets surface (§2.4) a corpus dashboard needs; all
    aggregates map-side combine, one shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    stats = text.text_stat_cols("text")
    scores = text.lang_score_cols("text")
    proj = docs.select(
        "doc_id",
        stats["n_tokens"].alias("n_tokens"),
        stats["quality_score"].alias("q"),
        *[c.alias(n) for n, c in scores.items()],
    ).select(
        "doc_id",
        "n_tokens",
        F.floor(F.col("q") * 5).cast("long").alias("quality_band"),
        text.predicted_lang_col().alias("lang"),
    )
    out = (
        proj.rollup("lang", "quality_band")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
        .select(
            F.coalesce(F.col("lang"), F.lit("ALL")).alias("lang"),
            F.coalesce(
                F.col("quality_band").cast("string"), F.lit("ALL")
            ).alias("quality_band"),
            F.col("n_docs").cast("long").alias("n_docs"),
            "n_tokens",
        )
    )
    return out


def _sql_corpus_rollup() -> str:
    score_cols, argmax = _lang_sql_scores()
    return f"""
WITH scored AS (
  SELECT doc_id, len(string_split(lower(text), ' ')) AS n_tokens,
         length(text) AS n_chars,
         len(list_filter(string_split(lower(text), ' '),
             t -> list_contains({_STOPLIST_SQL}, t))) AS n_stop,
         length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))
           AS n_alnum_space,
         {score_cols}
  FROM documents),
proj AS (
  SELECT doc_id, n_tokens,
         CAST(floor(round(least(n_tokens / 50.0, 1.0) * 0.5
               + least((n_stop / n_tokens) * 5.0, 1.0) * 0.3
               + (1.0 - least(((n_chars - n_alnum_space) / n_chars) * 10.0,
                              1.0)) * 0.2, 6) * 5) AS BIGINT) AS quality_band,
         {argmax} AS lang
  FROM scored)
SELECT coalesce(lang, 'ALL') AS lang,
       coalesce(CAST(quality_band AS VARCHAR), 'ALL') AS quality_band,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens
FROM proj GROUP BY ROLLUP (lang, quality_band)
"""


XMODAL_COSINE = 0.0


def q_dedup_crossmodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal dedup verification: MinHash-LSH candidates verified by
    BOTH exact text Jaccard (>= VERIFY_THRESHOLD) and embedding cosine
    (>= XMODAL_COSINE) — the fused-signal near-dup rule a multimodal
    corpus pipeline uses (text match alone can be boilerplate; embedding
    agreement confirms semantic duplication). Cost stays candidate-
    bounded; the embedding join touches only the verified pairs."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    cands = dedup.minhash_lsh_candidates(
        docs, k=MINHASH_K, bands=MINHASH_BANDS, n=3
    )
    ver = dedup.verify_candidate_pairs(
        docs, cands, n=3, threshold=VERIFY_THRESHOLD
    )
    v = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("__v"),
    ).withColumn("__n", similarity.norm(F.col("__v")))
    return (
        ver.join(v.alias("a"), ver.doc_a == F.col("a.id"))
        .join(v.alias("b"), ver.doc_b == F.col("b.id"))
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            F.round(
                similarity.dot(F.col("a.__v"), F.col("b.__v"))
                / (F.col("a.__n") * F.col("b.__n")),
                6,
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= XMODAL_COSINE)
    )


def _sql_dedup_crossmodal() -> str:
    return f"""
WITH ver AS ({_sql_dedup_verified()}),
v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS e FROM embeddings)
SELECT ver.doc_a, ver.doc_b, ver.jaccard,
       {_cos('a.e', 'b.e')} AS cosine
FROM ver JOIN v a ON a.id = ver.doc_a JOIN v b ON b.id = ver.doc_b
WHERE {_cos('a.e', 'b.e')} >= {XMODAL_COSINE}
"""


# ------------------------------------------------------------------- text ops


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = text.text_stats(docs)
    return out.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "avg_token_len",
        "punct_ratio",
        "stopword_ratio",
        "quality_score",
    )


_STOPLIST_SQL = "['the','a','of','and','to','in','is','it','that','for']"

SQL_TEXT_STATS = f"""
WITH b AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(string_split(lower(text), ' ')) AS n_tokens,
         len(list_filter(string_split(lower(text), ' '),
             t -> list_contains({_STOPLIST_SQL}, t))) AS n_stop,
         length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))
           AS n_alnum_space
  FROM documents)
SELECT doc_id, n_chars, n_tokens,
       round((n_chars - (n_tokens - 1)) / n_tokens, 6) AS avg_token_len,
       round((n_chars - n_alnum_space) / n_chars, 6) AS punct_ratio,
       round(n_stop / n_tokens, 6) AS stopword_ratio,
       round(least(n_tokens / 50.0, 1.0) * 0.5
             + least((n_stop / n_tokens) * 5.0, 1.0) * 0.3
             + (1.0 - least(((n_chars - n_alnum_space) / n_chars) * 10.0, 1.0))
               * 0.2, 6) AS quality_score
FROM b
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = text.lang_id(docs)
    return out.select(
        "doc_id",
        *[F.col(f"score_{lang}").cast("long").alias(f"score_{lang}")
          for lang in sorted(text.LANG_STOPWORDS)],
        "predicted_lang",
    )


def _sql_lang_id() -> str:
    langs = sorted(text.LANG_STOPWORDS)
    scores = ",\n    ".join(
        "len(list_filter(string_split(lower(text), ' '), t -> list_contains(["
        + ",".join(f"'{w}'" for w in text.LANG_STOPWORDS[lang])
        + f"], t))) AS score_{lang}"
        for lang in langs
    )
    # mirror the fold: start at langs[0], strictly-greater candidate wins
    best_s, best_l = f"score_{langs[0]}", f"'{langs[0]}'"
    for lang in langs[1:]:
        cond = f"score_{lang} > ({best_s})"
        best_s = f"CASE WHEN {cond} THEN score_{lang} ELSE ({best_s}) END"
        best_l = f"CASE WHEN {cond} THEN '{lang}' ELSE ({best_l}) END"
    cols = ", ".join(f"score_{lang}" for lang in langs)
    return f"""
WITH s AS (SELECT doc_id,
    {scores}
  FROM documents)
SELECT doc_id, {cols}, {best_l} AS predicted_lang FROM s
"""


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        text.token_count(F.col("text")).cast("long").alias("n_bpe_tokens"),
    )


SQL_TOKEN_COUNT = (
    "SELECT doc_id, len(regexp_extract_all(text, "
    r"'[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]')) AS n_bpe_tokens FROM documents"
)


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", text.fingerprint(F.col("text")).alias("fingerprint")
    )


SQL_FINGERPRINT = (
    "SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) "
    "AS fingerprint FROM documents"
)

def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition signals: fraction of
    n-grams in the most frequent n-gram, fraction in duplicated n-grams
    (n=1,2). Two-level hash aggregate per n; text never shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    return text.repetition_signals(docs, ns=(1, 2))


SQL_TEXT_REPETITION = """
WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
u1 AS (SELECT doc_id, unnest(toks) AS g FROM d),
c1 AS MATERIALIZED (SELECT doc_id, g, count(*) AS cnt FROM u1 GROUP BY doc_id, g),
a1 AS (SELECT doc_id,
         round(CAST(max(cnt) AS DOUBLE) / sum(cnt), 6) AS top_1gram_frac,
         round(CAST(sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS DOUBLE)
               / sum(cnt), 6) AS dup_1gram_frac
       FROM c1 GROUP BY doc_id),
u2 AS (SELECT d.doc_id, toks[i.i] || ' ' || toks[i.i + 1] AS g
       FROM d, unnest(range(1, len(toks))) AS i(i)),
c2 AS (SELECT doc_id, g, count(*) AS cnt FROM u2 GROUP BY doc_id, g),
a2 AS (SELECT doc_id,
         round(CAST(max(cnt) AS DOUBLE) / sum(cnt), 6) AS top_2gram_frac,
         round(CAST(sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS DOUBLE)
               / sum(cnt), 6) AS dup_2gram_frac
       FROM c2 GROUP BY doc_id),
ids AS (SELECT doc_id FROM documents)
SELECT ids.doc_id, a1.top_1gram_frac, a1.dup_1gram_frac,
       a2.top_2gram_frac, a2.dup_2gram_frac
FROM ids LEFT JOIN a1 ON ids.doc_id = a1.doc_id
         LEFT JOIN a2 ON ids.doc_id = a2.doc_id
"""


def q_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship composition: exact-dedup canonicalization → quality gate
    → language ID → PII scrub → cross-doc chunk dedup → deterministic
    per-language mixing sample, end to end. One full-document shuffle
    (fingerprint window), chunk-sized aggregates, then pure filters."""
    docs = load_table(spark, sf_dir, "documents")
    out = pipeline.build_training_corpus(
        docs,
        min_quality=CLEAN_MIN_QUALITY,
        mix_rates=MIX_RATES,
        chunk_tokens=CHUNK_TOKENS,
        max_doc_freq=CHUNK_MAX_DF,
    )
    return out.select(
        "doc_id", "lang", "quality_score", "text",
        F.col("n_chunks").cast("long").alias("n_chunks"),
        F.col("n_removed").cast("long").alias("n_removed"),
    )


def _sql_training_corpus() -> str:
    langs = sorted(text.LANG_STOPWORDS)
    score_exprs = ",\n    ".join(
        "len(list_filter(string_split(lower(text), ' '), t -> list_contains(["
        + ",".join(f"'{w}'" for w in text.LANG_STOPWORDS[lang])
        + f"], t))) AS score_{lang}"
        for lang in langs
    )
    best_s, best_l = f"score_{langs[0]}", f"'{langs[0]}'"
    for lang in langs[1:]:
        cond = f"score_{lang} > ({best_s})"
        best_s = f"CASE WHEN {cond} THEN score_{lang} ELSE ({best_s}) END"
        best_l = f"CASE WHEN {cond} THEN '{lang}' ELSE ({best_l}) END"
    scrub = (
        f"regexp_replace(regexp_replace(regexp_replace(regexp_replace("
        f"text, '{_PII_EMAIL}', '[EMAIL]', 'g'), '{_PII_SSN}', '[SSN]', 'g'), "
        f"'{_PII_PHONE}', '[PHONE]', 'g'), '{_PII_IPV4}', '[IPV4]', 'g')"
    )
    mix_case = " ".join(
        f"WHEN lang = '{s}' THEN {r}" for s, r in sorted(MIX_RATES.items())
    )
    return f"""
WITH b AS (
  SELECT doc_id, text,
         md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp,
         length(text) AS n_chars,
         len(string_split(lower(text), ' ')) AS n_tokens,
         len(list_filter(string_split(lower(text), ' '),
             t -> list_contains({_STOPLIST_SQL}, t))) AS n_stop,
         length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))
           AS n_alnum_space,
         {score_exprs}
  FROM documents),
s AS (
  SELECT doc_id, text,
         round(least(n_tokens / 50.0, 1.0) * 0.5
               + least((n_stop / n_tokens) * 5.0, 1.0) * 0.3
               + (1.0 - least(((n_chars - n_alnum_space) / n_chars) * 10.0,
                              1.0)) * 0.2, 6) AS quality_score,
         {best_l} AS lang,
         row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
  FROM b),
scrub AS (
  SELECT doc_id, lang, quality_score, {scrub} AS text
  FROM s WHERE rn = 1 AND quality_score >= {CLEAN_MIN_QUALITY}),
d AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM scrub),
ch AS (
  SELECT d.doc_id, i.i AS idx,
         array_to_string(toks[i.i*{CHUNK_TOKENS}+1 : i.i*{CHUNK_TOKENS}+{CHUNK_TOKENS}], ' ') AS chunk
  FROM d, unnest(range(0, CAST(ceil(len(toks) / {CHUNK_TOKENS}.0) AS BIGINT))) AS i(i)),
freq AS (SELECT chunk, count(DISTINCT doc_id) AS df FROM ch GROUP BY chunk),
kept AS (SELECT ch.doc_id, ch.idx, ch.chunk
         FROM ch JOIN freq USING (chunk) WHERE freq.df <= {CHUNK_MAX_DF}),
agg AS (SELECT doc_id, string_agg(chunk, ' ' ORDER BY idx) AS text,
               count(*) AS n_kept FROM kept GROUP BY doc_id),
tot AS (SELECT doc_id, count(*) AS n_chunks FROM ch GROUP BY doc_id),
joined AS (
  SELECT t.doc_id, coalesce(a.text, '') AS text,
         t.n_chunks, t.n_chunks - coalesce(a.n_kept, 0) AS n_removed
  FROM tot t LEFT JOIN agg a ON t.doc_id = a.doc_id)
SELECT j.doc_id, sc.lang, sc.quality_score, j.text,
       CAST(j.n_chunks AS BIGINT) AS n_chunks,
       CAST(j.n_removed AS BIGINT) AS n_removed
FROM joined j JOIN scrub sc ON j.doc_id = sc.doc_id
WHERE ('0x' || substr(md5(CAST(j.doc_id AS VARCHAR)), 1, 7))::BIGINT
      / 268435456.0 < (CASE {mix_case} ELSE 0.0 END)
"""


MIX_RATES = {"en": 0.8, "de": 0.5, "fr": 0.25, "es": 0.1}
VOCAB_K = 50


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing: deterministic per-language sampling of the corpus.
    Stratum = predicted language (lang_id); keep iff the 28-bit md5
    fraction of doc_id < the stratum's mixing rate — reproducible on any
    cluster, maximal overlap under rate changes, zero shuffles beyond
    lang_id's own plan."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    scored = docs.select("doc_id", "text", *[
        c.alias(n) for n, c in text.lang_score_cols("text").items()
    ])
    labeled = scored.select(
        "doc_id", text.predicted_lang_col().alias("lang")
    )
    sampled = text.stratified_sample(labeled, "lang", MIX_RATES)
    return sampled.select("doc_id", "lang")


def _lang_sql_scores() -> tuple[str, str]:
    """(score CTE columns, argmax CASE) reproducing lang_id in SQL."""
    score_cols = []
    for lang in sorted(text.LANG_STOPWORDS):
        words = ", ".join(f"'{w}'" for w in text.LANG_STOPWORDS[lang])
        score_cols.append(
            f"len(list_filter(string_split(lower(text), ' '), "
            f"x -> list_contains([{words}], x))) AS score_{lang}"
        )
    langs = sorted(text.LANG_STOPWORDS)
    best = f"'{langs[0]}'"
    best_s = f"score_{langs[0]}"
    # fold-left strictly-greater argmax, mirroring predicted_lang_col
    expr_s, expr_l = best_s, best
    for lang in langs[1:]:
        expr_l = (
            f"CASE WHEN score_{lang} > ({expr_s}) THEN '{lang}' "
            f"ELSE ({expr_l}) END"
        )
        expr_s = f"CASE WHEN score_{lang} > ({expr_s}) THEN score_{lang} ELSE ({expr_s}) END"
    return ", ".join(score_cols), expr_l


_MIX_CASE = " ".join(
    f"WHEN lang = '{s}' THEN {r}" for s, r in sorted(MIX_RATES.items())
)

SQL_STRATIFIED_SAMPLE = f"""
WITH scored AS (SELECT doc_id, {_lang_sql_scores()[0]} FROM documents),
labeled AS (SELECT doc_id, {_lang_sql_scores()[1]} AS lang FROM scored)
SELECT doc_id, lang FROM labeled
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT
      / 268435456.0 < (CASE {_MIX_CASE} ELSE 0.0 END)
"""


def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-k token vocabulary (distributed TakeOrdered, not
    a global window sort)."""
    docs = load_table(spark, sf_dir, "documents")
    return text.top_k_vocabulary(docs, k=VOCAB_K).select(
        "rank", "token", F.col("freq").cast("long").alias("freq")
    )


SQL_VOCAB_TOPK = f"""
WITH toks AS (SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents),
counts AS (SELECT token, count(*) AS freq FROM toks GROUP BY token)
SELECT CAST(row_number() OVER (ORDER BY freq DESC, token ASC) AS BIGINT) AS rank,
       token, CAST(freq AS BIGINT) AS freq
FROM counts
ORDER BY freq DESC, token ASC
LIMIT {VOCAB_K}
"""


SKEW_TOP_N = 10


def q_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew diagnostic on the events entity key: top-N heaviest
    user_ids with share and x-mean load — the measurement that picks
    plain vs skew-bucketed strategies."""
    from feast_java_old_spark.operators.materialize import key_skew_stats

    events = load_table(spark, sf_dir, "events")
    return key_skew_stats(events, ["user_id"], top_n=SKEW_TOP_N)


SQL_KEY_SKEW = f"""
WITH cnt AS (SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS cnt
             FROM events GROUP BY user_id),
tot AS (SELECT sum(cnt) AS total, avg(cnt) AS mean, count(*) AS nd FROM cnt)
SELECT CAST(row_number() OVER (ORDER BY cnt DESC, key ASC) AS BIGINT) AS rank,
       key, CAST(cnt AS BIGINT) AS cnt,
       round(cnt / tot.total, 6) AS share,
       round(cnt / tot.mean, 6) AS x_mean,
       CAST(tot.nd AS BIGINT) AS n_distinct_keys
FROM cnt, tot
ORDER BY cnt DESC, key ASC
LIMIT {SKEW_TOP_N}
"""


# ------------------------------------------------------------- curation ops

DECONTAM_N = 3
DECONTAM_MIN_HITS = 2
DECONTAM_BENCH_MOD = 50


DSIR_BUCKETS = 4096


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): score every document
    by hashed-bigram likelihood ratio against the English subset as the
    target distribution — the in-domain data-selection step of a
    target-matched pretraining mixture. Bucket log-ratios quantize to
    integer micro-units before the per-doc sum, so scores are exact
    integers (operators/curation.py:dsir_weights)."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.dsir_weights(
        docs, target=F.col("lang") == "en", n=2, buckets=DSIR_BUCKETS
    )


SQL_DSIR = f"""
WITH toks AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS t
              FROM documents),
gr AS (SELECT doc_id, lang,
              unnest([t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]) AS g
       FROM toks WHERE len(t) >= 2),
bk AS (SELECT doc_id, lang,
              ('0x' || substr(md5(g), 1, 7))::BIGINT % {DSIR_BUCKETS} AS b
       FROM gr),
cs AS (SELECT b, count(*) AS c FROM bk GROUP BY b),
ct AS (SELECT b, count(*) AS c FROM bk WHERE lang = 'en' GROUP BY b),
tot AS (SELECT (SELECT CAST(sum(c) AS DOUBLE) FROM cs) AS ts,
               (SELECT CAST(sum(c) AS DOUBLE) FROM ct) AS tt),
ratio AS (SELECT cs.b,
                 CAST(round((ln((coalesce(ct.c, 0) + 1.0)
                                / (tot.tt + {DSIR_BUCKETS}.0))
                           - ln((cs.c + 1.0)
                                / (tot.ts + {DSIR_BUCKETS}.0)))
                            * 1000000) AS BIGINT) AS micro
          FROM cs LEFT JOIN ct USING (b) CROSS JOIN tot),
docb AS (SELECT doc_id, b, count(*) AS nb FROM bk GROUP BY doc_id, b)
SELECT doc_id, CAST(sum(nb) AS BIGINT) AS n_ngrams,
       CAST(sum(nb * micro) AS BIGINT) AS dsir_micro
FROM docb JOIN ratio USING (b) GROUP BY doc_id
"""


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: docs with doc_id % 50 == 0 play the
    eval set; every other doc is flagged when it shares >= 2 distinct
    3-grams with it. Benchmark n-grams broadcast; corpus text never
    shuffles (operators/curation.py:decontaminate)."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % DECONTAM_BENCH_MOD == 0)
    corpus = docs.where(F.col("doc_id") % DECONTAM_BENCH_MOD != 0)
    return curation.decontaminate(
        corpus, bench, n=DECONTAM_N, min_hits=DECONTAM_MIN_HITS
    )


SQL_DECONTAMINATE = f"""
WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
sh AS (SELECT doc_id,
        [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
         FOR i IN range(1, len(t) - 1)] AS s
       FROM toks WHERE len(t) >= {DECONTAM_N}),
ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
bench AS (SELECT DISTINCT shingle FROM ex
          WHERE doc_id % {DECONTAM_BENCH_MOD} = 0),
hits AS (SELECT e.doc_id, count(DISTINCT e.shingle) AS n_hits
         FROM ex e JOIN bench b USING (shingle)
         WHERE e.doc_id % {DECONTAM_BENCH_MOD} != 0
         GROUP BY e.doc_id)
SELECT d.doc_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       coalesce(h.n_hits, 0) >= {DECONTAM_MIN_HITS} AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % {DECONTAM_BENCH_MOD} != 0
"""


SHUFFLE_SHARDS = 8
SHUFFLE_SEED = 42


def q_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order shuffle: md5(doc_id:seed) keys,
    shard = 28-bit bucket mod n_shards, pos = within-shard rank — a
    reproducible uniform permutation with per-shard parallel sorts, no
    global orderBy (operators/curation.py:corpus_shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.corpus_shuffle(
        docs, n_shards=SHUFFLE_SHARDS, seed=SHUFFLE_SEED
    )


SQL_CORPUS_SHUFFLE = f"""
WITH k AS (SELECT doc_id,
        md5(CAST(doc_id AS VARCHAR) || ':{SHUFFLE_SEED}') AS key
      FROM documents),
s AS (SELECT doc_id, key,
        ('0x' || substr(key, 1, 7))::BIGINT % {SHUFFLE_SHARDS} AS shard
      FROM k)
SELECT doc_id, CAST(shard AS BIGINT) AS shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY key, doc_id)
            AS BIGINT) AS pos
FROM s
"""


MANIFEST_SHARDS = 16
MANIFEST_SEED = 42


def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-dataset manifest: per-shard doc/token counts + an
    order-sensitive content hash over the shard's fingerprints — the
    dataset-card record a run pins for reproducibility
    (operators/curation.py:shard_manifest)."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.shard_manifest(
        docs, n_shards=MANIFEST_SHARDS, seed=MANIFEST_SEED
    )


SQL_SHARD_MANIFEST = f"""
WITH k AS (SELECT doc_id, text,
        md5(CAST(doc_id AS VARCHAR) || ':{MANIFEST_SEED}') AS key
      FROM documents),
s AS (SELECT doc_id, text, key,
        ('0x' || substr(key, 1, 7))::BIGINT % {MANIFEST_SHARDS} AS shard
      FROM k),
p AS (SELECT doc_id, shard,
        row_number() OVER (PARTITION BY shard ORDER BY key, doc_id) AS pos,
        md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp,
        len(string_split(lower(text), ' ')) AS nt
      FROM s)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS n_tokens,
       md5(string_agg(fp, ',' ORDER BY pos)) AS content_hash
FROM p GROUP BY shard
"""


NORM_BLOCKLIST = ("spam", "clickbait", "slow")


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization + blocklist screen: whitespace squeeze, adjacent
    duplicate-token collapse, C4-style bad-word flag — one codegen
    projection, zero shuffles (operators/curation.py:normalize_text)."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.normalize_text(docs, blocklist=NORM_BLOCKLIST)


_BLOCK_SQL = ", ".join(f"'{w}'" for w in NORM_BLOCKLIST)

SQL_TEXT_NORMALIZE = f"""
WITH b AS (SELECT doc_id,
        string_split(regexp_replace(trim(lower(text)), ' +', ' ', 'g'), ' ')
          AS t
      FROM documents),
c AS (SELECT doc_id, t,
        [t[i] FOR i IN range(1, len(t) + 1) IF i = 1 OR t[i] != t[i-1]]
          AS ct
      FROM b)
SELECT doc_id, array_to_string(ct, ' ') AS text,
       CAST(len(t) AS BIGINT) AS n_tokens_raw,
       CAST(len(ct) AS BIGINT) AS n_tokens,
       len(list_filter(ct, x -> list_contains([{_BLOCK_SQL}], x))) > 0
         AS blocked
FROM c
"""


HN_K = 5


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining: per query, top-k cosine
    neighbors with a different label; label predicate fused into the
    broadcast join (operators/similarity.py:hard_negatives)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "label", "embedding"
    )
    return similarity.hard_negatives(emb, queries, k=HN_K).select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "neighbor_id",
        "neighbor_label",
        "cosine",
    )


SQL_HARD_NEGATIVES = f"""
WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
q AS (SELECT vec_id AS query_id, label AS qlabel, e AS qe
      FROM v WHERE vec_id % 100 = 0),
scored AS (
  SELECT q.query_id, v.vec_id AS neighbor_id, v.label AS neighbor_label,
         round(list_dot_product(v.e, q.qe)
               / (sqrt(list_dot_product(v.e, v.e))
                  * sqrt(list_dot_product(q.qe, q.qe))), 6)
           AS cosine
  FROM v CROSS JOIN q
  WHERE v.vec_id != q.query_id AND v.label != q.qlabel)
SELECT query_id, rank, neighbor_id, neighbor_label, cosine
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY cosine DESC, neighbor_id ASC) AS rank FROM scored)
WHERE rank <= {HN_K}
"""


MIX_ALPHA = 0.5
MIX_TARGET = 200


def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted domain mixing: keep-rate per source
    proportional to count^alpha (alpha=0.5 upweights small domains),
    scaled to an expected 200-row sample, applied as the deterministic
    md5 filter (operators/curation.py:temperature_mix)."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.temperature_mix(
        docs, strata_col="source", alpha=MIX_ALPHA, target_rows=MIX_TARGET
    )


SQL_DOMAIN_MIX = f"""
WITH counts AS (SELECT source AS stratum, count(*) AS cnt
                FROM documents GROUP BY source),
w AS (SELECT stratum, cnt, pow(cnt, {MIX_ALPHA}) AS w FROM counts),
r AS (SELECT stratum,
        round(least(1.0, {MIX_TARGET}.0 * (w / sum(w) OVER ()) / cnt), 6)
          AS rate
      FROM w)
SELECT d.doc_id, r.stratum, r.rate
FROM documents d JOIN r ON d.source = r.stratum
WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 7))::BIGINT
      / 268435456.0 < r.rate
"""


def q_corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split: md5-fraction binning by
    cumulative weights — stable under reruns and corpus growth
    (operators/curation.py:corpus_split)."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.corpus_split(docs).select("doc_id", "source", "split")


def _sql_corpus_split() -> str:
    # boundaries from the SAME float accumulation as corpus_split, so
    # the literals are bit-identical across engines
    branches, acc = [], 0.0
    for name, w in curation.DEFAULT_SPLITS[:-1]:
        acc += w
        branches.append(f"WHEN frac < {acc!r} THEN '{name}'")
    last = curation.DEFAULT_SPLITS[-1][0]
    return f"""
WITH f AS (SELECT doc_id, source,
        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT
        / 268435456.0 AS frac
      FROM documents)
SELECT doc_id, source, CASE {' '.join(branches)} ELSE '{last}' END AS split
FROM f
"""


TOPK_PER_SOURCE = 5


def q_domain_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum/quota selection: best 5 documents per source by the
    composite quality score — per-stratum parallel rank windows, no
    global sort (operators/curation.py:per_stratum_topk)."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.per_stratum_topk(
        docs,
        score=text.text_stat_cols("text")["quality_score"],
        strata_col="source",
        k=TOPK_PER_SOURCE,
    )


def _sql_domain_topk() -> str:
    return f"""
WITH b AS (SELECT doc_id, source,
        length(text) AS n_chars,
        len(string_split(lower(text), ' ')) AS n_tokens,
        len(list_filter(string_split(lower(text), ' '),
            t -> list_contains({_STOPLIST_SQL}, t))) AS n_stop,
        length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))
          AS n_alnum_space
      FROM documents),
s AS (SELECT doc_id, source,
        round(least(n_tokens / 50.0, 1.0) * 0.5
              + least((n_stop / n_tokens) * 5.0, 1.0) * 0.3
              + (1.0 - least(((n_chars - n_alnum_space) / n_chars) * 10.0,
                             1.0)) * 0.2, 6) AS score
      FROM b)
SELECT source AS stratum, CAST(rank AS BIGINT) AS rank, doc_id, score
FROM (SELECT *, row_number() OVER (PARTITION BY source
        ORDER BY score DESC, doc_id ASC) AS rank FROM s)
WHERE rank <= {TOPK_PER_SOURCE}
"""


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style model-based quality signal: per-doc mean log-prob of
    its tokens under the corpus's own unigram distribution (vocab
    aggregate + broadcast vocab join + per-doc re-agg)
    (operators/text.py:unigram_logprob)."""
    docs = load_table(spark, sf_dir, "documents")
    return text.unigram_logprob(docs)


SQL_UNIGRAM_LOGPROB = """
WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
              FROM documents),
vocab AS (SELECT token, count(*) AS freq FROM toks GROUP BY token),
tot AS (SELECT sum(freq) AS total FROM vocab),
v AS (SELECT token, ln(freq / tot.total) AS lp FROM vocab, tot)
SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       round(avg(v.lp), 6) AS logprob
FROM toks t JOIN v USING (token)
GROUP BY t.doc_id
"""


OUTLIER_NORM_LO = 0.01
OUTLIER_NORM_HI = 0.99
OUTLIER_CENTER_FRAC = 0.05


def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding sanity screen: norm band + off-manifold tail (cosine to
    the corpus mean vector below its p5) — centroid and thresholds are
    1-row broadcast aggregates
    (operators/similarity.py:embedding_outliers)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.embedding_outliers(
        emb,
        dim=KM_DIM,
        norm_lo=OUTLIER_NORM_LO,
        norm_hi=OUTLIER_NORM_HI,
        center_frac=OUTLIER_CENTER_FRAC,
    )


def _sql_embedding_outliers() -> str:
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
dims AS (SELECT d.dim, avg(e[d.dim]) AS m
         FROM v CROSS JOIN
              (SELECT unnest(range(1, {KM_DIM} + 1)) AS dim) d
         GROUP BY d.dim),
cent AS (SELECT list(m ORDER BY dim) AS c FROM dims),
scored AS (
  SELECT vec_id,
         round(sqrt(list_dot_product(e, e)), 6) AS norm,
         round(list_dot_product(e, cent.c)
               / (sqrt(list_dot_product(e, e))
                  * sqrt(list_dot_product(cent.c, cent.c))), 6)
           AS center_cos
  FROM v, cent),
b AS (SELECT quantile_cont(norm, {OUTLIER_NORM_LO}) AS nlo,
             quantile_cont(norm, {OUTLIER_NORM_HI}) AS nhi,
             quantile_cont(center_cos, {OUTLIER_CENTER_FRAC}) AS clo
      FROM scored)
SELECT vec_id, norm, center_cos,
       (norm < b.nlo OR norm > b.nhi OR center_cos < b.clo) AS outlier
FROM scored, b
"""


UPSAMPLE_RATES = {"src0": 3.0, "src1": 2.5, "src2": 0.5}


def q_domain_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication-based domain upsampling (rates may exceed 1 — the
    epoch-weighting complement of the capped mixing ops): floor(rate)
    copies + one deterministic fractional copy, via explode(sequence)
    with no shuffle (operators/curation.py:upsample)."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.upsample(docs, "source", UPSAMPLE_RATES).select(
        "doc_id", "source", "copy"
    )


_UPSAMPLE_CASE = " ".join(
    f"WHEN source = '{s}' THEN {r}" for s, r in sorted(UPSAMPLE_RATES.items())
)

SQL_DOMAIN_UPSAMPLE = f"""
WITH r AS (SELECT doc_id, source,
        (CASE {_UPSAMPLE_CASE} ELSE 1.0 END) AS rate,
        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT
          / 268435456.0 AS frac
      FROM documents),
n AS MATERIALIZED (SELECT doc_id, source,
        CAST(floor(rate) + CASE WHEN frac < rate - floor(rate)
                                THEN 1 ELSE 0 END AS BIGINT) AS n
      FROM r)
SELECT doc_id, source, CAST(c.k AS BIGINT) AS copy
FROM n CROSS JOIN (SELECT unnest(range(1,
    {int(max(max(UPSAMPLE_RATES.values()), 1.0)) + 1})) AS k) c
WHERE c.k <= n.n
"""


def q_corpus_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup application: MinHash-LSH candidates →
    connected-components groups → keep only each group's canonical
    (min-id) representative — the corpus a pretraining run actually
    reads (operators/dedup.py:dedup_components + an edges-sized
    representative filter; documents never shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_candidates(
        docs, k=MINHASH_K, bands=MINHASH_BANDS, n=3
    )
    comp = dedup.dedup_components(pairs, docs.select("doc_id"))
    reps = comp.where(F.col("group_id") == F.col("doc_id")).select("doc_id")
    return docs.join(reps, on="doc_id", how="left_semi").select(
        "doc_id", "source"
    )


def _sql_corpus_dedup_apply() -> str:
    return f"""
WITH RECURSIVE cand AS ({_sql_minhash()}),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM cand
          UNION SELECT doc_b AS src, doc_a AS dst FROM cand),
reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.node = e.dst),
comp AS (SELECT node AS doc_id, min(lbl) AS group_id FROM reach GROUP BY node)
SELECT d.doc_id, d.source
FROM documents d JOIN comp c ON d.doc_id = c.doc_id
WHERE c.group_id = c.doc_id
"""


def q_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc n-gram novelty — fraction of a document's distinct
    3-grams found in NO other document (operators/text.py:
    novelty_score): the boilerplate screen's inverse, used to weight
    original content up in curation mixes. One DF aggregate + one
    skew-safe join; text never shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    return text.novelty_score(docs)


SQL_NOVELTY = """
WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
sh AS (SELECT doc_id,
        list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                       FOR i IN range(1, len(t) - 1)]) AS s
       FROM toks WHERE len(t) >= 3),
ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
dfq AS (SELECT shingle, count(*) AS df FROM ex GROUP BY shingle)
SELECT ex.doc_id, CAST(count(*) AS BIGINT) AS n_ngrams,
       CAST(sum(CASE WHEN dfq.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       round(sum(CASE WHEN dfq.df = 1 THEN 1 ELSE 0 END) / count(*), 6)
         AS novelty
FROM ex JOIN dfq USING (shingle)
GROUP BY ex.doc_id
"""


def q_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-dedup observability: the duplicate-group SIZE HISTOGRAM
    (how many singletons, pairs, triples… the LSH components found) —
    the number a curation report leads with. Components via the same
    min-label propagation as corpus_dedup_apply; the histogram is two
    tiny aggregates over the node-sized component frame."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_candidates(
        docs, k=MINHASH_K, bands=MINHASH_BANDS, n=3
    )
    comp = dedup.dedup_components(pairs, docs.select("doc_id"))
    sizes = comp.groupBy("group_id").agg(F.count(F.lit(1)).alias("group_size"))
    return sizes.groupBy("group_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups")
    )


def _sql_dedup_stats() -> str:
    return f"""
WITH RECURSIVE cand AS ({_sql_minhash()}),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM cand
          UNION SELECT doc_b AS src, doc_a AS dst FROM cand),
reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.node = e.dst),
comp AS (SELECT node AS doc_id, min(lbl) AS group_id FROM reach GROUP BY node),
sizes AS (SELECT group_id, count(*) AS group_size FROM comp GROUP BY group_id)
SELECT CAST(group_size AS BIGINT) AS group_size,
       CAST(count(*) AS BIGINT) AS n_groups
FROM sizes GROUP BY group_size
"""


IJ_WEEKS = 10
IJ_WEEK_US = 7 * 86400 * 1_000_000
IJ_SPAN_US = 3 * 86400 * 1_000_000


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join: events x 10 synthetic 3-day windows (one per
    week from the corpus start) as a hash EQUI-join on day bands + exact
    residual filter — never a BroadcastNestedLoopJoin
    (operators/windows.py:interval_join)."""
    events = load_table(spark, sf_dir, "events")
    iv = (
        events.agg(F.unix_micros(F.min("ts")).alias("__t0"))
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(IJ_WEEKS - 1))).alias(
                "interval_id"
            ),
            "__t0",
        )
        .select(
            F.col("interval_id").cast("long").alias("interval_id"),
            F.timestamp_micros(
                F.col("__t0") + F.col("interval_id") * F.lit(IJ_WEEK_US)
            ).alias("start"),
            F.timestamp_micros(
                F.col("__t0")
                + F.col("interval_id") * F.lit(IJ_WEEK_US)
                + F.lit(IJ_SPAN_US)
            ).alias("end"),
        )
    )
    joined = windows.interval_join(
        events.select("ts", "event_type", "value"), iv, ts_col="ts"
    )
    return joined.groupBy("interval_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
            "sum_value_cents"
        ),
    )


SQL_INTERVAL_JOIN = f"""
WITH t0 AS (SELECT epoch_us(min(ts)) AS t0 FROM events),
iv AS (SELECT CAST(k AS BIGINT) AS interval_id,
        make_timestamp(t0.t0 + k * {IJ_WEEK_US}) AS s,
        make_timestamp(t0.t0 + k * {IJ_WEEK_US} + {IJ_SPAN_US}) AS e
       FROM t0, (SELECT unnest(range(0, {IJ_WEEKS})) AS k)),
j AS (SELECT iv.interval_id, ev.event_type, ev.value
      FROM events ev JOIN iv ON ev.ts >= iv.s AND ev.ts < iv.e)
SELECT interval_id, event_type, count(*) AS n_events,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
         AS sum_value_cents
FROM j GROUP BY interval_id, event_type
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event session assignment (row-level companion of a5): lag +
    running-sum over a per-key window; strictly-greater gap rule matches
    session_window's closed end
    (operators/windows.py:sessionize)."""
    events = load_table(spark, sf_dir, "events")
    return windows.sessionize(events, ["user_id"], gap="30 minutes")


SQL_SESSIONIZE = """
WITH o AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events)
SELECT user_id, event_id, ts_us, gap_us,
       CAST(sum(CASE WHEN gap_us IS NULL OR gap_us > 1800000000
                     THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
FROM o
"""


def q_session_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item co-occurrence within 30-min sessions (the counting
    kernel of item-similarity recommenders): sessionize → per-session
    item presence → unordered pair counts
    (operators/windows.py:session_cooccurrence)."""
    ev = load_table(spark, sf_dir, "events")
    return windows.session_cooccurrence(
        ev, ["user_id"], "event_type", ts_col="ts", id_col="event_id"
    )


SQL_SESSION_COOC = """
WITH o AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events),
s AS (SELECT user_id, event_type,
             sum(CASE WHEN gap_us IS NULL OR gap_us > 1800000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM o),
pres AS (SELECT DISTINCT user_id, session_seq, event_type FROM s)
SELECT a.event_type AS item_a, b.event_type AS item_b,
       CAST(count(*) AS BIGINT) AS n_sessions
FROM pres a
JOIN pres b ON a.user_id = b.user_id AND a.session_seq = b.session_seq
           AND a.event_type < b.event_type
GROUP BY 1, 2
"""


KM_K = 100  # fixed centroid count — independent of corpus size by design
KM_DIM = 64


def _kmeans_refine(spark: SparkSession, sf_dir: str, kernel: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # NULL-vector ingestion contract (r9): NULL embeddings are not
    # points in the space — filtered before seeding/assignment (the
    # oracle reads the same NULL-free relation).
    v = emb.where(F.col("embedding").isNotNull()).select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("__v"),
    )
    cent = (
        v.orderBy("id")
        .limit(KM_K)
        .select(F.col("id").alias("centroid_id"), F.col("__v").alias("__cv"))
    )
    step = similarity.kmeans_step(v, cent, dim=KM_DIM, kernel=kernel)
    return step.select(
        "centroid_id",
        "n_members",
        F.posexplode("centroid").alias("dim", "value"),
    ).select(
        "centroid_id",
        "n_members",
        F.col("dim").cast("long").alias("dim"),
        "value",
    )


def q_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd iteration of spherical k-means over the embeddings:
    broadcast-argmax assignment + per-dimension mean recomputation —
    the in-engine trainer for the IVF coarse quantizer
    (operators/similarity.py:kmeans_step, Arrow/BLAS kernel — one GEMM
    per batch, measured ~10x faster than the interpreted higher-order
    expression fold at k=100).

    The centroid seed is a FIXED k (the ``KM_K`` lowest vec_ids via
    TakeOrdered), not an ``id % step`` sample — a modulo sample grows k
    linearly with the corpus, which makes the broadcast-argmax plan
    O(N·k) = quadratic at 100 TB; fixed k keeps it scan-bound. The
    centroid vectors are emitted EXPLODED to scalar
    ``(centroid_id, n_members, dim, value)`` rows: the driver gate's
    pandas canonicalizer sorts every output column, and array-typed
    cells are unsortable there (the r3 red row)."""
    return _kmeans_refine(spark, sf_dir, kernel="arrow")


IVFPQ_NPROBE = 12
IVFPQ_RERANK = 100


def q_ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with exact rerank — the billion-vector index composition:
    trained coarse lists bound WHICH vectors a query touches, residual
    PQ codes bound what each costs (m table lookups, no float vector at
    scan time), and the ADC shortlist's exact rerank restores recall
    (measured 0.84@5 vs brute-force cosine; recall-gated in
    tests/test_similarity.py). Rows-only gate: the codebooks come from
    driver-side NumPy k-means, which no SQL engine reproduces — the
    recall gate is the correctness evidence, like the other ANN paths
    (operators/similarity.py:ann_ivf_pq)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qrows = (  # query batch = non-NULL vectors (ingestion contract)
        emb.where(F.col("embedding").isNotNull())
        .select("vec_id", F.col("embedding").cast("array<double>"))
        .orderBy("vec_id")
        .limit(PQ_QUERIES)
        .collect()
    )
    queries = [(int(r[0]), list(r[1])) for r in qrows]
    return similarity.ann_ivf_pq(
        emb, queries, k=PQ_K, nprobe=IVFPQ_NPROBE, rerank=IVFPQ_RERANK
    )


KMT_K = 50
KMT_ITERS = 2


def q_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full in-engine spherical k-means training (deterministic seed +
    2 Lloyd iterations, Arrow/BLAS assignment kernel): the complete IVF
    coarse-quantizer trainer, hash-matched against an oracle that
    unrolls every iteration's assignment + recentering term-for-term
    (operators/similarity.py:kmeans_train). Lineage is cut per
    iteration by the step's driver-side centroid collect (k·dim doubles
    become literals), so plan size is iteration-independent."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("__v"),
    )
    out = similarity.kmeans_train(
        v, k=KMT_K, iters=KMT_ITERS, dim=KM_DIM
    )
    return out.select(
        "centroid_id",
        "n_members",
        F.posexplode("centroid").alias("dim", "value"),
    ).select(
        "centroid_id",
        "n_members",
        F.col("dim").cast("long").alias("dim"),
        "value",
    )


def _sql_kmeans_train(k: int = KMT_K, iters: int = KMT_ITERS) -> str:
    def cos(v: str, c: str) -> str:
        return (
            f"round(list_dot_product({v}, {c})"
            f" / (sqrt(list_dot_product({v}, {v}))"
            f" * sqrt(list_dot_product({c}, {c}))), 6)"
        )

    parts = [
        "v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)",
        f"cent0 AS (SELECT vec_id AS cid, e AS ce FROM v"
        f" ORDER BY vec_id LIMIT {k})",
    ]
    for i in range(iters):
        parts.append(
            f"""asg{i} AS (
  SELECT vec_id, cid, e FROM (
    SELECT v.vec_id, c.cid, v.e,
           row_number() OVER (PARTITION BY v.vec_id
             ORDER BY {cos('v.e', 'c.ce')} DESC, c.cid ASC) AS rn
    FROM v CROSS JOIN cent{i} c) WHERE rn = 1)"""
        )
        parts.append(
            f"""dims{i} AS (SELECT cid, d.dim, e[d.dim] AS val
  FROM asg{i} CROSS JOIN
       (SELECT unnest(range(1, {KM_DIM} + 1)) AS dim) d)"""
        )
        parts.append(
            f"""means{i} AS (SELECT cid, dim, round(avg(val), 6) AS m
  FROM dims{i} GROUP BY cid, dim)"""
        )
        if i + 1 < iters:
            parts.append(
                f"""cent{i + 1} AS (SELECT cid, list(m ORDER BY dim) AS ce
  FROM means{i} GROUP BY cid)"""
            )
    last = iters - 1
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
cnts AS (SELECT cid, count(*) AS n FROM asg{last} GROUP BY cid)
SELECT c.cid AS centroid_id, CAST(c.n AS BIGINT) AS n_members,
       CAST(m.dim - 1 AS BIGINT) AS dim, m.m AS value
FROM cnts c JOIN means{last} m ON m.cid = c.cid
"""
    )


PQ_M = 8
PQ_CODES = 16
PQ_QUERIES = 3
PQ_K = 5


def q_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding: every embedding compresses to 8
    nibble codes (64x smaller than float32) — the memory-bounded ANN
    index build. Deterministic codebooks (lowest-16-id subvectors),
    assignment is a pure projection against literal codewords, output
    exploded to scalar (vec_id, subspace, code) rows
    (operators/similarity.py:pq_train/pq_encode)."""
    emb = load_table(spark, sf_dir, "embeddings")
    cbs = similarity.pq_train(emb, m=PQ_M, codes=PQ_CODES, dim=KM_DIM)
    return similarity.pq_encode(emb, cbs)


def q_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance top-k (ADC): per-query lookup tables over
    the codebooks, micro-quantized before the cross-subspace sum so
    scores are exact integers; the corpus scan touches only code
    columns, never a float vector
    (operators/similarity.py:pq_adc_topk)."""
    emb = load_table(spark, sf_dir, "embeddings")
    cbs = similarity.pq_train(emb, m=PQ_M, codes=PQ_CODES, dim=KM_DIM)
    qrows = (  # query batch = non-NULL vectors (ingestion contract)
        emb.where(F.col("embedding").isNotNull())
        .select("vec_id", F.col("embedding").cast("array<double>"))
        .orderBy("vec_id")
        .limit(PQ_QUERIES)
        .collect()
    )
    queries = [(int(r[0]), list(r[1])) for r in qrows]
    codes = similarity.pq_encode(emb, cbs)
    return similarity.pq_adc_topk(codes, cbs, queries, k=PQ_K)


_PQ_W = KM_DIM // PQ_M

_SQL_PQ_COMMON = f"""
v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
seed AS (SELECT vec_id, e FROM v ORDER BY vec_id LIMIT {PQ_CODES}),
subs AS (SELECT unnest(range({PQ_M})) AS s),
cb AS (SELECT subs.s,
              CAST(row_number() OVER (PARTITION BY subs.s ORDER BY seed.vec_id) - 1
                   AS BIGINT) AS code,
              seed.e[subs.s * {_PQ_W} + 1 : subs.s * {_PQ_W} + {_PQ_W}] AS c
       FROM subs CROSS JOIN seed),
sub AS (SELECT v.vec_id, subs.s,
               v.e[subs.s * {_PQ_W} + 1 : subs.s * {_PQ_W} + {_PQ_W}] AS sv
        FROM v CROSS JOIN subs),
d AS (SELECT sub.vec_id, sub.s, cb.code,
             round(list_dot_product(sv, sv) - 2 * list_dot_product(sv, c)
                   + list_dot_product(c, c), 6) AS d2
      FROM sub JOIN cb USING (s)),
asg AS (SELECT vec_id, s, code FROM (
          SELECT vec_id, s, code,
                 row_number() OVER (PARTITION BY vec_id, s
                                    ORDER BY d2, code) AS rn
          FROM d) WHERE rn = 1)
"""

SQL_PQ_ENCODE = f"""
WITH {_SQL_PQ_COMMON}
SELECT vec_id, CAST(s AS BIGINT) AS subspace, code FROM asg
"""

SQL_PQ_ADC = f"""
WITH {_SQL_PQ_COMMON},
q AS (SELECT vec_id AS query_id, e FROM v ORDER BY vec_id LIMIT {PQ_QUERIES}),
qsub AS (SELECT q.query_id, subs.s,
                q.e[subs.s * {_PQ_W} + 1 : subs.s * {_PQ_W} + {_PQ_W}] AS qs
         FROM q CROSS JOIN subs),
lut AS (SELECT qsub.query_id, qsub.s, cb.code,
               CAST(round(round(list_dot_product(qs, qs)
                    - 2 * list_dot_product(qs, c)
                    + list_dot_product(c, c), 6) * 1000000) AS BIGINT)
                 AS micro
        FROM qsub JOIN cb USING (s)),
scores AS (SELECT l.query_id, a.vec_id, CAST(sum(l.micro) AS BIGINT) AS adc_micro
           FROM asg a JOIN lut l ON l.s = a.s AND l.code = a.code
           GROUP BY 1, 2)
SELECT query_id, vec_id, adc_micro FROM (
  SELECT query_id, vec_id, adc_micro,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_micro, vec_id) AS rn
  FROM scores) WHERE rn <= {PQ_K}
"""


def q_kmeans_refine_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kernel strategy twin of ``kmeans_refine``: the pure-expression
    assignment (per-centroid ``zip_with``/``aggregate`` cosine columns +
    ``greatest(struct)`` argmax) hash-matched against the SAME oracle —
    proving the Arrow/BLAS and Catalyst-expression kernels are
    interchangeable (cosines round to 6 places before the argmax in
    both, so blocked-vs-sequential float summation cannot split them).
    Benched (bench.py HEADLINE, since r6) as the documented
    interpreted-evaluator ceiling: Spark evaluates higher-order array
    functions interpreted, so this kernel measures ~10x slower (≈7.4 s
    vs 0.86 s at sf0.1) than ``kmeans_refine``'s Arrow/BLAS kernel —
    the number characterizes the expression evaluator and is tracked
    deliberately; the production k-means path is the Arrow twin."""
    return _kmeans_refine(spark, sf_dir, kernel="expr")


def _sql_kmeans_refine() -> str:
    cos = (
        "round(list_dot_product(v.e, cent.ce)"
        " / (sqrt(list_dot_product(v.e, v.e))"
        " * sqrt(list_dot_product(cent.ce, cent.ce))), 6)"
    )
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
cent AS (SELECT vec_id AS cid, e AS ce FROM v ORDER BY vec_id LIMIT {KM_K}),
asg AS (
  SELECT vec_id, cid, e FROM (
    SELECT vec_id, cid, e,
           row_number() OVER (PARTITION BY vec_id
             ORDER BY sim DESC, cid ASC) AS rn
    FROM (SELECT v.vec_id, cent.cid, v.e, {cos} AS sim
          FROM v CROSS JOIN cent)) WHERE rn = 1),
dims AS (SELECT cid, d.dim, e[d.dim] AS val
         FROM asg CROSS JOIN
              (SELECT unnest(range(1, {KM_DIM} + 1)) AS dim) d),
means AS (SELECT cid, dim, round(avg(val), 6) AS m
          FROM dims GROUP BY cid, dim),
cnts AS (SELECT cid, count(*) AS n FROM asg GROUP BY cid)
SELECT c.cid AS centroid_id, CAST(c.n AS BIGINT) AS n_members,
       CAST(m.dim - 1 AS BIGINT) AS dim, m.m AS value
FROM cnts c JOIN means m ON m.cid = c.cid
"""


DRIFT_SPLIT = "2024-01-16 00:00:00"
DRIFT_BINS = 10


def q_feature_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI drift of the value distribution per event_type between the
    first and second half of the month (reference = before the split).
    Two-phase relational plan: ref-window min/max edges (broadcast), one
    bucketing scan, smoothed PSI fold over the full bucket frame."""
    from feast_java_old_spark.operators.drift import feature_drift

    events = load_table(spark, sf_dir, "events")
    out = feature_drift(
        events,
        value_col="value",
        ts_col="ts",
        split_ts=DRIFT_SPLIT,
        group_cols=["event_type"],
        bins=DRIFT_BINS,
    )
    return out.select(
        "event_type",
        "psi",
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
    )


SQL_FEATURE_DRIFT = f"""
WITH sided AS (
  SELECT event_type, CAST(value AS DOUBLE) AS v,
         CASE WHEN ts < TIMESTAMP '{DRIFT_SPLIT}' THEN 'ref' ELSE 'cur' END AS side
  FROM events),
edges AS (SELECT event_type, min(v) AS vmin, max(v) AS vmax
          FROM sided WHERE side = 'ref' GROUP BY event_type),
bucketed AS (
  SELECT s.event_type, s.side,
         CASE WHEN e.vmax = e.vmin THEN 0
              ELSE greatest(0, least({DRIFT_BINS - 1},
                CAST(floor((s.v - e.vmin) / (e.vmax - e.vmin) * {DRIFT_BINS}) AS INT)))
         END AS bucket
  FROM sided s JOIN edges e USING (event_type)),
counts AS (SELECT event_type, side, bucket, count(*) AS cnt
           FROM bucketed GROUP BY event_type, side, bucket),
frame AS (SELECT e.event_type, i.i AS bucket
          FROM edges e, unnest(range(0, {DRIFT_BINS})) AS i(i)),
pb AS (
  SELECT f.event_type, f.bucket,
         coalesce(r.cnt, 0) AS ref_cnt, coalesce(c.cnt, 0) AS cur_cnt
  FROM frame f
  LEFT JOIN counts r ON r.event_type = f.event_type
       AND r.bucket = f.bucket AND r.side = 'ref'
  LEFT JOIN counts c ON c.event_type = f.event_type
       AND c.bucket = f.bucket AND c.side = 'cur'),
tot AS (SELECT event_type, sum(ref_cnt) AS tref, sum(cur_cnt) AS tcur
        FROM pb GROUP BY event_type)
SELECT pb.event_type,
       round(sum(((cur_cnt + 0.5) / (tcur + {0.5 * DRIFT_BINS})
                  - (ref_cnt + 0.5) / (tref + {0.5 * DRIFT_BINS}))
                 * ln(((cur_cnt + 0.5) / (tcur + {0.5 * DRIFT_BINS}))
                      / ((ref_cnt + 0.5) / (tref + {0.5 * DRIFT_BINS})))), 6) AS psi,
       CAST(min(tref) AS BIGINT) AS n_ref,
       CAST(min(tcur) AS BIGINT) AS n_cur
FROM pb JOIN tot USING (event_type)
GROUP BY pb.event_type
"""


KMV_K = 256


CUSUM_ALLOWANCE_CENTS = 0
CUSUM_THRESHOLD_CENTS = 50_000


def q_cusum_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential change-point monitor (operators/drift.py:
    cusum_alerts): one-sided Page CUSUM of post-split values against
    the pre-split per-type mean — the detector that fires on a
    SUSTAINED small shift long before a windowed snapshot statistic
    moves. The max(0, S+d) recursion is evaluated as the closed
    windowed form cumsum − min(0, running-min(cumsum)): two window
    functions over one (type)-partitioned (ts, id)-ordered pass, all
    on the cents integer lattice (running DOUBLE window sums are
    engine-divergent: DuckDB's segment-tree association ≠ Spark's
    sequential frame accumulation; BIGINT sums are exact either
    way)."""
    from feast_java_old_spark.operators.drift import cusum_alerts

    events = load_table(spark, sf_dir, "events")
    out = cusum_alerts(
        events,
        "value",
        "ts",
        DRIFT_SPLIT,
        ["event_type"],
        allowance_cents=CUSUM_ALLOWANCE_CENTS,
        threshold_cents=CUSUM_THRESHOLD_CENTS,
        id_col="event_id",
    )
    return out.select(
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.col("s_cents").cast("long").alias("s_cents"),
    )


SQL_CUSUM_ALERTS = f"""
WITH base AS (
  SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
         CAST(round(value * 100, 0) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL),
k AS (SELECT event_type,
             CAST(floor(CAST(sum(c) AS DOUBLE) / count(*)) AS BIGINT) AS k0
      FROM base WHERE ts < TIMESTAMP '{DRIFT_SPLIT}' GROUP BY event_type),
cur AS (SELECT b.event_type, b.ts, b.event_id,
               b.c - k.k0 - {CUSUM_ALLOWANCE_CENTS} AS d
        FROM base b JOIN k USING (event_type)
        WHERE ts >= TIMESTAMP '{DRIFT_SPLIT}'),
cs AS (SELECT event_type, ts, event_id,
              sum(d) OVER (PARTITION BY event_type
                           ORDER BY ts, event_id) AS csum
       FROM cur),
s AS (SELECT event_type, ts,
             csum - least(0, min(csum) OVER (PARTITION BY event_type
                                             ORDER BY ts, event_id))
               AS s_cents
      FROM cs)
SELECT event_type, epoch_us(ts) AS ts_us, CAST(s_cents AS BIGINT) AS s_cents
FROM s WHERE s_cents > {CUSUM_THRESHOLD_CENTS}
"""


def q_stream_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``cusum_alerts``, hash-matched against the
    SAME oracle (streaming/ingest.py:stream_cusum_alerts): the
    post-split half of events is REALLY STREAMED through
    ``applyInPandasWithState`` — the one Structured Streaming primitive
    that can express a *sequential* statistic (each row's S depends on
    all prior rows; no window or aggregate is incremental in it). The
    running S is one long per group in the state store; within a batch
    the recursion is vectorized via its closed form with carry-in.
    Batch/stream interchangeability, proven at the alert-row level."""
    import uuid

    from feast_java_old_spark.streaming.ingest import stream_cusum_alerts

    split = F.lit(DRIFT_SPLIT).cast("timestamp")
    reference = (
        load_table(spark, sf_dir, "events")
        .where(F.col("ts") < split)
        .select("event_type", "value")
    )
    stream = _events_stream(spark, sf_dir).where(
        F.col("event_timestamp") >= split
    )
    out = stream_cusum_alerts(
        stream,
        reference,
        value_col="value",
        group_col="event_type",
        event_ts_col="event_timestamp",
        id_col="event_id",
        allowance_cents=CUSUM_ALLOWANCE_CENTS,
        threshold_cents=CUSUM_THRESHOLD_CENTS,
    )
    name = f"scu_{uuid.uuid4().hex[:8]}"
    with _small_shuffle(spark):
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(600):
            q.stop()
            raise TimeoutError("stream_cusum did not finish in 600s")
    return spark.table(name).select(
        "event_type",
        F.unix_micros("event_timestamp").alias("ts_us"),
        "s_cents",
    )


def q_segment_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact set-overlap matrix between corpus segments: for every pair
    of lineitem return flags, the distinct parts sold under both —
    |A|, |B|, |A∩B|, Jaccard. One distinct-pair aggregate + a
    self-join on the key; the exact twin (and gate oracle) of the KMV
    sketch estimate ``segment_overlap_kmv``."""
    li = load_table(spark, sf_dir, "lineitem")
    d = li.select(
        F.col("l_returnflag").alias("t"), F.col("l_partkey").alias("k")
    ).distinct()
    n = d.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
    a = d.select(F.col("t").alias("type_a"), "k")
    b = d.select(F.col("t").alias("type_b"), "k")
    p = (
        a.join(b, ["k"])
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    na = n.select(F.col("t").alias("type_a"), F.col("n").alias("n_a"))
    nb = n.select(F.col("t").alias("type_b"), F.col("n").alias("n_b"))
    return (
        p.join(F.broadcast(na), "type_a")
        .join(F.broadcast(nb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.col("n_both").cast("long").alias("n_both"),
            F.round(
                F.col("n_both")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")),
                6,
            ).alias("jaccard"),
        )
    )


SQL_SEGMENT_OVERLAP = """
WITH d AS (SELECT DISTINCT l_returnflag AS t, l_partkey AS k FROM lineitem),
n AS (SELECT t, count(*) AS n FROM d GROUP BY t),
p AS (SELECT a.t AS type_a, b.t AS type_b, count(*) AS n_both
      FROM d a JOIN d b ON a.k = b.k AND a.t < b.t
      GROUP BY a.t, b.t)
SELECT type_a, type_b,
       CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b,
       CAST(n_both AS BIGINT) AS n_both,
       round(CAST(n_both AS DOUBLE) / (na.n + nb.n - n_both), 6) AS jaccard
FROM p JOIN n na ON na.t = type_a JOIN n nb ON nb.t = type_b
"""


def q_segment_overlap_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (theta-family) sketch estimate of the same overlap matrix
    (operators/sketches.py:kmv_overlap_pairs): the raw data is scanned
    ONCE to build k=256-minimum-hash sketches per segment; union size,
    Jaccard and intersection are then pure sketch algebra — at 100 TB a
    10 000-segment overlap matrix never rescans the corpus, which the
    exact self-join must. Deterministic (xxhash64) but approximate
    (~1/√k error): no oracle by design — ``segment_overlap`` is the
    hash-matched exact twin, and the contract tests bound the error."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("t"), F.col("l_partkey").alias("k")
    )
    from feast_java_old_spark.operators.sketches import kmv_overlap_pairs

    with _small_shuffle(spark):
        return kmv_overlap_pairs(li, "k", "t", k=KMV_K).localCheckpoint(
            eager=True
        )


def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov drift per event type
    (operators/drift.py:ks_drift) — the binning-free complement of the
    PSI monitor: sup-norm gap of the two empirical CDFs, evaluated on
    the integer lattice |cref·n_cur − ccur·n_ref| (one division at the
    very end), so both engines find the max before any float rounding.
    One (group, value, side) aggregate + one per-group window over
    distinct values."""
    from feast_java_old_spark.operators.drift import ks_drift

    events = load_table(spark, sf_dir, "events")
    return ks_drift(
        events, "value", "ts", DRIFT_SPLIT, ["event_type"]
    ).select(
        "event_type",
        "ks",
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
    )


SQL_KS_DRIFT = f"""
WITH pv AS (
  SELECT event_type, value AS v,
         sum(CASE WHEN ts < TIMESTAMP '{DRIFT_SPLIT}' THEN 1 ELSE 0 END) AS rc,
         sum(CASE WHEN ts < TIMESTAMP '{DRIFT_SPLIT}' THEN 0 ELSE 1 END) AS cc
  FROM events WHERE value IS NOT NULL GROUP BY event_type, value),
c AS (
  SELECT event_type,
         sum(rc) OVER (PARTITION BY event_type ORDER BY v) AS cref,
         sum(cc) OVER (PARTITION BY event_type ORDER BY v) AS ccur,
         sum(rc) OVER (PARTITION BY event_type) AS nref,
         sum(cc) OVER (PARTITION BY event_type) AS ncur
  FROM pv)
SELECT event_type,
       CASE WHEN max(nref) > 0 AND max(ncur) > 0
            THEN round(CAST(max(abs(cref * ncur - ccur * nref)) AS DOUBLE)
                       / (max(nref) * max(ncur)), 6) END AS ks,
       CAST(max(nref) AS BIGINT) AS n_ref,
       CAST(max(ncur) AS BIGINT) AS n_cur
FROM c GROUP BY event_type
"""


CHUNK_TOKENS = 8
CHUNK_MAX_DF = 1


def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document chunk-level dedup (C4-style passage removal):
    non-overlapping 8-token chunks occurring in >1 document are dropped
    and documents reassembled from surviving chunks in order."""
    docs = load_table(spark, sf_dir, "documents")
    out = dedup.chunk_dedup(
        docs, chunk_tokens=CHUNK_TOKENS, max_doc_freq=CHUNK_MAX_DF
    )
    return out.select(
        "doc_id",
        "text",
        F.col("n_chunks").cast("long").alias("n_chunks"),
        F.col("n_removed").cast("long").alias("n_removed"),
    )


SQL_CHUNK_DEDUP = f"""
WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
ch AS (
  SELECT d.doc_id, i.i AS idx,
         array_to_string(toks[i.i*{CHUNK_TOKENS}+1 : i.i*{CHUNK_TOKENS}+{CHUNK_TOKENS}], ' ') AS chunk
  FROM d, unnest(range(0, CAST(ceil(len(toks) / {CHUNK_TOKENS}.0) AS BIGINT))) AS i(i)),
freq AS (SELECT chunk, count(DISTINCT doc_id) AS df FROM ch GROUP BY chunk),
kept AS (
  SELECT ch.doc_id, ch.idx, ch.chunk
  FROM ch JOIN freq USING (chunk) WHERE freq.df <= {CHUNK_MAX_DF}),
agg AS (
  SELECT doc_id, string_agg(chunk, ' ' ORDER BY idx) AS text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id),
tot AS (SELECT doc_id, count(*) AS n_chunks FROM ch GROUP BY doc_id)
SELECT t.doc_id, coalesce(a.text, '') AS text,
       CAST(t.n_chunks AS BIGINT) AS n_chunks,
       CAST(t.n_chunks - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed
FROM tot t LEFT JOIN agg a ON t.doc_id = a.doc_id
"""


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detect + redact. The synthetic corpus carries no PII, so the
    query first *injects* deterministic fixtures (email/ip/phone/ssn keyed
    off doc_id — reproduced verbatim in the oracle), then counts and
    scrubs them with the shared Java∩RE2 pattern set. Zero shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com now"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(
                    F.lit(" from 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".1 today"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 13 == 0,
                F.concat(
                    F.lit(" call 555-01"),
                    (F.col("doc_id") % 10).cast("string"),
                    F.lit("-2345 ok"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 17 == 0, F.lit(" id 123-45-6789 end")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    scrubbed = pii.scrub_pii(seeded)
    return scrubbed.select(
        "doc_id",
        "n_email",
        "n_ssn",
        "n_phone",
        "n_ipv4",
        F.md5(F.col("text")).alias("scrub_md5"),
    )


_PII_SEED_SQL = """
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 7 = 0
              THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
              ELSE '' END
         || CASE WHEN doc_id % 11 = 0
              THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1 today'
              ELSE '' END
         || CASE WHEN doc_id % 13 = 0
              THEN ' call 555-01' || CAST(doc_id % 10 AS VARCHAR) || '-2345 ok'
              ELSE '' END
         || CASE WHEN doc_id % 17 = 0
              THEN ' id 123-45-6789 end'
              ELSE '' END AS text
  FROM documents
"""

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_SSN = r"\b\d{3}-\d{2}-\d{4}\b"
_PII_PHONE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
_PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

SQL_PII_SCRUB = f"""
WITH seeded AS ({_PII_SEED_SQL})
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(text, '{_PII_SSN}')) AS BIGINT) AS n_ssn,
       CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS BIGINT) AS n_phone,
       CAST(len(regexp_extract_all(text, '{_PII_IPV4}')) AS BIGINT) AS n_ipv4,
       md5(
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(text, '{_PII_EMAIL}', '[EMAIL]', 'g'),
               '{_PII_SSN}', '[SSN]', 'g'),
             '{_PII_PHONE}', '[PHONE]', 'g'),
           '{_PII_IPV4}', '[IPV4]', 'g')
       ) AS scrub_md5
FROM seeded
"""


def q_a6_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: exact per-group percentiles (feature-pipeline distribution
    stats). ``F.percentile`` (exact, linear interpolation) == DuckDB
    ``quantile_cont``; one grouped aggregate."""
    events = load_table(spark, sf_dir, "events")
    # r16: one array-argument percentile instead of two scalar ones —
    # each scalar Percentile buffers the group's full value multiset
    # independently; the array form computes both from one buffer with
    # identical interpolation (guide §1.2 per-task work).
    pcts = events.groupBy("event_type").agg(
        F.percentile(
            F.col("value"), F.array(F.lit(0.5), F.lit(0.95))
        ).alias("__p"),
        F.min("value").alias("__vmin"),
        F.max("value").alias("__vmax"),
    )
    return pcts.select(
        "event_type",
        F.round(F.element_at("__p", 1), 6).alias("p50"),
        F.round(F.element_at("__p", 2), 6).alias("p95"),
        F.round(F.col("__vmin"), 6).alias("vmin"),
        F.round(F.col("__vmax"), 6).alias("vmax"),
    )


SQL_A6 = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95,
       round(min(value), 6) AS vmin,
       round(max(value), 6) AS vmax
FROM events GROUP BY event_type
"""


def q_a7_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: ROLLUP revenue over the region→nation dimension chain.

    Plan shape at 100 TB: orders (fact) joins customer / nation / region
    via **broadcast hash joins** (dims are small); the rollup is one
    grouped aggregate with map-side partials — the fact table shuffles
    only (grouping keys, partial sums)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    reg = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    joined = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "revenue_cents"
            ),
        )
        .select("r_name", "n_name", "n_orders", "revenue_cents")
    )


SQL_A7 = """
SELECT r_name, n_name, count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def q_a8_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: CUBE over (order year, priority) — the full grouping-sets
    lattice (ROLLUP's hierarchical cousin, completing the grouping-set
    surface a7 opened). One grouped aggregate with map-side partials;
    Spark expands the cube via a single Expand node feeding ONE
    exchange, so the fact shuffles (grouping keys × 4 sets, partial
    sums) — never four separate scans."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn("order_year", F.year("o_orderdate"))
        .cube("order_year", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "revenue_cents"
            ),
        )
        .select(
            F.col("order_year").cast("long").alias("order_year"),
            "o_orderpriority",
            "n_orders",
            "revenue_cents",
        )
    )


SQL_A8_CUBE = """
WITH o AS (SELECT CAST(year(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT)
                    AS order_year,
                  o_orderpriority, o_totalprice FROM orders)
SELECT order_year, o_orderpriority, count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM o
GROUP BY CUBE (order_year, o_orderpriority)
"""


Q5_REGION = "ASIA"
Q5_FROM = "1996-01-01"
Q5_TO = "1997-01-01"


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): a SIX-table join —
    customer ⋈ orders ⋈ lineitem ⋈ supplier ⋈ nation ⋈ region — with
    the local-supplier predicate (customer and supplier share a nation)
    and a date-range filter on the fact.

    Declared fully relationally and left to Catalyst: the dims
    (customer/supplier/nation/region) broadcast, orders' date filter is
    pushed to its scan (PushedFilters), and lineitem — the only big
    fact — shuffles once on l_orderkey for the orders join; the
    aggregate is map-side combined. Line revenue is quantized to cents
    per row BEFORE the sum, so the total is order-free integer math."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(Q5_FROM).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q5_TO).cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    reg = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == Q5_REGION
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100,
                    0,
                ).cast("long")
            ).alias("revenue_cents"),
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        )
        .select("n_name", "revenue_cents", "n_lineitems")
    )


SQL_TPCH_Q5 = f"""
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                 AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = '{Q5_REGION}'
  AND o_orderdate >= TIMESTAMP '{Q5_FROM} 00:00:00'
  AND o_orderdate < TIMESTAMP '{Q5_TO} 00:00:00'
GROUP BY n_name
"""


Q1_SHIP_BEFORE = "1998-09-02"


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape (pricing summary): the canonical scan-bound
    wide-aggregate — 8 aggregates over a date-filtered fact, grouped by
    two low-cardinality flags. The whole query is ONE FileScan (filter
    pushed) + map-side-combined partial aggregate + a 4-group exchange:
    at 100 TB it is bandwidth-bound, the shuffle carries ~groups×
    partitions rows. Money quantized to cents per row before summing so
    totals are order-free integer math."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") < F.lit(Q1_SHIP_BEFORE).cast("timestamp")
    )
    cents = lambda c: F.round(c * 100, 0).cast("long")  # noqa: E731
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.round(F.col("l_quantity") * 100, 0).cast("long")).alias("sum_qty_c"),
            F.sum(cents(F.col("l_extendedprice"))).alias("sum_base_price_c"),
            F.sum(cents(disc_price)).alias("sum_disc_price_c"),
            F.sum(cents(disc_price * (1 + F.col("l_tax")))).alias("sum_charge_c"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_TPCH_Q1 = f"""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) AS sum_qty_c,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_base_price_c,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS sum_disc_price_c,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100, 0) AS BIGINT)) AS BIGINT) AS sum_charge_c,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate < TIMESTAMP '{Q1_SHIP_BEFORE} 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


Q6_FROM = "1996-01-01"
Q6_TO = "1997-01-01"
Q6_DISC_LO = 0.02
Q6_DISC_HI = 0.06
Q6_MAX_QTY = 24


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecasting revenue change): the canonical
    predicate-pushdown microbenchmark — four range predicates and a
    two-column projection over the fact, ONE row out. The whole plan
    must be a single pushed-filter FileScan + map-side-combined partial
    sum + a 1-row exchange: at 100 TB this query is min/max-zone-map
    pruning + scan bandwidth and nothing else. Revenue quantized to
    hundredth-cents per row (price × discount needs 4 decimal places)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit(Q6_FROM).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(Q6_TO).cast("timestamp"))
            & (F.col("l_discount") >= Q6_DISC_LO)
            & (F.col("l_discount") <= Q6_DISC_HI)
            & (F.col("l_quantity") < Q6_MAX_QTY)
        )
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * F.col("l_discount") * 10_000, 0
                ).cast("long")
            ).alias("revenue_cc"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


SQL_TPCH_Q6 = f"""
SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 10000, 0)
                AS BIGINT)) AS BIGINT) AS revenue_cc,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_FROM} 00:00:00'
  AND l_shipdate < TIMESTAMP '{Q6_TO} 00:00:00'
  AND l_discount >= {Q6_DISC_LO} AND l_discount <= {Q6_DISC_HI}
  AND l_quantity < {Q6_MAX_QTY}
"""


Q14_FROM = "1996-03-01"
Q14_TO = "1996-04-01"


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): a fact-dim join where the
    measure is a CONDITIONAL aggregate ratio — promo revenue over total
    revenue for one month of shipments. Part is the broadcast dim; the
    date filter is pushed to the lineitem scan; both numerator and
    denominator come out of ONE aggregate (a CASE inside the sum), so
    the plan is scan → BHJ → single map-side-combined aggregate."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q14_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q14_TO).cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.sum(
                F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(0)
            ).alias("promo_cents"),
            F.sum(rev).alias("total_cents"),
        )
        .select(
            "promo_cents",
            "total_cents",
            F.round(
                F.lit(100.0) * F.col("promo_cents") / F.col("total_cents"), 6
            ).alias("promo_pct"),
        )
    )


SQL_TPCH_Q14 = f"""
SELECT
  CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
            THEN CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                 AS BIGINT) ELSE 0 END) AS BIGINT) AS promo_cents,
  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
            AS BIGINT)) AS BIGINT) AS total_cents,
  round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
            THEN CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                 AS BIGINT) ELSE 0 END)
        / sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
              AS BIGINT)), 6) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '{Q14_FROM} 00:00:00'
  AND l_shipdate < TIMESTAMP '{Q14_TO} 00:00:00'
"""


Q18_MIN_QTY = 300


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customer): an aggregate-derived
    SEMI-JOIN — orders whose total lineitem quantity exceeds a
    threshold, joined back to customer and lineitem for the detail
    rows. The qualifying-key set is tiny (high threshold), so after the
    one lineitem aggregate the plan broadcasts the key set into both
    re-joins: lineitem is scanned twice but shuffled ZERO extra times —
    at 100 TB that beats any sort-based alternative. Quantity summed as
    centi-units (long) for order-free math."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.round(F.col("l_quantity") * 100, 0).cast("long")).alias("total_qty_c")
        )
        .where(F.col("total_qty_c") > Q18_MIN_QTY * 100)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.unix_micros("o_orderdate").alias("orderdate_us"),
            "total_qty_c",
        )
    )


SQL_TPCH_Q18 = f"""
WITH big AS (
  SELECT l_orderkey,
         CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS BIGINT)
           AS total_qty_c
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) > {Q18_MIN_QTY * 100})
SELECT c_name, o_custkey AS custkey, o_orderkey AS orderkey,
       epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS orderdate_us,
       big.total_qty_c
FROM orders
JOIN big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (EXISTS → LEFT SEMI join): orders with at least
    one returned lineitem, counted per priority.  The semi join never
    materializes the lineitem side's payload — the probe emits each
    order at most once regardless of how many lineitems match, so the
    join output is bounded by |orders|, not |lineitem| (the reason
    EXISTS compiles to semi, not inner+distinct: the distinct would
    shuffle the full match multiset first).  Filter pushed to the
    lineitem scan; the aggregate is map-side combined."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    return (
        orders.join(returned, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
    )


SQL_TPCH_Q4 = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (LEFT OUTER join → count distribution):
    customers bucketed by how many orders they placed, INCLUDING the
    zero-order customers the outer join preserves (an inner join would
    silently drop the most interesting bucket).  count(o_orderkey) —
    not count(*) — so the null-extended row counts 0.  Two aggregates:
    the per-customer count shuffles (custkey, partial) rows, the
    distribution is distribution-sized."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey"
    )
    per_cust = (
        customer.join(orders, "c_custkey", "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


SQL_TPCH_Q13 = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey) t
GROUP BY c_count
"""


Q16_MIN_DISCOUNT = 0.09


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (NOT EXISTS → LEFT ANTI join): parts never sold
    at a deep discount, counted per brand.  The anti join is the
    correct plan for NOT EXISTS — a NOT IN subquery over a nullable
    column would need null-aware anti-join semantics (one NULL poisons
    the whole predicate), and an outer-join + IS NULL filter shuffles
    the full match multiset first.  The discount filter pushes to the
    lineitem scan; the build side carries only the matching key set."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    deep = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_discount") > Q16_MIN_DISCOUNT)
        .select(F.col("l_partkey").alias("p_partkey"))
    )
    return (
        part.join(deep, "p_partkey", "left_anti")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).cast("long").alias("never_deep_discounted"))
    )


SQL_TPCH_Q16 = f"""
SELECT p_brand, CAST(count(*) AS BIGINT) AS never_deep_discounted
FROM part
WHERE NOT EXISTS (SELECT 1 FROM lineitem
                  WHERE l_partkey = p_partkey
                    AND l_discount > {Q16_MIN_DISCOUNT})
GROUP BY p_brand
"""


# --- TPC-H decorrelation pack (r8): unlike the hand-decorrelated q4/q13/
# q16 forms above, q17/q21/q22 are submitted to Spark AS correlated-
# subquery SQL — the gate then proves Catalyst's DecorrelateInnerQuery /
# RewritePredicateSubquery rewrites (scalar-subquery → aggregate join,
# EXISTS → semi, NOT EXISTS → anti) against a DuckDB oracle running the
# same text. A user porting reference SQL keeps their subqueries.


def _tpch_views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    """Register gate tables as temp views for the spark.sql surface
    (idempotent; one shared session per gate run)."""
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (correlated SCALAR subquery): lineitems whose
    quantity is below 20% of their part's own average, aggregated per
    brand. Submitted as correlated SQL; Catalyst decorrelates the
    per-part average into ONE aggregate over lineitem (groupBy
    l_partkey, map-side combined) joined back on the correlation key —
    the fact is scanned twice but never per-outer-row (the naive
    interpretation would be |lineitem| subquery executions). part is a
    broadcast dim. Money in cents before summing (order-free)."""
    _tpch_views(spark, sf_dir, "lineitem", "part")
    return spark.sql(SQL_TPCH_Q17)


SQL_TPCH_Q17 = """
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n_small_lines,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS small_revenue_cents
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
GROUP BY p_brand
"""


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion) — the deepest
    decorrelation nest in the suite: IN over a derived partsupp
    relation, whose WHERE carries both another IN (the part-name
    family) and a CORRELATED scalar aggregate with the half-of-shipped
    threshold. Adaptation: no partsupp table in this testdata, so the
    "on-hand ledger" availqty is each (supplier, part)'s total quantity
    shipped BEFORE 1998, tested against half the quantity shipped
    DURING 1998 (stock keeping pace with demand). The threshold is
    integer-lattice (2·availqty > window_sum — quantities are
    integer-valued) and the empty-window case exercises the classic
    COUNT-bug edge: sum() over zero correlated rows must stay NULL
    (row filtered), not become 0 — a wrong decorrelation rewrite
    flips those rows and the oracle catches it. Catalyst compiles the
    nest to: one pre-1998 aggregate, one 1998-window aggregate, an
    equi-join on (suppkey, partkey), a broadcast semi against the part
    family, and a semi into the supplier dim — the fact table is
    scanned twice, never per-row (same contract as q17/q21; the
    plan-contract sweep asserts no BNLJ)."""
    _tpch_views(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    return spark.sql(SQL_TPCH_Q20)


# One SQL text, both engines: Spark executes it (Catalyst decorrelates),
# DuckDB runs it verbatim as the oracle.
SQL_TPCH_Q20 = """
WITH ps AS (
  SELECT l_suppkey AS ps_suppkey, l_partkey AS ps_partkey,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS availqty
  FROM lineitem
  WHERE l_shipdate < DATE '1998-01-01'
  GROUP BY l_suppkey, l_partkey)
SELECT s.s_name, CAST(round(s.s_acctbal * 100, 0) AS BIGINT) AS acctbal_cents
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name IN ('NATION_3', 'NATION_7', 'NATION_12')
  AND s.s_suppkey IN (
    SELECT ps.ps_suppkey FROM ps
    WHERE ps.ps_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'small%')
      AND 2 * ps.availqty > (
        SELECT CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT)
        FROM lineitem l
        WHERE l.l_partkey = ps.ps_partkey AND l.l_suppkey = ps.ps_suppkey
          AND l.l_shipdate >= DATE '1998-01-01'
          AND l.l_shipdate < DATE '1999-01-01'))
"""


Q21_LATE_DAYS = 80


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (EXISTS + NOT EXISTS, both correlated): suppliers
    who were the ONLY late supplier in a multi-supplier finalized order
    (adaptation: no l_commitdate/l_receiptdate in this testdata, so
    "late" = shipped > {Q21_LATE_DAYS} days after the order date; the
    lateness flag is precomputed once in the `lo` CTE instead of
    re-deriving it inside each subquery). Catalyst compiles the EXISTS
    to a left-semi and the NOT EXISTS to a left-anti, both equi-keyed
    on l_orderkey with the <> supplier residual — the CTE inlines, so
    this plan scans lineitem⋈orders three times; `tpch_q21_agg` is the
    hand-fused one-pass twin, hash-matched against the SAME oracle."""
    _tpch_views(spark, sf_dir, "lineitem", "orders", "supplier")
    return spark.sql(SQL_TPCH_Q21)


SQL_TPCH_Q21 = f"""
WITH lo AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN l_shipdate > o_orderdate + INTERVAL '{Q21_LATE_DAYS}' DAY
              THEN 1 ELSE 0 END AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM lo l1 JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE l1.late = 1
  AND EXISTS (SELECT 1 FROM lo l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lo l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late = 1)
GROUP BY s_name
"""


def q_tpch_q21_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass twin of ``tpch_q21`` (same oracle): both correlated
    subqueries collapse into ONE per-order aggregate — n_supp =
    count(distinct supplier), n_late_supp = count(distinct supplier
    among late lines) — and a late line qualifies iff its order has
    n_supp > 1 and n_late_supp = 1 (l1 itself is late, so the single
    late supplier IS l1's). lineitem⋈orders is built once, aggregated
    once (map-side combined), and re-joined on l_orderkey; at 100 TB
    this replaces q21's three fact scans + semi + anti with one scan +
    one self-join — the rewrite Catalyst cannot find on its own."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    lo = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {Q21_LATE_DAYS} DAY")
        ).cast("int").alias("late"),
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("late") == 1, F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    qualifying = (
        lo.where(F.col("late") == 1)
        .join(per_order, "l_orderkey")
        .where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    return (
        qualifying.join(
            F.broadcast(supp), qualifying.l_suppkey == supp.s_suppkey
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )


Q22_CUTOFF = "2000-01-01"


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (uncorrelated scalar subquery + correlated NOT
    EXISTS): above-average-balance customers gone quiet — no order
    since {Q22_CUTOFF} (adaptation: every synthetic customer has
    ordered at least once, so the classic "never ordered" predicate is
    date-bounded instead). The above-average test is evaluated on the
    integer lattice — cents·count > Σcents — because avg() over
    non-integer doubles is aggregation-order-dependent in its last ulp
    and a customer tying the average within that ulp would flip
    between engines (the q11 discipline). Both scalar subqueries
    compile to one-row broadcasts (computed once, not per row); the
    NOT EXISTS to a left anti join on o_custkey with the date filter
    pushed to the orders scan — the anti build side carries only the
    active-customer key set, not order payloads."""
    _tpch_views(spark, sf_dir, "customer", "orders")
    return spark.sql(SQL_TPCH_Q22)


SQL_TPCH_Q22 = f"""
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
         AS totacctbal_cents
FROM customer
WHERE CAST(round(c_acctbal * 100, 0) AS BIGINT)
      * (SELECT count(*) FROM customer WHERE c_acctbal > 0.0)
      > (SELECT CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT))
                AS BIGINT)
         FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '{Q22_CUTOFF} 00:00:00')
GROUP BY c_mktsegment
"""


Q15_FROM, Q15_TO = "1996-01-01", "1996-04-01"


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top-revenue supplier = agg-of-agg): quarterly
    revenue per supplier, keep the supplier(s) achieving the maximum.
    The max-of-aggregate is NOT a whole-frame window (that would
    single-partition the per-supplier frame — fine at 100 suppliers,
    wrong at 10M) and not a re-scan of the fact (the SQL-standard
    scalar-subquery form inlines the CTE twice): the per-supplier
    aggregate is computed ONCE, its one-row max is cross-joined back as
    a broadcast scalar, and the supplier dim broadcasts onto the
    winners. One fact scan total."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q15_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q15_TO).cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100,
                0,
            ).cast("long")
        ).alias("total_cents")
    )
    # self-reuse: max comes FROM the aggregate, not another fact scan
    mx = rev.agg(F.max("total_cents").alias("__mx"))
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        rev.join(F.broadcast(mx), rev.total_cents == F.col("__mx"))
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_cents")
    )


SQL_TPCH_Q15 = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
             AS BIGINT)) AS total_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_FROM} 00:00:00'
    AND l_shipdate <  TIMESTAMP '{Q15_TO} 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, CAST(total_cents AS BIGINT) AS total_cents
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_cents = (SELECT max(total_cents) FROM revenue)
"""


Q11_FRACTION_DENOM = 1250  # keep parts holding > 1/1250 of total value


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (HAVING vs a global-total scalar — value
    concentration; adaptation: no partsupp table, so "value" is each
    part's summed lineitem revenue). The global total is derived FROM
    the per-part aggregate (one fact scan) and broadcast back as a
    one-row cross join; the threshold compare is pure integer math —
    val_cents * {Q11_FRACTION_DENOM} > total — because 1/1250 in
    binary double truncates differently under DuckDB's rounding CAST
    vs Spark's truncating CAST exactly at the boundary."""
    li = load_table(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100, 0).cast("long")
        ).alias("val_cents")
    )
    total = pv.agg(F.sum("val_cents").alias("__total"))
    return (
        pv.join(F.broadcast(total))
        .where(F.col("val_cents") * Q11_FRACTION_DENOM > F.col("__total"))
        .select(F.col("l_partkey").alias("partkey"), "val_cents")
    )


SQL_TPCH_Q11 = f"""
WITH pv AS (
  SELECT l_partkey,
         sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS val_cents
  FROM lineitem GROUP BY l_partkey)
SELECT l_partkey AS partkey, CAST(val_cents AS BIGINT) AS val_cents
FROM pv
WHERE val_cents * {Q11_FRACTION_DENOM} > (SELECT sum(val_cents) FROM pv)
"""


def q_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS — the general grouping lattice a7's
    ROLLUP and a8's CUBE are special cases of: three hand-picked sets
    ((year, priority), (year, status), (status)) that neither rollup
    nor cube can express. Spark expands all sets through ONE Expand
    node into ONE exchange (rows × |sets| partials, map-side combined)
    — never one scan per set. Per-column grouping() flags are emitted
    instead of the packed grouping_id (bit order is engine-specific;
    the flags are portable) and disambiguate a real NULL group key
    from a rolled-up one."""
    _tpch_views(spark, sf_dir, "orders")
    return spark.sql(SQL_GROUPING_SETS)


SQL_GROUPING_SETS = """
SELECT year(o_orderdate) AS order_year,
       o_orderpriority,
       o_orderstatus,
       CAST(grouping(year(o_orderdate)) AS BIGINT) AS g_year,
       CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
       CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders
GROUP BY GROUPING SETS (
  (year(o_orderdate), o_orderpriority),
  (year(o_orderdate), o_orderstatus),
  (o_orderstatus)
)
"""


def q_not_in_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN vs NOT EXISTS null semantics — the SQL trap the q16
    docstring warns about, proven executable: a NOT IN whose subquery
    contains even ONE NULL is vacuously false for every outer row
    (three-valued logic: x <> NULL is UNKNOWN), so Spark must plan a
    null-aware anti join and return ZERO rows; the NULL-free variant
    and the NOT EXISTS form return the real anti-join count. One query,
    three labeled counts — an engine that silently compiles NOT IN to
    a plain anti join fails the first row."""
    _tpch_views(spark, sf_dir, "part", "lineitem")
    return spark.sql(SQL_NOT_IN_SEMANTICS)


SQL_NOT_IN_SEMANTICS = """
SELECT 'not_in_with_null' AS variant, CAST(count(*) AS BIGINT) AS n_parts
FROM part
WHERE p_partkey NOT IN (
  SELECT CASE WHEN l_discount <= 0.09 THEN NULL ELSE l_partkey END
  FROM lineitem)
UNION ALL
SELECT 'not_in_null_free', CAST(count(*) AS BIGINT)
FROM part
WHERE p_partkey NOT IN (
  SELECT l_partkey FROM lineitem WHERE l_discount > 0.09)
UNION ALL
SELECT 'not_exists', CAST(count(*) AS BIGINT)
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_partkey = p.p_partkey AND l_discount > 0.09)
"""


CLEAN_MIN_QUALITY = 0.55
CLEAN_LANG = "en"


def q_pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed clean-corpus pipeline: exact dedup (canonical = min id
    per content fingerprint) + quality gate + language gate — one scan,
    one shuffle (all signals ride through the dedup group-by)."""
    docs = load_table(spark, sf_dir, "documents")
    return pipeline.clean_corpus(
        docs, min_quality=CLEAN_MIN_QUALITY, lang=CLEAN_LANG
    )


def _sql_clean_corpus() -> str:
    langs = sorted(text.LANG_STOPWORDS)
    score_exprs = ",\n    ".join(
        "len(list_filter(string_split(lower(text), ' '), t -> list_contains(["
        + ",".join(f"'{w}'" for w in text.LANG_STOPWORDS[lang])
        + f"], t))) AS score_{lang}"
        for lang in langs
    )
    best_s, best_l = f"score_{langs[0]}", f"'{langs[0]}'"
    for lang in langs[1:]:
        cond = f"score_{lang} > ({best_s})"
        best_s = f"CASE WHEN {cond} THEN score_{lang} ELSE ({best_s}) END"
        best_l = f"CASE WHEN {cond} THEN '{lang}' ELSE ({best_l}) END"
    return f"""
WITH b AS (
  SELECT doc_id,
         md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp,
         length(text) AS n_chars,
         len(string_split(lower(text), ' ')) AS n_tokens,
         len(list_filter(string_split(lower(text), ' '),
             t -> list_contains({_STOPLIST_SQL}, t))) AS n_stop,
         length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))
           AS n_alnum_space,
         {score_exprs}
  FROM documents),
s AS (
  SELECT doc_id, fp, n_tokens,
         round(least(n_tokens / 50.0, 1.0) * 0.5
               + least((n_stop / n_tokens) * 5.0, 1.0) * 0.3
               + (1.0 - least(((n_chars - n_alnum_space) / n_chars) * 10.0,
                              1.0)) * 0.2, 6) AS quality_score,
         {best_l} AS predicted_lang,
         row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
  FROM b)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, quality_score,
       predicted_lang
FROM s
WHERE rn = 1 AND quality_score >= {CLEAN_MIN_QUALITY}
      AND predicted_lang = '{CLEAN_LANG}'
"""


def q_rejection_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document lineage of the clean-corpus pipeline
    (operators/pipeline.py:rejection_report): a verdict for EVERY input
    doc — kept, or the first rejecting gate (duplicate ≻ low_quality ≻
    wrong_lang). Same one-scan/one-shuffle shape as the pipeline: the
    dedup group-by becomes a row_number window over the fingerprint so
    each row sees its canonical, and the text never crosses the
    exchange. The curation-debugging surface the cleaned output
    hides."""
    from feast_java_old_spark.operators import pipeline

    docs = load_table(spark, sf_dir, "documents")
    return pipeline.rejection_report(
        docs, min_quality=CLEAN_MIN_QUALITY, lang=CLEAN_LANG
    )


def _sql_rejection_report() -> str:
    langs = sorted(text.LANG_STOPWORDS)
    score_exprs = ",\n    ".join(
        "len(list_filter(string_split(lower(text), ' '), t -> list_contains(["
        + ",".join(f"'{w}'" for w in text.LANG_STOPWORDS[lang])
        + f"], t))) AS score_{lang}"
        for lang in langs
    )
    best_s, best_l = f"score_{langs[0]}", f"'{langs[0]}'"
    for lang in langs[1:]:
        cond = f"score_{lang} > ({best_s})"
        best_s = f"CASE WHEN {cond} THEN score_{lang} ELSE ({best_s}) END"
        best_l = f"CASE WHEN {cond} THEN '{lang}' ELSE ({best_l}) END"
    return f"""
WITH b AS (
  SELECT doc_id,
         md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp,
         length(text) AS n_chars,
         len(string_split(lower(text), ' ')) AS n_tokens,
         len(list_filter(string_split(lower(text), ' '),
             t -> list_contains({_STOPLIST_SQL}, t))) AS n_stop,
         length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))
           AS n_alnum_space,
         {score_exprs}
  FROM documents),
s AS (
  SELECT doc_id, fp, n_tokens,
         round(least(n_tokens / 50.0, 1.0) * 0.5
               + least((n_stop / n_tokens) * 5.0, 1.0) * 0.3
               + (1.0 - least(((n_chars - n_alnum_space) / n_chars) * 10.0,
                              1.0)) * 0.2, 6) AS quality_score,
         {best_l} AS predicted_lang,
         row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
  FROM b)
SELECT doc_id,
       CASE WHEN rn > 1 THEN 'duplicate'
            WHEN quality_score < {CLEAN_MIN_QUALITY} THEN 'low_quality'
            WHEN predicted_lang <> '{CLEAN_LANG}' THEN 'wrong_lang'
            ELSE 'kept' END AS verdict,
       CAST(n_tokens AS BIGINT) AS n_tokens, quality_score, predicted_lang
FROM s
"""


# ------------------------------------------------------------- similarity ops

TOPK_K = 5
ANN_BITS = 6
ANN_K = 3
NEAR_DUP_THRESHOLD = 0.3

_DOT = "list_dot_product"


def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.cosine_topk(emb, queries, k=TOPK_K).select(
        "query_id", F.col("rank").cast("long").alias("rank"), "neighbor_id", "cosine"
    )


SQL_TOPK = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id % 100 = 0),
scored AS (
  SELECT q.query_id, v.vec_id AS neighbor_id,
         round({_DOT}(v.e, q.qe)
               / (sqrt({_DOT}(v.e, v.e)) * sqrt({_DOT}(q.qe, q.qe))), 6)
           AS cosine
  FROM v CROSS JOIN q WHERE v.vec_id != q.query_id)
SELECT query_id, rank, neighbor_id, cosine
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY cosine DESC, neighbor_id ASC) AS rank FROM scored)
WHERE rank <= {TOPK_K}
"""


EVAL_K = 5


def q_ann_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval evaluation as a first-class operator
    (operators/search.py:retrieval_metrics): grade the single-table
    sign-LSH ANN path against exact brute-force top-k truth — per-query
    recall/RR/nDCG components as EXACT integers (position gains are a
    micro-quantized k-entry table, DCG/IDCG integer sums), one join +
    one aggregate, no per-query driver loop. The formalized,
    composable form of the pytest recall gates."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    truth = similarity.cosine_topk(emb, queries, k=EVAL_K)
    ann = similarity.ann_sign_lsh(emb, queries, k=EVAL_K, bits=ANN_BITS)
    return search.retrieval_metrics(ann, truth.select("query_id", "neighbor_id"), k=EVAL_K)


def _sql_ann_eval() -> str:
    import math

    gains = [int(math.floor(1e6 / math.log2(r + 1) + 0.5)) for r in range(1, EVAL_K + 1)]
    idcg_table = []
    acc = 0
    for g in gains:
        acc += g
        idcg_table.append(acc)
    gain_case = " ".join(
        f"WHEN {r} THEN {g}" for r, g in enumerate(gains, start=1)
    )
    idcg_case = " ".join(
        f"WHEN {n} THEN {v}" for n, v in enumerate(idcg_table, start=1)
    )
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
q AS (SELECT vec_id AS query_id, e AS qe,
             array_to_string([CASE WHEN x >= 0 THEN '1' ELSE '0' END
                              FOR x IN (e)[1:{ANN_BITS}]], '') AS qb
      FROM v WHERE vec_id % 100 = 0),
vb AS (SELECT vec_id, e,
              array_to_string([CASE WHEN x >= 0 THEN '1' ELSE '0' END
                               FOR x IN (e)[1:{ANN_BITS}]], '') AS bucket
       FROM v),
scored AS (
  SELECT q.query_id, v.vec_id AS neighbor_id,
         round({_DOT}(v.e, q.qe)
               / (sqrt({_DOT}(v.e, v.e)) * sqrt({_DOT}(q.qe, q.qe))), 6)
           AS cosine
  FROM v CROSS JOIN q WHERE v.vec_id != q.query_id),
truth AS (
  SELECT query_id, neighbor_id
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY cosine DESC, neighbor_id ASC) AS rank FROM scored)
  WHERE rank <= {EVAL_K}),
annscored AS (
  SELECT q.query_id, vb.vec_id AS neighbor_id,
         round({_DOT}(vb.e, q.qe)
               / (sqrt({_DOT}(vb.e, vb.e)) * sqrt({_DOT}(q.qe, q.qe))), 6)
           AS cosine
  FROM vb JOIN q ON vb.bucket = q.qb WHERE vb.vec_id != q.query_id),
ann AS (
  SELECT query_id, neighbor_id, rank
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY cosine DESC, neighbor_id ASC) AS rank FROM annscored)
  WHERE rank <= {EVAL_K}),
nrel AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel
         FROM truth GROUP BY query_id),
j AS (SELECT a.query_id, a.rank,
             CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS rel
      FROM ann a LEFT JOIN truth t
        ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id)
SELECT j.query_id, nrel.n_rel,
       CAST(sum(j.rel) AS BIGINT) AS hits_at_k,
       CAST(min(CASE WHEN j.rel = 1 THEN j.rank END) AS BIGINT)
         AS first_rel_rank,
       CAST(sum(CASE WHEN j.rel = 1
                     THEN CASE j.rank {gain_case} END
                     ELSE 0 END) AS BIGINT) AS dcg_micro,
       CAST(CASE least(nrel.n_rel, {EVAL_K}) {idcg_case} END AS BIGINT)
         AS idcg_micro
FROM j JOIN nrel USING (query_id)
GROUP BY j.query_id, nrel.n_rel
"""


def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing — the composition the CCNet
    pipeline runs end-to-end: per-doc mean unigram log-likelihood under
    the corpus's own LM (operators/text.py:unigram_logprob — vocab agg
    broadcast back onto the token stream) discretized into
    head/middle/tail TERTILES by exact corpus percentiles
    (operators/features.py:quantile_bin — 2 edge doubles broadcast,
    assignment a pure projection). Head = most fluent third; the
    standard curriculum/mixture signal for pretraining data."""
    docs = load_table(spark, sf_dir, "documents")
    lp = text.unigram_logprob(docs)
    binned = features.quantile_bin(lp, col="logprob", k=3, id_col="doc_id")
    return binned.select(
        "doc_id",
        F.col("value").alias("logprob"),
        F.col("bin").alias("tertile"),
        F.when(F.col("bin") == 3, F.lit("head"))
        .when(F.col("bin") == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("ccnet_bucket"),
    )


SQL_CCNET_BUCKETS = """
WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
              FROM documents),
vocab AS (SELECT token, count(*) AS freq FROM toks GROUP BY token),
tot AS (SELECT sum(freq) AS total FROM vocab),
v AS (SELECT token, ln(freq / tot.total) AS lp FROM vocab, tot),
doclp AS (SELECT t.doc_id, round(avg(v.lp), 6) AS logprob
          FROM toks t JOIN v USING (token) GROUP BY t.doc_id),
ed AS (SELECT quantile_cont(logprob, [1.0/3, 2.0/3]) AS qs FROM doclp)
SELECT doc_id, round(logprob, 6) AS logprob,
       CAST(len(list_filter(ed.qs, e -> logprob > round(e, 6))) + 1
            AS BIGINT) AS tertile,
       CASE len(list_filter(ed.qs, e -> logprob > round(e, 6))) + 1
            WHEN 3 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
       END AS ccnet_bucket
FROM doclp, ed
"""


SDC_MOD = 50
SDC_THRESHOLD = 0.9


def q_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-level benchmark decontamination
    (operators/curation.py:semantic_decontaminate): every held-out
    'benchmark' vector broadcasts; the corpus streams through one
    map-stage cosine join + a corpus-keyed max-struct aggregate — the
    semantic companion screen to the lexical n-gram decontaminate
    (paraphrases share no n-grams but sit at cosine ≈ 1)."""
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    bench = emb.where(F.col("vec_id") % SDC_MOD == 0).select(
        F.col("vec_id").alias("bench_id"), "embedding"
    )
    corpus = emb.where(F.col("vec_id") % SDC_MOD != 0)
    return curation.semantic_decontaminate(
        corpus, bench, threshold=SDC_THRESHOLD
    )


def _sql_semantic_decontaminate() -> str:
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
b AS (SELECT vec_id AS bench_id, e AS be FROM v WHERE vec_id % {SDC_MOD} = 0),
c AS (SELECT vec_id, e FROM v WHERE vec_id % {SDC_MOD} != 0),
scored AS (
  SELECT c.vec_id, b.bench_id,
         round({_DOT}(c.e, b.be)
               / (sqrt({_DOT}(c.e, c.e)) * sqrt({_DOT}(b.be, b.be))), 6)
           AS cos
  FROM c CROSS JOIN b),
best AS (
  SELECT vec_id, bench_id, cos,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cos DESC, bench_id ASC) AS rn
  FROM scored)
SELECT vec_id, CAST(bench_id AS BIGINT) AS closest_bench_id,
       cos AS max_cos, cos >= {SDC_THRESHOLD} AS contaminated
FROM best WHERE rn = 1
"""


RP_OUT_DIM = 16


def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL sign random projection 64→16 dims
    (operators/similarity.py:random_projection): the ±1 matrix is an
    md5-parity sign table broadcast into the exploded coordinate
    stream; coordinates micro-quantize to integers BEFORE the one
    map-side-combined aggregate, so the projection is exact integer
    math and only (vec, j, partial-sum) scalars shuffle — the standard
    pre-reduction feeding LSH/clustering at corpus scale."""
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    return similarity.random_projection(
        emb, dim=KM_DIM, out_dim=RP_OUT_DIM
    )


def _sql_random_projection() -> str:
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
c AS (SELECT vec_id, d.i - 1 AS d,
             CAST(round(e[d.i] * 1e6, 0) AS BIGINT) AS xm
      FROM v CROSS JOIN (SELECT unnest(range(1, {KM_DIM} + 1)) AS i) d),
s AS (SELECT j.j, d.d,
             CASE WHEN substr(md5(j.j || ':' || d.d), 1, 1)
                  IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1
             END AS sign
      FROM (SELECT unnest(range({RP_OUT_DIM})) AS j) j
      CROSS JOIN (SELECT unnest(range({KM_DIM})) AS d) d)
SELECT c.vec_id, s.j,
       CAST(round(sum(s.sign * c.xm) / sqrt({RP_OUT_DIM}), 0) AS BIGINT)
         AS value_micro
FROM c JOIN s ON s.d = c.d
GROUP BY c.vec_id, s.j
"""


MMR_K = 5
MMR_POOL = 20


def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversified retrieval (operators/similarity.py:mmr_topk):
    exact cosine pool (corpus never shuffles) + per-query greedy
    re-rank in one Arrow applyInPandas over bounded pool × pool state.
    λ = 1/2 with micro-unit integer scores makes the greedy argmax
    EXACTLY reproducible, so the oracle — the same greedy UNROLLED into
    MMR_K SQL layers — hash-matches an iterative algorithm."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.mmr_topk(emb, queries, k=MMR_K, pool=MMR_POOL).select(
        "query_id",
        F.col("mmr_rank").cast("long").alias("mmr_rank"),
        "neighbor_id",
        "mmr_score_2x_micro",
    )


def _sql_mmr() -> str:
    """Greedy MMR unrolled into MMR_K dependent CTE layers: layer t
    scores the un-picked pool by rel_micro − max(sim to picks 1..t−1)
    and argmaxes with the same (score desc, id asc) tie-break."""
    head = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id % 100 = 0),
scored AS (
  SELECT q.query_id, v.vec_id AS neighbor_id,
         round({_DOT}(v.e, q.qe)
               / (sqrt({_DOT}(v.e, v.e)) * sqrt({_DOT}(q.qe, q.qe))), 6)
           AS cosine
  FROM v CROSS JOIN q WHERE v.vec_id != q.query_id),
p AS (
  SELECT query_id, neighbor_id,
         CAST(round(cosine * 1e6, 0) AS BIGINT) AS rel_micro
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY cosine DESC, neighbor_id ASC) AS rank FROM scored)
  WHERE rank <= {MMR_POOL}),
sim AS (
  SELECT a.query_id, a.neighbor_id AS ia, b.neighbor_id AS ib,
         CAST(round({_DOT}(va.e, vb.e)
               / (sqrt({_DOT}(va.e, va.e)) * sqrt({_DOT}(vb.e, vb.e)))
               * 1e6, 0) AS BIGINT) AS s
  FROM p a
  JOIN p b ON a.query_id = b.query_id AND a.neighbor_id != b.neighbor_id
  JOIN v va ON va.vec_id = a.neighbor_id
  JOIN v vb ON vb.vec_id = b.neighbor_id),
pick1 AS (
  SELECT query_id, neighbor_id, rel_micro AS sc
  FROM (SELECT p.*, row_number() OVER (PARTITION BY query_id
          ORDER BY rel_micro DESC, neighbor_id ASC) AS rn FROM p)
  WHERE rn = 1),
sel1 AS (SELECT query_id, neighbor_id FROM pick1)"""
    layers = []
    for t in range(2, MMR_K + 1):
        layers.append(f""",
score{t} AS (
  SELECT c.query_id, c.neighbor_id, c.rel_micro - max(s.s) AS sc
  FROM p c
  JOIN sim s ON s.query_id = c.query_id AND s.ia = c.neighbor_id
  JOIN sel{t - 1} e ON e.query_id = s.query_id AND e.neighbor_id = s.ib
  WHERE NOT EXISTS (SELECT 1 FROM sel{t - 1} x
                    WHERE x.query_id = c.query_id
                      AND x.neighbor_id = c.neighbor_id)
  GROUP BY c.query_id, c.neighbor_id, c.rel_micro),
pick{t} AS (
  SELECT query_id, neighbor_id, sc
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY sc DESC, neighbor_id ASC) AS rn FROM score{t})
  WHERE rn = 1),
sel{t} AS (SELECT query_id, neighbor_id FROM sel{t - 1}
           UNION ALL SELECT query_id, neighbor_id FROM pick{t})""")
    tail = "\nUNION ALL\n".join(
        f"SELECT query_id, CAST({t} AS BIGINT) AS mmr_rank, neighbor_id,\n"
        f"       sc AS mmr_score_2x_micro FROM pick{t}"
        for t in range(1, MMR_K + 1)
    )
    return head + "".join(layers) + "\n" + tail


def q_similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.ann_sign_lsh(emb, queries, k=ANN_K, bits=ANN_BITS).select(
        "query_id", F.col("rank").cast("long").alias("rank"), "neighbor_id", "cosine"
    )


SQL_ANN = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e,
    array_to_string([CASE WHEN e >= 0 THEN '1' ELSE '0' END
                     FOR e IN (embedding::DOUBLE[])[1:{ANN_BITS}]], '') AS bucket
  FROM embeddings),
q AS (SELECT vec_id AS query_id, e AS qe, bucket FROM v WHERE vec_id % 100 = 0),
scored AS (
  SELECT q.query_id, v.vec_id AS neighbor_id,
         round({_DOT}(v.e, q.qe)
               / (sqrt({_DOT}(v.e, v.e)) * sqrt({_DOT}(q.qe, q.qe))), 6)
           AS cosine
  FROM v JOIN q ON v.bucket = q.bucket WHERE v.vec_id != q.query_id)
SELECT query_id, rank, neighbor_id, cosine
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY cosine DESC, neighbor_id ASC) AS rank FROM scored)
WHERE rank <= {ANN_K}
"""


IVF_STEP = 50
IVF_NPROBE = 2


def q_similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.ann_ivf(
        emb, queries, k=ANN_K, centroid_step=IVF_STEP, nprobe=IVF_NPROBE
    ).select(
        "query_id", F.col("rank").cast("long").alias("rank"), "neighbor_id", "cosine"
    )


_COS = (
    "round({d}({a}, {b}) / (sqrt({d}({a}, {a})) * sqrt({d}({b}, {b}))), 6)"
)


def _cos(a: str, b: str) -> str:
    return _COS.format(d=_DOT, a=a, b=b)


SQL_ANN_IVF = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
cent AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id % {IVF_STEP} = 0),
asg AS (
  SELECT vec_id, cid, e FROM (
    SELECT vec_id, cid, e,
           row_number() OVER (PARTITION BY vec_id
             ORDER BY sim DESC, cid ASC) AS rn
    FROM (SELECT v.vec_id, cent.cid, v.e, {_cos('v.e', 'cent.ce')} AS sim
          FROM v CROSS JOIN cent)) WHERE rn = 1),
q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id % 100 = 0),
probes AS (
  SELECT query_id, cid, qe FROM (
    SELECT query_id, cid, qe,
           row_number() OVER (PARTITION BY query_id
             ORDER BY sim DESC, cid ASC) AS rn
    FROM (SELECT q.query_id, cent.cid, q.qe, {_cos('q.qe', 'cent.ce')} AS sim
          FROM q CROSS JOIN cent)) WHERE rn <= {IVF_NPROBE}),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id, {_cos('a.e', 'p.qe')} AS cosine
  FROM probes p JOIN asg a ON a.cid = p.cid
  WHERE a.vec_id != p.query_id)
SELECT query_id, rank, neighbor_id, cosine
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY cosine DESC, neighbor_id ASC) AS rank FROM scored)
WHERE rank <= {ANN_K}
"""


MP_BITS = 4
MP_TABLES = 8


def q_similarity_ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table (OR-amplified) sign-LSH ANN — the recall-bearing LSH
    configuration (recall@5 ≈ 0.72 at bits=4, tables=8 vs 0.03 for the
    single-table driver query; gated in tests/test_similarity.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.ann_sign_lsh(
        emb, queries, k=ANN_K, bits=MP_BITS, tables=MP_TABLES
    ).select(
        "query_id", F.col("rank").cast("long").alias("rank"), "neighbor_id", "cosine"
    )


SQL_ANN_MULTI = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
tt AS (SELECT unnest(range(0, {MP_TABLES})) AS t),
keys AS (
  SELECT v.vec_id, tt.t,
         array_to_string([CASE WHEN x >= 0 THEN '1' ELSE '0' END
           FOR x IN (v.e)[tt.t*{MP_BITS}+1 : (tt.t+1)*{MP_BITS}]], '') AS bucket
  FROM v CROSS JOIN tt),
q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id % 100 = 0),
qk AS (SELECT q.query_id, k.t, k.bucket
       FROM keys k JOIN q ON k.vec_id = q.query_id),
cand AS (
  SELECT DISTINCT k.vec_id AS neighbor_id, qk.query_id
  FROM keys k JOIN qk ON k.t = qk.t AND k.bucket = qk.bucket
  WHERE k.vec_id != qk.query_id),
scored AS (
  SELECT c.query_id, c.neighbor_id, {_cos('v.e', 'q.qe')} AS cosine
  FROM cand c JOIN v ON v.vec_id = c.neighbor_id
       JOIN q ON q.query_id = c.query_id)
SELECT query_id, rank, neighbor_id, cosine
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY cosine DESC, neighbor_id ASC) AS rank FROM scored)
WHERE rank <= {ANN_K}
"""


def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise mean embedding per label (class prototypes / one
    k-means centroid-update step / chunk→doc pooling). posexplode →
    map-side-combined per-dim average → in-order reassembly; only
    (group, dim) scalars shuffle, never vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    pooled = similarity.mean_pool(emb, "label")
    # The centroid rides as a '%.6f'-joined string: C-style formatting is
    # byte-identical between Spark's format_string and DuckDB's printf,
    # and the hash comparator handles plain strings on any driver.
    return pooled.select(
        F.col("label").cast("long").alias("label"),
        F.concat_ws(
            ",",
            F.transform(
                F.col("embedding"), lambda x: F.format_string("%.6f", x)
            ),
        ).alias("centroid"),
        F.col("n_vectors").cast("long").alias("n_vectors"),
    )


SQL_CENTROIDS = """
WITH ex AS (
  SELECT label, u.dim AS dim, u.val AS val
  FROM embeddings,
       LATERAL (SELECT unnest(embedding::DOUBLE[]) AS val,
                       generate_subscripts(embedding, 1) AS dim) AS u),
per_dim AS (
  SELECT label, dim, round(avg(val), 6) AS mean_val, count(*) AS n
  FROM ex GROUP BY label, dim)
SELECT CAST(label AS BIGINT) AS label,
       array_to_string(list(printf('%.6f', mean_val) ORDER BY dim), ',')
         AS centroid,
       CAST(max(n) AS BIGINT) AS n_vectors
FROM per_dim GROUP BY label
"""


NEAR_DUP_TARGET_OCC = 32


def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed cosine near-dup pairs with ``bits`` DERIVED from the
    corpus count (suggest_bits occupancy law, integer-exact so the
    oracle reproduces it from count(*)): expected bucket occupancy stays
    <= NEAR_DUP_TARGET_OCC as the corpus grows, retiring the
    fixed-bits=4 gate form whose within-bucket quadratic work grew with
    the corpus (alpha = 0.68 in r4 SCALING). At 500 embeddings bits=4
    (unchanged), at 2000 bits=6, at 1e9 bits=25."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()  # bounded driver-side scalar: one count of the corpus
    bits = similarity.suggest_bits(n, NEAR_DUP_TARGET_OCC)
    return similarity.embedding_near_dups(
        emb, threshold=NEAR_DUP_THRESHOLD, bits=bits, corpus_rows=n
    )


SQL_NEAR_DUPS = f"""
WITH nn AS (SELECT count(*) AS n FROM embeddings),
bb AS (SELECT CASE WHEN n <= {NEAR_DUP_TARGET_OCC} THEN 1
        ELSE greatest(1, CAST(floor(log2(
            (n + {NEAR_DUP_TARGET_OCC} - 1) // {NEAR_DUP_TARGET_OCC} - 1
        )) AS INT) + 1) END AS bits FROM nn),
v AS (SELECT vec_id, embedding::DOUBLE[] AS e,
    array_to_string([CASE WHEN e >= 0 THEN '1' ELSE '0' END
                     FOR e IN (embedding::DOUBLE[])[1:bits]], '')
      AS bucket
  FROM embeddings, bb)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round({_DOT}(a.e, b.e)
             / (sqrt({_DOT}(a.e, a.e)) * sqrt({_DOT}(b.e, b.e))), 6) AS cosine
FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round({_DOT}(a.e, b.e)
            / (sqrt({_DOT}(a.e, a.e)) * sqrt({_DOT}(b.e, b.e))), 6)
      >= {NEAR_DUP_THRESHOLD}
"""

# ------------------------------------------------------------- multimodal ops


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-components dedup groups over MinHash-LSH candidate pairs.

    Spark side: iterative min-label propagation (bounded by component
    diameter). Oracle side: DuckDB recursive-CTE transitive closure +
    min per node — different algorithm, same fixpoint, hash-matched.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_candidates(docs, k=MINHASH_K, bands=MINHASH_BANDS, n=3)
    return dedup.dedup_components(pairs, docs.select("doc_id"))


def _sql_dedup_components() -> str:
    return f"""
WITH RECURSIVE cand AS ({_sql_minhash()}),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM cand
          UNION SELECT doc_b AS src, doc_a AS dst FROM cand),
reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.node = e.dst)
SELECT node AS doc_id, min(lbl) AS group_id FROM reach GROUP BY node
"""


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup application: connected components over
    MinHash-LSH pairs, then keep each group's highest-quality member
    (ties to the lower id) instead of the min-id copy — the canonical
    policy a production corpus wants
    (operators/dedup.py:dedup_keep_best)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_candidates(
        docs, k=MINHASH_K, bands=MINHASH_BANDS, n=3
    )
    comp = dedup.dedup_components(pairs, docs.select("doc_id"))
    scored = docs.withColumn(
        "__q", text.text_stat_cols()["quality_score"]
    )
    kept = dedup.dedup_keep_best(scored, comp, "__q")
    return kept.select("doc_id", "source")


def _sql_dedup_keep_best() -> str:
    return f"""
WITH RECURSIVE cand AS ({_sql_minhash()}),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM cand
          UNION SELECT doc_b AS src, doc_a AS dst FROM cand),
reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.node = e.dst),
comp AS (SELECT node AS doc_id, min(lbl) AS group_id FROM reach GROUP BY node),
b AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(string_split(lower(text), ' ')) AS n_tokens,
         len(list_filter(string_split(lower(text), ' '),
             t -> list_contains({_STOPLIST_SQL}, t))) AS n_stop,
         length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))
           AS n_alnum_space
  FROM documents),
q AS (SELECT doc_id,
             round(least(n_tokens / 50.0, 1.0) * 0.5
                   + least((n_stop / n_tokens) * 5.0, 1.0) * 0.3
                   + (1.0 - least(((n_chars - n_alnum_space) / n_chars)
                                  * 10.0, 1.0)) * 0.2, 6) AS qs
      FROM b),
r AS (SELECT c.doc_id, c.group_id,
             row_number() OVER (PARTITION BY c.group_id
                                ORDER BY q.qs DESC, c.doc_id ASC) AS rn
      FROM comp c JOIN q ON q.doc_id = c.doc_id)
SELECT d.doc_id, d.source
FROM documents d JOIN r ON d.doc_id = r.doc_id
WHERE r.rn = 1
"""


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    payloads = multimodal.attach_binary_payload(docs)
    meta = multimodal.decode_image_metadata(payloads)
    return meta.select(
        "doc_id",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("channels").cast("long").alias("channels"),
    )


SQL_MM_DECODE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) AS width,
       CAST((octet_length(encode(text)) * 7) % 480 + 1 AS BIGINT) AS height,
       CAST(3 AS BIGINT) AS channels
FROM documents
"""


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    payloads = multimodal.attach_binary_payload(docs)
    frames = multimodal.frame_sample(payloads, every_n=10)
    return frames.select(
        "doc_id",
        F.col("n_frames").cast("long").alias("n_frames"),
        F.col("frame_idx").cast("long").alias("frame_idx"),
    )


SQL_MM_FRAMES = """
SELECT doc_id,
       CAST(octet_length(encode(text)) % 100 + 1 AS BIGINT) AS n_frames,
       unnest(range(0, octet_length(encode(text)) % 100 + 1, 10)) AS frame_idx
FROM documents
"""

# ------------------------------------------------------------------- ODFV


def q_odfv_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ODFV: Arrow-batched pandas transform over retrieved features
    (the in-process replacement for the reference's gRPC transform hop)."""
    import pandas as pd

    latest = q_a1_latest_per_key(spark, sf_dir)
    view = OnDemandFeatureView(
        name="scored_user",
        inputs=["value", "event_type"],
        output_schema=T.StructType([T.StructField("score", T.DoubleType())]),
        transform=lambda pdf: pd.DataFrame(
            {"score": pdf["value"] * 2 + pdf["event_type"].str.len()}
        ),
    )
    out = apply_odfv(latest, view)
    return out.select("user_id", "score", "score__status")


SQL_ODFV = """
WITH latest AS (
  SELECT user_id, event_type, value
  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
          ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        FROM events)
  WHERE rn = 1)
SELECT user_id, value * 2 + length(event_type) AS score,
       'PRESENT' AS score__status
FROM latest
"""


def q_odfv_transform_service(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-process twin of ``odfv_transform``: the SAME score lands via
    an external transformation service over a REAL localhost socket with
    Arrow IPC payloads (``OnlineTransformationService.java:62-79`` client
    channel, ``serializeValuesIntoArrowIPC:313-411`` request codec,
    ``processTransformFeaturesResponse:185-310`` response codec) — and
    hash-matches the SAME oracle, proving transport-independence the way
    the a1/j1/asof twins do.

    The in-process twin's string input becomes a JVM-side numeric column
    first (``etype_len``), because the service wire contract only carries
    INT32/INT64/FLOAT/DOUBLE (:325-343). Every ``mapInPandas`` Arrow
    batch makes its own call from its Python worker process — the driver
    never relays data, so the hop scales with the executor count."""
    import pandas as pd

    from feast_java_old_spark.transport.transform_service import (
        TransformServer,
        service_transform,
    )

    latest = q_a1_latest_per_key(spark, sf_dir).withColumn(
        "etype_len", F.length("event_type").cast("int")
    )
    service_view = OnDemandFeatureView(
        name="scored_user",
        inputs=["value", "etype_len"],
        output_schema=T.StructType([T.StructField("score", T.DoubleType())]),
        transform=lambda pdf: pd.DataFrame(
            {"score": pdf["value"] * 2 + pdf["etype_len"]}
        ),
    )
    with TransformServer({"scored_user": service_view}) as srv:
        client_view = OnDemandFeatureView(
            name="scored_user",
            inputs=service_view.inputs,
            output_schema=service_view.output_schema,
            transform=service_transform(
                f"{srv.host}:{srv.port}", "scored_user", ["score"]
            ),
        )
        out = apply_odfv(latest, client_view)
        # materialize while the service socket is live (the one eager
        # pull in this query; result is entity-count-sized, 150 rows at
        # sf0.01 — the same bounded shape the serving layer collects).
        rows = out.select("user_id", "score", "score__status").collect()
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("score", T.DoubleType()),
            T.StructField("score__status", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution end-to-end (parity: content-hash schema registry,
    ``BigTableSchemaRegistry.java:33-107``; per-row-schema decode,
    ``BigTableOnlineRetriever.java:169-207``,
    ``CassandraOnlineRetriever.java:225-246``): rows materialized under a
    v1 feature set stay servable — conformed to the CURRENT schema —
    after the spec ADDS (``etype``), DROPS (``event_type``) and RETYPES
    (``user_id`` INT64→DOUBLE) features and re-materializes only the
    post-change window.

    v1 (revision 1): features (value DOUBLE, user_id INT64, event_type
    STRING), materialized over events with ts ≤ Jan-15. v2 (revision 2):
    (value DOUBLE, user_id DOUBLE, etype STRING via field-mapping rename),
    materialized over ts > Jan-15 into a second ``rev=<spec_hash>``
    epoch. Serving unions both epochs under v2's schema: v1 rows cast
    user_id long→double, surface etype as NULL, and never expose the
    dropped event_type; ``src_rev`` records which epoch won each key.
    Entity = event_id (unique per event), so every source row is
    servable and the epoch boundary is exactly the time split — the
    oracle is the events table split at Jan-15 with the same
    conformance applied per half.

    The result is localCheckpoint'd so the scratch store can be removed
    before returning (no /tmp leak per invocation)."""
    import shutil
    import tempfile

    import feast_java_old_spark as fs
    from feast_java_old_spark.operators.materialize import (
        materialize_versioned,
        read_online_versioned,
    )
    from feast_java_old_spark.registry.model import FileSource

    store = tempfile.mkdtemp(prefix="fjos_schemaevo_")
    try:
        with _small_shuffle(spark):
            out = _schema_evolution_frame(spark, sf_dir, store)
            # eager checkpoint: the finally deletes the scratch store,
            # and the driver collects only after this function returns
            return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(store, ignore_errors=True)


def _build_evo_store(spark, sf_dir: str, store: str):
    """Materialize the two-epoch schema-evolution store (v1: value
    DOUBLE / user_id INT64 / event_type STRING over ts ≤ Jan-15; v2:
    user_id retyped DOUBLE, event_type renamed etype, over ts >
    Jan-15) and return the registry — shared by the current-schema
    serve (``schema_evolution``) and the as-of snapshot
    (``schema_time_travel``)."""
    import os

    import feast_java_old_spark as fs
    from feast_java_old_spark.operators.materialize import (
        materialize_versioned,
    )
    from feast_java_old_spark.registry.model import FileSource

    split = dt.datetime(2024, 1, 15)
    src_path = os.path.join(sf_dir, "events.parquet")
    reg = fs.Registry()
    reg.apply_entity(fs.Entity("event_id", fs.ValueType.INT64))
    reg.apply_feature_table(
        fs.FeatureTable(
            name="ev_evo",
            entities=["event_id"],
            features=[
                fs.Feature("value", fs.ValueType.DOUBLE),
                fs.Feature("user_id", fs.ValueType.INT64),
                fs.Feature("event_type", fs.ValueType.STRING),
            ],
            batch_source=FileSource(
                file_url=src_path, event_timestamp_column="ts"
            ),
        )
    )
    materialize_versioned(spark, reg, "ev_evo", store, end_ts=split)
    reg.apply_feature_table(
        fs.FeatureTable(
            name="ev_evo",
            entities=["event_id"],
            features=[
                fs.Feature("value", fs.ValueType.DOUBLE),
                fs.Feature("user_id", fs.ValueType.DOUBLE),
                fs.Feature("etype", fs.ValueType.STRING),
            ],
            batch_source=FileSource(
                file_url=src_path,
                event_timestamp_column="ts",
                field_mapping={"event_type": "etype"},
            ),
        )
    )
    # ts has µs resolution, so ts ≥ split+1µs ⟺ ts > split: the two
    # epochs partition the table exactly like the oracle's <=/> split.
    materialize_versioned(
        spark, reg, "ev_evo", store,
        start_ts=split + dt.timedelta(microseconds=1),
    )
    return reg


def q_schema_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME TRAVEL over the versioned online store
    (operators/materialize.py:read_online_versioned(as_of_seq=1)): the
    same two-epoch evolved store as ``schema_evolution``, served AS OF
    the v1 registration — only the v1 epoch participates, conformed to
    the schema *recorded in* ``_schemas.json`` at that moment (user_id
    is still INT64, event_type not yet renamed), regardless of the
    registry having since moved to v2. The content-hash registry the
    reference keeps for per-row decode
    (``BigTableSchemaRegistry.java:33-107``) already pays for this —
    a snapshot read is the same bookkeeping pointed backwards
    (Iceberg/Delta ``VERSION AS OF``). Oracle: the v1 half of events
    under the v1 schema."""
    import shutil
    import tempfile

    from feast_java_old_spark.operators.materialize import (
        read_online_versioned,
    )

    store = tempfile.mkdtemp(prefix="fjos_timetravel_")
    try:
        with _small_shuffle(spark):
            reg = _build_evo_store(spark, sf_dir, store)
            out = read_online_versioned(
                spark, reg, "ev_evo", store,
                revision_col="src_rev", as_of_seq=1,
            ).select(
                "event_id",
                F.unix_micros("event_timestamp").alias("ts_us"),
                "value",
                "user_id",
                "event_type",
                "src_rev",
            )
            return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(store, ignore_errors=True)


SQL_SCHEMA_TIME_TRAVEL = """
SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value,
       CAST(user_id AS BIGINT) AS user_id, event_type, 1 AS src_rev
FROM events WHERE CAST(ts AS TIMESTAMP) <= TIMESTAMP '2024-01-15 00:00:00'
"""


def _schema_evolution_frame(spark, sf_dir: str, store: str) -> DataFrame:
    """Build the schema-evolution serve frame LAZILY against ``store``
    (caller owns the scratch dir's lifetime) — split out so the plan
    audit (scripts/gen_plans.py) can explain the real cross-epoch
    union plan instead of a checkpoint scan."""
    import os

    import feast_java_old_spark as fs
    from feast_java_old_spark.operators.materialize import (
        materialize_versioned,
        read_online_versioned,
    )
    from feast_java_old_spark.registry.model import FileSource

    reg = _build_evo_store(spark, sf_dir, store)
    out = read_online_versioned(
        spark, reg, "ev_evo", store, revision_col="src_rev"
    ).select(
        "event_id",
        F.unix_micros("event_timestamp").alias("ts_us"),
        "value",
        "user_id",
        "etype",
        "src_rev",
    )
    return out


def q_stream_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``schema_evolution``, hash-matched against the
    SAME oracle: the v1 epoch is batch-materialized (ts ≤ Jan-15), the
    v2 epoch is written by a REAL Structured Streaming run
    (``stream_materialize_versioned``: file-stream source →
    foreachBatch latest-wins merge into the current spec's content-hash
    epoch), and ``read_online_versioned`` serves the pair identically —
    proving the batch and streaming epoch writers interchangeable under
    one conformed serve plan (the a1/j1/asof strategy-twin pattern,
    applied across the batch/stream boundary)."""
    import os
    import shutil
    import tempfile

    import feast_java_old_spark as fs
    from feast_java_old_spark.operators.materialize import (
        materialize_versioned,
        read_online_versioned,
    )
    from feast_java_old_spark.registry.model import FileSource
    from feast_java_old_spark.streaming.ingest import (
        stream_materialize_versioned,
    )

    split = dt.datetime(2024, 1, 15)
    src_path = os.path.join(sf_dir, "events.parquet")
    reg = fs.Registry()
    reg.apply_entity(fs.Entity("event_id", fs.ValueType.INT64))
    reg.apply_feature_table(
        fs.FeatureTable(
            name="ev_evo_s",
            entities=["event_id"],
            features=[
                fs.Feature("value", fs.ValueType.DOUBLE),
                fs.Feature("user_id", fs.ValueType.INT64),
                fs.Feature("event_type", fs.ValueType.STRING),
            ],
            batch_source=FileSource(
                file_url=src_path, event_timestamp_column="ts"
            ),
        )
    )
    work = tempfile.mkdtemp(prefix="fjos_streamevo_")
    store, drop, ckpt = f"{work}/store", f"{work}/drop", f"{work}/ckpt"
    try:
        with _small_shuffle(spark):
            materialize_versioned(spark, reg, "ev_evo_s", store, end_ts=split)
            reg.apply_feature_table(
                fs.FeatureTable(
                    name="ev_evo_s",
                    entities=["event_id"],
                    features=[
                        fs.Feature("value", fs.ValueType.DOUBLE),
                        fs.Feature("user_id", fs.ValueType.DOUBLE),
                        fs.Feature("etype", fs.ValueType.STRING),
                    ],
                    batch_source=FileSource(
                        file_url=src_path,
                        event_timestamp_column="ts",
                        field_mapping={"event_type": "etype"},
                    ),
                )
            )
            # Stage the post-split slice as the stream's drop dir (the
            # file-stream transport stands in for the broker, as in
            # every other gate stream; the rename to the v2 feature
            # name happens in the staging projection — the stream
            # writer conforms by declared-feature NAME, field_mapping
            # is the batch source's reader concern).
            ev = load_table(spark, sf_dir, "events").where(
                F.col("ts") > F.lit(split)
            ).select(
                "event_id",
                F.col("ts").alias("event_timestamp"),
                "value",
                "user_id",
                F.col("event_type").alias("etype"),
            )
            ev.write.mode("overwrite").parquet(drop)
            stream = spark.readStream.schema(
                "event_id long, event_timestamp timestamp, value double, "
                "user_id long, etype string"
            ).parquet(drop)
            q = stream_materialize_versioned(
                spark, reg, stream, "ev_evo_s", store,
                checkpoint=ckpt, trigger_once=True,
            )
            if not q.awaitTermination(600):
                q.stop()
                raise TimeoutError(
                    "stream_schema_evolution did not finish in 600s"
                )
            out = read_online_versioned(
                spark, reg, "ev_evo_s", store, revision_col="src_rev"
            ).select(
                "event_id",
                F.unix_micros("event_timestamp").alias("ts_us"),
                "value",
                "user_id",
                "etype",
                "src_rev",
            )
            return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


SQL_SCHEMA_EVOLUTION = """
SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value,
       CAST(user_id AS DOUBLE) AS user_id,
       CAST(NULL AS VARCHAR) AS etype, 1 AS src_rev
FROM events WHERE CAST(ts AS TIMESTAMP) <= TIMESTAMP '2024-01-15 00:00:00'
UNION ALL
SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value,
       CAST(user_id AS DOUBLE) AS user_id,
       event_type AS etype, 2 AS src_rev
FROM events WHERE CAST(ts AS TIMESTAMP) > TIMESTAMP '2024-01-15 00:00:00'
"""


# ------------------------------------------------------- streaming (bounded)


def _events_stream_dir(sf_dir: str) -> str:
    """The file-stream source requires a *directory*; stage the single
    events.parquet behind a symlink in a temp dir."""
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="fjos_stream_src_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"),
        os.path.join(d, "events.parquet"),
    )
    return d


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream the events table with its *actual* parquet schema.

    The physical type of ``ts`` has varied across testdata generations
    (TIMESTAMP(NANOS) → LONG nanos under nanosAsLong, vs plain
    TIMESTAMP(MICROS)); hardcoding either breaks the other, so take the
    schema from a batch scan of the same file and normalize ``ts`` to a
    µs TimestampType ``event_timestamp`` with the shared kernel."""
    from feast_java_old_spark.sources.tables import (
        ensure_nanos_conf,
        normalize_timestamp_cols,
    )

    ensure_nanos_conf(spark)
    src = _events_stream_dir(sf_dir)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    return normalize_timestamp_cols(stream, "ts").withColumnRenamed(
        "ts", "event_timestamp"
    )


def q_stream_latest_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A real Structured Streaming run inside the driver gate: file-stream
    the events table (availableNow), foreachBatch latest-wins merge into a
    versioned online table, then read the result back. Hash-matches the
    *batch* A1 oracle — the streaming and batch materialization kernels
    are the same latest-wins fixpoint."""
    import tempfile

    from feast_java_old_spark.streaming.ingest import (
        read_online_table,
        stream_materialize,
    )
    from feast_java_old_spark.operators.materialize import online_table_path

    stream = _events_stream(spark, sf_dir).select(
        "user_id", "event_timestamp", "event_id", "event_type", "value"
    )
    work = tempfile.mkdtemp(prefix="fjos_stream_")
    with _small_shuffle(spark):
        q = stream_materialize(
            spark, stream, f"{work}/store", "events_latest", ["user_id"],
            checkpoint=f"{work}/ckpt", trigger_once=True,
        )
        if not q.awaitTermination(600):
            q.stop()
            raise TimeoutError("stream_latest_merge did not finish in 600s")
    online = read_online_table(
        spark, online_table_path(f"{work}/store", "default", "events_latest")
    )
    return online.select(
        "user_id",
        F.unix_micros("event_timestamp").alias("ts_us"),
        "event_id",
        "event_type",
        "value",
    )


def q_stream_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window feature view executed as a bounded
    stream (availableNow, complete mode into a memory sink); the oracle is
    plain batch SQL — streaming window semantics equal batch semantics on
    bounded input."""
    import uuid

    from feast_java_old_spark.streaming.ingest import stream_window_features

    stream = _events_stream(spark, sf_dir).select(
        "event_type", "event_timestamp", F.col("value")
    )
    feats = stream_window_features(
        stream,
        ["event_type"],
        {
            "n_events": F.count(F.lit(1)),
            "sum_value_cents": F.sum(
                F.round(F.col("value") * 100, 0).cast("long")
            ),
        },
        window_duration="1 hour",
        watermark="1 hour",
    )
    name = f"swr_{uuid.uuid4().hex[:8]}"
    with _small_shuffle(spark):
        q = (
            feats.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(600):
            q.stop()
            raise TimeoutError("stream_window_rollup did not finish in 600s")
    return spark.table(name).select(
        "event_type",
        F.unix_micros("event_timestamp").alias("window_end_us"),
        "n_events",
        "sum_value_cents",
    )


SQL_STREAM_WIN = """
SELECT event_type,
       epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR)
         AS window_end_us,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events
GROUP BY event_type, date_trunc('hour', CAST(ts AS TIMESTAMP))
"""


def q_stream_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming drift monitor (streaming/ingest.py:stream_drift_psi):
    the post-split half of events is REALLY STREAMED (file-stream →
    stream-static broadcast join against the pre-split reference
    histogram → one watermarked daily-window aggregate emitting all
    bucket counts as columns → stateless PSI fold). The production
    shape of the batch ``feature_drift``: same edges, same smoothing,
    so the oracle is a batch replay of the same windows. Single
    stateful operator; per-(type, day) state is ~bins longs."""
    import uuid

    from feast_java_old_spark.streaming.ingest import stream_drift_psi

    split = F.lit(DRIFT_SPLIT).cast("timestamp")
    reference = (
        load_table(spark, sf_dir, "events")
        .where(F.col("ts") < split)
        .select("event_type", "value")
    )
    stream = _events_stream(spark, sf_dir).where(
        F.col("event_timestamp") >= split
    )
    out = stream_drift_psi(
        stream,
        reference,
        value_col="value",
        group_col="event_type",
        bins=DRIFT_BINS,
        window_duration="1 day",
        watermark="1 day",
    )
    name = f"sdr_{uuid.uuid4().hex[:8]}"
    with _small_shuffle(spark):
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(600):
            q.stop()
            raise TimeoutError("stream_drift did not finish in 600s")
    return spark.table(name).select(
        "event_type",
        F.unix_micros("event_timestamp").alias("window_end_us"),
        "psi",
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
    )


SQL_STREAM_DRIFT = f"""
WITH sided AS (
  SELECT event_type, CAST(value AS DOUBLE) AS v, CAST(ts AS TIMESTAMP) AS t
  FROM events),
edges AS (SELECT event_type, min(v) AS vmin, max(v) AS vmax
          FROM sided WHERE t < TIMESTAMP '{DRIFT_SPLIT}' GROUP BY event_type),
b AS (
  SELECT s.event_type, s.t,
         CASE WHEN e.vmax = e.vmin THEN 0
              ELSE greatest(0, least({DRIFT_BINS - 1},
                CAST(floor((s.v - e.vmin) / (e.vmax - e.vmin) * {DRIFT_BINS}) AS INT)))
         END AS bucket
  FROM sided s JOIN edges e USING (event_type)),
refc AS (SELECT event_type, bucket, count(*) AS cnt FROM b
         WHERE t < TIMESTAMP '{DRIFT_SPLIT}' GROUP BY event_type, bucket),
reft AS (SELECT event_type, count(*) AS tref FROM b
         WHERE t < TIMESTAMP '{DRIFT_SPLIT}' GROUP BY event_type),
curc AS (SELECT event_type, date_trunc('day', t) AS day, bucket,
                count(*) AS cnt
         FROM b WHERE t >= TIMESTAMP '{DRIFT_SPLIT}'
         GROUP BY event_type, day, bucket),
curt AS (SELECT event_type, date_trunc('day', t) AS day, count(*) AS tcur
         FROM b WHERE t >= TIMESTAMP '{DRIFT_SPLIT}'
         GROUP BY event_type, day),
frame AS (SELECT ct.event_type, ct.day, ct.tcur, i.i AS bucket
          FROM curt ct, unnest(range(0, {DRIFT_BINS})) AS i(i)),
pb AS (
  SELECT f.event_type, f.day, f.tcur, f.bucket,
         coalesce(r.cnt, 0) AS ref_cnt, coalesce(c.cnt, 0) AS cur_cnt
  FROM frame f
  LEFT JOIN refc r ON r.event_type = f.event_type AND r.bucket = f.bucket
  LEFT JOIN curc c ON c.event_type = f.event_type AND c.day = f.day
       AND c.bucket = f.bucket)
SELECT pb.event_type,
       epoch_us(pb.day + INTERVAL 1 DAY) AS window_end_us,
       round(sum(((cur_cnt + 0.5) / (tcur + {0.5 * DRIFT_BINS})
                  - (ref_cnt + 0.5) / (rt.tref + {0.5 * DRIFT_BINS}))
                 * ln(((cur_cnt + 0.5) / (tcur + {0.5 * DRIFT_BINS}))
                      / ((ref_cnt + 0.5) / (rt.tref + {0.5 * DRIFT_BINS})))), 6)
         AS psi,
       CAST(min(rt.tref) AS BIGINT) AS n_ref,
       CAST(min(pb.tcur) AS BIGINT) AS n_cur
FROM pb JOIN reft rt USING (event_type)
GROUP BY pb.event_type, pb.day
"""


class _small_shuffle:
    """Temporarily pin ``spark.sql.shuffle.partitions`` for a bounded
    streaming run: the stateful-operator partition count is frozen from
    this conf at query start, and the driver session's default (200)
    means 200 state-store instances for a tiny bounded input. Restored
    on exit so the surrounding session is untouched."""

    def __init__(self, spark: SparkSession, n: int = 32):
        self.spark, self.n = spark, n

    def __enter__(self):
        try:
            self.old = self.spark.conf.get("spark.sql.shuffle.partitions")
            self.spark.conf.set("spark.sql.shuffle.partitions", str(self.n))
        except Exception:
            self.old = None
        return self

    def __exit__(self, *exc):
        if self.old is not None:
            try:
                self.spark.conf.set(
                    "spark.sql.shuffle.partitions", self.old
                )
            except Exception:
                pass
        return False


def _stream_to_table(
    spark: SparkSession, stream_df: DataFrame, mode: str, what: str
) -> DataFrame:
    """Run a bounded stream (availableNow) into a memory sink and return
    the sink table; raises instead of silently returning partial state if
    the query can't finish (round 2's gate reds were silent partials)."""
    import uuid

    name = f"st_{uuid.uuid4().hex[:8]}"
    with _small_shuffle(spark):
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(600):
            q.stop()
            raise TimeoutError(f"{what} did not finish in 600s")
    return spark.table(name)


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (§2.6): two independent file-stream sources
    of the same events table are unioned (every event arrives twice),
    then ``dropDuplicatesWithinWatermark`` on the event id restores the
    original set. State per key lives only until the watermark passes —
    bounded by unique-key arrival rate × horizon, the shape an unbounded
    ``dropDuplicates`` can't give at 100 TB/day ingest
    (streaming/ingest.py:stream_dedup)."""
    from feast_java_old_spark.streaming.ingest import stream_dedup

    cols = ["user_id", "event_timestamp", "event_id", "event_type", "value"]
    a = _events_stream(spark, sf_dir).select(cols)
    b = _events_stream(spark, sf_dir).select(cols)
    deduped = stream_dedup(
        a.unionByName(b), dedup_cols=["event_id"], watermark="1 hour"
    )
    out = _stream_to_table(spark, deduped, "append", "stream_dedup")
    return out.select(
        "user_id",
        F.unix_micros("event_timestamp").alias("ts_us"),
        "event_id",
        "event_type",
        "value",
    )


SQL_STREAM_DEDUP = """
SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id,
       event_type, value
FROM events
"""


def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment (§2.6): the events stream left-joins the
    customer dimension with a broadcast hint — the static side never
    shuffles and each micro-batch joins map-side, the streaming analogue
    of the J1 entity lookup (streaming/ingest.py:stream_enrich)."""
    from feast_java_old_spark.streaming.ingest import stream_enrich

    ev = _events_stream(spark, sf_dir).select(
        "user_id", "event_timestamp", "event_id", "value"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey", "c_mktsegment"
    )
    enriched = stream_enrich(ev, cust, on=["user_id"], how="left")
    out = _stream_to_table(spark, enriched, "append", "stream_enrich")
    return out.select(
        "user_id",
        F.unix_micros("event_timestamp").alias("ts_us"),
        "event_id",
        "value",
        "c_nationkey",
        "c_mktsegment",
    )


SQL_STREAM_ENRICH = """
SELECT e.user_id, epoch_us(CAST(e.ts AS TIMESTAMP)) AS ts_us, e.event_id,
       e.value, c.c_nationkey, c.c_mktsegment
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
"""


def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream join (§2.6): purchases join the clicks
    that preceded them within 2 h for the same user, both sides live
    streams. The time-range predicate is what lets Spark evict buffered
    state once the other side's watermark passes the eligibility window —
    state is O(rate × horizon), not unbounded
    (streaming/ingest.py:stream_stream_join)."""
    from feast_java_old_spark.streaming.ingest import stream_stream_join

    purchases = (
        _events_stream(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select("user_id", "event_timestamp", "event_id")
    )
    clicks = (
        _events_stream(spark, sf_dir)
        .where(F.col("event_type") == "click")
        .select("user_id", "event_timestamp", "event_id")
    )
    joined = stream_stream_join(
        purchases,
        clicks,
        on=["user_id"],
        watermark="4 hours",
        max_lag="2 hours",
    ).select(
        F.col("l.user_id").alias("user_id"),
        F.unix_micros("l.event_timestamp").alias("purchase_ts_us"),
        F.col("l.event_id").alias("purchase_id"),
        F.unix_micros("r.event_timestamp").alias("click_ts_us"),
        F.col("r.event_id").alias("click_id"),
    )
    return _stream_to_table(spark, joined, "append", "stream_stream_join")


SQL_STREAM_SS_JOIN = """
SELECT p.user_id,
       epoch_us(CAST(p.ts AS TIMESTAMP)) AS purchase_ts_us,
       p.event_id AS purchase_id,
       epoch_us(CAST(c.ts AS TIMESTAMP)) AS click_ts_us,
       c.event_id AS click_id
FROM events p
JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND CAST(c.ts AS TIMESTAMP)
       >= CAST(p.ts AS TIMESTAMP) - INTERVAL 2 HOUR
 AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
"""


def q_stream_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC materialization (§2.6): the events table replayed as
    an I/U/D change stream folds into the versioned online table via the
    tombstone-aware merge; hash-matches the *batch* ``cdc_apply`` oracle
    — the streaming and batch CDC kernels are the same latest-wins +
    delete fixpoint (streaming/ingest.py:stream_apply_cdc)."""
    import tempfile

    from feast_java_old_spark.operators.materialize import online_table_path
    from feast_java_old_spark.streaming.ingest import (
        read_online_table,
        stream_apply_cdc,
    )

    ev = _events_stream(spark, sf_dir).select(
        "user_id",
        "event_timestamp",
        F.col("event_id").alias("seq"),
        F.expr(
            "CASE WHEN event_id % 10 = 0 THEN 'D' "
            "WHEN event_id % 3 = 0 THEN 'U' ELSE 'I' END"
        ).alias("op"),
        F.round("value", 6).alias("value"),
    )
    work = tempfile.mkdtemp(prefix="fjos_cdcstream_")
    with _small_shuffle(spark):
        q = stream_apply_cdc(
            spark, ev, f"{work}/store", "events_cdc", ["user_id"],
            checkpoint=f"{work}/ckpt", trigger_once=True,
        )
        if not q.awaitTermination(600):
            q.stop()
            raise TimeoutError("stream_cdc_merge did not finish in 600s")
    online = read_online_table(
        spark, online_table_path(f"{work}/store", "default", "events_cdc")
    )
    return online.select(
        "user_id",
        F.unix_micros("event_timestamp").alias("ts_us"),
        "seq",
        "value",
    )


def q_stream_proto_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 proto payload decode through the real streaming path (parity:
    ``common/.../util/KafkaSerialization.java:31-68`` — the reference ships
    ``Message.toByteArray()`` wire bytes on Kafka).

    The events table is encoded row-by-row into proto wire format (one
    Arrow-batched ``mapInPandas`` pass over
    :func:`protowire.encode_scalar_message`), staged as Kafka-shaped
    binary drop files, then read back through
    :func:`sources.stream.read_stream_source` — a registry-validated
    ``KinesisSource(record_format='proto')`` resolving to the file
    transport — which routes the binary ``value`` column through
    ``decode_payload``'s wire-codec fallback. encode∘decode is the
    identity on scalar fields (NULL → proto3 default — 0 / 0.0 / '' —
    which the oracle mirrors with a COALESCE on every field), so the
    batch events table is the oracle."""
    import shutil
    import tempfile

    from feast_java_old_spark.functions import protowire
    from feast_java_old_spark.registry.model import KinesisSource
    from feast_java_old_spark.sources.stream import read_stream_source

    payload_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts_us", T.LongType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    fields = protowire.field_map(payload_schema)

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        "event_type",
        "value",
    )

    int_fields = [
        f.name
        for f in payload_schema.fields
        if isinstance(f.dataType, (T.LongType, T.IntegerType))
    ]

    def _encode(batches):
        import pandas as pd

        for pdf in batches:
            # A nullable int64 column arrives from Arrow as float64 (NaN
            # = NULL). convert_dtypes() restores pandas nullable Int64
            # (pd.NA = NULL); an int field still non-integral after that
            # means fractional values reached an int64 field — fail
            # loudly rather than encode a rounded value (ADVICE r6).
            # Honest limit: a value above 2^53 has ALREADY been rounded
            # to an integral float by the Arrow->pandas conversion
            # upstream of this code, and this guard cannot see that; it
            # is safe here because the events fixture's int64 columns
            # are null-free (they transit as int64, never float64) and
            # unix-micros magnitudes (~1.7e15) sit far below 2^53.
            pdf = pdf.convert_dtypes(convert_string=False)
            bad = [c for c in int_fields if pdf[c].dtype.kind not in "iu"]
            if bad:
                raise TypeError(
                    f"int64 proto fields carry non-integral dtypes: "
                    f"{[(c, str(pdf[c].dtype)) for c in bad]}"
                )
            recs = pdf.astype(object).where(pdf.notna(), None).to_dict("records")
            yield pd.DataFrame(
                {
                    "key": [str(r["event_id"]).encode() for r in recs],
                    "value": [
                        protowire.encode_scalar_message(r, fields) for r in recs
                    ],
                }
            )

    wire_schema = T.StructType(
        [T.StructField("key", T.BinaryType()), T.StructField("value", T.BinaryType())]
    )
    # The drop dir only has to outlive the bounded stream run (the memory
    # sink holds the decoded rows afterwards) — remove it on every exit
    # path so repeated gate/smoke invocations don't leak a full proto
    # copy of the table into /tmp each time (ADVICE r6).
    drop = tempfile.mkdtemp(prefix="fjos_proto_drop_")
    try:
        ev.mapInPandas(_encode, schema=wire_schema).write.mode(
            "overwrite"
        ).parquet(drop)

        src = KinesisSource(
            region="local", stream_name=drop, record_format="proto",
            event_timestamp_column="ts_us",
        )
        decoded = read_stream_source(spark, src, payload_schema=payload_schema)
        return _stream_to_table(spark, decoded, "append", "stream_proto_decode")
    finally:
        shutil.rmtree(drop, ignore_errors=True)


SQL_STREAM_PROTO = """
SELECT COALESCE(user_id, 0) AS user_id,
       COALESCE(epoch_us(CAST(ts AS TIMESTAMP)), 0) AS ts_us,
       COALESCE(event_id, 0) AS event_id,
       COALESCE(event_type, '') AS event_type,
       COALESCE(value, 0.0) AS value
FROM events
"""


# ------------------------------------------------- feature-engineering surface


def q_multi_window_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity over 24h/7d/30d trailing horizons, one scan +
    one aggregate-sized shuffle (conditional aggregates per horizon)."""
    events = load_table(spark, sf_dir, "events")
    return features.multi_window_features(
        events,
        ["user_id"],
        anchor_ts="2024-01-31 00:00:00",
        horizons={"24h": 86400, "7d": 604800, "30d": 2592000},
    )


SQL_MULTI_WINDOW = """
SELECT user_id,
       count(CASE WHEN ts > TIMESTAMP '2024-01-31 00:00:00' - INTERVAL 86400 SECONDS THEN 1 END) AS n_24h,
       coalesce(CAST(sum(CASE WHEN ts > TIMESTAMP '2024-01-31 00:00:00' - INTERVAL 86400 SECONDS
                              THEN CAST(round(value * 100, 0) AS BIGINT) END) AS BIGINT), 0) AS sum_cents_24h,
       count(CASE WHEN ts > TIMESTAMP '2024-01-31 00:00:00' - INTERVAL 604800 SECONDS THEN 1 END) AS n_7d,
       coalesce(CAST(sum(CASE WHEN ts > TIMESTAMP '2024-01-31 00:00:00' - INTERVAL 604800 SECONDS
                              THEN CAST(round(value * 100, 0) AS BIGINT) END) AS BIGINT), 0) AS sum_cents_7d,
       count(CASE WHEN ts > TIMESTAMP '2024-01-31 00:00:00' - INTERVAL 2592000 SECONDS THEN 1 END) AS n_30d,
       coalesce(CAST(sum(CASE WHEN ts > TIMESTAMP '2024-01-31 00:00:00' - INTERVAL 2592000 SECONDS
                              THEN CAST(round(value * 100, 0) AS BIGINT) END) AS BIGINT), 0) AS sum_cents_30d
FROM events
WHERE ts <= TIMESTAMP '2024-01-31 00:00:00'
GROUP BY user_id
"""


def q_rolling_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-1h aggregates via a value-based RANGE frame —
    one shuffle on the entity key, no self-join."""
    events = load_table(spark, sf_dir, "events")
    return features.rolling_features(events, ["user_id"], window_seconds=3600)


SQL_ROLLING = """
SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
       count(*) OVER w AS n_trailing,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) OVER w AS BIGINT)
         AS sum_cents_trailing
FROM events
WINDOW w AS (PARTITION BY user_id
             ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


def q_feature_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide EAV pivot: per-user spend by event type as one grouped
    aggregation with explicit pivot values."""
    events = load_table(spark, sf_dir, "events")
    return features.feature_pivot(
        events,
        ["user_id"],
        "event_type",
        ["click", "view", "purchase", "signup", "error"],
    )


SQL_FEATURE_PIVOT = """
SELECT user_id,
       coalesce(CAST(sum(CASE WHEN event_type = 'click'    THEN CAST(round(value * 100, 0) AS BIGINT) END) AS BIGINT), 0) AS sum_cents_click,
       coalesce(CAST(sum(CASE WHEN event_type = 'view'     THEN CAST(round(value * 100, 0) AS BIGINT) END) AS BIGINT), 0) AS sum_cents_view,
       coalesce(CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(round(value * 100, 0) AS BIGINT) END) AS BIGINT), 0) AS sum_cents_purchase,
       coalesce(CAST(sum(CASE WHEN event_type = 'signup'   THEN CAST(round(value * 100, 0) AS BIGINT) END) AS BIGINT), 0) AS sum_cents_signup,
       coalesce(CAST(sum(CASE WHEN event_type = 'error'    THEN CAST(round(value * 100, 0) AS BIGINT) END) AS BIGINT), 0) AS sum_cents_error
FROM events
GROUP BY user_id
"""


def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional nearest-in-time join: each click pairs with the
    same user's temporally closest purchase within ±1h (banded equi-join
    + min-struct argmin; never a nested-loop theta join)."""
    events = load_table(spark, sf_dir, "events")
    clicks = events.where(F.col("event_type") == "click")
    purchases = events.where(F.col("event_type") == "purchase")
    return features.asof_nearest(
        clicks, purchases, ["user_id"], tolerance_seconds=3600
    )


SQL_ASOF_NEAREST = """
WITH l AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS l_us
           FROM events WHERE event_type = 'click'),
     r AS (SELECT user_id, event_id AS rid, epoch_us(CAST(ts AS TIMESTAMP)) AS r_us
           FROM events WHERE event_type = 'purchase'),
     c AS (SELECT l.event_id, r.rid, r.r_us,
                  row_number() OVER (PARTITION BY l.event_id
                                     ORDER BY abs(r.r_us - l.l_us), r.r_us, r.rid) AS rn
           FROM l JOIN r ON l.user_id = r.user_id
                        AND abs(r.r_us - l.l_us) <= 3600000000)
SELECT l.user_id, l.event_id, l.l_us AS ts_us,
       c.rid AS nearest_event_id, c.r_us AS nearest_ts_us,
       c.r_us - l.l_us AS delta_us
FROM l LEFT JOIN (SELECT * FROM c WHERE rn = 1) c ON l.event_id = c.event_id
"""


# ------------------------------------------------------ lexical search surface


_BM25_TERMS = ["spark", "window", "dup"]


PHRASE = ["table", "hash"]


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase search over the positional index
    (operators/search.py:phrase_search): each phrase term's postings
    project back to the would-be start position and the phrase is a
    k-way hash equi-join on (doc, start) — postings pruned to phrase
    terms before any join, no corpus re-scan, no regex at query time."""
    docs = load_table(spark, sf_dir, "documents")
    return search.phrase_search(docs, PHRASE)


def _sql_phrase() -> str:
    joins = "\n".join(
        f"JOIN pp p{i} ON p{i}.doc_id = p0.doc_id"
        f" AND p{i}.term = '{t}' AND p{i}.pos = p0.pos + {i}"
        for i, t in enumerate(PHRASE[1:], start=1)
    )
    return f"""
WITH t AS (SELECT doc_id,
        list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                    x -> x != '') AS a
       FROM documents),
p AS (SELECT doc_id,
        unnest([struct_pack(pos := i - 1, term := a[i])
                FOR i IN range(1, len(a) + 1)]) AS s
      FROM t),
pp AS (SELECT doc_id, s.pos AS pos, s.term AS term FROM p)
SELECT p0.doc_id, CAST(count(*) AS BIGINT) AS n_matches,
       CAST(min(p0.pos) AS BIGINT) AS first_pos
FROM pp p0
{joins}
WHERE p0.term = '{PHRASE[0]}'
GROUP BY p0.doc_id
"""


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 documents for a fixed query-term bag; per-term scores
    integer-quantized before the per-doc sum (order-independent)."""
    docs = load_table(spark, sf_dir, "documents")
    return search.bm25_topk(docs, _BM25_TERMS, k=20)


SQL_BM25 = """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents),
post AS (SELECT doc_id, term, count(*) AS tf
         FROM toks WHERE term <> '' GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM post GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_len FROM dl),
qpost AS (SELECT * FROM post WHERE term IN ('spark', 'window', 'dup')),
dfreq AS (SELECT term, count(*) AS df_t FROM qpost GROUP BY term),
scored AS (
  SELECT q.doc_id,
         CAST(round(
           ln(1.0 + (s.n_docs - d.df_t + 0.5) / (d.df_t + 0.5))
           * (q.tf * 2.2)
           / (q.tf + 1.2 * (0.25 + 0.75 * l.dl * s.n_docs / s.total_len))
           * 1000000) AS BIGINT) AS ts_micro
  FROM qpost q
  JOIN dfreq d USING (term)
  JOIN dl l USING (doc_id)
  CROSS JOIN stats s)
SELECT doc_id, count(*) AS n_terms_matched,
       CAST(sum(ts_micro) AS BIGINT) AS score_micro
FROM scored GROUP BY doc_id
ORDER BY score_micro DESC, doc_id
LIMIT 20
"""


RRF_K = 60
RRF_LIST_K = 50


def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid-retrieval rank fusion: BM25 top-50 (lexical relevance)
    fused with the longest-document top-50 (a quality proxy ranking) by
    reciprocal-rank fusion, floor-quantized to micro-units
    (operators/search.py:rrf_fuse). Both lists are TakeOrdered-bounded
    BEFORE ranking, so the only unpartitioned window runs on ≤50 rows —
    never a global sort of the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    wa = Window.orderBy(F.col("score_micro").desc(), F.col("doc_id"))
    a = (
        search.bm25_topk(docs, _BM25_TERMS, k=RRF_LIST_K)
        .withColumn("rank", F.row_number().over(wa).cast("long"))
        .select("doc_id", "rank")
    )
    lens = docs.select(
        "doc_id",
        F.size(search.tokens(F.col("text"))).cast("long").alias("n_tokens"),
    ).where(F.col("n_tokens") > 0)
    top_b = lens.orderBy(F.col("n_tokens").desc(), "doc_id").limit(RRF_LIST_K)
    wb = Window.orderBy(F.col("n_tokens").desc(), F.col("doc_id"))
    b = (
        top_b.withColumn("rank", F.row_number().over(wb).cast("long"))
        .select("doc_id", "rank")
    )
    fused = search.rrf_fuse([a, b], k=RRF_K)
    return fused.orderBy(F.col("rrf_micro").desc(), "doc_id").limit(20)


SQL_RRF = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents),
post AS (SELECT doc_id, term, count(*) AS tf
         FROM toks WHERE term <> '' GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM post GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_len FROM dl),
qpost AS (SELECT * FROM post WHERE term IN ('spark', 'window', 'dup')),
dfreq AS (SELECT term, count(*) AS df_t FROM qpost GROUP BY term),
scored AS (
  SELECT q.doc_id,
         CAST(round(
           ln(1.0 + (s.n_docs - d.df_t + 0.5) / (d.df_t + 0.5))
           * (q.tf * 2.2)
           / (q.tf + 1.2 * (0.25 + 0.75 * l.dl * s.n_docs / s.total_len))
           * 1000000) AS BIGINT) AS ts_micro
  FROM qpost q
  JOIN dfreq d USING (term)
  JOIN dl l USING (doc_id)
  CROSS JOIN stats s),
bm AS (SELECT doc_id, CAST(sum(ts_micro) AS BIGINT) AS score
       FROM scored GROUP BY doc_id
       ORDER BY score DESC, doc_id LIMIT {RRF_LIST_K}),
bmr AS (SELECT doc_id,
               row_number() OVER (ORDER BY score DESC, doc_id) AS rank
        FROM bm),
lenr AS (SELECT doc_id,
                row_number() OVER (ORDER BY dl DESC, doc_id) AS rank
         FROM dl QUALIFY rank <= {RRF_LIST_K}),
u AS (
  SELECT doc_id, CAST(floor(1000000.0 / ({RRF_K} + rank)) AS BIGINT) AS c
  FROM bmr
  UNION ALL
  SELECT doc_id, CAST(floor(1000000.0 / ({RRF_K} + rank)) AS BIGINT)
  FROM lenr)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lists,
       CAST(sum(c) AS BIGINT) AS rrf_micro
FROM u GROUP BY doc_id
ORDER BY rrf_micro DESC, doc_id LIMIT 20
"""


def q_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each document's 3 highest-TF-IDF terms (characteristic vocab)."""
    docs = load_table(spark, sf_dir, "documents")
    return search.tfidf_top_terms(docs, n_per_doc=3)


SQL_TFIDF = """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents),
post AS (SELECT doc_id, term, count(*) AS tf
         FROM toks WHERE term <> '' GROUP BY doc_id, term),
stats AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM post),
dfreq AS (SELECT term, count(*) AS df_t FROM post GROUP BY term),
ranked AS (
  SELECT p.doc_id, p.term, p.tf,
         CAST(round(p.tf * ln(s.n_docs / d.df_t) * 1000000) AS BIGINT)
           AS tfidf_micro,
         row_number() OVER (
           PARTITION BY p.doc_id
           ORDER BY CAST(round(p.tf * ln(s.n_docs / d.df_t) * 1000000) AS BIGINT) DESC,
                    p.term) AS term_rank
  FROM post p JOIN dfreq d USING (term) CROSS JOIN stats s)
SELECT doc_id, term, tf, tfidf_micro, term_rank
FROM ranked WHERE term_rank <= 3
"""


def q_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed mean encoding of event_type by value — exact-integer
    inputs make the double arithmetic engine-portable."""
    events = load_table(spark, sf_dir, "events")
    return features.target_encode(events, ["event_type"], "value", smoothing=20.0)


SQL_TARGET_ENCODE = """
WITH g AS (SELECT CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS g_sum,
                  count(*) AS g_n
           FROM events),
     c AS (SELECT event_type,
                  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS c_sum,
                  count(*) AS n
           FROM events GROUP BY event_type)
SELECT c.event_type, c.n,
       CAST(round((c.c_sum + 20.0 * (g.g_sum / g.g_n)) / (c.n + 20.0) * 1000000)
            AS BIGINT) AS enc_cents_micro
FROM c CROSS JOIN g
"""


def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group percentile clipping: exact [p01, p99] bounds broadcast
    back into a clip projection — raw events never shuffle."""
    events = load_table(spark, sf_dir, "events")
    return features.winsorize(events, ["event_type"], "value", lo=0.01, hi=0.99)


SQL_WINSORIZE = """
WITH b AS (SELECT event_type,
                  quantile_cont(value, 0.01) AS lo_v,
                  quantile_cont(value, 0.99) AS hi_v
           FROM events GROUP BY event_type)
SELECT e.event_type, e.event_id,
       round(e.value, 6) AS value_raw,
       round(least(greatest(e.value, b.lo_v), b.hi_v), 6) AS value_winsorized,
       CAST(e.value < b.lo_v OR e.value > b.hi_v AS INT) AS was_clipped
FROM events e JOIN b USING (event_type)
"""


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window RAG chunking (64-token windows, stride 48) — one
    codegen projection + generator, zero shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    return text.chunk_documents(docs, chunk_tokens=64, stride=48)


SQL_CHUNK_DOCUMENTS = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents),
c AS (
  SELECT doc_id, toks, len(toks) AS n,
         unnest(generate_series(
           0,
           CAST(1 + ceil(greatest(len(toks) - 64, 0) / 48.0) AS BIGINT) - 1
         )) AS chunk_idx
  FROM t WHERE len(toks) > 0)
SELECT doc_id, chunk_idx,
       array_to_string(toks[chunk_idx * 48 + 1 : least(chunk_idx * 48 + 64, n)],
                       ' ') AS chunk_text,
       md5(array_to_string(
             toks[chunk_idx * 48 + 1 : least(chunk_idx * 48 + 64, n)], ' '))
         AS chunk_fingerprint,
       least(chunk_idx * 48 + 64, n) - (chunk_idx * 48 + 1) + 1
         AS n_tokens_chunk
FROM c
"""


# -------------------------------------------- sampling / skew / sketch surface


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis-Spirakis weighted sample (without replacement) of 100
    documents, probability ∝ length — deterministic md5 draws,
    distributed top-k."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.weighted_sample(docs, "n_chars", k=100, seed=7)


SQL_WEIGHTED_SAMPLE = """
WITH w AS (
  SELECT doc_id, n_chars AS weight,
         -ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':7'), 1, 7)
                   AS BIGINT) + 1) / 268435456.0)
           / CAST(n_chars AS DOUBLE) AS es_key
  FROM documents WHERE n_chars > 0)
SELECT doc_id, weight,
       CAST(round(es_key * 1000000) AS BIGINT) AS es_key_micro
FROM w ORDER BY es_key, doc_id LIMIT 100
"""


def q_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact⋈dim join (hot user keys fan out over 8 reducers),
    provably identical to the plain join — verified here by the oracle
    computing the UNSALTED join."""
    events = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("c_custkey"), "value"
    )
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = joins.skew_join(events, dim, ["c_custkey"], salt=8, how="left")
    return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("sum_cents"),
        F.count_distinct(F.col("c_custkey")).alias("n_users"),
    )


SQL_SKEW_JOIN = """
SELECT c.c_mktsegment AS segment, count(*) AS n_events,
       CAST(sum(CAST(round(e.value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents,
       count(DISTINCT e.user_id) AS n_users
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
"""


def q_sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL distinct-user estimates per event type alongside
    the exact counts (rows-only gate: DataSketches estimates are
    deterministic for Spark but not reproducible by DuckDB's HLL —
    error-bound and merge-equality checks live in pytest)."""
    events = load_table(spark, sf_dir, "events")
    approx = sketches.approx_distinct(events, ["event_type"], "user_id")
    exact = events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_distinct_user_id")
    )
    return approx.join(exact, "event_type")


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD history build from the events change log: collapse
    unchanged runs, emit [valid_from, valid_to) versions — the batch
    point-in-time history construction
    (operators/features.py:scd2_history)."""
    ev = load_table(spark, sf_dir, "events")
    out = features.scd2_history(
        ev, ["user_id"], ["event_type"], ts_col="ts", id_col="event_id"
    )
    return out.select(
        "user_id",
        "event_type",
        F.unix_micros("valid_from").alias("valid_from_us"),
        F.unix_micros("valid_to").alias("valid_to_us"),
        "version",
        "is_current",
    )


SQL_SCD2 = """
WITH o AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type,
         lag(event_type) OVER w AS prev,
         row_number() OVER w AS rn
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
c AS (SELECT * FROM o WHERE rn = 1 OR prev IS DISTINCT FROM event_type)
SELECT user_id, event_type,
       epoch_us(ts) AS valid_from_us,
       epoch_us(lead(ts) OVER w2) AS valid_to_us,
       CAST(row_number() OVER w2 AS BIGINT) AS version,
       (lead(ts) OVER w2) IS NULL AS is_current
FROM c
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


QBIN_K = 10


def q_quantile_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency discretization of order totals: exact decile
    edges from one tiny broadcast aggregate, assignment as a pure
    projection (operators/features.py:quantile_bin)."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("event_id"),
        F.col("o_totalprice").alias("value"),
    )
    return features.quantile_bin(orders, "value", k=QBIN_K, id_col="event_id")


def q_quantile_bin_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB strategy twin of ``quantile_bin``: Greenwald-Khanna
    ``percentile_approx`` edges (mergeable bounded-state sketch, no full
    value multiset per task) feeding the identical broadcast +
    pure-projection assignment. Rows-only gate — GK edge values are not
    reproducible by DuckDB; the exact twin keeps the hash oracle, and a
    pytest bounds the approx-vs-exact bin disagreement rate
    (operators/features.py:quantile_bin)."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("event_id"),
        F.col("o_totalprice").alias("value"),
    )
    return features.quantile_bin(
        orders, "value", k=QBIN_K, id_col="event_id", strategy="approx"
    )


_QBIN_PS = ", ".join(str(i / QBIN_K) for i in range(1, QBIN_K))

SQL_QUANTILE_BIN = f"""
WITH ed AS (SELECT quantile_cont(o_totalprice, [{_QBIN_PS}]) AS qs FROM orders)
SELECT o_orderkey AS event_id, round(o_totalprice, 6) AS value,
       CAST(len(list_filter(ed.qs, e -> o_totalprice > round(e, 6))) + 1
            AS BIGINT) AS bin
FROM orders, ed
"""


def q_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type robust outlier screen: modified z-score over
    median/MAD (operators/features.py:robust_outliers) — a single
    extreme value can't drag the threshold (50% breakdown), unlike
    mean/std screens; two group-sized percentile aggregates broadcast
    back, the flag is a pure projection."""
    ev = load_table(spark, sf_dir, "events")
    return features.robust_outliers(ev, ["event_type"], "value").select(
        "event_type",
        "event_id",
        F.round("value", 6).alias("value"),
        "group_median",
        "group_mad",
        "mod_z",
        "is_outlier",
    )


SQL_ROBUST_OUTLIERS = """
WITH med AS (SELECT event_type,
                    round(quantile_cont(value, 0.5), 6) AS group_median
             FROM events GROUP BY event_type),
dev AS (SELECT e.event_type, e.event_id, e.value, med.group_median,
               abs(e.value - med.group_median) AS adev
        FROM events e JOIN med USING (event_type)),
mad AS (SELECT event_type, round(quantile_cont(adev, 0.5), 6) AS group_mad
        FROM dev GROUP BY event_type)
SELECT d.event_type, d.event_id, round(d.value, 6) AS value,
       d.group_median, mad.group_mad,
       CASE WHEN mad.group_mad > 0
            THEN round(0.6745 * (d.value - d.group_median) / mad.group_mad, 6)
       END AS mod_z,
       CASE WHEN mad.group_mad > 0
            THEN abs(round(0.6745 * (d.value - d.group_median)
                           / mad.group_mad, 6)) > 3.5
            ELSE d.value != d.group_median
       END AS is_outlier
FROM dev d JOIN mad USING (event_type)
"""


RESAMPLE_START = "2024-01-01 00:00:00"
RESAMPLE_END = "2024-01-30 00:00:00"
RESAMPLE_STEP = 6 * 3600


def q_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular 6-hour grid per user with forward-filled last
    observation — single union-window pass, no per-grid-point join
    (operators/features.py:resample_ffill)."""
    ev = load_table(spark, sf_dir, "events")
    out = features.resample_ffill(
        ev, ["user_id"], RESAMPLE_START, RESAMPLE_END, RESAMPLE_STEP
    )
    return out.select(
        "user_id", F.unix_micros("grid_ts").alias("grid_ts_us"), "value_ffill"
    )


SQL_RESAMPLE = f"""
WITH keys AS (SELECT DISTINCT user_id FROM events),
grid AS (
  SELECT user_id,
         unnest(generate_series(TIMESTAMP '{RESAMPLE_START}',
                                TIMESTAMP '{RESAMPLE_END}',
                                INTERVAL {RESAMPLE_STEP} SECONDS)) AS gts
  FROM keys),
u AS (
  SELECT user_id, gts AS ts, NULL::DOUBLE AS v, 1 AS probe,
         NULL::BIGINT AS id
  FROM grid
  UNION ALL
  SELECT user_id, CAST(ts AS TIMESTAMP), value::DOUBLE, 0, event_id
  FROM events),
f AS (
  SELECT user_id, ts, probe,
         round(last_value(v IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY ts, probe, id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
           AS value_ffill
  FROM u)
SELECT user_id, epoch_us(ts) AS grid_ts_us, value_ffill
FROM f WHERE probe = 1
"""


PROFILE_COLS = ("o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority")


def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profile of the orders table: nulls, exact
    distincts, min/max, means in long format
    (operators/profile.py:profile_columns).

    r16: fan_out — the multi-distinct aggregate plans an Expand (each
    input row fans out once per profiled column), and the whole
    rows×(cols+1) partial-aggregate pass pipelines into the
    unsplittable single-file scan (one 2 s task, 31 cores idle —
    per-stage profile). At production scale the scan splits wide and
    the guard makes this a no-op. Interleaved A/B: 2.58 → 2.36 s
    median."""
    orders = load_table(spark, sf_dir, "orders", fan_out=True)
    return profile_columns(orders, list(PROFILE_COLS))


def q_profile_columns_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB strategy twin of ``profile_columns``:
    ``approx_count_distinct`` (HyperLogLog++, mergeable sketch state)
    replaces the exact multi-column distinct — no Catalyst ``Expand``
    fan-out of every input row per profiled column. Rows-only gate (HLL
    estimates are deterministic for Spark but not reproducible by
    DuckDB); the exact twin keeps the hash oracle
    (operators/profile.py:profile_columns)."""
    orders = load_table(spark, sf_dir, "orders")
    return profile_columns(orders, list(PROFILE_COLS), approx_distinct=True)


def _sql_profile() -> str:
    parts = []
    numeric = {"o_orderkey", "o_totalprice"}
    for c in PROFILE_COLS:
        if c in numeric:
            mins = f"round(CAST(min({c}) AS DOUBLE), 6)"
            maxs = f"round(CAST(max({c}) AS DOUBLE), 6)"
            mean = f"round(avg({c}), 6)"
            smin = "NULL::VARCHAR"
            smax = "NULL::VARCHAR"
        else:
            mins = maxs = mean = "NULL::DOUBLE"
            smin = f"min(CAST({c} AS VARCHAR))"
            smax = f"max(CAST({c} AS VARCHAR))"
        parts.append(
            f"SELECT '{c}' AS \"column\", count(*) AS n, "
            f"count(*) - count({c}) AS n_null, "
            f"CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct, "
            f"{mins} AS min_num, {maxs} AS max_num, {mean} AS mean, "
            f"{smin} AS min_str, {smax} AS max_str FROM orders"
        )
    return " UNION ALL ".join(parts)


BPE_TOP_N = 30


def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer-training step: corpus-wide adjacent character-pair
    frequencies computed over the aggregated vocabulary, not the raw
    corpus (operators/text.py:bpe_pair_counts)."""
    docs = load_table(spark, sf_dir, "documents")
    return text.bpe_pair_counts(docs, top_n=BPE_TOP_N)


SQL_BPE_PAIRS = f"""
WITH toks AS (SELECT unnest(string_split(lower(text), ' ')) AS tok
              FROM documents),
v AS (SELECT tok, count(*) AS c FROM toks WHERE len(tok) >= 2 GROUP BY tok),
i AS (SELECT tok, c, unnest(range(1, len(tok))) AS i FROM v),
p AS (SELECT substring(tok, i, 1) AS l, substring(tok, i + 1, 1) AS r, c
      FROM i)
SELECT l AS "left", r AS "right", CAST(sum(c) AS BIGINT) AS pair_count
FROM p GROUP BY 1, 2
ORDER BY pair_count DESC, "left", "right" LIMIT {BPE_TOP_N}
"""


LF_DELIM = " merge "
LF_MIN_WORDS = 4
LF_BLOCKLIST = ("slow", "clickbait")
LF_MIN_KEPT = 2


def q_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level boilerplate removal (line = ' merge '-separated
    segment on this corpus): word-count floor + blocklist screen, docs
    flagged when fewer than 2 lines survive — one codegen projection
    (operators/curation.py:line_filter)."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.line_filter(
        docs,
        delimiter=LF_DELIM,
        min_words=LF_MIN_WORDS,
        require_terminal_punct=False,
        blocklist=LF_BLOCKLIST,
        min_kept_lines=LF_MIN_KEPT,
    )


_LF_BLOCK_PRED = " AND ".join(
    f"NOT contains(lower(x), '{w}')" for w in LF_BLOCKLIST
)

SQL_LINE_FILTER = f"""
WITH l AS (SELECT doc_id, string_split(text, '{LF_DELIM}') AS lines
           FROM documents),
k AS (SELECT doc_id, lines,
        list_filter(lines,
          x -> len(regexp_extract_all(x, '\\S+')) >= {LF_MIN_WORDS}
               AND {_LF_BLOCK_PRED}) AS kl
      FROM l)
SELECT doc_id, array_to_string(kl, '{LF_DELIM}') AS text,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(len(kl) AS BIGINT) AS n_kept,
       len(kl) >= {LF_MIN_KEPT} AS kept
FROM k
"""


def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log collapse with delete tombstones: latest (ts, seq) op per
    key wins; a winning delete removes the key — the online-store
    upsert rule extended with the KV stores' DEL half
    (operators/materialize.py:apply_cdc). Ops are derived
    deterministically from event ids to turn the events table into a
    change log."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").alias("event_timestamp"),
        F.col("event_id").alias("seq"),
        F.expr(
            "CASE WHEN event_id % 10 = 0 THEN 'D' "
            "WHEN event_id % 3 = 0 THEN 'U' ELSE 'I' END"
        ).alias("op"),
        F.round("value", 6).alias("value"),
    )
    out = apply_cdc(ev, ["user_id"], ts_col="event_timestamp", seq_col="seq")
    return out.select(
        "user_id",
        F.unix_micros("event_timestamp").alias("ts_us"),
        "seq",
        "value",
    )


SQL_CDC_APPLY = """
WITH c AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
         CASE WHEN event_id % 10 = 0 THEN 'D'
              WHEN event_id % 3 = 0 THEN 'U' ELSE 'I' END AS op,
         round(value, 6) AS value
  FROM events),
r AS (SELECT *, row_number() OVER (PARTITION BY user_id
        ORDER BY ts DESC, event_id DESC) AS rn FROM c)
SELECT user_id, epoch_us(ts) AS ts_us, event_id AS seq, value
FROM r WHERE rn = 1 AND op != 'D'
"""


def q_normalize_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score / min-max / percent-rank scaling in one window
    pass — one exchange, the moments never materialize as a joined
    table (operators/features.py:normalize_features)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "value"
    )
    return features.normalize_features(ev, ["event_type"])


SQL_NORMALIZE = """
SELECT event_type, event_id, round(value, 6) AS value,
       round(CASE WHEN stddev_samp(value) OVER w > 0
             THEN (value - avg(value) OVER w) / (stddev_samp(value) OVER w)
             END, 6) AS zscore,
       round(CASE WHEN max(value) OVER w > min(value) OVER w
             THEN (value - min(value) OVER w)
                  / (max(value) OVER w - min(value) OVER w)
             END, 6) AS minmax,
       CASE WHEN value IS NOT NULL THEN
            round(percent_rank() OVER
                  (PARTITION BY event_type ORDER BY value NULLS LAST), 6)
       END AS pct_rank
FROM events
WINDOW w AS (PARTITION BY event_type)
"""


FUNNEL_STAGES = ("signup", "view", "purchase")


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order conversion funnel (signup → view → purchase) per
    user: single scan, single aggregate-sized shuffle, stage walk as a
    JVM fold over each user's sorted stage events
    (operators/features.py:funnel)."""
    ev = load_table(spark, sf_dir, "events")
    return features.funnel(ev, ["user_id"], list(FUNNEL_STAGES))


SQL_FUNNEL = f"""
WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
                  event_type FROM events
           WHERE event_type IN ('signup', 'view', 'purchase')),
t1 AS MATERIALIZED (SELECT user_id, min(ts_us) AS ts_1_us FROM e
       WHERE event_type = 'signup' GROUP BY user_id),
t2 AS (SELECT e.user_id, min(ts_us) AS ts_2_us
       FROM e JOIN t1 ON e.user_id = t1.user_id
       WHERE event_type = 'view' AND ts_us > ts_1_us GROUP BY e.user_id),
t3 AS (SELECT e.user_id, min(ts_us) AS ts_3_us
       FROM e JOIN t2 ON e.user_id = t2.user_id
       WHERE event_type = 'purchase' AND ts_us > ts_2_us
       GROUP BY e.user_id)
SELECT u.user_id, t1.ts_1_us, t2.ts_2_us, t3.ts_3_us,
       CAST((t1.user_id IS NOT NULL)::INT + (t2.user_id IS NOT NULL)::INT
            + (t3.user_id IS NOT NULL)::INT AS BIGINT) AS stages_reached
FROM (SELECT DISTINCT user_id FROM e) u
LEFT JOIN t1 USING (user_id)
LEFT JOIN t2 USING (user_id)
LEFT JOIN t3 USING (user_id)
"""


COHORT_DAYS = 7


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users bucketed by
    first-event period, distinct-counted per period offset
    (operators/features.py:cohort_retention)."""
    ev = load_table(spark, sf_dir, "events")
    return features.cohort_retention(ev, ["user_id"], period_days=COHORT_DAYS)


SQL_COHORT = f"""
WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
           FROM events),
f AS (SELECT user_id, min(ts_us) AS first_us FROM e GROUP BY user_id),
j AS (SELECT e.user_id,
             CAST(e.ts_us // {COHORT_DAYS * 86400 * 1_000_000} AS BIGINT)
               AS p,
             CAST(f.first_us // {COHORT_DAYS * 86400 * 1_000_000} AS BIGINT)
               AS fp
      FROM e JOIN f ON e.user_id = f.user_id)
SELECT fp AS cohort_period, p - fp AS period_offset,
       count(DISTINCT user_id) AS n_active
FROM j GROUP BY 1, 2
"""


ZORDER_BITS = 8


def _cust_day_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared prep for the two space-filling-curve gate queries: the
    (customer, order-day) plane min/max-scaled to ZORDER_BITS bits —
    one broadcast 1-row aggregate, assignment a pure projection. One
    definition so the next events/orders type drift (a recurring
    testdata hazard) is fixed in one place."""
    from feast_java_old_spark.operators.layout import zorder_scale

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("__x"),
        (F.unix_micros("o_orderdate") / F.lit(86400_000_000))
        .cast("long")
        .alias("__y"),
    )
    mm = orders.agg(
        F.min("__x").alias("__lo_x"),
        F.max("__x").alias("__hi_x"),
        F.min("__y").alias("__lo_y"),
        F.max("__y").alias("__hi_y"),
    )
    return orders.crossJoin(F.broadcast(mm)).select(
        "o_orderkey",
        zorder_scale(
            F.col("__x"), F.col("__lo_x"), F.col("__hi_x"), ZORDER_BITS
        ).alias("__sx"),
        zorder_scale(
            F.col("__y"), F.col("__lo_y"), F.col("__hi_y"), ZORDER_BITS
        ).alias("__sy"),
    )


def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (customer, order-day):
    min/max scale each dimension to 8 bits from one broadcast
    aggregate, then interleave bits with pure shift/mask codegen — the
    sort key behind multi-dimensional file skipping
    (operators/layout.py). The full layout rewrite
    (``layout_zorder``) adds only a range exchange on this key."""
    from feast_java_old_spark.operators.layout import interleave_bits

    scaled = _cust_day_scaled(spark, sf_dir)
    z = interleave_bits([F.col("__sx"), F.col("__sy")], ZORDER_BITS)
    return scaled.select("o_orderkey", z.alias("z"))


def _sql_zorder() -> str:
    b = ZORDER_BITS
    top = (1 << b) - 1

    def scale(x, lo, hi):
        return (
            f"CASE WHEN ({hi} - {lo}) > 0 THEN "
            f"least(CAST(floor((CAST({x} AS DOUBLE) - {lo}) / ({hi} - {lo})"
            f" * {top + 1}) AS BIGINT), {top}) ELSE 0 END"
        )

    terms = []
    for j, s in enumerate(("sx", "sy")):
        for i in range(b):
            terms.append(f"((({s} >> {i}) & 1) << {i * 2 + j})")
    return f"""
WITH o AS (SELECT o_orderkey, o_custkey AS x,
                  epoch_us(o_orderdate) // 86400000000 AS y FROM orders),
mm AS (SELECT CAST(min(x) AS DOUBLE) AS lox, CAST(max(x) AS DOUBLE) AS hix,
              CAST(min(y) AS DOUBLE) AS loy, CAST(max(y) AS DOUBLE) AS hiy
       FROM o),
s AS (SELECT o_orderkey,
             {scale("x", "mm.lox", "mm.hix")} AS sx,
             {scale("y", "mm.loy", "mm.hiy")} AS sy
      FROM o, mm)
SELECT o_orderkey, CAST({" + ".join(terms)} AS BIGINT) AS z FROM s
"""


def q_hilbert_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert clustering key over the same (customer, order-day) plane
    as ``zorder_key`` (operators/layout.py:hilbert_key): the
    better-locality space-filling curve — consecutive indices are
    always edge-adjacent cells (contract-tested by brute force), so
    range scans of the sort key touch fewer files per 2-D selection
    box than the Morton key's quadrant-seam jumps. 8 unrolled
    shift/mask/CASE steps with explode-struct barriers pinning plan
    growth linear; the oracle replays the identical quadrant-fold
    recurrence as materialized CTE steps."""
    from feast_java_old_spark.operators.layout import hilbert_key

    scaled = _cust_day_scaled(spark, sf_dir)
    return hilbert_key(
        scaled, "__sx", "__sy", ZORDER_BITS, out_col="h"
    ).select("o_orderkey", "h")


def _sql_hilbert() -> str:
    b = ZORDER_BITS
    n = 1 << b
    top = n - 1

    def scale(x, lo, hi):
        return (
            f"CASE WHEN ({hi} - {lo}) > 0 THEN "
            f"least(CAST(floor((CAST({x} AS DOUBLE) - {lo}) / ({hi} - {lo})"
            f" * {top + 1}) AS BIGINT), {top}) ELSE 0 END"
        )

    # one MATERIALIZED CTE per curve level: each step references the
    # previous step's x/y several times — non-materialized CTEs would
    # re-inline exponentially (the r7 DuckDB recurrence-hang lesson)
    steps = []
    prev = "h0"
    for i, k in enumerate(range(b - 1, -1, -1), start=1):
        s = 1 << k
        rx = f"((x >> {k}) & 1)"
        ry = f"((y >> {k}) & 1)"
        quad = (
            f"CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0 "
            f"WHEN {rx} = 0 THEN 1 WHEN {ry} = 1 THEN 2 ELSE 3 END"
        )
        steps.append(
            f"h{i} AS MATERIALIZED (SELECT o_orderkey,\n"
            f"  CASE WHEN {ry} = 0 THEN CASE WHEN {rx} = 1"
            f" THEN {top} - y ELSE y END ELSE x END AS x,\n"
            f"  CASE WHEN {ry} = 0 THEN CASE WHEN {rx} = 1"
            f" THEN {top} - x ELSE x END ELSE y END AS y,\n"
            f"  d + {s * s} * ({quad}) AS d\n"
            f"  FROM {prev})"
        )
        prev = f"h{i}"
    return f"""
WITH o AS (SELECT o_orderkey, o_custkey AS rx,
                  epoch_us(o_orderdate) // 86400000000 AS ry FROM orders),
mm AS (SELECT CAST(min(rx) AS DOUBLE) AS lox, CAST(max(rx) AS DOUBLE) AS hix,
              CAST(min(ry) AS DOUBLE) AS loy, CAST(max(ry) AS DOUBLE) AS hiy
       FROM o),
h0 AS (SELECT o_orderkey,
              {scale("rx", "mm.lox", "mm.hix")} AS x,
              {scale("ry", "mm.loy", "mm.hiy")} AS y,
              CAST(0 AS BIGINT) AS d
       FROM o, mm),
{",".join(steps)}
SELECT o_orderkey, CAST(d AS BIGINT) AS h FROM {prev}
"""


CURVE_BOX_LO, CURVE_BOX_HI = 100, 155  # straddles the 128 seam, MISALIGNED
# with every 2^k tile boundary (aligned boxes decompose into whole
# quadrant tiles, which are contiguous in BOTH curves and hide the
# locality difference)
CURVE_FILES = 32  # NOT a power of 4: a file then spans two 32x32 curve
# tiles, and WHICH two get merged is the locality difference (any
# 4^k-aligned tile is contiguous in BOTH curves, so power-of-4 file
# counts cannot distinguish them)


def q_curve_skip_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured file-skipping comparison of the two space-filling-curve
    layouts on the SAME 2-D box selection (one straddling the 128
    quadrant seam, where the Morton curve's locality breaks): rows are
    assigned to {CURVE_FILES} pseudo-files by curve-key range (what
    ``repartitionByRange`` on the key produces), and per layout the
    audit reports files touched by ≥1 match, files total, rows scanned
    (rows in touched files — the cost a zone-map reader pays) and rows
    matched. The Hilbert layout's adjacency law (unit-Manhattan steps,
    contract-tested) concentrates any connected box into fewer key
    ranges than Morton's seam jumps — this query turns that law into
    the scan-cost number a 100 TB layout decision needs, from
    metadata-sized aggregates, before rewriting anything."""
    from pyspark.sql.window import Window

    from feast_java_old_spark.operators.layout import (
        hilbert_key,
        interleave_bits,
    )

    scaled = _cust_day_scaled(spark, sf_dir)
    keyed = hilbert_key(
        scaled, "__sx", "__sy", ZORDER_BITS, out_col="__h"
    ).withColumn(
        "__z", interleave_bits([F.col("__sx"), F.col("__sy")], ZORDER_BITS)
    )
    match = (
        F.col("__sx").between(CURVE_BOX_LO, CURVE_BOX_HI)
        & F.col("__sy").between(CURVE_BOX_LO, CURVE_BOX_HI)
    ).cast("long")
    denom = (1 << (2 * ZORDER_BITS)) // CURVE_FILES
    both = keyed.select(
        F.lit("zorder").alias("layout"),
        F.col("__z").alias("key"),
        F.expr(f"__z div {denom}").alias("fid"),
        match.alias("m"),
    ).unionByName(
        keyed.select(
            F.lit("hilbert").alias("layout"),
            F.col("__h").alias("key"),
            F.expr(f"__h div {denom}").alias("fid"),
            match.alias("m"),
        )
    )
    # per-(layout, fid) stats via a map-side-combined aggregate — NOT a
    # window over every row (a window would shuffle and sort the full
    # 2×|orders| union; the aggregate shuffles one row per file)
    files = both.groupBy("layout", "fid").agg(
        F.count(F.lit(1)).alias("__n"), F.sum("m").alias("__nm")
    )
    # n_key_ranges: maximal contiguous key runs covering the box REGION
    # (all its cells, not just occupied ones) — the range-scan count a
    # key-ordered reader issues for the box, the canonical curve-
    # locality metric. Dense by construction: sparse occupancy makes
    # point-islands curve-independent noise. Measured here: hilbert 21
    # vs zorder 40 ranges for this box (the adjacency law, quantified).
    cells = (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(F.lit(CURVE_BOX_LO), F.lit(CURVE_BOX_HI))
            ).alias("__sx")
        )
        .select(
            "__sx",
            F.explode(
                F.sequence(F.lit(CURVE_BOX_LO), F.lit(CURVE_BOX_HI))
            ).alias("__sy"),
        )
    )
    ckeys = hilbert_key(
        cells, "__sx", "__sy", ZORDER_BITS, out_col="__h"
    ).withColumn(
        "__z", interleave_bits([F.col("__sx"), F.col("__sy")], ZORDER_BITS)
    )
    ckl = ckeys.select(
        F.lit("zorder").alias("layout"), F.col("__z").alias("key")
    ).unionByName(
        ckeys.select(
            F.lit("hilbert").alias("layout"), F.col("__h").alias("key")
        )
    )
    wkey = Window.partitionBy("layout").orderBy("key")
    ranges = (
        ckl.select(
            "layout",
            (F.col("key") - F.row_number().over(wkey)).alias("__island"),
        )
        .groupBy("layout")
        .agg(F.countDistinct("__island").alias("n_key_ranges"))
    )
    per_file = files.groupBy("layout").agg(
        F.sum((F.col("__nm") > 0).cast("long")).alias("files_touched"),
        F.count(F.lit(1)).alias("files_total"),
        F.sum(F.when(F.col("__nm") > 0, F.col("__n"))).alias(
            "rows_scanned"
        ),
        F.sum("__nm").alias("rows_matched"),
    )
    return per_file.join(ranges, "layout").select(
        "layout",
        F.col("files_touched").cast("long").alias("files_touched"),
        F.col("files_total").cast("long").alias("files_total"),
        F.col("rows_scanned").cast("long").alias("rows_scanned"),
        F.col("rows_matched").cast("long").alias("rows_matched"),
        F.col("n_key_ranges").cast("long").alias("n_key_ranges"),
    )


def _sql_curve_audit() -> str:
    b = ZORDER_BITS
    n = 1 << b
    top = n - 1
    denom = (1 << (2 * b)) // CURVE_FILES

    def scale(x, lo, hi):
        return (
            f"CASE WHEN ({hi} - {lo}) > 0 THEN "
            f"least(CAST(floor((CAST({x} AS DOUBLE) - {lo}) / ({hi} - {lo})"
            f" * {top + 1}) AS BIGINT), {top}) ELSE 0 END"
        )

    zterms = []
    for j, srccol in enumerate(("x0", "y0")):
        for i in range(b):
            zterms.append(f"((({srccol} >> {i}) & 1) << {i * 2 + j})")

    def chain(prefix, id_cols):
        """Hilbert quadrant-fold steps as MATERIALIZED CTEs (the r7
        DuckDB lesson: non-materialized would re-inline exponentially)."""
        out = []
        prev = f"{prefix}0"
        ids = ", ".join(id_cols)
        for i, k in enumerate(range(b - 1, -1, -1), start=1):
            step = 1 << k
            rx = f"((x >> {k}) & 1)"
            ry = f"((y >> {k}) & 1)"
            quad = (
                f"CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0 "
                f"WHEN {rx} = 0 THEN 1 WHEN {ry} = 1 THEN 2 ELSE 3 END"
            )
            out.append(
                f"{prefix}{i} AS MATERIALIZED (SELECT {ids},\n"
                f"  CASE WHEN {ry} = 0 THEN CASE WHEN {rx} = 1"
                f" THEN {top} - y ELSE y END ELSE x END AS x,\n"
                f"  CASE WHEN {ry} = 0 THEN CASE WHEN {rx} = 1"
                f" THEN {top} - x ELSE x END ELSE y END AS y,\n"
                f"  d + {step * step} * ({quad}) AS d\n"
                f"  FROM {prev})"
            )
            prev = f"{prefix}{i}"
        return ",".join(out), prev

    hsteps, hlast = chain("h", ["o_orderkey", "x0", "y0"])
    csteps, clast = chain("c", ["x0", "y0"])
    return f"""
WITH o AS (SELECT o_orderkey, o_custkey AS rx,
                  epoch_us(o_orderdate) // 86400000000 AS ry FROM orders),
mm AS (SELECT CAST(min(rx) AS DOUBLE) AS lox, CAST(max(rx) AS DOUBLE) AS hix,
              CAST(min(ry) AS DOUBLE) AS loy, CAST(max(ry) AS DOUBLE) AS hiy
       FROM o),
h0 AS (SELECT o_orderkey,
              {scale("rx", "mm.lox", "mm.hix")} AS x0,
              {scale("ry", "mm.loy", "mm.hiy")} AS y0,
              {scale("rx", "mm.lox", "mm.hix")} AS x,
              {scale("ry", "mm.loy", "mm.hiy")} AS y,
              CAST(0 AS BIGINT) AS d
       FROM o, mm),
{hsteps},
keyed AS (SELECT o_orderkey, x0, y0, d AS h,
                 CAST({" + ".join(zterms)} AS BIGINT) AS z
          FROM {hlast}),
both_layouts AS (
  SELECT 'zorder' AS layout, z // {denom} AS fid,
         CASE WHEN x0 BETWEEN {CURVE_BOX_LO} AND {CURVE_BOX_HI}
               AND y0 BETWEEN {CURVE_BOX_LO} AND {CURVE_BOX_HI}
              THEN 1 ELSE 0 END AS m
  FROM keyed
  UNION ALL
  SELECT 'hilbert', h // {denom},
         CASE WHEN x0 BETWEEN {CURVE_BOX_LO} AND {CURVE_BOX_HI}
               AND y0 BETWEEN {CURVE_BOX_LO} AND {CURVE_BOX_HI}
              THEN 1 ELSE 0 END
  FROM keyed),
flagged AS (
  SELECT layout, fid, m,
         max(m) OVER (PARTITION BY layout, fid) AS touched
  FROM both_layouts),
c0 AS (SELECT CAST(i.i AS BIGINT) AS x0, CAST(j.j AS BIGINT) AS y0,
              CAST(i.i AS BIGINT) AS x, CAST(j.j AS BIGINT) AS y,
              CAST(0 AS BIGINT) AS d
       FROM unnest(range({CURVE_BOX_LO}, {CURVE_BOX_HI + 1})) AS i(i),
            unnest(range({CURVE_BOX_LO}, {CURVE_BOX_HI + 1})) AS j(j)),
{csteps},
ckeys AS (SELECT d AS h,
                 CAST({" + ".join(zterms)} AS BIGINT) AS z
          FROM {clast}),
ckl AS (SELECT 'zorder' AS layout, z AS key FROM ckeys
        UNION ALL
        SELECT 'hilbert', h FROM ckeys),
isl AS (SELECT layout,
               key - row_number() OVER (PARTITION BY layout ORDER BY key)
                 AS island
        FROM ckl),
rng AS (SELECT layout, count(DISTINCT island) AS n_key_ranges
        FROM isl GROUP BY layout),
per_file AS (
  SELECT layout,
         CAST(count(DISTINCT CASE WHEN m = 1 THEN fid END) AS BIGINT)
           AS files_touched,
         CAST(count(DISTINCT fid) AS BIGINT) AS files_total,
         CAST(sum(touched) AS BIGINT) AS rows_scanned,
         CAST(sum(m) AS BIGINT) AS rows_matched
  FROM flagged GROUP BY layout)
SELECT p.layout, p.files_touched, p.files_total, p.rows_scanned,
       p.rows_matched, CAST(r.n_key_ranges AS BIGINT) AS n_key_ranges
FROM per_file p JOIN rng r ON r.layout = p.layout
"""


SNAPSHOT_AT = "2024-01-20 00:00:00"


def q_scd2_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel read: reconstruct each user's state as of Jan 20 from
    the SCD2 history — a pure validity-interval filter over
    scd2_history (operators/features.py:snapshot_at)."""
    ev = load_table(spark, sf_dir, "events")
    hist = features.scd2_history(
        ev, ["user_id"], ["event_type"], ts_col="ts", id_col="event_id"
    )
    return features.snapshot_at(hist, SNAPSHOT_AT).select(
        "user_id",
        "event_type",
        F.unix_micros("valid_from").alias("valid_from_us"),
        "version",
    )


SQL_SCD2_SNAPSHOT = f"""
WITH o AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type,
         lag(event_type) OVER w AS prev,
         row_number() OVER w AS rn
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
c AS (SELECT * FROM o WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
h AS (SELECT user_id, event_type, ts AS valid_from,
             lead(ts) OVER w2 AS valid_to,
             CAST(row_number() OVER w2 AS BIGINT) AS version
      FROM c
      WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, event_type, epoch_us(valid_from) AS valid_from_us, version
FROM h
WHERE valid_from <= TIMESTAMP '{SNAPSHOT_AT}'
  AND (valid_to IS NULL OR valid_to > TIMESTAMP '{SNAPSHOT_AT}')
"""


ENCODE_VOCAB = 50


def q_token_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary encoding (the tokenize step before training):
    frequency-ranked top-50 vocab, broadcast id lookup, order-preserving
    reassembly with OOV → 0
    (operators/text.py:build_vocab/encode_tokens).

    The gate projection re-explodes the encoded arrays to scalar
    ``(doc_id, pos, token_id)`` rows — the driver's pandas canonicalizer
    cannot sort array-typed cells (the kmeans_refine r3 failure class).
    The round-trip through ``encode_tokens``'s array output still
    exercises the operator's order-preserving reassembly: a wrong token
    order shows up as wrong ``pos`` values."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = text.build_vocab(docs, vocab_size=ENCODE_VOCAB)
    enc = text.encode_tokens(docs, vocab, unk_id=0)
    return enc.select(
        "doc_id", F.posexplode("token_ids").alias("pos", "token_id")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "token_id")


SQL_TOKEN_ENCODE = f"""
WITH toks AS (SELECT unnest(string_split(lower(text), ' ')) AS tok
              FROM documents),
vc AS (SELECT tok, count(*) AS c FROM toks WHERE len(tok) > 0 GROUP BY tok
       ORDER BY c DESC, tok LIMIT {ENCODE_VOCAB}),
v AS (SELECT tok, CAST(row_number() OVER (ORDER BY c DESC, tok) AS BIGINT)
             AS tid FROM vc),
e AS (SELECT doc_id,
             list_filter(string_split(lower(text), ' '), t -> len(t) > 0)
               AS ts
      FROM documents),
x AS (SELECT doc_id, unnest(range(len(ts))) AS pos, unnest(ts) AS tok
      FROM e)
SELECT x.doc_id, CAST(x.pos AS BIGINT) AS pos,
       CAST(coalesce(v.tid, 0) AS BIGINT) AS token_id
FROM x LEFT JOIN v ON v.tok = x.tok
"""


HH_K = 10


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-memory top-k frequent values: per-partition Misra-Gries
    candidate pass (Arrow-batched, m counters of state) + exact
    candidate recount — equals the exact GROUP BY top-k whenever the
    k-th hitter clears n/(m+1) (operators/sketches.py:heavy_hitters).
    The oracle computes the plain exact form."""
    ev = load_table(spark, sf_dir, "events")
    return sketches.heavy_hitters(ev, "user_id", k=HH_K, m=256)


SQL_HEAVY_HITTERS = f"""
SELECT user_id, count(*) AS cnt FROM events
WHERE user_id IS NOT NULL
GROUP BY user_id ORDER BY cnt DESC, user_id LIMIT {HH_K}
"""


CMS_DEPTH = 4
CMS_WIDTH = 256
CMS_PROBE_MAX = 20


def q_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation
    (operators/sketches.py:count_min_cells/count_min_estimate): the
    sketch build shuffles at most partitions × depth × width partial
    cells however large or skewed the input; point queries broadcast
    the ≤ depth × width cell table. Probes are the partkeys <
    CMS_PROBE_MAX; output pairs each estimate with the exact count so
    the gate also verifies the CMS overcount invariant (est ≥ exact).
    The md5-prefix hash family is engine-reproducible, so the oracle
    rebuilds the identical sketch cell-for-cell."""
    li = load_table(spark, sf_dir, "lineitem", fan_out=True)
    cells = sketches.count_min_cells(
        li, "l_partkey", depth=CMS_DEPTH, width=CMS_WIDTH
    )
    probes = (
        li.where(F.col("l_partkey") < CMS_PROBE_MAX)
        .select("l_partkey")
        .distinct()
    )
    est = sketches.count_min_estimate(
        cells, probes, "l_partkey", depth=CMS_DEPTH, width=CMS_WIDTH
    )
    exact = (
        li.where(F.col("l_partkey") < CMS_PROBE_MAX)
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    return est.join(exact, "l_partkey").select(
        "l_partkey", "est_cnt", "exact_cnt"
    )


def _sql_count_min() -> str:
    return f"""
WITH d AS (SELECT unnest(range(0, {CMS_DEPTH})) AS i),
cells AS (
  SELECT d.i AS row_idx,
         ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1 + 7 * d.i, 7))::BIGINT
           % {CMS_WIDTH} AS col_idx,
         CAST(count(*) AS BIGINT) AS cnt
  FROM lineitem CROSS JOIN d
  WHERE l_partkey IS NOT NULL
  GROUP BY 1, 2),
probes AS (SELECT DISTINCT l_partkey FROM lineitem
           WHERE l_partkey < {CMS_PROBE_MAX}),
ph AS (
  SELECT p.l_partkey, d.i AS row_idx,
         ('0x' || substr(md5(CAST(p.l_partkey AS VARCHAR)), 1 + 7 * d.i, 7))::BIGINT
           % {CMS_WIDTH} AS col_idx
  FROM probes p CROSS JOIN d),
est AS (
  SELECT ph.l_partkey, min(cells.cnt) AS est_cnt
  FROM ph JOIN cells USING (row_idx, col_idx)
  GROUP BY ph.l_partkey),
ex AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS exact_cnt
  FROM lineitem WHERE l_partkey < {CMS_PROBE_MAX} GROUP BY l_partkey)
SELECT est.l_partkey, est.est_cnt, ex.exact_cnt
FROM est JOIN ex USING (l_partkey)
"""


def q_cms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation from sketches (operators/sketches.py:
    cms_join_size): |lineitem ⋈ orders on custkey-of-order... here the
    partkey self-join Σf(v)² — the skew-blow-up quantity a planner
    needs| estimated from two kilobyte CMS sketches WITHOUT scanning
    either side at plan time; paired with the exact answer so the gate
    verifies the upper-bound invariant (est ≥ exact) numerically."""
    # fan_out: the sketch build is depth x md5 per row pipelined into an
    # unsplittable single-file scan (AQE leaves it at 3 tasks). The two
    # consumers (cells + exact) prune different columns so each pays its
    # own narrow fan-out exchange, but the CPU-dense sketch/agg stages
    # run at full width — measured net win (interleaved in-JVM A/B
    # 2.69 -> 2.35 s median).
    li = load_table(spark, sf_dir, "lineitem", fan_out=True)
    part_cells = sketches.count_min_cells(
        li, "l_partkey", depth=CMS_DEPTH, width=CMS_WIDTH
    )
    est = sketches.cms_join_size(part_cells, part_cells, depth=CMS_DEPTH)
    exact = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg(F.sum(F.col("__n") * F.col("__n")).alias("exact_pairs"))
    )
    return est.crossJoin(exact).select("est_pairs", "exact_pairs")


def _sql_cms_join_size() -> str:
    return f"""
WITH d AS (SELECT unnest(range(0, {CMS_DEPTH})) AS i),
cells AS (
  SELECT d.i AS row_idx,
         ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1 + 7 * d.i, 7))::BIGINT
           % {CMS_WIDTH} AS col_idx,
         CAST(count(*) AS BIGINT) AS cnt
  FROM lineitem CROSS JOIN d
  WHERE l_partkey IS NOT NULL
  GROUP BY 1, 2),
ip AS (SELECT row_idx, sum(cnt * cnt) AS ipr FROM cells GROUP BY row_idx),
ex AS (SELECT CAST(sum(n * n) AS BIGINT) AS exact_pairs
       FROM (SELECT count(*) AS n FROM lineitem GROUP BY l_partkey))
SELECT CAST((SELECT min(ipr) FROM ip) AS BIGINT) AS est_pairs, ex.exact_pairs
FROM ex
"""


BLOOM_K = 4
BLOOM_BITS = 4096
BLOOM_PRICE = 490_000


def q_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter join pruning (operators/sketches.py:bloom_build/
    bloom_probe): the high-value-order customer key set compresses to
    ≤ BLOOM_BITS set-bit rows that BROADCAST; probing every customer
    map-side shows which fact rows a 100 TB join could drop before its
    shuffle. Output pairs the filter's verdict with ground truth, so
    the gate proves the no-false-negative invariant row by row (and
    pins the deterministic false-positive set). Same sliced-md5 hash
    family as the CMS — the oracle rebuilds the filter bit-for-bit."""
    orders = load_table(spark, sf_dir, "orders")
    hot = orders.where(F.col("o_totalprice") > BLOOM_PRICE)
    bloom = sketches.bloom_build(hot, "o_custkey", k=BLOOM_K, bits=BLOOM_BITS)
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey")
    )
    probed = sketches.bloom_probe(
        bloom, cust, "o_custkey", k=BLOOM_K, bits=BLOOM_BITS
    )
    truth = hot.select("o_custkey").distinct().withColumn(
        "actually_present", F.lit(True)
    )
    return (
        probed.join(truth, "o_custkey", "left")
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "maybe_present",
            F.coalesce("actually_present", F.lit(False)).alias(
                "actually_present"
            ),
        )
    )


def _sql_bloom() -> str:
    slices = ", ".join(
        f"('0x' || substr(d, {1 + 7 * i}, 7))::BIGINT % {BLOOM_BITS}"
        for i in range(BLOOM_K)
    )
    return f"""
WITH hot AS (SELECT DISTINCT o_custkey FROM orders
             WHERE o_totalprice > {BLOOM_PRICE}),
hd AS (SELECT o_custkey, md5(CAST(o_custkey AS VARCHAR)) AS d FROM hot),
bloom AS (SELECT DISTINCT unnest([{slices}]) AS bit_pos FROM hd),
cd AS (SELECT c_custkey, md5(CAST(c_custkey AS VARCHAR)) AS d FROM customer),
ph AS (SELECT c_custkey, unnest([{slices}]) AS bit_pos FROM cd),
hits AS (SELECT ph.c_custkey, count(*) AS h
         FROM ph JOIN bloom USING (bit_pos) GROUP BY ph.c_custkey)
SELECT c.c_custkey,
       coalesce(hits.h, 0) = {BLOOM_K} AS maybe_present,
       hot.o_custkey IS NOT NULL AS actually_present
FROM customer c
LEFT JOIN hits ON hits.c_custkey = c.c_custkey
LEFT JOIN hot ON hot.o_custkey = c.c_custkey
"""


BLOOM_JOIN_PRICE = 450_000.0


def q_bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned join (operators/sketches.py:bloom_prune_join): the
    high-price orders sliver's key set compresses to one dense
    ``array<long>`` bitmap row that broadcasts; lineitem rows probe it
    map-side (``element_at`` + AND — O(1) per probe, codegen) and only
    possible matches reach the exact join.  Result is row-identical to
    the plain join — Bloom FPs die in the join, and no false negative
    exists — so the oracle is the UNPRUNED SQL join: the gate proves the
    prune is invisible.  The 100 TB case is a big-big join where the
    dim sliver can't broadcast as a hash set but its fixed-size bitmap
    can: the fact's non-matching majority never reaches the exchange.
    Sizing matters: bits must scale with the dim key count (~15k keys
    at sf0.1 here; 2^20 bits → FP ≈ 1e-5, a 128 KB broadcast) — an
    undersized filter saturates and prunes nothing while staying
    correct, the silent failure mode of every Bloom deployment."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_extendedprice",
        "l_discount",
    )
    hot = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > BLOOM_JOIN_PRICE
    ).select("o_orderkey", "o_orderpriority")
    joined = sketches.bloom_prune_join(
        li, hot, "o_orderkey", k=4, bits=1 << 20
    )
    return joined.groupBy("o_orderpriority").agg(
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100,
                0,
            ).cast("long")
        ).alias("revenue_cents"),
        F.count(F.lit(1)).cast("long").alias("n_lineitems"),
    )


SQL_BLOOM_PRUNE_JOIN = f"""
SELECT o_orderpriority,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                 AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE o_totalprice > {BLOOM_JOIN_PRICE}
GROUP BY o_orderpriority
"""


EWMA_ALPHA = 0.1


def q_ewma_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially weighted moving average of event values —
    the ordered-fold form (operators/features.py:ewma_features): stable
    at any history length, one entity-keyed shuffle, no UDF. The oracle
    is DuckDB's ``list_reduce`` over the same (ts, event_id) order."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").alias("event_timestamp"),
        "event_id",
        "value",
    )
    return features.ewma_features(
        ev,
        ["user_id"],
        "value",
        ts_col="event_timestamp",
        seq_col="event_id",
        alpha=EWMA_ALPHA,
    )


SQL_EWMA = f"""
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       round(list_reduce(
         list(value ORDER BY CAST(ts AS TIMESTAMP), event_id)::DOUBLE[],
         (a, b) -> a * {1.0 - EWMA_ALPHA} + b * {EWMA_ALPHA}), 6) AS ewma
FROM events GROUP BY user_id
"""

ROLLUP_SPLIT = "2024-01-15 00:00:00"


def q_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: rollup(events < T) ⊎
    rollup(events ≥ T) == rollup(all), via the mergeable count/sum/min/
    max/last-ts algebra (operators/features.py:mergeable_rollup,
    merge_rollups). The delta aggregate is map-side combined and the
    merge shuffles rollup rows, not events — at 100 TB the saved work
    is the historical re-scan. The oracle computes the full rollup
    directly, so the hash match *proves* the merge algebra exact."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.col("ts").alias("event_timestamp"),
        "value",
    )
    split = F.lit(ROLLUP_SPLIT).cast("timestamp")
    keys = ["user_id", "event_type"]
    old = features.mergeable_rollup(
        ev.where(F.col("event_timestamp") < split), keys, "value"
    )
    delta = features.mergeable_rollup(
        ev.where(F.col("event_timestamp") >= split), keys, "value"
    )
    merged = features.merge_rollups(keys, old, delta)
    return merged.select(
        "user_id",
        "event_type",
        "n_events",
        "sum_cents",
        "min_cents",
        "max_cents",
        F.unix_micros("last_ts").alias("last_ts_us"),
    )


SQL_ROLLUP_MERGE = """
SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents,
       CAST(min(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS min_cents,
       CAST(max(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS max_cents,
       epoch_us(max(CAST(ts AS TIMESTAMP))) AS last_ts_us
FROM events GROUP BY user_id, event_type
"""

BOILER_MIN_DOCS = 3
BOILER_MAX_RATIO = 0.3


def q_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level boilerplate screen: fraction of each document's
    distinct 3-grams that occur in ≥ 3 documents; docs above the ratio
    are dropped (operators/text.py:boilerplate_ngrams — two compact-key
    exchanges, text never shuffles, no collected boilerplate set)."""
    docs = load_table(spark, sf_dir, "documents")
    return text.boilerplate_ngrams(
        docs,
        n=3,
        min_docs=BOILER_MIN_DOCS,
        max_ratio=BOILER_MAX_RATIO,
    )


SQL_BOILERPLATE = f"""
WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
sh AS (SELECT doc_id,
        list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                       FOR i IN range(1, len(t) - 1)]) AS s
       FROM toks WHERE len(t) >= 3),
ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
dfreq AS (SELECT shingle, count(*) AS df FROM ex GROUP BY shingle),
per AS (SELECT e.doc_id, count(*) AS n_ngrams,
               sum(CASE WHEN d.df >= {BOILER_MIN_DOCS} THEN 1 ELSE 0 END)
                 AS n_boiler
        FROM ex e JOIN dfreq d USING (shingle) GROUP BY e.doc_id)
SELECT doc_id, CAST(n_ngrams AS BIGINT) AS n_ngrams,
       CAST(n_boiler AS BIGINT) AS n_boiler,
       round(n_boiler / CAST(n_ngrams AS DOUBLE), 6) AS boiler_ratio,
       round(n_boiler / CAST(n_ngrams AS DOUBLE), 6) <= {BOILER_MAX_RATIO}
         AS kept
FROM per
"""

SEMDEDUP_TAU = 0.2


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): within each embedding cluster, drop
    vectors whose cosine to a higher-ranked member ≥ τ; rank is
    cosine-to-centroid desc. Pairwise work only within clusters — the
    clustering is what keeps it sub-quadratic at 100 TB
    (operators/similarity.py:semdedup)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.semdedup(emb, threshold=SEMDEDUP_TAU)
    return out.select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        "cos_centroid",
        "kept",
    )


SQL_SEMDEDUP = f"""
WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
ex AS (SELECT label, u.dim AS dim, u.val AS val
       FROM embeddings,
            LATERAL (SELECT unnest(embedding::DOUBLE[]) AS val,
                            generate_subscripts(embedding, 1) AS dim) AS u),
cent AS (SELECT label, list(round(mv, 6) ORDER BY dim) AS c
         FROM (SELECT label, dim, avg(val) AS mv
               FROM ex GROUP BY label, dim)
         GROUP BY label),
sc AS (SELECT v.vec_id, v.label, v.e,
              round({_DOT}(v.e, cent.c)
                    / (sqrt({_DOT}(v.e, v.e)) * sqrt({_DOT}(cent.c, cent.c))),
                    6) AS cos_centroid
       FROM v JOIN cent USING (label)),
rk AS (SELECT *, row_number() OVER (PARTITION BY label
         ORDER BY cos_centroid DESC, vec_id ASC) AS r FROM sc),
drp AS (SELECT DISTINCT b.vec_id
        FROM rk a JOIN rk b ON a.label = b.label AND a.r < b.r
        WHERE round({_DOT}(a.e, b.e)
                    / (sqrt({_DOT}(a.e, a.e)) * sqrt({_DOT}(b.e, b.e))), 6)
              >= {SEMDEDUP_TAU})
SELECT rk.vec_id, CAST(rk.label AS BIGINT) AS label, rk.cos_centroid,
       (drp.vec_id IS NULL) AS kept
FROM rk LEFT JOIN drp ON rk.vec_id = drp.vec_id
"""


PR_OFFSET = 10_000_000  # disjoint node-id namespaces for parts/suppliers


def q_stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous top-k under a stream (§2.6): per-user running counts as
    a complete-mode streaming aggregate (bounded state: one counter per
    key), then the top-10 ranked from the sink — the streaming twin of
    the Misra-Gries heavy-hitters query, hash-matched to the same exact
    oracle."""
    stream = _events_stream(spark, sf_dir).select("user_id")
    counts = stream.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    out = _stream_to_table(spark, counts, "complete", "stream_topk")
    return out.orderBy(F.col("cnt").desc(), F.col("user_id").asc()).limit(
        HH_K
    )


FUZZY_MAX_DF = 50


def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution by blocked fuzzy matching over customer names:
    discriminative char-3-gram blocking (stop-grams like the shared
    "Customer#" prefix drop at df>50) + exact Levenshtein ≤ 1 verify on
    candidates only — sub-quadratic by the df cap, never all-pairs
    (operators/joins.py:fuzzy_match)."""
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_custkey") % 3 == 0
    )
    return joins.fuzzy_match(
        cust, "c_custkey", "c_name", q=3, max_df=FUZZY_MAX_DF,
        max_distance=1,
    )


SNM_WINDOW = 5
SNM_BLOCK_CHARS = 10


def q_fuzzy_match_snm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood entity resolution over the same customer
    names (operators/joins.py:sorted_neighborhood_match): blocked
    prefix partitions sort in PARALLEL (never a global single-task
    rank), candidates are rank-offset ≤ window pairs, Levenshtein ≤ 1
    verify — the complementary blocking strategy to q-gram fuzzy_match
    (finds prefix-sharing pairs whose grams are all stop-grams; misses
    cross-block pairs, remedied multi-pass in production)."""
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_custkey") % 3 == 0
    )
    return joins.sorted_neighborhood_match(
        cust, "c_custkey", "c_name", window=SNM_WINDOW,
        max_distance=1, block_chars=SNM_BLOCK_CHARS,
    )


SQL_FUZZY_SNM = f"""
WITH base AS (SELECT c_custkey AS id, c_name AS name,
                     substr(c_name, 1, {SNM_BLOCK_CHARS}) AS blk
              FROM customer WHERE c_custkey % 3 = 0),
rk AS (SELECT id, name, blk,
              row_number() OVER (PARTITION BY blk ORDER BY name, id) AS rn
       FROM base),
cand AS (
  SELECT DISTINCT
         least(a.id, b.id) AS id_a, greatest(a.id, b.id) AS id_b,
         CASE WHEN a.id < b.id THEN a.name ELSE b.name END AS name_a,
         CASE WHEN a.id < b.id THEN b.name ELSE a.name END AS name_b
  FROM rk a JOIN rk b
    ON a.blk = b.blk AND b.rn > a.rn AND b.rn <= a.rn + {SNM_WINDOW})
SELECT id_a, id_b, name_a, name_b,
       CAST(levenshtein(name_a, name_b) AS INTEGER) AS distance
FROM cand WHERE levenshtein(name_a, name_b) <= 1
"""


SQL_FUZZY = f"""
WITH base AS (SELECT c_custkey AS id, c_name AS name FROM customer
              WHERE c_custkey % 3 = 0),
g AS (SELECT id, name,
             unnest(list_distinct([name[i:i+2]
                    FOR i IN range(1, len(name) - 1)])) AS gram
      FROM base),
dfr AS (SELECT gram, count(*) AS df FROM g GROUP BY gram),
k AS (SELECT g.* FROM g JOIN dfr USING (gram) WHERE dfr.df <= {FUZZY_MAX_DF}),
cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
                a.name AS name_a, b.name AS name_b
         FROM k a JOIN k b ON a.gram = b.gram AND a.id < b.id)
SELECT id_a, id_b, name_a, name_b,
       CAST(levenshtein(name_a, name_b) AS INTEGER) AS distance
FROM cand WHERE levenshtein(name_a, name_b) <= 1
"""


def q_calendar_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar feature projection (the feature-store staple): day-of-
    week / hour / day / month / weekend flag per event — one pure
    codegen projection, zero shuffles; dow is pinned to the ISO-agnostic
    1=Sunday convention on both engines."""
    ev = load_table(spark, sf_dir, "events")
    ts = F.col("ts")
    return ev.select(
        "event_id",
        F.unix_micros(ts).alias("ts_us"),
        F.dayofweek(ts).alias("dow"),
        F.hour(ts).alias("hour"),
        F.dayofmonth(ts).alias("day"),
        F.month(ts).alias("month"),
        F.dayofweek(ts).isin(1, 7).alias("is_weekend"),
    )


SQL_CALENDAR = """
SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
       CAST(dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS INTEGER) AS dow,
       CAST(hour(CAST(ts AS TIMESTAMP)) AS INTEGER) AS hour,
       CAST(day(CAST(ts AS TIMESTAMP)) AS INTEGER) AS day,
       CAST(month(CAST(ts AS TIMESTAMP)) AS INTEGER) AS month,
       dayofweek(CAST(ts AS TIMESTAMP)) IN (0, 6) AS is_weekend
FROM events
"""


CLEAN_MIN_Q = 0.55


def q_stream_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed streaming corpus intake under the gate (§2.6): the
    documents table replayed as a stream through quality gate → PII
    scrub → watermark-bounded exact dedup
    (streaming/ingest.py:stream_clean_ingest). The output is keyed by
    CONTENT (fingerprint + scrubbed-text md5), never doc_id, so the row
    set is identical no matter which copy of a duplicate survives the
    first-arrival dedup — the oracle is the batch DISTINCT of the same
    gated projection."""
    import tempfile

    from feast_java_old_spark.operators.text import fingerprint
    from feast_java_old_spark.streaming.ingest import stream_clean_ingest

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.make_interval(mins=F.col("doc_id").cast("int"))
        ).alias("event_timestamp"),
    )
    src = tempfile.mkdtemp(prefix="fjos_cleansrc_")
    docs.orderBy("doc_id").coalesce(1).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    cleaned = stream_clean_ingest(stream, min_quality=CLEAN_MIN_Q)
    out = _stream_to_table(spark, cleaned, "append", "stream_clean_corpus")
    return out.select(
        fingerprint(F.col("text")).alias("fp"),
        F.md5(F.col("text")).alias("scrub_md5"),
    ).distinct()


SQL_STREAM_CLEAN = """
WITH b AS (
  SELECT doc_id, text,
         length(text) AS n_chars,
         len(string_split(lower(text), ' ')) AS n_tokens,
         len(list_filter(string_split(lower(text), ' '),
             t -> list_contains({stoplist}, t))) AS n_stop,
         length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))
           AS n_alnum_space
  FROM documents),
g AS (SELECT doc_id, text FROM b
      WHERE round(least(n_tokens / 50.0, 1.0) * 0.5
             + least((n_stop / n_tokens) * 5.0, 1.0) * 0.3
             + (1.0 - least(((n_chars - n_alnum_space) / n_chars)
                            * 10.0, 1.0)) * 0.2, 6) >= {min_q}),
s AS (SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(text, '{email}', '[EMAIL]', 'g'),
                   '{ssn}', '[SSN]', 'g'),
                 '{phone}', '[PHONE]', 'g'),
               '{ipv4}', '[IPV4]', 'g') AS text
      FROM g)
SELECT DISTINCT
       md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp,
       md5(text) AS scrub_md5
FROM s
"""


def q_stream_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental ingestion dedup (§2.6): the incoming batch
    replays as a LIVE stream whose rows probe the static, persisted LSH
    index of the existing corpus — candidate generation is a stateless
    per-row projection + stream-static joins, verification is row-wise
    exact set intersection, and ONE stateful aggregate (duplicate-immune
    min/max + in-expression distinct) finalizes each document
    (streaming/ingest.py:stream_incremental_dedup). Same contract and
    SAME ORACLE as the batch dedup_incremental — proving the streaming
    arm computes the identical answer."""
    import tempfile

    from feast_java_old_spark.streaming.ingest import stream_incremental_dedup

    docs = load_table(spark, sf_dir, "documents")
    batch = docs.where(F.col("doc_id") % INC_BATCH_MOD == 0).select(
        "doc_id",
        "text",
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.make_interval(mins=F.col("doc_id").cast("int"))
        ).alias("event_timestamp"),
    )
    index = docs.where(F.col("doc_id") % INC_BATCH_MOD != 0)
    src = tempfile.mkdtemp(prefix="fjos_incsrc_")
    batch.orderBy("doc_id").coalesce(1).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = stream_incremental_dedup(
        stream, index, k=MINHASH_K, bands=MINHASH_BANDS, n=3,
        threshold=VERIFY_THRESHOLD,
    )
    return _stream_to_table(
        spark, out, "complete", "stream_incremental_dedup"
    ).select("doc_id", "dup_of", "best_jaccard", "n_dups", "is_new")


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two power iterations of PageRank over the undirected part↔supplier
    graph from lineitem — curation-weighting importance propagation
    (operators/graph.py:pagerank): per iteration one edge shuffle keyed
    by src + one aggregate keyed by dst; ranks rounded per iteration so
    double summation order can't drift engines apart."""
    from feast_java_old_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem")
    fwd = li.select(
        F.col("l_partkey").alias("src"),
        (F.col("l_suppkey") + PR_OFFSET).alias("dst"),
    )
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return pagerank(edges, iterations=2).select(
        F.col("node").cast("long").alias("node"),
        "pagerank",
        F.col("outdeg").cast("long").alias("outdeg"),
    )


SQL_PAGERANK = f"""
WITH f AS (SELECT DISTINCT l_partkey AS src,
                  l_suppkey + {PR_OFFSET} AS dst FROM lineitem),
e AS (SELECT src, dst FROM f UNION SELECT dst, src FROM f),
nodes AS (SELECT DISTINCT src AS node FROM e
          UNION SELECT DISTINCT dst FROM e),
od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
c1 AS (SELECT e.dst, sum(1.0 / od.outdeg) AS cin
       FROM e JOIN od USING (src) GROUP BY e.dst),
pr1 AS MATERIALIZED (SELECT n.node, round(0.15 + 0.85 * coalesce(c1.cin, 0), 9) AS pr
        FROM nodes n LEFT JOIN c1 ON c1.dst = n.node),
c2 AS (SELECT e.dst, sum(pr1.pr / od.outdeg) AS cin
       FROM e JOIN od USING (src) JOIN pr1 ON pr1.node = e.src
       GROUP BY e.dst),
pr2 AS (SELECT n.node, round(0.15 + 0.85 * coalesce(c2.cin, 0), 9) AS pr
        FROM nodes n LEFT JOIN c2 ON c2.dst = n.node)
SELECT CAST(pr2.node AS BIGINT) AS node, round(pr2.pr, 6) AS pagerank,
       CAST(coalesce(od.outdeg, 0) AS BIGINT) AS outdeg
FROM pr2 LEFT JOIN od ON od.src = pr2.node
"""


TRI_MIN_COOCCUR = 2  # parts must share >= 2 orders to form an edge


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-ordered triangle counting (operators/graph.py:
    triangle_count) over the part co-occurrence graph: parts sharing
    >= TRI_MIN_COOCCUR orders are connected. The orientation bounds
    wedge enumeration by the SMALLEST-degree vertex of each triangle —
    O(m^1.5) worst case, near-linear on power-law graphs — so a hub
    node never fans out its full neighbor-pair set. Triadic structure
    is the standard community/cohesion signal for curation graphs."""
    from feast_java_old_spark.operators.graph import triangle_count

    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select("l_orderkey", "l_partkey").distinct()
    a = pairs.alias("a")
    b = pairs.alias("b")
    edges = (
        a.join(
            b,
            on=[
                F.col("a.l_orderkey") == F.col("b.l_orderkey"),
                F.col("a.l_partkey") < F.col("b.l_partkey"),
            ],
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") >= TRI_MIN_COOCCUR)
        .select("src", "dst")
    )
    return triangle_count(edges).select(
        F.col("node").cast("long").alias("node"),
        F.col("degree").cast("long").alias("degree"),
        F.col("triangles").cast("long").alias("triangles"),
    )


SQL_TRIANGLE_COUNT = f"""
WITH s AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e0 AS (SELECT a.l_partkey AS a, b.l_partkey AS b, count(*) AS n
       FROM s a JOIN s b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       GROUP BY 1, 2),
e AS (SELECT a, b FROM e0 WHERE n >= {TRI_MIN_COOCCUR}),
deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree
        FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
        GROUP BY node),
t AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1
      JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
      JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
pn AS (SELECT node, CAST(count(*) AS BIGINT) AS triangles
       FROM (SELECT x AS node FROM t UNION ALL SELECT y FROM t
             UNION ALL SELECT z FROM t)
       GROUP BY node)
SELECT CAST(deg.node AS BIGINT) AS node, deg.degree,
       CAST(coalesce(pn.triangles, 0) AS BIGINT) AS triangles
FROM deg LEFT JOIN pn ON pn.node = deg.node
"""


def q_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows under a live stream (§2.6): native
    ``session_window`` sessions merge in the state store as events
    arrive; bounded input in complete mode equals the batch
    sessionization, so the oracle is the same lag/cumsum SQL as A5
    (streaming/ingest.py:stream_session_features)."""
    stream = _events_stream(spark, sf_dir).select(
        "user_id", "event_timestamp", F.col("value")
    )
    agg = (
        stream.withWatermark("event_timestamp", "1 hour")
        .groupBy(
            F.col("user_id"),
            F.session_window("event_timestamp", "30 minutes").alias("__w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.round(F.col("value") * 100, 0).cast("long")
            ).alias("sum_value_cents"),
            F.min("event_timestamp").alias("__min_ts"),
            F.max("event_timestamp").alias("__max_ts"),
        )
    )
    out = _stream_to_table(spark, agg, "complete", "stream_sessions")
    return out.select(
        F.unix_micros("__min_ts").alias("session_start_us"),
        "user_id",
        "n_events",
        "sum_value_cents",
        (F.unix_micros("__max_ts") - F.unix_micros("__min_ts")).alias(
            "span_us"
        ),
    )


SEQ_MAX_LEN = 50


def q_user_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered behavior sequences truncated to the most recent
    50 events — the training-example shape for next-event-prediction /
    session-recommendation models; one entity-keyed shuffle into the
    shared ordered-gather kernel (operators/features.py:event_sequences).
    The sequence rides as a comma-joined string for engine-portable
    hashing."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").alias("event_timestamp"),
        "event_id",
        "event_type",
    )
    out = features.event_sequences(
        ev, ["user_id"], "event_type", seq_col="event_id",
        max_len=SEQ_MAX_LEN,
    )
    return out.select(
        "user_id",
        "n_events",
        F.concat_ws(",", F.col("sequence")).alias("seq_str"),
    )


SQL_USER_SEQ = f"""
WITH s AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         list(event_type ORDER BY CAST(ts AS TIMESTAMP), event_id) AS l
  FROM events GROUP BY user_id)
SELECT user_id, n_events,
       array_to_string(
         l[greatest(len(l) - {SEQ_MAX_LEN} + 1, 1):len(l)], ',') AS seq_str
FROM s
"""

NEG_K = 4
NEG_SEED = 7


def q_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uniform negative sampling for contrastive training:
    each (supplier, part) positive fans into k hash-drawn candidate
    parts; accidental positives are flagged by a (user, candidate) join,
    never resampled (operators/curation.py:negative_samples)."""
    li = load_table(spark, sf_dir, "lineitem")
    positives = li.where(F.col("l_partkey") % 50 == 0).select(
        F.col("l_suppkey").alias("user"),
        F.col("l_partkey").alias("item"),
    )
    n_items = load_table(spark, sf_dir, "part").count()
    return curation.negative_samples(
        positives, "user", "item", n_items=n_items, k=NEG_K, seed=NEG_SEED
    )


SQL_NEG_SAMPLES = f"""
WITH p AS (SELECT DISTINCT l_suppkey AS user, l_partkey AS pos_item
           FROM lineitem WHERE l_partkey % 50 = 0),
np AS (SELECT count(*) AS n FROM part),
slots AS (SELECT p.user, p.pos_item, s.slot
          FROM p, (SELECT unnest(range(0, {NEG_K})) AS slot) s),
cand AS (
  SELECT user, pos_item, CAST(slot AS BIGINT) AS slot,
         ('0x' || substr(md5(user::VARCHAR || ':' || pos_item::VARCHAR
                             || ':' || slot::VARCHAR || ':{NEG_SEED}'),
                  1, 15))::BIGINT % np.n + 1 AS neg_item
  FROM slots CROSS JOIN np)
SELECT c.user, c.pos_item, c.slot, c.neg_item,
       (p2.user IS NOT NULL) AS is_false_negative
FROM cand c
LEFT JOIN p p2 ON p2.user = c.user AND p2.pos_item = c.neg_item
"""


LBB_BATCH = 8


def q_length_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch assignment (padding-efficient dynamic
    batching): power-of-2 length buckets, fixed-size batches in id order
    within each bucket, parallel per-bucket rank windows
    (operators/text.py:length_bucket_batches)."""
    docs = load_table(spark, sf_dir, "documents")
    return text.length_bucket_batches(docs, batch_size=LBB_BATCH)


SQL_LENGTH_BATCHES = f"""
WITH b AS (
  SELECT doc_id,
         CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
  FROM documents),
k AS (SELECT doc_id, n_tokens,
             CAST(floor(log2(greatest(n_tokens, 1))) AS BIGINT)
               AS len_bucket
      FROM b)
SELECT doc_id, n_tokens, len_bucket,
       len_bucket * {1 << 40}
         + CAST(floor((row_number() OVER (PARTITION BY len_bucket
                        ORDER BY doc_id) - 1) / {LBB_BATCH}) AS BIGINT)
         AS batch_id,
       max(n_tokens) OVER (PARTITION BY len_bucket) AS pad_to
FROM k
"""


PMI_MIN_COUNT = 5
PMI_K = 50


def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k bigram collocations by PMI (phrase detection for tokenizer /
    vocab construction): one corpus pass into the bigram-count model;
    marginals and the total derive from the vocab-sized model table;
    distributed TakeOrdered top-k (operators/text.py:pmi_collocations)."""
    docs = load_table(spark, sf_dir, "documents")
    return text.pmi_collocations(
        docs, min_count=PMI_MIN_COUNT, k=PMI_K
    )


SQL_PMI = f"""
WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
bi AS (SELECT unnest([t[i] || ' ' || t[i+1]
                      FOR i IN range(1, len(t))]) AS bg
       FROM toks),
m AS (SELECT bg, count(*) AS np FROM bi GROUP BY bg),
l AS (SELECT split_part(bg, ' ', 1) AS w, sum(np) AS nl FROM m GROUP BY 1),
r AS (SELECT split_part(bg, ' ', 2) AS w, sum(np) AS nr FROM m GROUP BY 1),
tt AS (SELECT sum(np) AS n FROM m)
SELECT m.bg AS bigram, CAST(m.np AS BIGINT) AS n_pair,
       CAST(l.nl AS BIGINT) AS n_left, CAST(r.nr AS BIGINT) AS n_right,
       round(ln(CAST(tt.n AS DOUBLE) * m.np / (l.nl * r.nr)), 6) AS pmi
FROM m
JOIN l ON l.w = split_part(m.bg, ' ', 1)
JOIN r ON r.w = split_part(m.bg, ' ', 2)
CROSS JOIN tt
WHERE m.np >= {PMI_MIN_COUNT}
ORDER BY pmi DESC, bigram ASC LIMIT {PMI_K}
"""


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot delta between two crawls (added / removed /
    changed / unchanged) — one full-outer join over (id, fingerprint)
    projections; text reduces to md5 at the scan and never shuffles
    (operators/curation.py:snapshot_diff). The 'new' crawl derives
    deterministically from documents: %17 removed, %13 re-crawled with
    extra content, %29 re-ingested under a new id."""
    docs = load_table(spark, sf_dir, "documents")
    new = (
        docs.where(F.col("doc_id") % 17 != 0)
        .select(
            "doc_id",
            F.when(
                (F.col("doc_id") % 13 == 0),
                F.concat(F.col("text"), F.lit(" delta")),
            ).otherwise(F.col("text")).alias("text"),
        )
        .unionByName(
            docs.where(F.col("doc_id") % 29 == 0).select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
            )
        )
    )
    return curation.snapshot_diff(docs, new)


SQL_SNAPSHOT_DIFF = """
WITH fp AS (SELECT doc_id,
                   md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
                     AS f,
                   text
            FROM documents),
n AS (
  SELECT doc_id,
         md5(regexp_replace(trim(lower(
           CASE WHEN doc_id % 13 = 0 THEN text || ' delta' ELSE text END
         )), '\\s+', ' ', 'g')) AS f
  FROM fp WHERE doc_id % 17 != 0
  UNION ALL
  SELECT doc_id + 1000000, f FROM fp WHERE doc_id % 29 = 0)
SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN o.f = n.f THEN 'unchanged'
            ELSE 'changed' END AS status
FROM fp o FULL OUTER JOIN n ON o.doc_id = n.doc_id
"""


def q_scd2_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension enrichment: every event joins the SCD2
    version valid at its own timestamp (state-as-of-the-event) — hash
    equi-join on the entity key with the interval predicate as residual
    (operators/features.py:scd2_join)."""
    ev = load_table(spark, sf_dir, "events")
    hist = features.scd2_history(
        ev, ["user_id"], ["event_type"], ts_col="ts", id_col="event_id"
    )
    facts = ev.select("user_id", F.col("ts").alias("event_timestamp"), "event_id")
    out = features.scd2_join(
        facts, hist, ["user_id"], fact_ts="event_timestamp"
    )
    return out.select(
        F.col("f.user_id").alias("user_id"),
        F.col("f.event_id").alias("event_id"),
        F.unix_micros("f.event_timestamp").alias("ts_us"),
        F.col("h.event_type").alias("state_event_type"),
        F.col("h.version").alias("version"),
    )


SQL_SCD2_JOIN = """
WITH o AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type,
         lag(event_type) OVER w AS prev,
         row_number() OVER w AS rn
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
c AS (SELECT * FROM o WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
h AS (SELECT user_id, event_type, ts AS vf, lead(ts) OVER w2 AS vt,
             CAST(row_number() OVER w2 AS BIGINT) AS version
      FROM c
      WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT e.user_id, e.event_id,
       epoch_us(CAST(e.ts AS TIMESTAMP)) AS ts_us,
       h.event_type AS state_event_type, h.version
FROM events e
JOIN h ON e.user_id = h.user_id
      AND CAST(e.ts AS TIMESTAMP) >= h.vf
      AND (h.vt IS NULL OR CAST(e.ts AS TIMESTAMP) < h.vt)
"""

TB_BUDGET = 25_000


def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-token-budget selection: best-quality-first greedy prefix via
    a distributed prefix sum over the quality order (per-bucket subtotals
    + driver prefix + parallel within-bucket windows — never a global
    single-task window) (operators/curation.py:token_budget_select)."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "__q", text.text_stat_cols()["quality_score"]
    )
    return curation.token_budget_select(
        docs, "__q", TB_BUDGET
    ).select("doc_id", "n_tokens", "cum_tokens", "selected")


SQL_TOKEN_BUDGET = f"""
WITH b AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(string_split(lower(text), ' ')) AS n_tokens,
         len(list_filter(string_split(lower(text), ' '),
             t -> list_contains({{stoplist}}, t))) AS n_stop,
         length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))
           AS n_alnum_space
  FROM documents),
q AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
             round(least(n_tokens / 50.0, 1.0) * 0.5
                   + least((n_stop / n_tokens) * 5.0, 1.0) * 0.3
                   + (1.0 - least(((n_chars - n_alnum_space) / n_chars)
                                  * 10.0, 1.0)) * 0.2, 6) AS qs
      FROM b),
c AS (SELECT doc_id, n_tokens,
             CAST(sum(n_tokens) OVER (ORDER BY qs DESC, doc_id ASC
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      FROM q)
SELECT doc_id, n_tokens, cum_tokens, cum_tokens <= {TB_BUDGET} AS selected
FROM c
"""


TOPO_K = 10


def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped shipping-priority query: segment-filtered
    customers broadcast into orders, unshipped-revenue aggregate over
    lineitem, distributed top-k. Plan at 100 TB: both filters sit at the
    scans (date predicates pushed to parquet), the dim join is a
    broadcast, the aggregate shuffles (orderkey, partial sum) only, and
    the global top-10 is TakeOrderedAndProject — per-partition k rows to
    the driver, never a full sort."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100,
                    0,
                ).cast("long")
            ).alias("revenue_cents")
        )
        .select(
            "l_orderkey",
            F.unix_micros("o_orderdate").alias("orderdate_us"),
            "o_orderpriority",
            "revenue_cents",
        )
        .orderBy(F.col("revenue_cents").desc(), F.col("l_orderkey").asc())
        .limit(TOPO_K)
    )


SQL_TOP_ORDERS = f"""
SELECT l_orderkey,
       epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS orderdate_us,
       o_orderpriority,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND CAST(o_orderdate AS TIMESTAMP) < TIMESTAMP '1995-03-15'
  AND CAST(l_shipdate AS TIMESTAMP) > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_cents DESC, l_orderkey ASC
LIMIT {TOPO_K}
"""


K_ANON = 5


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-governance audit: equivalence-class sizes over a
    quasi-identifier combination (nation, segment, balance band) with the
    k=5 release floor — one map-side-combined aggregate, full rows never
    shuffle (operators/pii.py:k_anonymity)."""
    from feast_java_old_spark.operators.pii import k_anonymity

    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 2000).cast("long").alias("balance_band"),
    )
    return k_anonymity(
        cust, ["c_nationkey", "c_mktsegment", "balance_band"], k=K_ANON
    )


SQL_K_ANON = f"""
SELECT c_nationkey, c_mktsegment,
       CAST(floor(c_acctbal / 2000) AS BIGINT) AS balance_band,
       CAST(count(*) AS BIGINT) AS class_size,
       count(*) >= {K_ANON} AS anonymous
FROM customer GROUP BY 1, 2, 3
"""


def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM quality scoring with add-k smoothing (CCNet-style, one
    step past the unigram filter): shuffle-free bigram explode, two
    vocab-sized count models broadcast back, per-doc mean shuffles only
    (doc, partial sum) (operators/text.py:bigram_logprob)."""
    docs = load_table(spark, sf_dir, "documents")
    return text.bigram_logprob(docs, add_k=0.5)


SQL_BIGRAM_LP = """
WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
bi AS (SELECT doc_id, unnest([t[i] || ' ' || t[i+1]
                              FOR i IN range(1, len(t))]) AS bg
       FROM toks),
cb AS (SELECT bg, count(*) AS cb FROM bi GROUP BY bg),
cc AS (SELECT split_part(bg, ' ', 1) AS ctx, count(*) AS cc
       FROM bi GROUP BY 1),
vs AS (SELECT count(DISTINCT split_part(bg, ' ', 2)) AS v FROM bi)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(ln((cb.cb + 0.5) / (cc.cc + 0.5 * vs.v))), 6) AS logprob
FROM bi
JOIN cb USING (bg)
JOIN cc ON cc.ctx = split_part(bi.bg, ' ', 1)
CROSS JOIN vs
GROUP BY doc_id
"""


ATTR_LOOKBACK_SECS = 2 * 86_400


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution
    (operators/windows.py:last_touch_attribution): every purchase is
    credited to the latest strictly-preceding click/view by the same
    user within a 2-day lookback — ONE entity-keyed window pass
    (last(when(touch), ignorenulls) over unbounded-preceding→-1), no
    self-join, no per-conversion scan; unattributed purchases kept with
    NULL touch columns.  Exact integer microseconds end-to-end."""
    ev = load_table(spark, sf_dir, "events")
    return windows.last_touch_attribution(
        ev,
        conversion_type="purchase",
        touch_types=["click", "view"],
        lookback_secs=ATTR_LOOKBACK_SECS,
    )


SQL_ATTRIBUTION = f"""
WITH carried AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
         last_value(CASE WHEN event_type IN ('click','view')
                         THEN event_id END IGNORE NULLS)
           OVER w AS t_id,
         last_value(CASE WHEN event_type IN ('click','view')
                         THEN event_type END IGNORE NULLS)
           OVER w AS t_type,
         last_value(CASE WHEN event_type IN ('click','view')
                         THEN epoch_us(ts) END IGNORE NULLS)
           OVER w AS t_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
SELECT user_id, event_id AS conversion_id, ts_us AS conversion_us,
       CASE WHEN ts_us - t_us <= CAST({ATTR_LOOKBACK_SECS} AS BIGINT) * 1000000
            THEN t_id END AS touch_id,
       CASE WHEN ts_us - t_us <= CAST({ATTR_LOOKBACK_SECS} AS BIGINT) * 1000000
            THEN t_type END AS touch_type,
       CASE WHEN ts_us - t_us <= CAST({ATTR_LOOKBACK_SECS} AS BIGINT) * 1000000
            THEN ts_us - t_us END AS touch_age_us
FROM carried
WHERE event_type = 'purchase'
"""


GAP_MIN_SECS = 6 * 3600


def q_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user feed-silence report
    (operators/features.py:event_gaps): consecutive-event gaps ≥ 6 h —
    the data-driven monitor for keys whose upstream silently stopped
    emitting (which corrupts every downstream as-of join).  One
    entity-keyed deterministic lead() window + a codegen filter; gap
    bounds are exact integer microseconds."""
    ev = load_table(spark, sf_dir, "events")
    return features.event_gaps(ev, min_gap_secs=GAP_MIN_SECS)


SQL_EVENT_GAPS = f"""
WITH seq AS (
  SELECT user_id, epoch_us(ts) AS gap_start_us,
         epoch_us(lead(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id)) AS gap_end_us
  FROM events)
SELECT user_id, gap_start_us, gap_end_us,
       gap_end_us - gap_start_us AS gap_us
FROM seq
WHERE gap_end_us - gap_start_us >= CAST({GAP_MIN_SECS} AS BIGINT) * 1000000
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user next-event Markov transitions
    (operators/windows.py:event_transitions): one entity-keyed window
    with a deterministic (ts, event_id) order — timestamp ties are real
    in this data, and an untied lead() silently yields
    partition-dependent pairs — then a |types|²-bounded aggregate.
    Cross-user pairs never form (the window partition is the fence)."""
    ev = load_table(spark, sf_dir, "events")
    return windows.event_transitions(ev)


SQL_EVENT_TRANSITIONS = """
WITH pairs AS (
  SELECT event_type AS prev_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events)
SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n,
       round(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY prev_type), 6)
         AS prob
FROM pairs WHERE next_type IS NOT NULL
GROUP BY prev_type, next_type
"""


def q_stream_zone_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming zone-map maintenance — the Iceberg/Delta manifest-stats
    pattern on the INGEST path: as micro-batches arrive, per-file
    min/max/count zone maps update incrementally (complete-mode
    aggregate; state is exactly one row per file — bounded metadata,
    never data), so the skip index of q_zone_map_prune is always
    current without a full recompute.  Bounded availableNow run; the
    oracle is the batch stats SQL — streaming aggregate semantics equal
    batch semantics on bounded input, proving the ingest-time and
    rebuild-time manifests interchange."""
    import os
    import tempfile
    import uuid

    from feast_java_old_spark.operators import layout

    d = tempfile.mkdtemp(prefix="fjos_zm_src_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/lineitem.parquet"),
        os.path.join(d, "lineitem.parquet"),
    )
    schema = spark.read.parquet(d).schema
    stream = spark.readStream.schema(schema).parquet(d).select(
        (
            F.conv(
                F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 7),
                16,
                10,
            ).cast("long")
            % 64
        ).cast("int").alias("fid"),
        "l_extendedprice",
    )
    stats = layout.zone_map_stats(stream, "fid", ["l_extendedprice"])
    name = f"szm_{uuid.uuid4().hex[:8]}"
    try:
        with _small_shuffle(spark):
            q = (
                stats.writeStream.format("memory")
                .queryName(name)
                .outputMode("complete")
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(600):
                q.stop()
                raise TimeoutError("stream_zone_map did not finish in 600s")
    finally:
        # the memory sink holds the results; the staged source dir is
        # dead once the bounded stream terminates (r6 temp-leak advice)
        import shutil

        shutil.rmtree(d, ignore_errors=True)
    return spark.table(name).select(
        "file_id",
        "n_rows",
        F.col("min_l_extendedprice").alias("mn"),
        F.col("max_l_extendedprice").alias("mx"),
        F.col("nulls_l_extendedprice").alias("n_nulls"),
    )


SQL_STREAM_ZONE_MAP = """
SELECT CAST(CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 7))
            AS BIGINT) % 64 AS INT) AS file_id,
       CAST(count(*) AS BIGINT) AS n_rows,
       min(l_extendedprice) AS mn,
       max(l_extendedprice) AS mx,
       CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_nulls
FROM lineitem
GROUP BY 1
"""


ZONE_LO, ZONE_HI = 30_000.0, 35_000.0


def q_zone_map_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map file skipping, audited in-engine
    (operators/layout.py:zone_map_stats/zone_map_prune): lineitem rows
    are assigned to 64 pseudo-files under two layouts — range-CLUSTERED
    on price (what layout_zorder/repartitionByRange produce) and HASHED
    on order key (what raw ingest produces) — then each layout's
    per-file min/max zone maps are pruned with the same price-range
    predicate.  Emits per layout: files scanned / files total / rows
    scanned / rows matched.  The clustered layout scans ~the predicate's
    value fraction; the hashed layout scans everything — the measured
    argument for paying a 100 TB layout rewrite, produced from
    metadata-sized stats rows before rewriting anything.  Superset
    guarantee inherited from the overlap rule: matched rows are never
    in a skipped file."""
    from feast_java_old_spark.operators import layout

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    mm = li.agg(
        F.min("l_extendedprice").alias("__lo"),
        F.max("l_extendedprice").alias("__hi"),
    )
    clustered = li.crossJoin(F.broadcast(mm)).select(
        F.least(
            F.lit(63),
            F.floor(
                (F.col("l_extendedprice") - F.col("__lo"))
                * 64.0
                / (F.col("__hi") - F.col("__lo"))
            ).cast("int"),
        ).alias("fid"),
        "l_extendedprice",
    )
    hashed = li.select(
        (
            F.conv(
                F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 7),
                16,
                10,
            ).cast("long")
            % 64
        ).cast("int").alias("fid"),
        "l_extendedprice",
    )
    matched = li.where(
        F.col("l_extendedprice").between(ZONE_LO, ZONE_HI)
    ).agg(F.count(F.lit(1)).cast("long").alias("rows_matched"))
    parts = []
    for name, frame in (("clustered", clustered), ("hashed", hashed)):
        stats = layout.zone_map_stats(frame, "fid", ["l_extendedprice"])
        pruned = layout.zone_map_prune(
            stats, "l_extendedprice", ZONE_LO, ZONE_HI
        )
        summary = (
            pruned.agg(
                F.count(F.lit(1)).cast("long").alias("files_scanned"),
                F.sum("n_rows").cast("long").alias("rows_scanned"),
            )
            .crossJoin(
                F.broadcast(
                    stats.agg(
                        F.count(F.lit(1)).cast("long").alias("files_total")
                    )
                )
            )
            .select(
                F.lit(name).alias("layout"),
                "files_total",
                "files_scanned",
                "rows_scanned",
            )
        )
        parts.append(summary)
    return (
        parts[0]
        .unionByName(parts[1])
        .crossJoin(F.broadcast(matched))
    )


SQL_ZONE_MAP_PRUNE = f"""
WITH mm AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
            FROM lineitem),
cl AS (SELECT LEAST(63, CAST(floor((l_extendedprice - lo) * 64.0 / (hi - lo))
                             AS INT)) AS fid, l_extendedprice
       FROM lineitem, mm),
hs AS (SELECT CAST(CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 7))
                        AS BIGINT) % 64 AS INT) AS fid, l_extendedprice
       FROM lineitem),
scl AS (SELECT fid, count(*) AS n, min(l_extendedprice) AS mn,
               max(l_extendedprice) AS mx FROM cl GROUP BY fid),
shs AS (SELECT fid, count(*) AS n, min(l_extendedprice) AS mn,
               max(l_extendedprice) AS mx FROM hs GROUP BY fid),
m AS (SELECT CAST(count(*) AS BIGINT) AS rows_matched FROM lineitem
      WHERE l_extendedprice BETWEEN {ZONE_LO} AND {ZONE_HI})
SELECT 'clustered' AS layout,
       CAST(count(*) AS BIGINT) AS files_total,
       CAST(count(*) FILTER (mx >= {ZONE_LO} AND mn <= {ZONE_HI})
            AS BIGINT) AS files_scanned,
       CAST(COALESCE(sum(n) FILTER (mx >= {ZONE_LO} AND mn <= {ZONE_HI}), 0)
            AS BIGINT) AS rows_scanned,
       (SELECT rows_matched FROM m) AS rows_matched
FROM scl
UNION ALL
SELECT 'hashed', CAST(count(*) AS BIGINT),
       CAST(count(*) FILTER (mx >= {ZONE_LO} AND mn <= {ZONE_HI}) AS BIGINT),
       CAST(COALESCE(sum(n) FILTER (mx >= {ZONE_LO} AND mn <= {ZONE_HI}), 0)
            AS BIGINT),
       (SELECT rows_matched FROM m)
FROM shs
"""


def q_global_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous global row numbers WITHOUT a single-partition sort
    (operators/layout.py:global_sort_ranks): the scale-correct form of
    ``row_number() OVER (ORDER BY ...)`` — Spark executes the naive
    global window as an Exchange to ONE partition holding the whole
    table.  Here: percentile_approx bucket boundaries (bounded driver
    scalars) → value-pure bucket assignment (equal keys can't straddle
    buckets) → per-bucket counts → cumulative offsets over ≤64 metadata
    rows → broadcast offset join + per-bucket row_number.  The oracle
    IS the naive global window — the gate proves the decomposition is
    invisible."""
    from feast_java_old_spark.operators.layout import global_sort_ranks

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars"
    )
    return global_sort_ranks(
        docs, "n_chars", tiebreak_cols=["doc_id"], buckets=64
    )


SQL_GLOBAL_RANKS = """
SELECT doc_id, n_chars,
       ROW_NUMBER() OVER (ORDER BY n_chars NULLS FIRST, doc_id) AS global_rank
FROM documents
"""


LOGREG_DIMS = 64
LOGREG_STEPS = 4
LOGREG_LR = 4.0
LOGREG_TARGET = "stream"
LOGREG_THR = 28


def q_logreg_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed logistic-regression training
    (operators/classify.py:logreg_train): a hashed bag-of-words
    classifier trained IN the engine by 4 full-batch gradient steps —
    each step ONE corpus-pass aggregate shuffling dims+2 partial rows,
    weights collected as bounded driver scalars and re-embedded as
    literals (the kmeans lineage-cut pattern).  Label: does the doc use
    the token 'stream' at > 2.8% frequency — a frequency rule the
    trainer must rediscover through 64 hashed centered features
    (~97% train accuracy in 4 steps).  Every arithmetic step is on an
    integer grid (per-mille features, micro-unit weights/residuals)
    with single-IEEE-op float crossings, so the DuckDB oracle unrolls
    the SAME 4 steps term for term and the final per-doc probabilities
    hash-match at 6dp.  The fastText/CCNet quality-filter shape."""
    toks = F.split(F.lower(F.col("text")), " ")
    freq = (
        F.size(F.filter(toks, lambda t: t == F.lit(LOGREG_TARGET)))
        * 1000.0
        / F.size(toks)
    )
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "y_hi", (freq > LOGREG_THR).cast("int")
    )
    # Training collects inside this frame, so the per-step shuffles
    # (and the persisted feature frame's layout) must not inherit the
    # driver session's 200-partition default — 200 tasks per stage per
    # step for a bounded feature table.
    with _small_shuffle(spark):
        w, b, m = classify.logreg_train(
            docs,
            "y_hi",
            dims=LOGREG_DIMS,
            steps=LOGREG_STEPS,
            lr=LOGREG_LR,
        )
    return classify.logreg_score(
        docs, w, b, m, "y_hi", dims=LOGREG_DIMS
    ).select(
        "doc_id",
        F.col("y").cast("int").alias("y"),
        "p",
        F.col("pred").cast("int").alias("pred"),
    )


def _logreg_sql_step(k: int) -> str:
    """CTE group for gradient step k ≥ 2 (step 1 is closed-form:
    w=0 → p=0.5 exactly).  Mirrors classify.logreg_train: centered
    gradient in exact BIGINTs, one double mult+div+round per dim."""
    p = k - 1
    return f"""
z{k} AS MATERIALIZED (SELECT y.doc_id, y.y,
         (COALESCE(s.s, 0) - (SELECT c FROM c{p}) + (SELECT b FROM b{p}) * 1000) / 1.0e9 AS z
         FROM y LEFT JOIN (SELECT doc_id, sum(w * x) AS s
                           FROM x JOIN w{p} USING (j) GROUP BY doc_id) s
         USING (doc_id)),
r{k} AS MATERIALIZED (SELECT doc_id, y, CAST(round((1.0 / (1.0 + exp(-z)) - y) * 1000000, 0) AS BIGINT) AS r FROM z{k}),
t{k} AS MATERIALIZED (SELECT CAST(sum(r) AS BIGINT) AS t FROM r{k}),
g{k} AS MATERIALIZED (SELECT j, CAST(sum(x * r) AS BIGINT) AS g FROM x JOIN r{k} USING (doc_id) GROUP BY j),
w{k} AS MATERIALIZED (SELECT m.j,
         COALESCE(wp.w, 0) - CAST(round({LOGREG_LR} * (COALESCE(g.g, 0) - m.m * (SELECT t FROM t{k})) / ((SELECT nn FROM n) * 1000), 0) AS BIGINT) AS w
         FROM m LEFT JOIN g{k} g USING (j) LEFT JOIN w{p} wp USING (j)),
b{k} AS MATERIALIZED (SELECT (SELECT b FROM b{p}) - CAST(round({LOGREG_LR} * (SELECT t FROM t{k}) / (SELECT nn FROM n), 0) AS BIGINT) AS b),
c{k} AS MATERIALIZED (SELECT COALESCE(CAST(sum(w * m) AS BIGINT), 0) AS c FROM w{k} JOIN m USING (j))"""


SQL_LOGREG_QUALITY = (
    f"""
WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
              FROM documents),
feat AS MATERIALIZED (SELECT doc_id,
                CAST(('0x' || substr(md5(tok), 1, 7)) AS BIGINT) % {LOGREG_DIMS} AS j,
                count(*) AS c
         FROM toks GROUP BY doc_id, j),
lens AS MATERIALIZED (SELECT doc_id, sum(c) AS l FROM feat GROUP BY doc_id),
x AS (SELECT f.doc_id, f.j,
             CAST(round(f.c * {LOGREG_DIMS * 1000}.0 / lens.l, 0) AS BIGINT) AS x
      FROM feat f JOIN lens USING (doc_id)),
n AS (SELECT count(*) AS nn FROM documents),
m AS (SELECT j, CAST(round(sum(x) * 1.0 / (SELECT nn FROM n), 0) AS BIGINT) AS m
      FROM x GROUP BY j),
y AS MATERIALIZED (SELECT doc_id,
             CASE WHEN len(list_filter(string_split(lower(text), ' '),
                                       t -> t = '{LOGREG_TARGET}')) * 1000.0
                       / len(string_split(lower(text), ' ')) > {LOGREG_THR}
                  THEN 1 ELSE 0 END AS y
      FROM documents),
-- step 1 closed-form: w = 0 -> z = 0, p = 0.5 exactly
r1 AS (SELECT doc_id, y, CAST(round((0.5 - y) * 1000000, 0) AS BIGINT) AS r FROM y),
t1 AS (SELECT CAST(sum(r) AS BIGINT) AS t FROM r1),
g1 AS MATERIALIZED (SELECT j, CAST(sum(x * r) AS BIGINT) AS g FROM x JOIN r1 USING (doc_id) GROUP BY j),
w1 AS MATERIALIZED (SELECT m.j,
       -CAST(round({LOGREG_LR} * (COALESCE(g.g, 0) - m.m * (SELECT t FROM t1)) / ((SELECT nn FROM n) * 1000), 0) AS BIGINT) AS w
       FROM m LEFT JOIN g1 g USING (j)),
b1 AS MATERIALIZED (SELECT -CAST(round({LOGREG_LR} * (SELECT t FROM t1) / (SELECT nn FROM n), 0) AS BIGINT) AS b),
c1 AS (SELECT COALESCE(CAST(sum(w * m) AS BIGINT), 0) AS c FROM w1 JOIN m USING (j)),"""
    + ",".join(_logreg_sql_step(k) for k in range(2, LOGREG_STEPS + 1))
    + f""",
zf AS MATERIALIZED (SELECT y.doc_id, y.y,
       (COALESCE(s.s, 0) - (SELECT c FROM c{LOGREG_STEPS}) + (SELECT b FROM b{LOGREG_STEPS}) * 1000) / 1.0e9 AS z
       FROM y LEFT JOIN (SELECT doc_id, sum(w * x) AS s
                         FROM x JOIN w{LOGREG_STEPS} USING (j) GROUP BY doc_id) s
       USING (doc_id))
SELECT doc_id, CAST(y AS INT) AS y,
       round(1.0 / (1.0 + exp(-z)), 6) AS p,
       CAST(CASE WHEN 1.0 / (1.0 + exp(-z)) > 0.5 THEN 1 ELSE 0 END AS INT) AS pred
FROM zf
"""
)


def q_linreg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped closed-form OLS (operators/classify.py:linreg_grouped):
    one model per order priority — predict an order's total (integer
    dollars) from its lineitem count and summed quantity — trained by
    the grouped NORMAL EQUATIONS: nine BIGINT-exact sufficient sums in
    one map-side-combined aggregate, then a stateless 3×3 Cramer solve
    per group.  The "train a million small models" shape: no driver
    loop, no per-group fit call — the shuffle carries 10 longs per
    group whatever the row count.  Every sum is integer-exact in any
    aggregation order and the solve is one identical double-expression
    chain, so the DuckDB oracle reproduces the coefficients bit-for-bit
    at 6dp."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("x1"),
        F.sum(F.col("l_quantity").cast("long")).alias("x2"),
    )
    feat = per_order.join(
        orders,
        per_order.l_orderkey == orders.o_orderkey,
    ).select(
        F.col("o_orderpriority").alias("priority"),
        F.round(F.col("o_totalprice"), 0).cast("long").alias("y"),
        "x1",
        "x2",
    )
    return classify.linreg_grouped(
        feat, F.col("y"), F.col("x1"), F.col("x2"), ["priority"]
    )


SQL_LINREG_ORDERS = """
WITH feat AS (
  SELECT o.o_orderpriority AS priority,
         CAST(round(o.o_totalprice, 0) AS BIGINT) AS y,
         CAST(count(*) AS BIGINT) AS x1,
         CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS x2
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_orderpriority, o.o_totalprice),
sums AS (
  SELECT priority,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
         CAST(sum(x1*x1) AS BIGINT) AS s11,
         CAST(sum(x1*x2) AS BIGINT) AS s12,
         CAST(sum(x2*x2) AS BIGINT) AS s22,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x1*y) AS BIGINT) AS s1y,
         CAST(sum(x2*y) AS BIGINT) AS s2y,
         CAST(sum(y*y) AS BIGINT) AS syy
  FROM feat GROUP BY priority),
c AS (
  SELECT priority, n,
         CAST(n AS DOUBLE) AS n_, CAST(s1 AS DOUBLE) AS s1_,
         CAST(s2 AS DOUBLE) AS s2_, CAST(s11 AS DOUBLE) AS s11_,
         CAST(s12 AS DOUBLE) AS s12_, CAST(s22 AS DOUBLE) AS s22_,
         CAST(sy AS DOUBLE) AS sy_, CAST(s1y AS DOUBLE) AS s1y_,
         CAST(s2y AS DOUBLE) AS s2y_, CAST(syy AS DOUBLE) AS syy_
  FROM sums),
k AS (
  SELECT priority, n, sy_, s1y_, s2y_, syy_, n_,
         (n_ * (s11_ * s22_ - s12_ * s12_)
          - s1_ * (s1_ * s22_ - s12_ * s2_)
          + s2_ * (s1_ * s12_ - s11_ * s2_)) AS det,
         (sy_ * (s11_ * s22_ - s12_ * s12_)
          - s1_ * (s1y_ * s22_ - s12_ * s2y_)
          + s2_ * (s1y_ * s12_ - s11_ * s2y_)) AS det0,
         (n_ * (s1y_ * s22_ - s12_ * s2y_)
          - sy_ * (s1_ * s22_ - s12_ * s2_)
          + s2_ * (s1_ * s2y_ - s1y_ * s2_)) AS det1,
         (n_ * (s11_ * s2y_ - s1y_ * s12_)
          - s1_ * (s1_ * s2y_ - s1y_ * s2_)
          + sy_ * (s1_ * s12_ - s11_ * s2_)) AS det2
  FROM c)
SELECT priority, n,
       CASE WHEN n >= 3 AND det <> 0
            THEN round(det0 / det, 6) END AS b0,
       CASE WHEN n >= 3 AND det <> 0
            THEN round(det1 / det, 6) END AS b1,
       CASE WHEN n >= 3 AND det <> 0
            THEN round(det2 / det, 6) END AS b2,
       CASE WHEN n >= 3 AND det <> 0
                 AND (syy_ - sy_ * sy_ / n_) <> 0
            THEN round(1.0 - (syy_ - ((det0 / det) * sy_
                                      + (det1 / det) * s1y_
                                      + (det2 / det) * s2y_))
                           / (syy_ - sy_ * sy_ / n_), 6) END AS r2
FROM k
"""


VACUUM_AS_OF = dt.datetime(2024, 2, 1)
VACUUM_MAX_AGE_S = 10 * 86400  # threshold = 2024-01-22


def q_store_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online-store TTL retention
    (operators/materialize.py:vacuum_store): events materialized keyed
    by event_id with a 10-day max_age, then PHYSICALLY vacuumed at
    as_of = Feb-1 — rows with ts < Jan-22 are reclaimed by a staged
    atomic rewrite that preserves the keyed layout. The returned frame
    is the store READ BACK from disk after the swap; the oracle is the
    serve-time staleness predicate's complement (ts ≥ as_of − max_age)
    applied to the source — a vacuumed store must serve exactly what
    an unvacuumed one would at request_ts = as_of."""
    import shutil
    import tempfile

    import feast_java_old_spark as fs
    from feast_java_old_spark.operators.materialize import (
        materialize,
        vacuum_store,
    )
    from feast_java_old_spark.registry.model import FileSource

    store = tempfile.mkdtemp(prefix="fjos_vacuum_gate_")
    try:
        with _small_shuffle(spark):
            reg = fs.Registry()
            reg.apply_entity(fs.Entity("event_id", fs.ValueType.INT64))
            reg.apply_feature_table(
                fs.FeatureTable(
                    name="ev_ttl",
                    entities=["event_id"],
                    features=[
                        fs.Feature("user_id", fs.ValueType.INT64),
                        fs.Feature("value", fs.ValueType.DOUBLE),
                    ],
                    max_age_secs=VACUUM_MAX_AGE_S,
                    batch_source=FileSource(
                        file_url=f"{sf_dir}/events.parquet",
                        event_timestamp_column="ts",
                    ),
                )
            )
            materialize(spark, reg, "ev_ttl", store)
            stats = vacuum_store(
                spark, reg, "ev_ttl", store, as_of=VACUUM_AS_OF
            )
            assert stats["n_kept"] + stats["n_expired"] > 0
            out = spark.read.parquet(stats["path"]).select(
                "event_id",
                F.unix_micros("event_timestamp").alias("ts_us"),
                "user_id",
                "value",
            )
            return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(store, ignore_errors=True)


SQL_STORE_VACUUM = """
SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, user_id, value
FROM events
WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-22 00:00:00'
"""


def q_weighted_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted quantiles per group
    (operators/features.py:weighted_quantiles): quartiles of lineitem
    price-in-cents weighted by quantity, per return flag — the weighted
    CDF inverse ``min{v : W(≤v) ≥ q·W_total}`` evaluated as a pure
    BIGINT inequality (den·cumw ≥ num·total), so the oracle cannot
    disagree on a float boundary. One (group, value) pre-aggregate, one
    per-group window over distinct values, one conditional-min fold."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("long")
        .alias("price_cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    return features.weighted_quantiles(
        li,
        value_col="price_cents",
        weight_col="qty",
        group_cols=["flag"],
        quantiles=[(1, 4), (2, 4), (3, 4)],
    )


SQL_WEIGHTED_QUANTILES = """
WITH pv AS (
  SELECT l_returnflag AS flag,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS v,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
  FROM lineitem GROUP BY 1, 2),
c AS (
  SELECT flag, v,
         sum(w) OVER (PARTITION BY flag ORDER BY v) AS cw,
         sum(w) OVER (PARTITION BY flag) AS tw
  FROM pv)
SELECT flag, CAST(max(tw) AS BIGINT) AS total_weight,
       min(CASE WHEN cw * 4 >= tw * 1 THEN v END) AS p25,
       min(CASE WHEN cw * 4 >= tw * 2 THEN v END) AS p50,
       min(CASE WHEN cw * 4 >= tw * 3 THEN v END) AS p75
FROM c GROUP BY flag
"""


def q_lm_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram stupid-backoff LM scoring under a HELD-OUT reference
    model (operators/text.py:stupid_backoff_logprob; Brants et al.,
    EMNLP 2007): even doc_ids train the count model, odd doc_ids are
    scored — so unlike the self-scored add-k twins (`unigram_logprob`,
    `bigram_logprob`), the trigram→bigram→unigram→OOV backoff branches
    all genuinely fire (the CCNet "perplexity under a reference LM"
    filter shape).  Every backoff branch is pre-resolved model-side on
    vocab-sized tables; the eval trigram stream is consumed once."""
    docs = load_table(spark, sf_dir, "documents")
    return text.stupid_backoff_logprob(
        docs.where(F.col("doc_id") % 2 == 1),
        docs.where(F.col("doc_id") % 2 == 0),
        alpha=0.4,
        oov_k=0.5,
    )


SQL_LM_BACKOFF = """
WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
tr3 AS (SELECT unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                       FOR i IN range(1, len(t) - 1)]) AS g
        FROM toks WHERE doc_id % 2 = 0),
tr2 AS (SELECT unnest([t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]) AS g
        FROM toks WHERE doc_id % 2 = 0),
tr1 AS (SELECT unnest(t) AS g FROM toks WHERE doc_id % 2 = 0),
c3 AS (SELECT g, count(*) AS c FROM tr3 GROUP BY g),
c2 AS (SELECT g, count(*) AS c FROM tr2 GROUP BY g),
c1 AS (SELECT g, count(*) AS c FROM tr1 GROUP BY g),
n AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM c1),
ev AS (SELECT doc_id, unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                              FOR i IN range(1, len(t) - 1)]) AS g
       FROM toks WHERE doc_id % 2 = 1),
sc AS (SELECT ev.doc_id,
              coalesce(ln(c3.c / c2a.c),
                       ln((0.4 * c2b.c) / c1a.c),
                       ln(((0.4 * 0.4) * c1b.c) / n.n),
                       ln((0.4 * 0.4 * 0.5) / n.n)) AS lp
       FROM ev
       LEFT JOIN c3 ON c3.g = ev.g
       LEFT JOIN c2 c2a
         ON c2a.g = split_part(ev.g, ' ', 1) || ' ' || split_part(ev.g, ' ', 2)
       LEFT JOIN c2 c2b
         ON c2b.g = split_part(ev.g, ' ', 2) || ' ' || split_part(ev.g, ' ', 3)
       LEFT JOIN c1 c1a ON c1a.g = split_part(ev.g, ' ', 2)
       LEFT JOIN c1 c1b ON c1b.g = split_part(ev.g, ' ', 3)
       CROSS JOIN n)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
       round(avg(lp), 6) AS logprob
FROM sc
GROUP BY doc_id
"""


def q_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr dedup, discovery half (Lee et al. ACL 2022): maximal
    token spans covered by corpus-duplicated 8-grams
    (operators/dedup.py:duplicated_spans) — duplicated-gram seeds via a
    hashed frequency aggregate, merged per document by the
    gap-and-islands window.  The suffix-array modality the repo's other
    dedup families (exact / MinHash / SimHash / chunk / line) did not
    cover."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.duplicated_spans(docs, k=8, min_count=2)


def _sql_substring_grams(k: int) -> str:
    return f"""
d AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
g AS (SELECT doc_id, i.i - 1 AS pos,
             array_to_string(toks[i.i : i.i + {k - 1}], ' ') AS gram
      FROM d, unnest(range(1, len(toks) - {k} + 2)) AS i(i)),
f AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2)"""


SQL_SUBSTRING_SPANS = f"""
WITH {_sql_substring_grams(8)},
s AS (SELECT g.doc_id, g.pos, g.pos + 7 AS e FROM g JOIN f USING (gram)),
m AS (SELECT doc_id, pos, e,
             max(e) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_end
      FROM s),
i2 AS (SELECT doc_id, pos, e,
              CASE WHEN prev_end IS NULL OR pos > prev_end + 1
                   THEN 1 ELSE 0 END AS brk
       FROM m),
i3 AS (SELECT doc_id, pos, e,
              sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS isl
       FROM i2)
SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(e) AS BIGINT) AS span_end,
       CAST(max(e) - min(pos) + 1 AS BIGINT) AS span_tokens,
       CAST(count(*) AS BIGINT) AS n_seeds
FROM i3 GROUP BY doc_id, isl
"""


def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr dedup, apply half: delete every token covered by a
    corpus-duplicated 8-gram and reassemble the survivors in order
    (operators/dedup.py:substring_dedup) — keeps the novel remainder of
    a partially-copied document instead of dropping it whole."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.substring_dedup(docs, k=8, min_count=2)


SQL_SUBSTRING_DEDUP = f"""
WITH {_sql_substring_grams(8)},
cov AS (SELECT DISTINCT g.doc_id, g.pos + o.o AS cpos
        FROM g JOIN f USING (gram), unnest(range(0, 8)) AS o(o)),
tp AS (SELECT doc_id, i.i - 1 AS pos, toks[i.i] AS tok
       FROM d, unnest(range(1, len(toks) + 1)) AS i(i))
SELECT tp.doc_id,
       coalesce(string_agg(CASE WHEN cov.cpos IS NULL THEN tp.tok END,
                           ' ' ORDER BY tp.pos), '') AS text,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN cov.cpos IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed
FROM tp LEFT JOIN cov ON tp.doc_id = cov.doc_id AND tp.pos = cov.cpos
GROUP BY tp.doc_id
"""


def q_stream_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ExactSubstr apply (§2.6): incoming documents replay as a
    LIVE stream; every token inside an 8-gram already present in the
    static corpus is deleted on arrival and the survivors reassembled —
    gram marking is one stream-static join, coverage + reassembly live
    in the single stateful per-document aggregate
    (streaming/ingest.py:stream_substring_dedup). Oracle mirrors the
    batch span algebra restricted to incoming-vs-corpus seeds."""
    import shutil
    import tempfile

    from feast_java_old_spark.streaming.ingest import stream_substring_dedup

    docs = load_table(spark, sf_dir, "documents")
    batch = docs.where(F.col("doc_id") % INC_BATCH_MOD == 0).select(
        "doc_id", "text"
    )
    corpus = docs.where(F.col("doc_id") % INC_BATCH_MOD != 0)
    src = tempfile.mkdtemp(prefix="fjos_subsrc_")
    try:
        batch.orderBy("doc_id").coalesce(1).write.mode("overwrite").parquet(
            src
        )
        schema = spark.read.parquet(src).schema
        stream = spark.readStream.schema(schema).parquet(src)
        out = stream_substring_dedup(stream, corpus, k=8)
        res = _stream_to_table(
            spark, out, "complete", "stream_substring_dedup"
        ).select("doc_id", "text", "n_tokens", "n_removed")
        res = res.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(src, ignore_errors=True)
    return res


SQL_STREAM_SUBSTRING = f"""
WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
           FROM documents),
inc AS (SELECT * FROM d WHERE doc_id % {INC_BATCH_MOD} = 0),
corp AS (SELECT * FROM d WHERE doc_id % {INC_BATCH_MOD} <> 0),
cg AS (SELECT DISTINCT array_to_string(toks[i.i : i.i + 7], ' ') AS gram
       FROM corp, unnest(range(1, len(toks) - 8 + 2)) AS i(i)),
g AS (SELECT doc_id, i.i - 1 AS pos,
             array_to_string(toks[i.i : i.i + 7], ' ') AS gram
      FROM inc, unnest(range(1, len(toks) - 8 + 2)) AS i(i)),
s AS (SELECT g.doc_id, g.pos FROM g JOIN cg USING (gram)),
cov AS (SELECT DISTINCT s.doc_id, s.pos + o.o AS cpos
        FROM s, unnest(range(0, 8)) AS o(o)),
tp AS (SELECT doc_id, i.i - 1 AS pos, toks[i.i] AS tok
       FROM inc, unnest(range(1, len(toks) + 1)) AS i(i))
SELECT tp.doc_id,
       coalesce(string_agg(CASE WHEN cov.cpos IS NULL THEN tp.tok END,
                           ' ' ORDER BY tp.pos), '') AS text,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN cov.cpos IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed
FROM tp LEFT JOIN cov ON tp.doc_id = cov.doc_id AND tp.pos = cov.cpos
GROUP BY tp.doc_id
"""


COMPACT_TARGET = 4000  # bytes per output bin in the gate-scale plan


def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner (operators/layout.py:
    compaction_plan — the Delta/Iceberg OPTIMIZE bin-packing step):
    per-source cumulative-offset binning of file metadata sorted size
    DESC, bins ≈ target_bytes with at-most-one-file overflow. The gate
    models each document as a file (size = char length) partitioned by
    source."""
    from feast_java_old_spark.operators.layout import compaction_plan

    docs = load_table(spark, sf_dir, "documents")
    files = docs.select(
        "source",
        F.concat_ws("/", "source", F.col("doc_id").cast("string")).alias(
            "path"
        ),
        F.length("text").cast("long").alias("size_bytes"),
    )
    plan = compaction_plan(
        files,
        size_col="size_bytes",
        order_col="path",
        part_cols=["source"],
        target_bytes=COMPACT_TARGET,
    )
    return plan.select(
        "source", "path", "size_bytes", "bin_id", "bin_bytes", "bin_files"
    )


SQL_COMPACTION_PLAN = f"""
WITH f AS (SELECT source,
                  source || '/' || CAST(doc_id AS VARCHAR) AS path,
                  CAST(length(text) AS BIGINT) AS size_bytes
           FROM documents),
b AS (SELECT source, path, size_bytes,
             CAST(floor(coalesce(sum(size_bytes) OVER (
                    PARTITION BY source
                    ORDER BY size_bytes DESC, path
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  / {COMPACT_TARGET}) AS BIGINT) AS bin_id
      FROM f)
SELECT source, path, size_bytes, bin_id,
       CAST(sum(size_bytes) OVER (PARTITION BY source, bin_id) AS BIGINT)
         AS bin_bytes,
       CAST(count(*) OVER (PARTITION BY source, bin_id) AS BIGINT)
         AS bin_files
FROM b
"""


def q_source_formats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch file-source format breadth (sources/batch.py:
    read_batch_source, the engine extension past the reference's
    parquet-only validator DataSourceValidator.java:34-43): the orders
    table staged as csv (header, declared DDL schema — single-pass, no
    inference scan), json, and orc, each read back through the
    registry-validated FileSource path and aggregated; every format
    must reproduce the parquet numbers exactly (integer-cents sums, so
    text-format double round-trips must be bit-faithful). Avro is
    env-gated (no spark-avro jar here) and covered by the pure-python
    wire codec gates instead."""
    import shutil
    import tempfile

    from feast_java_old_spark.registry.model import FileSource
    from feast_java_old_spark.sources.batch import read_batch_source

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"
    )
    ddl = (
        "o_orderkey BIGINT, o_custkey BIGINT, "
        "o_orderpriority STRING, o_totalprice DOUBLE"
    )
    base = tempfile.mkdtemp(prefix="fjos_srcfmt_")
    frames = []
    try:
        orders.write.mode("overwrite").option("header", "true").csv(
            f"{base}/csv"
        )
        orders.write.mode("overwrite").json(f"{base}/json")
        orders.write.mode("overwrite").orc(f"{base}/orc")
        for fmt in ("csv", "json", "orc"):
            src = FileSource(
                file_url=f"{base}/{fmt}",
                file_format=fmt,
                schema_ddl=ddl,
            )
            df = read_batch_source(spark, src)
            frames.append(
                df.groupBy("o_orderpriority").agg(
                    F.count(F.lit(1)).alias("n_orders"),
                    F.sum(
                        F.round(F.col("o_totalprice") * 100, 0).cast("long")
                    ).alias("revenue_cents"),
                ).withColumn("fmt", F.lit(fmt))
            )
        out = frames[0].unionByName(frames[1]).unionByName(frames[2])
        out = out.select(
            "fmt", "o_orderpriority", "n_orders", "revenue_cents"
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return out


SQL_SOURCE_FORMATS = """
SELECT f.fmt, o_orderpriority, count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders
CROSS JOIN (SELECT unnest(['csv', 'json', 'orc']) AS fmt) f
GROUP BY f.fmt, o_orderpriority
"""


def q_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectations suite (operators/expectations.py:
    run_checks — the Deequ-style assertion layer over the audit stats):
    six declarative rules over orders — completeness, exact uniqueness,
    numeric range, accepted set, anchored regex format, and referential
    integrity of o_custkey against the broadcast customer dimension —
    every row-local rule folded into ONE aggregate over one scan."""
    from feast_java_old_spark.operators import expectations as ex

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    checks = [
        ex.completeness("o_custkey"),
        ex.uniqueness("o_orderkey"),
        ex.in_range("o_totalprice", 0.0, 250000.0, threshold=0.9),
        ex.accepted_values("o_orderstatus", ["O", "F", "P"]),
        ex.matches_regex("o_orderpriority", r"^[1-5]-[A-Z ]+$"),
        ex.referential("o_custkey", "customer", "c_custkey"),
    ]
    return ex.run_checks(orders, checks, refs={"customer": cust})


SQL_EXPECTATIONS = """
SELECT CAST(0 AS BIGINT) AS ord,
       'completeness(o_custkey)' AS "check", 'o_custkey' AS "column",
       round(CASE WHEN count(*) = 0 THEN 1.0
             ELSE CAST(count(o_custkey) AS DOUBLE) / count(*) END, 6)
         AS metric,
       1.0 AS threshold,
       CAST(round(CASE WHEN count(*) = 0 THEN 1.0
             ELSE CAST(count(o_custkey) AS DOUBLE) / count(*) END, 6) >= 1.0
            AS BIGINT) AS passed
FROM orders
UNION ALL
SELECT CAST(1 AS BIGINT), 'uniqueness(o_orderkey)', 'o_orderkey',
       round(CAST(count(DISTINCT o_orderkey) AS DOUBLE) / count(*), 6),
       1.0,
       CAST(round(CAST(count(DISTINCT o_orderkey) AS DOUBLE) / count(*), 6)
            >= 1.0 AS BIGINT)
FROM orders
UNION ALL
SELECT CAST(2 AS BIGINT), 'in_range(o_totalprice)', 'o_totalprice',
       round(CAST(sum(CASE WHEN o_totalprice >= 0.0
                            AND o_totalprice <= 250000.0
                           THEN 1 ELSE 0 END) AS DOUBLE)
             / count(o_totalprice), 6),
       0.9,
       CAST(round(CAST(sum(CASE WHEN o_totalprice >= 0.0
                                 AND o_totalprice <= 250000.0
                                THEN 1 ELSE 0 END) AS DOUBLE)
                  / count(o_totalprice), 6) >= 0.9 AS BIGINT)
FROM orders
UNION ALL
SELECT CAST(3 AS BIGINT), 'accepted_values(o_orderstatus)', 'o_orderstatus',
       round(CAST(sum(CASE WHEN o_orderstatus IN ('O', 'F', 'P')
                           THEN 1 ELSE 0 END) AS DOUBLE)
             / count(o_orderstatus), 6),
       1.0,
       CAST(round(CAST(sum(CASE WHEN o_orderstatus IN ('O', 'F', 'P')
                                THEN 1 ELSE 0 END) AS DOUBLE)
                  / count(o_orderstatus), 6) >= 1.0 AS BIGINT)
FROM orders
UNION ALL
SELECT CAST(4 AS BIGINT), 'matches_regex(o_orderpriority)', 'o_orderpriority',
       round(CAST(sum(CASE WHEN regexp_matches(o_orderpriority,
                                               '^[1-5]-[A-Z ]+$')
                           THEN 1 ELSE 0 END) AS DOUBLE)
             / count(o_orderpriority), 6),
       1.0,
       CAST(round(CAST(sum(CASE WHEN regexp_matches(o_orderpriority,
                                                    '^[1-5]-[A-Z ]+$')
                                THEN 1 ELSE 0 END) AS DOUBLE)
                  / count(o_orderpriority), 6) >= 1.0 AS BIGINT)
FROM orders
UNION ALL
SELECT CAST(5 AS BIGINT), 'referential(o_custkey->customer.c_custkey)', 'o_custkey',
       round(CAST(sum(CASE WHEN c.c_custkey IS NOT NULL
                           THEN 1 ELSE 0 END) AS DOUBLE)
             / count(o.o_custkey), 6),
       1.0,
       CAST(round(CAST(sum(CASE WHEN c.c_custkey IS NOT NULL
                                THEN 1 ELSE 0 END) AS DOUBLE)
                  / count(o.o_custkey), 6) >= 1.0 AS BIGINT)
FROM orders o
LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
  ON o.o_custkey = c.c_custkey
"""


# ------------------------------------------------------------- audit trail


AUDIT_BATCHES = 3


def _register_serve_scenario(spark, sf_dir, tmp, audit=None, metrics=None):
    """The shared register → materialize → serve-in-3-batches scenario
    behind ``audit_trail`` and ``serving_metrics``: entity + feature
    table (CREATE then UPDATE re-apply), one materialize run, then the
    %7 custkey request set served in ``AUDIT_BATCHES`` batches split by
    ``custkey % AUDIT_BATCHES`` at the J3 request timestamp (max_age
    1y ⇒ a deterministic PRESENT / NOT_FOUND / OUTSIDE_MAX_AGE mix the
    oracles recompute from customer × orders)."""
    import feast_java_old_spark as fs
    from feast_java_old_spark.operators import materialize
    from feast_java_old_spark.plans.serving_json import serve_logged
    from feast_java_old_spark.registry.model import FileSource
    from feast_java_old_spark.registry.registry import Registry

    reg = Registry(audit=audit)
    reg.apply_entity(fs.Entity("c_custkey", fs.ValueType.INT64))

    def ft(labels):
        return fs.FeatureTable(
            name="customer_orders_audit",
            entities=["c_custkey"],
            features=[fs.Feature("total_price", fs.ValueType.DOUBLE)],
            max_age_secs=MAX_AGE_1Y,
            labels=labels,
            batch_source=FileSource(
                file_url=f"{sf_dir}/orders.parquet",
                event_timestamp_column="o_orderdate",
                field_mapping={
                    "o_custkey": "c_custkey",
                    "o_totalprice": "total_price",
                },
            ),
        )

    reg.apply_feature_table(ft({}))  # CREATE
    reg.apply_feature_table(ft({"tier": "gold"}))  # UPDATE (spec change)
    materialize(spark, reg, "customer_orders_audit", tmp)  # RUNNING/READY
    keys = [
        r.c_custkey
        for r in load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 7 == 0)
        .select("c_custkey")
        .collect()
    ]
    for b in range(AUDIT_BATCHES):
        serve_logged(
            spark,
            reg,
            [{"c_custkey": int(k)} for k in keys if k % AUDIT_BATCHES == b],
            ["customer_orders_audit:total_price"],
            metrics=metrics,
            store_path=tmp,
            request_ts=REQ_TS_J3,
            full_feature_names=True,
        )
    return reg


def q_audit_trail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end audit trail of a register → materialize → serve
    session (registry/audit.py — parity with the reference's
    ``common/.../logging/AuditLogger.java`` ACTION / TRANSITION /
    MESSAGE entries, shapes pinned by ``AuditLogEntryTest.java``).

    Scenario (deterministic clock ⇒ deterministic seq): CREATE the
    entity + feature table, an UPDATE re-apply, one materialize run
    (RUNNING → READY job transitions), then the %7 custkey request set
    served in ``AUDIT_BATCHES`` batches split by ``custkey % 3`` — each
    batch emits one MESSAGE entry whose response summary carries the
    DATA-DEPENDENT per-status field counts (PRESENT / NOT_FOUND /
    OUTSIDE_MAX_AGE at the J3 request timestamp). The JSONL trail is
    read back through ``read_audit_log`` (one flat relation, explicit
    schema) and projected to scalars; the oracle recomputes the serving
    counts from customer × orders and pins the control-plane rows.

    The request assembly is driver-side BY CONTRACT (a serving request
    is ≤ thousands of rows — the reference serializes the same rows
    into its gRPC request); everything the counts summarize ran as the
    distributed broadcast-lookup plan. localCheckpoint before the tmp
    dirs are removed (the driver collects after return)."""
    import shutil
    import tempfile

    from feast_java_old_spark.registry.audit import AuditLogger, read_audit_log

    tmp = tempfile.mkdtemp(prefix="fjos_audit_")
    try:
        seq = iter(range(1_000_000))
        ids = iter(range(1_000_000))
        log = AuditLogger(
            path=f"{tmp}/audit.jsonl",
            clock=lambda: next(seq),
            id_factory=lambda: f"m{next(ids)}",
        )
        with _small_shuffle(spark):
            _register_serve_scenario(spark, sf_dir, tmp, audit=log)
            out = read_audit_log(spark, f"{tmp}/audit.jsonl").select(
                F.col("timestamp").alias("seq"),
                "kind",
                "action",
                "status",
                F.col("resource.type").alias("rtype"),
                F.col("resource.id").alias("rid"),
                "method",
                F.col("statusCode").alias("status_code"),
                F.element_at("response", "rows").cast("long").alias("n_rows"),
                F.coalesce(
                    F.element_at("response", "PRESENT").cast("long"), F.lit(0)
                ).alias("n_present"),
                F.coalesce(
                    F.element_at("response", "NOT_FOUND").cast("long"), F.lit(0)
                ).alias("n_not_found"),
                F.coalesce(
                    F.element_at("response", "OUTSIDE_MAX_AGE").cast("long"),
                    F.lit(0),
                ).alias("n_outside"),
            )
            # MESSAGE count columns are NULL→0-coalesced only for
            # MESSAGE rows; control-plane rows keep NULLs.
            out = out.select(
                "seq",
                "kind",
                "action",
                "status",
                "rtype",
                "rid",
                "method",
                "status_code",
                *[
                    F.when(F.col("kind") == "MESSAGE", F.col(c)).alias(c)
                    for c in ("n_rows", "n_present", "n_not_found", "n_outside")
                ],
            )
            return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


SQL_AUDIT_TRAIL = f"""
WITH req AS (
  SELECT c_custkey, c_custkey % {AUDIT_BATCHES} AS b
  FROM customer WHERE c_custkey % 7 = 0),
l1 AS (
  SELECT o_custkey, o_orderdate FROM (
    SELECT o_custkey, o_orderdate,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate DESC, o_orderkey DESC) rn
    FROM orders) WHERE rn = 1),
st AS (
  SELECT r.b,
         CASE WHEN l1.o_custkey IS NULL THEN 'NOT_FOUND'
              WHEN (CAST(epoch(TIMESTAMP '1998-10-01 00:00:00') AS BIGINT)
                    - CAST(epoch(l1.o_orderdate) AS BIGINT)) > {MAX_AGE_1Y}
                   THEN 'OUTSIDE_MAX_AGE'
              ELSE 'PRESENT' END AS s
  FROM req r LEFT JOIN l1 ON l1.o_custkey = r.c_custkey),
m AS (
  SELECT b, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CASE WHEN s = 'PRESENT' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_present,
         CAST(sum(CASE WHEN s = 'NOT_FOUND' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_not_found,
         CAST(sum(CASE WHEN s = 'OUTSIDE_MAX_AGE' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_outside
  FROM st GROUP BY b)
SELECT CAST(5 + b AS BIGINT) AS seq, 'MESSAGE' AS kind,
       CAST(NULL AS VARCHAR) AS action, CAST(NULL AS VARCHAR) AS status,
       CAST(NULL AS VARCHAR) AS rtype, CAST(NULL AS VARCHAR) AS rid,
       'getOnlineFeatures' AS method, 'OK' AS status_code,
       n_rows, n_present, n_not_found, n_outside
FROM m
UNION ALL
SELECT * FROM (VALUES
 (CAST(0 AS BIGINT), 'ACTION', 'CREATE', CAST(NULL AS VARCHAR),
  'ENTITY', 'default/c_custkey', CAST(NULL AS VARCHAR),
  CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)),
 (CAST(1 AS BIGINT), 'ACTION', 'CREATE', CAST(NULL AS VARCHAR),
  'FEATURE_TABLE', 'default/customer_orders_audit', CAST(NULL AS VARCHAR),
  CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)),
 (CAST(2 AS BIGINT), 'ACTION', 'UPDATE', CAST(NULL AS VARCHAR),
  'FEATURE_TABLE', 'default/customer_orders_audit', CAST(NULL AS VARCHAR),
  CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)),
 (CAST(3 AS BIGINT), 'TRANSITION', CAST(NULL AS VARCHAR), 'RUNNING',
  'JOB', 'materialize:default/customer_orders_audit',
  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)),
 (CAST(4 AS BIGINT), 'TRANSITION', CAST(NULL AS VARCHAR), 'READY',
  'JOB', 'materialize:default/customer_orders_audit',
  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT))
) v(seq, kind, action, status, rtype, rid, method, status_code,
    n_rows, n_present, n_not_found, n_outside)
"""


def q_serving_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The serving-runtime Prometheus surface (plans/metrics.py —
    parity with ``serving/util/Metrics.java:24-57`` and the population
    sites ``OnlineServingServiceV2.java:380-427``), driven through the
    same register → materialize → serve-3-batches scenario as
    ``audit_trail`` and exported as the flat (metric, labels, value)
    relation: per-feature NOT_FOUND / stale counters (+1 per response
    row — DATA-dependent, recomputed by the oracle from customer ×
    orders), the per-request feature counter and gRPC counter, and the
    three request-shape histograms as cumulative Prometheus buckets
    (batch sizes land in different ``le`` buckets at different scale
    factors). ``request_latency_seconds`` is wall-clock and excluded
    from the deterministic export by contract (scrape-only)."""
    import shutil
    import tempfile

    from feast_java_old_spark.plans.metrics import ServingMetrics

    tmp = tempfile.mkdtemp(prefix="fjos_metrics_")
    try:
        metrics = ServingMetrics()
        with _small_shuffle(spark):
            reg = _register_serve_scenario(spark, sf_dir, tmp, metrics=metrics)
            # Core resource gauges (FeastResourceCollector.java:46-54)
            # computed from the scenario's registry at collect time —
            # one feature table registered, no stores — unioned into
            # the same flat relation the serving instruments export to.
            # r11: + the JVM resource collector
            # (JVMResourceCollector.java:31-75) through a deterministic
            # injected runtime source (the live JvmRuntimeSource reads
            # the actual Spark driver JVM; wall-clock readings can't
            # hash — the same environment-bound split as the auth
            # providers' clock injection). GC seconds are scrape-only
            # by the request_latency_seconds precedent; counts and the
            # three memory gauges are the deterministic rows.
            from feast_java_old_spark.plans.metrics import (
                FakeRuntimeSource,
                core_resource_dataframe,
                jvm_resource_dataframe,
            )

            rt = FakeRuntimeSource(
                max_bytes=4294967296,
                total_bytes=1073741824,
                free_bytes=268435456,
                gcs=[
                    ("G1 Young Generation", 10, 0.25),
                    ("G1 Old Generation", 2, 0.05),
                ],
            )
            out = (
                metrics.as_dataframe(spark)
                .unionByName(core_resource_dataframe(spark, reg))
                .unionByName(jvm_resource_dataframe(spark, rt))
            )
            return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_METRICS_REF = "customer_orders_audit:total_price"

SQL_SERVING_METRICS = f"""
WITH req AS (
  SELECT c_custkey, c_custkey % {AUDIT_BATCHES} AS b
  FROM customer WHERE c_custkey % 7 = 0),
l1 AS (
  SELECT o_custkey, o_orderdate FROM (
    SELECT o_custkey, o_orderdate,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate DESC, o_orderkey DESC) rn
    FROM orders) WHERE rn = 1),
st AS (
  SELECT r.b,
         CASE WHEN l1.o_custkey IS NULL THEN 'NOT_FOUND'
              WHEN (CAST(epoch(TIMESTAMP '1998-10-01 00:00:00') AS BIGINT)
                    - CAST(epoch(l1.o_orderdate) AS BIGINT)) > {MAX_AGE_1Y}
                   THEN 'OUTSIDE_MAX_AGE'
              ELSE 'PRESENT' END AS s
  FROM req r LEFT JOIN l1 ON l1.o_custkey = r.c_custkey),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_req,
         CAST(sum(CASE WHEN s = 'NOT_FOUND' THEN 1 ELSE 0 END) AS BIGINT)
           AS nf,
         CAST(sum(CASE WHEN s = 'OUTSIDE_MAX_AGE' THEN 1 ELSE 0 END)
              AS BIGINT) AS stale
  FROM st),
bs AS (SELECT b, count(*) AS n FROM st GROUP BY b)
SELECT 'request_entity_count_distribution_bucket' AS metric,
       'le=' || v.le || ',project=default' AS labels,
       (SELECT CAST(count(*) AS BIGINT) FROM bs WHERE bs.n <= v.lim) AS value
FROM (VALUES ('1', 1), ('2', 2), ('5', 5), ('10', 10), ('20', 20),
             ('50', 50), ('100', 100), ('200', 200),
             ('+Inf', 9223372036854775807)) v(le, lim)
UNION ALL
SELECT 'request_feature_count_distribution_bucket',
       'le=' || v.le || ',project=default', CAST({AUDIT_BATCHES} AS BIGINT)
FROM (VALUES ('1'), ('2'), ('5'), ('10'), ('15'), ('20'), ('30'), ('50'),
             ('+Inf')) v(le)
UNION ALL
SELECT 'request_feature_table_count_distribution_bucket',
       'le=' || v.le || ',project=default', CAST({AUDIT_BATCHES} AS BIGINT)
FROM (VALUES ('1'), ('2'), ('5'), ('10'), ('20'), ('+Inf')) v(le)
UNION ALL
SELECT m, 'project=default', v FROM (VALUES
  ('request_entity_count_distribution_count',
   CAST({AUDIT_BATCHES} AS BIGINT)),
  ('request_feature_count_distribution_count',
   CAST({AUDIT_BATCHES} AS BIGINT)),
  ('request_feature_count_distribution_sum',
   CAST({AUDIT_BATCHES} AS BIGINT)),
  ('request_feature_table_count_distribution_count',
   CAST({AUDIT_BATCHES} AS BIGINT)),
  ('request_feature_table_count_distribution_sum',
   CAST({AUDIT_BATCHES} AS BIGINT))) c(m, v)
UNION ALL
SELECT 'request_entity_count_distribution_sum', 'project=default', n_req
FROM tot
UNION ALL
SELECT 'grpc_request_count', 'method=getOnlineFeatures,status_code=OK',
       CAST({AUDIT_BATCHES} AS BIGINT)
UNION ALL
SELECT 'request_feature_count',
       'feature_name={_METRICS_REF},project=default',
       CAST({AUDIT_BATCHES} AS BIGINT)
UNION ALL
SELECT 'not_found_feature_count',
       'feature_name={_METRICS_REF},project=default', nf
FROM tot WHERE nf > 0
UNION ALL
SELECT 'stale_feature_count',
       'feature_name={_METRICS_REF},project=default', stale
FROM tot WHERE stale > 0
UNION ALL
SELECT m, '', v FROM (VALUES
  ('feast_core_feature_set_total', CAST(1 AS BIGINT)),
  ('feast_core_store_total', CAST(0 AS BIGINT))) g(m, v)
UNION ALL
SELECT m, l, v FROM (VALUES
  ('feast_core_max_memory_bytes', '', CAST(4294967296 AS BIGINT)),
  ('feast_core_total_memory_bytes', '', CAST(1073741824 AS BIGINT)),
  ('feast_core_free_memory_bytes', '', CAST(268435456 AS BIGINT)),
  ('feast_core_gc_collection_seconds_count', 'gc=G1 Young Generation',
   CAST(10 AS BIGINT)),
  ('feast_core_gc_collection_seconds_count', 'gc=G1 Old Generation',
   CAST(2 AS BIGINT))) j(m, l, v)
"""


def q_auth_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Authorization enforcement trail — parity with the reference's
    auth stack: ``AuthorizationService.authorizeRequest``
    (``common/.../auth/service/AuthorizationService.java:50-63``)
    enforced at the four project-mutating control-plane sites
    (``CoreServiceImpl.java:181,240,295,392``) and at serving
    (``ServingServiceGRpcController.java:86-91``), with denied calls
    emitting ERROR MESSAGE audit entries carrying
    ``statusCode=PERMISSION_DENIED``
    (``GrpcMessageInterceptor.java:83-89`` semantics).

    Scenario (deterministic clock ⇒ deterministic seq): alice is the
    sole member of project ``analytics``
    (:class:`SubjectListAuthorizationProvider` — the
    ``HttpAuthorizationProvider`` decision table held in-process).
    Alice creates the project, registers the entity + feature table
    (ACTION + OK MESSAGE pairs); bob's apply / delete / archive are
    each denied (one ERROR MESSAGE, NO ACTION entry — denied mutations
    never touch state); alice then serves the %7 custkey request set
    against the never-materialized store (every row NOT_FOUND — the
    documented serving contract — so ``n_rows``/``n_not_found`` are
    DATA-dependent, recomputed by the oracle from ``customer``); bob's
    identical serve is denied before the store is touched. The JSONL
    trail reads back as one flat relation."""
    import shutil
    import tempfile

    import feast_java_old_spark as fs
    from feast_java_old_spark.plans.serving_json import serve_logged
    from feast_java_old_spark.registry.audit import AuditLogger, read_audit_log
    from feast_java_old_spark.registry.auth import (
        AccessDeniedError,
        Authentication,
        AuthorizationService,
        SubjectListAuthorizationProvider,
    )
    from feast_java_old_spark.registry.core_service import CoreService
    from feast_java_old_spark.registry.model import FileSource
    from feast_java_old_spark.registry.registry import Registry

    tmp = tempfile.mkdtemp(prefix="fjos_auth_")
    try:
        seq = iter(range(1_000_000))
        ids = iter(range(1_000_000))
        log = AuditLogger(
            path=f"{tmp}/audit.jsonl",
            clock=lambda: next(seq),
            id_factory=lambda: f"m{next(ids)}",
        )
        reg = Registry(audit=log)
        auth = AuthorizationService(
            enabled=True,
            provider=SubjectListAuthorizationProvider(
                {"analytics": {"alice@example.com"}}
            ),
        )
        svc = CoreService(reg, auth=auth)
        alice = Authentication({"email": "alice@example.com"})
        bob = Authentication({"email": "bob@example.com"})

        table = fs.FeatureTable(
            name="customer_orders_auth",
            entities=["c_custkey"],
            features=[fs.Feature("total_price", fs.ValueType.DOUBLE)],
            batch_source=FileSource(
                file_url=f"{sf_dir}/orders.parquet",
                event_timestamp_column="o_orderdate",
                field_mapping={
                    "o_custkey": "c_custkey",
                    "o_totalprice": "total_price",
                },
            ),
        )
        svc.create_project("analytics", authentication=alice)
        svc.apply_entity(
            fs.Entity("c_custkey", fs.ValueType.INT64),
            project="analytics",
            authentication=alice,
        )
        svc.apply_feature_table(
            table, project="analytics", authentication=alice
        )
        for denied in (
            lambda: svc.apply_feature_table(
                table, project="analytics", authentication=bob
            ),
            lambda: svc.delete_feature_table(
                "customer_orders_auth", project="analytics",
                authentication=bob,
            ),
            lambda: svc.archive_project("analytics", authentication=bob),
        ):
            try:
                denied()
            except AccessDeniedError:
                pass

        with _small_shuffle(spark):
            keys = [
                int(r.c_custkey)
                for r in load_table(spark, sf_dir, "customer")
                .where(F.col("c_custkey") % 7 == 0)
                .select("c_custkey")
                .collect()
            ]
            serve_logged(
                spark,
                reg,
                [{"c_custkey": k} for k in keys],
                ["customer_orders_auth:total_price"],
                project="analytics",
                auth=auth,
                authentication=alice,
                identity="alice@example.com",
                store_path=tmp,
                request_ts=REQ_TS_J3,
                full_feature_names=True,
            )
            try:
                serve_logged(
                    spark,
                    reg,
                    [{"c_custkey": k} for k in keys],
                    ["customer_orders_auth:total_price"],
                    project="analytics",
                    auth=auth,
                    authentication=bob,
                    identity="bob@example.com",
                    store_path=tmp,
                    request_ts=REQ_TS_J3,
                    full_feature_names=True,
                )
            except AccessDeniedError:
                pass

            out = read_audit_log(spark, f"{tmp}/audit.jsonl").select(
                F.col("timestamp").alias("seq"),
                "kind",
                "action",
                F.col("resource.type").alias("rtype"),
                F.col("resource.id").alias("rid"),
                "method",
                F.col("statusCode").alias("status_code"),
                F.coalesce(F.col("identity"), F.lit("")).alias("ident"),
                F.element_at("response", "rows").cast("long").alias("n_rows"),
                F.element_at("response", "NOT_FOUND")
                .cast("long")
                .alias("n_not_found"),
            )
            return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


SQL_AUTH_AUDIT = """
WITH n AS (
  SELECT CAST(count(*) AS BIGINT) AS n
  FROM customer WHERE c_custkey % 7 = 0)
SELECT CAST(9 AS BIGINT) AS seq, 'MESSAGE' AS kind,
       CAST(NULL AS VARCHAR) AS action, CAST(NULL AS VARCHAR) AS rtype,
       CAST(NULL AS VARCHAR) AS rid, 'getOnlineFeatures' AS method,
       'OK' AS status_code, 'alice@example.com' AS ident,
       n AS n_rows, n AS n_not_found
FROM n
UNION ALL
SELECT * FROM (VALUES
 (CAST(0 AS BIGINT), 'ACTION', 'CREATE', 'PROJECT', 'analytics',
  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), '',
  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)),
 (CAST(1 AS BIGINT), 'MESSAGE', CAST(NULL AS VARCHAR),
  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 'CreateProject', 'OK',
  'alice@example.com', CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)),
 (CAST(2 AS BIGINT), 'ACTION', 'CREATE', 'ENTITY', 'analytics/c_custkey',
  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), '',
  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)),
 (CAST(3 AS BIGINT), 'MESSAGE', CAST(NULL AS VARCHAR),
  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 'ApplyEntity', 'OK',
  'alice@example.com', CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)),
 (CAST(4 AS BIGINT), 'ACTION', 'CREATE', 'FEATURE_TABLE',
  'analytics/customer_orders_auth', CAST(NULL AS VARCHAR),
  CAST(NULL AS VARCHAR), '', CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)),
 (CAST(5 AS BIGINT), 'MESSAGE', CAST(NULL AS VARCHAR),
  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 'ApplyFeatureTable',
  'OK', 'alice@example.com', CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)),
 (CAST(6 AS BIGINT), 'MESSAGE', CAST(NULL AS VARCHAR),
  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 'ApplyFeatureTable',
  'PERMISSION_DENIED', 'bob@example.com',
  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)),
 (CAST(7 AS BIGINT), 'MESSAGE', CAST(NULL AS VARCHAR),
  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 'DeleteFeatureTable',
  'PERMISSION_DENIED', 'bob@example.com',
  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)),
 (CAST(8 AS BIGINT), 'MESSAGE', CAST(NULL AS VARCHAR),
  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 'ArchiveProject',
  'PERMISSION_DENIED', 'bob@example.com',
  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)),
 (CAST(10 AS BIGINT), 'MESSAGE', CAST(NULL AS VARCHAR),
  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 'getOnlineFeatures',
  'PERMISSION_DENIED', 'bob@example.com',
  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT))
) v(seq, kind, action, rtype, rid, method, status_code, ident,
    n_rows, n_not_found)
"""


# ---------------------------------------------------------------- the contract


def q_rest_online_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving REST controller end-to-end as a hash-gated scenario
    (plans/serving_rest.py — ``ServingServiceRestController.java:55-66``
    → ``RequestHelper`` validation → ``getOnlineFeatures`` →
    ``ResponseJSONMapper`` flat rows): ONE ``/api/v1/features/online``
    request whose proto-JSON body exercises the whole surface —
    camelCase ``entityRows``, ``int64Val`` Value wrappers on the even
    custkeys (odd keys ride the native-scalar path), per-row ISO-8601
    ``Z`` timestamps (even keys request at the J3 timestamp — inside
    the 1y max_age wherever an order exists; odd keys at 2005-01-01 —
    every order is OUTSIDE_MAX_AGE → null) — returned as the flat
    field→value relation (non-PRESENT → NULL, entity echoed, the
    ``timestamp`` input never echoed). The oracle recomputes the flat
    maps from customer × orders: latest order per custkey, NULL when
    missing (NOT_FOUND) or stale at that row's request time."""
    from feast_java_old_spark.plans.serving_rest import (
        ServingServiceRestController,
    )

    reg, online, entities = _customer_orders_env(
        spark, sf_dir, max_age=MAX_AGE_1Y
    )
    ctl = ServingServiceRestController(
        spark,
        reg,
        online_frames={"customer_orders": online},
        full_feature_names=True,
    )
    keys = sorted(int(r.c_custkey) for r in entities.collect())
    body = ctl.get_online_features(
        {
            "features": [
                {"featureTable": "customer_orders", "name": "total_price"},
                {"featureTable": "customer_orders", "name": "order_status"},
            ],
            "entityRows": [
                {
                    "fields": {
                        "c_custkey": (
                            {"int64Val": k} if k % 2 == 0 else k
                        )
                    },
                    "timestamp": (
                        "1998-10-01T00:00:00Z"
                        if k % 2 == 0
                        else "2005-01-01T00:00:00Z"
                    ),
                }
                for k in keys
            ],
        }
    )
    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("customer_orders:total_price", T.DoubleType()),
            T.StructField("customer_orders:order_status", T.StringType()),
        ]
    )
    return spark.createDataFrame(
        [
            (
                r["c_custkey"],
                r["customer_orders:total_price"],
                r["customer_orders:order_status"],
            )
            for r in body
        ],
        schema,
    )


SQL_REST_ONLINE = f"""
WITH latest AS (
  SELECT o_custkey, o_totalprice AS total_price,
         o_orderstatus AS order_status, o_orderdate,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders),
l1 AS (SELECT * FROM latest WHERE rn = 1),
req AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 2 = 0 THEN TIMESTAMP '1998-10-01 00:00:00'
              ELSE TIMESTAMP '2005-01-01 00:00:00' END AS ts
  FROM customer WHERE c_custkey % 7 = 0)
SELECT r.c_custkey,
       CASE WHEN l1.o_custkey IS NULL THEN NULL
            WHEN (CAST(epoch(r.ts) AS BIGINT)
                  - CAST(epoch(l1.o_orderdate) AS BIGINT)) > {MAX_AGE_1Y}
                 THEN NULL
            ELSE l1.total_price END AS "customer_orders:total_price",
       CASE WHEN l1.o_custkey IS NULL THEN NULL
            WHEN (CAST(epoch(r.ts) AS BIGINT)
                  - CAST(epoch(l1.o_orderdate) AS BIGINT)) > {MAX_AGE_1Y}
                 THEN NULL
            ELSE l1.order_status END AS "customer_orders:order_status"
FROM req r LEFT JOIN l1 ON l1.o_custkey = r.c_custkey
"""


def q_sdk_online_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The client SDK end-to-end as a hash-gated scenario — the consumer
    half of ``rest_online_features``: a ``FeastClient``
    (``sdk/java/.../FeastClient.java:152-189``) with bearer credentials
    (``SecurityConfig`` + ``JwtCallCredentials``) connects to the
    serving servicer over the gRPC-over-HTTP socket
    (``/feast.serving.ServingService/GetOnlineFeaturesV2``), builds
    ``Row`` entity rows with per-row entity timestamps
    (``Row.java:38-58`` — even custkeys request at the J3 timestamp,
    odd at 2005-01-01), and reads values AND statuses back through the
    typed getters (``Row.java:104-134``). Unlike the REST twin's flat
    maps, the SDK surface carries the full status vocabulary, so the
    result pins PRESENT / NOT_FOUND / OUTSIDE_MAX_AGE per feature
    against the oracle's recomputation.

    Scale shape: identical to ``rest_online_features`` — the J1
    broadcast double-BHJ behind the socket; the client-side request set
    is the bounded entity list the serving layer already collects."""
    from feast_java_old_spark.plans.serving_rest import (
        ServingServiceRestController,
    )
    from feast_java_old_spark.registry.credentials import JwtCallCredentials
    from feast_java_old_spark.sdk import FeastClient, HttpJsonChannel, Row
    from feast_java_old_spark.transport.grpc_adapter import (
        ServingServiceServicer,
    )
    from feast_java_old_spark.transport.grpc_http import GrpcHttpServer

    reg, online, entities = _customer_orders_env(
        spark, sf_dir, max_age=MAX_AGE_1Y
    )
    ctl = ServingServiceRestController(
        spark,
        reg,
        online_frames={"customer_orders": online},
        full_feature_names=True,
    )
    keys = sorted(int(r.c_custkey) for r in entities.collect())
    refs = ["customer_orders:total_price", "customer_orders:order_status"]
    with GrpcHttpServer([ServingServiceServicer(ctl)]) as srv:
        # protected-constructor analog (FeastClient.java:191-204) so the
        # channel timeout covers a cold first Spark job; credentials
        # attach exactly as create_secure would wire them.
        client = FeastClient(
            HttpJsonChannel(srv.host, srv.port, timeout=600.0),
            credentials=JwtCallCredentials("sdk-gate-token"),
        )
        with client:
            rows = client.get_online_features(
                refs,
                [
                    Row.create()
                    .set("c_custkey", k)
                    .set_entity_timestamp(
                        REQ_TS_J3
                        if k % 2 == 0
                        else dt.datetime(2005, 1, 1)
                    )
                    for k in keys
                ],
            )
    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("total_price", T.DoubleType()),
            T.StructField("total_price_status", T.StringType()),
            T.StructField("order_status", T.StringType()),
            T.StructField("order_status_status", T.StringType()),
        ]
    )
    return spark.createDataFrame(
        [
            (
                r.get_long("c_custkey"),
                r.get_double(refs[0]),
                r.get_status(refs[0]),
                r.get_string(refs[1]),
                r.get_status(refs[1]),
            )
            for r in rows
        ],
        schema,
    )


SQL_SDK_ONLINE = f"""
WITH latest AS (
  SELECT o_custkey, o_totalprice AS total_price,
         o_orderstatus AS order_status, o_orderdate,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders),
l1 AS (SELECT * FROM latest WHERE rn = 1),
req AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 2 = 0 THEN TIMESTAMP '1998-10-01 00:00:00'
              ELSE TIMESTAMP '2005-01-01 00:00:00' END AS ts
  FROM customer WHERE c_custkey % 7 = 0),
age AS (
  SELECT r.c_custkey, r.ts, l1.o_custkey, l1.total_price, l1.order_status,
         CAST(epoch(r.ts) AS BIGINT)
           - CAST(epoch(l1.o_orderdate) AS BIGINT) AS age_s
  FROM req r LEFT JOIN l1 ON l1.o_custkey = r.c_custkey)
SELECT c_custkey,
       CASE WHEN o_custkey IS NULL THEN NULL
            WHEN age_s > {MAX_AGE_1Y} THEN NULL
            ELSE total_price END AS total_price,
       CASE WHEN o_custkey IS NULL THEN 'NOT_FOUND'
            WHEN age_s > {MAX_AGE_1Y} THEN 'OUTSIDE_MAX_AGE'
            WHEN total_price IS NULL THEN 'NULL_VALUE'
            ELSE 'PRESENT' END AS total_price_status,
       CASE WHEN o_custkey IS NULL THEN NULL
            WHEN age_s > {MAX_AGE_1Y} THEN NULL
            ELSE order_status END AS order_status,
       CASE WHEN o_custkey IS NULL THEN 'NOT_FOUND'
            WHEN age_s > {MAX_AGE_1Y} THEN 'OUTSIDE_MAX_AGE'
            WHEN order_status IS NULL THEN 'NULL_VALUE'
            ELSE 'PRESENT' END AS order_status_status
FROM age
"""


def q_sdk_compound_entity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound-entity serve through the client SDK — the r15 budgeted
    gate query, the engine twin of ``ServingServiceBigTableIT.
    shouldRegisterCompoundEntityAndGetOnlineFeatures:533-596``: a
    feature table registered on TWO entities, entity rows carrying BOTH
    key fields (``DataGenerator.createCompoundEntityRow``), served
    through ``FeastClient.get_online_features`` and read back with
    values AND statuses (PRESENT rows plus a guaranteed-missing pair →
    NOT_FOUND with the empty Value, exactly the IT's
    ``createEmptyValue`` expectation).

    One registration refreshes TWO surfaces: the J2 compound-key join
    evidence (same env/oracle family as ``j2_compound_key``, the
    two-round bench watch item) and the SDK path beyond its
    single-entity r14 gate. Scale shape: identical to J2's — the
    double-BHJ keyed on the composite key behind the gRPC-over-HTTP
    socket; the client adds zero plan nodes."""
    from feast_java_old_spark.plans.serving_rest import (
        ServingServiceRestController,
    )
    from feast_java_old_spark.registry.credentials import JwtCallCredentials
    from feast_java_old_spark.sdk import FeastClient, HttpJsonChannel, Row
    from feast_java_old_spark.transport.grpc_adapter import (
        ServingServiceServicer,
    )
    from feast_java_old_spark.transport.grpc_http import GrpcHttpServer

    reg, online, entities = _supplier_part_env(spark, sf_dir)
    ctl = ServingServiceRestController(
        spark,
        reg,
        online_frames={"supplier_part": online},
        full_feature_names=True,
    )
    pairs = sorted(
        (int(r.l_suppkey), int(r.l_partkey)) for r in entities.collect()
    )
    refs = ["supplier_part:quantity", "supplier_part:extended_price"]
    with GrpcHttpServer([ServingServiceServicer(ctl)]) as srv:
        client = FeastClient(
            HttpJsonChannel(srv.host, srv.port, timeout=600.0),
            credentials=JwtCallCredentials("sdk-compound-token"),
        )
        with client:
            rows = client.get_online_features(
                refs,
                [
                    Row.create()
                    .set("l_suppkey", sk)
                    .set("l_partkey", pk)
                    .set_entity_timestamp(dt.datetime(1998, 12, 1))
                    for sk, pk in pairs
                ],
            )
    schema = T.StructType(
        [
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("quantity", T.DoubleType()),
            T.StructField("quantity_status", T.StringType()),
            T.StructField("extended_price", T.DoubleType()),
            T.StructField("extended_price_status", T.StringType()),
        ]
    )
    return spark.createDataFrame(
        [
            (
                r.get_long("l_suppkey"),
                r.get_long("l_partkey"),
                r.get_double(refs[0]),
                r.get_status(refs[0]),
                r.get_double(refs[1]),
                r.get_status(refs[1]),
            )
            for r in rows
        ],
        schema,
    )


def q_sdk_proto_entity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound-entity serve through the client SDK over the
    PROTO-BINARY wire codec — the r16 budgeted gate query. The
    reference's serving socket speaks proto3 binary, not JSON
    (``ServingServiceGRpcController.java:81-95`` returns
    ``GetOnlineFeaturesResponse`` messages over gRPC), so this puts the
    actual wire format under the DuckDB oracle end-to-end: typed Rows →
    ``protobin.encode_request`` → negotiated ``application/x-protobuf``
    socket → ``protobin.decode_response`` → typed getters. Same J2
    compound-key oracle family as ``q_sdk_compound_entity`` (the
    ``ServingServiceBigTableIT:533-596`` scenario); the ONLY deltas are
    ``HttpJsonChannel(codec="proto")`` and one entity key set through
    the snake_case dict-passthrough arm (``{"int64_val": sk}`` —
    ``Row.set``'s whitelist admits it, and the codec canonicalizes it
    on encode), so a value-hash match proves the binary codec carries
    byte-faithful Values both directions.

    The channel falls back to JSON decode if a server ever responded
    JSON (identical Rows either way), which would silently weaken this
    gate — so the query first probes the socket raw and REFUSES to
    serve unless the response Content-Type is the negotiated proto
    type. Scale shape: identical to J2's double-BHJ; the codec is
    per-request CPU on a bounded serving payload, zero plan nodes."""
    import http.client as hc

    from feast_java_old_spark.plans.serving_rest import (
        ServingServiceRestController,
    )
    from feast_java_old_spark.registry.credentials import JwtCallCredentials
    from feast_java_old_spark.sdk import FeastClient, HttpJsonChannel, Row
    from feast_java_old_spark.transport import protobin
    from feast_java_old_spark.transport.grpc_adapter import (
        SERVING_SERVICE,
        ServingServiceServicer,
    )
    from feast_java_old_spark.transport.grpc_http import GrpcHttpServer

    reg, online, entities = _supplier_part_env(spark, sf_dir)
    ctl = ServingServiceRestController(
        spark,
        reg,
        online_frames={"supplier_part": online},
        full_feature_names=True,
    )
    pairs = sorted(
        (int(r.l_suppkey), int(r.l_partkey)) for r in entities.collect()
    )
    refs = ["supplier_part:quantity", "supplier_part:extended_price"]
    with GrpcHttpServer([ServingServiceServicer(ctl)]) as srv:
        # Negotiation pin: a binary GetFeastServingInfo must come back
        # with the proto Content-Type, or the binary path is not live.
        conn = hc.HTTPConnection(srv.host, srv.port, timeout=60)
        conn.request(
            "POST",
            f"/{SERVING_SERVICE}/GetFeastServingInfo",
            body=protobin.encode_request(
                SERVING_SERVICE, "GetFeastServingInfo", {}
            ),
            headers={"Content-Type": protobin.PROTO_CONTENT_TYPE},
        )
        probe = conn.getresponse()
        probe.read()
        ctype = (probe.getheader("Content-Type", "") or "").split(";")[0]
        conn.close()
        if probe.status != 200 or ctype.strip() != protobin.PROTO_CONTENT_TYPE:
            raise RuntimeError(
                f"proto codec not negotiated: {probe.status} {ctype!r}"
            )
        client = FeastClient(
            HttpJsonChannel(srv.host, srv.port, timeout=600.0, codec="proto"),
            credentials=JwtCallCredentials("sdk-proto-token"),
        )
        with client:
            rows = client.get_online_features(
                refs,
                [
                    Row.create()
                    .set("l_suppkey", {"int64_val": sk})
                    .set("l_partkey", pk)
                    .set_entity_timestamp(dt.datetime(1998, 12, 1))
                    for sk, pk in pairs
                ],
            )
    schema = T.StructType(
        [
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("quantity", T.DoubleType()),
            T.StructField("quantity_status", T.StringType()),
            T.StructField("extended_price", T.DoubleType()),
            T.StructField("extended_price_status", T.StringType()),
        ]
    )
    return spark.createDataFrame(
        [
            (
                r.get_long("l_suppkey"),
                r.get_long("l_partkey"),
                r.get_double(refs[0]),
                r.get_status(refs[0]),
                r.get_double(refs[1]),
                r.get_status(refs[1]),
            )
            for r in rows
        ],
        schema,
    )


SQL_SDK_COMPOUND = """
WITH latest AS (
  SELECT l_suppkey, l_partkey, l_quantity AS quantity,
         l_extendedprice AS extended_price,
         row_number() OVER (PARTITION BY l_suppkey, l_partkey
                            ORDER BY l_shipdate DESC, l_orderkey DESC,
                                     l_linenumber DESC) AS rn
  FROM lineitem),
l1 AS (SELECT * FROM latest WHERE rn = 1),
ent AS (
  SELECT DISTINCT l_suppkey, l_partkey FROM lineitem WHERE l_partkey % 50 = 0
  UNION ALL SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT))
SELECT e.l_suppkey, e.l_partkey,
       l1.quantity,
       CASE WHEN l1.l_suppkey IS NULL THEN 'NOT_FOUND'
            WHEN l1.quantity IS NULL THEN 'NULL_VALUE'
            ELSE 'PRESENT' END AS quantity_status,
       l1.extended_price,
       CASE WHEN l1.l_suppkey IS NULL THEN 'NOT_FOUND'
            WHEN l1.extended_price IS NULL THEN 'NULL_VALUE'
            ELSE 'PRESENT' END AS extended_price_status
FROM ent e LEFT JOIN l1
  ON l1.l_suppkey = e.l_suppkey AND l1.l_partkey = e.l_partkey
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the J1 entity-lookup —
    the reference's hot path — over the synthetic star schema."""
    return q_j1_entity_lookup(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER IS LOAD-BEARING: the round driver's correctness gate
    # hash-matches the FIRST 50 entries of this dict (insertion order).
    # Each round the dict is re-ordered — never-gated queries at the
    # very front, then the oldest-evidence rows (latest round per query
    # in the CORRECTNESS_r*.json union) — so every registered query
    # re-verifies within ~4 rounds (policy: docs/COVERAGE.md
    # "Evidence-freshness policy"). Do NOT append new queries at the
    # end, insert alphabetically, or let a formatter re-sort this
    # literal. r16 window: sdk_proto_entity (the one budgeted r16
    # registration — never gated, FRONT) + the five r11-evidence rows
    # displaced from r15 (a8_cube_revenue, tpch_q5, tpch_q1, tpch_q6,
    # tpch_q14) + the first 44 r12-evidence rows in CORRECTNESS_r12
    # order (through ks_drift); the six remaining r12 rows
    # (segment_overlap, segment_overlap_kmv, cusum_alerts,
    # curve_skip_audit, grouping_sets_revenue, not_in_semantics) sit at
    # positions 51-56 to lead the r17 window, followed by the r13, r14,
    # r15 evidence blocks in their CORRECTNESS order.
    return {
        "sdk_proto_entity": q_sdk_proto_entity,
        "a8_cube_revenue": q_a8_cube_revenue,
        "tpch_q5": q_tpch_q5,
        "tpch_q1": q_tpch_q1,
        "tpch_q6": q_tpch_q6,
        "tpch_q14": q_tpch_q14,
        "rest_online_features": q_rest_online_features,
        "sliding_distinct_approx": q_sliding_distinct_approx,
        "p5_type_conformance": q_p5_type_conformance,
        "dedup_exact": q_dedup_exact,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_simhash": q_dedup_simhash,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_verified": q_dedup_verified,
        "dedup_components": q_dedup_components,
        "text_stats": q_text_stats,
        "text_repetition": q_text_repetition,
        "pii_scrub": q_pii_scrub,
        "chunk_dedup": q_chunk_dedup,
        "feature_drift": q_feature_drift,
        "key_skew": q_key_skew,
        "decontaminate": q_decontaminate,
        "corpus_shuffle": q_corpus_shuffle,
        "shard_manifest": q_shard_manifest,
        "text_normalize": q_text_normalize,
        "hard_negatives": q_hard_negatives,
        "tpch_q18": q_tpch_q18,
        "dedup_containment": q_dedup_containment,
        "dedup_incremental": q_dedup_incremental,
        "dedup_stats": q_dedup_stats,
        "novelty_score": q_novelty_score,
        "stream_incremental_dedup": q_stream_incremental_dedup,
        "dsir_weights": q_dsir_weights,
        "stream_dedup": q_stream_dedup,
        "stream_enrich": q_stream_enrich,
        "stream_stream_join": q_stream_stream_join,
        "tpch_q17": q_tpch_q17,
        "tpch_q21": q_tpch_q21,
        "tpch_q21_agg": q_tpch_q21_agg,
        "tpch_q22": q_tpch_q22,
        "tpch_q15": q_tpch_q15,
        "tpch_q11": q_tpch_q11,
        "dedup_prefix_filter": q_dedup_prefix_filter,
        "schema_time_travel": q_schema_time_travel,
        "stream_drift": q_stream_drift,
        "linreg_orders": q_linreg_orders,
        "weighted_quantiles": q_weighted_quantiles,
        "store_vacuum": q_store_vacuum,
        "hilbert_key": q_hilbert_key,
        "ks_drift": q_ks_drift,
        "segment_overlap": q_segment_overlap,
        "segment_overlap_kmv": q_segment_overlap_kmv,
        "cusum_alerts": q_cusum_alerts,
        "curve_skip_audit": q_curve_skip_audit,
        "grouping_sets_revenue": q_grouping_sets_revenue,
        "not_in_semantics": q_not_in_semantics,
        "odfv_transform_service": q_odfv_transform_service,
        "stream_cusum": q_stream_cusum,
        "rejection_report": q_rejection_report,
        "audit_trail": q_audit_trail,
        "serving_metrics": q_serving_metrics,
        "tpch_q20": q_tpch_q20,
        "stream_cdc_merge": q_stream_cdc_merge,
        "stream_sessions": q_stream_sessions,
        "stream_clean_corpus": q_stream_clean_corpus,
        "stream_topk": q_stream_topk,
        "pq_encode": q_pq_encode,
        "pq_adc": q_pq_adc,
        "ann_ivf_pq": q_ann_ivf_pq,
        "mmr_rerank": q_mmr_rerank,
        "ann_eval": q_ann_eval,
        "random_projection": q_random_projection,
        "kmeans_refine_expr": q_kmeans_refine_expr,
        "kmeans_train": q_kmeans_train,
        "token_encode": q_token_encode,
        "quantile_bin": q_quantile_bin,
        "quantile_bin_approx": q_quantile_bin_approx,
        "profile_columns": q_profile_columns,
        "profile_columns_approx": q_profile_columns_approx,
        "scd2_history": q_scd2_history,
        "scd2_snapshot": q_scd2_snapshot,
        "scd2_join": q_scd2_join,
        "pagerank": q_pagerank,
        "triangle_count": q_triangle_count,
        "bm25_search": q_bm25_search,
        "phrase_search": q_phrase_search,
        "rrf_fusion": q_rrf_fusion,
        "tfidf_terms": q_tfidf_terms,
        "fuzzy_match": q_fuzzy_match,
        "fuzzy_match_snm": q_fuzzy_match_snm,
        "robust_outliers": q_robust_outliers,
        "token_budget": q_token_budget,
        "semantic_decontaminate": q_semantic_decontaminate,
        "ccnet_buckets": q_ccnet_buckets,
        "sketch_distinct": q_sketch_distinct,
        "count_min": q_count_min,
        "bloom_filter": q_bloom_filter,
        "cms_join_size": q_cms_join_size,
        "heavy_hitters": q_heavy_hitters,
        "semdedup": q_semdedup,
        "k_anonymity": q_k_anonymity,
        "bigram_logprob": q_bigram_logprob,
        "multi_window_features": q_multi_window_features,
        "rolling_features": q_rolling_features,
        "feature_pivot": q_feature_pivot,
        "asof_nearest": q_asof_nearest,
        "sdk_online_features": q_sdk_online_features,
        "weighted_sample": q_weighted_sample,
        "skew_join": q_skew_join,
        "ewma_features": q_ewma_features,
        "auth_audit": q_auth_audit,
        "target_encode": q_target_encode,
        "winsorize": q_winsorize,
        "chunk_documents": q_chunk_documents,
        "resample_ffill": q_resample_ffill,
        "bpe_pairs": q_bpe_pairs,
        "line_filter": q_line_filter,
        "cdc_apply": q_cdc_apply,
        "normalize_features": q_normalize_features,
        "funnel": q_funnel,
        "cohort_retention": q_cohort_retention,
        "zorder_key": q_zorder_key,
        "rollup_merge": q_rollup_merge,
        "boilerplate": q_boilerplate,
        "top_orders": q_top_orders,
        "snapshot_diff": q_snapshot_diff,
        "user_sequences": q_user_sequences,
        "length_batches": q_length_batches,
        "negative_samples": q_negative_samples,
        "session_cooccurrence": q_session_cooccurrence,
        "calendar_features": q_calendar_features,
        "pmi_collocations": q_pmi_collocations,
        "stream_window_rollup": q_stream_window_rollup,
        "stream_latest_merge": q_stream_latest_merge,
        "kmeans_refine": q_kmeans_refine,
        "dedup_verified_simhash": q_dedup_verified_simhash,
        "embedding_near_dups": q_embedding_near_dups,
        "stream_proto_decode": q_stream_proto_decode,
        "odfv_transform": q_odfv_transform,
        "doc_fingerprint": q_doc_fingerprint,
        "embedding_centroids": q_embedding_centroids,
        "lang_id": q_lang_id,
        "multimodal_decode": q_multimodal_decode,
        "multimodal_frames": q_multimodal_frames,
        "pipeline_clean_corpus": q_pipeline_clean_corpus,
        "quality_classifier": q_quality_classifier,
        "similarity_ann_ivf": q_similarity_ann_ivf,
        "similarity_ann_lsh": q_similarity_ann_lsh,
        "similarity_ann_multiprobe": q_similarity_ann_multiprobe,
        "similarity_topk": q_similarity_topk,
        "token_count": q_token_count,
        "training_corpus": q_training_corpus,
        "vocab_topk": q_vocab_topk,
        "embedding_outliers": q_embedding_outliers,
        "corpus_dedup_apply": q_corpus_dedup_apply,
        "dedup_keep_best": q_dedup_keep_best,
        "sdk_compound_entity": q_sdk_compound_entity,
        "dedup_crossmodal": q_dedup_crossmodal,
        "corpus_split": q_corpus_split,
        "domain_topk": q_domain_topk,
        "sequence_pack": q_sequence_pack,
        "unigram_logprob": q_unigram_logprob,
        "logreg_quality": q_logreg_quality,
        "global_ranks": q_global_ranks,
        "zone_map_prune": q_zone_map_prune,
        "stream_zone_map": q_stream_zone_map,
        "event_transitions": q_event_transitions,
        "event_gaps": q_event_gaps,
        "attribution": q_attribution,
        "tpch_q4": q_tpch_q4,
        "tpch_q13": q_tpch_q13,
        "tpch_q16": q_tpch_q16,
        "lm_backoff": q_lm_backoff,
        "bloom_prune_join": q_bloom_prune_join,
        "schema_evolution": q_schema_evolution,
        "stream_schema_evolution": q_stream_schema_evolution,
        "substring_spans": q_substring_spans,
        "substring_dedup": q_substring_dedup,
        "stream_substring_dedup": q_stream_substring_dedup,
        "compaction_plan": q_compaction_plan,
        "source_formats": q_source_formats,
        "expectations": q_expectations,
        "corpus_rollup": q_corpus_rollup,
        "domain_mix": q_domain_mix,
        "domain_upsample": q_domain_upsample,
        "interval_join": q_interval_join,
        "sessionize": q_sessionize,
        "stratified_sample": q_stratified_sample,
        "s1_scan_projection": q_s1_scan_projection,
        "a1_latest_per_key": q_a1_latest_per_key,
        "a1_latest_window": q_a1_latest_window,
        "j1_entity_lookup": q_j1_entity_lookup,
        "j1_lookup_shuffle": q_j1_lookup_shuffle,
        "j2_compound_key": q_j2_compound_key,
        "j3_max_age": q_j3_max_age,
        "historical_asof": q_historical_asof,
        "historical_asof_range": q_historical_asof_range,
        "historical_asof_bucketed": q_historical_asof_bucketed,
        "historical_training_set": q_historical_training_set,
        "a2_metrics_rollup": q_a2_metrics_rollup,
        "a3_window_rollup": q_a3_window_rollup,
        "a4_sliding_rollup": q_a4_sliding_rollup,
        "sliding_distinct": q_sliding_distinct,
        "a5_sessions": q_a5_sessions,
        "a6_percentiles": q_a6_percentiles,
        "a7_rollup_revenue": q_a7_rollup_revenue,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "audit_trail": SQL_AUDIT_TRAIL,
        "serving_metrics": SQL_SERVING_METRICS,
        "auth_audit": SQL_AUTH_AUDIT,
        "rest_online_features": SQL_REST_ONLINE,
        "sdk_online_features": SQL_SDK_ONLINE,
        "sdk_compound_entity": SQL_SDK_COMPOUND,
        # codec="proto" twin: identical serve semantics, so the same
        # oracle — the hash match proves the BINARY wire carries the
        # same Values the JSON codec does, end-to-end under DuckDB.
        "sdk_proto_entity": SQL_SDK_COMPOUND,
        "tpch_q20": SQL_TPCH_Q20,
        "logreg_quality": SQL_LOGREG_QUALITY,
        "global_ranks": SQL_GLOBAL_RANKS,
        "zone_map_prune": SQL_ZONE_MAP_PRUNE,
        "stream_zone_map": SQL_STREAM_ZONE_MAP,
        "event_transitions": SQL_EVENT_TRANSITIONS,
        "event_gaps": SQL_EVENT_GAPS,
        "attribution": SQL_ATTRIBUTION,
        "tpch_q4": SQL_TPCH_Q4,
        "tpch_q13": SQL_TPCH_Q13,
        "tpch_q16": SQL_TPCH_Q16,
        "tpch_q17": SQL_TPCH_Q17,
        "tpch_q21": SQL_TPCH_Q21,
        "tpch_q21_agg": SQL_TPCH_Q21,  # one-pass twin, same oracle
        "tpch_q22": SQL_TPCH_Q22,
        "tpch_q15": SQL_TPCH_Q15,
        "tpch_q11": SQL_TPCH_Q11,
        "dedup_prefix_filter": SQL_JACCARD_EXACT,
        "schema_time_travel": SQL_SCHEMA_TIME_TRAVEL,
        "stream_drift": SQL_STREAM_DRIFT,
        "linreg_orders": SQL_LINREG_ORDERS,
        "weighted_quantiles": SQL_WEIGHTED_QUANTILES,
        "store_vacuum": SQL_STORE_VACUUM,
        "hilbert_key": _sql_hilbert(),
        "ks_drift": SQL_KS_DRIFT,
        "segment_overlap": SQL_SEGMENT_OVERLAP,
        "cusum_alerts": SQL_CUSUM_ALERTS,
        "curve_skip_audit": _sql_curve_audit(),
        "grouping_sets_revenue": SQL_GROUPING_SETS,
        "not_in_semantics": SQL_NOT_IN_SEMANTICS,
        "stream_cusum": SQL_CUSUM_ALERTS,  # batch/stream twin, one oracle
        "rejection_report": _sql_rejection_report(),
        # segment_overlap_kmv: approx by design, no oracle — the exact
        # twin above is the hash-matched query (sketch_distinct pattern)
        "lm_backoff": SQL_LM_BACKOFF,
        "bloom_prune_join": SQL_BLOOM_PRUNE_JOIN,
        "schema_evolution": SQL_SCHEMA_EVOLUTION,
        "stream_schema_evolution": SQL_SCHEMA_EVOLUTION,
        "substring_spans": SQL_SUBSTRING_SPANS,
        "substring_dedup": SQL_SUBSTRING_DEDUP,
        "stream_substring_dedup": SQL_STREAM_SUBSTRING,
        "compaction_plan": SQL_COMPACTION_PLAN,
        "source_formats": SQL_SOURCE_FORMATS,
        "expectations": SQL_EXPECTATIONS,
        "s1_scan_projection": SQL_S1,
        "a1_latest_per_key": SQL_A1,
        "a1_latest_window": SQL_A1,
        "j1_entity_lookup": SQL_J1,
        "j1_lookup_shuffle": SQL_J1,
        "j2_compound_key": SQL_J2,
        "j3_max_age": SQL_J3,
        "historical_asof": SQL_ASOF,
        "historical_asof_range": SQL_ASOF,
        "historical_asof_bucketed": SQL_ASOF,
        "historical_training_set": SQL_TRAINING_SET,
        "a2_metrics_rollup": SQL_A2,
        "a3_window_rollup": SQL_A3,
        "a4_sliding_rollup": SQL_A4,
        "sliding_distinct": SQL_SLIDING_DISTINCT,
        "a5_sessions": SQL_A5,
        "a6_percentiles": SQL_A6,
        "a7_rollup_revenue": SQL_A7,
        "a8_cube_revenue": SQL_A8_CUBE,
        "tpch_q5": SQL_TPCH_Q5,
        "tpch_q1": SQL_TPCH_Q1,
        "tpch_q6": SQL_TPCH_Q6,
        "tpch_q14": SQL_TPCH_Q14,
        "tpch_q18": SQL_TPCH_Q18,
        "p5_type_conformance": SQL_P5,
        "dedup_exact": SQL_DEDUP_EXACT,
        "dedup_minhash_lsh": _sql_minhash(),
        "dedup_simhash": _sql_simhash(),
        "dedup_ngram_jaccard": SQL_JACCARD,
        "dedup_containment": SQL_CONTAINMENT,
        "dedup_verified": _sql_verified_truth(),
        "dedup_verified_simhash": _sql_verified_simhash(),
        "dedup_incremental": SQL_DEDUP_INCREMENTAL,
        "dedup_stats": _sql_dedup_stats(),
        "novelty_score": SQL_NOVELTY,
        "stream_incremental_dedup": SQL_DEDUP_INCREMENTAL,
        "dedup_components": _sql_dedup_components(),
        "text_stats": SQL_TEXT_STATS,
        "text_repetition": SQL_TEXT_REPETITION,
        "pii_scrub": SQL_PII_SCRUB,
        "chunk_dedup": SQL_CHUNK_DEDUP,
        "feature_drift": SQL_FEATURE_DRIFT,
        "key_skew": SQL_KEY_SKEW,
        "dsir_weights": SQL_DSIR,
        "decontaminate": SQL_DECONTAMINATE,
        "corpus_shuffle": SQL_CORPUS_SHUFFLE,
        "shard_manifest": SQL_SHARD_MANIFEST,
        "text_normalize": SQL_TEXT_NORMALIZE,
        "hard_negatives": SQL_HARD_NEGATIVES,
        "domain_mix": SQL_DOMAIN_MIX,
        "corpus_split": _sql_corpus_split(),
        "domain_topk": _sql_domain_topk(),
        "kmeans_refine": _sql_kmeans_refine(),
        "kmeans_refine_expr": _sql_kmeans_refine(),
        "kmeans_train": _sql_kmeans_train(),
        "pq_encode": SQL_PQ_ENCODE,
        "pq_adc": SQL_PQ_ADC,
        "unigram_logprob": SQL_UNIGRAM_LOGPROB,
        "embedding_outliers": _sql_embedding_outliers(),
        "interval_join": SQL_INTERVAL_JOIN,
        "sessionize": SQL_SESSIONIZE,
        "domain_upsample": SQL_DOMAIN_UPSAMPLE,
        "corpus_dedup_apply": _sql_corpus_dedup_apply(),
        "dedup_keep_best": _sql_dedup_keep_best(),
        "stratified_sample": SQL_STRATIFIED_SAMPLE,
        "dedup_crossmodal": _sql_dedup_crossmodal(),
        "corpus_rollup": _sql_corpus_rollup(),
        "sequence_pack": SQL_SEQUENCE_PACK,
        "quality_classifier": SQL_QUALITY_CLF.format(stoplist=_STOPLIST_SQL),
        "vocab_topk": SQL_VOCAB_TOPK,
        "training_corpus": _sql_training_corpus(),
        "lang_id": _sql_lang_id(),
        "token_count": SQL_TOKEN_COUNT,
        "doc_fingerprint": SQL_FINGERPRINT,
        "pipeline_clean_corpus": _sql_clean_corpus(),
        "similarity_topk": SQL_TOPK,
        "mmr_rerank": _sql_mmr(),
        "random_projection": _sql_random_projection(),
        "semantic_decontaminate": _sql_semantic_decontaminate(),
        "ccnet_buckets": SQL_CCNET_BUCKETS,
        "ann_eval": _sql_ann_eval(),
        "similarity_ann_lsh": SQL_ANN,
        "similarity_ann_ivf": SQL_ANN_IVF,
        "similarity_ann_multiprobe": SQL_ANN_MULTI,
        "embedding_centroids": SQL_CENTROIDS,
        "embedding_near_dups": SQL_NEAR_DUPS,
        "multimodal_decode": SQL_MM_DECODE,
        "multimodal_frames": SQL_MM_FRAMES,
        "odfv_transform": SQL_ODFV,
        "odfv_transform_service": SQL_ODFV,
        "stream_latest_merge": SQL_A1,
        "stream_window_rollup": SQL_STREAM_WIN,
        "stream_dedup": SQL_STREAM_DEDUP,
        "stream_enrich": SQL_STREAM_ENRICH,
        "stream_proto_decode": SQL_STREAM_PROTO,
        "stream_stream_join": SQL_STREAM_SS_JOIN,
        "stream_cdc_merge": SQL_CDC_APPLY,
        "multi_window_features": SQL_MULTI_WINDOW,
        "rolling_features": SQL_ROLLING,
        "feature_pivot": SQL_FEATURE_PIVOT,
        "asof_nearest": SQL_ASOF_NEAREST,
        "bm25_search": SQL_BM25,
        "phrase_search": _sql_phrase(),
        "rrf_fusion": SQL_RRF,
        "tfidf_terms": SQL_TFIDF,
        "weighted_sample": SQL_WEIGHTED_SAMPLE,
        "skew_join": SQL_SKEW_JOIN,
        "target_encode": SQL_TARGET_ENCODE,
        "winsorize": SQL_WINSORIZE,
        "robust_outliers": SQL_ROBUST_OUTLIERS,
        "chunk_documents": SQL_CHUNK_DOCUMENTS,
        "scd2_history": SQL_SCD2,
        "quantile_bin": SQL_QUANTILE_BIN,
        "resample_ffill": SQL_RESAMPLE,
        "profile_columns": _sql_profile(),
        "bpe_pairs": SQL_BPE_PAIRS,
        "line_filter": SQL_LINE_FILTER,
        "cdc_apply": SQL_CDC_APPLY,
        "normalize_features": SQL_NORMALIZE,
        "funnel": SQL_FUNNEL,
        "cohort_retention": SQL_COHORT,
        "zorder_key": _sql_zorder(),
        "scd2_snapshot": SQL_SCD2_SNAPSHOT,
        "token_encode": SQL_TOKEN_ENCODE,
        "heavy_hitters": SQL_HEAVY_HITTERS,
        "count_min": _sql_count_min(),
        "bloom_filter": _sql_bloom(),
        "cms_join_size": _sql_cms_join_size(),
        "stream_topk": SQL_HEAVY_HITTERS,
        "ewma_features": SQL_EWMA,
        "rollup_merge": SQL_ROLLUP_MERGE,
        "boilerplate": SQL_BOILERPLATE,
        "semdedup": SQL_SEMDEDUP,
        "pagerank": SQL_PAGERANK,
        "triangle_count": SQL_TRIANGLE_COUNT,
        "stream_sessions": SQL_A5,
        "stream_clean_corpus": SQL_STREAM_CLEAN.format(
            stoplist=_STOPLIST_SQL, min_q=CLEAN_MIN_Q, email=_PII_EMAIL,
            ssn=_PII_SSN, phone=_PII_PHONE, ipv4=_PII_IPV4,
        ),
        "k_anonymity": SQL_K_ANON,
        "bigram_logprob": SQL_BIGRAM_LP,
        "top_orders": SQL_TOP_ORDERS,
        "scd2_join": SQL_SCD2_JOIN,
        "snapshot_diff": SQL_SNAPSHOT_DIFF,
        "user_sequences": SQL_USER_SEQ,
        "length_batches": SQL_LENGTH_BATCHES,
        "negative_samples": SQL_NEG_SAMPLES,
        "session_cooccurrence": SQL_SESSION_COOC,
        "fuzzy_match": SQL_FUZZY,
        "fuzzy_match_snm": SQL_FUZZY_SNM,
        "calendar_features": SQL_CALENDAR,
        "pmi_collocations": SQL_PMI,
        "token_budget": SQL_TOKEN_BUDGET.format(stoplist=_STOPLIST_SQL),
        # sketch_distinct: rows-only by design (HLL estimates are not
        # cross-engine reproducible; see q_sketch_distinct docstring)
        # ann_ivf_pq: rows-only by design (codebooks from driver-side
        # NumPy k-means — no SQL engine reproduces them; the pytest
        # recall gate vs brute-force cosine is the correctness evidence)
        # quantile_bin_approx / profile_columns_approx: rows-only by
        # design (GK / HLL++ sketch outputs are deterministic for Spark
        # but not reproducible by DuckDB; the exact strategy twins keep
        # the hash oracles, pytest bounds approx-vs-exact divergence)
    }
