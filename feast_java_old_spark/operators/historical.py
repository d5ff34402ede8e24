"""Historical (point-in-time / as-of) retrieval — J3's historical form.

The reference declares the semantics (``max_age`` + event-timestamp
metadata, ``OnlineServingServiceV2.checkOutsideMaxAge:358-371``) but
delegates historical retrieval to feast-spark; it is the natural
Spark-side win, implemented here as a first-class operator.

Semantics: for each entity row ``(keys..., request_ts)``, return the
feature values of the **latest source row with the same keys and
``event_ts <= request_ts``**, provided ``request_ts − event_ts <=
max_age`` (``max_age=0`` → no bound). Missing → nulls (NOT_FOUND).

Scale design — two physical strategies:

- ``strategy="union"`` (default): tag feature rows and request rows, union
  them, and run a single ``last(payload, ignoreNulls) over (partition by
  keys order by ts, is_request)`` pass. **One shuffle of (history +
  requests), no join blow-up** — per-key cost is linear in history length
  even when one hot key has millions of events and thousands of requests
  (the join strategy would produce their cross product before ranking).
  This is the classic distributed as-of-join formulation.
- ``strategy="join"``: range-join + ``row_number() == 1``. Cheaper only
  when requests are few and histories are short; kept for comparison and
  as the shape Catalyst can broadcast when the request side is tiny.
- ``strategy="bucketed"``: the **skew-resistant** union variant. The plain
  union strategy partitions its window by entity key alone, so one hot
  entity (a key with 10^9 events at 100 TB) serializes onto a single
  task. Bucketing salts the window partition with a time bucket:
  within-bucket rows window over ``(keys, bucket)``, and a per-(key,
  bucket) ``max(struct(...))`` summary (partial-aggregating, skew-immune)
  provides each request bucket's carry-in — the latest event from any
  earlier bucket. Max task size drops from |hot key's history| to |hot
  key's events per bucket|, tunable via ``bucket_duration``. Bonus: only
  buckets that contain requests are scanned at all (semi-join prune), so
  sparse request sets skip most of the history.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from feast_java_old_spark.operators.retrieval import (
    STATUS_NOT_FOUND,
    STATUS_OUTSIDE_MAX_AGE,
    STATUS_PRESENT,
    STATUS_NULL_VALUE,
)


def asof_join(
    requests: DataFrame,
    history: DataFrame,
    keys: Sequence[str],
    request_ts_col: str = "request_ts",
    event_ts_col: str = "event_timestamp",
    feature_cols: Optional[Sequence[str]] = None,
    max_age_secs: int = 0,
    strategy: str = "union",
    tiebreak_col: Optional[str] = None,
    bucket_duration_secs: int = 7 * 86400,
) -> DataFrame:
    """As-of join ``requests`` to the latest ``history`` row per key.

    Returns ``requests``'s columns plus one ``event_timestamp`` column
    (the matched row's event time, null when unmatched) and the feature
    columns (null when unmatched or outside ``max_age_secs``).
    ``tiebreak_col`` (a unique history column, e.g. an event id) makes the
    winner among equal-timestamp history rows deterministic: highest wins.
    """
    keys = list(keys)
    if feature_cols is None:
        feature_cols = [
            c for c in history.columns if c not in keys and c != event_ts_col
        ]
    feature_cols = list(feature_cols)

    if strategy == "union":
        out = _asof_union(
            requests, history, keys, request_ts_col, event_ts_col, feature_cols,
            tiebreak_col,
        )
    elif strategy == "join":
        out = _asof_range_join(
            requests, history, keys, request_ts_col, event_ts_col, feature_cols,
            tiebreak_col,
        )
    elif strategy == "bucketed":
        out = _asof_bucketed(
            requests, history, keys, request_ts_col, event_ts_col, feature_cols,
            tiebreak_col, bucket_duration_secs,
        )
    else:
        raise ValueError(f"unknown strategy {strategy!r}")

    if max_age_secs and max_age_secs > 0:
        age = (
            F.col(request_ts_col).cast("timestamp").cast("long")
            - F.col(event_ts_col).cast("timestamp").cast("long")
        )
        stale = F.col(event_ts_col).isNotNull() & (age > F.lit(max_age_secs))
        for c in feature_cols:
            out = out.withColumn(c, F.when(~stale, F.col(c)))
        out = out.withColumn(event_ts_col, F.when(~stale, F.col(event_ts_col)))
    return out


def _asof_union(
    requests: DataFrame,
    history: DataFrame,
    keys: list[str],
    request_ts_col: str,
    event_ts_col: str,
    feature_cols: list[str],
    tiebreak_col: Optional[str] = None,
) -> DataFrame:
    req_cols = [c for c in requests.columns]
    payload = F.struct(
        F.col(event_ts_col).alias("__ts"), *[F.col(c) for c in feature_cols]
    )
    tb = (
        F.col(tiebreak_col)
        if tiebreak_col
        else F.lit(0).cast("long")
    )
    h = history.select(
        *keys,
        F.col(event_ts_col).alias("__t"),
        F.lit(0).alias("__is_req"),
        tb.alias("__tb"),
        payload.alias("__payload"),
        *[F.lit(None).cast(requests.schema[c].dataType).alias(f"__r_{c}")
          for c in req_cols if c not in keys],
    )
    r = requests.select(
        *keys,
        F.col(request_ts_col).alias("__t"),
        F.lit(1).alias("__is_req"),
        F.lit(None).cast(h.schema["__tb"].dataType).alias("__tb"),
        F.lit(None).cast(h.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c).alias(f"__r_{c}") for c in req_cols if c not in keys],
    )
    # Feature rows sort before request rows at equal ts → `<=` inclusivity;
    # among equal-ts feature rows the highest tiebreak lands last → wins.
    w = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col("__t").asc(),
            F.col("__is_req").asc(),
            F.col("__tb").asc_nulls_last(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = h.unionByName(r).withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )
    out = u.where(F.col("__is_req") == 1).select(
        *keys,
        *[F.col(f"__r_{c}").alias(c) for c in req_cols if c not in keys],
        F.col("__match.__ts").alias(event_ts_col),
        *[F.col(f"__match.{c}").alias(c) for c in feature_cols],
    )
    return out


def _asof_bucketed(
    requests: DataFrame,
    history: DataFrame,
    keys: list[str],
    request_ts_col: str,
    event_ts_col: str,
    feature_cols: list[str],
    tiebreak_col: Optional[str],
    bucket_secs: int,
) -> DataFrame:
    """Skew-resistant as-of: window partitions salted with a time bucket.

    Three pieces, all skew-bounded:

    1. per-(key, bucket) ``max(struct(ts, tiebreak, payload))`` summaries —
       hash aggregate with map-side partial combine, so a hot key's events
       reduce before they shuffle;
    2. carry-in per request bucket — a mini as-of over the summaries
       (rows per key = number of buckets, not number of events);
    3. within-bucket tagged-union window over ``(keys, bucket)`` — the
       hot key's history is split across its buckets instead of one task.

    History buckets with no requests are dropped by a semi-join before
    the window — the dominant saving when requests cover a narrow time
    range of a long history.
    """
    req_cols = list(requests.columns)
    payload = F.struct(
        F.col(event_ts_col).alias("__ts"), *[F.col(c) for c in feature_cols]
    )
    tb = F.col(tiebreak_col) if tiebreak_col else F.lit(0).cast("long")

    def bkt(c: str) -> F.Column:
        return F.floor(F.col(c).cast("timestamp").cast("long") / F.lit(bucket_secs))

    h = history.select(
        *keys,
        bkt(event_ts_col).alias("__bkt"),
        F.col(event_ts_col).alias("__t"),
        tb.alias("__tb"),
        payload.alias("__payload"),
    )
    r_extra = [c for c in req_cols if c not in keys]
    r = requests.select(
        *keys,
        bkt(request_ts_col).alias("__bkt"),
        F.col(request_ts_col).alias("__t"),
        *[F.col(c).alias(f"__r_{c}") for c in r_extra],
    )
    req_buckets = r.select(*keys, "__bkt").distinct()

    best = F.struct(F.col("__t"), F.col("__tb"), F.col("__payload"))
    summ = h.groupBy(*keys, "__bkt").agg(F.max(best).alias("__best"))

    su = summ.select(*keys, "__bkt", F.lit(0).alias("__is_req"), "__best")
    ru = req_buckets.select(
        *keys,
        "__bkt",
        F.lit(1).alias("__is_req"),
        F.lit(None).cast(su.schema["__best"].dataType).alias("__best"),
    )
    # Request sorts BEFORE the same bucket's summary: carry-in must come
    # from strictly earlier buckets (same-bucket rows are in the window
    # below).
    wc = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__bkt").asc(), F.col("__is_req").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry = (
        su.unionByName(ru)
        .withColumn("__carry", F.last("__best", ignorenulls=True).over(wc))
        .where((F.col("__is_req") == 1) & F.col("__carry").isNotNull())
        .select(
            *keys,
            "__bkt",
            F.col("__carry.__t").alias("__t"),
            F.lit(0).alias("__is_req"),
            F.col("__carry.__tb").alias("__tb"),
            F.col("__carry.__payload").alias("__payload"),
        )
    )

    null_reqs = [
        F.lit(None).cast(requests.schema[c].dataType).alias(f"__r_{c}")
        for c in r_extra
    ]
    h_in = h.join(req_buckets, on=keys + ["__bkt"], how="left_semi").select(
        *keys, "__bkt", "__t", F.lit(0).alias("__is_req"), "__tb", "__payload",
        *null_reqs,
    )
    carry_in = carry.select(
        *keys, "__bkt", "__t", "__is_req", "__tb", "__payload", *null_reqs
    )
    r_in = r.select(
        *keys,
        "__bkt",
        "__t",
        F.lit(1).alias("__is_req"),
        F.lit(None).cast(h.schema["__tb"].dataType).alias("__tb"),
        F.lit(None).cast(h.schema["__payload"].dataType).alias("__payload"),
        *[F.col(f"__r_{c}") for c in r_extra],
    )
    w = (
        Window.partitionBy(*keys, "__bkt")
        .orderBy(
            F.col("__t").asc(),
            F.col("__is_req").asc(),
            F.col("__tb").asc_nulls_last(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = h_in.unionByName(carry_in).unionByName(r_in).withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )
    return u.where(F.col("__is_req") == 1).select(
        *keys,
        *[F.col(f"__r_{c}").alias(c) for c in r_extra],
        F.col("__match.__ts").alias(event_ts_col),
        *[F.col(f"__match.{c}").alias(c) for c in feature_cols],
    )


def _asof_range_join(
    requests: DataFrame,
    history: DataFrame,
    keys: list[str],
    request_ts_col: str,
    event_ts_col: str,
    feature_cols: list[str],
    tiebreak_col: Optional[str] = None,
) -> DataFrame:
    req = requests.withColumn("__req_id", F.monotonically_increasing_id())
    extra = [tiebreak_col] if tiebreak_col and tiebreak_col not in feature_cols else []
    h = history.select(
        *keys, F.col(event_ts_col), *[F.col(c) for c in feature_cols + extra]
    )
    joined = req.join(
        h,
        on=[req[k] == h[k] for k in keys]
        + [h[event_ts_col] <= req[request_ts_col]],
        how="left",
    ).drop(*[h[k] for k in keys])
    order = [F.col(event_ts_col).desc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).desc_nulls_last())
    w = Window.partitionBy("__req_id").orderBy(*order)
    out = (
        joined.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__req_id")
    )
    return out.drop(*extra) if extra else out


def get_historical_features(
    requests: DataFrame,
    history: DataFrame,
    keys: Sequence[str],
    request_ts_col: str = "request_ts",
    event_ts_col: str = "event_timestamp",
    feature_cols: Optional[Sequence[str]] = None,
    max_age_secs: int = 0,
    include_statuses: bool = False,
    strategy: str = "union",
    tiebreak_col: Optional[str] = None,
) -> DataFrame:
    """As-of join + the reference's per-field status vocabulary."""
    keys = list(keys)
    if feature_cols is None:
        feature_cols = [
            c for c in history.columns if c not in keys and c != event_ts_col
        ]
    feature_cols = list(feature_cols)

    # Statuses need the pre-max-age match info; apply max_age here instead.
    out = asof_join(
        requests,
        history,
        keys,
        request_ts_col,
        event_ts_col,
        feature_cols,
        max_age_secs=0,
        strategy=strategy,
        tiebreak_col=tiebreak_col,
    )
    found = F.col(event_ts_col).isNotNull()
    if max_age_secs and max_age_secs > 0:
        age = (
            F.col(request_ts_col).cast("timestamp").cast("long")
            - F.col(event_ts_col).cast("timestamp").cast("long")
        )
        outside = found & (age > F.lit(max_age_secs))
    else:
        outside = F.lit(False)
    for c in feature_cols:
        status = (
            F.when(~found, F.lit(STATUS_NOT_FOUND))
            .when(outside, F.lit(STATUS_OUTSIDE_MAX_AGE))
            .when(F.col(c).isNull(), F.lit(STATUS_NULL_VALUE))
            .otherwise(F.lit(STATUS_PRESENT))
        )
        out = out.withColumn(c, F.when(found & ~outside, F.col(c)))
        if include_statuses:
            out = out.withColumn(f"{c}__status", status)
    return out


def get_training_dataset(
    spark,
    registry,
    entity_df: DataFrame,
    feature_refs: Sequence[str],
    request_ts_col: str = "event_timestamp",
    project: str = "default",
    full_feature_names: bool = True,
    include_statuses: bool = False,
    strategy: str = "union",
    end_ts=None,
    start_ts=None,
) -> DataFrame:
    """Multi-table point-in-time training-set export (the feast
    ``get_historical_features(entity_df, features)`` API).

    For each referenced feature table: read its batch source conformed to
    the declared schema, as-of join against the entity frame on that
    table's entity keys, then merge the feature columns back by row
    index. Scale shape: one as-of shuffle per table, sized by that
    table's history + the entity frame; the merge-back joins are keyed on
    the entity frame's row index and the entity frame is typically the
    small side (broadcast). Independent tables are independent Spark
    jobs — on a cluster they pipeline concurrently.
    """
    from feast_java_old_spark.functions.refs import parse_feature_ref
    from feast_java_old_spark.operators.materialize import conform_batch_source

    refs = [parse_feature_ref(r) for r in feature_refs]
    by_table: dict[str, list] = {}
    for r in refs:
        by_table.setdefault(r.table, []).append(r)

    out = entity_df.withColumn("__row_idx", F.monotonically_increasing_id())
    base_cols = [c for c in entity_df.columns]
    for table_name, trefs in by_table.items():
        spec = registry.get_feature_table(table_name, project)
        history = conform_batch_source(
            spark, spec, end_ts=end_ts, start_ts=start_ts
        )
        keys = list(spec.entities)
        wanted = [r.name for r in trefs if spec.feature(r.name) is not None]
        req = out.select("__row_idx", *keys, F.col(request_ts_col).alias("__req_ts"))
        joined = get_historical_features(
            req,
            history,
            keys,
            request_ts_col="__req_ts",
            event_ts_col="event_timestamp",
            feature_cols=wanted,
            max_age_secs=spec.max_age_secs or 0,
            include_statuses=include_statuses,
            strategy=strategy,
            tiebreak_col=(
                spec.batch_source.created_timestamp_column or None
            ),
        )
        picks = ["__row_idx"]
        renames = []
        for r in trefs:
            vname = f"{r.table}__{r.name}" if full_feature_names else r.name
            if spec.feature(r.name) is None:
                continue
            renames.append((r.name, vname))
            picks.append(r.name)
            if include_statuses:
                picks.append(f"{r.name}__status")
        feat = joined.select(*picks)
        for src_name, vname in renames:
            feat = feat.withColumnRenamed(src_name, vname)
            if include_statuses:
                feat = feat.withColumnRenamed(
                    f"{src_name}__status", f"{vname}__status"
                )
        out = out.join(feat, on="__row_idx", how="left")
    return out.orderBy("__row_idx").drop("__row_idx")
