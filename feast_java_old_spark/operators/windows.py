"""Time-window operators: tumbling / sliding / session rollups.

Batch forms of the Structured Streaming windowed feature views
(SURVEY §2.6 extension; the reference declares stream sources —
``DataSource.java:104-116`` — but delegates windowed computation to an
external system, so these are the operators a user of the reference
would run elsewhere and can now run here).

All three use Spark's native window expressions (``F.window`` /
``F.session_window``) so the exact same aggregation code runs under
``readStream`` with a watermark (see ``streaming/ingest.py``) — that is
the point of expressing them this way rather than via manual bucketing.

Scale notes:
- Tumbling/sliding rollups are grouped aggregations with map-side
  partial combine; the only shuffle carries (window, key) partial
  aggregates — never raw events. A sliding window of duration D and
  slide S replicates each event D/S times *inside the aggregate
  expansion*, before partial aggregation, so the shuffle stays
  aggregate-sized at 100 TB.
- Session windows cannot pre-aggregate map-side (session identity is
  data-dependent), so the shuffle carries one row per event keyed by the
  session key — the theoretical minimum for gap-based sessions. Skewed
  keys (one user with millions of events) are the known hazard; AQE skew
  handling or pre-splitting by (key, day) bounds it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cents(col: Column) -> Column:
    """Integer-exact sum input (oracle-portable double → cents)."""
    return F.round(col * 100, 0).cast("long")


def tumbling_rollup(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    duration: str = "1 hour",
) -> DataFrame:
    """Fixed-bucket rollup: one row per (window, keys)."""
    return (
        df.groupBy(F.window(ts_col, duration).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_cents(F.col(value_col))).alias("sum_value_cents"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            *keys,
            "n_events",
            "sum_value_cents",
        )
    )


def sliding_rollup(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    duration: str = "1 hour",
    slide: str = "30 minutes",
) -> DataFrame:
    """Overlapping-bucket rollup: each event lands in duration/slide
    windows (Spark expands them before partial aggregation)."""
    return (
        df.groupBy(F.window(ts_col, duration, slide).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_cents(F.col(value_col))).alias("sum_value_cents"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            *keys,
            "n_events",
            "sum_value_cents",
        )
    )


def sliding_distinct(
    df: DataFrame,
    col: str,
    ts_col: str = "ts",
    duration: str = "6 hours",
    slide: str = "2 hours",
    strategy: str = "exact",
    rsd: float = 0.02,
) -> DataFrame:
    """Distinct-count over sliding windows (rolling unique users/keys —
    the audience-reach aggregate): each row expands to its
    duration/slide covering windows before the aggregate.

    ``strategy="exact"``: true ``count_distinct`` — Spark plans the
    distinct as a two-level aggregate over (window, value) pairs, so
    the shuffle carries each window's distinct VALUE SET. Correct, but
    at 100 TB the per-window value multiset is the thing that doesn't
    bound; the expansion factor (duration/slide) multiplies it.

    ``strategy="approx"``: HLL++ ``approx_count_distinct`` (relative
    error ``rsd``) — partial sketches merge map-side, the shuffle
    carries windows × kilobyte sketches regardless of cardinality: the
    100 TB path. Like the other sketch twins (quantile_bin_approx,
    profile_columns_approx), the approx form is gate-validated
    rows-only; exact keeps the hash oracle.

    Emits ``(window_start_us, n_distinct)``.
    """
    if strategy == "exact":
        agg = F.count_distinct(F.col(col))
    elif strategy == "approx":
        agg = F.approx_count_distinct(F.col(col), rsd)
    else:
        raise ValueError(f"unknown sliding_distinct strategy: {strategy!r}")
    return (
        df.groupBy(F.window(ts_col, duration, slide).alias("w"))
        .agg(agg.alias("n_distinct"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
        )
    )


def session_rollup(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    gap: str = "30 minutes",
) -> DataFrame:
    """Gap-based session rollup via native ``F.session_window``.

    A session groups consecutive events per key whose inter-arrival gap
    is <= ``gap`` (Spark merges an event at exactly ``last + gap`` —
    closed end, empirically verified); ``session_start_us`` is the first
    event's timestamp and ``span_us`` the first→last extent (not
    including the trailing gap), so the result is reproducible by any
    engine's lag/cumsum formulation with a strictly-greater gap test.
    """
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_cents(F.col(value_col))).alias("sum_value_cents"),
            F.unix_micros(F.max(ts_col)).alias("__last_us"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            *keys,
            "n_events",
            "sum_value_cents",
            (F.col("__last_us") - F.unix_micros(F.col("w.start"))).alias("span_us"),
        )
    )


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "event_timestamp",
    start_col: str = "start",
    end_col: str = "end",
    band_seconds: int = 86400,
) -> DataFrame:
    """Banded interval (range) join: each event joins every interval with
    ``start <= ts < end`` — expressed as a *hash equi-join*, not a theta
    join.

    Spark executes a raw ``ts BETWEEN start AND end`` predicate as a
    BroadcastNestedLoopJoin (or a cartesian product when neither side
    broadcasts) — quadratic and unpartitionable at 100 TB. The banding
    rewrite buckets time into ``band_seconds`` bands: events map to one
    band each (a projection); intervals explode to the bands they cover
    (``sequence`` — rows grow by interval_span/band, bounded by choosing
    the band near the typical interval length); the join becomes an
    equi-join on the band key (shuffle-partitionable, AQE-skew-handled)
    followed by the exact residual range filter. This is the standard
    range-join binning strategy Spark lacks natively.

    Event and interval column sets are both preserved; half-open bounds
    ``[start, end)`` so adjacent intervals never double-match.
    """
    ev_band = (F.unix_micros(F.col(ts_col)) / F.lit(band_seconds * 1_000_000)).cast(
        "long"
    )
    iv_lo = (F.unix_micros(F.col(start_col)) / F.lit(band_seconds * 1_000_000)).cast(
        "long"
    )
    iv_hi = (F.unix_micros(F.col(end_col)) / F.lit(band_seconds * 1_000_000)).cast(
        "long"
    )
    ev = events.withColumn("__band", ev_band)
    iv = intervals.withColumn("__band", F.explode(F.sequence(iv_lo, iv_hi)))
    return (
        ev.join(iv, on="__band")
        .where(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
        )
        .drop("__band")
    )


def sessionize(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap: str = "30 minutes",
) -> DataFrame:
    """Per-event session assignment (the row-level companion of
    :func:`session_rollup`): a new session starts when the gap to the
    previous event of the same key is *strictly greater* than ``gap`` —
    the same closed-end rule ``F.session_window`` uses, so an event's
    ``session_seq`` here groups it exactly as the rollup's windows do.

    lag + running-sum over a per-key window: one shuffle keyed by the
    session keys (the theoretical minimum — session identity is
    data-dependent, so no map-side combine exists). ``id_col`` breaks
    timestamp ties for full determinism.

    Appends ``session_seq`` (1-based ordinal of the session within its
    key) and ``gap_us`` (microseconds since the key's previous event;
    NULL for the first).
    """
    from pyspark.sql.window import Window

    # parse the gap via Spark's own interval literal at plan time
    gap_expr = F.unix_micros(
        F.lit("1970-01-01 00:00:00").cast("timestamp") + F.expr(f"INTERVAL {gap}")
    )
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col), F.col(id_col))
    prev_us = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    delta = F.unix_micros(F.col(ts_col)) - prev_us
    new_session = F.when(
        prev_us.isNull() | (delta > gap_expr), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy(*keys).orderBy(F.col(ts_col), F.col(id_col)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.select(
        *keys,
        F.col(id_col),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
        delta.alias("gap_us"),
        F.sum(new_session).over(run).cast("long").alias("session_seq"),
    )


def session_cooccurrence(
    df: DataFrame,
    keys: list[str],
    item_col: str,
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap: str = "30 minutes",
    min_count: int = 1,
) -> DataFrame:
    """Item-to-item co-occurrence within behavioral sessions — the
    counting kernel behind item-similarity recommenders ("users who did
    A in a session also did B"): sessionize, reduce each (session, item)
    to presence, then count sessions containing each unordered item
    pair.

    Plan shape: :func:`sessionize` is one entity-keyed shuffle; distinct
    (key, session, item) presence is a map-side-combined aggregate; the
    pair generation is a self-join keyed on the (key, session) tuple —
    bounded by Σ items-per-session², the within-group cost inherent to
    pair mining (sessions are short by construction of the gap rule —
    this is the SemDeDup argument at the session scale). Pair counts
    aggregate map-side; ``min_count`` prunes the tail before it reaches
    the driver.

    Returns ``(item_a, item_b, n_sessions)`` with ``item_a < item_b``.
    """
    sess = sessionize(df, keys, ts_col=ts_col, id_col=id_col, gap=gap).select(
        *keys, id_col, "session_seq"
    )
    items = df.select(*keys, F.col(id_col), F.col(item_col).alias("__it"))
    pres = (
        sess.join(items, on=[*keys, id_col])
        .select(*keys, "session_seq", "__it")
        .dropDuplicates([*keys, "session_seq", "__it"])
    )
    a = pres.withColumnRenamed("__it", "item_a")
    b = pres.withColumnRenamed("__it", "item_b")
    pairs = a.join(b, on=[*keys, "session_seq"]).where(
        F.col("item_a") < F.col("item_b")
    )
    return (
        pairs.groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .where(F.col("n_sessions") >= min_count)
    )


def event_transitions(
    events: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-entity event
    streams: ``(prev_type, next_type, n, prob)`` with ``prob`` the
    maximum-likelihood row-conditional ``n / Σ_next n`` rounded to 6 —
    the next-event model behind session recommendation and
    funnel-escape analysis, and the categorical counterpart of
    :func:`user sequences <feast_java_old_spark.operators.features.event_sequences>`.

    Plan shape: ONE entity-keyed shuffle into a ``lead()`` window
    (deterministic under timestamp ties via the tiebreak column —
    nondeterministic pair extraction is the classic silent bug here),
    then a transition-matrix-sized aggregate (|types|² rows at most)
    with map-side combine; row totals derive from a window over that
    tiny matrix, never a second corpus pass.  Cross-entity pairs never
    form: the window partition bound is the correctness fence.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    pairs = (
        events.select(
            F.col(type_col).alias("prev_type"),
            F.lead(type_col).over(w).alias("next_type"),
        )
        .where(F.col("next_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    wt = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wt), 6).alias("prob"),
    )


def last_touch_attribution(
    events: DataFrame,
    conversion_type: str,
    touch_types: list[str],
    lookback_secs: int,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Last-touch attribution: each conversion event is credited to the
    LATEST strictly-preceding touch event of an eligible type within
    ``lookback_secs`` on the same entity — the marketing/causal
    companion of :func:`funnel <feast_java_old_spark.operators.features.funnel>`
    (which asks "did the sequence complete", where this asks "which
    touch gets the credit").

    Plan shape: ONE entity-keyed window pass — ``last(when(touch),
    ignorenulls)`` over ``rows unbounded preceding → -1`` carries the
    most recent touch to every row (strictly preceding: a conversion
    sharing a timestamp with a touch credits only if the touch sorts
    first by the tiebreak) — then a codegen lookback filter.  No
    self-join, no per-conversion scan: cost is one shuffle + one sorted
    pass regardless of touch fan-out, the same O(n) shape as every
    ordered-sequence operator here.  Unattributed conversions are kept
    with NULL touch columns (they are the interesting rows: paid
    conversions with no tracked touch).  Timestamps are exact integer
    microseconds end-to-end.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(tiebreak_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col(type_col).isin(list(touch_types))
    touch = F.last(
        F.when(
            is_touch,
            F.struct(
                F.unix_micros(F.col(ts_col)).alias("t_us"),
                F.col(tiebreak_col).alias("t_id"),
                F.col(type_col).alias("t_type"),
            ),
        ),
        ignorenulls=True,
    ).over(w)
    conv = (
        events.withColumn("__touch", touch)
        .where(F.col(type_col) == conversion_type)
        .select(
            F.col(key_col),
            F.col(tiebreak_col).alias("conversion_id"),
            F.unix_micros(F.col(ts_col)).alias("conversion_us"),
            F.col("__touch.t_id").alias("touch_id"),
            F.col("__touch.t_type").alias("touch_type"),
            (F.unix_micros(F.col(ts_col)) - F.col("__touch.t_us")).alias(
                "touch_age_us"
            ),
        )
    )
    horizon = F.lit(int(lookback_secs)).cast("long") * 1_000_000
    in_window = F.col("touch_age_us") <= horizon
    return conv.select(
        key_col,
        "conversion_id",
        "conversion_us",
        F.when(in_window, F.col("touch_id")).alias("touch_id"),
        F.when(in_window, F.col("touch_type")).alias("touch_type"),
        F.when(in_window, F.col("touch_age_us")).alias("touch_age_us"),
    )
