"""Feature-engineering operators: multi-horizon rollups, per-event
rolling aggregates, long→wide pivots, and nearest-in-time joins.

These are the batch feature-computation patterns a user of the reference
feature store runs upstream of materialization (the reference declares
the sources and the serving join — ``DataSource.java``,
``OnlineServingServiceV2.java`` — and delegates feature *computation* to
an external engine; these operators are that engine, Spark-first).

Scale notes (each operator's plan shape at 100 TB):

- :func:`multi_window_features` computes every horizon in ONE scan and
  ONE shuffle: the horizon predicates become conditional aggregates
  (``sum(CASE WHEN ts >= anchor - h …)``) with map-side partial combine,
  so the shuffle carries one partial-aggregate row per (key, task) —
  never raw events — regardless of how many horizons are requested.
- :func:`rolling_features` is a per-key event-time window
  (``RANGE BETWEEN <w> PRECEDING AND CURRENT ROW``): one shuffle keyed
  by the entity key (the theoretical minimum — trailing state is
  data-dependent), then a single sorted pass per key. Value-based RANGE
  frames make the result independent of timestamp-tie ordering.
- :func:`feature_pivot` with an *explicit* name list is one grouped
  aggregation (map-side combined); never call it without ``names`` at
  scale — Spark would first run a distinct scan to discover them.
- :func:`asof_nearest` is the banded-equi-join form of "join each left
  row to the temporally nearest right row within a tolerance": left rows
  map to one time band, right rows replicate to the 3 adjacent bands,
  the join is a hash equi-join on (keys, band) — shuffle-partitionable,
  AQE-skew-handled, never BroadcastNestedLoop — and the argmin is a
  ``min(struct(|Δt|, tiebreak…))`` aggregate with map-side combine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_US = 1_000_000


def _cents(col: Column) -> Column:
    """Integer-exact aggregate input (oracle-portable double → cents)."""
    return F.round(col * 100, 0).cast("long")


def multi_window_features(
    df: DataFrame,
    keys: list[str],
    anchor_ts: str,
    horizons: dict[str, int],
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key activity counts/sums over multiple trailing horizons, all
    ending at ``anchor_ts`` (an ISO timestamp literal — explicit for
    determinism, mirroring the reference's explicit ``entity_ts``
    convention in historical retrieval).

    ``horizons`` maps a suffix (e.g. ``"24h"``) to a horizon length in
    seconds. Emits ``n_<suffix>`` / ``sum_cents_<suffix>`` per key, for
    events in ``(anchor - h, anchor]``.

    One scan, one aggregate-sized shuffle, however many horizons: each
    horizon is a conditional aggregate, not a separate scan or join.
    """
    anchor = F.lit(anchor_ts).cast("timestamp")
    ts = F.col(ts_col)
    in_scope = df.where(ts <= anchor)
    aggs: list[Column] = []
    for suffix, secs in horizons.items():
        cond = ts > anchor - F.expr(f"INTERVAL {secs} SECONDS")
        aggs.append(F.count(F.when(cond, F.lit(1))).alias(f"n_{suffix}"))
        aggs.append(
            F.coalesce(
                F.sum(F.when(cond, _cents(F.col(value_col)))), F.lit(0)
            ).alias(f"sum_cents_{suffix}")
        )
    return in_scope.groupBy(*keys).agg(*aggs)


def rolling_features(
    df: DataFrame,
    keys: list[str],
    window_seconds: int,
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-event trailing-window aggregates: for every event, the count
    and cents-sum of the same key's events in the last
    ``window_seconds`` (inclusive of the current event).

    Implemented as a value-based RANGE frame over event time — NOT a
    self-join: one shuffle on the entity key, one sorted pass. The frame
    is ``[ts - w, ts]`` by *value*, so rows with equal timestamps see
    identical (and order-independent) results — this is what makes the
    kernel deterministic under Spark's unstable sort and portable to any
    engine with RANGE frames.
    """
    from pyspark.sql.window import Window

    ts_us = F.unix_micros(F.col(ts_col))
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_us.alias("__ts_us"))
        .rangeBetween(-window_seconds * _US, 0)
    )
    return df.select(
        *keys,
        F.col(id_col),
        ts_us.alias("ts_us"),
        F.count(F.lit(1)).over(w).alias("n_trailing"),
        F.sum(_cents(F.col(value_col))).over(w).alias("sum_cents_trailing"),
    )


def feature_pivot(
    df: DataFrame,
    keys: list[str],
    name_col: str,
    names: list[str],
    value_col: str = "value",
) -> DataFrame:
    """Long → wide: one row per key, one ``sum_cents_<name>`` column per
    entry in ``names`` (the EAV-to-columnar step that turns an event log
    into a feature row, e.g. per-user spend by event type).

    ``names`` is required: with explicit pivot values Spark plans a
    single grouped aggregation (each pivot column is a conditional
    aggregate, map-side combined); without them it must first run a
    distinct scan over ``name_col`` — a second full pass at 100 TB.
    Unlisted names are dropped; keys with no listed name still appear
    (zero-filled) only if they have at least one event of any listed
    name — semantics identical to the CASE-WHEN SQL form.
    """
    pivoted = (
        df.where(F.col(name_col).isin(names))
        .groupBy(*keys)
        .pivot(name_col, names)
        .agg(F.sum(_cents(F.col(value_col))))
    )
    # a key with no events of some listed name gets NULL from the pivot
    # (that aggregate never ran) — zero-fill to match the CASE-WHEN form
    renames = [
        F.coalesce(F.col(c), F.lit(0)).alias(f"sum_cents_{c}")
        if c in names
        else F.col(c)
        for c in pivoted.columns
    ]
    return pivoted.select(*renames)


def asof_nearest(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    tolerance_seconds: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    left_id: str = "event_id",
    right_id: str = "event_id",
    right_payload: list[str] | None = None,
) -> DataFrame:
    """Nearest-in-time join: each left row pairs with the single right
    row of the same key whose timestamp is closest (either direction)
    within ``tolerance_seconds``; ties on ``|Δt|`` resolve to the
    *earlier* right timestamp, then the smaller ``right_id``. Left rows
    with no candidate in tolerance are kept with NULL matches (the
    bidirectional generalization of the backward-only as-of join in
    ``operators/historical.py``; the reference's staleness join —
    ``OnlineServingServiceV2.java`` max-age — is the backward special
    case).

    Plan shape: band time by the tolerance; left rows carry one band,
    right rows replicate to the 3 adjacent bands (any pair within
    tolerance shares one of them — bounded 3× replication, no interval
    explode). The join is a hash equi-join on (keys, band); a candidate
    right row can match a given left row through exactly one band, so no
    pair dedup is needed. The argmin is ``min(struct(...))`` with
    map-side partial combine — the shuffle after the join carries one
    partial row per (left row, task).
    """
    right_payload = right_payload or []
    tol_us = tolerance_seconds * _US
    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))

    lt = left.select(
        *keys,
        F.col(left_id).alias("__lid"),
        l_us.alias("__l_us"),
        (l_us / tol_us).cast("long").alias("__band"),
    )
    rt = right.select(
        *keys,
        F.col(right_id).alias("__rid"),
        r_us.alias("__r_us"),
        *[F.col(c).alias(f"__rp_{c}") for c in right_payload],
        F.explode(
            F.array(
                (r_us / tol_us).cast("long") - 1,
                (r_us / tol_us).cast("long"),
                (r_us / tol_us).cast("long") + 1,
            )
        ).alias("__band"),
    )
    delta = F.col("__r_us") - F.col("__l_us")
    best = (
        lt.join(rt, on=[*keys, "__band"])
        .where(F.abs(delta) <= tol_us)
        .groupBy("__lid")
        .agg(
            F.min(
                F.struct(
                    F.abs(delta).alias("abs_us"),
                    F.col("__r_us").alias("r_us"),
                    F.col("__rid").alias("rid"),
                    *[F.col(f"__rp_{c}").alias(c) for c in right_payload],
                )
            ).alias("__best")
        )
    )
    out = (
        lt.drop("__band")
        .join(best, on="__lid", how="left")
        .select(
            *keys,
            F.col("__lid").alias(left_id),
            F.col("__l_us").alias("ts_us"),
            F.col("__best.rid").alias(f"nearest_{right_id}"),
            F.col("__best.r_us").alias("nearest_ts_us"),
            (F.col("__best.r_us") - F.col("__l_us")).alias("delta_us"),
            *[F.col(f"__best.{c}").alias(f"nearest_{c}") for c in right_payload],
        )
    )
    return out


def target_encode(
    df: DataFrame,
    cat_cols: list[str],
    label_col: str,
    smoothing: float = 20.0,
) -> DataFrame:
    """Smoothed target (mean) encoding of categorical columns — the
    leakage-averse categorical featurization: a category's code shrinks
    toward the global mean when its support is small,
    ``(sum_cat + m * global_mean) / (n_cat + m)``.

    Determinism across engines: both sums are integer cents (exact), the
    global mean is one exact-int division, and the encoding is a fixed
    sequence of double ops on those exact inputs — so the
    micro-quantized code is bit-reproducible. Plan shape: one grouped
    aggregate over the categories + a 1-row global aggregate broadcast
    into the projection; the shuffle carries category partials only.
    """
    cents = _cents(F.col(label_col))
    glob = df.agg(
        F.sum(cents).alias("__g_sum"), F.count(F.lit(1)).alias("__g_n")
    )
    per_cat = df.groupBy(*cat_cols).agg(
        F.sum(cents).alias("__c_sum"), F.count(F.lit(1)).alias("n")
    )
    enc = (
        F.col("__c_sum") + F.lit(smoothing) * (F.col("__g_sum") / F.col("__g_n"))
    ) / (F.col("n") + F.lit(smoothing))
    return (
        per_cat.crossJoin(F.broadcast(glob))
        .select(
            *cat_cols,
            "n",
            F.round(enc * 1_000_000, 0).cast("long").alias("enc_cents_micro"),
        )
    )


def winsorize(
    df: DataFrame,
    keys: list[str],
    col: str = "value",
    lo: float = 0.01,
    hi: float = 0.99,
    id_col: str = "event_id",
) -> DataFrame:
    """Per-group percentile clipping (outlier winsorization before
    normalization/training): values outside the group's [lo, hi] exact
    percentiles clamp to the bound.

    Two jobs over one scan shape: an exact-percentile aggregate per
    group (small — one row per group) broadcast back into a clip
    projection; the raw data never shuffles. At 100 TB swap the exact
    percentile for ``operators/sketches.approx_quantiles`` (same join
    shape, bounded state) — exact group percentiles are a sort per
    group.
    """
    # ONE array-argument percentile, not two scalar ones: each Percentile
    # aggregate buffers the group's full value multiset independently, so
    # two scalar calls build (and merge, and sort) that per-group state
    # twice for one answer pair. The array form computes both bounds from
    # a single buffer — identical interpolation, half the aggregation
    # state and sort work (r16, guide §1.2 per-task work).
    bounds = (
        df.groupBy(*keys)
        .agg(
            F.percentile(
                F.col(col), F.array(F.lit(lo), F.lit(hi))
            ).alias("__b")
        )
        .select(
            *keys,
            F.element_at("__b", 1).alias("__lo_v"),
            F.element_at("__b", 2).alias("__hi_v"),
        )
    )
    clipped = F.least(F.greatest(F.col(col), F.col("__lo_v")), F.col("__hi_v"))
    return (
        df.join(F.broadcast(bounds), on=keys)
        .select(
            *keys,
            F.col(id_col),
            F.round(F.col(col), 6).alias("value_raw"),
            F.round(clipped, 6).alias("value_winsorized"),
            (
                (F.col(col) < F.col("__lo_v")) | (F.col(col) > F.col("__hi_v"))
            )
            .cast("int")
            .alias("was_clipped"),
        )
    )


def scd2_history(
    df: DataFrame,
    keys: list[str],
    attr_cols: list[str],
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change log: per
    key, collapse consecutive rows whose tracked attributes are
    unchanged, then emit validity intervals ``[valid_from, valid_to)``
    with ``valid_to`` NULL on the current version.

    This is the batch construction of the point-in-time-correct history
    the reference serves from (latest-wins online rows are exactly the
    ``is_current`` slice; ``historical.asof_join`` against the full
    output reproduces any past state).

    Plan shape: two window passes over ONE hash exchange on the entity
    key (the change-detect ``lag`` and the interval ``lead`` share the
    partitioning, so Catalyst reuses the exchange; only a per-partition
    sort runs twice). The shuffle is the theoretical minimum — interval
    boundaries are data-dependent per key. Rows with equal timestamps
    order by ``id_col`` for determinism, matching the
    ``created_timestamp`` tie-break of ``materialize.latest_per_key``
    (reference: FeatureRowDecoder latest-wins semantics).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys).orderBy(F.col(ts_col), F.col(id_col))
    changed = F.lit(False)
    for a in attr_cols:
        prev = F.lag(F.col(a)).over(w)
        changed = changed | ~F.col(a).eqNullSafe(prev)
    first = F.row_number().over(w) == 1
    kept = df.select(
        *keys, ts_col, id_col, *attr_cols,
        (first | changed).alias("__is_change"),
    ).where("__is_change")
    w2 = Window.partitionBy(*keys).orderBy(F.col(ts_col), F.col(id_col))
    return kept.select(
        *keys,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("long").alias("version"),
        F.lead(F.col(ts_col)).over(w2).isNull().alias("is_current"),
    )


def quantile_bin(
    df: DataFrame,
    col: str = "value",
    k: int = 10,
    id_col: str = "event_id",
    strategy: str = "exact",
    accuracy: int = 10_000,
) -> DataFrame:
    """Equal-frequency discretization: assign each row the 1-based
    quantile bucket of ``col`` among ``k`` buckets whose edges are the
    exact ``i/k`` percentiles (linear interpolation — the ANSI
    ``percentile_cont`` definition, so any engine derives identical
    edges).

    Plan shape: the edge computation is ONE tiny aggregate (k-1 doubles
    in a single row) broadcast back over the scan; assignment is a pure
    projection (``size(filter(edges, e -> v > e)) + 1``) — the data
    itself never shuffles, exactly the :func:`winsorize` /
    ``kmeans_step`` literal-broadcast shape. Edges round to 6 places so
    bin membership is engine-portable.

    ``strategy="approx"`` is the 100 TB path: Greenwald-Khanna
    ``percentile_approx`` edges (rank error ≤ n/``accuracy``, partials
    merge map-side — bounded state per task instead of the exact
    aggregate's full value multiset), same broadcast + pure-projection
    assignment. Edge VALUES may differ from exact by the rank-error
    bound, so approx results are validated rows-only by the gate (like
    ``sketch_distinct``); the exact strategy keeps the hash oracle.
    """
    if strategy == "approx":
        edges = df.agg(
            F.transform(
                F.percentile_approx(
                    F.col(col), [i / k for i in range(1, k)], accuracy
                ),
                lambda e: F.round(e, 6),
            ).alias("__edges")
        )
    elif strategy == "exact":
        # ONE array-argument percentile, not k-1 scalar ones: every
        # scalar Percentile aggregate buffers the FULL value multiset
        # (an OpenHashMap of value→count per task, merged per edge), so
        # the k-1-call form built that state k-1 times over — ~9x the
        # aggregation memory, merge traffic and per-edge sort for one
        # edge vector. The array form derives all edges from a single
        # buffer with identical percentile_cont interpolation, so edge
        # values (and the oracle hash) are unchanged (r16, guide §1.2).
        edges = df.agg(
            F.transform(
                F.percentile(
                    F.col(col),
                    F.array(*[F.lit(i / k) for i in range(1, k)]),
                ),
                lambda e: F.round(e, 6),
            ).alias("__edges")
        )
    else:
        raise ValueError(f"unknown quantile_bin strategy: {strategy!r}")
    return (
        df.crossJoin(F.broadcast(edges))
        .select(
            F.col(id_col),
            F.round(F.col(col), 6).alias("value"),
            (
                F.size(
                    F.filter(
                        F.col("__edges"),
                        lambda e: F.col(col) > e,
                    )
                )
                + 1
            )
            .cast("long")
            .alias("bin"),
        )
    )


def weighted_quantiles(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    group_cols: list[str],
    quantiles: tuple[tuple[int, int], ...] | None = None,
) -> DataFrame:
    """EXACT weighted quantiles per group: the q-quantile is the
    smallest value v with cumulative weight W(≤v) ≥ q·W_total — the
    weighted generalization :func:`quantile_bin` can't express
    (``percentile_cont`` weighs every row equally; a corpus quantile
    weighted by token count, or a price quantile weighted by quantity,
    needs the weighted CDF).

    ``quantiles`` are INTEGER fractions (num, den): with integer
    weights the defining inequality is evaluated as
    ``den·W(≤v) ≥ num·W_total`` — pure BIGINT comparison, no float
    boundary for an oracle to disagree on.

    Plan shape: (1) pre-aggregate weight per (group, value) —
    map-side-combined, collapses ties so the window never sees
    duplicate ordering keys; (2) ONE per-group window pass computes the
    running and total weight (same partitioning, one sort — rows =
    distinct values per group, not input rows); (3) a conditional-min
    aggregate emits all requested quantiles in one row per group.
    Nothing collects; the only shuffle after the pre-aggregate carries
    distinct (group, value) rows.
    """
    from pyspark.sql.window import Window

    if quantiles is None:
        quantiles = ((1, 4), (2, 4), (3, 4))
    pv = df.groupBy(
        *group_cols, F.col(value_col).alias("__v")
    ).agg(F.sum(F.col(weight_col).cast("long")).alias("__w"))
    wcum = Window.partitionBy(*group_cols).orderBy("__v")
    wall = Window.partitionBy(*group_cols)
    c = pv.select(
        *group_cols,
        "__v",
        F.sum("__w").over(wcum).alias("__cw"),
        F.sum("__w").over(wall).alias("__tw"),
    )
    aggs = []
    for num, den in quantiles:
        name = f"p{round(100 * num / den)}"
        aggs.append(
            F.min(
                F.when(
                    F.col("__cw") * den >= F.col("__tw") * num, F.col("__v")
                )
            ).alias(name)
        )
    return c.groupBy(*group_cols).agg(
        F.max("__tw").alias("total_weight"), *aggs
    )


def robust_outliers(
    df: DataFrame,
    keys: list[str],
    col: str = "value",
    id_col: str = "event_id",
    z: float = 3.5,
) -> DataFrame:
    """Per-group robust outlier detection via the modified z-score
    (Iglewicz-Hoaglin): ``0.6745·(x − median) / MAD`` with MAD the
    median absolute deviation — unlike mean/std z-scores, a single
    extreme value cannot drag the threshold toward itself (50%
    breakdown point vs 0%), which is what makes this the standard
    screen for long-tailed telemetry and label noise.

    Plan: two grouped EXACT-percentile aggregates (median, then MAD
    over the deviations) — each a group-sized single row — broadcast
    back onto the scan; the flag is a pure projection. The 100 TB swap
    is ``sketches.approx_quantiles`` for both medians (same
    broadcast-edges shape, documented like winsorize/quantile_bin).
    Groups with MAD = 0 (over half the values identical) emit NULL
    z-scores and flag only exact deviants as outliers.
    """
    med = df.groupBy(*keys).agg(
        F.round(F.percentile(F.col(col), F.lit(0.5)), 6).alias("__med")
    )
    dev = df.join(F.broadcast(med), keys).withColumn(
        "__adev", F.abs(F.col(col) - F.col("__med"))
    )
    mad = dev.groupBy(*keys).agg(
        F.round(F.percentile(F.col("__adev"), F.lit(0.5)), 6).alias("__mad")
    )
    scored = dev.join(F.broadcast(mad), keys).withColumn(
        "mod_z",
        F.when(
            F.col("__mad") > 0,
            F.round(
                F.lit(0.6745) * (F.col(col) - F.col("__med")) / F.col("__mad"),
                6,
            ),
        ),
    )
    return scored.select(
        *keys,
        F.col(id_col),
        F.col(col),
        F.col("__med").alias("group_median"),
        F.col("__mad").alias("group_mad"),
        "mod_z",
        F.when(F.col("__mad") > 0, F.abs(F.col("mod_z")) > z)
        .otherwise(F.col(col) != F.col("__med"))
        .alias("is_outlier"),
    )


def resample_ffill(
    df: DataFrame,
    keys: list[str],
    start_ts: str,
    end_ts: str,
    step_seconds: int,
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Regular-grid resampling with forward fill: for every key and
    every grid instant in ``[start_ts, end_ts]`` (step
    ``step_seconds``), the most recent observation at-or-before that
    instant (NULL before a key's first event) — the classic
    time-series → feature-matrix alignment step, and exactly the
    repeated-``asof_join`` semantics collapsed into one pass.

    Plan shape: grid rows are generated with ``sequence``/``explode``
    from each key's (tiny, aggregated) presence row — no driver loop,
    no cross join against a collected key list. The union of real
    events and grid probes makes ONE hash exchange on the key; a single
    sorted pass computes ``last(value, ignorenulls)`` with a
    ``(ts, is_probe, id)`` ordering so probes at an event's exact
    timestamp see that event, and equal-timestamp events resolve by
    ``id_col`` (the materialize tie-break). This is the same
    union-window shape as ``historical.asof_join`` — linear, skew-bound
    by the hottest key, never a per-grid-point join.
    """
    from pyspark.sql.window import Window

    start = F.lit(start_ts).cast("timestamp")
    end = F.lit(end_ts).cast("timestamp")
    step = F.expr(f"INTERVAL {step_seconds} SECONDS")
    grid = (
        df.groupBy(*keys)
        .agg(F.lit(1).alias("__one"))
        .select(
            *keys,
            F.explode(F.sequence(start, end, step)).alias("__ts"),
        )
        .select(
            *keys,
            F.col("__ts"),
            F.lit(None).cast("double").alias("__v"),
            F.lit(1).alias("__probe"),
            F.lit(None).cast("long").alias("__id"),
        )
    )
    obs = df.select(
        *keys,
        F.col(ts_col).alias("__ts"),
        F.col(value_col).cast("double").alias("__v"),
        F.lit(0).alias("__probe"),
        F.col(id_col).cast("long").alias("__id"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__probe", "__id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        obs.unionByName(grid)
        .select(
            *keys,
            F.col("__ts"),
            F.col("__probe"),
            F.round(
                F.last(F.col("__v"), ignorenulls=True).over(w), 6
            ).alias("value_ffill"),
        )
        .where(F.col("__probe") == 1)
        .select(*keys, F.col("__ts").alias("grid_ts"), "value_ffill")
    )


def normalize_features(
    df: DataFrame,
    keys: list[str],
    col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-group feature scaling in one pass: z-score (sample stddev),
    min-max, and percent rank — the three standard normalizations
    applied before training, each computed against the row's own
    group.

    Plan shape: two window specs over the SAME partitioning (an
    unordered unbounded frame for the moments, an ordered one for
    percent_rank) — ONE hash exchange, one sort; the group moments are
    never materialized as a separate joined table. Ties in
    ``percent_rank`` share a rank (SQL standard), so the output is
    deterministic without an id tiebreak; z-score and min-max guard
    zero-variance groups with NULL.

    NULL contract: a NULL value gets NULL for all three normalizations
    (the moments already ignore NULLs in every engine), and the rank
    ordering pins NULLS LAST explicitly — Spark's ASC default is NULLS
    FIRST while DuckDB/Postgres default NULLS LAST, which would shift
    every non-NULL row's percent_rank between engines (caught by the
    NULL-injected oracle sweep, r9).
    """
    from pyspark.sql.window import Window

    wg = Window.partitionBy(*keys)
    wo = Window.partitionBy(*keys).orderBy(F.col(col).asc_nulls_last())
    v = F.col(col)
    mean = F.avg(v).over(wg)
    sd = F.stddev_samp(v).over(wg)
    mn = F.min(v).over(wg)
    mx = F.max(v).over(wg)
    return df.select(
        *keys,
        F.col(id_col),
        F.round(v, 6).alias("value"),
        F.round(
            F.when(sd > 0, (v - mean) / sd), 6
        ).alias("zscore"),
        F.round(
            F.when(mx > mn, (v - mn) / (mx - mn)), 6
        ).alias("minmax"),
        F.when(
            v.isNotNull(), F.round(F.percent_rank().over(wo), 6)
        ).alias("pct_rank"),
    )


def funnel(
    df: DataFrame,
    keys: list[str],
    stages: list[str],
    stage_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Strict-order funnel analysis: per key, the first time each stage
    was reached with every prior stage strictly earlier —
    ``stage k`` counts only at a timestamp strictly after ``stage k-1``
    was first reached (the product-analytics conversion query;
    analytics engines ship it as a MATCH_RECOGNIZE / windowFunnel
    special form).

    Plan shape: ONE scan and ONE aggregate-sized shuffle for any number
    of stages. Events outside the stage list are filtered before the
    shuffle; each key's stage events are gathered with
    ``sort_array(collect_list(struct(ts, stage)))`` — state bounded by
    that key's *stage* events only — and the strict-order walk is a
    single JVM ``aggregate`` fold over the sorted list, not a per-stage
    self-join (k-1 joins) or k sequential aggregates.

    Emits per key: ``ts_<i>_us`` per stage (unix µs, NULL once the
    funnel broke) and ``stages_reached``.
    """
    stage_idx = {s: i for i, s in enumerate(stages)}
    k = len(stages)
    evs = df.where(F.col(stage_col).isin(stages)).select(
        *keys,
        F.unix_micros(F.col(ts_col)).alias("__ts_us"),
        F.col(stage_col).alias("__stage"),
    )
    gathered = evs.groupBy(*keys).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("__ts_us"), F.col("__stage")))
        ).alias("__evs")
    )
    # Fold state: array<bigint> of length k, t[i] = first valid ts of
    # stage i (null until reached). Stage 0 takes its first event;
    # stage i takes the first event strictly after t[i-1].
    idx_expr = "CASE " + " ".join(
        f"WHEN x.__stage = '{s}' THEN {i}" for s, i in stage_idx.items()
    ) + " END"
    fold = f"""
    aggregate(
      __evs,
      CAST(array({", ".join(["NULL"] * k)}) AS array<bigint>),
      (acc, x) -> (
        CASE
          WHEN acc[{idx_expr}] IS NOT NULL THEN acc
          WHEN {idx_expr} = 0
            THEN concat(array(x.__ts_us), slice(acc, 2, {k - 1}))
          WHEN acc[{idx_expr} - 1] IS NOT NULL
               AND x.__ts_us > acc[{idx_expr} - 1]
            THEN concat(slice(acc, 1, {idx_expr}),
                        array(x.__ts_us),
                        slice(acc, {idx_expr} + 2, {k}))
          ELSE acc
        END))
    """
    out = gathered.select(*keys, F.expr(fold).alias("__t"))
    return out.select(
        *keys,
        *[
            F.element_at(F.col("__t"), i + 1).alias(f"ts_{i + 1}_us")
            for i in range(k)
        ],
        F.size(F.filter(F.col("__t"), lambda t: t.isNotNull()))
        .cast("long")
        .alias("stages_reached"),
    )


def cohort_retention(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix: users grouped by the period of their
    first event (the cohort), counted distinct in each later period
    offset — the standard growth-analytics triangle.

    Plan shape: the per-user first-event aggregate is user-sized
    (map-side combined); joining it back to events shuffles only
    ``(user, ts)`` scalars on the user key (at 100 TB the user-cohort
    table usually broadcasts instead — same semantics, zero wide
    shuffle); the final (cohort, offset) distinct-count is a
    grouping-sized aggregate. Periods are fixed ``period_days`` windows
    from the global epoch (date_trunc-stable across engines).
    """
    period_us = period_days * 86400 * 1_000_000
    ev = df.select(*keys, F.unix_micros(F.col(ts_col)).alias("__ts_us"))
    first = ev.groupBy(*keys).agg(F.min("__ts_us").alias("__first_us"))
    joined = ev.join(F.broadcast(first), on=keys)
    cohort = F.floor(F.col("__first_us") / period_us).cast("long")
    offset = (
        F.floor(F.col("__ts_us") / period_us) - F.floor(F.col("__first_us") / period_us)
    ).cast("long")
    return (
        joined.select(*keys, cohort.alias("cohort_period"), offset.alias("period_offset"))
        .groupBy("cohort_period", "period_offset")
        .agg(F.count_distinct(*[F.col(c) for c in keys]).alias("n_active"))
    )


def snapshot_at(
    history: DataFrame,
    at_ts: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Time-travel read of a :func:`scd2_history` table: the row version
    valid at ``at_ts`` per key — ``valid_from <= t < valid_to`` with an
    open-ended current version. A pure filter (partition- and
    stats-prunable at the scan when the history is stored partitioned
    by ``valid_from``); reconstructing any past online-store state is
    this filter plus nothing.
    """
    t = F.lit(at_ts).cast("timestamp")
    return history.where(
        (F.col(from_col) <= t)
        & (F.col(to_col).isNull() | (F.col(to_col) > t))
    )


def ewma_features(
    df: DataFrame,
    keys: list,
    value_col: str,
    ts_col: str = "event_timestamp",
    seq_col: str | None = None,
    alpha: float = 0.1,
    out_col: str = "ewma",
) -> DataFrame:
    """Final exponentially-weighted moving average per key:
    ``ewma_1 = x_1``, ``ewma_i = (1-alpha)*ewma_{i-1} + alpha*x_i`` over
    the key's events ordered by ``(ts, seq)``.

    Implemented as an ordered fold — ``sort_array(collect_list(struct))``
    then ``F.aggregate`` — entirely in built-in expressions (no UDF).
    The fold is the *numerically stable* shape: the closed-form rescaling
    trick (``sum(x_i/(1-alpha)^i) * (1-alpha)^n``) overflows double past
    a few thousand events per key, so it cannot survive a 100 TB history.
    One shuffle keyed by the entity key (the theoretical minimum — the
    recurrence is order-dependent); per-key state is the key's event
    list, the same bound every ordered-sequence operator here carries
    (``sequence_pack``, ``funnel``). Output values are rounded to 6
    places for engine-portable comparison.
    """
    order_cols = [ts_col] + ([seq_col] if seq_col else [])
    packed = F.sort_array(
        F.collect_list(
            F.struct(
                *[F.col(c) for c in order_cols],
                F.col(value_col).cast("double").alias("__x"),
            )
        )
    )
    vals = F.transform(packed, lambda s: s["__x"])
    folded = F.aggregate(
        F.slice(vals, F.lit(2), F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: acc * F.lit(1.0 - alpha) + x * F.lit(alpha),
    )
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(folded, 6).alias(out_col),
    )


def mergeable_rollup(
    df: DataFrame,
    keys: list,
    value_col: str,
    ts_col: str = "event_timestamp",
) -> DataFrame:
    """Per-key rollup in *mergeable* form: count / sum / min / max over
    integer cents, plus the latest event time. Every component is an
    associative-commutative monoid, so two rollups over disjoint inputs
    merge exactly (:func:`merge_rollups`) — the algebra behind
    incremental materialized-view maintenance: keep yesterday's rollup,
    aggregate only today's delta partition, merge. The delta aggregate is
    map-side combined; the merge shuffles **rollup rows, not events** —
    at 100 TB the saved work is the entire historical re-scan.
    """
    cents = _cents(F.col(value_col))
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(cents).alias("sum_cents"),
        F.min(cents).alias("min_cents"),
        F.max(cents).alias("max_cents"),
        F.max(F.col(ts_col)).alias("last_ts"),
    )


def merge_rollups(keys: list, *rollups: DataFrame) -> DataFrame:
    """Merge :func:`mergeable_rollup` outputs over disjoint (or
    overlapping-key, disjoint-event) inputs: component-wise monoid ops.
    ``merge(rollup(A), rollup(B)) == rollup(A ∪ B)`` exactly.
    """
    it = iter(rollups)
    u = next(it)
    for r in it:
        u = u.unionByName(r)
    return u.groupBy(*keys).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_cents").alias("sum_cents"),
        F.min("min_cents").alias("min_cents"),
        F.max("max_cents").alias("max_cents"),
        F.max("last_ts").alias("last_ts"),
    )


def scd2_join(
    facts: DataFrame,
    history: DataFrame,
    keys: list,
    fact_ts: str = "event_timestamp",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    how: str = "inner",
) -> DataFrame:
    """Point-in-time dimension enrichment against a :func:`scd2_history`
    table: each fact row joins the dimension version valid at its own
    timestamp (``valid_from <= ts < valid_to``, open-ended current
    version) — the classic warehouse "state as of the event" join, and
    the batch twin of the online store's latest-wins read at an
    arbitrary past instant.

    Plan shape: a hash EQUI-join on the entity keys with the interval
    predicate as a residual filter — per key a fact row scans only that
    key's few versions, so the join is bounded by Σ|versions(key)| ×
    |facts(key)| per key, shuffle-partitionable and AQE-skew-handled;
    never a BroadcastNestedLoop. (A key-less interval join should use
    ``windows.interval_join``'s banding instead.)
    """
    f, h = facts.alias("f"), history.alias("h")
    cond = None
    for k in keys:
        c = F.col(f"f.{k}") == F.col(f"h.{k}")
        cond = c if cond is None else (cond & c)
    ts = F.col(f"f.{fact_ts}")
    cond = (
        cond
        & (ts >= F.col(f"h.{from_col}"))
        & (F.col(f"h.{to_col}").isNull() | (ts < F.col(f"h.{to_col}")))
    )
    return f.join(h, on=cond, how=how)


def event_sequences(
    df: DataFrame,
    keys: list,
    item_col: str,
    ts_col: str = "event_timestamp",
    seq_col: str | None = None,
    max_len: int | None = None,
) -> DataFrame:
    """Per-entity ordered behavior sequences — the training-example shape
    for sequence models (next-event prediction, session-based
    recommendation): each key's items in ``(ts, seq)`` order, optionally
    truncated to the most recent ``max_len``.

    One entity-keyed shuffle into ``sort_array(collect_list(struct))``
    (the ordered-gather kernel shared with ``funnel``/``ewma_features``);
    truncation slices the tail in-expression. Per-key state is the key's
    history — the inherent bound for any ordered-sequence export.

    Returns ``(keys..., n_events, sequence array<item>)``.
    """
    order_cols = [ts_col] + ([seq_col] if seq_col else [])
    packed = F.sort_array(
        F.collect_list(
            F.struct(
                *[F.col(c) for c in order_cols],
                F.col(item_col).alias("__it"),
            )
        )
    )
    seq = F.transform(packed, lambda s: s["__it"])
    if max_len is not None:
        # keep the most recent max_len items
        seq = F.when(
            F.size(seq) > max_len,
            F.slice(seq, F.size(seq) - max_len + 1, max_len),
        ).otherwise(seq)
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        seq.alias("sequence"),
    )


def event_gaps(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    min_gap_secs: int = 86_400,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-entity silence report: every consecutive-event gap of at
    least ``min_gap_secs`` as ``(key, gap_start_us, gap_end_us,
    gap_us)`` — the feed-health / sensor-dropout monitor (a feature
    pipeline that silently stops emitting for a key corrupts every
    downstream as-of join; this surfaces it from the data itself).

    One entity-keyed ``lead()`` window (deterministic under timestamp
    ties via the tiebreak column) + a codegen filter — a single shuffle
    and a single sorted pass, like every ordered-sequence operator
    here.  Gap bounds are exact integer microseconds (no float
    division), so the report is engine-reproducible bit for bit.
    Trailing silence (after a key's last event) is out of scope by
    design: it needs a reference "now", which is the caller's policy.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    cur = F.unix_micros(F.col(ts_col))
    nxt = F.unix_micros(F.lead(ts_col).over(w))
    return (
        events.select(
            F.col(key_col),
            cur.alias("gap_start_us"),
            nxt.alias("gap_end_us"),
            (nxt - cur).alias("gap_us"),
        )
        .where(F.col("gap_us") >= min_gap_secs * 1_000_000)
    )
