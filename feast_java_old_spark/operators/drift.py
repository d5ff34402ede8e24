"""Feature-distribution drift monitoring (PSI) for feature pipelines.

The reference serves features but has no drift surface; a production
feature store at 100 TB needs one (the classic use: compare the serving
window's feature distribution against the training/reference window and
alert on Population Stability Index).

Everything is relational and two-phase:

1. one column-pruned aggregate over the *reference* window derives the
   bin edges (per-group min/max — one row per group);
2. one scan buckets every row against the broadcast edges and counts
   per (group, side, bucket); the full (group × bucket) frame is
   generated with ``explode(sequence(...))`` so empty buckets still
   contribute through smoothing.

PSI_g = Σ_b (p_cur − p_ref) · ln(p_cur / p_ref), with Laplace-style
smoothing p = (cnt + 0.5) / (total + 0.5·bins) so empty buckets are
finite. Deterministic: fixed-width bins from reference min/max, and the
whole computation is expressible in ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def feature_drift(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    split_ts,
    group_cols: Optional[Sequence[str]] = None,
    bins: int = 10,
) -> DataFrame:
    """PSI of ``value_col`` between rows before and after ``split_ts``,
    per group. Returns (group_cols..., psi, n_ref, n_cur).

    Common PSI reading: < 0.1 stable, 0.1–0.25 moderate shift, > 0.25
    action needed.
    """
    group_cols = list(group_cols or [])
    split = F.lit(split_ts).cast("timestamp")
    sided = df.select(
        *group_cols,
        F.col(value_col).cast("double").alias("__v"),
        F.when(F.col(ts_col) < split, F.lit("ref"))
        .otherwise(F.lit("cur"))
        .alias("__side"),
    )
    edges = (
        sided.where(F.col("__side") == "ref")
        .groupBy(*group_cols)
        .agg(F.min("__v").alias("__vmin"), F.max("__v").alias("__vmax"))
    )
    joined = (
        sided.join(F.broadcast(edges), on=group_cols)
        if group_cols
        else sided.crossJoin(F.broadcast(edges))
    )
    bucketed = joined.select(
        *group_cols,
        "__side",
        F.when(F.col("__vmax") == F.col("__vmin"), F.lit(0))
        .otherwise(
            F.greatest(
                F.lit(0),
                F.least(
                    F.lit(bins - 1),
                    F.floor(
                        (F.col("__v") - F.col("__vmin"))
                        / (F.col("__vmax") - F.col("__vmin"))
                        * bins
                    ).cast("int"),
                ),
            )
        )
        .alias("__bucket"),
    )
    counts = bucketed.groupBy(*group_cols, "__side", "__bucket").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    # full (group × bucket) frame so empty buckets smooth instead of vanish
    frame = edges.select(
        *group_cols,
        F.explode(F.sequence(F.lit(0), F.lit(bins - 1))).alias("__bucket"),
    )
    per_bucket = (
        frame.join(
            counts.where(F.col("__side") == "ref").select(
                *group_cols, "__bucket", F.col("__cnt").alias("__ref")
            ),
            on=group_cols + ["__bucket"],
            how="left",
        )
        .join(
            counts.where(F.col("__side") == "cur").select(
                *group_cols, "__bucket", F.col("__cnt").alias("__cur")
            ),
            on=group_cols + ["__bucket"],
            how="left",
        )
        .select(
            *group_cols,
            "__bucket",
            F.coalesce("__ref", F.lit(0)).alias("__ref"),
            F.coalesce("__cur", F.lit(0)).alias("__cur"),
        )
    )
    totals = per_bucket.groupBy(*group_cols).agg(
        F.sum("__ref").alias("__tref"), F.sum("__cur").alias("__tcur")
    )
    j = per_bucket.join(F.broadcast(totals), on=group_cols) if group_cols else (
        per_bucket.crossJoin(F.broadcast(totals))
    )
    p_ref = (F.col("__ref") + 0.5) / (F.col("__tref") + 0.5 * bins)
    p_cur = (F.col("__cur") + 0.5) / (F.col("__tcur") + 0.5 * bins)
    contrib = (p_cur - p_ref) * F.log(p_cur / p_ref)
    return (
        j.select(*group_cols, contrib.alias("__c"), "__tref", "__tcur")
        .groupBy(*group_cols)
        .agg(
            F.round(F.sum("__c"), 6).alias("psi"),
            F.first("__tref").alias("n_ref"),
            F.first("__tcur").alias("n_cur"),
        )
    )


def ks_drift(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    split_ts,
    group_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """EXACT two-sample Kolmogorov–Smirnov distance between the
    reference (before ``split_ts``) and current value distributions,
    per group — the binning-free complement of :func:`feature_drift`:
    PSI depends on a bin count and edges; KS is the sup-norm gap of the
    empirical CDFs themselves, sensitive to any distributional change
    anywhere on the axis.

    Relational evaluation (no sampling, no scipy): aggregate counts per
    (group, value, side) — map-side combined, collapses duplicates —
    then ONE per-group window pass turns the two count columns into
    running CDFs over the merged value order, and the statistic is
    ``max |F_ref(v) − F_cur(v)|`` over observed values (the sup of a
    step-function difference is attained at a step). The comparison is
    evaluated on the INTEGER lattice — ``|cref·n_cur − ccur·n_ref|`` —
    and divided once at the end, so any engine reproduces the max
    before a single float rounding. (The integer cross-product needs
    n_ref·n_cur < 2^63: per-GROUP sample sizes up to ~3·10⁹ each —
    beyond that, pre-aggregate or sample.)

    Returns (group_cols…, ks, n_ref, n_cur) with ks rounded to 6.
    """
    from pyspark.sql.window import Window

    group_cols = list(group_cols or [])
    split = F.lit(split_ts).cast("timestamp")
    pv = (
        # NULL measurements are not sample points of an empirical CDF —
        # and engines disagree on NULL sort position (Spark ASC = NULLS
        # FIRST, DuckDB ASC = NULLS LAST), so keeping them would also
        # shift every running count differently per engine.
        df.where(F.col(value_col).isNotNull())
        .select(
            *group_cols,
            F.col(value_col).alias("__v"),
            F.when(F.col(ts_col) < split, 1).otherwise(0).alias("__is_ref"),
        )
        .groupBy(*group_cols, "__v")
        .agg(
            F.sum("__is_ref").alias("__rc"),
            F.sum(1 - F.col("__is_ref")).alias("__cc"),
        )
    )
    wcum = Window.partitionBy(*group_cols).orderBy("__v")
    wall = Window.partitionBy(*group_cols)
    c = pv.select(
        *group_cols,
        F.sum("__rc").over(wcum).alias("__cref"),
        F.sum("__cc").over(wcum).alias("__ccur"),
        F.sum("__rc").over(wall).alias("__nref"),
        F.sum("__cc").over(wall).alias("__ncur"),
    )
    gap = F.abs(
        F.col("__cref") * F.col("__ncur") - F.col("__ccur") * F.col("__nref")
    )
    return (
        c.groupBy(*group_cols)
        .agg(
            F.max(gap).alias("__g"),
            F.max("__nref").alias("n_ref"),
            F.max("__ncur").alias("n_cur"),
        )
        .select(
            *group_cols,
            # one-sided groups have no two-sample statistic -> NULL
            F.when(
                (F.col("n_ref") > 0) & (F.col("n_cur") > 0),
                F.round(
                    F.col("__g") / (F.col("n_ref") * F.col("n_cur")), 6
                ),
            ).alias("ks"),
            "n_ref",
            "n_cur",
        )
    )


def cusum_alerts(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    split_ts,
    group_cols: Optional[Sequence[str]] = None,
    allowance_cents: int = 0,
    threshold_cents: int = 1000,
    id_col: Optional[str] = None,
) -> DataFrame:
    """One-sided CUSUM change-point monitor per group: alert rows where
    the Page (1954) cumulative-sum statistic exceeds the threshold —
    the sequential detector that fires on a sustained small mean shift
    long before a windowed PSI/KS snapshot moves.

    The CUSUM recursion ``S_i = max(0, S_{i-1} + (x_i − k))`` is not a
    prefix sum — but it has a closed windowed form:
    ``S_i = C_i − min(0, min_{j≤i} C_j)`` where ``C`` is the plain
    running sum of deviations. So the whole detector is two window
    functions over one (group)-partitioned (ts, id)-ordered pass — no
    recursion, no UDF, no driver loop.

    Integer-lattice discipline: values are quantized to cents and the
    reference level is the PRE-SPLIT per-group mean computed as
    ``sum_cents DIV n`` (exact integer division) — running window sums
    over doubles are engine-divergent in their last ulp (DuckDB's
    segment-tree moving aggregates associate differently from Spark's
    sequential frame accumulation), while BIGINT sums are exact in any
    association order. ``k = mean_cents + allowance_cents``;
    alert when ``S > threshold_cents``.

    Emits (group_cols…, ts, s_cents) for post-split alert rows.
    """
    from pyspark.sql.window import Window

    group_cols = list(group_cols or [])
    split = F.lit(split_ts).cast("timestamp")
    cents = F.round(F.col(value_col) * 100, 0).cast("long")
    base = df.select(
        *group_cols,
        F.col(ts_col).alias("__ts"),
        *( [F.col(id_col).alias("__id")] if id_col else [] ),
        cents.alias("__c"),
    ).where(F.col("__c").isNotNull())
    # floor(sum/n): both operands are exact integers < 2^53, so the
    # IEEE quotient errs < 1 ulp and a non-integer true quotient sits
    # ≥ 1/n from any integer — floor is engine-identical for any
    # realistic n (< ~5·10^11 at cent scale). cast('long') would
    # TRUNCATE (toward zero), diverging from SQL floor on negatives.
    ref_mean = (
        base.where(F.col("__ts") < split)
        .groupBy(*group_cols)
        .agg(
            F.floor(F.sum("__c") / F.count(F.lit(1)))
            .cast("long")
            .alias("__k0")
        )
    )
    order = [F.col("__ts")] + ([F.col("__id")] if id_col else [])
    wcum = Window.partitionBy(*group_cols).orderBy(*order)
    cur = (
        base.where(F.col("__ts") >= split)
        .join(F.broadcast(ref_mean), on=group_cols)
        .select(
            *group_cols,
            "__ts",
            *(["__id"] if id_col else []),
            (F.col("__c") - F.col("__k0") - F.lit(allowance_cents)).alias(
                "__d"
            ),
        )
    )
    c = cur.select(
        *group_cols,
        "__ts",
        *(["__id"] if id_col else []),
        F.sum("__d").over(wcum).alias("__cs"),
    )
    s = c.select(
        *group_cols,
        F.col("__ts").alias(ts_col),
        (
            F.col("__cs")
            - F.least(F.lit(0), F.min("__cs").over(wcum))
        ).alias("s_cents"),
    )
    return s.where(F.col("s_cents") > threshold_cents)
