"""Mergeable sketches: approximate distinct counts and quantiles.

At 100 TB, exact ``COUNT(DISTINCT)`` over a high-cardinality column is a
full shuffle of every distinct value; exact percentiles are a global
sort. The sketch forms bound both to kilobytes per group: Spark 4 ships
Apache DataSketches HLL (``hll_sketch_agg`` / ``hll_union_agg``) whose
binary sketches are *mergeable* — partial sketches computed per
shard/day/partition union into the exact same estimate as one pass over
the whole data, which is what makes incremental corpus statistics
possible (sketch each new day, union with history; never re-scan).

Estimates are deterministic for a given input multiset (the sketch hash
is seeded), so tests assert exact equality between merged-shard and
whole-corpus paths — but they are NOT reproducible by other engines
(DuckDB's approx_count_distinct uses a different HLL), so the driver
gate for these is rows-only by design (the oracle-equivalence rule
exempts sketch internals; error-bound and merge tests live in pytest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(
    df: DataFrame, keys: list[str], col: str, lgk: int = 12
) -> DataFrame:
    """Per-group HLL distinct estimate (±~1.6% at lgK=12, ~4 KB/group).
    One aggregate-sized shuffle: partial sketches merge map-side."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg(F.col(col), F.lit(lgk))).alias(
            f"approx_distinct_{col}"
        )
    )


def distinct_sketches(
    df: DataFrame, keys: list[str], col: str, lgk: int = 12
) -> DataFrame:
    """Per-group binary HLL sketches — the mergeable partial form to
    persist alongside shard/day outputs (union later instead of
    re-scanning)."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lgk)).alias("hll_sketch")
    )


def merge_distinct_sketches(sketches: DataFrame, keys: list[str]) -> DataFrame:
    """Union persisted partial sketches (e.g. per-day) into per-group
    estimates: the incremental path — cost is sketch-count, not
    data-size."""
    return sketches.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("hll_sketch"))).alias(
            "approx_distinct"
        )
    )


def approx_quantiles(
    df: DataFrame,
    keys: list[str],
    col: str,
    probabilities: list[float],
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group approximate percentiles (Greenwald-Khanna via
    ``percentile_approx``): rank error <= 1/accuracy, partials merge
    map-side — the scale substitute for the exact sort-based
    ``a6_percentiles`` query."""
    return df.groupBy(*keys).agg(
        F.percentile_approx(F.col(col), probabilities, accuracy).alias(
            "quantiles"
        )
    )
