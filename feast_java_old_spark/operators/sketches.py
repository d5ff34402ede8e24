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


def _misra_gries_batches(col: str, m: int):
    """mapInPandas kernel: fold each partition's Arrow batches through
    one Misra-Gries summary of at most ``m`` counters, emitting the
    surviving (item, weight) rows when the partition ends."""

    def fold(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for v, c in pdf.groupby(col, sort=False, dropna=True)[col].count().items():
                c = int(c)
                if v in counters:
                    counters[v] += c
                elif len(counters) < m:
                    counters[v] = c
                else:
                    # decrement-all by the smallest count we absorb
                    dec = min(c, min(counters.values()))
                    counters = {
                        k: n - dec for k, n in counters.items() if n > dec
                    }
                    if c > dec:
                        counters[v] = c - dec
        yield pd.DataFrame(
            {col: list(counters.keys()), "__w": list(counters.values())}
        )

    return fold


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 10,
    m: int = 256,
) -> DataFrame:
    """Top-k most frequent values with EXACT counts, at bounded memory:
    a per-partition Misra-Gries pass (``m`` counters of state, Arrow
    batched — never a per-partition distinct) nominates candidates,
    then one conditional aggregate recounts ONLY the candidates
    exactly, and the top-k of those is returned.

    Guarantee: any value with global frequency > n/(m+1) must exceed
    its share in at least one partition and therefore survives that
    partition's summary — so with ``m`` sized such that the true k-th
    heavy hitter clears n/(m+1), the result equals the exact
    ``GROUP BY`` top-k while shuffling at most ``partitions × m``
    candidate rows plus one aggregate. This is the 100 TB shape for
    "top URLs / top tokens / hottest keys" where the exact two-level
    aggregate's (partition, value) explosion won't fit.
    """
    from pyspark.sql import functions as F

    src = df.select(col).where(F.col(col).isNotNull())
    schema = f"`{col}` {src.schema[col].dataType.simpleString()}, __w long"
    cand = (
        src.mapInPandas(_misra_gries_batches(col, m), schema=schema)
        .groupBy(col)
        .agg(F.sum("__w").alias("__w"))
        .select(col)
    )
    exact = (
        src.join(F.broadcast(cand), on=col, how="left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return exact.orderBy(F.desc("cnt"), col).limit(k)
