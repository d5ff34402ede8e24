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

from pyspark.sql import Column, DataFrame
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
