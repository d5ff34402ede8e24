"""Synthetic-testdata table loader.

The driver's tables (TESTDATA.md) are plain parquet except ``events``,
whose ``ts`` column is TIMESTAMP(NANOS) — Spark's vectorized parquet
reader rejects nano timestamps unless
``spark.sql.legacy.parquet.nanosAsLong=true`` is set, in which case the
column arrives as a nanosecond LONG. :func:`load_table` normalizes it back
to a microsecond TimestampType with integer division (`ts div 1000`, no
double round-trip → no precision loss), which matches DuckDB's ns→µs
truncation bit-for-bit, so oracle hashes line up.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def session_builder(app: str, master: str | None = None, **conf):
    """SparkSession builder with the engine's standard configuration."""
    b = (
        SparkSession.builder.appName(app)
        .config(NANOS_CONF, "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if master:
        b = b.master(master)
    for k, v in conf.items():
        b = b.config(k, v)
    return b


def ensure_nanos_conf(spark: SparkSession) -> None:
    """Make any session able to read the nano-timestamp events table and
    interpret naive timestamps deterministically — both confs are
    runtime-settable, so sessions built outside :func:`session_builder`
    (e.g. the round driver's) work too."""
    try:
        spark.conf.set(NANOS_CONF, "true")
        # NTZ→TIMESTAMP casts and naive datetime literals are interpreted in
        # the session timezone; pin UTC so results don't depend on host TZ.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # conf locked down → session_builder already set it or read fails loudly


def normalize_timestamp_cols(df: DataFrame, *names: str) -> DataFrame:
    """Normalize declared timestamp columns to microsecond TimestampType.

    - LONG epoch values → µs timestamp. The physical unit of a LONG epoch
      column has varied across testdata generations (nanos under the
      nanosAsLong representation of parquet TIMESTAMP(NANOS), but raw
      INT64 micros has also been observed), so the unit is inferred
      per-value from magnitude — a pure, deterministic expression (no
      data-dependent plan):

        |v| ≥ 2e17 → nanos  (2e17 ns ≈ 1976; a µs value that large ≈ 8300)
        |v| ≥ 2e14 → micros (2e14 µs ≈ 1976; ms ≈ 8300)
        |v| ≥ 2e11 → millis (2e11 ms ≈ 1976; s  ≈ 8300)
        else       → seconds

      Unambiguous for instants between 1976 and ~8300. ns→µs uses integer
      division (no double round-trip), matching DuckDB's ns→µs truncation
      bit-for-bit. Round 2's two red streaming rows were this: µs longs
      divided by 1000 as if nanos compressed 30 days of events into 43
      minutes (exactly 2 hour-windows/type) and scaled ts_us 1000×.
    - TIMESTAMP_NTZ (parquet isAdjustedToUTC=false) → TIMESTAMP; with the
      session pinned to UTC the instant is identical.

    No-op for absent columns or columns already TimestampType.
    """
    for name in names:
        if not name or name not in df.columns:
            continue
        dt = df.schema[name].dataType
        if isinstance(dt, T.LongType):
            v = f"`{name}`"
            df = df.withColumn(
                name,
                F.timestamp_micros(
                    F.expr(
                        f"CASE WHEN abs({v}) >= 200000000000000000 "
                        f"THEN {v} div 1000 "
                        f"WHEN abs({v}) >= 200000000000000 THEN {v} "
                        f"WHEN abs({v}) >= 200000000000 THEN {v} * 1000 "
                        f"ELSE {v} * 1000000 END"
                    )
                ),
            )
        elif isinstance(dt, T.TimestampNTZType):
            df = df.withColumn(name, F.col(name).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_nanos_conf(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # Nano-timestamp normalization (events.ts) + NTZ → TIMESTAMP engine-wide
    # so epoch arithmetic stays castable.
    ts_like = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.TimestampNTZType)
        or (f.name == "ts" and isinstance(f.dataType, T.LongType))
    ]
    return normalize_timestamp_cols(df, *ts_like)
