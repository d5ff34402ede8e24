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

    - LONG nanos (the nanosAsLong representation of parquet
      TIMESTAMP(NANOS)) → µs timestamp via integer division (``div 1000``,
      no double round-trip → no precision loss), matching DuckDB's ns→µs
      truncation bit-for-bit.
    - TIMESTAMP_NTZ (parquet isAdjustedToUTC=false) → TIMESTAMP; with the
      session pinned to UTC the instant is identical.

    No-op for absent columns or columns already TimestampType.
    """
    for name in names:
        if not name or name not in df.columns:
            continue
        dt = df.schema[name].dataType
        if isinstance(dt, T.LongType):
            df = df.withColumn(
                name, F.timestamp_micros(F.expr(f"`{name}` div 1000"))
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
