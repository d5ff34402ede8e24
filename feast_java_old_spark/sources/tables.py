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
    """Make any session able to read the nano-timestamp events table —
    the conf is runtime-settable, so sessions built outside
    :func:`session_builder` (e.g. the round driver's) work too."""
    try:
        spark.conf.set(NANOS_CONF, "true")
    except Exception:
        pass  # conf locked down → session_builder already set it or read fails loudly


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_nanos_conf(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for field in df.schema.fields:
        # Nano-timestamp normalization (events.ts): LONG nanos → µs timestamp.
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        # Parquet TIMESTAMP(isAdjustedToUTC=false) arrives as TIMESTAMP_NTZ;
        # with the session pinned to UTC the instant is identical — keep one
        # timestamp type engine-wide so epoch arithmetic stays castable.
        elif isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df
