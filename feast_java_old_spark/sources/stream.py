"""Streaming source readers (S3 Kafka, S4 Kinesis stand-in).

Parity targets:
- S3 Kafka stream source: ``core/.../model/DataSource.java:104-109``;
  proto/avro payload SerDes ``common/.../util/KafkaSerialization.java:31-68``,
- S4 Kinesis: ``DataSource.java:110-116`` — no OSS Spark DSv2 connector
  exists, so Kinesis specs are served by the same code path with Kafka (or a
  file stream in tests) as the transport.

The reference only *declares* stream sources (ingestion lived in
feast-spark); here they feed Structured Streaming materialization
(:mod:`feast_java_old_spark.streaming.ingest`).
"""

from __future__ import annotations

import json
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from feast_java_old_spark.registry.model import (
    DataSource,
    FileSource,
    KafkaSource,
    KinesisSource,
)
from feast_java_old_spark.sources.batch import apply_field_mapping


def decode_payload(raw: DataFrame, payload_schema: T.StructType, fmt: str) -> DataFrame:
    """Decode a Kafka-shaped stream (``key``, ``value`` binary columns).

    - ``json``: `from_json` (built-in, codegen'd).
    - ``avro``: `from_avro` from ``pyspark.sql.avro.functions`` when the
      spark-avro package is on the classpath; raises otherwise.
    - ``proto``: `from_protobuf` when the spark-protobuf package is present.

    All three stay JVM-side — no Python in the per-record hot path.
    """
    if fmt == "json":
        return raw.select(
            F.from_json(F.col("value").cast("string"), payload_schema).alias("payload")
        ).select("payload.*")
    if fmt == "avro":
        try:
            from pyspark.sql.avro.functions import from_avro
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "avro payloads need the spark-avro package on the classpath"
            ) from e
        avro_schema = _struct_to_avro_schema(payload_schema)
        return raw.select(from_avro(F.col("value"), avro_schema).alias("payload")).select(
            "payload.*"
        )
    if fmt == "proto":
        raise NotImplementedError(
            "proto payloads need the spark-protobuf package + a descriptor set; "
            "use message_format='json' or 'avro'"
        )
    raise ValueError(f"unknown stream payload format {fmt!r}")


def _struct_to_avro_schema(schema: T.StructType, name: str = "record") -> str:
    mapping = {
        T.StringType: "string",
        T.LongType: "long",
        T.IntegerType: "int",
        T.DoubleType: "double",
        T.FloatType: "float",
        T.BooleanType: "boolean",
        T.BinaryType: "bytes",
    }
    fields = []
    for f in schema.fields:
        if isinstance(f.dataType, T.TimestampType):
            ftype: object = {"type": "long", "logicalType": "timestamp-micros"}
        elif isinstance(f.dataType, T.ArrayType):
            ftype = {"type": "array", "items": mapping[type(f.dataType.elementType)]}
        else:
            ftype = mapping[type(f.dataType)]
        fields.append({"name": f.name, "type": ["null", ftype] if f.nullable else ftype})
    return json.dumps({"type": "record", "name": name, "fields": fields})


def read_stream_source(
    spark: SparkSession,
    source: DataSource,
    payload_schema: Optional[T.StructType] = None,
) -> DataFrame:
    """Open a streaming DataFrame for a stream source spec."""
    if isinstance(source, KafkaSource):
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", source.bootstrap_servers)
            .option("subscribe", source.topic)
            .option("startingOffsets", "earliest")
            .load()
        )
        if payload_schema is None:
            raise ValueError("kafka sources need a payload schema to decode")
        df = decode_payload(raw, payload_schema, source.message_format)
    elif isinstance(source, KinesisSource):
        raise NotImplementedError(
            "no OSS Spark connector for Kinesis; register the stream as a "
            "KafkaSource (the declared spec round-trips either way)"
        )
    elif isinstance(source, FileSource):
        # File streams double as the test transport: each new parquet file
        # under the dir is a micro-batch.
        if payload_schema is None:
            df = spark.readStream.schema(
                spark.read.parquet(source.file_url).schema
            ).parquet(source.file_url)
        else:
            df = spark.readStream.schema(payload_schema).parquet(source.file_url)
    else:
        raise TypeError(f"not a stream source: {type(source).__name__}")
    return apply_field_mapping(df, source.field_mapping)
