"""Proto wire-format payloads (F8) + Kinesis spec round-trip (S4).

Parity targets:
- proto Kafka payloads: ``common/src/main/java/feast/common/util/
  KafkaSerialization.java:31-68`` (``Message.toByteArray()`` on the wire);
- Kinesis spec: ``core/src/main/java/feast/core/model/DataSource.java:110-116``
  — the spec must validate, persist, and serve through the declared
  transport stand-in instead of raising at read time.
"""

import datetime as dt
import os
import time

import pytest
from pyspark.sql import types as T

from feast_java_old_spark.functions import protowire
from feast_java_old_spark.registry.model import FileSource, KinesisSource
from feast_java_old_spark.registry.validation import validate_data_source
from feast_java_old_spark.sources.stream import decode_payload, read_stream_source

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("ratio", T.FloatType()),
        T.StructField("active", T.BooleanType()),
        T.StructField("event_timestamp", T.TimestampType()),
        T.StructField("blob", T.BinaryType()),
    ]
)

ROWS = [
    {
        "user_id": 7,
        "name": "ada",
        "score": 2.5,
        "ratio": 0.5,
        "active": True,
        "event_timestamp": 1_704_067_200_000_000,  # 2024-01-01 in µs
        "blob": b"\x00\x01",
    },
    {  # proto3 defaults: everything zero/empty is absent from the wire
        "user_id": 0,
        "name": "",
        "score": 0.0,
        "ratio": 0.0,
        "active": False,
        "event_timestamp": 0,
        "blob": b"",
    },
    {
        "user_id": -3,  # negative int64 = 10-byte varint
        "name": "héllo",
        "score": -1.25,
        "ratio": 2.0,
        "active": False,
        "event_timestamp": 1_704_153_600_000_000,
        "blob": b"xyz",
    },
]


def test_wire_roundtrip_all_scalar_types():
    fields = protowire.field_map(SCHEMA)
    for row in ROWS:
        wire = protowire.encode_scalar_message(row, fields)
        assert protowire.decode_scalar_message(wire, fields) == row


def test_unknown_fields_skipped_and_defaults_filled():
    fields = protowire.field_map(SCHEMA)
    extra = T.StructType(
        SCHEMA.fields + [T.StructField("extra", T.StringType())]
    )
    wire = protowire.encode_scalar_message(
        {**ROWS[0], "extra": "future-field"}, protowire.field_map(extra)
    )
    decoded = protowire.decode_scalar_message(wire, fields)
    assert "extra" not in decoded and decoded == ROWS[0]
    # empty message -> all proto3 defaults
    assert protowire.decode_scalar_message(b"", fields) == ROWS[1]


def test_custom_field_numbers():
    schema = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.StringType()),
        ]
    )
    fields = protowire.field_map(schema, numbers={"a": 5, "b": 2})
    assert set(fields) == {5, 2}
    wire = protowire.encode_scalar_message({"a": 9, "b": "x"}, fields)
    assert protowire.decode_scalar_message(wire, fields) == {"a": 9, "b": "x"}


def test_decode_payload_proto_batch(spark):
    fields = protowire.field_map(SCHEMA)
    payloads = [
        (protowire.encode_scalar_message(r, fields),) for r in ROWS
    ]
    raw = spark.createDataFrame(payloads, "value binary")
    out = decode_payload(raw, SCHEMA, "proto").orderBy("user_id").collect()
    assert [r.user_id for r in out] == [-3, 0, 7]
    byid = {r.user_id: r for r in out}
    assert byid[7].name == "ada" and byid[7].blob == b"\x00\x01"
    assert byid[-3].name == "héllo" and byid[-3].score == -1.25
    assert byid[7].event_timestamp == dt.datetime(2024, 1, 1)
    assert byid[0].name == "" and byid[0].active is False


def _wait_files(src_dir, n):
    deadline = time.time() + 10
    while time.time() < deadline:
        if len([f for f in os.listdir(src_dir) if f.endswith(".parquet")]) >= n:
            return
        time.sleep(0.1)


def _drain_to_memory(spark, df, name, timeout=60):
    q = df.writeStream.format("memory").queryName(name).outputMode("append").start()
    try:
        q.processAllAvailable()
        return spark.sql(f"select * from {name}")
    finally:
        q.stop()


def test_kinesis_spec_roundtrips_via_file_transport(spark, tmp_path):
    src = str(tmp_path / "stream_drop")
    os.makedirs(src)
    schema = "user_id long, event_timestamp timestamp, value double"
    t0 = dt.datetime(2024, 1, 1)
    spark.createDataFrame([(1, t0, 1.0), (2, t0, 2.0)], schema).coalesce(
        1
    ).write.mode("append").parquet(src)
    _wait_files(src, 1)

    source = KinesisSource(
        region="us-east-1", stream_name=src, record_format="json",
        event_timestamp_column="event_timestamp",
    )
    validate_data_source(source)  # registry accepts the spec
    d = source.to_dict()
    assert KinesisSource.from_dict(d).to_dict() == d  # persisted round-trip

    stream = read_stream_source(spark, source)
    assert stream.isStreaming
    out = _drain_to_memory(spark, stream, "kinesis_file_batches")
    assert {r.user_id for r in out.collect()} == {1, 2}

    # second micro-batch file streams through the same query path
    spark.createDataFrame([(3, t0, 3.0)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _wait_files(src, 2)
    stream2 = read_stream_source(spark, source)
    out2 = _drain_to_memory(spark, stream2, "kinesis_file_batches2")
    assert {r.user_id for r in out2.collect()} == {1, 2, 3}


def test_kinesis_wire_drop_decodes_proto(spark, tmp_path):
    src = str(tmp_path / "wire_drop")
    os.makedirs(src)
    fields = protowire.field_map(SCHEMA)
    payloads = [(protowire.encode_scalar_message(r, fields),) for r in ROWS]
    spark.createDataFrame(payloads, "value binary").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _wait_files(src, 1)

    source = KinesisSource(
        region="us-east-1", stream_name=src, record_format="proto"
    )
    stream = read_stream_source(spark, source, payload_schema=SCHEMA)
    assert stream.isStreaming
    out = _drain_to_memory(spark, stream, "kinesis_wire_batches")
    assert sorted(r.user_id for r in out.collect()) == [-3, 0, 7]


def test_kinesis_without_transport_still_raises_clearly(spark):
    source = KinesisSource(region="us-east-1", stream_name="prod-stream")
    with pytest.raises(NotImplementedError, match="transport"):
        read_stream_source(spark, source)
