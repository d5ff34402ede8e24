"""Protobuf wire-format codec for flat (scalar-field) messages.

Parity target: the reference's proto Kafka payloads
(``common/src/main/java/feast/common/util/KafkaSerialization.java:31-68``
serializes messages with ``Message.toByteArray()``). The wire format is
public and stable (proto2/proto3 share it): a stream of
``key = (field_number << 3) | wire_type`` varints followed by the value.

Scope: scalar fields only — varint (int32/int64/bool), fixed64 (double),
fixed32 (float), length-delimited (string/bytes). Nested messages,
repeated/packed fields, and zigzag sint* are out of scope for the
fallback decoder (use the spark-protobuf JVM path for those). Proto3
semantics: a field absent from the wire carries its default value
(0 / 0.0 / "" / b"" / False).

Used by :func:`feast_java_old_spark.sources.stream.decode_payload` as the
Arrow-batched fallback when the spark-protobuf package is not on the
classpath; the encoder side exists for tests and fixtures.
"""

from __future__ import annotations

import struct
from typing import Any, Iterable, Optional

from pyspark.sql import types as T

# wire types
_VARINT, _FIXED64, _LEN, _FIXED32 = 0, 1, 2, 5

_WIRE_FOR_SPARK = {
    T.LongType: _VARINT,
    T.IntegerType: _VARINT,
    T.ShortType: _VARINT,
    T.BooleanType: _VARINT,
    T.TimestampType: _VARINT,  # unix micros on the wire
    T.DoubleType: _FIXED64,
    T.FloatType: _FIXED32,
    T.StringType: _LEN,
    T.BinaryType: _LEN,
}

_DEFAULTS = {
    _VARINT: 0,
    _FIXED64: 0.0,
    _FIXED32: 0.0,
    _LEN: b"",
}


def field_map(
    schema: T.StructType, numbers: Optional[dict[str, int]] = None
) -> dict[int, tuple[str, T.DataType]]:
    """field_number -> (name, spark type). Default numbering is schema
    order, 1-based — override with ``numbers`` when the .proto differs."""
    out: dict[int, tuple[str, T.DataType]] = {}
    for i, f in enumerate(schema.fields):
        if type(f.dataType) not in _WIRE_FOR_SPARK:
            raise TypeError(
                f"unsupported proto fallback field type {f.dataType} "
                f"({f.name}); scalar fields only"
            )
        num = (numbers or {}).get(f.name, i + 1)
        out[num] = (f.name, f.dataType)
    return out


# ----------------------------------------------------------------- varint


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("malformed varint")


def _write_varint(value: int) -> bytes:
    if value < 0:
        value += 1 << 64  # two's complement, proto int64 negative = 10 bytes
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


# ------------------------------------------------------------------ codec


def decode_scalar_message(
    data: bytes, fields: dict[int, tuple[str, T.DataType]]
) -> dict[str, Any]:
    """One wire message -> {field name: python value}; unknown fields are
    skipped per their wire type (forward compatibility), absent fields get
    proto3 defaults."""
    values: dict[str, Any] = {}
    pos, n = 0, len(data)
    while pos < n:
        key, pos = _read_varint(data, pos)
        num, wt = key >> 3, key & 0x7
        if wt == _VARINT:
            raw, pos = _read_varint(data, pos)
        elif wt == _FIXED64:
            raw = struct.unpack_from("<d", data, pos)[0]
            pos += 8
        elif wt == _FIXED32:
            raw = struct.unpack_from("<f", data, pos)[0]
            pos += 4
        elif wt == _LEN:
            ln, pos = _read_varint(data, pos)
            raw = data[pos : pos + ln]
            pos += ln
        else:
            raise ValueError(f"unsupported wire type {wt}")
        if num not in fields:
            continue  # unknown field: skipped, already consumed
        name, dtype = fields[num]
        values[name] = _to_python(raw, dtype)
    for num, (name, dtype) in fields.items():
        if name not in values:
            values[name] = _to_python(
                _DEFAULTS[_WIRE_FOR_SPARK[type(dtype)]], dtype
            )
    return values


def _to_python(raw: Any, dtype: T.DataType) -> Any:
    if isinstance(dtype, (T.LongType, T.IntegerType, T.ShortType)):
        v = int(raw)
        return v - (1 << 64) if v >= 1 << 63 else v
    if isinstance(dtype, T.BooleanType):
        return bool(raw)
    if isinstance(dtype, T.TimestampType):
        v = int(raw)
        return v - (1 << 64) if v >= 1 << 63 else v  # unix micros (int)
    if isinstance(dtype, T.StringType):
        return raw.decode("utf-8") if isinstance(raw, bytes) else str(raw)
    if isinstance(dtype, T.BinaryType):
        return bytes(raw) if not isinstance(raw, bytes) else raw
    return float(raw)


def encode_scalar_message(
    values: dict[str, Any], fields: dict[int, tuple[str, T.DataType]]
) -> bytes:
    """Inverse of :func:`decode_scalar_message` (tests/fixtures). Skips
    None values and proto3 defaults like real proto3 serializers."""
    out = bytearray()
    for num in sorted(fields):
        name, dtype = fields[num]
        v = values.get(name)
        if v is None:
            continue
        wt = _WIRE_FOR_SPARK[type(dtype)]
        if wt == _VARINT:
            iv = int(v)
            if iv == 0:
                continue
            out += _write_varint((num << 3) | _VARINT) + _write_varint(iv)
        elif wt == _FIXED64:
            if v == 0.0:
                continue
            out += _write_varint((num << 3) | _FIXED64) + struct.pack("<d", v)
        elif wt == _FIXED32:
            if v == 0.0:
                continue
            out += _write_varint((num << 3) | _FIXED32) + struct.pack("<f", v)
        else:
            bv = v.encode("utf-8") if isinstance(v, str) else bytes(v)
            if not bv:
                continue
            out += (
                _write_varint((num << 3) | _LEN) + _write_varint(len(bv)) + bv
            )
    return bytes(out)


def decode_batches(
    batches: Iterable, fields: dict[int, tuple[str, T.DataType]]
):
    """mapInPandas kernel: iterator of pandas frames with a binary
    ``value`` column -> iterator of decoded frames (one column per field).

    Arrow-batched (never per-row Python UDF); the per-record loop is pure
    bytes parsing with no Spark round-trips.
    """
    import pandas as pd

    # Insertion order of `fields` is schema order (field_map iterates the
    # schema), which is what the mapInPandas output schema expects.
    names = [name for name, _ in fields.values()]
    ts_cols = [
        name
        for _, (name, dt) in fields.items()
        if isinstance(dt, T.TimestampType)
    ]
    for pdf in batches:
        rows = [decode_scalar_message(b, fields) for b in pdf["value"]]
        out = pd.DataFrame(rows, columns=names)
        for c in ts_cols:
            out[c] = pd.to_datetime(out[c], unit="us")
        yield out
