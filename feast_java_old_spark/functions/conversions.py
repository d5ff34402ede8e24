"""Type conversions (F5 / F9).

Parity: ``core/src/main/java/feast/core/util/TypeConversion.java:44-97``
(JSON string ⇄ map for labels/configs, comma tag strings → lists) plus
column-level equivalents on Spark types, and the Java-SDK value-builder
mapping (``sdk/java/.../Row.java:60-98``) expressed as
``python value → Spark literal type``.
"""

from __future__ import annotations

import json
from typing import Any, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def json_to_map(s: Optional[str]) -> dict[str, str]:
    """Plan-time: JSON object string → dict (empty on null/empty,
    TypeConversion.convertJsonStringToMap:56-66)."""
    if not s or s == "{}":
        return {}
    return {str(k): str(v) for k, v in json.loads(s).items()}


def map_to_json(d: Optional[dict]) -> str:
    """Plan-time: dict → canonical JSON (sorted keys,
    TypeConversion.convertMapToJsonString:72-80)."""
    return json.dumps(d or {}, sort_keys=True, separators=(",", ":"))


def tag_string_to_list(s: Optional[str]) -> list[str]:
    """Comma tag string → list (TypeConversion.convertTagStringToList:44-50)."""
    if not s:
        return []
    return [t.strip() for t in s.split(",") if t.strip()]


def col_json_to_map(col: Column) -> Column:
    """Column-level JSON object → MapType(string,string)."""
    return F.from_json(col, T.MapType(T.StringType(), T.StringType()))


def col_map_to_json(col: Column) -> Column:
    return F.to_json(col)


# F9: Java SDK value builders → Spark literal types
# (sdk/java/.../Row.java:60-98 supports Int/Long/Float/Double/String/bytes).
_PY_TO_SPARK: list[tuple[type, T.DataType]] = [
    (bool, T.BooleanType()),   # before int: bool is an int subclass
    (int, T.LongType()),
    (float, T.DoubleType()),
    (str, T.StringType()),
    (bytes, T.BinaryType()),
    (bytearray, T.BinaryType()),
]


def python_value_to_spark_type(v: Any) -> T.DataType:
    for py, dt in _PY_TO_SPARK:
        if isinstance(v, py):
            return dt
    if isinstance(v, list) and v:
        return T.ArrayType(python_value_to_spark_type(v[0]))
    raise TypeError(f"unsupported value type {type(v).__name__}")
