"""Registry data model.

Re-expresses the reference's JPA entity graph (parity targets:
``core/src/main/java/feast/core/model/EntityV2.java``,
``FeatureV2.java``, ``FeatureTable.java``, ``DataSource.java``,
``Store.java``, ``Project.java``) as plain Python dataclasses with the same
semantics:

- 14-value type system (7 scalars + 7 lists), mapped onto Spark types
  (reference: ``storage/api/.../retriever/Feature.java:27-45``).
- ``FeatureTable``: mandatory batch source, optional stream source,
  composite entity keys, ``max_age_secs``, auto-incrementing revision,
  soft delete (``FeatureTable.java:57-214``).
- ``DataSource``: 4 source kinds (file/bigquery/kafka/kinesis) with
  ``event_timestamp_column`` / ``created_timestamp_column`` /
  ``date_partition_column`` / ``field_mapping``
  (``DataSource.java:49-134``).
- ``Store`` subscriptions: ``project:name:exclude`` triples with ``*``
  wildcards, exclusions override includes
  (``common/src/main/java/feast/common/models/Store.java:83-162``).
"""

from __future__ import annotations

import enum
import hashlib
import json
import re
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import types as T


class ValueType(enum.Enum):
    """The reference's 14 value types (+ INVALID).

    Parity: ``Feature.TYPE_TO_VAL_CASE``
    (``storage/api/src/main/java/feast/storage/api/retriever/Feature.java:27-45``).
    """

    INVALID = "INVALID"
    BYTES = "BYTES"
    STRING = "STRING"
    INT32 = "INT32"
    INT64 = "INT64"
    DOUBLE = "DOUBLE"
    FLOAT = "FLOAT"
    BOOL = "BOOL"
    BYTES_LIST = "BYTES_LIST"
    STRING_LIST = "STRING_LIST"
    INT32_LIST = "INT32_LIST"
    INT64_LIST = "INT64_LIST"
    DOUBLE_LIST = "DOUBLE_LIST"
    FLOAT_LIST = "FLOAT_LIST"
    BOOL_LIST = "BOOL_LIST"

    @property
    def is_list(self) -> bool:
        return self.name.endswith("_LIST")

    @property
    def elem(self) -> "ValueType":
        return ValueType[self.name[: -len("_LIST")]] if self.is_list else self

    def to_spark(self) -> T.DataType:
        base = _SCALAR_SPARK[self.elem]
        return T.ArrayType(base) if self.is_list else base

    @classmethod
    def from_spark(cls, dt: T.DataType) -> "ValueType":
        if isinstance(dt, T.ArrayType):
            elem = cls.from_spark(dt.elementType)
            return cls[elem.name + "_LIST"]
        for vt, sdt in _SCALAR_SPARK.items():
            if type(dt) is type(sdt):
                return vt
        # Common widenings: the synthetic tables use int32/timestamp columns.
        if isinstance(dt, (T.ShortType, T.ByteType)):
            return cls.INT32
        if isinstance(dt, (T.TimestampType, T.DateType)):
            return cls.INT64
        return cls.INVALID


_SCALAR_SPARK: dict[ValueType, T.DataType] = {
    ValueType.BYTES: T.BinaryType(),
    ValueType.STRING: T.StringType(),
    ValueType.INT32: T.IntegerType(),
    ValueType.INT64: T.LongType(),
    ValueType.DOUBLE: T.DoubleType(),
    ValueType.FLOAT: T.FloatType(),
    ValueType.BOOL: T.BooleanType(),
}

# Names reserved for system columns
# (parity: FeatureTableValidator.java:30-31).
RESERVED_NAMES = frozenset({"event_timestamp", "created_timestamp"})


@dataclass
class Entity:
    """Join-key definition (parity: ``EntityV2.java:35-129``).

    Scalar value type only; type changes prohibited on update.
    """

    name: str
    value_type: ValueType
    description: str = ""
    labels: dict[str, str] = field(default_factory=dict)

    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "value_type": self.value_type.value,
            "description": self.description,
            "labels": dict(self.labels),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "Entity":
        return cls(
            name=d["name"],
            value_type=ValueType(d["value_type"]),
            description=d.get("description", ""),
            labels=dict(d.get("labels", {})),
        )

    def has_all_labels(self, wanted: dict[str, str]) -> bool:
        """AND-match over k=v pairs (parity: ``EntityV2.hasAllLabels:137-145``)."""
        return all(self.labels.get(k) == v for k, v in wanted.items())


@dataclass
class Feature:
    """A named, typed column of a feature table (parity: ``FeatureV2.java:37-56``)."""

    name: str
    value_type: ValueType
    labels: dict[str, str] = field(default_factory=dict)

    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "value_type": self.value_type.value,
            "labels": dict(self.labels),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "Feature":
        return cls(
            name=d["name"],
            value_type=ValueType(d["value_type"]),
            labels=dict(d.get("labels", {})),
        )

    def has_all_labels(self, wanted: dict[str, str]) -> bool:
        return all(self.labels.get(k) == v for k, v in wanted.items())


@dataclass
class DataSource:
    """Common source fields (parity: ``DataSource.java:64-77,126-131``).

    ``field_mapping`` renames source columns to feature columns;
    ``date_partition_column`` enables partition pruning on dir-partitioned
    data.
    """

    event_timestamp_column: str = ""
    created_timestamp_column: str = ""
    date_partition_column: str = ""
    field_mapping: dict[str, str] = field(default_factory=dict)

    KIND = "base"

    def _common_dict(self) -> dict:
        return {
            "kind": self.KIND,
            "event_timestamp_column": self.event_timestamp_column,
            "created_timestamp_column": self.created_timestamp_column,
            "date_partition_column": self.date_partition_column,
            "field_mapping": dict(self.field_mapping),
        }

    def to_dict(self) -> dict:
        return self._common_dict()

    @staticmethod
    def from_dict(d: Optional[dict]) -> Optional["DataSource"]:
        if d is None:
            return None
        kind = d.get("kind")
        cls = _SOURCE_KINDS.get(kind)
        if cls is None:
            raise ValueError(f"unknown data source kind: {kind!r}")
        return cls._from_dict(d)

    @classmethod
    def _from_dict(cls, d: dict):
        raise NotImplementedError


def _common_kwargs(d: dict) -> dict:
    return {
        "event_timestamp_column": d.get("event_timestamp_column", ""),
        "created_timestamp_column": d.get("created_timestamp_column", ""),
        "date_partition_column": d.get("date_partition_column", ""),
        "field_mapping": dict(d.get("field_mapping", {})),
    }


@dataclass
class FileSource(DataSource):
    """BATCH_FILE source (parity: ``DataSource.java:97-100``; the
    reference's validator is parquet-only, ``DataSourceValidator.java:
    34-43``). csv/json are engine extensions; ``schema_ddl`` (a Spark DDL
    string like ``"id BIGINT, ts TIMESTAMP"``) makes text formats
    single-pass — without it csv/json pay a full inference scan, which is
    acceptable in dev and wrong at 100 TB."""

    file_url: str = ""
    file_format: str = "parquet"
    schema_ddl: str = ""

    KIND = "file"

    def to_dict(self) -> dict:
        d = self._common_dict()
        d.update(
            {
                "file_url": self.file_url,
                "file_format": self.file_format,
                "schema_ddl": self.schema_ddl,
            }
        )
        return d

    @classmethod
    def _from_dict(cls, d: dict) -> "FileSource":
        return cls(
            file_url=d["file_url"],
            file_format=d.get("file_format", "parquet"),
            schema_ddl=d.get("schema_ddl", ""),
            **_common_kwargs(d),
        )


@dataclass
class BigQuerySource(DataSource):
    """BATCH_BIGQUERY source (parity: ``DataSource.java:101-103``;
    ``table_ref`` must match ``project:dataset.table``, ``Matchers.java:25-26``)."""

    table_ref: str = ""

    KIND = "bigquery"

    def to_dict(self) -> dict:
        d = self._common_dict()
        d["table_ref"] = self.table_ref
        return d

    @classmethod
    def _from_dict(cls, d: dict) -> "BigQuerySource":
        return cls(table_ref=d["table_ref"], **_common_kwargs(d))


@dataclass
class KafkaSource(DataSource):
    """STREAM_KAFKA source (parity: ``DataSource.java:104-109``)."""

    bootstrap_servers: str = ""
    topic: str = ""
    message_format: str = "avro"  # "avro" | "proto" | "json"

    KIND = "kafka"

    def to_dict(self) -> dict:
        d = self._common_dict()
        d.update(
            {
                "bootstrap_servers": self.bootstrap_servers,
                "topic": self.topic,
                "message_format": self.message_format,
            }
        )
        return d

    @classmethod
    def _from_dict(cls, d: dict) -> "KafkaSource":
        return cls(
            bootstrap_servers=d.get("bootstrap_servers", ""),
            topic=d.get("topic", ""),
            message_format=d.get("message_format", "avro"),
            **_common_kwargs(d),
        )


@dataclass
class KinesisSource(DataSource):
    """STREAM_KINESIS source (parity: ``DataSource.java:110-116``).

    No OSS Spark DSv2 connector exists; at execution time this is served by
    the Kafka reader pathway or a file-stream stand-in.
    """

    region: str = ""
    stream_name: str = ""
    record_format: str = "avro"

    KIND = "kinesis"

    def to_dict(self) -> dict:
        d = self._common_dict()
        d.update(
            {
                "region": self.region,
                "stream_name": self.stream_name,
                "record_format": self.record_format,
            }
        )
        return d

    @classmethod
    def _from_dict(cls, d: dict) -> "KinesisSource":
        return cls(
            region=d.get("region", ""),
            stream_name=d.get("stream_name", ""),
            record_format=d.get("record_format", "avro"),
            **_common_kwargs(d),
        )


_SOURCE_KINDS = {
    c.KIND: c for c in (FileSource, BigQuerySource, KafkaSource, KinesisSource)
}


@dataclass
class FeatureTable:
    """The central table abstraction (parity: ``FeatureTable.java:57-214``).

    - name immutable on update;
    - features upserted / dropped on update;
    - ``revision`` increments on every real change, apply of an equal spec
      is a no-op (``SpecService.applyFeatureTable:395-398``);
    - soft delete (``FeatureTable.delete:362-365``: ``is_deleted=True``,
      revision reset handled by :class:`Registry`).
    """

    name: str
    entities: list[str]
    features: list[Feature]
    max_age_secs: int = 0  # 0 => no staleness check (infinite age)
    labels: dict[str, str] = field(default_factory=dict)
    batch_source: Optional[DataSource] = None
    stream_source: Optional[DataSource] = None
    revision: int = 0
    is_deleted: bool = False

    def feature(self, name: str) -> Optional[Feature]:
        for f in self.features:
            if f.name == name:
                return f
        return None

    def has_all_labels(self, wanted: dict[str, str]) -> bool:
        """Parity: ``FeatureTable.hasAllLabels:348-356``."""
        return all(self.labels.get(k) == v for k, v in wanted.items())

    def has_all_entities(self, entities: list[str]) -> bool:
        """Exact entity-set match (parity: ``FeatureTable.hasAllEntities:281-285``)."""
        return set(self.entities) == set(entities)

    def features_by_labels(self, wanted: dict[str, str]) -> list[Feature]:
        """Parity: ``FeatureTable.getFeaturesByLabels:294-304``."""
        return [f for f in self.features if f.has_all_labels(wanted)]

    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "entities": list(self.entities),
            "features": [f.to_dict() for f in self.features],
            "max_age_secs": self.max_age_secs,
            "labels": dict(self.labels),
            "batch_source": self.batch_source.to_dict() if self.batch_source else None,
            "stream_source": self.stream_source.to_dict()
            if self.stream_source
            else None,
            "revision": self.revision,
            "is_deleted": self.is_deleted,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "FeatureTable":
        return cls(
            name=d["name"],
            entities=list(d["entities"]),
            features=[Feature.from_dict(f) for f in d["features"]],
            max_age_secs=d.get("max_age_secs", 0),
            labels=dict(d.get("labels", {})),
            batch_source=DataSource.from_dict(d.get("batch_source")),
            stream_source=DataSource.from_dict(d.get("stream_source")),
            revision=d.get("revision", 0),
            is_deleted=d.get("is_deleted", False),
        )

    def spec_dict(self) -> dict:
        """The canonical spec (excludes revision/is_deleted bookkeeping)."""
        d = self.to_dict()
        d.pop("revision")
        d.pop("is_deleted")
        # Canonical ordering (parity: FeatureTable.protoHash sorts
        # entities + features, FeatureTable.java:368-375).
        d["entities"] = sorted(d["entities"])
        d["features"] = sorted(d["features"], key=lambda f: f["name"])
        return d

    def spec_hash(self) -> str:
        """Stable content hash of the canonicalized spec.

        The reference hashes the canonical proto with murmur3_32
        (``FeatureTable.java:367-391``); byte parity with protobuf is
        meaningless here, so we hash canonical JSON with md5 (stable across
        processes, unlike Python's ``hash``).
        """
        blob = json.dumps(self.spec_dict(), sort_keys=True).encode()
        return hashlib.md5(blob).hexdigest()

    def schema(self, registry=None) -> T.StructType:
        """Spark schema of the materialized online table for this spec."""
        fields = []
        if registry is not None:
            for e in self.entities:
                ent = registry.get_entity(e)
                fields.append(T.StructField(e, ent.value_type.to_spark(), False))
        else:
            fields.extend(T.StructField(e, T.StringType(), False) for e in self.entities)
        fields.append(T.StructField("event_timestamp", T.TimestampType(), True))
        fields.extend(
            T.StructField(f.name, f.value_type.to_spark(), True) for f in self.features
        )
        return T.StructType(fields)


@dataclass
class Project:
    """Namespace (parity: ``Project.java``; default project ``"default"``,
    ``SpecService.java:320-322``)."""

    name: str
    archived: bool = False

    def to_dict(self) -> dict:
        return {"name": self.name, "archived": self.archived}

    @classmethod
    def from_dict(cls, d: dict) -> "Project":
        return cls(name=d["name"], archived=d.get("archived", False))


@dataclass
class Subscription:
    """``project:name:exclude`` triple (parity: ``Store.java:83-144``)."""

    project: str = "*"
    name: str = "*"
    exclude: bool = False

    @classmethod
    def parse(cls, s: str) -> "Subscription":
        """Parity: ``Store.convertStringToSubscription:83-97``."""
        parts = s.split(":")
        if len(parts) == 2:
            return cls(project=parts[0], name=parts[1], exclude=False)
        if len(parts) == 3:
            return cls(project=parts[0], name=parts[1], exclude=parts[2] == "true")
        raise ValueError(f"invalid subscription string: {s!r}")

    def __str__(self) -> str:
        return f"{self.project}:{self.name}:{str(self.exclude).lower()}"

    def _matches(self, project: str, table: str) -> bool:
        def rx(pat: str) -> str:
            return "^" + re.escape(pat).replace(r"\*", ".*") + "$"

        return bool(re.match(rx(self.project), project)) and bool(
            re.match(rx(self.name), table)
        )


@dataclass
class Store:
    """Online-store registration (parity: ``core/.../model/Store.java:48-121``).

    In this engine the store "type" selects a sink layout for materialized
    online tables; subscriptions decide which feature tables it holds
    (``Store.isSubscribedToProject`` semantics: exclusions override).
    """

    name: str
    store_type: str = "parquet"  # reference: REDIS / REDIS_CLUSTER / BIGTABLE / CASSANDRA
    config: dict[str, str] = field(default_factory=dict)
    subscriptions: list[Subscription] = field(default_factory=list)

    def is_subscribed_to(self, project: str, table: str) -> bool:
        """Wildcard include/exclude match
        (parity: ``common/.../models/Store.java:98-144`` — exclusions win)."""
        included = any(
            s._matches(project, table) for s in self.subscriptions if not s.exclude
        )
        excluded = any(
            s._matches(project, table) for s in self.subscriptions if s.exclude
        )
        return included and not excluded

    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "store_type": self.store_type,
            "config": dict(self.config),
            "subscriptions": [str(s) for s in self.subscriptions],
        }

    @classmethod
    def from_dict(cls, d: dict) -> "Store":
        return cls(
            name=d["name"],
            store_type=d.get("store_type", "parquet"),
            config=dict(d.get("config", {})),
            subscriptions=[Subscription.parse(s) for s in d.get("subscriptions", [])],
        )
