"""Protobuf BINARY wire codec for the CORE control plane.

r15 closed the serving data plane's "proto-JSON instead of proto
binary" divergence (:mod:`~feast_java_old_spark.transport.protobin`);
this module closes the CONTROL plane — the messages behind the 13+1
registry RPCs ``CoreServiceImpl.java:45+`` serves (ApplyEntity /
ApplyFeatureTable / Get* / List* / Delete / UpdateStore /
CreateProject / ArchiveProject / GetFeastCoreVersion).

Unlike the serving plane, the engine's control-plane dicts are NOT
near-proto-JSON: the registry model round-trips engine-native shapes
(flat snake_case with ``kind`` discriminators —
``registry.model.Entity/FeatureTable/DataSource/Store.to_dict``),
while the canonical protos nest spec/meta pairs, type enums, and
options oneofs. So each message carries a BRIDGE (registered in
``protobin.MESSAGE_BRIDGES``): ``to_proto`` runs pre-encode,
``from_proto`` post-decode, and both codec directions — client request
encode → server decode, server response encode → client decode — see
only engine dicts at the edges and canonical proto3 binary on the
wire. The JSON codec and every frozen gate/bench path are untouched.

Field numbers and enum values are from the published feast core protos
(the public ``feast/core/{CoreService,Entity,Feature,FeatureTable,
DataSource,DataFormat,Store}.proto`` that generated the reference's
``datatypes/java`` Maven artifact) — public knowledge, no generated
code copied:

- ``Entity`` (spec=1, meta=2); ``EntitySpecV2`` (name=1, value_type=2,
  description=3, labels=8); ``EntityMeta`` (created=1, last_updated=2),
- ``FeatureSpecV2`` (name=1, value_type=2, labels=3),
- ``FeatureTable`` (spec=1, meta=2); ``FeatureTableSpec`` (name=1,
  entities=3, features=4, labels=5, max_age=6, batch_source=7,
  stream_source=8 — field 2 is a retired number); ``FeatureTableMeta``
  (created=1, last_updated=2, revision=3, hash=4),
- ``DataSource`` (type=1, field_mapping=2, event_timestamp_column=3,
  date_partition_column=4, created_timestamp_column=5; options oneof
  file=11 / bigquery=12 / kafka=13 / kinesis=14) with the
  ``DataFormat.proto`` ``FileFormat``/``StreamFormat`` wrappers,
- ``Store`` (name=1, type=2, subscriptions=4; config oneof
  redis_config=11 / redis_cluster_config=14 — the ONLY two arms the
  reference's own control plane round-trips, ``core/model/
  Store.java:77-108`` throws "Invalid store provided" for any other
  type); ``Subscription`` (name=1, project=3, exclude=4; field 2 is
  the reserved v1 version),
- ``feast.types.ValueType.Enum`` (scalars 1-8, lists 11-18 — mirrors
  the Value oneof arm numbers),
- the CoreService request/response pairs (numbers inline below),
- ``google.protobuf.Duration`` (seconds=1, nanos=2).

Engine extensions the canonical protos cannot express REJECT loudly
with :class:`~feast_java_old_spark.transport.protobin.ProtoCodecError`
instead of silently dropping or remapping (the corruption class the
r15 review rounds eliminated): csv/json ``file_format`` and
``schema_ddl`` (the public ``FileFormat`` has a parquet arm only,
matching the reference's parquet-only ``DataSourceValidator.java:
34-43``), the ``json`` Kafka ``message_format`` (``StreamFormat`` has
avro/proto arms only), and non-REDIS/REDIS_CLUSTER store types (exact
``Store.fromProto``/``toProto`` parity — the reference itself throws
for those). Asymmetries that CANNOT raise are documented where they
occur: ``is_deleted`` and Avro schema / proto class-path payloads.

Everything self-registers into ``protobin.METHOD_DESCRIPTORS`` /
``protobin.MESSAGE_BRIDGES`` when :mod:`protobin` is imported, so the
HTTP binding, both channel twins, and ``build_server`` speak binary
for every CoreService method with zero extra wiring.
"""

from __future__ import annotations

from feast_java_old_spark.transport import protobin
from feast_java_old_spark.transport.protobin import (
    TIMESTAMP,
    ProtoCodecError,
    _desc,
)

CORE_SERVICE = "feast.core.CoreService"

# ------------------------------------------------------------ shared types

# feast/types/Value.proto ValueType.Enum — scalar numbers mirror the
# Value oneof arms (1-7), lists ride at +10, UNIX_TIMESTAMP at 8/18.
VALUE_TYPE_ENUM = {
    "INVALID": 0,
    "BYTES": 1,
    "STRING": 2,
    "INT32": 3,
    "INT64": 4,
    "DOUBLE": 5,
    "FLOAT": 6,
    "BOOL": 7,
    "UNIX_TIMESTAMP": 8,
    "BYTES_LIST": 11,
    "STRING_LIST": 12,
    "INT32_LIST": 13,
    "INT64_LIST": 14,
    "DOUBLE_LIST": 15,
    "FLOAT_LIST": 16,
    "BOOL_LIST": 17,
    "UNIX_TIMESTAMP_LIST": 18,
}

DURATION = _desc(
    "google.protobuf.Duration",
    {
        1: ("seconds", "optional", "int64", None),
        2: ("nanos", "optional", "int32", None),
    },
)

# ------------------------------------------------------- Entity / Feature

ENTITY_SPEC_V2 = _desc(
    "feast.core.EntitySpecV2",
    {
        1: ("name", "optional", "string", None),
        2: ("valueType", "optional", "enum", VALUE_TYPE_ENUM),
        3: ("description", "optional", "string", None),
        8: ("labels", "map", "string", ("string", None)),
    },
)

ENTITY_META = _desc(
    "feast.core.EntityMeta",
    {
        1: ("createdTimestamp", "optional", "message", TIMESTAMP),
        2: ("lastUpdatedTimestamp", "optional", "message", TIMESTAMP),
    },
)

ENTITY_V2 = _desc(
    "feast.core.Entity",
    {
        1: ("spec", "optional", "message", ENTITY_SPEC_V2),
        2: ("meta", "optional", "message", ENTITY_META),
    },
)

FEATURE_SPEC_V2 = _desc(
    "feast.core.FeatureSpecV2",
    {
        1: ("name", "optional", "string", None),
        2: ("valueType", "optional", "enum", VALUE_TYPE_ENUM),
        3: ("labels", "map", "string", ("string", None)),
    },
)

# --------------------------------------------------- DataFormat wrappers

PARQUET_FORMAT = _desc("feast.core.FileFormat.ParquetFormat", {})
FILE_FORMAT = _desc(
    "feast.core.FileFormat",
    {1: ("parquetFormat", "oneof", "message", PARQUET_FORMAT)},
)
AVRO_FORMAT = _desc(
    "feast.core.StreamFormat.AvroFormat",
    {1: ("schemaJson", "optional", "string", None)},
)
PROTO_FORMAT = _desc(
    "feast.core.StreamFormat.ProtoFormat",
    {1: ("classPath", "optional", "string", None)},
)
STREAM_FORMAT = _desc(
    "feast.core.StreamFormat",
    {
        1: ("avroFormat", "oneof", "message", AVRO_FORMAT),
        2: ("protoFormat", "oneof", "message", PROTO_FORMAT),
    },
)

# ------------------------------------------------------------ DataSource

SOURCE_TYPE = {
    "INVALID": 0,
    "BATCH_FILE": 1,
    "BATCH_BIGQUERY": 2,
    "STREAM_KAFKA": 3,
    "STREAM_KINESIS": 4,
}

FILE_OPTIONS = _desc(
    "feast.core.DataSource.FileOptions",
    {
        1: ("fileFormat", "optional", "message", FILE_FORMAT),
        2: ("fileUrl", "optional", "string", None),
    },
)
BIGQUERY_OPTIONS = _desc(
    "feast.core.DataSource.BigQueryOptions",
    {1: ("tableRef", "optional", "string", None)},
)
KAFKA_OPTIONS = _desc(
    "feast.core.DataSource.KafkaOptions",
    {
        1: ("bootstrapServers", "optional", "string", None),
        2: ("topic", "optional", "string", None),
        3: ("messageFormat", "optional", "message", STREAM_FORMAT),
    },
)
KINESIS_OPTIONS = _desc(
    "feast.core.DataSource.KinesisOptions",
    {
        1: ("region", "optional", "string", None),
        2: ("streamName", "optional", "string", None),
        3: ("recordFormat", "optional", "message", STREAM_FORMAT),
    },
)
DATA_SOURCE = _desc(
    "feast.core.DataSource",
    {
        1: ("type", "optional", "enum", SOURCE_TYPE),
        2: ("fieldMapping", "map", "string", ("string", None)),
        3: ("eventTimestampColumn", "optional", "string", None),
        4: ("datePartitionColumn", "optional", "string", None),
        5: ("createdTimestampColumn", "optional", "string", None),
        11: ("fileOptions", "oneof", "message", FILE_OPTIONS),
        12: ("bigqueryOptions", "oneof", "message", BIGQUERY_OPTIONS),
        13: ("kafkaOptions", "oneof", "message", KAFKA_OPTIONS),
        14: ("kinesisOptions", "oneof", "message", KINESIS_OPTIONS),
    },
)

# ---------------------------------------------------------- FeatureTable

FEATURE_TABLE_SPEC = _desc(
    "feast.core.FeatureTableSpec",
    {
        1: ("name", "optional", "string", None),
        3: ("entities", "repeated", "string", None),
        4: ("features", "repeated", "message", FEATURE_SPEC_V2),
        5: ("labels", "map", "string", ("string", None)),
        6: ("maxAge", "optional", "message", DURATION),
        7: ("batchSource", "optional", "message", DATA_SOURCE),
        8: ("streamSource", "optional", "message", DATA_SOURCE),
    },
)
FEATURE_TABLE_META = _desc(
    "feast.core.FeatureTableMeta",
    {
        1: ("createdTimestamp", "optional", "message", TIMESTAMP),
        2: ("lastUpdatedTimestamp", "optional", "message", TIMESTAMP),
        3: ("revision", "optional", "int64", None),
        4: ("hash", "optional", "string", None),
    },
)
FEATURE_TABLE = _desc(
    "feast.core.FeatureTable",
    {
        1: ("spec", "optional", "message", FEATURE_TABLE_SPEC),
        2: ("meta", "optional", "message", FEATURE_TABLE_META),
    },
)

# ----------------------------------------------------------------- Store

STORE_TYPE = {"INVALID": 0, "REDIS": 1, "REDIS_CLUSTER": 4}

REDIS_CONFIG = _desc(
    "feast.core.Store.RedisConfig",
    {
        1: ("host", "optional", "string", None),
        2: ("port", "optional", "int32", None),
        3: ("initialBackoffMs", "optional", "int32", None),
        4: ("maxRetries", "optional", "int32", None),
        5: ("flushFrequencySeconds", "optional", "int64", None),
        6: ("ssl", "optional", "bool", None),
    },
)
REDIS_CLUSTER_CONFIG = _desc(
    "feast.core.Store.RedisClusterConfig",
    {
        1: ("connectionString", "optional", "string", None),
        2: ("initialBackoffMs", "optional", "int32", None),
        3: ("maxRetries", "optional", "int32", None),
        4: ("flushFrequencySeconds", "optional", "int64", None),
        5: ("keyPrefix", "optional", "string", None),
        6: ("enableFallback", "optional", "bool", None),
        7: ("fallbackPrefix", "optional", "string", None),
    },
)
SUBSCRIPTION = _desc(
    "feast.core.Store.Subscription",
    {
        1: ("name", "optional", "string", None),
        3: ("project", "optional", "string", None),
        4: ("exclude", "optional", "bool", None),
    },
)
STORE = _desc(
    "feast.core.Store",
    {
        1: ("name", "optional", "string", None),
        2: ("type", "optional", "enum", STORE_TYPE),
        4: ("subscriptions", "repeated", "message", SUBSCRIPTION),
        11: ("redisConfig", "oneof", "message", REDIS_CONFIG),
        14: ("redisClusterConfig", "oneof", "message", REDIS_CLUSTER_CONFIG),
    },
)

# ------------------------------------------- CoreService request/response

GET_FEAST_CORE_VERSION_REQUEST = _desc(
    "feast.core.GetFeastCoreVersionRequest", {}
)
GET_FEAST_CORE_VERSION_RESPONSE = _desc(
    "feast.core.GetFeastCoreVersionResponse",
    {1: ("version", "optional", "string", None)},
)

GET_ENTITY_REQUEST = _desc(
    "feast.core.GetEntityRequest",
    {
        1: ("name", "optional", "string", None),
        2: ("project", "optional", "string", None),
    },
)
GET_ENTITY_RESPONSE = _desc(
    "feast.core.GetEntityResponse",
    {1: ("entity", "optional", "message", ENTITY_V2)},
)

# Filter numbers start at 3: the v1 ListFeatureSetsRequest.Filter this
# shape descends from used 1/2 for the retired name/version patterns.
LIST_ENTITIES_FILTER = _desc(
    "feast.core.ListEntitiesRequest.Filter",
    {
        3: ("project", "optional", "string", None),
        4: ("labels", "map", "string", ("string", None)),
    },
)
LIST_ENTITIES_REQUEST = _desc(
    "feast.core.ListEntitiesRequest",
    {1: ("filter", "optional", "message", LIST_ENTITIES_FILTER)},
)
LIST_ENTITIES_RESPONSE = _desc(
    "feast.core.ListEntitiesResponse",
    {1: ("entities", "repeated", "message", ENTITY_V2)},
)

APPLY_ENTITY_REQUEST = _desc(
    "feast.core.ApplyEntityRequest",
    {
        1: ("spec", "optional", "message", ENTITY_SPEC_V2),
        2: ("project", "optional", "string", None),
    },
)
APPLY_ENTITY_RESPONSE = _desc(
    "feast.core.ApplyEntityResponse",
    {1: ("entity", "optional", "message", ENTITY_V2)},
)

GET_FEATURE_TABLE_REQUEST = _desc(
    "feast.core.GetFeatureTableRequest",
    {
        1: ("project", "optional", "string", None),
        2: ("name", "optional", "string", None),
    },
)
GET_FEATURE_TABLE_RESPONSE = _desc(
    "feast.core.GetFeatureTableResponse",
    {1: ("table", "optional", "message", FEATURE_TABLE)},
)

LIST_FEATURE_TABLES_FILTER = _desc(
    "feast.core.ListFeatureTablesRequest.Filter",
    {
        1: ("project", "optional", "string", None),
        3: ("labels", "map", "string", ("string", None)),
    },
)
LIST_FEATURE_TABLES_REQUEST = _desc(
    "feast.core.ListFeatureTablesRequest",
    {1: ("filter", "optional", "message", LIST_FEATURE_TABLES_FILTER)},
)
LIST_FEATURE_TABLES_RESPONSE = _desc(
    "feast.core.ListFeatureTablesResponse",
    {1: ("tables", "repeated", "message", FEATURE_TABLE)},
)

APPLY_FEATURE_TABLE_REQUEST = _desc(
    "feast.core.ApplyFeatureTableRequest",
    {
        1: ("project", "optional", "string", None),
        2: ("tableSpec", "optional", "message", FEATURE_TABLE_SPEC),
    },
)
APPLY_FEATURE_TABLE_RESPONSE = _desc(
    "feast.core.ApplyFeatureTableResponse",
    {1: ("table", "optional", "message", FEATURE_TABLE)},
)

DELETE_FEATURE_TABLE_REQUEST = _desc(
    "feast.core.DeleteFeatureTableRequest",
    {
        1: ("project", "optional", "string", None),
        2: ("name", "optional", "string", None),
    },
)
DELETE_FEATURE_TABLE_RESPONSE = _desc(
    "feast.core.DeleteFeatureTableResponse", {}
)

LIST_FEATURES_FILTER = _desc(
    "feast.core.ListFeaturesRequest.Filter",
    {
        1: ("labels", "map", "string", ("string", None)),
        2: ("entities", "repeated", "string", None),
        3: ("project", "optional", "string", None),
    },
)
LIST_FEATURES_REQUEST = _desc(
    "feast.core.ListFeaturesRequest",
    {1: ("filter", "optional", "message", LIST_FEATURES_FILTER)},
)
# features map is field 2: field 1 carried the retired v1 map.
LIST_FEATURES_RESPONSE = _desc(
    "feast.core.ListFeaturesResponse",
    {2: ("features", "map", "string", ("message", FEATURE_SPEC_V2))},
)

LIST_STORES_FILTER = _desc(
    "feast.core.ListStoresRequest.Filter",
    {1: ("name", "optional", "string", None)},
)
LIST_STORES_REQUEST = _desc(
    "feast.core.ListStoresRequest",
    {1: ("filter", "optional", "message", LIST_STORES_FILTER)},
)
LIST_STORES_RESPONSE = _desc(
    "feast.core.ListStoresResponse",
    {1: ("store", "repeated", "message", STORE)},
)

UPDATE_STORE_REQUEST = _desc(
    "feast.core.UpdateStoreRequest",
    {1: ("store", "optional", "message", STORE)},
)
UPDATE_STORE_STATUS = {"NO_CHANGE": 0, "UPDATED": 1}
UPDATE_STORE_RESPONSE = _desc(
    "feast.core.UpdateStoreResponse",
    {
        1: ("store", "optional", "message", STORE),
        2: ("status", "optional", "enum", UPDATE_STORE_STATUS),
    },
)

CREATE_PROJECT_REQUEST = _desc(
    "feast.core.CreateProjectRequest",
    {1: ("name", "optional", "string", None)},
)
CREATE_PROJECT_RESPONSE = _desc("feast.core.CreateProjectResponse", {})

LIST_PROJECTS_REQUEST = _desc("feast.core.ListProjectsRequest", {})
LIST_PROJECTS_RESPONSE = _desc(
    "feast.core.ListProjectsResponse",
    {1: ("projects", "repeated", "string", None)},
)

ARCHIVE_PROJECT_REQUEST = _desc(
    "feast.core.ArchiveProjectRequest",
    {1: ("name", "optional", "string", None)},
)
ARCHIVE_PROJECT_RESPONSE = _desc("feast.core.ArchiveProjectResponse", {})


# ------------------------------------------------- engine↔proto bridges
#
# to_proto accepts the ENGINE dict shape (what the JSON servicer and
# registry model speak); from_proto returns it. The canonical shapes
# exist only between the bridge and the wire.


def _entity_spec_to_proto(d: dict) -> dict:
    out: dict = {"name": d.get("name", "")}
    if d.get("value_type"):
        out["valueType"] = d["value_type"]
    if d.get("description"):
        out["description"] = d["description"]
    if d.get("labels"):
        out["labels"] = dict(d["labels"])
    return out


def _entity_spec_from_proto(p: dict) -> dict:
    return {
        "name": p.get("name", ""),
        "value_type": p.get("valueType", "INVALID"),
        "description": p.get("description", ""),
        "labels": dict(p.get("labels", {})),
    }


def _entity_to_proto(d: dict) -> dict:
    # the engine tracks no created/updated timestamps → spec only
    return {"spec": _entity_spec_to_proto(d)}


def _entity_from_proto(p: dict) -> dict:
    return _entity_spec_from_proto(p.get("spec", {}))


def _feature_spec_to_proto(d: dict) -> dict:
    out: dict = {"name": d.get("name", "")}
    if d.get("value_type"):
        out["valueType"] = d["value_type"]
    if d.get("labels"):
        out["labels"] = dict(d["labels"])
    return out


def _feature_spec_from_proto(p: dict) -> dict:
    return {
        "name": p.get("name", ""),
        "value_type": p.get("valueType", "INVALID"),
        "labels": dict(p.get("labels", {})),
    }


def _stream_format_to_proto(fmt: str) -> dict:
    # The engine keys stream decode off the format NAME; schema_json /
    # class_path payloads are not modeled (the engine's Kafka decode
    # takes schemas through its own reader spec), so the arms ride
    # empty — presence IS the format.
    if fmt == "avro":
        return {"avroFormat": {}}
    if fmt == "proto":
        return {"protoFormat": {}}
    raise ProtoCodecError(
        f"StreamFormat cannot carry engine-extension format {fmt!r} "
        "(the public DataFormat.proto has avro/proto arms only)"
    )


def _stream_format_from_proto(p) -> str:
    # documented lossy edge: an inbound schemaJson/classPath payload is
    # dropped (the engine model has no field for it)
    if isinstance(p, dict) and "protoFormat" in p:
        return "proto"
    return "avro"


_KIND_TO_TYPE = {
    "file": "BATCH_FILE",
    "bigquery": "BATCH_BIGQUERY",
    "kafka": "STREAM_KAFKA",
    "kinesis": "STREAM_KINESIS",
}


def _source_to_proto(d):
    if d is None:
        return None
    kind = d.get("kind")
    if kind not in _KIND_TO_TYPE:
        raise ProtoCodecError(f"unknown data source kind {kind!r}")
    out: dict = {"type": _KIND_TO_TYPE[kind]}
    if d.get("field_mapping"):
        out["fieldMapping"] = dict(d["field_mapping"])
    if d.get("event_timestamp_column"):
        out["eventTimestampColumn"] = d["event_timestamp_column"]
    if d.get("date_partition_column"):
        out["datePartitionColumn"] = d["date_partition_column"]
    if d.get("created_timestamp_column"):
        out["createdTimestampColumn"] = d["created_timestamp_column"]
    if kind == "file":
        fmt = d.get("file_format", "parquet")
        if fmt != "parquet":
            raise ProtoCodecError(
                f"FileFormat cannot carry engine-extension file_format "
                f"{fmt!r} (the public proto has a parquet arm only — the "
                "reference's validator is parquet-only too, "
                "DataSourceValidator.java:34-43)"
            )
        if d.get("schema_ddl"):
            raise ProtoCodecError(
                "schema_ddl is an engine extension the DataSource proto "
                "cannot carry"
            )
        out["fileOptions"] = {
            "fileFormat": {"parquetFormat": {}},
            "fileUrl": d.get("file_url", ""),
        }
    elif kind == "bigquery":
        out["bigqueryOptions"] = {"tableRef": d.get("table_ref", "")}
    elif kind == "kafka":
        out["kafkaOptions"] = {
            "bootstrapServers": d.get("bootstrap_servers", ""),
            "topic": d.get("topic", ""),
            "messageFormat": _stream_format_to_proto(
                d.get("message_format", "avro")
            ),
        }
    else:  # kinesis
        out["kinesisOptions"] = {
            "region": d.get("region", ""),
            "streamName": d.get("stream_name", ""),
            "recordFormat": _stream_format_to_proto(
                d.get("record_format", "avro")
            ),
        }
    return out


def _source_from_proto(p):
    if not p:
        return None
    common = {
        "event_timestamp_column": p.get("eventTimestampColumn", ""),
        "created_timestamp_column": p.get("createdTimestampColumn", ""),
        "date_partition_column": p.get("datePartitionColumn", ""),
        "field_mapping": dict(p.get("fieldMapping", {})),
    }
    if "fileOptions" in p:
        return {
            "kind": "file",
            "file_url": p["fileOptions"].get("fileUrl", ""),
            "file_format": "parquet",
            "schema_ddl": "",
            **common,
        }
    if "bigqueryOptions" in p:
        return {
            "kind": "bigquery",
            "table_ref": p["bigqueryOptions"].get("tableRef", ""),
            **common,
        }
    if "kafkaOptions" in p:
        ko = p["kafkaOptions"]
        return {
            "kind": "kafka",
            "bootstrap_servers": ko.get("bootstrapServers", ""),
            "topic": ko.get("topic", ""),
            "message_format": _stream_format_from_proto(
                ko.get("messageFormat")
            ),
            **common,
        }
    if "kinesisOptions" in p:
        ko = p["kinesisOptions"]
        return {
            "kind": "kinesis",
            "region": ko.get("region", ""),
            "stream_name": ko.get("streamName", ""),
            "record_format": _stream_format_from_proto(
                ko.get("recordFormat")
            ),
            **common,
        }
    # options oneof unset: fall back on the type enum with empty options
    t = p.get("type", "INVALID")
    kind = {v: k for k, v in _KIND_TO_TYPE.items()}.get(t)
    if kind is None:
        raise ProtoCodecError(
            f"DataSource with no options and type {t!r}"
        )
    base = {
        "file": {"kind": "file", "file_url": "", "file_format": "parquet",
                 "schema_ddl": ""},
        "bigquery": {"kind": "bigquery", "table_ref": ""},
        "kafka": {"kind": "kafka", "bootstrap_servers": "", "topic": "",
                  "message_format": "avro"},
        "kinesis": {"kind": "kinesis", "region": "", "stream_name": "",
                    "record_format": "avro"},
    }[kind]
    return {**base, **common}


def _table_spec_to_proto(d: dict) -> dict:
    out: dict = {"name": d.get("name", "")}
    if d.get("entities"):
        out["entities"] = list(d["entities"])
    if d.get("features"):
        out["features"] = [_feature_spec_to_proto(f) for f in d["features"]]
    if d.get("labels"):
        out["labels"] = dict(d["labels"])
    if d.get("max_age_secs"):
        out["maxAge"] = {"seconds": int(d["max_age_secs"])}
    bs = _source_to_proto(d.get("batch_source"))
    if bs is not None:
        out["batchSource"] = bs
    ss = _source_to_proto(d.get("stream_source"))
    if ss is not None:
        out["streamSource"] = ss
    return out


def _duration_secs(v) -> int:
    """Duration out of this codec's dict form ({"seconds": n}) or
    canonical proto-JSON's "300s" string (the shape a real proto-JSON
    client writes — accepted so the servicer's canonical-body path can
    reuse this converter)."""
    if isinstance(v, str):
        if not v.endswith("s"):
            raise ProtoCodecError(f"invalid Duration {v!r}")
        try:
            return int(float(v[:-1]))
        except ValueError as ex:
            raise ProtoCodecError(f"invalid Duration {v!r}") from ex
    return int((v or {}).get("seconds", 0))


def _table_spec_from_proto(p: dict) -> dict:
    return {
        "name": p.get("name", ""),
        "entities": list(p.get("entities", [])),
        "features": [
            _feature_spec_from_proto(f) for f in p.get("features", [])
        ],
        "max_age_secs": _duration_secs(p.get("maxAge")),
        "labels": dict(p.get("labels", {})),
        "batch_source": _source_from_proto(p.get("batchSource")),
        "stream_source": _source_from_proto(p.get("streamSource")),
    }


def _table_to_proto(d: dict) -> dict:
    # is_deleted cannot ride the proto (FeatureTableSpec has no such
    # field) — harmless: Get/List never return soft-deleted tables
    out: dict = {"spec": _table_spec_to_proto(d)}
    if d.get("revision"):
        out["meta"] = {"revision": int(d["revision"])}
    return out


def _table_from_proto(p: dict) -> dict:
    d = _table_spec_from_proto(p.get("spec", {}))
    d["revision"] = int(p.get("meta", {}).get("revision", 0))
    d["is_deleted"] = False
    return d


# (engine config key → (proto json name, to-proto conv)) per config arm.
# Engine store configs are Map<String,String> (FeastProperties parity),
# so decode stringifies back.
def _to_bool(v) -> bool:
    return v is True or str(v).lower() == "true"


_REDIS_KEYS = {
    "host": ("host", str),
    "port": ("port", int),
    "initial_backoff_ms": ("initialBackoffMs", int),
    "max_retries": ("maxRetries", int),
    "flush_frequency_seconds": ("flushFrequencySeconds", int),
    "ssl": ("ssl", _to_bool),
}
_REDIS_CLUSTER_KEYS = {
    "connection_string": ("connectionString", str),
    "initial_backoff_ms": ("initialBackoffMs", int),
    "max_retries": ("maxRetries", int),
    "flush_frequency_seconds": ("flushFrequencySeconds", int),
    "key_prefix": ("keyPrefix", str),
    "enable_fallback": ("enableFallback", _to_bool),
    "fallback_prefix": ("fallbackPrefix", str),
}


def _store_to_proto(d: dict) -> dict:
    st = d.get("store_type", "parquet")
    if st not in ("REDIS", "REDIS_CLUSTER"):
        # exact reference parity: core/model/Store.java:77-108 throws
        # "Invalid store provided" for every other type — the engine's
        # "parquet" sink layout is JSON-codec-only by construction
        raise ProtoCodecError(
            f"Invalid store provided: StoreProto carries REDIS/"
            f"REDIS_CLUSTER configs only; store_type {st!r} is "
            "engine-local"
        )
    out: dict = {"name": d.get("name", ""), "type": st}
    subs = []
    for s in d.get("subscriptions", []):
        parts = str(s).split(":")
        if len(parts) == 2:
            sub = {"project": parts[0], "name": parts[1]}
        elif len(parts) == 3:
            sub = {"project": parts[0], "name": parts[1]}
            if parts[2] == "true":
                sub["exclude"] = True
        else:
            raise ProtoCodecError(f"invalid subscription string {s!r}")
        subs.append(sub)
    if subs:
        out["subscriptions"] = subs
    table = _REDIS_KEYS if st == "REDIS" else _REDIS_CLUSTER_KEYS
    msg: dict = {}
    for k, v in (d.get("config") or {}).items():
        spec = table.get(k)
        if spec is None:
            raise ProtoCodecError(
                f"store config key {k!r} has no {st} StoreProto field"
            )
        try:
            msg[spec[0]] = spec[1](v)
        except (TypeError, ValueError) as ex:
            raise ProtoCodecError(
                f"store config {k!r}: cannot convert {v!r}"
            ) from ex
    # the config arm is always SET (Store.toProto parity), empty or not
    out["redisConfig" if st == "REDIS" else "redisClusterConfig"] = msg
    return out


def _store_from_proto(p: dict) -> dict:
    st = p.get("type", "INVALID")
    subs = [
        f"{s.get('project', '')}:{s.get('name', '')}:"
        f"{'true' if s.get('exclude') else 'false'}"
        for s in p.get("subscriptions", [])
    ]
    cfg: dict = {}
    arm, table = (
        ("redisConfig", _REDIS_KEYS)
        if "redisConfig" in p
        else ("redisClusterConfig", _REDIS_CLUSTER_KEYS)
    )
    if arm in p:
        # Java parity: Store.toProto parses the stored config bytes and
        # the reader walks EVERY getter, which fills proto defaults for
        # fields absent from the wire (proto3 elides default-valued
        # scalars — "port": "0" genuinely isn't on the wire). So the
        # decode side repopulates the arm's FULL key set; wire-present
        # keys only would silently shrink the config map across a
        # binary round-trip.
        for snake, (cam, conv) in table.items():
            v = p[arm].get(cam, False if conv is _to_bool else
                           0 if conv is int else "")
            cfg[snake] = (
                ("true" if v else "false") if conv is _to_bool else str(v)
            )
    return {
        "name": p.get("name", ""),
        # absent/INVALID type decodes to the engine default sink layout
        "store_type": st if st != "INVALID" else "parquet",
        "config": cfg,
        "subscriptions": subs,
    }


# ------------------------------------------ top-level message transforms


def _wrap(field: str, to_item, from_item):
    """Bridge pair for a message whose single bridged field holds one
    engine object."""

    def to_proto(r: dict) -> dict:
        out = dict(r)
        if out.get(field) is not None:
            out[field] = to_item(out[field])
        return out

    def from_proto(p: dict) -> dict:
        out = dict(p)
        if field in out:
            out[field] = from_item(out[field])
        return out

    return to_proto, from_proto


def _wrap_list(field: str, to_item, from_item):
    def to_proto(r: dict) -> dict:
        out = dict(r)
        if out.get(field):
            out[field] = [to_item(x) for x in out[field]]
        return out

    def from_proto(p: dict) -> dict:
        out = dict(p)
        out[field] = [from_item(x) for x in out.get(field, [])]
        return out

    return to_proto, from_proto


def _apply_table_req_to_proto(r: dict) -> dict:
    # the engine JSON servicer reads request["spec"]; canonical clients
    # say table_spec — accept both on encode, emit canonical. Unknown
    # keys are PRESERVED so encode_message raises its unknown-field
    # error exactly like every other CoreService message (a typo'd
    # "Project" must not silently apply to the default project).
    out = dict(r)
    spec = out.pop("spec", None)
    if spec is None:
        spec = out.pop("tableSpec", None)
    else:
        out.pop("tableSpec", None)
    if spec is not None:
        out["tableSpec"] = _table_spec_to_proto(spec)
    return out


def _apply_table_req_from_proto(p: dict) -> dict:
    out: dict = {}
    if "tableSpec" in p:
        out["spec"] = _table_spec_from_proto(p["tableSpec"])
    if "project" in p:
        out["project"] = p["project"]
    return out


def _list_stores_to_proto(r: dict) -> dict:
    # The ONE deliberate encode-side filter in this module: a registry
    # legitimately holds engine-local sink layouts (store_type
    # "parquet" is the engine default), which the reference wire cannot
    # carry — its own ListStores throws from Store.toProto, but only
    # because its ApplyStore path can never ADMIT such a store. Failing
    # the whole read response would make binary ListStores unusable on
    # every default-configured registry, so non-representable stores
    # are omitted from the BINARY listing (the JSON codec on the same
    # socket remains the full-fidelity surface). Mutations still reject
    # loudly (_store_to_proto below).
    out = dict(r)
    kept = []
    for s in out.get("store") or []:
        try:
            kept.append(_store_to_proto(s))
        except ProtoCodecError:
            continue
    if "store" in out or kept:
        out["store"] = kept
    return out


def _features_map_to_proto(r: dict) -> dict:
    out = dict(r)
    if out.get("features"):
        out["features"] = {
            k: _feature_spec_to_proto(v) for k, v in out["features"].items()
        }
    return out


def _features_map_from_proto(p: dict) -> dict:
    out = dict(p)
    out["features"] = {
        k: _feature_spec_from_proto(v)
        for k, v in out.get("features", {}).items()
    }
    return out


# --------------------------------------------------------- registration

protobin.METHOD_DESCRIPTORS[CORE_SERVICE] = {
    "GetFeastCoreVersion": (
        GET_FEAST_CORE_VERSION_REQUEST,
        GET_FEAST_CORE_VERSION_RESPONSE,
    ),
    "GetEntity": (GET_ENTITY_REQUEST, GET_ENTITY_RESPONSE),
    "ListEntities": (LIST_ENTITIES_REQUEST, LIST_ENTITIES_RESPONSE),
    "ApplyEntity": (APPLY_ENTITY_REQUEST, APPLY_ENTITY_RESPONSE),
    "GetFeatureTable": (
        GET_FEATURE_TABLE_REQUEST,
        GET_FEATURE_TABLE_RESPONSE,
    ),
    "ListFeatureTables": (
        LIST_FEATURE_TABLES_REQUEST,
        LIST_FEATURE_TABLES_RESPONSE,
    ),
    "ApplyFeatureTable": (
        APPLY_FEATURE_TABLE_REQUEST,
        APPLY_FEATURE_TABLE_RESPONSE,
    ),
    "DeleteFeatureTable": (
        DELETE_FEATURE_TABLE_REQUEST,
        DELETE_FEATURE_TABLE_RESPONSE,
    ),
    "ListFeatures": (LIST_FEATURES_REQUEST, LIST_FEATURES_RESPONSE),
    "ListStores": (LIST_STORES_REQUEST, LIST_STORES_RESPONSE),
    "UpdateStore": (UPDATE_STORE_REQUEST, UPDATE_STORE_RESPONSE),
    "CreateProject": (CREATE_PROJECT_REQUEST, CREATE_PROJECT_RESPONSE),
    "ListProjects": (LIST_PROJECTS_REQUEST, LIST_PROJECTS_RESPONSE),
    "ArchiveProject": (ARCHIVE_PROJECT_REQUEST, ARCHIVE_PROJECT_RESPONSE),
}

protobin.MESSAGE_BRIDGES.update(
    {
        "feast.core.GetEntityResponse": _wrap(
            "entity", _entity_to_proto, _entity_from_proto
        ),
        "feast.core.ListEntitiesResponse": _wrap_list(
            "entities", _entity_to_proto, _entity_from_proto
        ),
        "feast.core.ApplyEntityRequest": _wrap(
            "spec", _entity_spec_to_proto, _entity_spec_from_proto
        ),
        "feast.core.ApplyEntityResponse": _wrap(
            "entity", _entity_to_proto, _entity_from_proto
        ),
        "feast.core.GetFeatureTableResponse": _wrap(
            "table", _table_to_proto, _table_from_proto
        ),
        "feast.core.ListFeatureTablesResponse": _wrap_list(
            "tables", _table_to_proto, _table_from_proto
        ),
        "feast.core.ApplyFeatureTableRequest": (
            _apply_table_req_to_proto,
            _apply_table_req_from_proto,
        ),
        "feast.core.ApplyFeatureTableResponse": _wrap(
            "table", _table_to_proto, _table_from_proto
        ),
        "feast.core.ListFeaturesResponse": (
            _features_map_to_proto,
            _features_map_from_proto,
        ),
        "feast.core.ListStoresResponse": (
            _list_stores_to_proto,
            _wrap_list("store", _store_to_proto, _store_from_proto)[1],
        ),
        "feast.core.UpdateStoreRequest": _wrap(
            "store", _store_to_proto, _store_from_proto
        ),
        "feast.core.UpdateStoreResponse": _wrap(
            "store", _store_to_proto, _store_from_proto
        ),
    }
)
