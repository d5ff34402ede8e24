"""Validation rules for registry objects.

Parity targets:
- ``core/src/main/java/feast/core/validators/Matchers.java:25-95``
  (name charset, project charset, BigQuery table ref),
- ``core/src/main/java/feast/core/validators/FeatureTableValidator.java:30-83``
  (reserved names, entity/feature collisions, mandatory batch source),
- ``core/src/main/java/feast/core/validators/DataSourceValidator.java:32-88``
  (parquet-only file format, per-kind required fields),
- ``serving/src/main/java/feast/serving/util/RequestHelper.java:24-42``
  (>=1 entity row, refs must carry table and name).
"""

from __future__ import annotations

import re

from feast_java_old_spark.registry.model import (
    BigQuerySource,
    DataSource,
    FeatureTable,
    FileSource,
    KafkaSource,
    KinesisSource,
    RESERVED_NAMES,
)

# Entity / feature / table names: letters, digits, underscore, must not
# start with a digit (Matchers.java:28-29).
NAME_RE = re.compile(r"^[a-zA-Z_][a-zA-Z0-9_]*$")
# Projects additionally allow dashes (Matchers.java:31-33).
PROJECT_RE = re.compile(r"^[a-zA-Z0-9\-_]+$")
# BigQuery table ref: project:dataset.table (Matchers.java:25-26).
BIGQUERY_REF_RE = re.compile(r"^[a-zA-Z0-9\-]+:[a-zA-Z0-9_]+\.[a-zA-Z0-9_]+$")


class ValidationError(ValueError):
    pass


def check_name(name: str, what: str = "name") -> None:
    if not NAME_RE.match(name or ""):
        raise ValidationError(
            f"invalid {what} {name!r}: must match {NAME_RE.pattern}"
        )


def check_project_name(name: str) -> None:
    if not PROJECT_RE.match(name or ""):
        raise ValidationError(
            f"invalid project name {name!r}: must match {PROJECT_RE.pattern}"
        )


def validate_data_source(source: DataSource) -> None:
    """Parity: ``DataSourceValidator.validate:32-88``."""
    if isinstance(source, FileSource):
        # Reference parity is parquet-only (DataSourceValidator.java:34-43);
        # csv/json/orc/avro are engine extensions over the same source
        # abstraction (avro additionally matches the reference's wire
        # codec, KafkaSerialization.java:31-68, as a batch file).
        if source.file_format.lower() not in (
            "parquet", "csv", "json", "orc", "avro"
        ):
            raise ValidationError(
                f"invalid file format {source.file_format!r}: expected "
                "parquet (reference parity), csv, json, orc, or avro"
            )
        if not source.file_url:
            raise ValidationError("file source requires file_url")
    elif isinstance(source, BigQuerySource):
        if not BIGQUERY_REF_RE.match(source.table_ref or ""):
            raise ValidationError(
                f"invalid BigQuery table ref {source.table_ref!r}: expected "
                "project:dataset.table (Matchers.java:85-95)"
            )
    elif isinstance(source, KafkaSource):
        if not source.topic:
            raise ValidationError("kafka source requires topic")
        if source.message_format not in ("avro", "proto", "json"):
            raise ValidationError(
                f"invalid kafka message format {source.message_format!r}"
            )
    elif isinstance(source, KinesisSource):
        if not source.stream_name:
            raise ValidationError("kinesis source requires stream_name")
        if source.record_format not in ("avro", "proto", "json"):
            raise ValidationError(
                f"invalid kinesis record format {source.record_format!r}"
            )
    else:
        raise ValidationError(f"unknown data source type {type(source).__name__}")
    for col in source.field_mapping.values():
        check_name(col, "mapped column name")


def validate_feature_table(table: FeatureTable) -> None:
    """Parity: ``FeatureTableValidator.validateSpec:33-76``."""
    check_name(table.name, "feature table name")
    if not table.entities:
        raise ValidationError("feature table must declare at least one entity")
    if not table.features:
        raise ValidationError("feature table must declare at least one feature")
    if table.batch_source is None:
        raise ValidationError(
            "batch source is mandatory (FeatureTableValidator.java:43-46)"
        )
    names = [f.name for f in table.features]
    if len(set(names)) != len(names):
        raise ValidationError("duplicate feature names")
    for n in names + list(table.entities):
        check_name(n)
        if n in RESERVED_NAMES:
            raise ValidationError(
                f"reserved name {n!r} (FeatureTableValidator.java:53-61)"
            )
    collisions = set(names) & set(table.entities)
    if collisions:
        raise ValidationError(
            f"entity/feature name collision: {sorted(collisions)} "
            "(FeatureTableValidator.java:63-67)"
        )
    validate_data_source(table.batch_source)
    if table.stream_source is not None:
        validate_data_source(table.stream_source)
    if table.max_age_secs < 0:
        raise ValidationError("max_age_secs must be >= 0")


def validate_online_request(entity_rows, feature_refs) -> None:
    """Parity: ``RequestHelper.validateOnlineRequest:24-42`` +
    ``RequestUtil.parseFeatureRef:51-79`` (refs must be table:feature,
    no project qualification)."""
    if entity_rows is None or len(entity_rows) == 0:
        raise ValidationError("entity rows cannot be empty (RequestHelper.java:26-29)")
    if not feature_refs:
        raise ValidationError("at least one feature reference is required")
    for ref in feature_refs:
        if ref.count(":") != 1:
            raise ValidationError(
                f"feature reference {ref!r} must be 'table:feature' "
                "(RequestUtil.java:51-79)"
            )
        table, feat = ref.split(":")
        if not table or not feat:
            raise ValidationError(f"feature reference {ref!r} missing table or name")
        if "/" in ref:
            raise ValidationError(
                f"project-qualified reference {ref!r} rejected (RequestUtil.java:62-69)"
            )
