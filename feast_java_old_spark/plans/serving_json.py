"""REST-facing JSON mapping of online-serving responses.

Parity targets:
- ``serving/src/main/java/feast/serving/util/mappers/ResponseJSONMapper.java:28-72``
  — the reference's gRPC→JSON flattener: one map per response row, field
  key → extracted native value, proto-unset values → ``null``;
- ``OnlineServingServiceV2.getOnlineFeatures`` response assembly
  (``OnlineServingServiceV2.java:307-319``): each row carries BOTH a
  ``fields`` map (entity keys + ``table:feature`` refs → values) and a
  ``statuses`` map (same keys → PRESENT / NOT_FOUND / NULL_VALUE /
  OUTSIDE_MAX_AGE), entity fields always PRESENT
  (``OnlineServingServiceTest.java:137-346``, all three status
  scenarios).

This is a DRIVER-SIDE formatter by contract: a serving response is one
request batch (tens–thousands of rows), never a 100 TB frame — the
``collect`` here is the moral equivalent of the reference serializing
its gRPC response; the retrieval plan upstream stays fully distributed.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame

from feast_java_old_spark.operators.retrieval import STATUS_PRESENT

STATUS_SUFFIX = "__status"


def _field_key(vname: str, ref_by_vname: dict[str, str]) -> str:
    """Response key for a value column: the reference emits
    ``table:feature`` refs (FieldValues keys). With the explicit ref
    list the mapping is exact; otherwise fall back to rewriting the
    first ``__`` separator (correct for every table name without a
    double underscore)."""
    if vname in ref_by_vname:
        return ref_by_vname[vname]
    if "__" in vname:
        table, _, feat = vname.partition("__")
        return f"{table}:{feat}"
    return vname


def response_rows(
    df: DataFrame,
    feature_refs: Optional[Sequence[str]] = None,
) -> list[dict]:
    """``get_online_features`` / ``serve_online_features`` output →
    the reference's per-row response structure:
    ``[{"fields": {key: value}, "statuses": {key: status}}, ...]``.

    Entity columns (no ``__status`` twin) appear in ``fields`` with
    status PRESENT — the reference marks request entities PRESENT
    unconditionally. Feature keys are ``table:feature`` when the query
    ran with ``full_feature_names`` (the default), bare feature names
    otherwise — pass ``feature_refs`` (the same list given to the
    query) to make the rename exact.
    """
    ref_by_vname: dict[str, str] = {}
    for ref in feature_refs or ():
        table, sep, feat = ref.partition(":")
        if sep:
            ref_by_vname[f"{table}__{feat}"] = ref
            ref_by_vname[feat] = ref
    cols = df.columns
    status_cols = {c for c in cols if c.endswith(STATUS_SUFFIX)}
    value_cols = [
        c for c in cols if c not in status_cols and c + STATUS_SUFFIX in cols
    ]
    entity_cols = [
        c for c in cols if c not in status_cols and c not in value_cols
    ]
    out = []
    for row in df.collect():
        d = row.asDict()
        fields: dict = {}
        statuses: dict = {}
        for c in entity_cols:
            fields[c] = d[c]
            statuses[c] = STATUS_PRESENT
        for c in value_cols:
            key = _field_key(c, ref_by_vname)
            fields[key] = d[c]
            statuses[key] = d[c + STATUS_SUFFIX]
        out.append({"fields": fields, "statuses": statuses})
    return out


def response_to_json(
    df: DataFrame,
    feature_refs: Optional[Sequence[str]] = None,
) -> list[dict]:
    """The ``ResponseJSONMapper.mapGetOnlineFeaturesResponse`` shape:
    one FLAT map per row, field key → native value (no statuses) —
    non-PRESENT fields map to ``None`` exactly as a proto-unset
    ``Value`` extracts to ``null`` in the reference
    (``ResponseJSONMapper.java:44-71``)."""
    return [r["fields"] for r in response_rows(df, feature_refs)]
