"""Serving REST controller — ``ServingServiceRestController``.

Parity target: ``serving/src/main/java/feast/serving/controller/
ServingServiceRestController.java:36-66`` — the serving module's HTTP
surface, two endpoints over the SAME service the gRPC controller uses:

- ``GET /api/v1/info`` → the ``GetFeastServingInfo`` response with the
  ``version`` field overwritten from build properties
  (``getInfo:48-53`` — the controller stamps ``feastProperties
  .getVersion()`` over whatever the service returned);
- ``POST /api/v1/features/online`` → ``RequestHelper
  .validateOnlineRequest`` (``RequestHelper.java:25-42``: entity rows
  must be non-empty, every feature reference must carry BOTH a
  FeatureTable name and a Feature name — each violation an
  ``IllegalArgumentException`` with the reference's exact message),
  then ``servingService.getOnlineFeatures``, then
  ``ResponseJSONMapper.mapGetOnlineFeaturesResponse`` — a list of FLAT
  field→value maps, one per entity row (``response_to_json``).

Request shape: the proto-JSON of ``GetOnlineFeaturesRequestV2`` —
``features`` (list of ``{"featureTable": ..., "name": ...}`` /
snake_case twins / ``"table:feature"`` strings), ``entityRows`` /
``entity_rows`` (list of ``{"fields": {...}}`` with an optional
ISO-8601 ``timestamp``, or bare field maps), optional ``project``.
Field values are native JSON scalars; a single-key proto ``Value``
wrapper (``{"int64Val": 7}``) is unwrapped for proto-JSON clients.

Security parity (documented, not enforced here): the reference's
``WebSecurityConfig.java:41-48`` gates every non-actuator HTTP path
behind transport-level AUTHENTICATION when security is enabled, but —
unlike the gRPC controller's ``authorizeRequest`` — the REST handler
performs NO per-project authorization before serving. This module
mirrors the handler exactly (no auth hook); a deployment wanting the
gRPC path's project authorization should call
``plans.serving_json.serve_logged`` instead.
"""

from __future__ import annotations

import base64
import binascii
import datetime as dt
from typing import Optional, Sequence

from pyspark.sql import SparkSession

from feast_java_old_spark.registry.validation import ValidationError

from .serving_json import response_to_json, serving_info


def _parse_feature_refs(features: Sequence) -> list[str]:
    """``RequestHelper.validateOnlineRequestFeatureReference:35-42``:
    each reference must carry a FeatureTable name AND a Feature name —
    the reference's exact IllegalArgumentException messages."""
    refs = []
    for f in features or []:
        if isinstance(f, str):
            table, _, name = f.partition(":")
        else:
            table = f.get("featureTable") or f.get("feature_table") or ""
            name = f.get("name") or ""
        if not table:
            raise ValidationError(
                "FeatureTable name must be provided in FeatureReference"
            )
        if not name:
            raise ValidationError(
                "Feature name must be provided in FeatureReference"
            )
        refs.append(f"{table}:{name}")
    return refs


def _b64(payload, k):
    """Decode one ``bytesVal``/``bytesListVal`` element. Canonical
    proto-JSON renders bytes fields as base64 strings; the decoder side
    MUST decode them or a bytes-typed entity key silently joins as the
    base64 TEXT and every lookup misses. Both the standard and URL-safe
    alphabets are accepted (canonical proto3 JSON permits both).
    Module-level (not a per-call closure): this runs once per entity
    field per request row."""
    if isinstance(payload, (bytes, bytearray)):
        return bytes(payload)
    for altchars in (None, b"-_"):
        try:
            return base64.b64decode(payload, altchars=altchars, validate=True)
        except (binascii.Error, ValueError, TypeError):
            continue
    raise ValidationError(
        f"Value wrapper {k!r} carries invalid base64 bytes"
    )


def _unwrap_value(v):
    """Unwrap a single-key proto-JSON ``Value`` oneof (``{"int64Val":
    7}``, ``{"stringVal": "x"}``) to its native scalar; native scalars
    pass through. A list-typed oneof arm nests its payload one level
    deeper (``{"int64ListVal": {"val": [1, 2]}}`` — proto-JSON renders
    the ``Int64List`` message, whose repeated field is ``val``), so the
    unwrap must reach through to the list; a wrapper that still yields
    a dict after unwrapping is malformed and rejected rather than
    silently forwarded into the request frame."""
    if isinstance(v, dict) and len(v) == 1:
        (k, inner), = v.items()
        if k.endswith("ListVal") or k.endswith("_list_val"):
            if isinstance(inner, dict):
                # only the repeated field 'val' (or the empty message)
                # is a well-formed List payload; any other key is a
                # client typo, rejected rather than served as [].
                if inner and set(inner) != {"val"}:
                    raise ValidationError(
                        f"Malformed list Value wrapper {k!r}: expected "
                        '{"val": [...]}, got keys '
                        f"{sorted(inner)}"
                    )
                inner = inner.get("val", [])
            if not isinstance(inner, list):
                raise ValidationError(
                    f"Malformed list Value wrapper {k!r}: expected "
                    '{"val": [...]} or a JSON array'
                )
            if k in ("bytesListVal", "bytes_list_val"):
                return [_b64(x, k) for x in inner]
            return inner
        if k.endswith("Val") or k.endswith("_val"):
            if isinstance(inner, dict):
                raise ValidationError(
                    f"Malformed Value wrapper {k!r}: scalar oneof arms "
                    "carry a JSON scalar, not an object"
                )
            if k in ("bytesVal", "bytes_val"):
                return _b64(inner, k)
            return inner
    return v


def _parse_entity_rows(entity_rows: Sequence) -> list[dict]:
    """``RequestHelper.validateOnlineRequest:26-29``: entity rows must
    be non-empty. Each proto-JSON EntityRow is ``{"fields": {...}}``
    with an optional ``timestamp``; a bare field map is accepted for
    native clients. The per-row timestamp lands as ``event_timestamp``
    (the column ``get_online_features`` reads as the request time).

    ``timestamp`` is honored ONLY on the ``{"fields": ...}`` shape —
    proto-JSON EntityRow is where that field exists
    (``ServingAPIProto.EntityRow``); on a bare field map an entity
    field that happens to be named ``timestamp`` stays an entity field
    instead of being silently stolen as the request time. A timestamp
    that is neither an ISO-8601 string nor a datetime is rejected here
    with the field named, not forwarded into ``createDataFrame`` to die
    as an opaque schema error."""
    if not entity_rows:
        raise ValidationError("Entity value must be provided")
    rows = []
    for er in entity_rows:
        if not isinstance(er, dict):
            raise ValidationError(
                "EntityRow must be a JSON object, got "
                f"{type(er).__name__}"
            )
        fields = er.get("fields", None)
        ts = None
        if fields is None:
            fields = er
        else:
            if not isinstance(fields, dict):
                raise ValidationError(
                    "EntityRow 'fields' must be a JSON object, got "
                    f"{type(fields).__name__}"
                )
            ts = er.get("timestamp")
        row = {k: _unwrap_value(v) for k, v in fields.items()}
        if ts is not None:
            if isinstance(ts, str):
                try:
                    ts = dt.datetime.fromisoformat(
                        ts.replace("Z", "+00:00")
                    )
                except ValueError:
                    raise ValidationError(
                        f"EntityRow timestamp {ts!r} is not ISO-8601"
                    ) from None
                # Spark timestamps are naive-UTC in this engine's
                # session config; strip the offset after normalizing.
                if ts.tzinfo is not None:
                    ts = ts.astimezone(dt.timezone.utc).replace(tzinfo=None)
            elif not isinstance(ts, dt.datetime):
                raise ValidationError(
                    "EntityRow timestamp must be an ISO-8601 string or "
                    f"datetime, got {type(ts).__name__}"
                )
            row["event_timestamp"] = ts
        rows.append(row)
    return rows


class ServingServiceRestController:
    """The two handlers, returning JSON-able values.

    ``store_path`` and ``**serve_kwargs`` are the engine-side store
    wiring (the reference resolves its store from configuration); the
    request→response mapping is the reference's."""

    def __init__(
        self,
        spark: SparkSession,
        registry,
        store_path: Optional[str] = None,
        version: Optional[str] = None,
        odfvs: Optional[dict] = None,
        transform_endpoint: Optional[str] = None,
        **serve_kwargs,
    ) -> None:
        self.spark = spark
        self.registry = registry
        self.store_path = store_path
        if version is None:
            from feast_java_old_spark import __version__ as version
        self.version = version
        # on-demand feature views served through this controller — the
        # reference handles ODFV refs INSIDE GetOnlineFeaturesV2
        # (OnlineServingServiceV2.java:89-98 splits refs, :116-123
        # separates request data); transform_endpoint optionally routes
        # their transforms through the external transformation service
        # (OnlineTransformationService.java:62-79).
        self.odfvs = odfvs or {}
        self.transform_endpoint = transform_endpoint
        self.serve_kwargs = serve_kwargs

    def retrieve(self, refs: list, rows: list, project: str):
        """Parsed request → result DataFrame, dispatching between the
        plain retrieval plan and the full serving plan when any
        requested ref names an ODFV (the reference's P2 ref split runs
        inside the serving service; this controller is that service's
        transport-independent core, shared by REST and gRPC)."""
        from feast_java_old_spark.operators.retrieval import (
            get_online_features,
        )

        if any(r.partition(":")[0] in self.odfvs for r in refs):
            from feast_java_old_spark.plans.online_plan import (
                serve_online_features,
            )

            # the serving plan forces full_feature_names=True internally;
            # a controller constructed with that kwarg (common on the
            # plain-retrieval path) must not crash the ODFV dispatch.
            kwargs = {
                k: v
                for k, v in self.serve_kwargs.items()
                if k != "full_feature_names"
            }
            return serve_online_features(
                self.spark,
                self.registry,
                rows,
                refs,
                store_path=self.store_path,
                odfvs=self.odfvs,
                project=project,
                transform_endpoint=self.transform_endpoint,
                **kwargs,
            )
        return get_online_features(
            self.spark,
            self.registry,
            rows,
            refs,
            self.store_path,
            project=project,
            **self.serve_kwargs,
        )

    # GET /api/v1/info — ServingServiceRestController.java:48-53
    def get_info(self) -> dict:
        # The service response with the controller's version stamped
        # over it — serving_info already implements the stamp.
        return serving_info(self.version)

    # POST /api/v1/features/online — ServingServiceRestController.java:55-66
    def get_online_features(self, request: dict) -> list[dict]:
        refs = _parse_feature_refs(request.get("features"))
        rows = _parse_entity_rows(
            request.get("entityRows", request.get("entity_rows"))
        )
        # OnlineServingServiceV2.java:83-87: autofill the default
        # project when the request's project is absent OR empty.
        df = self.retrieve(refs, rows, request.get("project") or "default")
        return response_to_json(df, refs)
