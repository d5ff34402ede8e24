"""REST facade over the core service — ``CoreServiceRestController``.

Parity target: ``core/src/main/java/feast/core/controller/
CoreServiceRestController.java:69-133`` — the experimental HTTP surface
(``/api``, JSON) exposing five read-only GETs over the SAME SpecService
the gRPC controller uses:

- ``GET /api/v2/version``        → ``{"version": ...}``
- ``GET /api/v2/features``       → ``{"features": {"<table>:<feature>":
  spec}}``; ``entities`` is a REQUIRED request param (Spring rejects a
  missing required ``@RequestParam`` with 400 Bad Request before the
  handler runs), ``project`` optional → default project;
- ``GET /api/v2/projects``       → ``{"projects": [names]}``
- ``GET /api/v2/entities``       → ``{"entities": [specs]}``,
  ``project`` defaulting to ``default``;
- ``GET /api/v2/feature-tables`` → ``{"tables": [specs]}``, same
  default.

Filter semantics ride the registry's SpecService parity ops
(``registry.list_features`` / ``list_entities`` /
``list_feature_tables``): the ``entities`` filter is the reference's
EXACT-SET match (``FeatureTable.hasAllEntities:281-285`` compares
entity SETS, not subsets — a table with entities {a, b} matches the
filter [a, b] but NOT [a]), soft-deleted tables are excluded, and an
empty match is an empty JSON object/array, never an error.

Documented divergences (docs/COVERAGE.md "REST facade" row):

- **Error shape.** The reference controller declares no
  ``@ExceptionHandler``, so Spring's defaults apply: a missing required
  param → 400 with Spring's JSON error body; an invalid project name
  (``checkValidCharactersAllowDash`` throwing IllegalArgumentException
  inside the handler) → 500 Internal Server Error — NOT the
  INVALID_ARGUMENT the gRPC path maps the same failure to. This module
  mirrors the SPLIT (missing param → :class:`MissingRequestParameter`
  = the 400 class; in-handler validation errors propagate as the
  server-error class) without reproducing Spring's error-body JSON.
- **Spec JSON field names** are this engine's registry model dicts
  (``to_dict``), not protobuf-JSON field casing; the KEYS of the
  response envelope (``version`` / ``features`` / ``projects`` /
  ``entities`` / ``tables``) match the reference's response protos.
"""

from __future__ import annotations

from typing import Optional, Sequence

from .registry import DEFAULT_PROJECT


class MissingRequestParameter(ValueError):
    """Spring's ``MissingServletRequestParameterException`` analog —
    the transport maps it to 400 Bad Request (the one REST status with
    no gRPC twin on this surface; the gRPC path cannot omit a request
    field, only leave it empty)."""

    http_status = 400


class CoreServiceRestController:
    """The five GET handlers, returning JSON-able dicts. ``service`` is
    a :class:`~feast_java_old_spark.registry.core_service.CoreService`
    (the facade delegates reads exactly like the reference delegates to
    SpecService/ProjectService — no authorization on reads, matching
    the gRPC controller)."""

    def __init__(self, service, version: Optional[str] = None) -> None:
        self.service = service
        if version is None:
            from feast_java_old_spark import __version__ as version
        self.version = version

    # GET /api/v2/version — CoreServiceRestController.java:69-74
    def get_version(self) -> dict:
        return {"version": self.version}

    # GET /api/v2/features — CoreServiceRestController.java:88-95
    def list_features(
        self,
        entities: Optional[Sequence[str]] = None,
        project: Optional[str] = None,
    ) -> dict:
        if entities is None:
            # @RequestParam String[] entities is required — Spring
            # rejects the request before the handler runs.
            raise MissingRequestParameter(
                "Required request parameter 'entities' is not present"
            )
        # An explicitly EMPTY list is forwarded as an empty filter, and
        # the reference's SpecService applies the entity filter only
        # `if (entities.size() > 0)` (SpecService.java:158) — so an
        # empty filter lists ALL the project's features, NOT the
        # entity-less tables the exact-set rule would suggest. Reference
        # parity, pinned by test_rest_features_empty_entity_list.
        features = self.service.list_features(
            project=project if project is not None else DEFAULT_PROJECT,
            entities=list(entities),
        )
        return {
            "features": {ref: f.to_dict() for ref, f in features.items()}
        }

    # GET /api/v2/projects — CoreServiceRestController.java:102-108
    def list_projects(self) -> dict:
        return {"projects": [p.name for p in self.service.list_projects()]}

    # GET /api/v2/entities — CoreServiceRestController.java:117-122
    def list_entities(self, project: str = DEFAULT_PROJECT) -> dict:
        return {
            "entities": [
                e.to_dict() for e in self.service.list_entities(project)
            ]
        }

    # GET /api/v2/feature-tables — CoreServiceRestController.java:128-133
    def list_feature_tables(self, project: str = DEFAULT_PROJECT) -> dict:
        return {
            "tables": [
                t.to_dict()
                for t in self.service.list_feature_tables(project)
            ]
        }
