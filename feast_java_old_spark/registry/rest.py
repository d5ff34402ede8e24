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

Error shape (``controller/exception/handler/
RestResponseEntityExceptionHandler.java:34-118`` — a ``@ControllerAdvice``
registered for the whole core HTTP surface, correcting this module's
earlier no-handler reading): every handled failure produces a JSON body
``{"error": <message>}``:

- missing required request param → **400** (the overridden
  ``handleMissingServletRequestParameter:104-118`` adds the message to
  Spring's default empty-body 400);
- ``IllegalArgumentException`` (e.g. an invalid project name failing
  ``checkValidCharactersAllowDash`` inside the handler) and
  ``UnsatisfiedServletRequestParameterException`` → **400**
  (``handleBadRequest:84-97``) — NOT the Spring-default 500;
- ``RetrievalException`` (a lookup that failed inside a service) →
  **500** with the exception's message (``handleRetrieval:57-69``) —
  note the gRPC path maps the SAME failure to NOT_FOUND
  (``CoreServiceImpl.java:87``): the two transports intentionally
  disagree here and this module mirrors both;
- ``InvalidProtocolBufferException`` (malformed request/response
  object) → **500** with the constant body ``"An unexpected error
  occurred in Feast Core."`` (``handleInvalidProtocolBuffer:45-53``).

:func:`handle_rest_exception` is that advice; unhandled exception types
propagate exactly as they would past a ``@ControllerAdvice`` with no
matching ``@ExceptionHandler``.

Documented divergence (docs/COVERAGE.md "REST facade" row): **spec JSON
field names** are this engine's registry model dicts (``to_dict``), not
protobuf-JSON field casing; the KEYS of the response envelope
(``version`` / ``features`` / ``projects`` / ``entities`` / ``tables``)
and of the error body (``error``) match the reference's.
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


# The constant 500 body for a malformed request/response object —
# RestResponseEntityExceptionHandler.handleInvalidProtocolBuffer:49-50.
UNEXPECTED_ERROR_BODY = "An unexpected error occurred in Feast Core."


def handle_rest_exception(ex: BaseException) -> tuple[int, dict]:
    """``RestResponseEntityExceptionHandler.java:34-118`` — the core
    module's ``@ControllerAdvice``: map a handler failure to
    ``(http_status, {"error": message})`` or re-raise when no
    ``@ExceptionHandler`` matches (Spring's default then applies).

    Analog mapping (most-derived first — ``MissingRequestParameter``
    and ``json.JSONDecodeError`` are both ``ValueError`` subclasses):

    - :class:`MissingRequestParameter` → 400 (:104-118);
    - ``json.JSONDecodeError`` (the engine's malformed-object analog of
      ``InvalidProtocolBufferException``) → 500 with the CONSTANT body
      — the one handler that hides its message (:45-53);
    - :class:`~feast_java_old_spark.registry.validation.ValidationError`
      (``IllegalArgumentException`` — validation failures inside a
      handler) → 400 (:84-97). ONLY that type: the advice handles
      ``IllegalArgumentException``, not arbitrary runtime errors, so a
      plain ``ValueError`` raised by an internal bug propagates to the
      transport's default 500 instead of masquerading as a client
      fault;
    - ``KeyError`` (``RetrievalException`` — an object lookup that
      failed in a service) → 500 with the message (:57-69); the gRPC
      transport maps the same failure to NOT_FOUND
      (``CoreServiceImpl.java:87``) — an intentional reference
      disagreement between its two transports, mirrored here.
    """
    import json as _json

    from .validation import ValidationError

    if isinstance(ex, MissingRequestParameter):
        return 400, {"error": str(ex)}
    if isinstance(ex, _json.JSONDecodeError):
        return 500, {"error": UNEXPECTED_ERROR_BODY}
    if isinstance(ex, ValidationError):
        return 400, {"error": str(ex)}
    if isinstance(ex, KeyError):
        # KeyError's str() quotes its arg; the body carries the bare
        # message like RetrievalException.getMessage().
        msg = ex.args[0] if ex.args else str(ex)
        return 500, {"error": str(msg)}
    raise ex


def rest_call(handler, *args, **kwargs) -> tuple[int, dict]:
    """Run one REST handler under the advice: ``(200, body)`` on
    success, the :func:`handle_rest_exception` mapping on a handled
    failure."""
    try:
        return 200, handler(*args, **kwargs)
    except Exception as ex:  # noqa: BLE001 — the advice re-raises unhandled
        return handle_rest_exception(ex)


class CoreServiceRestController:
    """The five GET handlers, returning JSON-able dicts. ``service`` is
    a :class:`~feast_java_old_spark.registry.core_service.CoreService`
    (the facade delegates reads exactly like the reference delegates to
    SpecService/ProjectService — no authorization on reads, matching
    the gRPC controller)."""

    def __init__(self, service, version: Optional[str] = None) -> None:
        # The reference's MonitoringInterceptor wraps ONLY the gRPC
        # server (MonitoringConfig.java), so HTTP traffic never lands
        # in feast_core_request_latency_seconds. A CoreService wired
        # with metrics would record REST reads through _timed — strip
        # the histogram on a metrics-free twin sharing the same
        # registry/auth/audit so the facade observes nothing.
        if getattr(service, "metrics", None) is not None:
            import copy

            # shallow copy shares registry/auth/audit (and any subclass
            # state) — only the histogram is suppressed on the twin.
            service = copy.copy(service)
            service.metrics = None
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
