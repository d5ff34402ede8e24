"""Structured audit logging for control-plane mutations and serving calls.

Parity targets (behavior pinned by the reference's
``common/src/test/java/feast/common/logging/entry/AuditLogEntryTest.java``):

- ``common/src/main/java/feast/common/logging/AuditLogger.java:76-120``
  — the three log surfaces: ``logMessage`` (a service call with request
  + response), ``logAction`` (an action taken on a resource),
  ``logTransition`` (a resource's state change); every entry is emitted
  as one structured JSON document; a global ``enabled`` switch gates
  everything (``AuditLogger.java:125-128``).
- ``entry/AuditLogEntry.java:27-34`` — every entry carries
  ``logType = "FeastAuditLogEntry"`` and ``application = "Feast"`` so
  external log systems can filter, plus component + version of the
  emitting service.
- ``entry/MessageAuditLogEntry.java`` — MESSAGE entries carry a unique
  id, service, method, request, response, identity and status code
  (the gRPC interceptor fills request/response around the handler —
  ``interceptors/GrpcMessageInterceptor.java:60-98``; OK calls log at
  INFO, failed calls at ERROR).
- ``entry/ActionAuditLogEntry.java`` / ``entry/TransitionAuditLogEntry
  .java`` — ACTION/TRANSITION entries reference their subject via a
  ``LogResource {type, id}`` (``entry/LogResource.java:28-31``: JOB,
  FEATURE_TABLE).

Spark-first re-expression: instead of fluentd/slf4j appenders the log
is a JSONL file (one entry per line, append-only, flock-guarded), i.e.
a *table* — :func:`read_audit_log` reads it back as a DataFrame with an
explicit schema so the audit trail is queryable with the same engine
that serves the features (rollups, anomaly scans, compliance joins).
An in-memory sink (``path=None``) backs unit tests and short-lived
sessions.

JSON key names mirror the reference's Gson output (camelCase:
``logType``, ``statusCode``, nested ``resource {type, id}``) so a
fluentd/ELK pipeline built for the reference parses our entries
unchanged. Extensions beyond the reference are explicit: a ``level``
and ``timestamp`` field on every entry (the reference delegates these
to slf4j's log line; a file table has to carry them itself) and three
extra resource types (ENTITY, PROJECT, STORE) for registry mutations
the reference logs only through its generic gRPC interceptor.
"""

from __future__ import annotations

import fcntl
import json
import os
import threading
import time
import uuid
from typing import Optional

LOG_TYPE = "FeastAuditLogEntry"
APPLICATION = "Feast"


class AuditLogEntryKind:
    """``entry/AuditLogEntryKind.java:22-26``."""

    MESSAGE = "MESSAGE"
    ACTION = "ACTION"
    TRANSITION = "TRANSITION"


class ResourceType:
    """``entry/LogResource.java:28-31`` (JOB, FEATURE_TABLE) plus the
    documented registry-mutation extensions."""

    JOB = "JOB"
    FEATURE_TABLE = "FEATURE_TABLE"
    ENTITY = "ENTITY"
    PROJECT = "PROJECT"
    STORE = "STORE"


class AuditLogger:
    """Append-only structured audit log.

    ``path=None`` keeps entries in-memory (``self.entries``); a path
    appends JSONL under an exclusive flock (multi-process safe — the
    same discipline as the registry file and the schema registry).

    ``clock`` returns the entry timestamp in epoch **microseconds**;
    inject a deterministic counter in tests/gate queries so entry
    content is reproducible. ``id_factory`` likewise for MESSAGE ids.
    """

    def __init__(
        self,
        path: Optional[str] = None,
        enabled: bool = True,
        component: str = "feast-spark",
        version: Optional[str] = None,
        clock=None,
        id_factory=None,
    ):
        if version is None:
            from feast_java_old_spark import __version__ as version
        self.path = path
        self.enabled = enabled
        self.component = component
        self.version = version
        self._clock = clock or (lambda: int(time.time() * 1_000_000))
        self._id_factory = id_factory or (lambda: str(uuid.uuid4()))
        self._lock = threading.Lock()
        self.entries: list[dict] = []

    # ------------------------------------------------------------ emitters

    def log_action(
        self,
        action: str,
        resource_type: str,
        resource_id: str,
        level: str = "INFO",
    ) -> Optional[dict]:
        """``AuditLogger.logAction:90-101``."""
        return self._log(
            {
                "kind": AuditLogEntryKind.ACTION,
                "action": action,
                "resource": {"type": resource_type, "id": resource_id},
            },
            level,
        )

    def log_transition(
        self,
        status: str,
        resource_type: str,
        resource_id: str,
        level: str = "INFO",
    ) -> Optional[dict]:
        """``AuditLogger.logTransition:108-119``."""
        return self._log(
            {
                "kind": AuditLogEntryKind.TRANSITION,
                "status": status,
                "resource": {"type": resource_type, "id": resource_id},
            },
            level,
        )

    def log_message(
        self,
        service: str,
        method: str,
        request: Optional[dict] = None,
        response: Optional[dict] = None,
        identity: str = "",
        status_code: str = "OK",
        level: Optional[str] = None,
    ) -> Optional[dict]:
        """``AuditLogger.logMessage:70-77`` +
        ``GrpcMessageInterceptor.close:83-89``: OK → INFO, else ERROR
        (unless the caller pins a level)."""
        if level is None:
            level = "INFO" if status_code == "OK" else "ERROR"
        # Stringify payload values: the trail's relational schema pins
        # request/response as map<string,string> (AUDIT_SCHEMA) so the
        # TABLE's shape never drifts with payload types.
        return self._log(
            {
                "kind": AuditLogEntryKind.MESSAGE,
                "id": self._id_factory(),
                "service": service,
                "method": method,
                "request": {k: str(v) for k, v in (request or {}).items()},
                "response": {k: str(v) for k, v in (response or {}).items()},
                "identity": identity,
                "statusCode": status_code,
            },
            level,
        )

    # ------------------------------------------------------------ internal

    def _log(self, body: dict, level: str) -> Optional[dict]:
        if not self.enabled:
            return None
        entry = {
            "logType": LOG_TYPE,
            "application": APPLICATION,
            "component": self.component,
            "version": self.version,
            "level": level,
            "timestamp": self._clock(),
            **body,
        }
        with self._lock:
            if self.path is None:
                # In-memory sink ONLY when file-less: a path-backed
                # logger in a long-lived serving driver must not also
                # retain every entry in RAM (one dict per request is a
                # steady leak; the file IS the log).
                self.entries.append(entry)
            else:
                line = json.dumps(entry, sort_keys=True)
                with open(self.path, "a") as f:
                    fcntl.flock(f.fileno(), fcntl.LOCK_EX)
                    try:
                        f.write(line + "\n")
                        f.flush()
                        os.fsync(f.fileno())
                    finally:
                        fcntl.flock(f.fileno(), fcntl.LOCK_UN)
        return entry


AUDIT_SCHEMA = (
    "logType string, application string, component string, version string,"
    " level string, timestamp long, kind string,"
    " action string, status string,"
    " resource struct<type: string, id: string>,"
    " id string, service string, method string, identity string,"
    " statusCode string,"
    " request map<string, string>, response map<string, string>"
)


def read_audit_log(spark, path: str):
    """The audit trail as a DataFrame (kind-specific fields NULL where
    a kind doesn't carry them — one flat relation, no per-kind reads).

    The explicit schema keeps the read stable when the file holds only
    one kind (schema inference would drop the absent columns) and keeps
    request/response as string maps — heterogenous payload values are
    the caller's to cast, the TRAIL's schema must not drift with them.
    """
    return spark.read.schema(AUDIT_SCHEMA).json(path)


def grpc_status_code(ex: BaseException) -> str:
    """The ONE exception → gRPC-status mapping both controller layers
    audit with (``CoreService._call`` and ``serve_logged``) — extracted
    after two independent drifts between hand-copies (r10 self-review:
    PermissionError over-matching in serving; ValueError → INTERNAL in
    core). The trail must not disagree with itself about the same
    failure.

    Mapping (the reference's catch-block semantics,
    ``CoreServiceImpl.java`` + the interceptor): AccessDeniedError →
    PERMISSION_DENIED (and ONLY it — an OS-level ``PermissionError``
    reading the store is a server fault); ValueError/TypeError
    (includes ValidationError and malformed-subject-claim errors) →
    INVALID_ARGUMENT; KeyError (unknown registry object) → NOT_FOUND;
    everything else (store IO, corrupt files) → INTERNAL.
    """
    from feast_java_old_spark.registry.auth import AccessDeniedError

    if isinstance(ex, AccessDeniedError):
        return "PERMISSION_DENIED"
    if isinstance(ex, (ValueError, TypeError)):
        return "INVALID_ARGUMENT"
    if isinstance(ex, KeyError):
        return "NOT_FOUND"
    return "INTERNAL"
