"""Project-level authorization — the reference's auth enforcement stack.

Parity targets (all public reference code):

- ``common/src/main/java/feast/common/auth/authorization/
  AuthorizationProvider.java`` / ``AuthorizationResult.java`` — the
  provider SPI and its success/failed result carrier;
- ``common/src/main/java/feast/common/auth/service/
  AuthorizationService.java:50-63`` — ``authorizeRequest``: a no-op
  when authorization is disabled, otherwise asks the provider and
  raises ``AccessDeniedException`` with the provider's failure reason
  (default ``"Access Denied"``);
- ``common/src/main/java/feast/common/auth/utils/AuthUtils.java:37-60``
  — subject extraction from the authentication's claims
  (``getSubjectFromAuth``: empty/missing claim is an error; the
  ``email`` claim is additionally format-validated);
- ``common/src/main/java/feast/common/auth/providers/http/
  HttpAuthorizationProvider.java:79-112`` — membership decision per
  ``(subject, "projects:" + projectId, action=ALL)``, deny with
  ``"Access denied to project %s for subject %s"`` when the decision
  service does not explicitly allow;
- ``common/src/main/java/feast/common/auth/config/
  CacheConfiguration.java:46-66`` — provider decisions cached
  (size 10000, TTL 60 s);
- ``core/src/main/java/feast/core/grpc/CoreServiceImpl.java:181,240,
  295,392`` — the four project-mutating RPCs that enforce
  authorization (applyEntity, archiveProject, applyFeatureTable,
  deleteFeatureTable) and map ``AccessDeniedException`` →
  ``PERMISSION_DENIED``; reads are deliberately NOT authorized.

Spark-first note: authorization is control-plane — pure driver-side
logic guarding registry mutations. No data-plane cost; the serving/
historical plans are untouched. The network-bound pieces of the
reference stack (the HTTP decision endpoint, JWT signature
verification against an OIDC issuer) are environment-bound like S2/S4;
the DECISION semantics — subject claim extraction, per-project
membership, deny-by-default on unknown subjects, decision caching —
are implemented and tested locally via
:class:`SubjectListAuthorizationProvider` (the decision table the
external server would hold, held in-process).
"""

from __future__ import annotations

import re
import time
from collections import OrderedDict
from dataclasses import dataclass, field
from typing import Callable, Optional

DEFAULT_SUBJECT_CLAIM = "email"

# CacheConfiguration.java:46-48
AUTH_CACHE_SIZE = 10000
AUTH_CACHE_TTL_SECS = 60

_EMAIL_RE = re.compile(r"^[^@\s]+@[^@\s]+\.[^@\s]+$")


class AccessDeniedError(PermissionError):
    """``org.springframework.security.access.AccessDeniedException``
    analog — callers map it to gRPC ``PERMISSION_DENIED``
    (``CoreServiceImpl.java:192-198``)."""


@dataclass(frozen=True)
class AuthorizationResult:
    """``AuthorizationResult.java`` — allowed flag + optional reason."""

    allowed: bool
    failure_reason: Optional[str] = None

    @staticmethod
    def success() -> "AuthorizationResult":
        return AuthorizationResult(True, None)

    @staticmethod
    def failed(reason: Optional[str]) -> "AuthorizationResult":
        return AuthorizationResult(False, reason)

    @staticmethod
    def create(
        allowed: bool, reason: Optional[str] = None
    ) -> "AuthorizationResult":
        return AuthorizationResult(allowed, reason)


@dataclass(frozen=True)
class Authentication:
    """The authenticated identity — the Spring ``Authentication`` whose
    principal is a JWT (claims map). ``claims`` carries whatever the
    issuer asserted; :func:`get_subject_from_auth` extracts the subject
    the provider keys decisions on."""

    claims: dict = field(default_factory=dict)

    def __hash__(self) -> int:  # claims is a dict; key caches by items
        return hash(tuple(sorted((k, str(v)) for k, v in self.claims.items())))


def audited_identity(provider, authentication) -> str:
    """Best-effort identity for audit entries — the interceptor logs
    whatever subject it can extract and NEVER fails the call over it
    (``GrpcMessageInterceptor`` reads the claim on a best-effort
    basis). The provider's CONFIGURED subject claim is tried first so
    the audited identity is the same subject authorization keyed its
    decision on; email/sub are fallbacks for providers without one
    (AllowAll, custom). Shared by the core controller and the serving
    path so both trails audit the same subject for the same caller."""
    if authentication is None:
        return ""
    claim = getattr(provider, "subject_claim", None)
    return str(
        (claim and authentication.claims.get(claim))
        or authentication.claims.get("email")
        or authentication.claims.get("sub")
        or ""
    )


def get_subject_from_auth(
    authentication: Authentication, subject_claim: str
) -> str:
    """``AuthUtils.getSubjectFromAuth:37-60``: read the subject from the
    claim; an absent/empty claim is an ERROR (never an anonymous
    allow), and an ``email`` subject must look like an email."""
    value = str(authentication.claims.get(subject_claim, "") or "")
    if not value:
        raise ValueError(f"JWT does not have a valid claim {subject_claim}.")
    if subject_claim == "email" and not _EMAIL_RE.match(value):
        raise ValueError("JWT contains an invalid email address")
    return value


class AuthorizationProvider:
    """``AuthorizationProvider.java`` SPI."""

    def check_access_to_project(
        self, project_id: str, authentication: Authentication
    ) -> AuthorizationResult:
        raise NotImplementedError


class AllowAllAuthorizationProvider(AuthorizationProvider):
    """Every request allowed — the explicit form of the reference's
    authorization-disabled deployment (no provider bean registered,
    ``isEnabled()`` false short-circuits the check)."""

    def check_access_to_project(
        self, project_id: str, authentication: Authentication
    ) -> AuthorizationResult:
        return AuthorizationResult.success()


class SubjectListAuthorizationProvider(AuthorizationProvider):
    """Membership-list provider — ``HttpAuthorizationProvider`` with the
    external decision service's table held in-process.

    ``members`` maps project name → set of allowed subjects; ``"*"`` as
    a member admits any authenticated subject (a public project). The
    decision mirrors the reference exactly: extract the subject from
    ``subject_claim``, evaluate ``(subject, projects:<id>, ALL)``, and
    DENY BY DEFAULT with the reference's message when membership cannot
    be established (``HttpAuthorizationProvider.java:109-112``).

    Decisions are cached per ``(project, subject)`` with the
    reference's cache shape (10000 entries / 60 s TTL,
    ``CacheConfiguration.java:46-66``) — ``clock`` injectable for
    deterministic tests.
    """

    def __init__(
        self,
        members: dict[str, set[str]],
        subject_claim: str = DEFAULT_SUBJECT_CLAIM,
        cache_ttl_secs: int = AUTH_CACHE_TTL_SECS,
        cache_size: int = AUTH_CACHE_SIZE,
        clock: Callable[[], float] = time.monotonic,
    ) -> None:
        self.members = {p: set(s) for p, s in members.items()}
        self.subject_claim = subject_claim
        self.cache_ttl_secs = cache_ttl_secs
        self.cache_size = cache_size
        self._clock = clock
        # OrderedDict so capacity eviction is O(1) (popitem(last=False)
        # pops the oldest-WRITTEN entry) — a full min() scan over 10000
        # entries on every uncached new-key decision put an O(n) step
        # on the control-plane hot path (r10 ADVICE). Write order ==
        # iteration order is maintained by move_to_end on refresh.
        self._cache: "OrderedDict[tuple[str, str], tuple[float, AuthorizationResult]]" = (
            OrderedDict()
        )
        self.decision_count = 0  # uncached evaluations, for cache tests

    def check_access_to_project(
        self, project_id: str, authentication: Authentication
    ) -> AuthorizationResult:
        subject = get_subject_from_auth(authentication, self.subject_claim)
        key = (project_id, subject)
        now = self._clock()
        hit = self._cache.get(key)
        if hit is not None and now - hit[0] < self.cache_ttl_secs:
            return hit[1]
        self.decision_count += 1
        allowed = self.members.get(project_id, set())
        if subject in allowed or "*" in allowed:
            result = AuthorizationResult.success()
        else:
            result = AuthorizationResult.failed(
                f"Access denied to project {project_id} "
                f"for subject {subject}"
            )
        if len(self._cache) >= self.cache_size and key not in self._cache:
            # size-bounded like the reference's Caffeine cache; evict
            # oldest-written (TTL makes precise LRU unnecessary here).
            # Refreshing an EXISTING key overwrites in place — evicting
            # then would drop an unrelated live entry and shrink the
            # cache by one on every TTL refresh at capacity.
            self._cache.popitem(last=False)
        self._cache[key] = (now, result)
        # keep iteration order == write order, so popitem(last=False)
        # above always pops the stalest write even after TTL refreshes.
        self._cache.move_to_end(key)
        return result


@dataclass(frozen=True)
class AccessPolicy:
    """One Ory-ACP access-control policy — the record Keto's engine
    evaluates (`sh.ory.keto` ACP model: subjects × resources × actions
    with an allow/deny effect)."""

    subjects: tuple[str, ...]
    resources: tuple[str, ...]
    actions: tuple[str, ...]
    effect: str = "allow"  # "allow" | "deny"

    def __post_init__(self):
        if self.effect not in ("allow", "deny"):
            raise ValueError(f"effect must be allow|deny, got {self.effect!r}")


class PolicyAuthorizationProvider(AuthorizationProvider):
    """Keto-style provider — ``common/.../auth/providers/keto/
    KetoAuthorizationProvider.java:138-164`` with the external Keto
    server's ACP decision engine held in-process (the same
    environment-bound split as :class:`SubjectListAuthorizationProvider`
    vs the HTTP provider).

    Request shape mirrors the reference exactly: the check is
    ``(flavor, subject=subject_prefix+subject, resource=
    resource_prefix+projectId, action)`` with builder defaults
    ``flavor="glob"``, ``action="edit"``, ``subject_claim="email"``,
    empty prefixes (``KetoAuthorizationProvider.Builder:44-100``).
    Decision semantics are Ory ACP's (public engine contract): a
    request is allowed iff at least one *allow* policy matches and NO
    *deny* policy matches (deny overrides allow); no match → default
    deny. ``flavor`` selects the matcher — ``exact`` (string
    equality), ``glob`` (``fnmatch``-style patterns, e.g.
    ``users:*@example.com``), ``regex`` (full-match).

    Denials carry the reference's message
    (``KetoAuthorizationProvider.java:161-163``).
    """

    def __init__(
        self,
        policies: list[AccessPolicy],
        flavor: str = "glob",
        action: str = "edit",
        subject_claim: str = DEFAULT_SUBJECT_CLAIM,
        subject_prefix: str = "",
        resource_prefix: str = "",
    ) -> None:
        if flavor not in ("exact", "glob", "regex"):
            raise ValueError(
                f"flavor must be one of exact|glob|regex, got {flavor!r}"
            )
        self.policies = list(policies)
        self.flavor = flavor
        self.action = action
        self.subject_claim = subject_claim
        self.subject_prefix = subject_prefix
        self.resource_prefix = resource_prefix

    def _matches(self, pattern: str, value: str) -> bool:
        if self.flavor == "exact":
            return pattern == value
        if self.flavor == "glob":
            import fnmatch

            return fnmatch.fnmatchcase(value, pattern)
        return re.fullmatch(pattern, value) is not None

    def _policy_matches(
        self, p: AccessPolicy, subject: str, resource: str, action: str
    ) -> bool:
        return (
            any(self._matches(s, subject) for s in p.subjects)
            and any(self._matches(r, resource) for r in p.resources)
            and any(self._matches(a, action) for a in p.actions)
        )

    def check_access_to_project(
        self, project_id: str, authentication: Authentication
    ) -> AuthorizationResult:
        subject = get_subject_from_auth(authentication, self.subject_claim)
        full_subject = f"{self.subject_prefix}{subject}"
        resource = f"{self.resource_prefix}{project_id}"
        allowed = False
        for p in self.policies:
            if self._policy_matches(p, full_subject, resource, self.action):
                if p.effect == "deny":
                    allowed = False
                    break  # deny overrides any allow
                allowed = True
        if allowed:
            return AuthorizationResult.success()
        return AuthorizationResult.failed(
            f"Access denied to project {project_id} for subject {subject}"
        )


class AuthorizationService:
    """``AuthorizationService.java:50-63`` — the enforcement point."""

    def __init__(
        self,
        enabled: bool = False,
        provider: Optional[AuthorizationProvider] = None,
    ) -> None:
        if enabled and provider is None:
            raise ValueError(
                "authorization enabled but no AuthorizationProvider "
                "configured"
            )
        self.enabled = enabled
        self.provider = provider

    def authorize_request(
        self, authentication: Optional[Authentication], project: str
    ) -> None:
        """No-op when disabled; otherwise the provider decides and a
        disallowed result raises :class:`AccessDeniedError` with the
        provider's reason (default ``"Access Denied"``)."""
        if not self.enabled:
            return
        result = self.provider.check_access_to_project(
            project, authentication or Authentication()
        )
        if not result.allowed:
            raise AccessDeniedError(result.failure_reason or "Access Denied")
