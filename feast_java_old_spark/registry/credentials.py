"""Client-side call credentials — the client half of the auth handshake.

Parity targets (``common/src/main/java/feast/common/auth/credentials/``):

- ``JwtCallCredentials.java:27-49`` — a STATIC JWT attached as
  ``Authorization: Bearer <jwt>`` on every call, never refreshed, never
  failing;
- ``OAuthCredentials.java:43-131`` — an OAuth client-credentials grant
  against an OIDC issuer: required-option validation at construction
  (``AssertionError`` listing the properties), a token fetched lazily
  and CACHED UNTIL EXPIRY (``applyRequestMetadata``: refetch iff the
  token is absent or ``Instant.now().isAfter(tokenExpiryTime)`` —
  strictly after, so a token expiring exactly now is still used), and
  ANY failure during acquisition/attachment surfaced as gRPC
  ``UNAUTHENTICATED`` with the cause attached;
- ``GoogleAuthCredentials.java:40-88`` — Google ADC ID tokens with an
  ``audience`` option defaulting to ``https://localhost``,
  refresh-if-expired semantics, same bearer attachment and
  UNAUTHENTICATED failure mapping.

Environment-bound split (the same one the authorization providers use):
token ACQUISITION is network I/O against an OIDC issuer / Google ADC —
injectable here as ``token_source`` / ``id_token_provider`` callables —
while the attachment, expiry-driven refresh, option validation, and
failure mapping are the in-process semantics this module implements and
tests. The reference validates token signatures through the issuer's
JWK endpoint (``NimbusJwtDecoder.withJwkSetUri``) — network-bound, so
expiry here is read from the token's own ``exp`` claim (the value the
JWK-verified decode returns); a client inspecting its OWN token for
scheduling purposes does not need signature verification.

There is no RPC boundary in this engine, so "apply request metadata"
returns the headers dict synchronously instead of calling gRPC's async
``MetadataApplier`` — the header contract (key ``Authorization``, value
``Bearer <token>``) is identical.
"""

from __future__ import annotations

import base64
import binascii
import json
import time
from typing import Callable, Optional

from .auth import Authentication

BEARER_TYPE = "Bearer"
AUTHORIZATION_METADATA_KEY = "Authorization"

# OAuthCredentials.java option keys
GRANT_TYPE = "grant_type"
CLIENT_ID = "client_id"
CLIENT_SECRET = "client_secret"
AUDIENCE = "audience"
OAUTH_URL = "oauth_url"
JWK_ENDPOINT_URI = "jwkEndpointURI"


class UnauthenticatedError(Exception):
    """gRPC ``UNAUTHENTICATED`` — what ``applier.fail(Status.
    UNAUTHENTICATED.withCause(e))`` surfaces to the caller. The original
    failure rides ``__cause__``."""

    status_code = "UNAUTHENTICATED"


def jwt_claims(token: str) -> dict:
    """Decode a JWT's payload segment (base64url, unpadded) to its
    claims dict. No signature verification — see the module docstring
    for why that is the correct client-side split."""
    try:
        payload = token.split(".")[1]
        payload += "=" * (-len(payload) % 4)
        claims = json.loads(base64.urlsafe_b64decode(payload))
        if not isinstance(claims, dict):
            # valid JSON but not an object (e.g. a bare array) — still
            # not a JWT claims set; without this check a hostile token
            # would flow a non-dict into Authentication.claims and
            # surface downstream as an AttributeError (mapped INTERNAL)
            # instead of a bad-credential error.
            raise ValueError("payload is not a JSON object")
        return claims
    except (IndexError, ValueError, binascii.Error) as e:
        raise ValueError(f"not a decodable JWT: {e}") from e


def jwt_expiry(token: str) -> Optional[float]:
    """The token's ``exp`` claim (epoch seconds), or None when absent —
    the value ``jwtDecoder.decode(accessToken).getExpiresAt()`` yields
    in the reference's refresh check."""
    exp = jwt_claims(token).get("exp")
    return None if exp is None else float(exp)


def authentication_from_token(token: str) -> Authentication:
    """Server-side bridge: the claims the issuer asserted, as the
    ``Authentication`` the authorization providers key decisions on —
    what the reference's resource-server JWT filter produces from the
    ``Authorization: Bearer`` header these credentials attach."""
    return Authentication(claims=jwt_claims(token))


class CallCredentials:
    """Base contract: produce per-call auth headers or raise
    :class:`UnauthenticatedError`."""

    def apply_request_metadata(self) -> dict[str, str]:
        raise NotImplementedError


class JwtCallCredentials(CallCredentials):
    """``JwtCallCredentials.java:27-49``: a static token, attached
    verbatim on every call — no expiry logic, no failure path."""

    def __init__(self, jwt: str) -> None:
        self._jwt = jwt

    def apply_request_metadata(self) -> dict[str, str]:
        return {
            AUTHORIZATION_METADATA_KEY: f"{BEARER_TYPE} {self._jwt}"
        }


class _RefreshingBearerCredentials(CallCredentials):
    """Shared refresh machinery: fetch lazily, cache until the token's
    ``exp``, refetch strictly after expiry, map every failure to
    UNAUTHENTICATED. ``clock`` is injectable for deterministic tests
    (epoch seconds, like ``Instant.now()``)."""

    def __init__(self, clock: Callable[[], float] = time.time) -> None:
        self._clock = clock
        self._access_token: Optional[str] = None
        self._expiry: Optional[float] = None
        self.fetch_count = 0  # acquisitions, for refresh-exactly-once tests

    def _fetch_token(self) -> str:  # the injected network half
        raise NotImplementedError

    def apply_request_metadata(self) -> dict[str, str]:
        try:
            # Refetch iff absent or strictly past expiry — the
            # reference's `accessToken == null ||
            # Instant.now().isAfter(tokenExpiryTime)`. A token with no
            # exp claim never expires client-side (isAfter(null) is
            # unreachable in the reference because its decoder requires
            # exp; absent here means the issuer opted out of expiry).
            expired = (
                self._expiry is not None and self._clock() > self._expiry
            )
            if self._access_token is None or expired:
                token = self._fetch_token()
                self.fetch_count += 1
                self._expiry = jwt_expiry(token)
                self._access_token = token
            return {
                AUTHORIZATION_METADATA_KEY: (
                    f"{BEARER_TYPE} {self._access_token}"
                )
            }
        except Exception as e:
            raise UnauthenticatedError(str(e)) from e


class OAuthCredentials(_RefreshingBearerCredentials):
    """``OAuthCredentials.java:43-131``. ``options`` must carry all six
    reference properties (validated with the reference's message);
    ``token_source(oauth_url, form)`` is the injected issuer call — it
    receives the URL and the exact form body the reference posts
    (grant_type, client_id, client_secret, audience) and returns the
    ``access_token`` JWT, raising on a non-successful response."""

    REQUIRED = (
        GRANT_TYPE,
        CLIENT_ID,
        CLIENT_SECRET,
        AUDIENCE,
        OAUTH_URL,
        JWK_ENDPOINT_URI,
    )

    def __init__(
        self,
        options: dict[str, str],
        token_source: Callable[[str, dict[str, str]], str],
        clock: Callable[[], float] = time.time,
    ) -> None:
        super().__init__(clock=clock)
        if not all(k in options for k in self.REQUIRED):
            raise AssertionError(
                "please configure the properties:"
                " grant_type, client_id, client_secret, audience,"
                " oauth_url, jwkEndpointURI"
            )
        self._url = options[OAUTH_URL]
        self._form = {
            GRANT_TYPE: options[GRANT_TYPE],
            CLIENT_ID: options[CLIENT_ID],
            CLIENT_SECRET: options[CLIENT_SECRET],
            AUDIENCE: options[AUDIENCE],
        }
        self._token_source = token_source

    def _fetch_token(self) -> str:
        return self._token_source(self._url, dict(self._form))


class GoogleAuthCredentials(_RefreshingBearerCredentials):
    """``GoogleAuthCredentials.java:40-88``: ADC ID tokens.
    ``audience`` is the one option, defaulting to ``https://localhost``;
    ``id_token_provider(audience)`` is the injected ADC half
    (``IdTokenCredentials.refreshIfExpired`` + ``getIdToken``)."""

    def __init__(
        self,
        options: dict[str, str],
        id_token_provider: Callable[[str], str],
        clock: Callable[[], float] = time.time,
    ) -> None:
        super().__init__(clock=clock)
        self.audience = options.get(AUDIENCE, "https://localhost")
        self._provider = id_token_provider

    def _fetch_token(self) -> str:
        return self._provider(self.audience)
