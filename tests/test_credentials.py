"""Client-side call credentials — JwtCallCredentials / OAuthCredentials /
GoogleAuthCredentials parity (common/src/main/java/feast/common/auth/
credentials/): bearer attachment, expiry-driven refresh (exactly once),
required-option validation, and the UNAUTHENTICATED failure mapping."""

import base64
import json

import pytest

from feast_java_old_spark.registry.auth import (
    AuthorizationService,
    SubjectListAuthorizationProvider,
)
from feast_java_old_spark.registry.credentials import (
    GoogleAuthCredentials,
    JwtCallCredentials,
    OAuthCredentials,
    UnauthenticatedError,
    authentication_from_token,
    jwt_expiry,
)


def _b64url(obj) -> str:
    raw = base64.urlsafe_b64encode(json.dumps(obj).encode()).decode()
    return raw.rstrip("=")  # JWTs are unpadded


def make_jwt(claims: dict) -> str:
    """Structurally valid JWT (unverified signature — the client only
    reads its own token's claims)."""
    return ".".join(
        [_b64url({"alg": "RS256", "typ": "JWT"}), _b64url(claims), "sig"]
    )


OPTIONS = {
    "grant_type": "client_credentials",
    "client_id": "feast-client",
    "client_secret": "s3cret",
    "audience": "https://feast.example.com",
    "oauth_url": "https://issuer.example.com/oauth/token",
    "jwkEndpointURI": "https://issuer.example.com/.well-known/jwks.json",
}


def test_jwt_call_credentials_attaches_static_bearer():
    """JwtCallCredentials.java:36-43: the given token is passed as the
    authorization bearer token, verbatim, on every call."""
    token = make_jwt({"email": "a@x.com", "exp": 1})  # expiry ignored
    creds = JwtCallCredentials(token)
    for _ in range(2):
        assert creds.apply_request_metadata() == {
            "Authorization": f"Bearer {token}"
        }


def test_oauth_missing_options_is_assertion_error():
    """OAuthCredentials.java:76-84: all six properties required, with
    the reference's message."""
    bad = {k: v for k, v in OPTIONS.items() if k != "client_secret"}
    with pytest.raises(AssertionError, match="please configure"):
        OAuthCredentials(bad, token_source=lambda u, f: "")


def test_oauth_fetches_lazily_caches_until_expiry_refreshes_once():
    """OAuthCredentials.java:115-124: fetch iff token absent or
    Instant.now().isAfter(expiry) — cached within lifetime, refreshed
    EXACTLY once after expiry, and the issuer call carries the exact
    form body the reference posts."""
    t = [100.0]
    calls = []

    def issuer(url, form):
        calls.append((url, form))
        return make_jwt({"email": "svc@x.com", "exp": t[0] + 50})

    creds = OAuthCredentials(OPTIONS, token_source=issuer, clock=lambda: t[0])
    h1 = creds.apply_request_metadata()
    assert h1["Authorization"].startswith("Bearer ")
    assert calls == [
        (
            "https://issuer.example.com/oauth/token",
            {
                "grant_type": "client_credentials",
                "client_id": "feast-client",
                "client_secret": "s3cret",
                "audience": "https://feast.example.com",
            },
        )
    ]
    t[0] = 149.0  # still live
    assert creds.apply_request_metadata() == h1
    assert creds.fetch_count == 1
    t[0] = 150.0  # exactly exp: isAfter is STRICT, token still used
    assert creds.apply_request_metadata() == h1
    assert creds.fetch_count == 1
    t[0] = 151.0  # strictly past expiry → one refresh
    h2 = creds.apply_request_metadata()
    assert creds.fetch_count == 2
    assert h2 != h1  # new exp claim → new token
    assert jwt_expiry(h2["Authorization"].split(" ", 1)[1]) == 201.0
    creds.apply_request_metadata()
    assert creds.fetch_count == 2  # refreshed exactly once


def test_oauth_refresh_failure_is_unauthenticated_with_cause():
    """OAuthCredentials.java:126-129: any acquisition failure surfaces
    as UNAUTHENTICATED (applier.fail(Status.UNAUTHENTICATED.withCause)),
    including a refresh failing AFTER a previously good token expired."""
    t = [0.0]
    ok = [True]

    def issuer(url, form):
        if not ok[0]:
            raise ConnectionError("issuer unreachable")
        return make_jwt({"email": "svc@x.com", "exp": t[0] + 10})

    creds = OAuthCredentials(OPTIONS, token_source=issuer, clock=lambda: t[0])
    creds.apply_request_metadata()
    t[0] = 11.0
    ok[0] = False
    with pytest.raises(UnauthenticatedError) as ei:
        creds.apply_request_metadata()
    assert ei.value.status_code == "UNAUTHENTICATED"
    assert isinstance(ei.value.__cause__, ConnectionError)


def test_oauth_token_without_exp_never_refreshes():
    """The reference's decoder requires exp; an issuer that omits it
    yields a token the client cannot schedule a refresh for — cached
    for the process lifetime rather than refetched per call."""
    creds = OAuthCredentials(
        OPTIONS,
        token_source=lambda u, f: make_jwt({"email": "svc@x.com"}),
        clock=lambda: 1e12,
    )
    creds.apply_request_metadata()
    creds.apply_request_metadata()
    assert creds.fetch_count == 1


def test_google_credentials_default_audience_and_refresh():
    """GoogleAuthCredentials.java:56-58: audience defaults to
    https://localhost; refreshIfExpired semantics shared with OAuth."""
    t = [0.0]
    audiences = []

    def adc(audience):
        audiences.append(audience)
        return make_jwt({"email": "sa@x.iam", "exp": t[0] + 5})

    creds = GoogleAuthCredentials({}, id_token_provider=adc, clock=lambda: t[0])
    creds.apply_request_metadata()
    assert audiences == ["https://localhost"]
    t[0] = 6.0
    creds.apply_request_metadata()
    assert creds.fetch_count == 2
    custom = GoogleAuthCredentials(
        {"audience": "https://feast"}, id_token_provider=adc, clock=lambda: 0
    )
    custom.apply_request_metadata()
    assert audiences[-1] == "https://feast"


def test_credentials_to_authorization_end_to_end():
    """Full handshake in-process: the client attaches the bearer; the
    server decodes the header's JWT into Authentication claims and the
    subject-list provider authorizes on the configured claim — the
    loop the reference runs across its gRPC boundary."""
    token_src = lambda u, f: make_jwt(  # noqa: E731
        {"email": "svc@x.com", "exp": 9e9}
    )
    creds = OAuthCredentials(OPTIONS, token_source=token_src)
    header = creds.apply_request_metadata()["Authorization"]
    assert header.startswith("Bearer ")
    auth = authentication_from_token(header.split(" ", 1)[1])
    svc = AuthorizationService(
        enabled=True,
        provider=SubjectListAuthorizationProvider({"p1": {"svc@x.com"}}),
    )
    svc.authorize_request(auth, "p1")  # allowed: no raise
    denied = AuthorizationService(
        enabled=True,
        provider=SubjectListAuthorizationProvider({"p1": set()}),
    )
    from feast_java_old_spark.registry.auth import AccessDeniedError

    with pytest.raises(AccessDeniedError):
        denied.authorize_request(auth, "p1")
