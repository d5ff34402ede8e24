"""Authorization enforcement — mirrors the scenarios of
``core/src/test/java/feast/core/auth/CoreServiceAuthTest.java`` (denied
mutate → PERMISSION_DENIED, allowed mutate succeeds) and
``CoreServiceAuthenticationIT.java`` (reads/version always available),
plus the provider semantics of ``HttpAuthorizationProvider.java:79-112``
(subject claim extraction, deny-by-default, decision caching) and the
health/info surface (``HealthServiceController.java:41-59``,
``ServingServiceGRpcController.java:72-79``)."""

import json

import pytest

from feast_java_old_spark.registry.auth import (
    AccessDeniedError,
    AllowAllAuthorizationProvider,
    Authentication,
    AuthorizationProvider,
    AuthorizationResult,
    AuthorizationService,
    SubjectListAuthorizationProvider,
    get_subject_from_auth,
)
from feast_java_old_spark.registry.audit import AuditLogger
from feast_java_old_spark.registry.core_service import CoreService
from feast_java_old_spark.registry.model import (
    Entity,
    Feature,
    FeatureTable,
    FileSource,
    ValueType,
)
from feast_java_old_spark.registry.registry import Registry


def _entity(name="driver"):
    return Entity(name, ValueType.INT64)


def _table(name="driver_stats"):
    src = FileSource(file_url="/tmp/x.parquet", event_timestamp_column="ts")
    return FeatureTable(
        name,
        entities=["driver"],
        features=[Feature("rating", ValueType.DOUBLE)],
        batch_source=src,
    )


def _denying_service():
    class _Deny(AuthorizationProvider):
        def check_access_to_project(self, project_id, authentication):
            return AuthorizationResult.failed(None)

    return AuthorizationService(enabled=True, provider=_Deny())


ALICE = Authentication({"email": "alice@example.com"})
BOB = Authentication({"email": "bob@example.com"})


# ------------------------------------------------- CoreServiceAuthTest


def test_should_not_apply_entity_if_not_project_member():
    """``shouldNotApplyEntityIfNotProjectMember`` — a failed provider
    result surfaces as PERMISSION_DENIED with the default reason
    (`"PERMISSION_DENIED: Access Denied"` in the reference's recorder),
    and the registry is NOT mutated."""
    reg = Registry()
    svc = CoreService(reg, auth=_denying_service())
    with pytest.raises(AccessDeniedError, match="Access Denied"):
        svc.apply_entity(_entity(), project="project1", authentication=ALICE)
    assert reg.list_entities("project1") == []


def test_should_apply_entity_if_project_member():
    """``shouldApplyEntityIfProjectMember``."""
    reg = Registry()
    svc = CoreService(
        reg,
        auth=AuthorizationService(
            enabled=True, provider=AllowAllAuthorizationProvider()
        ),
    )
    svc.apply_entity(_entity(), project="project1", authentication=ALICE)
    assert [e.name for e in reg.list_entities("project1")] == ["driver"]


def test_all_four_reference_auth_sites_enforced():
    """CoreServiceImpl.java:181,240,295,392 — applyEntity,
    archiveProject, applyFeatureTable, deleteFeatureTable all deny."""
    reg = Registry()
    allow_all = CoreService(reg)  # auth disabled: seed state freely
    allow_all.create_project("p1")
    allow_all.apply_entity(_entity(), project="p1")
    allow_all.apply_feature_table(_table(), project="p1")

    svc = CoreService(reg, auth=_denying_service())
    with pytest.raises(AccessDeniedError):
        svc.apply_entity(_entity("e2"), project="p1", authentication=ALICE)
    with pytest.raises(AccessDeniedError):
        svc.apply_feature_table(
            _table("t2"), project="p1", authentication=ALICE
        )
    with pytest.raises(AccessDeniedError):
        svc.delete_feature_table(
            "driver_stats", project="p1", authentication=ALICE
        )
    with pytest.raises(AccessDeniedError):
        svc.archive_project("p1", authentication=ALICE)
    # state unchanged by any denied call
    assert [t.name for t in reg.list_feature_tables("p1")] == ["driver_stats"]
    assert not [p for p in reg.list_projects() if p.name == "p1"][0].archived


def test_reads_and_unauthorized_mutations_unaffected_by_denial():
    """``shouldAllowUnauthenticatedEntityApplyAndListing`` semantics for
    reads + the two mutations the reference does NOT authorize
    (createProject, updateStore)."""
    from feast_java_old_spark.registry.model import Store

    reg = Registry()
    CoreService(reg).apply_entity(_entity(), project="p1")
    svc = CoreService(reg, auth=_denying_service())
    # reads pass through with no authorization
    assert [e.name for e in svc.list_entities("p1")] == ["driver"]
    assert svc.get_entity("driver", "p1").name == "driver"
    assert [p.name for p in svc.list_projects()] == ["default", "p1"]
    # unauthorized-in-the-reference mutations still work under a
    # denying provider — coverage parity, not blanket policy
    svc.create_project("p2", authentication=ALICE)
    svc.update_store(Store("online", "REDIS"), authentication=ALICE)
    assert svc.get_store("online").name == "online"


def test_auth_disabled_never_consults_provider():
    """AuthorizationService.java:53-55 — disabled short-circuits."""

    class _Exploding(AllowAllAuthorizationProvider):
        def check_access_to_project(self, project_id, authentication):
            raise AssertionError("provider consulted while disabled")

    svc = AuthorizationService(enabled=False, provider=_Exploding())
    svc.authorize_request(ALICE, "p1")  # no raise

    with pytest.raises(ValueError, match="no AuthorizationProvider"):
        AuthorizationService(enabled=True, provider=None)


# --------------------------------------------- SubjectListProvider


def test_subject_list_provider_membership_and_reason():
    prov = SubjectListAuthorizationProvider(
        {"p1": {"alice@example.com"}, "pub": {"*"}}
    )
    assert prov.check_access_to_project("p1", ALICE).allowed
    denied = prov.check_access_to_project("p1", BOB)
    assert not denied.allowed
    # HttpAuthorizationProvider.java:110-112 message shape
    assert denied.failure_reason == (
        "Access denied to project p1 for subject bob@example.com"
    )
    # wildcard project admits any authenticated subject
    assert prov.check_access_to_project("pub", BOB).allowed
    # unknown project: deny by default
    assert not prov.check_access_to_project("ghost", ALICE).allowed


def test_subject_claim_extraction_contract():
    """AuthUtils.getSubjectFromAuth:37-60 — missing/empty claim is an
    error (never an anonymous allow); email claims validate shape."""
    with pytest.raises(ValueError, match="valid claim email"):
        get_subject_from_auth(Authentication({}), "email")
    with pytest.raises(ValueError, match="invalid email"):
        get_subject_from_auth(Authentication({"email": "not-an-email"}), "email")
    assert (
        get_subject_from_auth(Authentication({"sub": "svc-1"}), "sub")
        == "svc-1"
    )


def test_provider_decision_cache_ttl():
    """CacheConfiguration.java:46-66 — decisions cached 60 s; a
    membership change is invisible until the TTL lapses."""
    t = [0.0]
    prov = SubjectListAuthorizationProvider(
        {"p1": {"alice@example.com"}}, clock=lambda: t[0]
    )
    assert prov.check_access_to_project("p1", ALICE).allowed
    assert prov.decision_count == 1
    prov.members["p1"].clear()  # revoke
    t[0] = 30.0
    assert prov.check_access_to_project("p1", ALICE).allowed  # cached
    assert prov.decision_count == 1
    t[0] = 61.0
    assert not prov.check_access_to_project("p1", ALICE).allowed
    assert prov.decision_count == 2


# ----------------------------------------------- audit integration


def test_denied_mutation_emits_error_message_entry():
    """GrpcMessageInterceptor.java:83-89 — the MESSAGE entry for a
    denied call carries statusCode=PERMISSION_DENIED at ERROR level."""
    log = AuditLogger(clock=lambda: 0, id_factory=lambda: "m-1")
    reg = Registry(audit=log)
    svc = CoreService(
        reg,
        auth=AuthorizationService(
            enabled=True,
            provider=SubjectListAuthorizationProvider({"p1": set()}),
        ),
    )
    with pytest.raises(AccessDeniedError):
        svc.apply_feature_table(_table(), project="p1", authentication=ALICE)
    msgs = [e for e in log.entries if e["kind"] == "MESSAGE"]
    assert len(msgs) == 1
    (m,) = msgs
    assert m["statusCode"] == "PERMISSION_DENIED"
    assert m["level"] == "ERROR"
    assert m["method"] == "ApplyFeatureTable"
    assert m["identity"] == "alice@example.com"
    assert "Access denied to project p1" in m["response"]["error"]
    # and no ACTION entry: the mutation never happened
    assert [e for e in log.entries if e["kind"] == "ACTION"] == []


def test_allowed_mutation_emits_ok_message_and_action_entries():
    log = AuditLogger(clock=lambda: 0, id_factory=lambda: "m-1")
    reg = Registry(audit=log)
    svc = CoreService(
        reg,
        auth=AuthorizationService(
            enabled=True,
            provider=SubjectListAuthorizationProvider(
                {"p1": {"alice@example.com"}}
            ),
        ),
    )
    svc.apply_entity(_entity(), project="p1", authentication=ALICE)
    kinds = [e["kind"] for e in log.entries]
    assert "ACTION" in kinds and "MESSAGE" in kinds
    (m,) = [e for e in log.entries if e["kind"] == "MESSAGE"]
    assert m["statusCode"] == "OK" and m["level"] == "INFO"


def test_serving_denial_is_permission_denied(spark, tmp_path):
    """ServingServiceGRpcController.getOnlineFeaturesV2:86-91 — the
    serving path authorizes the request's project before touching the
    store."""
    from feast_java_old_spark.plans.serving_json import serve_logged

    log = AuditLogger(clock=lambda: 0, id_factory=lambda: "m-1")
    reg = Registry(audit=log)
    auth = AuthorizationService(
        enabled=True,
        provider=SubjectListAuthorizationProvider({"default": set()}),
    )
    with pytest.raises(AccessDeniedError):
        serve_logged(
            spark,
            reg,
            [{"driver": 1}],
            ["driver_stats:rating"],
            auth=auth,
            authentication=ALICE,
        )
    (m,) = [e for e in log.entries if e["kind"] == "MESSAGE"]
    assert m["statusCode"] == "PERMISSION_DENIED"


class _PoisonedSpark:
    """Sentinel SparkSession stand-in: ANY attribute access means the
    serving path started building or executing a plan."""

    def __getattr__(self, name):
        raise AssertionError(
            f"denied request touched the engine (spark.{name} accessed "
            "before authorization short-circuited)"
        )


def test_serving_denial_short_circuits_before_any_spark_work(tmp_path):
    """r10 verdict item 6: enforcement happens BEFORE plan execution —
    a PERMISSION_DENIED getOnlineFeatures must not read the store, not
    build a plan, not trigger any Spark action (no read amplification
    on denial). Proven with a poisoned Spark stand-in that raises on
    first touch, so the assertion covers plan CONSTRUCTION, not just
    actions. Also pins the audit ordering: the denial MESSAGE is the
    only trail entry (no retrieval/transition entries precede it) and
    carries the denial identity."""
    from feast_java_old_spark.plans.serving_json import serve_logged

    log = AuditLogger(clock=lambda: 0, id_factory=lambda: "m-1")
    reg = Registry(audit=log)
    auth = AuthorizationService(
        enabled=True,
        provider=SubjectListAuthorizationProvider({"default": set()}),
    )
    store = tmp_path / "never_touched_store"
    store.mkdir()
    with pytest.raises(AccessDeniedError):
        serve_logged(
            _PoisonedSpark(),
            reg,
            [{"driver": 1}],
            ["driver_stats:rating"],
            auth=auth,
            authentication=ALICE,
            store_path=str(store),
        )
    assert list(store.iterdir()) == []  # store dir untouched
    # audit ordering: exactly one entry, the denial MESSAGE, first.
    assert [e["kind"] for e in log.entries] == ["MESSAGE"]
    m = log.entries[0]
    assert m["statusCode"] == "PERMISSION_DENIED"
    assert m["identity"] == "alice@example.com"


# ------------------------------------------------- info / health


def test_serving_info_golden():
    from feast_java_old_spark import __version__
    from feast_java_old_spark.plans.serving_json import serving_info

    assert serving_info() == {
        "version": __version__,
        "type": "FEAST_SERVING_TYPE_ONLINE",
    }
    assert serving_info(version="1.2.3")["version"] == "1.2.3"


def test_health_check_serving_and_not_serving(tmp_path):
    from feast_java_old_spark.plans.serving_json import health_check

    # in-memory registry: SERVING
    assert health_check(Registry()) == "SERVING"
    # file-backed, readable: SERVING
    p = str(tmp_path / "registry.json")
    reg = Registry(path=p)
    reg.create_project("p1")
    assert health_check(reg) == "SERVING"
    # corrupt file: NOT_SERVING (never an exception)
    with open(p, "w") as f:
        f.write("{ not json")
    assert health_check(reg) == "NOT_SERVING"
    json  # keep import used


def test_health_check_unwritten_file_registry_is_serving(tmp_path):
    """r10 ADVICE: Registry(path=...) is fully functional in-memory
    before the first save — the probe must not report NOT_SERVING for
    a freshly configured service whose file has not been written yet."""
    from feast_java_old_spark.plans.serving_json import health_check

    reg = Registry(path=str(tmp_path / "never_written.json"))
    assert health_check(reg) == "SERVING"


def test_missing_subject_claim_is_invalid_argument_not_internal():
    """Self-review r10: an unauthenticated/claimless request under
    enabled auth is a CLIENT error — the MESSAGE entry must carry
    INVALID_ARGUMENT (matching serve_logged's mapping), not INTERNAL."""
    log = AuditLogger(clock=lambda: 0, id_factory=lambda: "m-1")
    reg = Registry(audit=log)
    svc = CoreService(
        reg,
        auth=AuthorizationService(
            enabled=True,
            provider=SubjectListAuthorizationProvider({"p1": set()}),
        ),
    )
    with pytest.raises(ValueError, match="valid claim"):
        svc.apply_entity(_entity(), project="p1", authentication=None)
    (m,) = [e for e in log.entries if e["kind"] == "MESSAGE"]
    assert m["statusCode"] == "INVALID_ARGUMENT"


def test_cache_refresh_at_capacity_does_not_evict_live_entries():
    """Self-review r10: refreshing an EXISTING key at capacity must
    overwrite in place, not evict an unrelated live decision."""
    t = [0.0]
    prov = SubjectListAuthorizationProvider(
        {"p1": {"a@x.com", "b@x.com"}},
        cache_size=2,
        cache_ttl_secs=60,
        clock=lambda: t[0],
    )
    a = Authentication({"email": "a@x.com"})
    b = Authentication({"email": "b@x.com"})
    prov.check_access_to_project("p1", a)  # t=0
    t[0] = 30.0
    prov.check_access_to_project("p1", b)  # t=30, cache full
    t[0] = 61.0  # a's entry expired, b's still live
    prov.check_access_to_project("p1", a)  # refresh of existing key
    assert ("p1", "b@x.com") in prov._cache  # b must survive
    assert prov.check_access_to_project("p1", b).allowed
    assert prov.decision_count == 3  # b served from cache after refresh


def test_cache_capacity_evicts_oldest_write_after_refresh():
    """r10 ADVICE follow-up: eviction is popitem(last=False) on an
    OrderedDict, so a TTL refresh must RE-POSITION its key (write order
    == iteration order) — otherwise a refreshed-live entry would be
    evicted as 'oldest' while a staler one survives."""
    t = [0.0]
    prov = SubjectListAuthorizationProvider(
        {"p1": {"a@x.com", "b@x.com", "c@x.com"}},
        cache_size=2,
        cache_ttl_secs=60,
        clock=lambda: t[0],
    )
    a = Authentication({"email": "a@x.com"})
    b = Authentication({"email": "b@x.com"})
    c = Authentication({"email": "c@x.com"})
    prov.check_access_to_project("p1", a)  # write order: a
    t[0] = 10.0
    prov.check_access_to_project("p1", b)  # a, b (full)
    t[0] = 61.0  # a expired; refresh it -> write order: b, a
    prov.check_access_to_project("p1", a)
    t[0] = 62.0
    prov.check_access_to_project("p1", c)  # evicts b (oldest write)
    assert ("p1", "b@x.com") not in prov._cache
    assert ("p1", "a@x.com") in prov._cache  # refreshed entry survives
    assert ("p1", "c@x.com") in prov._cache


def test_audit_identity_uses_provider_subject_claim():
    """Self-review r10: the audited identity must be the subject the
    provider keyed its decision on, not a hardcoded email claim."""
    log = AuditLogger(clock=lambda: 0, id_factory=lambda: "m-1")
    reg = Registry(audit=log)
    svc = CoreService(
        reg,
        auth=AuthorizationService(
            enabled=True,
            provider=SubjectListAuthorizationProvider(
                {"p1": set()}, subject_claim="sub"
            ),
        ),
    )
    # token carries BOTH an (unrelated) email and the decision subject
    tok = Authentication({"email": "human@x.com", "sub": "svc-batch-1"})
    with pytest.raises(AccessDeniedError):
        svc.apply_entity(_entity(), project="p1", authentication=tok)
    (m,) = [e for e in log.entries if e["kind"] == "MESSAGE"]
    assert m["identity"] == "svc-batch-1"
    assert "svc-batch-1" in m["response"]["error"]


def test_serving_os_permission_error_is_internal_not_denied(
    spark, monkeypatch
):
    """Self-review r10: an OS-level PermissionError from the store path
    is a server fault (INTERNAL) — only AccessDeniedError maps to
    PERMISSION_DENIED."""
    from feast_java_old_spark.operators import retrieval
    from feast_java_old_spark.plans.serving_json import serve_logged

    def boom(*a, **k):
        raise PermissionError("store dir unreadable")

    monkeypatch.setattr(retrieval, "get_online_features", boom)
    log = AuditLogger(clock=lambda: 0, id_factory=lambda: "m-1")
    reg = Registry(audit=log)
    with pytest.raises(PermissionError):
        serve_logged(spark, reg, [{"driver": 1}], ["t:f"])
    (m,) = [e for e in log.entries if e["kind"] == "MESSAGE"]
    assert m["statusCode"] == "INTERNAL"


def test_core_version_available_regardless_of_auth():
    """``CoreServiceAuthenticationIT.shouldGetVersionFromFeastCoreAlways``
    — the version endpoint is identical for denied, allowed, and
    anonymous callers; it sits in front of authentication entirely."""
    from feast_java_old_spark import __version__

    denied = CoreService(Registry(), auth=_denying_service())
    open_svc = CoreService(Registry())
    assert denied.get_version() == __version__
    assert open_svc.get_version() == __version__


# ------------------------------------------- PolicyProvider (Keto)


def test_policy_provider_glob_and_default_deny():
    """KetoAuthorizationProvider.java:138-164 request shape + Ory ACP
    decision semantics: glob flavor, default action 'edit', prefixes,
    default deny, reference denial message."""
    from feast_java_old_spark.registry.auth import (
        AccessPolicy,
        PolicyAuthorizationProvider,
    )

    prov = PolicyAuthorizationProvider(
        [
            AccessPolicy(
                subjects=("users:*@example.com",),
                resources=("projects:analytics",),
                actions=("edit",),
            )
        ],
        subject_prefix="users:",
        resource_prefix="projects:",
    )
    assert prov.check_access_to_project("analytics", ALICE).allowed
    outsider = Authentication({"email": "eve@intruder.io"})
    denied = prov.check_access_to_project("analytics", outsider)
    assert not denied.allowed
    assert denied.failure_reason == (
        "Access denied to project analytics for subject eve@intruder.io"
    )
    # default deny: resource with no matching policy
    assert not prov.check_access_to_project("other", ALICE).allowed


def test_policy_provider_deny_overrides_allow():
    from feast_java_old_spark.registry.auth import (
        AccessPolicy,
        PolicyAuthorizationProvider,
    )

    prov = PolicyAuthorizationProvider(
        [
            AccessPolicy(("*",), ("p1",), ("edit",), effect="allow"),
            AccessPolicy(
                ("bob@example.com",), ("p1",), ("edit",), effect="deny"
            ),
        ]
    )
    assert prov.check_access_to_project("p1", ALICE).allowed
    assert not prov.check_access_to_project("p1", BOB).allowed


def test_policy_provider_flavors_and_action_scope():
    from feast_java_old_spark.registry.auth import (
        AccessPolicy,
        PolicyAuthorizationProvider,
    )
    import pytest as _pytest

    # exact: no pattern expansion
    exact = PolicyAuthorizationProvider(
        [AccessPolicy(("alice@example.com",), ("p1",), ("edit",))],
        flavor="exact",
    )
    assert exact.check_access_to_project("p1", ALICE).allowed
    assert not exact.check_access_to_project("p1", BOB).allowed

    # regex: full-match only
    rx = PolicyAuthorizationProvider(
        [AccessPolicy((r"[a-z]+@example\.com",), (r"p\d",), ("edit",))],
        flavor="regex",
    )
    assert rx.check_access_to_project("p1", ALICE).allowed
    assert not rx.check_access_to_project("p10x", ALICE).allowed

    # a policy granting a DIFFERENT action never authorizes 'edit'
    view_only = PolicyAuthorizationProvider(
        [AccessPolicy(("*",), ("p1",), ("view",))]
    )
    assert not view_only.check_access_to_project("p1", ALICE).allowed

    with _pytest.raises(ValueError, match="flavor"):
        PolicyAuthorizationProvider([], flavor="fuzzy")
    with _pytest.raises(ValueError, match="effect"):
        AccessPolicy(("*",), ("*",), ("*",), effect="maybe")


def test_policy_provider_through_core_service():
    """End-to-end: the Keto-style provider plugs into the same
    AuthorizationService/CoreService stack as the subject-list one."""
    from feast_java_old_spark.registry.auth import (
        AccessPolicy,
        PolicyAuthorizationProvider,
    )

    reg = Registry()
    svc = CoreService(
        reg,
        auth=AuthorizationService(
            enabled=True,
            provider=PolicyAuthorizationProvider(
                [AccessPolicy(("alice@example.com",), ("p1",), ("edit",))]
            ),
        ),
    )
    svc.apply_entity(_entity(), project="p1", authentication=ALICE)
    with pytest.raises(AccessDeniedError):
        svc.apply_entity(_entity("e2"), project="p1", authentication=BOB)
    assert [e.name for e in reg.list_entities("p1")] == ["driver"]
