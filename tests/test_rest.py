"""REST facade goldens — CoreServiceRestController.java:69-133 parity:
the five GET handlers' response envelopes, the required-param 400
analog, the exact-entity-set filter, and empty-match-is-empty-JSON."""

import pytest

from feast_java_old_spark import __version__
from feast_java_old_spark.registry.core_service import CoreService
from feast_java_old_spark.registry.model import (
    Entity,
    Feature,
    FeatureTable,
    FileSource,
    ValueType,
)
from feast_java_old_spark.registry.registry import Registry
from feast_java_old_spark.registry.rest import (
    CoreServiceRestController,
    MissingRequestParameter,
)


@pytest.fixture()
def rest():
    reg = Registry()
    reg.apply_entity(Entity("driver", ValueType.INT64))
    reg.apply_entity(Entity("zone", ValueType.STRING))
    src = FileSource(file_url="/tmp/x.parquet", event_timestamp_column="ts")
    reg.apply_feature_table(
        FeatureTable(
            "driver_stats",
            entities=["driver"],
            features=[
                Feature("rating", ValueType.DOUBLE),
                Feature("trips", ValueType.INT64),
            ],
            batch_source=src,
        )
    )
    reg.apply_feature_table(
        FeatureTable(
            "driver_zone",
            entities=["driver", "zone"],
            features=[Feature("surge", ValueType.DOUBLE)],
            batch_source=src,
        )
    )
    return CoreServiceRestController(CoreService(reg))


def test_rest_version_envelope(rest):
    assert rest.get_version() == {"version": __version__}
    assert CoreServiceRestController(rest.service, version="9.9").get_version() == {
        "version": "9.9"
    }


def test_rest_projects_envelope(rest):
    assert rest.list_projects() == {"projects": ["default"]}


def test_rest_entities_envelope_and_default_project(rest):
    body = rest.list_entities()
    names = [e["name"] for e in body["entities"]]
    assert names == ["driver", "zone"]
    # unknown project: empty JSON array, never an error
    assert rest.list_entities(project="nope") == {"entities": []}


def test_rest_feature_tables_envelope(rest):
    body = rest.list_feature_tables()
    assert [t["name"] for t in body["tables"]] == [
        "driver_stats",
        "driver_zone",
    ]
    assert rest.list_feature_tables(project="nope") == {"tables": []}


def test_rest_features_requires_entities_param(rest):
    """Spring rejects a missing required @RequestParam with 400 before
    the handler runs — the facade's MissingRequestParameter analog."""
    with pytest.raises(MissingRequestParameter, match="entities"):
        rest.list_features()
    assert MissingRequestParameter.http_status == 400


def test_rest_features_exact_entity_set_filter(rest):
    """FeatureTable.hasAllEntities:281-285 is SET EQUALITY, not subset:
    [driver] matches only the single-entity table; [driver, zone] only
    the compound one; order inside the filter is irrelevant."""
    body = rest.list_features(entities=["driver"])
    assert sorted(body["features"]) == [
        "driver_stats:rating",
        "driver_stats:trips",
    ]
    assert body["features"]["driver_stats:rating"]["name"] == "rating"
    assert sorted(rest.list_features(entities=["zone", "driver"])["features"]) == [
        "driver_zone:surge"
    ]
    # no exact match -> empty JSON object
    assert rest.list_features(entities=["zone"]) == {"features": {}}


def test_rest_features_empty_entity_list_is_unfiltered(rest):
    """SpecService.listFeatures applies the entity filter only
    `if (entities.size() > 0)` (SpecService.java:158): an explicitly
    empty filter returns ALL features — reference parity, distinct from
    both the missing-param 400 and the exact-set rule for non-empty
    filters."""
    assert sorted(rest.list_features(entities=[])["features"]) == [
        "driver_stats:rating",
        "driver_stats:trips",
        "driver_zone:surge",
    ]


def test_jwt_claims_rejects_non_object_payload():
    """r11 self-review: a structurally valid JWT whose payload is valid
    JSON but not an object must fail as a bad credential (ValueError /
    UNAUTHENTICATED downstream), never flow a non-dict into
    Authentication.claims (AttributeError -> INTERNAL)."""
    import base64 as _b64

    from feast_java_old_spark.registry.credentials import jwt_claims

    payload = _b64.urlsafe_b64encode(b"[1, 2]").decode().rstrip("=")
    with pytest.raises(ValueError, match="JSON object"):
        jwt_claims(f"hdr.{payload}.sig")


def test_rest_features_excludes_soft_deleted(rest):
    rest.service.registry.delete_feature_table("driver_stats")
    assert rest.list_features(entities=["driver"]) == {"features": {}}


# ---- RestResponseEntityExceptionHandler.java:34-118 (the core
# @ControllerAdvice) — every handled failure is (status, {"error": msg}).


def test_rest_advice_missing_param_is_400_with_message(rest):
    from feast_java_old_spark.registry.rest import rest_call

    status, body = rest_call(rest.list_features)
    assert status == 400
    assert "entities" in body["error"]


def test_rest_advice_illegal_argument_is_400_not_500():
    """handleBadRequest:84-97 — an in-handler IllegalArgumentException
    (e.g. an invalid project name) maps to 400 WITH the message, not
    Spring's default 500."""
    from feast_java_old_spark.registry.rest import handle_rest_exception
    from feast_java_old_spark.registry.validation import ValidationError

    status, body = handle_rest_exception(
        ValidationError("invalid characters in project name")
    )
    assert (status, body["error"]) == (
        400,
        "invalid characters in project name",
    )


def test_rest_advice_retrieval_is_500_with_bare_message():
    """handleRetrieval:57-69 — a failed service lookup is 500 with the
    exception's message (the gRPC transport maps the SAME failure to
    NOT_FOUND, CoreServiceImpl.java:87 — an intentional reference
    disagreement between transports). KeyError's quoting must not leak
    into the body."""
    from feast_java_old_spark.registry.rest import handle_rest_exception

    status, body = handle_rest_exception(
        KeyError("feature table default/nope not found")
    )
    assert (status, body["error"]) == (
        500,
        "feature table default/nope not found",
    )


def test_rest_advice_malformed_object_is_500_constant_body():
    """handleInvalidProtocolBuffer:45-53 — the one handler that hides
    its message behind the constant body."""
    import json

    from feast_java_old_spark.registry.rest import (
        UNEXPECTED_ERROR_BODY,
        handle_rest_exception,
    )

    try:
        json.loads("{broken")
    except json.JSONDecodeError as ex:
        status, body = handle_rest_exception(ex)
    assert (status, body["error"]) == (500, UNEXPECTED_ERROR_BODY)


def test_rest_advice_unhandled_propagates():
    """No matching @ExceptionHandler -> the exception escapes the
    advice (Spring's default handling applies)."""
    from feast_java_old_spark.registry.rest import rest_call

    def boom():
        raise RuntimeError("not a handled kind")

    with pytest.raises(RuntimeError, match="not a handled kind"):
        rest_call(boom)


def test_rest_advice_plain_valueerror_propagates():
    """ADVICE r12: the advice handles IllegalArgumentException
    (ValidationError here), not arbitrary ValueErrors — an internal
    bug deep in a service must surface as a server error, not be
    re-badged a client-fault 400."""
    from feast_java_old_spark.registry.rest import handle_rest_exception

    with pytest.raises(ValueError, match="internal bug"):
        handle_rest_exception(ValueError("internal bug"))


def test_rest_controller_strips_grpc_latency_histogram(rest):
    """MonitoringInterceptor wraps only the gRPC server — REST-facade
    reads must not observe feast_core_request_latency_seconds even
    when the shared CoreService is metrics-wired."""
    from feast_java_old_spark.plans.metrics import CoreGrpcMetrics

    metrics = CoreGrpcMetrics()
    svc = CoreService(rest.service.registry, metrics=metrics)
    ctl = CoreServiceRestController(svc)
    ctl.list_entities()
    ctl.list_feature_tables()
    ctl.list_features(entities=["driver"])
    assert "_count" not in metrics.exposition()  # nothing observed
    # the gRPC path through the SAME service still observes
    svc.list_entities()
    assert 'method="ListEntities"' in metrics.exposition()
