"""Registry semantics, mirroring core/src/test/java/feast/core/service/
SpecServiceIT.java scenarios (SURVEY §5, FIXTURES F5)."""

import pytest

from feast_java_old_spark.registry.model import (
    BigQuerySource,
    Entity,
    Feature,
    FeatureTable,
    FileSource,
    KafkaSource,
    Store,
    Subscription,
    ValueType,
)
from feast_java_old_spark.registry.registry import Registry
from feast_java_old_spark.registry.validation import (
    ValidationError,
    validate_data_source,
    validate_online_request,
)


def make_table(name="rides", features=None, **kw):
    return FeatureTable(
        name=name,
        entities=["driver_id"],
        features=features
        or [
            Feature("trip_cost", ValueType.INT64),
            Feature("trip_distance", ValueType.DOUBLE),
        ],
        batch_source=FileSource(file_url="/tmp/x.parquet", event_timestamp_column="ts"),
        **kw,
    )


@pytest.fixture()
def reg(tmp_path):
    r = Registry(str(tmp_path / "registry.json"))
    r.apply_entity(Entity("driver_id", ValueType.INT64))
    return r


def test_apply_entity_idempotent_and_type_change_rejected(reg):
    reg.apply_entity(Entity("driver_id", ValueType.INT64))  # idempotent
    with pytest.raises(ValidationError, match="type change"):
        reg.apply_entity(Entity("driver_id", ValueType.STRING))


def test_apply_table_revision_and_noop(reg):
    t1 = reg.apply_feature_table(make_table())
    assert t1.revision == 1
    # equal spec → no-op, revision unchanged
    t2 = reg.apply_feature_table(make_table())
    assert t2.revision == 1
    # changed spec → revision++
    t3 = reg.apply_feature_table(make_table(max_age_secs=100))
    assert t3.revision == 2


def test_soft_delete_hides_and_get_raises(reg):
    reg.apply_feature_table(make_table())
    reg.delete_feature_table("rides")
    assert reg.list_feature_tables() == []
    with pytest.raises(KeyError):
        reg.get_feature_table("rides")
    # re-apply resurrects with incremented revision
    t = reg.apply_feature_table(make_table())
    assert t.revision == 2 and not t.is_deleted


def test_reserved_names_and_collisions_rejected(reg):
    with pytest.raises(ValidationError, match="reserved"):
        reg.apply_feature_table(
            make_table(features=[Feature("event_timestamp", ValueType.INT64)])
        )
    bad = make_table(features=[Feature("driver_id", ValueType.INT64)])
    with pytest.raises(ValidationError, match="collision"):
        reg.apply_feature_table(bad)


def test_unknown_entity_rejected(reg):
    t = make_table()
    t.entities = ["nope"]
    with pytest.raises(ValidationError, match="unknown entity"):
        reg.apply_feature_table(t)


def test_name_charset(reg):
    with pytest.raises(ValidationError):
        reg.apply_feature_table(make_table(name="bad-name"))
    reg.create_project("ok-project")  # projects allow dashes


def test_label_and_entity_filters(reg):
    reg.apply_entity(Entity("user_id", ValueType.INT64))
    reg.apply_feature_table(make_table(labels={"team": "a"}))
    t2 = make_table(name="clicks", labels={"team": "b"})
    t2.entities = ["user_id"]
    reg.apply_feature_table(t2)
    assert [t.name for t in reg.list_feature_tables(labels={"team": "a"})] == ["rides"]
    assert [t.name for t in reg.list_feature_tables(entities=["user_id"])] == ["clicks"]
    feats = reg.list_features()
    assert "rides:trip_cost" in feats and "clicks:trip_cost" in feats


def test_project_lifecycle(reg):
    with pytest.raises(ValidationError):
        reg.archive_project("default")
    reg.create_project("p1")
    reg.archive_project("p1")
    with pytest.raises(ValidationError, match="archived"):
        reg.apply_entity(Entity("e", ValueType.INT64), project="p1")


def test_persistence_roundtrip(tmp_path):
    path = str(tmp_path / "registry.json")
    r = Registry(path)
    r.apply_entity(Entity("driver_id", ValueType.INT64))
    r.apply_feature_table(make_table(max_age_secs=7200))
    r.update_store(
        Store("online", subscriptions=[Subscription.parse("default:*:false")])
    )
    r2 = Registry(path)
    t = r2.get_feature_table("rides")
    assert t.max_age_secs == 7200 and t.revision == 1
    assert t.batch_source.file_url == "/tmp/x.parquet"
    assert [s.name for s in r2.list_stores()] == ["online"]


def test_subscription_wildcards():
    s = Store(
        "online",
        subscriptions=[
            Subscription.parse("default:*"),
            Subscription.parse("default:secret_*:true"),
        ],
    )
    assert s.is_subscribed_to("default", "rides")
    assert not s.is_subscribed_to("default", "secret_table")  # exclusion wins
    assert not s.is_subscribed_to("other", "rides")


def test_data_source_validation():
    with pytest.raises(ValidationError, match="parquet"):
        validate_data_source(FileSource(file_url="/x.csv", file_format="csv"))
    with pytest.raises(ValidationError, match="BigQuery"):
        validate_data_source(BigQuerySource(table_ref="not-a-ref"))
    validate_data_source(BigQuerySource(table_ref="proj:dataset.table"))
    validate_data_source(KafkaSource(topic="t", message_format="json"))


def test_online_request_validation():
    with pytest.raises(ValidationError):
        validate_online_request([], ["t:f"])
    with pytest.raises(ValidationError):
        validate_online_request([{"e": 1}], ["no_colon"])
    with pytest.raises(ValidationError):
        validate_online_request([{"e": 1}], ["proj/t:f"])
    validate_online_request([{"e": 1}], ["t:f"])


def test_spec_hash_stable_under_ordering():
    a = make_table()
    b = make_table(
        features=[
            Feature("trip_distance", ValueType.DOUBLE),
            Feature("trip_cost", ValueType.INT64),
        ]
    )
    assert a.spec_hash() == b.spec_hash()


def test_murmur3_parity():
    # Public murmur3_32 test vectors (seed 0).
    from feast_java_old_spark.functions.hashing import murmur3_32, trim_and_hash

    assert murmur3_32(b"") == 0
    assert murmur3_32(b"hello") == 0x248BFA47
    assert murmur3_32(b"hello, world", seed=0) == 0x149BBB7F
    long = "x" * 80
    trimmed = trim_and_hash(long, 50)
    assert len(trimmed) == 50 and trimmed != long
