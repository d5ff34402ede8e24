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
    # parquet is reference parity; csv/json/orc/avro are engine
    # extensions — all validate. Anything else is rejected.
    validate_data_source(FileSource(file_url="/x.csv", file_format="csv"))
    validate_data_source(FileSource(file_url="/x.json", file_format="json"))
    validate_data_source(FileSource(file_url="/x.orc", file_format="orc"))
    validate_data_source(FileSource(file_url="/x.avro", file_format="avro"))
    with pytest.raises(ValidationError, match="invalid file format"):
        validate_data_source(FileSource(file_url="/x.xml", file_format="xml"))
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
    # Ground truth computed with Guava 33.4.8 (Spark's bundled jar):
    # Hashing.murmur3_32().hashBytes(expr.substring(42).getBytes()).toString()
    # — tail-only hash, HashCode.toString() = 4 bytes little-endian hex.
    assert trimmed == "x" * 42 + "ed44b25d"
    name2 = (
        "feast_features_project_alpha_user_account_profile_metrics_v2_long_name"
    )
    assert (
        trim_and_hash(name2, 50)
        == "feast_features_project_alpha_user_account_106051ab"
    )
    # at or under the limit: unchanged
    assert trim_and_hash("short", 50) == "short"
    assert trim_and_hash("y" * 50, 50) == "y" * 50


# --------------------------------------------------- A4 bounded spec cache


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def advance(self, secs):
        self.t += secs

    def __call__(self):
        return self.t


def _cache_env(tmp_path, n_tables=5, **kw):
    from feast_java_old_spark.registry.cache import CachedSpecService

    path = str(tmp_path / "registry.json")
    reg = Registry(path)
    reg.apply_entity(Entity("driver_id", ValueType.INT64))
    for i in range(n_tables):
        reg.apply_feature_table(make_table(name=f"t{i}"))
    clock = FakeClock()
    cache = CachedSpecService(path=path, clock=clock, **kw)
    return reg, cache, clock, path


def test_spec_cache_bounded_lru_eviction(tmp_path):
    """Parity: MAX_SPEC_COUNT bound (CachedSpecService.java:43,75)."""
    reg, cache, clock, _ = _cache_env(tmp_path, n_tables=5, max_spec_count=3)
    for i in range(5):
        cache.get_feature_table(f"t{i}")
    assert len(cache) == 3  # t0, t1 evicted
    cache.get_feature_table("t2")  # refresh recency of t2
    cache.get_feature_table("t0")  # reload t0 -> evicts t3 (oldest)
    assert len(cache) == 3
    keys = {k[1] for k in cache._cache}
    assert keys == {"t2", "t4", "t0"}


def test_spec_cache_serves_stale_within_interval_then_refreshes(tmp_path):
    """Reads between refresh ticks may be up to refresh_interval stale —
    the reference's scheduled populateCache contract."""
    reg, cache, clock, path = _cache_env(tmp_path)
    t0 = cache.get_feature_table("t0")
    assert t0.max_age_secs == 0

    updated = make_table(name="t0")
    updated.max_age_secs = 3600
    reg.apply_feature_table(updated)

    clock.advance(5)  # < interval: stale spec still served
    assert cache.get_feature_table("t0").max_age_secs == 0
    clock.advance(6)  # past interval: mtime change -> reload
    assert cache.get_feature_table("t0").max_age_secs == 3600
    assert cache.refresh_count == 1


def test_spec_cache_no_reload_when_file_unchanged(tmp_path):
    reg, cache, clock, _ = _cache_env(tmp_path)
    cache.get_feature_table("t0")
    clock.advance(60)
    cache.get_feature_table("t0")
    assert cache.refresh_count == 0  # stat'ed, mtime unchanged, no reload


def test_spec_cache_populate_and_registry_stand_in(tmp_path):
    from feast_java_old_spark.registry.cache import CachedSpecService

    reg, cache, clock, path = _cache_env(tmp_path, n_tables=4)
    assert cache.populate_cache() == 4
    assert len(cache) == 4
    # Unknown / deleted tables raise like Registry
    with pytest.raises(KeyError):
        cache.get_feature_table("nope")
    # Read-side delegation (retrieval paths use list_*/get_* too)
    assert {t.name for t in cache.list_feature_tables()} == {
        "t0", "t1", "t2", "t3"
    }
    small = CachedSpecService(path=path, max_spec_count=2, clock=clock)
    assert small.populate_cache() == 2  # bound holds during bulk preload
