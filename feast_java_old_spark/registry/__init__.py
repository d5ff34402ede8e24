from feast_java_old_spark.registry.model import (  # noqa: F401
    BigQuerySource,
    DataSource,
    Entity,
    Feature,
    FeatureTable,
    FileSource,
    KafkaSource,
    KinesisSource,
    Project,
    Store,
    ValueType,
)
from feast_java_old_spark.registry.registry import Registry  # noqa: F401
from feast_java_old_spark.registry.cache import CachedSpecService  # noqa: F401
