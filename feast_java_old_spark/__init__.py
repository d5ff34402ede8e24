"""feast_java_old_spark — a PySpark-native feature-store engine.

A from-scratch re-expression of the capabilities of feast-dev/feast-java-old
(Feast <=0.9 Java: Core registry + Serving + storage connectors) as an
idiomatic PySpark engine:

- the registry data model (projects / entities / feature tables / sources /
  stores) with the reference's validation and update semantics,
- batch materialization (latest-value-per-entity-key) that the reference
  delegated to an external system,
- online retrieval (the ``GetOnlineFeaturesV2`` query shape) as a broadcast
  left equi-join with per-field status semantics
  (PRESENT / NOT_FOUND / NULL_VALUE / OUTSIDE_MAX_AGE),
- historical point-in-time (as-of) retrieval,
- streaming materialization (Structured Streaming, latest-wins merge),
- on-demand transforms (Arrow-vectorized, in-process),
- large-scale training-data pipeline operators: deduplication (exact,
  MinHash+LSH, SimHash, n-gram Jaccard, embedding cosine), similarity
  search (brute-force + bucketed ANN), text analysis, multimodal columns.

Everything is DataFrame-first: plans are declared with the PySpark
DataFrame/SQL API so Catalyst handles pushdown, pruning, join strategy and
whole-stage codegen; Python-side compute is Arrow-batched (pandas UDFs /
mapInPandas) and only used where built-in functions cannot express the
semantics.
"""

__version__ = "0.1.0"

from feast_java_old_spark.registry.model import (  # noqa: F401
    DataSource,
    Entity,
    Feature,
    FeatureTable,
    Project,
    Store,
    ValueType,
)
from feast_java_old_spark.registry.registry import Registry  # noqa: F401
from feast_java_old_spark.registry.cache import CachedSpecService  # noqa: F401
from feast_java_old_spark.sdk import (  # noqa: F401
    FeastClient,
    Row,
    SecurityConfig,
)
