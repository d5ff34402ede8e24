from feast_java_old_spark.functions.refs import (  # noqa: F401
    feature_ref_str,
    parse_feature_ref,
)
from feast_java_old_spark.functions.hashing import murmur3_32  # noqa: F401
