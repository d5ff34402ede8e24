from feast_java_old_spark.operators.materialize import (  # noqa: F401
    latest_per_key,
    materialize,
    online_table_path,
)
from feast_java_old_spark.operators.retrieval import get_online_features  # noqa: F401
from feast_java_old_spark.operators.historical import get_historical_features  # noqa: F401
