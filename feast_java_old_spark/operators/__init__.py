from feast_java_old_spark.operators.materialize import (  # noqa: F401
    conform_batch_source,
    latest_per_key,
    latest_per_key_for,
    materialize,
    materialize_bucketed,
    materialize_store,
    online_table_path,
)
from feast_java_old_spark.operators.retrieval import get_online_features  # noqa: F401
from feast_java_old_spark.operators.historical import (  # noqa: F401
    get_historical_features,
    get_training_dataset,
)
