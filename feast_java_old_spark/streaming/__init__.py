from feast_java_old_spark.streaming.ingest import (  # noqa: F401
    stream_materialize,
    stream_window_features,
)
