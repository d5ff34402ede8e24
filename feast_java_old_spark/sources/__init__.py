from feast_java_old_spark.sources.batch import read_batch_source  # noqa: F401
from feast_java_old_spark.sources.stream import read_stream_source  # noqa: F401
