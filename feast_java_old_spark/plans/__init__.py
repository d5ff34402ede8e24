from feast_java_old_spark.plans.online_plan import serve_online_features  # noqa: F401
