from promhouse_spark.streaming.ingest import start_ingest  # noqa: F401
