from semadb_spark.functions import distances, analyzer, hashing  # noqa: F401
