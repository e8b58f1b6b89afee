from semadb_spark.plans.compiler import SearchEngine  # noqa: F401
