from syscol_spark.operators.joins import asof_join, range_join_count  # noqa: F401
