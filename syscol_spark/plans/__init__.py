from syscol_spark.plans.catalog import QUERIES, QuerySpec, oracle_sql_catalog, query_catalog  # noqa: F401
