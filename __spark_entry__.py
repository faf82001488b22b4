"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``syscol_spark.plans`` (catalog of
(Spark builder, DuckDB oracle) pairs); this module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: average metric value per
    entity per minute over the stream-shaped events table (SURVEY.md §7 M1)."""
    from syscol_spark.plans.catalog import query_catalog

    return query_catalog()["q_ev_minutely"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.11."""
    from syscol_spark.plans.catalog import query_catalog

    return query_catalog()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins; omitted keys get rows-only checks."""
    from syscol_spark.plans.catalog import oracle_sql_catalog

    return oracle_sql_catalog()
