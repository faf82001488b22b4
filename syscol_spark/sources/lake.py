"""Lake layout helpers: bucketed tables for shuffle-free co-located joins,
partitioned directories for partition pruning.

The reference stores nothing (it streams scrapes straight to Kafka); this
module is part of the engine's 100 TB mandate: at lake scale the dominant
cost of every join/aggregate is the shuffle, and the way to delete it is to
pay ONE clustering shuffle at write time:

- ``write_bucketed``: hash-bucket (and optionally sort) a table on its join
  key. Two tables bucketed the same way join with ZERO exchanges — and with
  ``sort_by``, zero sorts (verified by plan-shape test). This is how fact
  tables that join daily should be laid down.
- ``write_partitioned``: directory partitioning on low-cardinality columns
  (date, lang, source); predicates on them prune whole directories at
  planning time (PartitionFilters, verified by test) so a one-day query
  over a 10-year lake touches 0.03% of the files.

Bucketed tables go through the session catalog (``saveAsTable`` — Spark's
bucketing metadata lives in the metastore); partitioned layouts are plain
directory trees readable by any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a managed parquet table bucketed (and optionally
    sorted within buckets) on ``bucket_by``. Joins/aggregations keyed on
    ``bucket_by`` between tables with the SAME bucket count read co-located
    buckets and skip the exchange entirely."""
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str],
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a directory-partitioned parquet layout. Equality /
    range predicates on the partition columns prune directories at plan
    time instead of filtering rows at scan time."""
    df.write.format("parquet").mode(mode).partitionBy(*partition_by).save(path)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back through the catalog (the bucketing spec
    only applies when read via the table name, not the raw path)."""
    return spark.table(table)
