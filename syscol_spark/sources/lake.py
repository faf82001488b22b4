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

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession


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


# --- z-order clustering (multi-dimensional data skipping) --------------------
# Parquet data skipping works off per-row-group min/max stats: a predicate
# prunes a row group only when its value range misses the group's range.
# Sorting by ONE column gives that column tight ranges and leaves every other
# column's range full-width; interleaving the bits of TWO columns (Morton /
# z-order code) and sorting by the code gives BOTH columns locality, so 2-D
# box predicates prune on either dimension. This is the standard Delta/
# Iceberg OPTIMIZE ZORDER primitive, expressed as pure Catalyst bit
# arithmetic — no UDF, no shuffle beyond the one range-partition write.


def _spread_bits16(c: Column) -> Column:
    """Interleave-ready bit spread: 16-bit value -> bits at even positions
    of a 32-bit word (classic magic-number shifts, all long arithmetic)."""
    c = c.bitwiseOR(F.shiftleft(c, 8)).bitwiseAND(F.lit(0x00FF00FF))
    c = c.bitwiseOR(F.shiftleft(c, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    c = c.bitwiseOR(F.shiftleft(c, 2)).bitwiseAND(F.lit(0x33333333))
    c = c.bitwiseOR(F.shiftleft(c, 1)).bitwiseAND(F.lit(0x55555555))
    return c


def _scale16(c: Column, lo: Column, hi: Column) -> Column:
    """Min-max scale to the 16-bit grid, clamped (degenerate range -> 0)."""
    span = hi - lo
    scaled = F.when(span > 0, ((c - lo).cast("double") * 65535.0 / span.cast("double")).cast("long")).otherwise(
        F.lit(0)
    )
    return F.greatest(F.lit(0), F.least(F.lit(65535), scaled))


def zorder_code(x: Column, y: Column, x_lo: Column, x_hi: Column, y_lo: Column, y_hi: Column) -> Column:
    """32-bit Morton code of two numeric columns scaled to a 65536^2 grid."""
    return _spread_bits16(_scale16(x, x_lo, x_hi)).bitwiseOR(
        F.shiftleft(_spread_bits16(_scale16(y, y_lo, y_hi)), 1)
    )


def write_zordered(df: DataFrame, path: str, x_col: str, y_col: str, n_files: int = 8) -> None:
    """Write ``df`` as parquet clustered by the z-order code of (x, y).

    One tiny min/max aggregate (broadcast) + one range repartition on the
    code + a within-partition sort: at 100 TB this is the layout-maintenance
    job you run once so every later 2-D box predicate skips most row groups.
    """
    bounds = df.agg(
        F.min(x_col).alias("xlo"), F.max(x_col).alias("xhi"),
        F.min(y_col).alias("ylo"), F.max(y_col).alias("yhi"),
    )
    code = zorder_code(
        F.col(x_col), F.col(y_col),
        F.col("xlo"), F.col("xhi"), F.col("ylo"), F.col("yhi"),
    )
    (
        df.join(F.broadcast(bounds))
        .withColumn("__z", code)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", "xlo", "xhi", "ylo", "yhi")
        .write.mode("overwrite").parquet(path)
    )


def compact_files(
    spark: SparkSession, path: str, out_path: str, *, target_rows_per_file: int = 1_000_000
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ceil(n/target) files. The lake-maintenance twin of OPTIMIZE: streaming
    ingest (one file per micro-batch per partition) leaves thousands of
    KB-sized files whose open/footer costs dominate scans; compaction pays
    one read+write to restore scan efficiency. Returns the output file
    count. Round-robin repartition (not coalesce): coalesce would chain the
    narrow dependency up the read and skew output sizes to input locality.
    """
    df = spark.read.parquet(path)
    n = df.count()
    n_files = max(1, -(-n // target_rows_per_file))
    df.repartition(n_files).write.mode("overwrite").parquet(out_path)
    return n_files
