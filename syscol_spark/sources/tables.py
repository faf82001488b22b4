"""Batch table catalog over the driver-generated parquet corpus.

Tables (TESTDATA.md): trimmed TPC-H star schema + ``events`` (stream-shaped,
ns timestamps, JSON props) + north-star ``documents`` / ``embeddings``.

Scale notes: these are plain parquet scans — Catalyst pushes filters and
prunes columns into the scan (verify with ``.explain``: PushedFilters /
ReadSchema), so the same loaders work unchanged against a 100 TB lake; only
the path changes. ``events.ts`` arrives as raw int64 nanoseconds (see
session.py); ``ts_utc`` (µs TimestampType) is derived here once so every
event-time operator shares one definition of the ns→µs truncation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from syscol_spark.session import ensure_engine_conf

    ensure_engine_conf(spark)  # session may be externally created
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # ts is int64 Unix-ns (nanosAsLong). Keep full fidelity in ts_ns and
        # derive the µs TimestampType column event-time operators use.
        # DuckDB (the oracle) truncates ns→µs the same way.
        # NB: integer `div`, not `/` — float division of ~1.7e18 ns values
        # loses sub-µs bits (double has 53-bit mantissa) and drifts ±1 µs
        # from DuckDB's exact epoch_us().
        df = (
            df.withColumnRenamed("ts", "ts_ns")
            .withColumn("ts_us", F.expr("ts_ns div 1000"))
            .withColumn("ts_utc", F.timestamp_micros(F.col("ts_us")))
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view so ``spark.sql`` queries work."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
