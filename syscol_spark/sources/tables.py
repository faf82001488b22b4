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

import os

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


# Parquet can only split between row groups, so a single small file scans as
# ONE task no matter how many cores exist — every downstream expression runs
# single-threaded until the first shuffle. At lake scale inputs are thousands
# of splits and this shim is a no-op (size-guarded); on a small single file
# the round-robin repartition moves only that file's bytes once and unlocks
# full-width execution for compute-heavy per-row work.
#
# Only ``documents`` and ``embeddings`` get this treatment: their queries do
# per-row regex / trigram / shingle / hash / vector-fold work where
# scan-stage width dominates. For the relational tables the single-task scan
# feeds codegen'd aggregates at millions of rows/sec and the extra exchange
# is a pure tax (measured: it added ~0.3-0.5 s to ~60 cheap catalog queries
# while winning nothing).
_FAN_OUT_TABLES = {"documents", "embeddings"}
_FAN_OUT_BYTES = 128 * 1024 * 1024
_fan_out_cache: dict[str, bool] = {}


def _needs_fan_out(path: str) -> bool:
    if path not in _fan_out_cache:
        try:
            if os.path.isdir(path):
                size = sum(
                    os.path.getsize(os.path.join(path, f))
                    for f in os.listdir(path)
                    if not f.startswith(("_", "."))
                )
                n_files = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
            else:
                size, n_files = os.path.getsize(path), 1
        except OSError:
            return False
        # lower bound: broadcast-sized dims gain nothing from 32 near-empty
        # partitions; they are consumed whole (broadcast) anyway
        _fan_out_cache[path] = 256 * 1024 <= size < _FAN_OUT_BYTES and n_files <= 4
    return _fan_out_cache[path]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from syscol_spark.session import ensure_engine_conf

    ensure_engine_conf(spark)  # session may be externally created
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    if name in _FAN_OUT_TABLES and _needs_fan_out(path):
        df = df.repartition(spark.sparkContext.defaultParallelism)
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
