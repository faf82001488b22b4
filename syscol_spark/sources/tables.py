"""Batch table catalog over the driver-generated parquet corpus.

Tables (TESTDATA.md): trimmed TPC-H star schema + ``events`` (stream-shaped,
ns timestamps, JSON props) + north-star ``documents`` / ``embeddings``.

Scale notes: these are plain parquet scans — Catalyst pushes filters and
prunes columns into the scan (verify with ``.explain``: PushedFilters /
ReadSchema), so the same loaders work unchanged against a 100 TB lake; only
the path changes. ``events.ts`` is TIMESTAMP(NANOS) parquet; the scan dtype
is engine-dependent (int64 under Spark 3.x nanosAsLong, timestamp_ntz under
Spark 4.1+), so ``load_table`` adapts on the scanned schema and derives the
canonical ``ts_ns`` / ``ts_us`` / ``ts_utc`` columns once, in one place.
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


def _local_stats(path: str) -> tuple[int, int] | None:
    """(total bytes, parquet file count) via os.path — schemeless paths."""
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
        return None
    return size, n_files


def _hadoop_stats(spark: SparkSession, path: str) -> tuple[int, int] | None:
    """(total bytes, parquet file count) via the Hadoop FileSystem API, so
    the heuristic also sees object-store paths (s3a://, gs://, file://…) —
    os.path would silently report nothing there and disable the shim."""
    try:
        jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        status = fs.getFileStatus(jpath)
        if not status.isDirectory():
            return int(status.getLen()), 1
        size = n_files = 0
        for s in fs.listStatus(jpath):
            name = s.getPath().getName()
            if name.startswith(("_", ".")):
                continue
            size += int(s.getLen())
            if name.endswith(".parquet"):
                n_files += 1
        return size, n_files
    except Exception:  # noqa: BLE001 — missing path / unreachable store
        return None


def _needs_fan_out(spark: SparkSession, path: str) -> bool:
    if path not in _fan_out_cache:
        stats = _local_stats(path) if "://" not in path else _hadoop_stats(spark, path)
        if stats is None:
            return False
        size, n_files = stats
        # lower bound: broadcast-sized dims gain nothing from 32 near-empty
        # partitions; they are consumed whole (broadcast) anyway
        _fan_out_cache[path] = 256 * 1024 <= size < _FAN_OUT_BYTES and n_files <= 4
    return _fan_out_cache[path]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from syscol_spark.session import ensure_engine_conf

    ensure_engine_conf(spark)  # session may be externally created
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    if name in _FAN_OUT_TABLES and _needs_fan_out(spark, path):
        df = df.repartition(spark.sparkContext.defaultParallelism)
    if name == "events":
        # The parquet column is TIMESTAMP(NANOS). How Spark scans it depends
        # on the engine version:
        #   - Spark ≤3.x with spark.sql.legacy.parquet.nanosAsLong: raw int64
        #     Unix-ns (full fidelity).
        #   - Spark 4.1+: the legacy conf is gone (silently ignored) and the
        #     scan yields timestamp_ntz, already truncated ns→µs.
        # Branch on the scanned dtype so both engines produce the same
        # canonical columns: ts_ns (int64 ns), ts_us (int64 µs), ts_utc
        # (µs TimestampType). All event-time operators and every DuckDB
        # oracle compare at µs (epoch_us), so the µs-truncated ts_ns of the
        # 4.1 branch is hash-identical to `ts_ns div 1000 * 1000` fidelity.
        ts_dtype = dict(df.dtypes)["ts"]
        if ts_dtype == "bigint":
            # NB: integer `div`, not `/` — float division of ~1.7e18 ns
            # values loses sub-µs bits (double has 53-bit mantissa) and
            # drifts ±1 µs from DuckDB's exact epoch_us().
            df = (
                df.withColumnRenamed("ts", "ts_ns")
                .withColumn("ts_us", F.expr("ts_ns div 1000"))
                .withColumn("ts_utc", F.timestamp_micros(F.col("ts_us")))
            )
        elif ts_dtype in ("timestamp_ntz", "timestamp"):
            # UTC session timezone makes the ntz→timestamp cast exact. Keep
            # ts_ns in ts's ordinal slot so both branches yield one schema.
            ts_ns = (F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)).alias("ts_ns")
            df = (
                df.select(*[ts_ns if c == "ts" else F.col(c) for c in df.columns])
                .withColumn("ts_us", F.expr("ts_ns div 1000"))
                .withColumn("ts_utc", F.timestamp_micros(F.col("ts_us")))
            )
        else:  # pragma: no cover - fail loudly on the next silent env change
            raise TypeError(f"events.ts scanned as unsupported dtype {ts_dtype!r}")
        got = dict(df.dtypes)
        expected = {"ts_ns": "bigint", "ts_us": "bigint", "ts_utc": "timestamp"}
        bad = {k: got.get(k) for k, v in expected.items() if got.get(k) != v}
        if bad:  # pragma: no cover
            raise TypeError(f"events canonical time columns wrong: {bad}")
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view so ``spark.sql`` queries work."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
