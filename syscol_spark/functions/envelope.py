"""Envelope data model + JSON wire format (reference parity).

The reference envelope is SlaveMetrics{SlaveID, Hostname, Port, Namespace,
Timestamp(ns), Metrics} (/root/reference/syscol/metrics_reporter.go:33-40;
avro schema avro/slave_metrics.avsc:1-30). transform=none serializes it as a
single JSON object with the metrics nested (metrics_reporter.go:133-149).

All expressions here are JVM-side built-ins (to_json/from_json/struct) —
the serialization path stays in whole-stage codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# Canonical envelope schema (FIXTURES.md A1). Timestamp is Unix NANOSECONDS
# (metrics_reporter.go:139) — kept as long for full fidelity; ts_utc derived.
ENVELOPE_SCHEMA = StructType(
    [
        StructField("SlaveID", StringType(), False),
        StructField("Hostname", StringType(), False),
        StructField("Port", IntegerType(), False),
        StructField("Namespace", StringType(), True),
        StructField("Timestamp", LongType(), False),
        StructField("Metrics", MapType(StringType(), DoubleType()), False),
    ]
)

ENVELOPE_FIELDS = [f.name for f in ENVELOPE_SCHEMA.fields]


def enrich_envelope(
    metrics: Column,
    *,
    slave_id: Column | str,
    hostname: Column | str,
    port: Column | int,
    namespace: Column | str,
    timestamp_ns: Column,
) -> Column:
    """P1 envelope enrichment (metrics_reporter.go:133-148): attach identity
    + capture timestamp to a metrics map column.

    ``timestamp_ns`` is REQUIRED: the reference stamps per-scrape
    (time.Now().UnixNano()), and the scrape source supplies that column. A
    current_timestamp() default would be a trap — Spark evaluates it once
    per QUERY, not per record, silently giving every row in a batch the
    same stamp."""
    ts = timestamp_ns
    lit = lambda v: v if isinstance(v, Column) else F.lit(v)  # noqa: E731
    return F.struct(
        lit(slave_id).cast("string").alias("SlaveID"),
        lit(hostname).cast("string").alias("Hostname"),
        lit(port).cast("int").alias("Port"),
        lit(namespace).cast("string").alias("Namespace"),
        ts.cast("long").alias("Timestamp"),
        metrics.alias("Metrics"),
    )


def envelope_to_json(envelope: Column) -> Column:
    """P2 transform=none: envelope struct → JSON string with nested metrics
    object (metrics_reporter.go:133-149)."""
    return F.to_json(envelope)


def parse_envelope_json(value: Column) -> Column:
    """Read path: JSON string → typed envelope struct."""
    return F.from_json(value, ENVELOPE_SCHEMA)


def explode_envelope(df: DataFrame, envelope_col: str = "envelope") -> DataFrame:
    """Canonical long/narrow analytics view (SURVEY.md §1.5 / FIXTURES A4):
    one row per (envelope, metric) with µs timestamp + ns fidelity column."""
    e = F.col(envelope_col)
    return df.select(
        F.timestamp_micros(F.expr(f"{envelope_col}.Timestamp div 1000")).alias("ts"),
        e["Timestamp"].alias("ts_ns"),
        e["SlaveID"].alias("slave_id"),
        e["Hostname"].alias("hostname"),
        e["Namespace"].alias("namespace"),
        F.explode(e["Metrics"]).alias("metric", "value"),
    )
