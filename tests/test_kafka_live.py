"""Live-Kafka end-to-end test of the produce path (K1-K5) — the one leg the
container cannot exercise (no broker, no spark-sql-kafka connector; the
in-repo tests prove the same bytes through the parquet fallback transport).

Activates only when BOTH hold (otherwise skips, so CI in this container is
unaffected):
  * SYSCOL_KAFKA_BOOTSTRAP points at a reachable broker
    (scripts/kafka_harness/docker-compose.yml provides one), and
  * the spark-sql-kafka connector is on the classpath
    (--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<version>).

What it proves when live: the streaming writer really produces to a topic,
frames are byte-identical to the fallback transport's (same serialized_value
column), and the Confluent-framed Avro round-trips through
parse_serialized_stream — closing the produce loop the reference runs via
siesta-producer (kafka_producer.go:219-262).
"""

from __future__ import annotations

import os
import time
import uuid

import pyspark.sql.functions as F
import pytest


def _kafka_ready(spark) -> bool:
    from syscol_spark.streaming.pipeline import kafka_sink_available

    return bool(os.environ.get("SYSCOL_KAFKA_BOOTSTRAP")) and kafka_sink_available(spark)


@pytest.fixture()
def bootstrap(spark):
    if not _kafka_ready(spark):
        pytest.skip("no live broker/connector (set SYSCOL_KAFKA_BOOTSTRAP + --packages spark-sql-kafka)")
    return os.environ["SYSCOL_KAFKA_BOOTSTRAP"]


@pytest.mark.parametrize("transform", ["none", "avro"])
def test_produce_consume_round_trip(spark, tmp_path, bootstrap, transform):
    from syscol_spark.config import CollectorConfig
    from syscol_spark.functions.envelope import ENVELOPE_SCHEMA, enrich_envelope
    from syscol_spark.streaming.analytics import long_view, parse_serialized_stream
    from syscol_spark.streaming.pipeline import serialized_value

    topic = f"syscol-e2e-{uuid.uuid4().hex[:8]}"
    cfg = CollectorConfig(transform=transform, schema_registry_url="http://127.0.0.1:8081")

    rows = [
        ("S1", "h1", 5051, "ns", 1_704_067_200_000_000_000 + i * 10**9, {"m/a": float(i)})
        for i in range(20)
    ]
    env = spark.createDataFrame(rows, ENVELOPE_SCHEMA).select(
        enrich_envelope(
            F.col("Metrics"), slave_id=F.col("SlaveID"), hostname=F.col("Hostname"),
            port=F.col("Port"), namespace=F.col("Namespace"), timestamp_ns=F.col("Timestamp"),
        ).alias("envelope")
    )
    wire = env.select(
        F.col("envelope.SlaveID").cast("binary").alias("key"),
        serialized_value(F.col("envelope"), cfg).alias("value"),
    )
    # batch produce (same sink options as the streaming writer)
    (
        wire.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .save()
    )
    # consume back and parse through the SAME consumer path the streaming
    # twin uses; retry briefly for broker visibility
    deadline = time.time() + 30
    got = []
    while time.time() < deadline and len(got) < len(rows):
        raw = (
            spark.read.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap)
            .option("subscribe", topic)
            .option("startingOffsets", "earliest")
            .load()
        )
        got = long_view(parse_serialized_stream(raw, transform=transform)).collect()
        if len(got) < len(rows):
            time.sleep(1)
    assert len(got) == len(rows)
    by_ts = {r["ts_ns"]: r["value"] for r in got}
    assert by_ts[1_704_067_200_000_000_000 + 7 * 10**9] == 7.0
