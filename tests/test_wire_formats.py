"""Wire-format parity tests (SURVEY.md §1.4): envelope JSON and
Confluent-framed Avro, byte-level against the reference layout."""

from __future__ import annotations

import json
import struct

import pyspark.sql.functions as F

from syscol_spark.config import CollectorConfig, parse_producer_properties
from syscol_spark.functions.confluent import (
    MAGIC_BYTE,
    decode_slave_metrics,
    encode_slave_metrics,
    frame_confluent,
    from_confluent_avro,
    to_confluent_avro,
    unframe_confluent,
    zigzag_decode,
    zigzag_encode,
)
from syscol_spark.functions.envelope import (
    ENVELOPE_SCHEMA,
    enrich_envelope,
    envelope_to_json,
    parse_envelope_json,
)


def test_zigzag_golden_values():
    # golden values straight from the Avro spec's binary-encoding table
    assert zigzag_encode(0) == b"\x00"
    assert zigzag_encode(-1) == b"\x01"
    assert zigzag_encode(1) == b"\x02"
    assert zigzag_encode(-2) == b"\x03"
    assert zigzag_encode(2) == b"\x04"
    assert zigzag_encode(-64) == b"\x7f"
    assert zigzag_encode(64) == b"\x80\x01"
    for n in (0, 1, -1, 5051, -5051, 2**40, -(2**40), 1704067798778549829):
        buf = zigzag_encode(n)
        val, pos = zigzag_decode(buf, 0)
        assert (val, pos) == (n, len(buf))


def test_avro_body_layout():
    metrics = json.dumps({"slave/cpus_total": 4.0}, separators=(",", ":")).encode()
    body = encode_slave_metrics("S7", "node-1", 5051, "", 123456789, metrics)
    # field order per avsc: slave_id, hostname, port, namespace, timestamp, metrics
    assert body.startswith(zigzag_encode(2) + b"S7" + zigzag_encode(6) + b"node-1")
    decoded = decode_slave_metrics(body)
    assert decoded == {
        "slave_id": "S7",
        "hostname": "node-1",
        "port": 5051,
        "namespace": "",
        "timestamp": 123456789,
        "metrics": metrics,
    }


def test_confluent_frame_layout():
    framed = frame_confluent(b"BODY", 42)
    # magic 0x00 + int32 BE schema id (go-kafka-avro/avro_encoder_decoder.go:62-66)
    assert framed[0:1] == MAGIC_BYTE == b"\x00"
    assert framed[1:5] == struct.pack(">I", 42) == b"\x00\x00\x00\x2a"
    assert framed[5:] == b"BODY"
    assert unframe_confluent(framed) == (42, b"BODY")


def test_envelope_json_round_trip(spark):
    df = spark.createDataFrame(
        [("S1", "h1", 5051, "ns", 1704067798778549829, {"m/a": 1.5, "m/b": 2.0})],
        ENVELOPE_SCHEMA,
    )
    env = enrich_envelope(
        F.col("Metrics"), slave_id=F.col("SlaveID"), hostname=F.col("Hostname"),
        port=F.col("Port"), namespace=F.col("Namespace"), timestamp_ns=F.col("Timestamp"),
    )
    j = df.select(envelope_to_json(env).alias("value"))
    [row] = j.collect()
    parsed = json.loads(row["value"])
    assert parsed["SlaveID"] == "S1"
    assert parsed["Timestamp"] == 1704067798778549829  # ns fidelity preserved
    assert parsed["Metrics"] == {"m/a": 1.5, "m/b": 2.0}
    [back] = j.select(parse_envelope_json(F.col("value")).alias("e")).select("e.*").collect()
    assert back["SlaveID"] == "S1" and back["Metrics"]["m/a"] == 1.5


def test_confluent_avro_spark_round_trip(spark):
    df = spark.createDataFrame(
        [("S1", "h1", 5051, "", 1704067798778549829, {"m": 1.5})], ENVELOPE_SCHEMA
    )
    env = enrich_envelope(
        F.col("Metrics"), slave_id=F.col("SlaveID"), hostname=F.col("Hostname"),
        port=F.col("Port"), namespace=F.col("Namespace"), timestamp_ns=F.col("Timestamp"),
    )
    framed = df.select(to_confluent_avro(env, schema_id=1).alias("value"))
    [row] = framed.collect()
    assert bytes(row["value"])[0:5] == b"\x00\x00\x00\x00\x01"  # pinned id=1
    back = framed.select(
        F.from_json(from_confluent_avro(F.col("value")), ENVELOPE_SCHEMA).alias("e")
    ).select("e.*")
    [b] = back.collect()
    assert b["SlaveID"] == "S1"
    assert b["Timestamp"] == 1704067798778549829
    assert b["Metrics"] == {"m": 1.5}


def test_config_gates(tmp_path):
    c = CollectorConfig()
    assert c.can_start()[0] is False  # no props
    props = tmp_path / "p.properties"
    props.write_text("bootstrap.servers=localhost:9092\nbatch.size=1000\n# comment\n")
    c = CollectorConfig(producer_properties=str(props), topic="metrics")
    assert c.can_start() == (True, "")
    c2 = CollectorConfig(producer_properties=str(props), topic="t", transform="avro")
    assert c2.can_start()[0] is False  # avro needs registry url
    assert parse_producer_properties(str(props)) == {
        "bootstrap.servers": "localhost:9092",
        "batch.size": "1000",
    }
    rt = CollectorConfig.from_json(c.to_json())
    assert rt == c
