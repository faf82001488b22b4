"""Confluent-framed Avro wire format (P3) + schema-registry client (§2.9).

Wire layout (reference: go-kafka-avro/avro_encoder_decoder.go:50-79):

    [0x00 magic][int32 big-endian schema id][avro binary body]

Body: the SlaveMetrics record in Avro binary per the embedded schema
(/root/reference/avro/slave_metrics.avsc) — field order SlaveID, Hostname,
Port, Namespace, Timestamp, Metrics; the Metrics field is *bytes containing
JSON* of the map (metrics_reporter.go:151-165), i.e. the Avro schema does
not describe individual metrics.

No Avro library ships in this environment, and Spark's to_avro/from_avro
(external spark-avro module) are not on the classpath — so the codec is
implemented directly from the Avro 1.x binary spec (zigzag-varint ints,
length-prefixed utf8/bytes), which for this flat record is ~40 lines and
byte-exact. Exposed as Arrow-batched pandas UDFs: the envelope JSON is
produced JVM-side (to_json), only the final byte framing crosses to Python
in Arrow batches.
"""

from __future__ import annotations

import json
import struct
from functools import lru_cache

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column
from pyspark.sql.types import BinaryType, StringType

MAGIC_BYTE = b"\x00"  # avro_encoder_decoder.go:26

# Embedded envelope schema, identical content to
# /root/reference/avro/slave_metrics.go:28-58 (codegen'd constant there).
SLAVE_METRICS_AVSC = {
    "type": "record",
    "namespace": "net.elodina.syscol.avro",
    "name": "SlaveMetrics",
    "fields": [
        {"name": "slave_id", "type": "string"},
        {"name": "hostname", "type": "string"},
        {"name": "port", "type": "int"},
        {"name": "namespace", "type": "string"},
        {"name": "timestamp", "type": "long"},
        {"name": "metrics", "type": "bytes"},
    ],
}


# --- Avro binary primitives (Avro spec §binary encoding) --------------------

def zigzag_encode(n: int) -> bytes:
    """Avro int/long: zigzag then base-128 varint, little-endian groups."""
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _enc_str(s: str) -> bytes:
    raw = s.encode("utf-8")
    return zigzag_encode(len(raw)) + raw


def _enc_bytes(b: bytes) -> bytes:
    return zigzag_encode(len(b)) + b


def encode_slave_metrics(
    slave_id: str, hostname: str, port: int, namespace: str, timestamp: int, metrics_json: bytes
) -> bytes:
    """Avro-binary body of one SlaveMetrics record (schema field order)."""
    return b"".join(
        [
            _enc_str(slave_id),
            _enc_str(hostname),
            zigzag_encode(port),
            _enc_str(namespace or ""),
            zigzag_encode(timestamp),
            _enc_bytes(metrics_json),
        ]
    )


def decode_slave_metrics(body: bytes) -> dict:
    pos = 0
    out = {}
    for name in ("slave_id", "hostname"):
        n, pos = zigzag_decode(body, pos)
        out[name] = body[pos : pos + n].decode("utf-8")
        pos += n
    out["port"], pos = zigzag_decode(body, pos)
    n, pos = zigzag_decode(body, pos)
    out["namespace"] = body[pos : pos + n].decode("utf-8")
    pos += n
    out["timestamp"], pos = zigzag_decode(body, pos)
    n, pos = zigzag_decode(body, pos)
    out["metrics"] = body[pos : pos + n]
    return out


def frame_confluent(body: bytes, schema_id: int) -> bytes:
    """magic 0x00 + BE int32 schema id + body (avro_encoder_decoder.go:62-66)."""
    return MAGIC_BYTE + struct.pack(">I", schema_id) + body


def unframe_confluent(msg: bytes) -> tuple[int, bytes]:
    if not msg or msg[0:1] != MAGIC_BYTE:
        raise ValueError("not Confluent-framed: bad magic byte")
    (schema_id,) = struct.unpack(">I", msg[1:5])
    return schema_id, msg[5:]


# --- Spark column helpers ----------------------------------------------------

def to_confluent_avro(envelope: Column, schema_id: int) -> Column:
    """Envelope struct column → Confluent-framed Avro binary column.

    The schema id is resolved ONCE at plan time via the registry client
    (register_envelope_schema) — the reference caches it the same way
    (schema_registry.go:100-113)."""

    @F.pandas_udf(BinaryType())
    def _encode(js: pd.Series) -> pd.Series:
        def one(j: str) -> bytes:
            d = json.loads(j)
            metrics_json = json.dumps(d.get("Metrics") or {}, separators=(",", ":")).encode()
            body = encode_slave_metrics(
                d["SlaveID"], d["Hostname"], int(d["Port"]), d.get("Namespace") or "",
                int(d["Timestamp"]), metrics_json,
            )
            return frame_confluent(body, schema_id)

        return js.map(one)

    return _encode(F.to_json(envelope))


def from_confluent_avro(value: Column) -> Column:
    """Confluent-framed binary → JSON string of the envelope (parse with
    from_json(ENVELOPE_SCHEMA) downstream).

    Malformed frames decode to NULL — matching from_json's null-on-malformed
    semantics — so one corrupt record cannot fail a 100 TB batch (same
    tolerance philosophy as the scrape path, S3)."""

    @F.pandas_udf(StringType())
    def _decode(vs: pd.Series) -> pd.Series:
        def one(v: bytes | None) -> str | None:
            if v is None:
                return None
            try:
                _, body = unframe_confluent(bytes(v))
                d = decode_slave_metrics(body)
                return json.dumps(
                    {
                        "SlaveID": d["slave_id"],
                        "Hostname": d["hostname"],
                        "Port": d["port"],
                        "Namespace": d["namespace"],
                        "Timestamp": d["timestamp"],
                        "Metrics": json.loads(d["metrics"].decode("utf-8") or "{}"),
                    }
                )
            except Exception:  # noqa: BLE001 — corrupt frame → null row
                return None

        return vs.map(one)

    return _decode(value)


# --- schema registry client (§2.9) ------------------------------------------

class ConfluentRegistryClient:
    """Minimal Confluent schema-registry REST client with the same caching
    contract as the reference (go-kafka-avro/schema_registry.go:30-113:
    register / get-by-id / get-latest, id+schema caches). Used at PLAN time
    only — never inside a task."""

    def __init__(self, base_url: str):
        self.base_url = base_url.rstrip("/")
        self._id_by_subject: dict[str, int] = {}
        self._schema_by_id: dict[int, str] = {}

    def register(self, subject: str, schema: dict) -> int:
        if subject in self._id_by_subject:
            return self._id_by_subject[subject]
        import urllib.request

        req = urllib.request.Request(
            f"{self.base_url}/subjects/{subject}/versions",
            data=json.dumps({"schema": json.dumps(schema)}).encode(),
            headers={"Content-Type": "application/vnd.schemaregistry.v1+json"},
            method="POST",
        )
        with urllib.request.urlopen(req) as resp:  # noqa: S310
            schema_id = json.loads(resp.read())["id"]
        self._id_by_subject[subject] = schema_id
        return schema_id

    @lru_cache(maxsize=256)  # noqa: B019
    def get_by_id(self, schema_id: int) -> str:
        import urllib.request

        with urllib.request.urlopen(f"{self.base_url}/schemas/ids/{schema_id}") as resp:  # noqa: S310
            return json.loads(resp.read())["schema"]


def register_envelope_schema(registry_url: str, record_name: str = "SlaveMetrics") -> int:
    """Register the envelope schema under ``<record-name>-value`` (the
    reference's subject naming, avro_encoder_decoder.go:56-60) and return the
    id. Falls back to id=1 when no registry is reachable (fixture pin,
    FIXTURES.md A2)."""
    try:
        return ConfluentRegistryClient(registry_url).register(f"{record_name}-value", SLAVE_METRICS_AVSC)
    except Exception:  # noqa: BLE001 — no registry in test env
        return 1
