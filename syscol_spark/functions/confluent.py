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
from typing import NamedTuple

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column
from pyspark.sql.types import BinaryType, StringType

MAGIC_BYTE = b"\x00"  # avro_encoder_decoder.go:26

# Embedded envelope schema — the EXACT reference schema (field names and
# namespace from /root/reference/avro/slave_metrics.go:25-58, codegen'd from
# avro/slave_metrics.avsc): registering it yields the same subject content as
# the reference producer, and generic by-id decoders see identical field
# names. (Avro binary bodies are name-independent, but registry identity is
# not.)
SLAVE_METRICS_AVSC = {
    "type": "record",
    "namespace": "avro",
    "name": "SlaveMetrics",
    "fields": [
        {"name": "SlaveID", "type": "string"},
        {"name": "Hostname", "type": "string"},
        {"name": "Port", "type": "int"},
        {"name": "Namespace", "type": "string"},
        {"name": "Timestamp", "type": "long"},
        {"name": "Metrics", "type": "bytes"},
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


class FlatAvroCodec:
    """Generic Avro binary codec for FLAT record schemas.

    Covers the primitive type universe of the reference's vendored decoder
    (go-kafka-avro/avro_encoder_decoder.go:127-170 over go-avro's
    schema.go:11-26): null, boolean, int, long, float, double, bytes,
    string — plus optional-field unions ``["null", <primitive>]``. Nested
    records/arrays/maps/enums are out of scope for the wire path (the
    reference's only production record is flat; nested payloads travel as
    JSON-in-bytes, same as its Metrics field).

    Implemented directly from the Avro 1.x binary spec: zigzag-varint
    int/long, IEEE little-endian float/double, length-prefixed utf8/bytes,
    union = varint branch index + branch value.
    """

    def __init__(self, schema: dict):
        if schema.get("type") != "record":
            raise ValueError("FlatAvroCodec needs a record schema")
        self.name = schema["name"]
        self.fields: list[tuple[str, object]] = []
        for f in schema["fields"]:
            t = f["type"]
            if isinstance(t, list):
                if len(t) != 2 or "null" not in t:
                    raise ValueError(f"field {f['name']}: only [null, primitive] unions supported")
            elif t not in ("null", "boolean", "int", "long", "float", "double", "bytes", "string"):
                raise ValueError(f"field {f['name']}: unsupported type {t!r} (flat records only)")
            self.fields.append((f["name"], t))

    @staticmethod
    def _enc_value(t: str, v: object) -> bytes:
        if t == "null":
            return b""
        if t == "boolean":
            return b"\x01" if v else b"\x00"
        if t in ("int", "long"):
            return zigzag_encode(int(v))
        if t == "float":
            return struct.pack("<f", float(v))
        if t == "double":
            return struct.pack("<d", float(v))
        if t == "bytes":
            return _enc_bytes(bytes(v))
        if t == "string":
            return _enc_str(str(v))
        raise ValueError(f"unsupported type {t!r}")

    @staticmethod
    def _dec_value(t: str, buf: bytes, pos: int) -> tuple[object, int]:
        if t == "null":
            return None, pos
        if t == "boolean":
            return buf[pos] != 0, pos + 1
        if t in ("int", "long"):
            return zigzag_decode(buf, pos)
        if t == "float":
            return struct.unpack_from("<f", buf, pos)[0], pos + 4
        if t == "double":
            return struct.unpack_from("<d", buf, pos)[0], pos + 8
        if t in ("bytes", "string"):
            n, pos = zigzag_decode(buf, pos)
            raw = buf[pos : pos + n]
            return (raw.decode("utf-8") if t == "string" else raw), pos + n
        raise ValueError(f"unsupported type {t!r}")

    def encode(self, record: dict) -> bytes:
        out = []
        for name, t in self.fields:
            v = record.get(name)
            if isinstance(t, list):  # [null, primitive] union
                branch = t.index("null") if v is None else 1 - t.index("null")
                out.append(zigzag_encode(branch))
                out.append(self._enc_value(t[branch], v))
            else:
                out.append(self._enc_value(t, v))
        return b"".join(out)

    def decode(self, body: bytes) -> dict:
        pos = 0
        out = {}
        for name, t in self.fields:
            if isinstance(t, list):
                branch, pos = zigzag_decode(body, pos)
                out[name], pos = self._dec_value(t[branch], body, pos)
            else:
                out[name], pos = self._dec_value(t, body, pos)
        return out


_ENVELOPE_CODEC = FlatAvroCodec(SLAVE_METRICS_AVSC)


def encode_slave_metrics(
    slave_id: str, hostname: str, port: int, namespace: str, timestamp: int, metrics_json: bytes
) -> bytes:
    """Avro-binary body of one SlaveMetrics record (schema field order)."""
    return _ENVELOPE_CODEC.encode(
        {
            "SlaveID": slave_id,
            "Hostname": hostname,
            "Port": port,
            "Namespace": namespace or "",
            "Timestamp": timestamp,
            "Metrics": metrics_json,
        }
    )


def decode_slave_metrics(body: bytes) -> dict:
    """Decode one SlaveMetrics body; keys = reference schema field names."""
    return _ENVELOPE_CODEC.decode(body)


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
                d["Metrics"] = json.loads(d["Metrics"].decode("utf-8") or "{}")
                return json.dumps(d)
            except Exception:  # noqa: BLE001 — corrupt frame → null row
                return None

        return vs.map(one)

    return _decode(value)


def from_confluent_avro_generic(value: Column, schemas_by_id: dict[int, dict]) -> Column:
    """Generic Confluent read path: framed binary → JSON string, dispatching
    on the frame's schema id against a plan-time-resolved ``{id: schema}``
    map (populate it with ``ConfluentRegistryClient.get_by_id`` — the same
    cached-by-id flow as the reference's vendored decoder,
    go-kafka-avro/avro_encoder_decoder.go:127-170). Resolution happens ONCE
    on the driver; executors only run the pure codec — no registry calls in
    the hot path. Unknown ids and corrupt frames decode to NULL (the same
    tolerance as from_json on malformed input).

    ``bytes`` fields are emitted as latin-1-mapped strings in the JSON (a
    lossless byte↔codepoint mapping) since JSON has no binary type; parse
    with from_json downstream using a matching schema.
    """
    codecs = {sid: FlatAvroCodec(s) for sid, s in schemas_by_id.items()}

    @F.pandas_udf(StringType())
    def _decode(vs: pd.Series) -> pd.Series:
        def one(v: bytes | None) -> str | None:
            if v is None:
                return None
            try:
                sid, body = unframe_confluent(bytes(v))
                codec = codecs.get(sid)
                if codec is None:
                    return None
                d = codec.decode(body)
                d = {k: (v2.decode("latin-1") if isinstance(v2, bytes) else v2) for k, v2 in d.items()}
                return json.dumps(d)
            except Exception:  # noqa: BLE001 — corrupt frame → null row
                return None

        return vs.map(one)

    return _decode(value)


def to_confluent_avro_generic(record: Column, schema: dict, schema_id: int) -> Column:
    """Generic write path: a struct column whose field names match the flat
    Avro ``schema`` → Confluent-framed binary. The struct is serialized
    JVM-side (to_json); only byte framing crosses to Python, Arrow-batched."""
    codec = FlatAvroCodec(schema)

    @F.pandas_udf(BinaryType())
    def _encode(js: pd.Series) -> pd.Series:
        def one(j: str) -> bytes:
            d = json.loads(j)
            rec = {}
            for name, t in codec.fields:
                v = d.get(name)
                if t == "bytes" and isinstance(v, str):
                    v = v.encode("latin-1")
                rec[name] = v
            return frame_confluent(codec.encode(rec), schema_id)

        return js.map(one)

    return _encode(F.to_json(record))


# --- schema registry client (§2.9) ------------------------------------------

class SchemaMetadata(NamedTuple):
    """(id, version, schema) triple returned by the latest-version endpoint —
    mirrors the reference's SchemaMetadata (schema_registry.go:48-52)."""

    id: int
    version: int
    schema: str


class ConfluentRegistryClient:
    """Confluent schema-registry REST client with the same caching contract
    as the reference (go-kafka-avro/schema_registry.go:100-113,230):
    three cache levels —

    * ``schema cache``  subject → canonical-schema → id   (register)
    * ``id cache``      id → schema string                (get_by_id; also
      warmed by register, so a round-trip through one's own registration
      never re-fetches)
    * ``version cache`` subject → canonical-schema → version (get_version)

    ``get_latest`` is deliberately UNcached — "latest" is a moving target
    (the reference's GetLatestSchemaMetadata also always fetches,
    schema_registry.go:182-204). Used at PLAN time only — never inside a
    task; executors see resolved ``{id: schema}`` maps."""

    def __init__(self, base_url: str):
        self.base_url = base_url.rstrip("/")
        self._id_by_subject_schema: dict[str, dict[str, int]] = {}
        self._schema_by_id: dict[int, str] = {}
        self._version_by_subject_schema: dict[str, dict[str, int]] = {}

    @staticmethod
    def _canon(schema: dict | str) -> str:
        """Canonical cache key for a schema (dict order must not miss)."""
        if isinstance(schema, str):
            schema = json.loads(schema)
        return json.dumps(schema, sort_keys=True, separators=(",", ":"))

    def _request(self, path: str, payload: dict | None = None) -> dict:
        import urllib.request

        req = urllib.request.Request(
            f"{self.base_url}{path}",
            data=json.dumps(payload).encode() if payload is not None else None,
            headers={"Content-Type": "application/vnd.schemaregistry.v1+json"},
            method="POST" if payload is not None else "GET",
        )
        with urllib.request.urlopen(req) as resp:  # noqa: S310
            return json.loads(resp.read())

    def register(self, subject: str, schema: dict) -> int:
        key = self._canon(schema)
        cached = self._id_by_subject_schema.setdefault(subject, {})
        if key in cached:
            return cached[key]
        schema_id = self._request(
            f"/subjects/{subject}/versions", {"schema": json.dumps(schema)}
        )["id"]
        cached[key] = schema_id
        # warm the id cache too (reference does, schema_registry.go:143-144)
        self._schema_by_id[schema_id] = json.dumps(schema)
        return schema_id

    def get_by_id(self, schema_id: int) -> str:
        if schema_id in self._schema_by_id:
            return self._schema_by_id[schema_id]
        schema = self._request(f"/schemas/ids/{schema_id}")["schema"]
        self._schema_by_id[schema_id] = schema
        return schema

    def get_latest(self, subject: str) -> SchemaMetadata:
        """Latest version's (id, version, schema) for a subject. Never
        cached: a consumer of an evolving topic polls this to pick up new
        versions (reference GetLatestSchemaMetadata)."""
        d = self._request(f"/subjects/{subject}/versions/latest")
        return SchemaMetadata(int(d["id"]), int(d["version"]), d["schema"])

    def get_by_version(self, subject: str, version: int) -> SchemaMetadata:
        """A specific version's (id, version, schema) for a subject
        (reference GET_SPECIFIC_SUBJECT_VERSION route)."""
        d = self._request(f"/subjects/{subject}/versions/{version}")
        return SchemaMetadata(int(d["id"]), int(d["version"]), d["schema"])

    def get_version(self, subject: str, schema: dict) -> int:
        """Version under which ``schema`` is registered for ``subject``,
        via the check-is-registered POST (reference GetVersion,
        schema_registry.go:206-240) — cached per (subject, schema)."""
        key = self._canon(schema)
        cached = self._version_by_subject_schema.setdefault(subject, {})
        if key in cached:
            return cached[key]
        version = int(
            self._request(f"/subjects/{subject}", {"schema": json.dumps(schema)})["version"]
        )
        cached[key] = version
        return version


def register_envelope_schema(registry_url: str, record_name: str = "SlaveMetrics") -> int:
    """Register the envelope schema under ``<record-name>-value`` (the
    reference's subject naming, avro_encoder_decoder.go:56-60) and return the
    id. Falls back to id=1 when no registry is reachable (fixture pin,
    FIXTURES.md A2)."""
    try:
        return ConfluentRegistryClient(registry_url).register(f"{record_name}-value", SLAVE_METRICS_AVSC)
    except Exception:  # noqa: BLE001 — no registry in test env
        return 1
