"""Property-based fuzz of the pure-Python Avro wire codec + Confluent
framing — hypothesis drives the primitive-type universe through round-trip
and layout invariants (no Spark session; this is the byte-level layer the
executors run inside the Arrow UDFs, so it must hold for arbitrary values,
not just the fixture's).

Reference behavior being pinned: go-kafka-avro/avro_encoder_decoder.go
(Confluent frame = 0x00 magic + BE uint32 schema id + Avro body) over
go-avro's binary codec (zigzag-varint ints, IEEE-LE floats, length-prefixed
utf8/bytes, union = varint branch index + value).
"""

from __future__ import annotations

import math
import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from syscol_spark.functions.confluent import (
    FlatAvroCodec,
    frame_confluent,
    unframe_confluent,
    zigzag_decode,
    zigzag_encode,
)

I32 = st.integers(min_value=-(2**31), max_value=2**31 - 1)
I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
F64 = st.floats(allow_nan=False, width=64)
F32 = st.floats(allow_nan=False, width=32)

SCHEMA = {
    "type": "record",
    "name": "Fuzz",
    "fields": [
        {"name": "b", "type": "boolean"},
        {"name": "i", "type": "int"},
        {"name": "l", "type": "long"},
        {"name": "f", "type": "float"},
        {"name": "d", "type": "double"},
        {"name": "s", "type": "string"},
        {"name": "y", "type": "bytes"},
        {"name": "ol", "type": ["null", "long"]},
        {"name": "os", "type": ["null", "string"]},
    ],
}


@given(I64)
def test_zigzag_round_trip_any_long(v):
    assert zigzag_decode(zigzag_encode(v), 0)[0] == v


@given(st.integers(min_value=0, max_value=2**63 - 1))
def test_zigzag_varint_length_is_minimal(v):
    # zigzag maps magnitude to 2|v|(-1); each varint byte carries 7 bits
    enc = zigzag_encode(v)
    z = 2 * v if v >= 0 else 2 * (-v) - 1
    expect = max(1, math.ceil(z.bit_length() / 7))
    assert len(enc) == expect


@settings(max_examples=200)
@given(
    b=st.booleans(),
    i=I32,
    l=I64,  # noqa: E741
    f=F32,
    d=F64,
    s=st.text(max_size=80),
    y=st.binary(max_size=80),
    ol=st.none() | I64,
    os_=st.none() | st.text(max_size=40),
)
def test_flat_record_round_trip(b, i, l, f, d, s, y, ol, os_):  # noqa: E741
    codec = FlatAvroCodec(SCHEMA)
    rec = {"b": b, "i": i, "l": l, "f": f, "d": d, "s": s, "y": y, "ol": ol, "os": os_}
    out = codec.decode(codec.encode(rec))
    assert out["b"] == b and out["i"] == i and out["l"] == l
    assert out["d"] == d  # doubles exact
    assert out["f"] == struct.unpack("<f", struct.pack("<f", f))[0]  # via f32
    assert out["s"] == s and out["y"] == y
    assert out["ol"] == ol and out["os"] == os_


@settings(max_examples=100)
@given(body=st.binary(max_size=200), sid=st.integers(min_value=0, max_value=2**31 - 1))
def test_confluent_frame_layout_and_round_trip(body, sid):
    framed = frame_confluent(body, sid)
    # byte layout pinned to the reference: 1-byte 0x00 magic + BE uint32 id
    assert framed[0] == 0
    assert framed[1:5] == struct.pack(">I", sid)
    assert framed[5:] == body
    got_sid, got_body = unframe_confluent(framed)
    assert (got_sid, got_body) == (sid, body)
