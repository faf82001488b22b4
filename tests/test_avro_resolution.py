"""Avro schema resolution (reader vs writer evolution) — the registry-
consumer path: data written with an older schema read through a newer one.
Spec: Avro 1.11 "Schema Resolution" (public). The reference's vendored
decoder has no resolution layer; this is a documented superset."""

from __future__ import annotations

import pytest

from syscol_spark.functions.confluent import (
    AvroResolver,
    AvroSchemaResolutionError,
    codec_for,
    decode_resolved,
)

WRITER = {
    "type": "record",
    "name": "Env",
    "fields": [
        {"name": "host", "type": "string"},
        {"name": "port", "type": "int"},
        {"name": "metrics", "type": {"type": "map", "values": "double"}},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "status", "type": {"type": "enum", "name": "St", "symbols": ["OK", "DEAD"]}},
        {"name": "note", "type": ["null", "string"]},
    ],
}

READER = {
    "type": "record",
    "name": "Env",
    "fields": [
        {"name": "host", "type": "string"},
        {"name": "port", "type": "long"},                      # int -> long promotion
        {"name": "metrics", "type": {"type": "map", "values": "double"}},
        # "tags" dropped by the reader
        {"name": "status", "type": {"type": "enum", "name": "St",
                                    "symbols": ["OK", "RETIRED"], "default": "RETIRED"}},
        {"name": "note", "type": ["null", "string"]},
        {"name": "region", "type": "string", "default": "unknown"},   # added with default
        {"name": "weight", "type": "double", "default": 1.0},
    ],
}

RECORD = {
    "host": "h1",
    "port": 5051,
    "metrics": {"cpu": 0.5},
    "tags": ["a", "b"],
    "status": "DEAD",
    "note": None,
}


def test_full_evolution_round_trip():
    body = codec_for(WRITER).encode(RECORD)
    got = decode_resolved(body, WRITER, READER)
    assert got == {
        "host": "h1",
        "port": 5051,
        "metrics": {"cpu": 0.5},
        "status": "RETIRED",        # unknown to reader -> enum default
        "note": None,
        "region": "unknown",        # reader-only -> field default
        "weight": 1.0,
    }


def test_numeric_and_bytes_promotions():
    r = AvroResolver("int", "double")
    assert r.project(5) == 5.0 and isinstance(r.project(5), float)
    assert AvroResolver("string", "bytes").project("hi") == b"hi"
    assert AvroResolver("bytes", "string").project(b"hi") == "hi"
    with pytest.raises(AvroSchemaResolutionError):
        AvroResolver("double", "int").project(1.5)


def test_reader_union_accepts_writer_nonunion():
    assert AvroResolver("int", ["null", "long"]).project(7) == 7


def test_writer_union_branch_resolves():
    r = AvroResolver(["null", "int"], "double")
    assert r.project(3) == 3.0
    assert AvroResolver(["null", "int"], ["null", "double"]).project(None) is None


def test_missing_field_without_default_raises():
    reader = {
        "type": "record", "name": "Env",
        "fields": [{"name": "absent", "type": "string"}],
    }
    with pytest.raises(AvroSchemaResolutionError):
        AvroResolver(WRITER, reader).project(RECORD)


def test_nested_record_evolution():
    w = {"type": "record", "name": "O", "fields": [
        {"name": "inner", "type": {"type": "record", "name": "I", "fields": [
            {"name": "x", "type": "int"}]}}]}
    r = {"type": "record", "name": "O", "fields": [
        {"name": "inner", "type": {"type": "record", "name": "I", "fields": [
            {"name": "x", "type": "long"},
            {"name": "y", "type": "string", "default": "d"}]}}]}
    assert AvroResolver(w, r).project({"inner": {"x": 1}}) == {"inner": {"x": 1, "y": "d"}}
