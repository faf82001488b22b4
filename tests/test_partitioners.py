"""FNV-1a partitioner parity (SURVEY.md §2.4 X1): golden vectors + Spark
expression vs pure-python reference implementation."""

from __future__ import annotations

import pyspark.sql.functions as F

from syscol_spark.functions.partitioners import (
    fnv1a_32,
    fnv1a_32_py,
    fnv1a_partition,
    partition_like_reference,
)


def test_fnv1a_golden_vectors():
    # canonical published FNV-1a 32-bit test vectors
    assert fnv1a_32_py(b"") == 2166136261
    assert fnv1a_32_py(b"a") == 0xE40C292C
    assert fnv1a_32_py(b"foobar") == 0xBF9CF968


def test_fnv1a_expression_matches_python(spark):
    keys = ["", "a", "foobar", "slave-20260813-S7", "host-42:5051"]
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    got = {r["k"]: r["h"] for r in df.select("k", fnv1a_32("k").alias("h")).collect()}
    for k in keys:
        assert got[k] == fnv1a_32_py(k.encode()), k


def test_partition_assignment_contract(spark):
    df = spark.createDataFrame([(f"key{i}",) for i in range(100)], ["k"])
    parts = df.select("k", fnv1a_partition("k", 8).alias("p")).collect()
    for r in parts:
        assert 0 <= r["p"] < 8
        assert r["p"] == fnv1a_32_py(r["k"].encode()) % 8
    # keyless → round-robin spread across partitions (X2 contract)
    spread = partition_like_reference(df, None, 8).rdd.glom().map(len).collect()
    assert len(spread) == 8 and all(n > 0 for n in spread)
