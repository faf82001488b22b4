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


def test_manual_partition_places_rows_exactly(spark):
    """X3 golden test: each row lands in the Spark partition its explicit
    partition column names (mod n), like the reference's explicit branch."""
    import pyspark.sql.functions as F

    from syscol_spark.functions.partitioners import manual_partition

    df = spark.createDataFrame([(i, i % 7, f"v{i}") for i in range(100)], ["id", "p", "val"])
    placed = manual_partition(df, "p", 5)
    rows = placed.select("id", "p", F.spark_partition_id().alias("pid")).collect()
    assert len(rows) == 100
    for r in rows:
        assert r["pid"] == r["p"] % 5, (r["id"], r["p"], r["pid"])


def test_with_explicit_partition_column(spark):
    from syscol_spark.functions.partitioners import with_explicit_partition

    df = spark.createDataFrame([(1, 3), (2, 9)], ["id", "target"])
    out = with_explicit_partition(df, "target").collect()
    assert [(r["id"], r["partition"]) for r in out] == [(1, 3), (2, 9)]
    assert dict(with_explicit_partition(df, "target").dtypes)["partition"] == "int"
