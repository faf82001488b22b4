"""§2.7 utility-function parity tests."""

from __future__ import annotations

import pyspark.sql.functions as F

from syscol_spark.functions.utils import id_string, now_ns, slave_from_task_id, suffix, uuid_col


def test_suffix_and_id_string(spark):
    df = spark.createDataFrame([("20260813-143052-16842879-5050-1234-S7",)], ["id"])
    [r] = df.select(
        suffix("id", 5).alias("suf"), id_string("id").alias("disp")
    ).collect()
    assert r["suf"] == "34-S7"
    assert r["disp"] == "#34-S7"


def test_slave_from_task_id(spark):
    # reference format: "<prefix>-<slaveid>-<36-char-uuid>" (scheduler.go:256-262)
    uuid = "123e4567-e89b-12d3-a456-426614174000"
    df = spark.createDataFrame([(f"syscol-S42-{uuid}",)], ["task_id"])
    [r] = df.select(slave_from_task_id("task_id").alias("s")).collect()
    assert r["s"] == "S42"


def test_uuid_and_now_ns(spark):
    rows = spark.range(3).select(uuid_col().alias("u"), now_ns().alias("t")).collect()
    assert len({r["u"] for r in rows}) == 3  # distinct per row
    assert all(len(r["u"]) == 36 for r in rows)
    assert all(r["t"] > 1_500_000_000 * 10**9 for r in rows)  # ns scale
    assert all(r["t"] % 1000 == 0 for r in rows)  # documented µs→ns delta
