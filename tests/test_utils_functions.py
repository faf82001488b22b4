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


def test_u5_offer_and_status_strings(spark):
    """U5 pretty-printers (utils.go:42-108): golden strings computed by hand
    from the Go format verbs on the same fixture."""
    from syscol_spark.functions.utils import offers_string, status_string

    offer = {
        "hostname": "slave0",
        "id": "20260813-offer-0001",
        "resources": [
            {"name": "cpus", "scalar": 4.0, "ranges": None},
            {"name": "mem", "scalar": 2048.5, "ranges": None},
            {"name": "ports", "scalar": None, "ranges": [{"begin": 31000, "end": 32000}]},
        ],
        "attributes": [
            {"name": "rack", "text": "r1", "scalar": None},
            {"name": "weight", "text": None, "scalar": 1.5},
        ],
    }
    schema = (
        "offers array<struct<hostname:string,id:string,"
        "resources:array<struct<name:string,scalar:double,ranges:array<struct<begin:bigint,end:bigint>>>>,"
        "attributes:array<struct<name:string,text:string,scalar:double>>>>"
    )
    df = spark.createDataFrame([([offer, offer],)], schema)
    [r] = df.select(offers_string("offers").alias("s")).collect()
    one = "\nslave0#-0001 cpus:4.00 mem:2048.50 ports:[31000..32000] rack:r1;weight:1.50"
    assert r["s"] == one + one  # offersString concatenates in slice order

    st = spark.createDataFrame(
        [
            ("syscol-S1-t1", "TASK_RUNNING", "20260813-S42", None, ""),
            ("syscol-S1-t2", "TASK_FAILED", "20260813-S42", "REASON_COMMAND_EXECUTOR_FAILED", "oom"),
        ],
        ["task_id", "state", "slave_id", "reason", "message"],
    )
    got = [
        r["s"]
        for r in st.select(
            status_string("task_id", "state", "slave_id", "reason", "message").alias("s")
        ).collect()
    ]
    assert got[0] == "syscol-S1-t1 TASK_RUNNING slave: #3-S42"
    assert got[1] == (
        "syscol-S1-t2 TASK_FAILED slave: #3-S42"
        " reason: REASON_COMMAND_EXECUTOR_FAILED message: oom"
    )
