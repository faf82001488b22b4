"""Bucketed co-located join: the 100 TB fact-fact join strategy.

Writing both sides bucketed by the join key lets Spark join WITHOUT a
shuffle exchange on either side — this test proves the engine's plan
actually elides the exchanges (at petabyte scale this is the difference
between a join that works and one that doesn't)."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    try:
        (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite")
           .saveAsTable("li_bucketed"))
        (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite")
           .saveAsTable("o_bucketed"))
        joined = spark.table("li_bucketed").join(
            spark.table("o_bucketed"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:2000]}"
        # and it is still correct
        n = joined.count()
        n_ref = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).count()
        assert n == n_ref > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS o_bucketed")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
