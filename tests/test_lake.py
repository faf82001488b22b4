"""Lake layout: bucketed co-located joins and partition pruning, verified
by PLAN SHAPE (the scale claims, not just the row counts)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from syscol_spark.sources.lake import read_bucketed, write_bucketed, write_partitioned


@pytest.fixture()
def clean_tables(spark):
    """Managed-table hygiene: a fresh derby metastore with a persistent
    warehouse dir ( /tmp ) can hold stale table DIRECTORIES with no catalog
    entry — saveAsTable then fails with LOCATION_ALREADY_EXISTS. Drop both
    sides before and after."""
    import shutil

    def scrub():
        warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        for t in ("t_lineitem_b", "t_orders_b"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)

    scrub()
    yield
    scrub()


@pytest.fixture()
def no_broadcast(spark):
    """Force shuffle-join planning so the test proves bucketing (a broadcast
    join would be exchange-free for the wrong reason)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_is_exchange_and_sort_free(spark, sf_dir, no_broadcast, clean_tables):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_bucketed(li, "t_lineitem_b", bucket_by=["l_orderkey"], n_buckets=8, sort_by=["l_orderkey"])
    write_bucketed(orders, "t_orders_b", bucket_by=["o_orderkey"], n_buckets=8, sort_by=["o_orderkey"])

    j = read_bucketed(spark, "t_lineitem_b").join(
        read_bucketed(spark, "t_orders_b"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert "SortMergeJoin" in plan
    # and it still computes the right thing
    expected = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).count()
    assert j.count() == expected

    # same-key aggregation on one bucketed table also skips the exchange
    agg = (
        read_bucketed(spark, "t_lineitem_b")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    agg_plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in agg_plan, agg_plan


def test_partition_pruning(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "docs_by_lang")
    write_partitioned(docs, path, partition_by=["lang"])

    one = spark.read.parquet(path).filter(F.col("lang") == "en")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the pruned scan must read fewer files than the full layout
    n_langs = docs.select("lang").distinct().count()
    assert n_langs > 1
    assert one.count() == docs.filter(F.col("lang") == "en").count()
    # directory names carry the partition values (readable by any engine)
    import os

    assert any(d.startswith("lang=") for d in os.listdir(path))
