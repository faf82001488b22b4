"""Core relational operator coverage (SURVEY.md §2.11): scans, filters,
projections, hash aggregations, joins (broadcast / shuffle / semi / anti),
sorts, top-k, set ops, exact percentiles, analytic windows, rollup.

Every query is declared with the DataFrame API so Catalyst plans it
(predicate pushdown, column pruning, join selection); small dimensions are
explicitly broadcast so the same plan holds when the fact side is 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.functions import broadcast

from syscol_spark.plans.catalog import register
from syscol_spark.plans.stable import davg, dec6, dsum
from syscol_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- Q1: full-scan partial-aggregation (TPC-H Q1 flavor) --------------------
# Map-side partial agg + single shuffle on a low-cardinality key: the
# canonical 100 TB-safe aggregation shape.
@register(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE)                                        AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE)                                   AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE)                AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(27,6))) AS DOUBLE)  AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) / COUNT(l_quantity)                                        AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) / COUNT(l_extendedprice)                                   AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(27,6))) AS DOUBLE) / COUNT(l_discount)                                        AS avg_disc,
           COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    description="TPC-H Q1 pricing summary: filter + groupBy agg (sum/avg/count)",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- Q3: selective join + agg + top-k ---------------------------------------
@register(
    "q03_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue,
           CAST(epoch(o_orderdate) AS BIGINT)                AS orderdate_epoch,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY SUM(l_extendedprice * (1 - l_discount)) DESC, l_orderkey
    LIMIT 10
    """,
    description="TPC-H Q3: 3-way join (broadcast dim), agg, deterministic top-k",
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
    revenue = dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders.join(cust, F.col("o_custkey") == F.col("c_custkey")),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.alias("_rev"))
        .orderBy(F.col("_rev").desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.col("_rev").alias("revenue"),
            F.unix_timestamp("o_orderdate").alias("orderdate_epoch"),
            "o_orderpriority",
        )
    )


# --- Q5: star-schema multi-join ---------------------------------------------
@register(
    "q05_local_supplier",
    """
    SELECT n_name, CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
    description="TPC-H Q5: 6-way star join, dims broadcast, one fact shuffle",
)
def q05_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


# --- top customers: join + agg + top-k --------------------------------------
@register(
    "q_top_customers",
    """
    SELECT c_custkey, c_name, CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS total_spend,
           COUNT(*) AS n_orders
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    ORDER BY SUM(o_totalprice) DESC, c_custkey
    LIMIT 10
    """,
    description="join + agg + deterministic top-k (TakeOrderedAndProject)",
)
def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(dsum("o_totalprice").alias("_spend"), F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("_spend").desc(), F.col("c_custkey"))
        .limit(10)
        .select("c_custkey", "c_name", F.col("_spend").alias("total_spend"), "n_orders")
    )


# --- semi join ---------------------------------------------------------------
@register(
    "q_semi_join",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
                    AND o_orderdate >= TIMESTAMP '1997-01-01')
    """,
    description="left-semi join (EXISTS)",
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
    )
    return cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi").select("c_custkey", "c_name")


# --- anti join ---------------------------------------------------------------
@register(
    "q_anti_join",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    description="left-anti join (NOT EXISTS)",
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti").select("c_custkey", "c_name")


# --- set operations ----------------------------------------------------------
@register(
    "q_set_ops",
    """
    WITH cn AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
         sn AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
    SELECT nk, 'both' AS membership FROM (SELECT nk FROM cn INTERSECT SELECT nk FROM sn)
    UNION ALL
    SELECT nk, 'customer_only' FROM (SELECT nk FROM cn EXCEPT SELECT nk FROM sn)
    UNION ALL
    SELECT nk, 'supplier_only' FROM (SELECT nk FROM sn EXCEPT SELECT nk FROM cn)
    """,
    description="set ops: distinct + intersect + except + union all",
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk")).distinct()
    sn = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk")).distinct()
    return (
        cn.intersect(sn).select("nk", F.lit("both").alias("membership"))
        .unionAll(cn.exceptAll(sn).select("nk", F.lit("customer_only").alias("membership")))
        .unionAll(sn.exceptAll(cn).select("nk", F.lit("supplier_only").alias("membership")))
    )


# --- distinct aggregation ----------------------------------------------------
@register(
    "q_distinct_agg",
    """
    SELECT c_mktsegment,
           CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
           COUNT(*)                                    AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE)                    AS sum_acctbal
    FROM customer
    GROUP BY c_mktsegment
    """,
    description="count distinct + plain agg in one groupBy",
)
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("sum_acctbal"),
        )
    )


# --- exact percentiles -------------------------------------------------------
@register(
    "q_percentiles",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4)  AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4)  AS p90,
           ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
           ROUND(MIN(l_extendedprice), 4)                 AS lo,
           ROUND(MAX(l_extendedprice), 4)                 AS hi
    FROM lineitem
    GROUP BY l_returnflag
    """,
    description="exact interpolated percentiles (Spark percentile ≡ DuckDB quantile_cont)",
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale note: EXACT percentile aggregates a per-group value-count map on
    # the reducer — fine for bounded value domains (prices), unbounded memory
    # for continuous high-cardinality data. At lake scale swap in
    # F.approx_percentile (t-digest, bounded state, mergeable) — kept exact
    # here because exactness IS this query's contract with the oracle.
    # one array-percentile aggregate: three scalar F.percentile calls each
    # maintain (and sort) their own per-group value buffer; the array form
    # computes all three cut points from a single buffer
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile(
                "l_extendedprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))
            ).alias("__pcts"),
            F.round(F.min("l_extendedprice"), 4).alias("lo"),
            F.round(F.max("l_extendedprice"), 4).alias("hi"),
        )
        .select(
            "l_returnflag",
            F.round(F.element_at("__pcts", 1), 4).alias("p50"),
            F.round(F.element_at("__pcts", 2), 4).alias("p90"),
            F.round(F.element_at("__pcts", 3), 4).alias("p99"),
            "lo",
            "hi",
        )
    )


# --- ranking window ----------------------------------------------------------
@register(
    "q_window_rank",
    """
    SELECT c_custkey, o_orderkey, o_totalprice, rk FROM (
      SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
      FROM orders)
    WHERE rk <= 3
    """,
    description="ranking window function + filter (top-3 per group)",
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        _t(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


# --- running / frame windows -------------------------------------------------
@register(
    "q_window_running",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
           ROUND(COALESCE(LAG(o_totalprice) OVER (PARTITION BY o_custkey
                                                  ORDER BY o_orderdate, o_orderkey), 0.0), 2) AS prev_price,
           ROUND(COALESCE(LEAD(o_totalprice) OVER (PARTITION BY o_custkey
                                                   ORDER BY o_orderdate, o_orderkey), 0.0), 2) AS next_price
    FROM orders
    """,
    description="running sum + lag/lead analytic windows",
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec6("o_totalprice")).over(wsum).cast("double").alias("running_spend"),
        F.round(F.coalesce(F.lag("o_totalprice").over(w), F.lit(0.0)), 2).alias("prev_price"),
        F.round(F.coalesce(F.lead("o_totalprice").over(w), F.lit(0.0)), 2).alias("next_price"),
    )


# --- conditional aggregation (manual pivot) ----------------------------------
@register(
    "q_conditional_agg",
    """
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending,
           CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END AS DECIMAL(27,6))) AS DOUBLE) / COUNT(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END)   AS avg_filled_price
    FROM orders
    GROUP BY o_orderpriority
    """,
    description="conditional aggregation / manual pivot (sum of CASE WHEN)",
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    st = F.col("o_orderstatus")
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(st == "O", 1).otherwise(0)).alias("n_open"),
            F.sum(F.when(st == "F", 1).otherwise(0)).alias("n_filled"),
            F.sum(F.when(st == "P", 1).otherwise(0)).alias("n_pending"),
            davg(F.when(st == "F", F.col("o_totalprice"))).alias("avg_filled_price"),
        )
    )


# --- rollup ------------------------------------------------------------------
@register(
    "q_rollup",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE)     AS sum_qty,
           COUNT(*)                      AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    description="hierarchical rollup aggregation (grouping sets)",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


# --- Q6: scan-dominant filter + global aggregate -----------------------------
@register(
    "q06_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(27,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    description="TPC-H Q6: selective scan + global agg — pure pushdown test",
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --- Q14: conditional share of a join --------------------------------------
@register(
    "q14_promo_effect",
    """
    SELECT 100.00 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                                        THEN l_extendedprice * (1 - l_discount)
                                        ELSE 0 END AS DECIMAL(27,6))) AS DOUBLE)
                 / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate <  TIMESTAMP '1997-10-01'
    """,
    description="TPC-H Q14: broadcast dim join + conditional revenue share",
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * dsum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / dsum(rev)
            ).alias("promo_revenue_pct")
        )
    )


# --- Q10-flavor: returned-item revenue by customer ---------------------------
@register(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-07-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY SUM(l_extendedprice * (1 - l_discount)) DESC, c_custkey
    LIMIT 20
    """,
    description="TPC-H Q10: 4-way join, agg, deterministic top-20",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev"))
        .orderBy(F.col("_rev").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "n_name", F.col("_rev").alias("revenue"))
    )


# --- Q4: priority counts gated by an EXISTS ---------------------------------
@register(
    "q04_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    description="TPC-H Q4: EXISTS-gated priority counts (semi join + agg)",
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey")) & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --- Q18: large-volume customers (agg-filtered join) -------------------------
@register(
    "q18_large_orders",
    """
    SELECT c_custkey, o_orderkey, CAST(total_qty AS DOUBLE) AS total_qty,
           ROUND(o_totalprice, 2) AS o_price
    FROM (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(27,6))) AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(27,6))) > 150) big
    JOIN orders   ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 20
    """,
    description="TPC-H Q18: HAVING-filtered aggregate joined back to dims, top-k",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec6("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
        .limit(20)
        .select(
            "c_custkey",
            "o_orderkey",
            F.col("total_qty").cast("double").alias("total_qty"),
            F.round("o_totalprice", 2).alias("o_price"),
        )
    )


# --- Q19: disjunctive multi-band predicate -----------------------------------
@register(
    "q19_discounted_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
       OR (p_type = 'PROMO'    AND p_size BETWEEN 1 AND 50 AND l_quantity >= 20)
    """,
    description="TPC-H Q19: OR-of-ANDs predicate across a join (CNF pushdown)",
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_type") == "PROMO") & F.col("p_size").between(1, 50) & (F.col("l_quantity") >= 20))
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --- approximate distinct (sketch operator with a checkable contract) -------
# HLL sketch *values* aren't portable across engines, but the sketch's
# accuracy CONTRACT is: Spark computes both the approx and the exact side and
# emits |approx-exact|/exact <= tol as a boolean; the oracle (which can only
# compute the exact side) asserts TRUE. If the sketch ever drifts outside
# tolerance the value-hash breaks — a real correctness row, not rows-only.
# Tolerances: rsd=0.02 HLL against a 0.05 bound (~2.5 sigma); p50 from
# percentile_approx(acc=1000) against the exact interpolated median with a
# 0.05 relative bound (rank error <= n/1000 keeps it far inside).
@register(
    "q_approx_distinct",
    """
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS parts_within_tol,
           TRUE AS p50_within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
    description="approx_count_distinct (HyperLogLog++) + approx percentile vs exact, tolerance-checked",
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # Two aggregates joined on the (tiny) group key, NOT one: mixing
    # countDistinct with non-distinct aggregates makes Spark rewrite through
    # an Expand (row multiplication) — measured 5.1s combined vs 0.5s each
    # at sf0.1. Two clean scans + a 3-row join is ~5x faster and the scan is
    # column-pruned to one column each. The exact-median scan is the
    # verification harness, not the operator: at lake scale a user runs only
    # the sketch side.
    sketches = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(1000)).alias("p50_approx"),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50_exact"),
    )
    rel = lambda a, b: F.abs(F.col(a) - F.col(b)) / F.col(b)  # noqa: E731
    return sketches.join(exact, "l_returnflag").select(
        "l_returnflag",
        "exact_parts",
        (rel("approx_parts", "exact_parts") <= 0.05).alias("parts_within_tol"),
        (rel("p50_approx", "p50_exact") <= 0.05).alias("p50_within_tol"),
    )


# --- having ------------------------------------------------------------------
@register(
    "q_having",
    """
    SELECT n_name, COUNT(*) AS n_customers
    FROM nation JOIN customer ON n_nationkey = c_nationkey
    GROUP BY n_name
    HAVING COUNT(*) >= 5
    """,
    description="groupBy + HAVING post-aggregation filter",
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    return (
        cust.join(broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .filter(F.col("n_customers") >= 5)
    )


# --- mergeable distinct-count sketches across shards --------------------------
# The incremental form of q_approx_distinct: each shard builds a PERSISTABLE
# HLL sketch (Datasketches binary — what a lake job writes daily), the
# shards' sketches union WITHOUT rescanning any shard, and the merged
# estimate is tolerance-checked against the exact count. This is the
# mergeability contract that makes sketch tables work at 100 TB: adding a
# day of data costs one shard scan + an O(sketch-size) union, never a
# recount. Sketch bytes aren't portable across engines, so — exactly like
# q_approx_distinct — the oracle checks the exact side and emits the
# tolerance verdicts as oracle-checked booleans.
@register(
    "q_hll_shards",
    """
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(3 AS BIGINT) AS n_shards,
           TRUE AS merged_within_tol,
           TRUE AS shards_cover_exact
    FROM lineitem GROUP BY l_returnflag
    """,
    description="mergeable HLL sketch tables: per-shard sketches union to the corpus estimate without rescans; tolerance-checked vs exact (sketch values engine-local, verdicts oracle-checked)",
)
def q_hll_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "shard", F.pmod(F.col("l_orderkey"), F.lit(3))
    )
    # Dedup EARLY and materialize once (r14): both consumers (per-shard
    # sketches and the exact corpus count) only need DISTINCT
    # (flag, shard, part) triples — HLL updates are idempotent per value,
    # so a sketch over the deduped rows is byte-identical, and countDistinct
    # is unchanged by construction. One lineitem scan + one distinct
    # shuffle instead of two full scans each re-aggregating raw rows.
    base = (
        li.select("l_returnflag", "shard", "l_partkey").distinct().localCheckpoint()
    )
    # per-shard sketch table: what each daily job would persist
    shard_sketches = base.groupBy("l_returnflag", "shard").agg(
        F.hll_sketch_agg("l_partkey", 14).alias("sketch"),
        F.count(F.lit(1)).alias("shard_exact"),
    )
    merged = shard_sketches.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("merged_est"),
        F.count(F.lit(1)).alias("n_shards"),
        F.sum("shard_exact").alias("sum_shard_exact"),
    )
    exact = base.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts")
    )
    return exact.join(merged, "l_returnflag").select(
        "l_returnflag",
        "exact_parts",
        F.col("n_shards").cast("long").alias("n_shards"),
        (
            F.abs(F.col("merged_est") - F.col("exact_parts"))
            <= 0.05 * F.col("exact_parts")
        ).alias("merged_within_tol"),
        # shard-exact counts can only overcount the union (a part key in
        # two shards counts twice) — sanity bound on the shard split
        (F.col("sum_shard_exact") >= F.col("exact_parts")).alias("shards_cover_exact"),
    )
