"""TPC-H round-out: Q7/Q8/Q13/Q15/Q17 adapted to the trimmed testdata schema
(no partsupp / commitdate / container / phone columns — substitutions noted
per query). These exercise the join/subquery shapes the first TPC-H batch
didn't: bidirectional nation pairing (Q7), share-of-group (Q8), left join +
count distribution (Q13), top-1-with-ties via a global max (Q15), and a
per-group threshold from a correlated average (Q17).

All money aggregates follow the DECIMAL(27,6) discipline (plans/stable.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.functions import broadcast

from syscol_spark.plans.catalog import register
from syscol_spark.plans.stable import davg, dsum
from syscol_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_DSUM_REV = "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE)"


# --- Q7: volume shipping between two nations ---------------------------------
@register(
    "q07_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           {_DSUM_REV} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year, l_extendedprice, l_discount
      FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
    description="TPC-H Q7: shipping volume between two nations per year (bidirectional pair filter)",
)
def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    n1 = broadcast(nation.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")))
    n2 = broadcast(nation.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


# --- Q8: national market share ----------------------------------------------
# Adaptation: the part side joins on p_type (no partsupp); share measured for
# NATION_1 suppliers among ASIA-resident customers buying PROMO parts.
@register(
    "q08_market_share",
    """
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_1'
                         THEN CAST(volume AS DECIMAL(27,6)) ELSE CAST(0 AS DECIMAL(27,6)) END) AS DOUBLE)
             / CAST(SUM(CAST(volume AS DECIMAL(27,6))) AS DOUBLE) AS mkt_share
    FROM (
      SELECT year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n1.n_name AS supp_nation
      FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region   ON n2.n_regionkey = r_regionkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
    )
    GROUP BY o_year
    """,
    description="TPC-H Q8: one nation's market share of PROMO-part volume in ASIA, per year",
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = broadcast(nation.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")))
    n2 = broadcast(nation.select(F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    dec = lambda c: c.cast("decimal(27,6)")  # noqa: E731
    return (
        li.join(broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .join(broadcast(region), F.col("n2_region") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_1", dec(vol)).otherwise(dec(F.lit(0)))).cast("double")
                / F.sum(dec(vol)).cast("double")
            ).alias("mkt_share")
        )
    )


# --- Q13: customer order-count distribution ----------------------------------
# Adaptation: no o_comment column, so the comment exclusion is dropped; the
# shape under test is LEFT JOIN + count(nullable) + histogram of counts.
@register(
    "q13_customer_distribution",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    description="TPC-H Q13: distribution of orders-per-customer (left join keeps zero-order customers)",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --- Q15: top supplier(s) by quarterly revenue -------------------------------
@register(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, {_DSUM_REV} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    description="TPC-H Q15: supplier(s) achieving the maximum quarterly revenue (top-1 with ties)",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    # global max via an empty-frame window: the per-supplier aggregate is
    # small (one row per supplier), so the single-partition window is cheap
    # and keeps ties — matching the subquery semantics exactly
    w = Window.partitionBy()
    top = revenue.withColumn("__mx", F.max("total_revenue").over(w)).filter(
        F.col("total_revenue") == F.col("__mx")
    )
    supp = _t(spark, sf_dir, "supplier")
    return top.join(supp, F.col("supplier_no") == F.col("s_suppkey")).select(
        "s_suppkey", "s_name", "total_revenue"
    )


# --- Q9: product-type profit by nation/year ----------------------------------
# Adaptation: no partsupp, so unit cost is p_retailprice (ps_supplycost's
# stand-in): profit = extendedprice*(1-disc) - retailprice*quantity. The shape
# under test — 5-way join fanning lineitem out to part/supplier/orders/nation
# with a LIKE filter on part, then (nation, year) profit agg — is Q9's.
@register(
    "q09_product_profit",
    """
    SELECT nation, year(o_orderdate) AS o_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         - p_retailprice * l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_profit
    FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN (SELECT n_nationkey, n_name AS nation FROM nation) ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY nation, year(o_orderdate)
    """,
    description="TPC-H Q9 (adapted): profit per supplier-nation per year; retailprice stands in for supplycost",
)
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nation = broadcast(
        _t(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col("p_retailprice") * F.col(
        "l_quantity"
    )
    return (
        li.join(broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(dsum(profit).alias("sum_profit"))
    )


# --- Q12: late-shipment priority counts ---------------------------------------
# Adaptation: no l_shipmode/commitdate/receiptdate. "Late" becomes
# l_shipdate > o_orderdate + 90 days, and l_returnflag plays the shipmode
# grouping role. The shape under test — join + two conditional counts split by
# an IN-list predicate on the joined side — is Q12's.
@register(
    "q12_late_lines",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
             AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
             AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    """,
    description="TPC-H Q12 (adapted): high/low-priority line counts among late shipments, by returnflag",
)
def q12_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


# --- Q22: dormant high-balance customers --------------------------------------
# Adaptation: no c_phone, so the country-code substring becomes c_nationkey
# directly (IN over 7 keys); and because every synthetic customer has orders,
# "never ordered" becomes "no orders since 2000-01-01" (non-empty at every
# SF). The shape under test — scalar-subquery average gating a NOT EXISTS
# anti-join, then per-code count/sum — is Q22's.
_Q22_KEYS = "(1, 3, 5, 7, 9, 11, 13)"


@register(
    "q22_dormant_customers",
    f"""
    WITH sel AS (
      SELECT c_custkey, c_nationkey AS cntrycode, c_acctbal
      FROM customer WHERE c_nationkey IN {_Q22_KEYS}
    ),
    avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE) / COUNT(c_acctbal) AS avg_bal
      FROM sel WHERE c_acctbal > 0
    )
    SELECT cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE) AS totacctbal
    FROM sel, avg_bal
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY cntrycode
    """,
    description="TPC-H Q22 (adapted): never-ordered customers above the positive-balance average, by nation key",
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13)
    )
    # scalar subquery as a broadcast 1-row cross join: no collect, no driver
    # round-trip, and the filtered-customer scan is shared via the same source
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(davg("c_acctbal").alias("avg_bal"))
    recent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return (
        cust.join(broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )


# --- Q17: small-quantity-order revenue ---------------------------------------
# Adaptation: p_container doesn't exist; the brand+type filter plays its role.
@register(
    "q17_small_quantity",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN (
        SELECT l_partkey AS t_partkey,
               0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) / COUNT(l_quantity)) AS threshold
        FROM lineitem GROUP BY l_partkey
      ) ON t_partkey = l_partkey
    WHERE p_brand = 'Brand#12' AND p_type = 'SMALL'
      AND l_quantity < threshold
    """,
    description="TPC-H Q17: revenue from orders below 20% of the part's average quantity",
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#12") & (F.col("p_type") == "SMALL")
    )
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * davg("l_quantity")).alias("threshold")
    )
    return (
        li.join(broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(thresholds, F.col("t_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg((dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )
