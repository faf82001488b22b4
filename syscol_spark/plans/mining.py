"""Data-mining and pipeline-diagnostics queries: association rules
(market-basket), referential-integrity audit, key-skew profiling,
change-point detection (CUSUM), lag autocorrelation, incremental
aggregate-view maintenance, sketch-prefiltered semi join.

Every query follows the catalog parity rules (plans/catalog.py docstring):
integer micro-units for ratios, exact integer sums behind any float
division, deterministic tie-breaks.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.functions import broadcast

from syscol_spark.plans.catalog import register
from syscol_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- association rules (market basket) ---------------------------------------
# Apriori-shaped frequent-pair mining over order baskets: frequent single
# items first (support prune — the classic anti-monotone cut), THEN pair
# generation restricted to frequent items via an orderkey self-join with
# a < b. At scale the prune is what keeps the self-join bucket sizes small:
# pair blow-up is bounded by (frequent items per basket choose 2), and
# TPC-H-shaped baskets are ≤ 7 lines. Confidence and lift are reported in
# integer micro units (numerators/denominators are exact counts), so the
# hash compare is exact. Reference scope: the syscol engine has no miner;
# this is north-star surface for a curation/analytics engine.
@register(
    "q_assoc_rules",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
    ), freq AS (
      SELECT item, CAST(COUNT(*) AS BIGINT) AS supp
      FROM items GROUP BY item HAVING COUNT(*) >= 3
    ), n AS (SELECT CAST(COUNT(DISTINCT basket) AS BIGINT) AS n_baskets FROM items),
    pairs AS (
      SELECT a.item AS item_a, b.item AS item_b, CAST(COUNT(*) AS BIGINT) AS pair_supp
      FROM items a
      JOIN items b ON a.basket = b.basket AND a.item < b.item
      WHERE a.item IN (SELECT item FROM freq) AND b.item IN (SELECT item FROM freq)
      GROUP BY a.item, b.item
      HAVING COUNT(*) >= 2
    )
    SELECT item_a, item_b, pair_supp,
           pair_supp * 1000000 // fa.supp                     AS conf_ab_micro,
           pair_supp * n.n_baskets * 1000000 // (fa.supp * fb.supp) AS lift_micro
    FROM pairs
    JOIN freq fa ON fa.item = pairs.item_a
    JOIN freq fb ON fb.item = pairs.item_b
    CROSS JOIN n
    ORDER BY lift_micro DESC, item_a, item_b
    LIMIT 50
    """,
    description="Apriori frequent-pair association rules with confidence/lift over order baskets",
)
def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item"))
        .distinct()
    )
    freq = items.groupBy("item").agg(F.count(F.lit(1)).alias("supp")).filter(F.col("supp") >= 3)
    n = items.agg(F.countDistinct("basket").alias("n_baskets"))
    fa = broadcast(freq.select(F.col("item").alias("item_a"), F.col("supp").alias("supp_a")))
    fb = broadcast(freq.select(F.col("item").alias("item_b"), F.col("supp").alias("supp_b")))
    left = items.join(broadcast(freq.select("item")), "item").select(
        "basket", F.col("item").alias("item_a")
    )
    right = items.join(broadcast(freq.select("item")), "item").select(
        "basket", F.col("item").alias("item_b")
    )
    pairs = (
        left.join(right, "basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_supp"))
        .filter(F.col("pair_supp") >= 2)
    )
    return (
        pairs.join(fa, "item_a")
        .join(fb, "item_b")
        .join(broadcast(n))
        .select(
            "item_a",
            "item_b",
            "pair_supp",
            F.expr("pair_supp * 1000000 div supp_a").alias("conf_ab_micro"),
            F.expr("pair_supp * n_baskets * 1000000 div (supp_a * supp_b)").alias("lift_micro"),
        )
        .orderBy(F.desc("lift_micro"), "item_a", "item_b")
        .limit(50)
    )


# --- referential-integrity audit ---------------------------------------------
# Data-quality audit across the star schema's FK edges: orphaned child rows
# (anti join child→parent) and unreferenced parent rows (anti join
# parent→child), one row per relationship. Each edge is two anti joins on
# the FK — broadcastable parents stay broadcast; the big fact-side anti
# joins shuffle once on the key. The all-green zero-orphan result on the
# synthetic data is the point: this is the audit you run before trusting a
# 100 TB ingest.
@register(
    "q_fk_audit",
    """
    WITH edges AS (
      SELECT 'lineitem->orders' AS rel,
             (SELECT COUNT(*) FROM lineitem) AS n_child,
             (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
               (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_orphan,
             (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
               (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)) AS n_unreferenced
      UNION ALL
      SELECT 'lineitem->part',
             (SELECT COUNT(*) FROM lineitem),
             (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
               (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)),
             (SELECT COUNT(*) FROM part p WHERE NOT EXISTS
               (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey))
      UNION ALL
      SELECT 'lineitem->supplier',
             (SELECT COUNT(*) FROM lineitem),
             (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
               (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)),
             (SELECT COUNT(*) FROM supplier s WHERE NOT EXISTS
               (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey))
      UNION ALL
      SELECT 'orders->customer',
             (SELECT COUNT(*) FROM orders),
             (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
               (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
             (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
               (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey))
      UNION ALL
      SELECT 'customer->nation',
             (SELECT COUNT(*) FROM customer),
             (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
               (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)),
             (SELECT COUNT(*) FROM nation n WHERE NOT EXISTS
               (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey))
    )
    SELECT rel, CAST(n_child AS BIGINT) AS n_child,
           CAST(n_orphan AS BIGINT) AS n_orphan,
           CAST(n_unreferenced AS BIGINT) AS n_unreferenced
    FROM edges
    """,
    description="referential-integrity audit: orphans + unreferenced parents per FK edge",
)
def q_fk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    def edge(rel: str, child: DataFrame, ckey: str, parent: DataFrame, pkey: str) -> DataFrame:
        ck = child.groupBy(F.col(ckey).alias("key")).agg(F.count(F.lit(1)).alias("c"))
        pk = parent.select(F.col(pkey).alias("key")).distinct().withColumn("p", F.lit(1))
        j = ck.join(pk, "key", "full_outer")
        return j.agg(
            F.lit(rel).alias("rel"),
            F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_child"),
            F.coalesce(F.sum(F.when(F.col("p").isNull(), F.col("c"))), F.lit(0))
            .cast("long")
            .alias("n_orphan"),
            F.sum(F.when(F.col("c").isNull(), 1).otherwise(0)).cast("long").alias("n_unreferenced"),
        )

    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    frames = [
        edge("lineitem->orders", li, "l_orderkey", od, "o_orderkey"),
        edge("lineitem->part", li, "l_partkey", _t(spark, sf_dir, "part"), "p_partkey"),
        edge("lineitem->supplier", li, "l_suppkey", _t(spark, sf_dir, "supplier"), "s_suppkey"),
        edge("orders->customer", od, "o_custkey", cu, "c_custkey"),
        edge("customer->nation", cu, "c_nationkey", _t(spark, sf_dir, "nation"), "n_nationkey"),
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out


# --- key-skew profiler -------------------------------------------------------
# Partition-skew diagnostics BEFORE you shuffle 100 TB on a key: per-key
# cardinality distribution summarized as max/mean ratio, top-1% share, and
# the Gini coefficient — all from exact integer sums (Gini numerator
# 2·Σi·xᵢ − (n+1)·Σx over counts sorted ascending is invariant to
# tie-order, so the rank window is deterministic). One shuffle for the
# per-key counts, one tiny window over the key-count table (keys, not
# rows), one-row result.
@register(
    "q_skew_keys",
    """
    WITH cnt AS (
      SELECT o_custkey AS key, CAST(COUNT(*) AS BIGINT) AS c
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT c, CAST(ROW_NUMBER() OVER (ORDER BY c, key) AS HUGEINT) AS i FROM cnt
    ), s AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(c) AS tot,
             CAST(MAX(c) AS BIGINT) AS max_c, SUM(i * c) AS swc
      FROM ranked
    ), top AS (
      SELECT SUM(c) AS top_c FROM ranked CROSS JOIN s
      WHERE i > n - greatest(n // 100, 1)
    )
    SELECT CAST(n AS BIGINT)                                   AS n_keys,
           CAST(tot AS BIGINT)                                 AS n_rows,
           max_c,
           CAST(max_c * n * 1000000 // tot AS BIGINT)          AS max_over_mean_micro,
           CAST(top_c * 1000000 // tot AS BIGINT)              AS top1pct_share_micro,
           CAST((2 * swc - (n + 1) * tot) * 1000000 // (n * tot) AS BIGINT) AS gini_micro
    FROM s CROSS JOIN top
    """,
    description="key-skew profile of orders-per-customer: max/mean, top-1% share, Gini (exact integer)",
)
def q_skew_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    dec38 = "decimal(38,0)"
    cnt = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ranked = cnt.withColumn(
        "i", F.row_number().over(Window.orderBy("c", "key")).cast(dec38)
    )
    s = ranked.agg(
        F.count(F.lit(1)).cast(dec38).alias("n"),
        F.sum("c").cast(dec38).alias("tot"),
        F.max("c").cast("long").alias("max_c"),
        F.sum(F.col("i") * F.col("c")).cast(dec38).alias("swc"),
    )
    top = (
        ranked.join(broadcast(s))
        .filter(F.col("i") > F.col("n") - F.greatest(F.expr("n div 100"), F.lit(1).cast(dec38)))
        .agg(F.sum("c").cast(dec38).alias("top_c"))
    )
    return (
        s.join(broadcast(top))
        .select(
            F.col("n").cast("long").alias("n_keys"),
            F.col("tot").cast("long").alias("n_rows"),
            "max_c",
            F.expr("CAST(CAST(max_c AS DECIMAL(38,0)) * n * 1000000 div tot AS BIGINT)").alias(
                "max_over_mean_micro"
            ),
            F.expr("CAST(top_c * 1000000 div tot AS BIGINT)").alias("top1pct_share_micro"),
            F.expr(
                "CAST((2 * swc - (n + 1) * tot) * 1000000 div (n * tot) AS BIGINT)"
            ).alias("gini_micro"),
        )
    )
