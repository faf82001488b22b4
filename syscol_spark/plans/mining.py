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


def _basket_arrays(df: DataFrame, basket_col: str, item_col: str) -> DataFrame:
    """One row per basket with its DEDUPED, SORTED item array (`__items`).
    The single groupBy(basket) shuffle replaces the distinct-projection
    exchange that every basket-pair consumer used to pay separately; the
    per-basket set is bounded by max basket size, so the array is too."""
    return df.groupBy(F.col(basket_col).alias("__basket")).agg(
        F.sort_array(F.collect_set(item_col)).alias("__items")
    )


def _pairs_from_arrays(arrays: DataFrame) -> DataFrame:
    """(pa, pb) with pa < pb, one row per (basket, unordered pair) — the
    exact pair multiset of the former self-join `a JOIN b ON same basket
    AND a.item < b.item` over DISTINCT (basket, item), produced array-side
    with NO join (r14, guide §2.4): the sorted deduped array emits each
    pair once via nested transform, so the distinct exchange + two-sided
    join exchange + SortMergeJoin collapse into _basket_arrays' single
    shuffle. The quadratic step stays bounded by max basket size, exactly
    as the join's per-key bucket was. `__items` is an aggregate output
    attribute, not an inlined expression, so lambda re-evaluation
    (CollapseProject) cannot multiply work."""
    return arrays.select(
        F.explode(
            F.expr(
                "flatten(transform(__items, (x, i) -> "
                "transform(slice(__items, i + 2, size(__items)), "
                "y -> struct(x AS pa, y AS pb))))"
            )
        ).alias("__p")
    ).select("__p.pa", "__p.pb")


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared co-purchase edge list (pa < pb, co-occurrence >= 2),
    CHECKPOINTED — q_label_prop / q_bfs_khop / q_copurchase_triangles all
    consume it repeatedly (both directions x rounds, or three triangle
    sides)."""
    pairs = _pairs_from_arrays(
        _basket_arrays(
            _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey"),
            "l_orderkey",
            "l_partkey",
        )
    )
    return (
        pairs.groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .drop("w")
        .localCheckpoint()
    )


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
    # basket arrays materialized ONCE (r14): freq, the basket count and the
    # pair stream all read the checkpointed per-basket item sets — one
    # lineitem pass + one groupBy(basket) shuffle replaces the former
    # distinct checkpoint + two-sided basket self-join (guide §2.4).
    baskets = _basket_arrays(
        _t(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
        ),
        "basket",
        "item",
    ).localCheckpoint()
    freq = (
        baskets.select(F.explode("__items").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("supp"))
        .filter(F.col("supp") >= 3)
    )
    # one row per basket by construction, so COUNT(*) == COUNT(DISTINCT basket)
    n = baskets.agg(F.count(F.lit(1)).alias("n_baskets"))
    # The frequent-item table scales with the part catalog (linear in SF —
    # ~20e9 items at the 100 TB point), far beyond broadcastable: leave the
    # equi-joins UN-hinted and let AQE broadcast when the runtime size fits,
    # shuffle when it doesn't. Only the 1-row global count is hinted.
    fa = freq.select(F.col("item").alias("item_a"), F.col("supp").alias("supp_a"))
    fb = freq.select(F.col("item").alias("item_b"), F.col("supp").alias("supp_b"))
    # pair counts no longer prefilter to frequent items: pair_supp of any
    # surviving pair is the basket co-occurrence count either way, and the
    # inner joins on fa/fb below apply exactly the old frequent-only cut.
    # (With a fixed support floor the Apriori prune removes a vanishing
    # fraction at scale, while pair volume stays basket-size-bounded.)
    pairs = (
        _pairs_from_arrays(baskets)
        .groupBy(F.col("pa").alias("item_a"), F.col("pb").alias("item_b"))
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


# --- skew-mitigated (salted) join --------------------------------------------
# The operator a user reaches for AFTER q_skew_keys flags a hot key: the
# orders->customer fact-dim join with the top-20 hottest custkeys salted 8
# ways (deterministic per-row xxhash64 salt on the fact side, hot dim rows
# replicated once per salt), then the segment revenue rollup. The result is
# row-identical to the plain join by construction — which is exactly what
# the oracle checks: the oracle SQL is the UNSALTED join. Scale: the hot-key
# list is a GlobalLimit-20 broadcast (never data-proportional); dim
# replication is |hot| x n_salts rows, not |dim| x n_salts; each hot key
# spreads over 8 shuffle partitions instead of defining the straggler task.
@register(
    "q_skew_salted_join",
    """
    SELECT c_mktsegment AS mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY mktsegment
    """,
    description=(
        "skew-mitigated fact-dim join: top-20 hot custkeys salted 8 ways"
        " (hot dim rows replicated per salt), segment revenue rollup —"
        " result identical to the plain join by construction."
        " NOTE: at this test scale the dim side is broadcastable and a plain"
        " broadcast join would win; the entry pins the LARGE-dim technique"
        " (plan-shape test is the point) — don't copy it for small dims"
    ),
)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from syscol_spark.operators.joins import salted_join

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "o_custkey")
    j = salted_join(o, c, on="o_custkey", n_salts=8, hot_top_k=20)
    return (
        j.groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(27,6)")).cast("double").alias("revenue"),
        )
        .orderBy("mktsegment")
    )


# --- CUSUM change-point detection --------------------------------------------
# One-sided CUSUM over the minutely event-count series. The textbook
# recursion S⁺_t = max(0, S⁺_{t-1} + (x_t − μ − k)) is not a window
# aggregate, but it has the classic prefix-sum closed form
# S⁺_t = P_t − min(0, min_{j≤t} P_j) with P the running sum of the drifted
# deviations — running sum + running min, both plain windows ordered on the
# (bounded, minutes-not-events) time grid. Everything stays in exact
# integer micro units: μ_micro and the variance are floor-divided integer
# sums; the only float op is ONE sqrt of the same integer on both engines,
# floored back to an integer σ_micro. Reports the top-20 excursion minutes
# with the alarm flag (S⁺ > 5σ), so the result is non-trivial even on a
# stationary series. Scale: per-minute aggregation is the only
# data-proportional shuffle; the windows run over the minute grid.
@register(
    "q_ev_cusum",
    """
    WITH minutely AS (
      SELECT epoch_us(ts) // 60000000 AS m, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ), stats AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n, CAST(SUM(x) AS HUGEINT) AS s,
             CAST(SUM(x * x) AS HUGEINT) AS q
      FROM minutely
    ), params AS (
      SELECT CAST(s * 1000000 // n AS BIGINT) AS mu_micro,
             CAST(floor(sqrt(CAST((n * q - s * s) * 1000000000000 // (n * n) AS DOUBLE))) AS BIGINT)
               AS sd_micro
      FROM stats
    ), dev AS (
      SELECT m, x, x * 1000000 - mu_micro - sd_micro // 2 AS d, sd_micro
      FROM minutely CROSS JOIN params
    ), pre AS (
      SELECT m, x, sd_micro,
             SUM(d) OVER (ORDER BY m ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
      FROM dev
    ), cusum AS (
      SELECT m, x, sd_micro,
             p - least(0, MIN(p) OVER (ORDER BY m ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
               AS s_plus
      FROM pre
    )
    SELECT CAST(m AS BIGINT) AS minute_idx, x AS n_events,
           CAST(s_plus AS BIGINT) AS s_plus_micro,
           (s_plus > 5 * sd_micro) AS alarm
    FROM cusum
    ORDER BY s_plus DESC, m
    LIMIT 20
    """,
    description="CUSUM mean-shift detector over minutely event counts (prefix-sum closed form, exact integers)",
)
def q_ev_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    dec38 = "decimal(38,0)"
    minutely = (
        _t(spark, sf_dir, "events")
        .groupBy(F.expr("ts_us div 60000000").alias("m"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    stats = minutely.agg(
        F.count(F.lit(1)).cast(dec38).alias("n"),
        F.sum("x").cast(dec38).alias("s"),
        F.sum(F.col("x") * F.col("x")).cast(dec38).alias("q"),
    )
    params = stats.select(
        F.expr("CAST(s * 1000000 div n AS BIGINT)").alias("mu_micro"),
        F.expr(
            "CAST(floor(sqrt(CAST((n * q - s * s) * 1000000000000 div (n * n) AS DOUBLE)))"
            " AS BIGINT)"
        ).alias("sd_micro"),
    )
    dev = minutely.join(broadcast(params)).select(
        "m",
        "x",
        F.expr("x * 1000000 - mu_micro - sd_micro div 2").alias("d"),
        "sd_micro",
    )
    w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, 0)
    pre = dev.withColumn("p", F.sum("d").over(w))
    cusum = pre.withColumn("s_plus", F.col("p") - F.least(F.lit(0), F.min("p").over(w)))
    return (
        cusum.select(
            F.col("m").cast("long").alias("minute_idx"),
            F.col("x").alias("n_events"),
            F.col("s_plus").cast("long").alias("s_plus_micro"),
            (F.col("s_plus") > 5 * F.col("sd_micro")).alias("alarm"),
        )
        .orderBy(F.desc("s_plus_micro"), "minute_idx")
        .limit(20)
    )


# --- lag autocorrelation (seasonality detector) ------------------------------
# Autocorrelation of the minutely event-count series at lags 1..10 — the
# seasonality probe of a time-series engine. The series is aggregated
# FIRST (minutes, not events — the only data-proportional shuffle), then
# each lag pairs the series with itself via an equi-join on m+lag (robust
# to gaps in the grid: only co-present minutes pair). Pearson r per lag is
# computed from exact integer sums; the single float step — num /
# sqrt(denx·deny), scaled to micro and floored — runs on identical
# integers in both engines, so the hash compare is exact.
@register(
    "q_ev_autocorr",
    """
    WITH minutely AS (
      SELECT epoch_us(ts) // 60000000 AS m, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ), pairs AS (
      SELECT l.lag, a.x AS x, b.x AS y
      FROM (SELECT unnest(generate_series(1, 10)) AS lag) l
      JOIN minutely a ON true
      JOIN minutely b ON b.m = a.m + l.lag
    ), sums AS (
      SELECT lag,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(x * x) AS HUGEINT) AS sxx, CAST(SUM(y * y) AS HUGEINT) AS syy,
             CAST(SUM(x * y) AS HUGEINT) AS sxy
      FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_pairs,
           CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE) * 1000000.0
                      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                             * CAST(n * syy - sy * sy AS DOUBLE))) AS BIGINT) AS r_micro
    FROM sums
    WHERE n >= 3 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    ORDER BY lag
    """,
    description="lag-1..10 autocorrelation of minutely event counts (exact integer sums, one float division)",
)
def q_ev_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    dec38 = "decimal(38,0)"
    minutely = (
        _t(spark, sf_dir, "events")
        .groupBy(F.expr("ts_us div 60000000").alias("m"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    a = minutely.withColumn("lag", F.explode(F.sequence(F.lit(1), F.lit(10))))
    b = minutely.select(F.col("m").alias("mb"), F.col("x").alias("y"))
    pairs = a.join(b, F.col("mb") == F.col("m") + F.col("lag")).select("lag", "x", "y")
    sums = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast(dec38).alias("n"),
        F.sum("x").cast(dec38).alias("sx"),
        F.sum("y").cast(dec38).alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast(dec38).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast(dec38).alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast(dec38).alias("sxy"),
    )
    return (
        sums.filter(
            (F.col("n") >= 3)
            & (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") > 0)
            & (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy") > 0)
        )
        .select(
            F.col("lag").cast("long").alias("lag"),
            F.col("n").cast("long").alias("n_pairs"),
            F.expr(
                "CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE) * 1000000.0"
                " / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)"
                " * CAST(n * syy - sy * sy AS DOUBLE))) AS BIGINT)"
            ).alias("r_micro"),
        )
        .orderBy("lag")
    )


# --- incremental aggregate-view maintenance ----------------------------------
# Materialized-view refresh without recompute: the per-customer order
# rollup is maintained as ALGEBRAIC partials (count + exact decimal sum),
# so yesterday's partial and today's delta partial merge by a re-aggregate
# over the union — the oracle is the full recompute, proving
# merge(partial(base), partial(delta)) ≡ full. At 100 TB this is the
# difference between scanning one day and scanning the archive; the merge
# shuffles only the partial tables (one row per customer per slice), not
# the facts. AVG is derived from the merged sums (never averaged averages).
@register(
    "q_inc_agg_merge",
    """
    SELECT o_custkey AS custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS total,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*) AS avg_price
    FROM orders GROUP BY o_custkey
    """,
    description="incremental MV maintenance: merge(partial(base), partial(delta)) == full recompute",
)
def q_inc_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cutoff = "1999-01-01"

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(F.col("o_custkey").alias("custkey")).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(27,6)")).alias("s"),
        )

    base = partial(orders.filter(F.col("o_orderdate") < cutoff))
    delta = partial(orders.filter(F.col("o_orderdate") >= cutoff))
    merged = (
        base.unionAll(delta)
        .groupBy("custkey")
        .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
    )
    return merged.select(
        "custkey",
        F.col("n").cast("long").alias("n_orders"),
        F.col("s").cast("double").alias("total"),
        (F.col("s").cast("double") / F.col("n")).alias("avg_price"),
    )


# --- sketch-prefiltered semi join --------------------------------------------
# Bloom-filter-shaped join pruning expressed in pure DataFrame ops: the
# small side's keys are hashed into a 2^20-bucket table (bounded at ~1M
# rows REGARDLESS of key count — the point at which a raw key broadcast
# stops fitting), broadcast, and used to pre-filter the fact scan before
# the exact semi join. False-positive buckets only cost the exact join a
# few extra rows — the final answer is exact, which is why the oracle is
# the plain semi join. This is the manual twin of Spark's AQE runtime
# bloom filter, usable when the build side is a derived frame the
# optimizer can't see through.
@register(
    "q_sketch_prefilter_join",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 450000.0)
    """,
    description="sketch-prefiltered semi join: broadcast bucket table prunes the fact scan, exact join confirms",
)
def q_sketch_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    n_buckets = 1 << 20
    sel = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450000.0)
        .select("o_orderkey")
    )
    buckets = sel.select(
        F.pmod(F.xxhash64("o_orderkey"), F.lit(n_buckets)).alias("b")
    ).distinct()
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "b", F.pmod(F.xxhash64("l_orderkey"), F.lit(n_buckets))
    )
    cand = li.join(broadcast(buckets), "b").drop("b")
    # the exact confirm join is UN-hinted: the selected-orders key set is a
    # constant FRACTION of orders (linear in SF), so only the capped bucket
    # table above may be forced; AQE broadcasts the keys when they fit and
    # shuffles the (already bucket-pruned) candidates when they don't
    hit = cand.join(
        sel.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey", "semi"
    )
    return hit.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.sum(F.col("l_quantity").cast("decimal(27,6)")).cast("double").alias("sum_qty"),
    )


# --- cross-document repeated-segment dedup -----------------------------------
# RefinedWeb-style boilerplate removal at the SEGMENT level: fixed-stride
# 8-token windows are hashed, segments whose hash appears in ≥2 distinct
# documents are flagged as cross-document boilerplate, and each document
# reports its kept ratio. Unlike q_boilerplate (token document-frequency)
# this catches verbatim multi-token runs (nav bars, license headers,
# mirrored passages). Segmentation uses the raw split positions in both
# engines, so the grouping is bit-identical. The segment-hash table is
# CORPUS-proportional (nearly every 8-token window in natural text is
# unique), so it must never be broadcast: the document frequency is
# computed with ONE window over the segment hash (collect_set of doc ids
# per h — set size bounded by the hash's df, which is tiny for unique
# segments and boilerplate-sized for repeated ones), one shuffle total,
# no join, nothing driver- or executor-resident beyond a partition group.
@register(
    "q_repeated_segments",
    """
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(text), '\\s+')) AS token,
             generate_subscripts(string_split_regex(trim(text), '\\s+'), 1) AS pos
      FROM documents
    ), seg AS (
      SELECT doc_id, (pos - 1) // 8 AS seg_id,
             md5(string_agg(token, ' ' ORDER BY pos)) AS h
      FROM tok WHERE token <> ''
      GROUP BY doc_id, (pos - 1) // 8
    ), freq AS (
      SELECT h, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM seg GROUP BY h
    )
    SELECT seg.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_segs,
           CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeated,
           CAST(SUM(CASE WHEN df >= 2 THEN 0 ELSE 1 END) AS BIGINT) * 1000000
             // CAST(COUNT(*) AS BIGINT) AS kept_micro
    FROM seg JOIN freq USING (h)
    GROUP BY seg.doc_id
    """,
    description="cross-document repeated 8-token-segment detection with per-doc kept ratio",
)
def q_repeated_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("pos", "token"),
    ).filter(F.col("token") != "")
    seg = (
        tok.groupBy("doc_id", F.expr("pos div 8").alias("seg_id"))
        .agg(
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "token"))),
                        lambda s: s.token,
                    ),
                )
            ).alias("h")
        )
    )
    flagged = seg.withColumn(
        "df", F.size(F.collect_set("doc_id").over(Window.partitionBy("h")))
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segs"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)).cast("long").alias("n_repeated"),
            F.expr(
                "CAST(SUM(CASE WHEN df >= 2 THEN 0 ELSE 1 END) * 1000000 div COUNT(*) AS BIGINT)"
            ).alias("kept_micro"),
        )
    )


# --- nearest-centroid classification -----------------------------------------
# Supervised sanity-check of an embedding space: per-label centroids from a
# deterministic 80% train split (vec_id % 5 != 0), held-out 20% classified
# to the nearest centroid, confusion matrix out. All arithmetic is exact:
# embeddings quantize to integer micros, and instead of dividing the
# centroid sum s by the per-label count n (floor-div of NEGATIVE sums
# differs between engines: DuckDB floors, Spark truncates), the distance
# to centroid s/n is compared via the n²-scaled integer form
# Σ(n·v − s)² / n² — floor-divided only once, on a positive value, with a
# label tie-break. Scale: the centroid table is labels×dims (tiny,
# broadcast); the test side is one exploded scan grouped per (vec, label).
@register(
    "q_nearest_centroid",
    """
    WITH q AS (
      SELECT vec_id, label, generate_subscripts(embedding, 1) - 1 AS d,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS vq
      FROM embeddings
    ), cent AS (
      SELECT label AS cand, d, CAST(SUM(vq) AS HUGEINT) AS s, CAST(COUNT(*) AS HUGEINT) AS n
      FROM q WHERE vec_id % 5 <> 0 GROUP BY label, d
    ), dist AS (
      SELECT t.vec_id, t.label AS true_label, c.cand, c.n,
             SUM((c.n * t.vq - c.s) * (c.n * t.vq - c.s)) AS dd
      FROM q t JOIN cent c ON c.d = t.d
      WHERE t.vec_id % 5 = 0
      GROUP BY t.vec_id, t.label, c.cand, c.n
    ), ranked AS (
      SELECT vec_id, true_label, cand,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY dd * 1000000 // (n * n), cand) AS rk
      FROM dist
    )
    SELECT CAST(true_label AS BIGINT) AS true_label,
           CAST(cand AS BIGINT) AS pred_label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs
    FROM ranked WHERE rk = 1
    GROUP BY true_label, cand
    """,
    description="nearest-centroid classifier over embeddings: 80/20 split, exact-integer argmin, confusion matrix",
)
def q_nearest_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    dec38 = "decimal(38,0)"
    q = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("d", "v"),
    ).select(
        "vec_id",
        "label",
        "d",
        F.floor(F.col("v").cast("double") * 1000000.0).cast("long").alias("vq"),
    )
    cent = (
        q.filter(F.col("vec_id") % 5 != 0)
        .groupBy(F.col("label").alias("cand"), "d")
        .agg(F.sum("vq").cast(dec38).alias("s"), F.count(F.lit(1)).cast(dec38).alias("n"))
    )
    t = q.filter(F.col("vec_id") % 5 == 0)
    term = (F.col("n") * F.col("vq") - F.col("s"))
    dist = (
        t.join(broadcast(cent), "d")
        .groupBy("vec_id", F.col("label").alias("true_label"), "cand", "n")
        .agg(F.sum(term * term).alias("dd"))
    )
    # argmin as ONE aggregate (r15): min over the struct (quantized
    # distance, cand) — cand is unique per vec_id (one row per candidate
    # centroid), so the struct-min picks exactly the former
    # row_number()==1 row, with map-side partial aggregation instead of a
    # per-vec_id shuffle+sort. true_label is per-vec_id constant and rides
    # in the grouping key.
    best = (
        dist.groupBy("vec_id", "true_label")
        .agg(
            F.min(
                F.struct(F.expr("dd * 1000000 div (n * n)").alias("__k"), F.col("cand"))
            ).alias("__b")
        )
    )
    return (
        best.groupBy(
            F.col("true_label").cast("long").alias("true_label"),
            F.col("__b.cand").cast("long").alias("pred_label"),
        )
        .agg(F.count(F.lit(1)).alias("n_vecs"))
    )


# --- Johnson-Lindenstrauss projection audit ----------------------------------
# Random-projection dimensionality reduction 64 → 16 with a DETERMINISTIC
# ±1 matrix (sign from md5 of "in-dim_out-dim" — reproducible on any
# engine, no stored matrix), then a distance-preservation audit: for every
# pair in a 120-vector sample, the ratio ‖Py‖²/(k·‖x‖²) is bucketed into
# 0.2-wide bands. Integer micros end-to-end — the projection is a signed
# integer sum, both distances are exact integer quadratics, and the ratio
# is one positive floor-division. Scale: projection is a per-row map
# (exploded join against a 16-row broadcast dim table); only the bounded
# audit sample is ever self-joined.
@register(
    "q_jl_projection",
    """
    WITH q AS (
      SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS vq
      FROM embeddings WHERE vec_id < 120
    ), proj AS (
      SELECT q.vec_id, j.j,
             CAST(SUM(CASE WHEN substr(md5(CAST(q.d AS VARCHAR) || '_' || CAST(j.j AS VARCHAR)), 1, 1)
                            IN ('0','2','4','6','8','a','c','e')
                       THEN q.vq ELSE -q.vq END) AS HUGEINT) AS y
      FROM q CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j) j
      GROUP BY q.vec_id, j.j
    ), dx AS (
      SELECT a.vec_id AS va, b.vec_id AS vb,
             CAST(SUM((a.vq - b.vq) * (a.vq - b.vq)) AS HUGEINT) AS dx2
      FROM q a JOIN q b ON a.d = b.d AND a.vec_id < b.vec_id
      GROUP BY a.vec_id, b.vec_id
    ), dy AS (
      SELECT a.vec_id AS va, b.vec_id AS vb, SUM((a.y - b.y) * (a.y - b.y)) AS dy2
      FROM proj a JOIN proj b ON a.j = b.j AND a.vec_id < b.vec_id
      GROUP BY a.vec_id, b.vec_id
    )
    SELECT CAST(dy2 * 1000000 // (dx2 * 16) // 200000 AS BIGINT) AS ratio_band,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM dx JOIN dy USING (va, vb)
    WHERE dx2 > 0
    GROUP BY 1
    """,
    description="JL ±1 random projection 64->16 (md5-derived signs) with pairwise distance-preservation bands",
)
def q_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    dec38 = "decimal(38,0)"
    q = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 120)
        .select("vec_id", F.posexplode("embedding").alias("d", "v"))
        .select(
            "vec_id",
            "d",
            F.floor(F.col("v").cast("double") * 1000000.0).cast("long").alias("vq"),
        )
    )
    dims = spark.range(16).select(F.col("id").cast("int").alias("j"))
    sign_even = F.substring(
        F.md5(F.concat(F.col("d").cast("string"), F.lit("_"), F.col("j").cast("string"))), 1, 1
    ).isin("0", "2", "4", "6", "8", "a", "c", "e")
    proj = (
        q.join(broadcast(dims))
        .groupBy("vec_id", "j")
        .agg(
            F.sum(F.when(sign_even, F.col("vq")).otherwise(-F.col("vq")))
            .cast(dec38)
            .alias("y")
        )
    )
    qa = q.select(F.col("vec_id").alias("va"), "d", F.col("vq").alias("vqa"))
    qb = q.select(F.col("vec_id").alias("vb"), "d", F.col("vq").alias("vqb"))
    dx = (
        qa.join(qb, "d")
        .filter(F.col("va") < F.col("vb"))
        .groupBy("va", "vb")
        .agg(
            F.sum((F.col("vqa") - F.col("vqb")) * (F.col("vqa") - F.col("vqb")))
            .cast(dec38)
            .alias("dx2")
        )
    )
    pa = proj.select(F.col("vec_id").alias("va"), "j", F.col("y").alias("ya"))
    pb = proj.select(F.col("vec_id").alias("vb"), "j", F.col("y").alias("yb"))
    dy = (
        pa.join(pb, "j")
        .filter(F.col("va") < F.col("vb"))
        .groupBy("va", "vb")
        .agg(F.sum((F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))).alias("dy2"))
    )
    return (
        dx.join(dy, ["va", "vb"])
        .filter(F.col("dx2") > 0)
        .groupBy(
            F.expr("CAST(dy2 * 1000000 div (dx2 * 16) div 200000 AS BIGINT)").alias("ratio_band")
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# --- label propagation (community detection) ---------------------------------
# Synchronous label propagation on the co-purchase graph (same weight-≥2
# edge set as q_copurchase_triangles): every node starts as its own label
# and, for 3 rounds, adopts the most frequent label among its neighbors
# (ties → smallest label, making the sync update fully deterministic).
# Per round: one join on node id + one (node,label) count + one top-1
# window — shuffle keys are node ids only, never data-proportional rows,
# and each round's label table is one row per node. The unrolled 3-round
# oracle proves the distributed loop step-for-step.
@register(
    "q_label_prop",
    """
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    sym AS (SELECT pa AS u, pb AS v FROM edges UNION ALL SELECT pb, pa FROM edges),
    l0 AS (SELECT DISTINCT u AS node, u AS lbl FROM sym),
    c1 AS (
      SELECT s.u AS node, l.lbl, COUNT(*) AS c
      FROM sym s JOIN l0 l ON l.node = s.v GROUP BY s.u, l.lbl
    ), l1 AS (
      SELECT node, lbl FROM (
        SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rk
        FROM c1) WHERE rk = 1
    ),
    c2 AS (
      SELECT s.u AS node, l.lbl, COUNT(*) AS c
      FROM sym s JOIN l1 l ON l.node = s.v GROUP BY s.u, l.lbl
    ), l2 AS (
      SELECT node, lbl FROM (
        SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rk
        FROM c2) WHERE rk = 1
    ),
    c3 AS (
      SELECT s.u AS node, l.lbl, COUNT(*) AS c
      FROM sym s JOIN l2 l ON l.node = s.v GROUP BY s.u, l.lbl
    ), l3 AS (
      SELECT node, lbl FROM (
        SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rk
        FROM c3) WHERE rk = 1
    )
    SELECT CAST(lbl AS BIGINT) AS community,
           CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM l3 GROUP BY lbl
    ORDER BY n_nodes DESC, community
    LIMIT 20
    """,
    description="3-round synchronous label propagation on the co-purchase graph (deterministic ties)",
)
def q_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    # edges via the shared basket-array pair stream (r14): one shuffle,
    # no self-join — see _copurchase_edges / _pairs_from_arrays
    edges = _copurchase_edges(spark, sf_dir)
    sym = edges.select(F.col("pa").alias("u"), F.col("pb").alias("v")).unionAll(
        edges.select(F.col("pb").alias("u"), F.col("pa").alias("v"))
    )
    lbl = sym.select(F.col("u").alias("node")).distinct().withColumn("lbl", F.col("node"))
    for _ in range(3):
        cnt = (
            sym.join(lbl.select(F.col("node").alias("v"), "lbl"), "v")
            .groupBy(F.col("u").alias("node"), "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # argmax by (c DESC, lbl ASC) as ONE aggregate (r14): max_by over
        # the struct (c, -lbl) picks the same winner as the former
        # row_number window (ties only at equal c AND equal lbl = same
        # row), but gets map-side partial aggregation instead of a full
        # (node)-partitioned sort — one lighter exchange per round.
        lbl = cnt.groupBy("node").agg(
            F.expr("max_by(lbl, struct(c, -lbl))").alias("lbl")
        )
    return (
        lbl.groupBy(F.col("lbl").alias("community"))
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy(F.desc("n_nodes"), "community")
        .limit(20)
    )


# --- k-means (Lloyd) over embeddings -----------------------------------------
# Exact-integer distributed Lloyd: k=8 centroids seeded from vec_id 0..7,
# then assign→update→assign→update→assign (3 assignment rounds). As in
# q_nearest_centroid the rational centroid s/n is never materialized —
# assignment compares the n²-scaled integer distance Σ(n·v − s)² via one
# positive floor-division with a cluster-id tie-break, so both engines
# take identical argmins. Per round: one exploded-scan join against the
# k×dims broadcast centroid table + one (cluster,dim) re-aggregate; no
# driver-side state, cluster count bounds every broadcast. Reports member
# count and within-cluster SSE (micro² units) per final cluster.
@register(
    "q_kmeans_lloyd",
    """
    WITH q AS (
      SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS vq
      FROM embeddings
    ), c0 AS (
      SELECT vec_id AS cl, d, CAST(vq AS HUGEINT) AS s, CAST(1 AS HUGEINT) AS n
      FROM q WHERE vec_id < 8
    ),
    d1 AS (
      SELECT t.vec_id, c.cl, c.n, SUM((c.n * t.vq - c.s) * (c.n * t.vq - c.s)) AS dd
      FROM q t JOIN c0 c ON c.d = t.d GROUP BY t.vec_id, c.cl, c.n
    ), a1 AS (
      SELECT vec_id, cl FROM (
        SELECT vec_id, cl, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dd // (n * n), cl) AS rk
        FROM d1) WHERE rk = 1
    ), c1 AS (
      SELECT a.cl, t.d, CAST(SUM(t.vq) AS HUGEINT) AS s, CAST(COUNT(*) AS HUGEINT) AS n
      FROM q t JOIN a1 a USING (vec_id) GROUP BY a.cl, t.d
    ),
    d2 AS (
      SELECT t.vec_id, c.cl, c.n, SUM((c.n * t.vq - c.s) * (c.n * t.vq - c.s)) AS dd
      FROM q t JOIN c1 c ON c.d = t.d GROUP BY t.vec_id, c.cl, c.n
    ), a2 AS (
      SELECT vec_id, cl FROM (
        SELECT vec_id, cl, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dd // (n * n), cl) AS rk
        FROM d2) WHERE rk = 1
    ), c2 AS (
      SELECT a.cl, t.d, CAST(SUM(t.vq) AS HUGEINT) AS s, CAST(COUNT(*) AS HUGEINT) AS n
      FROM q t JOIN a2 a USING (vec_id) GROUP BY a.cl, t.d
    ),
    d3 AS (
      SELECT t.vec_id, c.cl, c.n, SUM((c.n * t.vq - c.s) * (c.n * t.vq - c.s)) AS dd
      FROM q t JOIN c2 c ON c.d = t.d GROUP BY t.vec_id, c.cl, c.n
    ), a3 AS (
      SELECT vec_id, cl, dd, n FROM (
        SELECT vec_id, cl, dd, n,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dd // (n * n), cl) AS rk
        FROM d3) WHERE rk = 1
    )
    SELECT CAST(cl AS BIGINT) AS cluster,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(dd // (n * n)) AS BIGINT) AS sse_q2
    FROM a3 GROUP BY cl
    ORDER BY cluster
    """,
    description="distributed Lloyd k-means (k=8, 3 assignment rounds) with exact-integer argmin",
)
def q_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    dec38 = "decimal(38,0)"
    q = (
        _t(spark, sf_dir, "embeddings")
        .select("vec_id", F.posexplode("embedding").alias("d", "v"))
        .select(
            "vec_id",
            "d",
            F.floor(F.col("v").cast("double") * 1000000.0).cast("long").alias("vq"),
        )
        # consumed by every assignment and update round
        .localCheckpoint()
    )
    cent = q.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cl"),
        "d",
        F.col("vq").cast(dec38).alias("s"),
        F.lit(1).cast(dec38).alias("n"),
    )
    def assign(c: DataFrame) -> DataFrame:
        term = (F.col("n") * F.col("vq") - F.col("s"))
        d = (
            q.join(broadcast(c), "d")
            .groupBy("vec_id", "cl", "n")
            .agg(F.sum(term * term).alias("dd"))
        )
        # argmin as ONE aggregate (r15): min over the struct (quantized
        # distance, cl, n, dd) — cl is unique per vec_id, so the first two
        # fields already identify the former row_number()==1 row and the
        # (n, dd) tail is payload, never reached by the comparison. Each
        # of the three assignment rounds loses its per-vec_id sort+window
        # in favor of a partially-aggregated hash exchange.
        return (
            d.groupBy("vec_id")
            .agg(
                F.min(
                    F.struct(
                        F.expr("dd div (n * n)").alias("__k"),
                        F.col("cl"),
                        F.col("n"),
                        F.col("dd"),
                    )
                ).alias("__b")
            )
            .select("vec_id", "__b.cl", "__b.n", "__b.dd")
        )

    def update(a: DataFrame) -> DataFrame:
        return (
            q.join(a.select("vec_id", "cl"), "vec_id")
            .groupBy("cl", "d")
            .agg(F.sum("vq").cast(dec38).alias("s"), F.count(F.lit(1)).cast(dec38).alias("n"))
        )

    a = assign(cent)
    for _ in range(2):
        a = assign(update(a))
    return (
        a.groupBy(F.col("cl").cast("long").alias("cluster"))
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(F.expr("dd div (n * n)")).cast("long").alias("sse_q2"),
        )
        .orderBy("cluster")
    )


# --- last-touch attribution --------------------------------------------------
# Marketing-style credit assignment: each purchase is attributed to the
# latest click/view by the same user within a 30-minute lookback, else
# 'none'. One pass over the per-user event stream: touches and purchases
# interleave in one window ordered by (ts, event_id), and the carried
# "latest touch" is an INTEGER encoding ts_us*10 + type_code so a single
# running MAX carries both the touch time and its channel (a struct-max
# would not cross engines). Shuffle key is user_id only; output is one row
# per channel. The decode and the 30-minute cutoff are exact integer ops.
@register(
    "q_ev_attribution",
    """
    WITH ev AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events
    ), stream AS (
      SELECT user_id, event_id, ts_us, event_type,
             MAX(CASE WHEN event_type = 'click' THEN ts_us * 10 + 1
                      WHEN event_type = 'view'  THEN ts_us * 10 + 2 END)
               OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt
      FROM ev
    ), attributed AS (
      SELECT CASE WHEN lt IS NULL OR ts_us - lt // 10 > 1800000000 THEN 'none'
                  WHEN lt % 10 = 1 THEN 'click' ELSE 'view' END AS channel,
             CASE WHEN lt IS NULL OR ts_us - lt // 10 > 1800000000 THEN NULL
                  ELSE ts_us - lt // 10 END AS latency_us
      FROM stream WHERE event_type = 'purchase'
    )
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(COALESCE(SUM(latency_us), 0) AS BIGINT) AS total_latency_us
    FROM attributed GROUP BY channel
    """,
    description="last-touch purchase attribution (30-min lookback, integer-encoded channel carry)",
)
def q_ev_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts_us", "event_type")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    enc = F.when(F.col("event_type") == "click", F.col("ts_us") * 10 + 1).when(
        F.col("event_type") == "view", F.col("ts_us") * 10 + 2
    )
    stream = ev.withColumn("lt", F.max(enc).over(w))
    stale = F.col("lt").isNull() | (F.col("ts_us") - F.expr("lt div 10") > 1_800_000_000)
    attributed = stream.filter(F.col("event_type") == "purchase").select(
        F.when(stale, "none")
        .when(F.col("lt") % 10 == 1, "click")
        .otherwise("view")
        .alias("channel"),
        F.when(stale, F.lit(None).cast("long"))
        .otherwise(F.col("ts_us") - F.expr("lt div 10"))
        .alias("latency_us"),
    )
    return attributed.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.coalesce(F.sum("latency_us"), F.lit(0)).cast("long").alias("total_latency_us"),
    )


# --- hour-of-day seasonal profile --------------------------------------------
# The diurnal baseline every rate-anomaly monitor needs: events are
# bucketed by calendar hour, then calendar hours fold into the 24
# hour-of-day slots — mean events per occupied hour, the slot's share of
# all traffic, and a peak ratio vs the flattest slot, all in exact integer
# micro units. Two aggregations, both on bounded keys (calendar hours,
# then 24 slots); the profile itself is what a streaming monitor would
# broadcast back against live rates.
@register(
    "q_ev_seasonal",
    """
    WITH hourly AS (
      SELECT epoch_us(ts) // 3600000000 AS h, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ), slot AS (
      SELECT h % 24 AS hod, CAST(COUNT(*) AS BIGINT) AS n_hours,
             CAST(SUM(x) AS BIGINT) AS total
      FROM hourly GROUP BY h % 24
    ), g AS (
      SELECT CAST(SUM(total) AS BIGINT) AS grand,
             MIN(total * 1000000 // n_hours) AS min_rate
      FROM slot
    )
    SELECT CAST(hod AS BIGINT) AS hour_of_day, n_hours, total,
           total * 1000000 // n_hours            AS mean_per_hour_micro,
           total * 1000000 // grand              AS share_micro,
           (total * 1000000 // n_hours) * 1000000 // min_rate AS peak_ratio_micro
    FROM slot CROSS JOIN g
    ORDER BY hour_of_day
    """,
    description="hour-of-day seasonal traffic profile (mean rate, share, peak ratio; exact integers)",
)
def q_ev_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = (
        _t(spark, sf_dir, "events")
        .groupBy(F.expr("ts_us div 3600000000").alias("h"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    slot = hourly.groupBy((F.col("h") % 24).alias("hod")).agg(
        F.count(F.lit(1)).alias("n_hours"), F.sum("x").alias("total")
    )
    g = slot.agg(
        F.sum("total").cast("long").alias("grand"),
        F.min(F.expr("total * 1000000 div n_hours")).alias("min_rate"),
    )
    return (
        slot.join(broadcast(g))
        .select(
            F.col("hod").cast("long").alias("hour_of_day"),
            "n_hours",
            "total",
            F.expr("total * 1000000 div n_hours").alias("mean_per_hour_micro"),
            F.expr("total * 1000000 div grand").alias("share_micro"),
            F.expr("(total * 1000000 div n_hours) * 1000000 div min_rate").alias(
                "peak_ratio_micro"
            ),
        )
        .orderBy("hour_of_day")
    )


# --- RFM customer segmentation -----------------------------------------------
# The classic behavioral segmentation: recency (days since last order,
# against the corpus max date), frequency (order count), monetary (exact
# decimal total), each scored into quintiles with a FULLY deterministic
# ntile ordering (metric + custkey tie-break — ntile is position-based, so
# both engines cut identical buckets given identical total orders).
# Output is the segment-cell census. One shuffle for the per-customer
# rollup; the quintile windows run over the customer table, not the facts.
@register(
    "q_rfm_segments",
    """
    WITH per_cust AS (
      SELECT o_custkey AS custkey,
             CAST(MAX(epoch_us(o_orderdate)) AS BIGINT) AS last_us,
             CAST(COUNT(*) AS BIGINT) AS freq,
             SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS monetary
      FROM orders GROUP BY o_custkey
    ), g AS (SELECT MAX(last_us) AS now_us FROM per_cust),
    scored AS (
      SELECT custkey,
             (now_us - last_us) // 86400000000 AS recency_days,
             freq, monetary,
             CAST(ntile(5) OVER (ORDER BY (now_us - last_us) // 86400000000, custkey) AS BIGINT) AS r_score,
             CAST(ntile(5) OVER (ORDER BY freq DESC, custkey) AS BIGINT) AS f_score,
             CAST(ntile(5) OVER (ORDER BY monetary DESC, custkey) AS BIGINT) AS m_score
      FROM per_cust CROSS JOIN g
    )
    SELECT r_score, f_score, m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(monetary) AS DOUBLE) AS segment_value
    FROM scored GROUP BY r_score, f_score, m_score
    """,
    description="RFM quintile segmentation of customers (deterministic ntile cuts, segment census)",
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_cust = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max(F.unix_micros(F.col("o_orderdate").cast("timestamp"))).alias("last_us"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(F.col("o_totalprice").cast("decimal(27,6)")).alias("monetary"),
        )
    )
    g = per_cust.agg(F.max("last_us").alias("now_us"))
    scored = (
        per_cust.join(broadcast(g))
        .withColumn("recency_days", F.expr("(now_us - last_us) div 86400000000"))
        .withColumn(
            "r_score",
            F.ntile(5).over(Window.orderBy("recency_days", "custkey")).cast("long"),
        )
        .withColumn(
            "f_score",
            F.ntile(5).over(Window.orderBy(F.desc("freq"), "custkey")).cast("long"),
        )
        .withColumn(
            "m_score",
            F.ntile(5).over(Window.orderBy(F.desc("monetary"), "custkey")).cast("long"),
        )
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("monetary").cast("double").alias("segment_value"),
    )


# --- embedding outlier detection ---------------------------------------------
# Corpus-level embedding quality gate: distance to the GLOBAL centroid,
# top-20 farthest vectors — the "junk vector" screen run before any
# clustering/ANN build trusts the space. Same exact-integer n²-scaled
# distance trick as q_nearest_centroid (the centroid is never divided
# out); the centroid is one dims-sized broadcast, the distances are one
# exploded scan + per-vector aggregate.
@register(
    "q_embed_outliers",
    """
    WITH q AS (
      SELECT vec_id, label, generate_subscripts(embedding, 1) - 1 AS d,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS vq
      FROM embeddings
    ), cent AS (
      SELECT d, CAST(SUM(vq) AS HUGEINT) AS s, CAST(COUNT(*) AS HUGEINT) AS n
      FROM q GROUP BY d
    ), dist AS (
      SELECT t.vec_id, t.label, SUM((c.n * t.vq - c.s) * (c.n * t.vq - c.s)) // (MAX(c.n) * MAX(c.n)) AS dist_q2
      FROM q t JOIN cent c USING (d)
      GROUP BY t.vec_id, t.label
    )
    SELECT vec_id, CAST(label AS BIGINT) AS label, CAST(dist_q2 AS BIGINT) AS dist_q2
    FROM dist ORDER BY dist_q2 DESC, vec_id LIMIT 20
    """,
    description="embedding outlier screen: top-20 farthest vectors from the global centroid (exact integers)",
)
def q_embed_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    dec38 = "decimal(38,0)"
    q = (
        _t(spark, sf_dir, "embeddings")
        .select("vec_id", "label", F.posexplode("embedding").alias("d", "v"))
        .select(
            "vec_id",
            "label",
            "d",
            F.floor(F.col("v").cast("double") * 1000000.0).cast("long").alias("vq"),
        )
    )
    cent = q.groupBy("d").agg(
        F.sum("vq").cast(dec38).alias("s"), F.count(F.lit(1)).cast(dec38).alias("n")
    )
    dist = (
        q.join(broadcast(cent), "d")
        .groupBy("vec_id", "label")
        .agg(F.expr("CAST(SUM((n * vq - s) * (n * vq - s)) div (MAX(n) * MAX(n)) AS BIGINT)").alias("dist_q2"))
    )
    return (
        dist.select("vec_id", F.col("label").cast("long").alias("label"), "dist_q2")
        .orderBy(F.desc("dist_q2"), "vec_id")
        .limit(20)
    )


# --- session path mining -----------------------------------------------------
# Which event-type journeys dominate, and which convert: sessions are the
# same 10-minute-gap windows as q_ev_session, each session's first 8
# events concatenate into a path string (the cap bounds path cardinality
# — real path miners always truncate), and the top-15 paths report volume
# and conversion (contains 'purchase'). Everything orders on the unique
# (ts, event_id) key, so the path strings are bit-identical across
# engines. Shuffle keys: user_id (sessionize), then the bounded path
# strings.
@register(
    "q_ev_paths",
    """
    WITH o AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
             LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
      FROM events
    ), s AS (
      SELECT user_id, event_id, event_type, ts_us,
             SUM(CASE WHEN prev_us IS NULL OR ts_us - prev_us >= 600000000 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      FROM o
    ), capped AS (
      SELECT user_id, sess, event_type, ts_us, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id, sess ORDER BY ts_us, event_id) AS rn
      FROM s
    ), paths AS (
      SELECT user_id, sess,
             string_agg(event_type, '>' ORDER BY ts_us, event_id) AS path
      FROM capped WHERE rn <= 8 GROUP BY user_id, sess
    )
    SELECT path,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN path LIKE '%purchase%' THEN 1 ELSE 0 END) AS BIGINT) AS n_converting
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT 15
    """,
    description="session path mining: top event-type journeys (8-event cap) with conversion counts",
)
def q_ev_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts_us")
    wu = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    s = (
        ev.withColumn("prev_us", F.lag("ts_us").over(wu))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev_us").isNull() | (F.col("ts_us") - F.col("prev_us") >= 600_000_000), 1
            ).otherwise(0),
        )
        .withColumn("sess", F.sum("new_sess").over(wu.rowsBetween(Window.unboundedPreceding, 0)))
    )
    capped = s.withColumn(
        "rn", F.row_number().over(Window.partitionBy("user_id", "sess").orderBy("ts_us", "event_id"))
    ).filter(F.col("rn") <= 8)
    paths = capped.groupBy("user_id", "sess").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts_us", "event_id", "event_type"))),
                lambda x: x.event_type,
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum(F.when(F.col("path").contains("purchase"), 1).otherwise(0))
            .cast("long")
            .alias("n_converting"),
        )
        .orderBy(F.desc("n_sessions"), "path")
        .limit(15)
    )


# --- k-hop BFS reachability ----------------------------------------------------
# Graph traversal on the co-purchase graph (same weight-≥2 edge set as
# q_copurchase_triangles): from the 5 smallest node ids, the cumulative
# number of distinct nodes reachable within 1, 2, and 3 hops. Per round:
# one equi-join of the frontier on node id + one distinct — the standard
# distributed BFS expansion, shuffle keys are node ids only. The unrolled
# 3-round oracle proves the loop step-for-step. Reachability is the
# primitive behind blast-radius analysis and graph-feature extraction.
@register(
    "q_bfs_khop",
    """
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    sym AS MATERIALIZED (SELECT pa AS u, pb AS v FROM edges UNION ALL SELECT pb, pa FROM edges),
    seeds AS (SELECT u AS seed FROM (SELECT DISTINCT u FROM sym) ORDER BY u LIMIT 5),
    r0 AS (SELECT seed, seed AS node FROM seeds),
    r1 AS MATERIALIZED (
      SELECT DISTINCT seed, node FROM (
        SELECT seed, node FROM r0
        UNION ALL
        SELECT r.seed, s.v AS node FROM r0 r JOIN sym s ON s.u = r.node)
    ),
    r2 AS MATERIALIZED (
      SELECT DISTINCT seed, node FROM (
        SELECT seed, node FROM r1
        UNION ALL
        SELECT r.seed, s.v AS node FROM r1 r JOIN sym s ON s.u = r.node)
    ),
    r3 AS MATERIALIZED (
      SELECT DISTINCT seed, node FROM (
        SELECT seed, node FROM r2
        UNION ALL
        SELECT r.seed, s.v AS node FROM r2 r JOIN sym s ON s.u = r.node)
    )
    -- grouped joins, not per-seed correlated COUNT subqueries: DuckDB
    -- inlines a non-materialized CTE chain once PER correlated subquery,
    -- re-running the whole r1->r2->r3 expansion 15 times (5 seeds x 3) —
    -- measured as an out-of-disk IOException at sf1. Each seed is a member
    -- of its own rK set, so the inner joins are total.
    SELECT s.seed,
           CAST(c1.n - 1 AS BIGINT) AS n_1hop,
           CAST(c2.n - 1 AS BIGINT) AS n_2hop,
           CAST(c3.n - 1 AS BIGINT) AS n_3hop
    FROM seeds s
    JOIN (SELECT seed, COUNT(*) AS n FROM r1 GROUP BY seed) c1 ON c1.seed = s.seed
    JOIN (SELECT seed, COUNT(*) AS n FROM r2 GROUP BY seed) c2 ON c2.seed = s.seed
    JOIN (SELECT seed, COUNT(*) AS n FROM r3 GROUP BY seed) c3 ON c3.seed = s.seed
    ORDER BY s.seed
    """,
    description=(
        "k-hop BFS reachability from 5 seed nodes on the co-purchase graph"
        " (cumulative distinct nodes at 1/2/3 hops, unrolled oracle)"
    ),
)
def q_bfs_khop(spark: SparkSession, sf_dir: str) -> DataFrame:
    # edges via the shared basket-array pair stream (r14): one shuffle,
    # no self-join — see _copurchase_edges / _pairs_from_arrays
    edges = _copurchase_edges(spark, sf_dir)
    sym = edges.select(F.col("pa").alias("u"), F.col("pb").alias("v")).unionAll(
        edges.select(F.col("pb").alias("u"), F.col("pa").alias("v"))
    )
    seeds = (
        sym.select("u").distinct().orderBy("u").limit(5).select(F.col("u").alias("seed"))
    )
    # min-hop BFS (r14): carry each node's FIRST-reached hop instead of a
    # plain distinct set. The reach set after round k is identical (a node
    # is in the cumulative union iff its min hop <= k), but (a) only the
    # FRONTIER (hop == k-1) needs expanding — any neighbor of an earlier
    # layer is already present, the standard BFS invariant — and (b) all
    # three per-hop counts fall out of ONE final aggregation over min-hop
    # instead of three groupBy+join legs (29 -> fewer jobs, 3 fewer AQE
    # join stages).
    reach = seeds.select("seed", F.col("seed").alias("node"), F.lit(0).alias("hop"))
    for hop in (1, 2, 3):
        frontier = reach.filter(F.col("hop") == hop - 1)
        expanded = frontier.join(sym, frontier.node == sym.u).select(
            "seed", F.col("v").alias("node"), F.lit(hop).alias("hop")
        )
        reach = (
            reach.unionByName(expanded)
            .groupBy("seed", "node")
            .agg(F.min("hop").alias("hop"))
        )
        # mid-loop rounds are consumed TWICE next round (frontier filter +
        # union) — checkpoint them; the final round feeds ONE consumer (the
        # closing aggregate), so its eager materialization job was pure
        # waste (r15)
        if hop < 3:
            reach = reach.localCheckpoint()
    return (
        reach.groupBy("seed")
        .agg(
            *[
                (F.sum((F.col("hop") <= h).cast("long")) - 1).alias(f"n_{h}hop")
                for h in (1, 2, 3)
            ]
        )
        .orderBy("seed")
    )


# --- item-item collaborative filtering ----------------------------------------
# The recommender primitive next to q_assoc_rules' support/confidence: for
# co-purchased item pairs (co-occurrence >= 2), the cosine similarity of
# the items' basket-membership vectors — cos(i,j) = c_ij / sqrt(c_i*c_j),
# reported EXACTLY as cosine² in integer micro units
# (c_ij² * 1e6 // (c_i*c_j)) so no float ever enters the hash. Plan: one
# distinct scan, one self-join restricted by basket key, two UN-hinted
# item-count equi-joins (the count table scales with the part catalog, so
# AQE decides broadcast vs shuffle at runtime) — pair blow-up bounded by
# basket size as in Apriori.
@register(
    "q_item_cf",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
    ),
    cnt AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS c FROM items GROUP BY item),
    pairs AS (
      SELECT a.item AS item_a, b.item AS item_b, CAST(COUNT(*) AS BIGINT) AS c_ab
      FROM items a JOIN items b ON a.basket = b.basket AND a.item < b.item
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )
    SELECT item_a, item_b, c_ab,
           c_ab * c_ab * 1000000 // (ca.c * cb.c) AS cos2_micro
    FROM pairs
    JOIN cnt ca ON ca.item = pairs.item_a
    JOIN cnt cb ON cb.item = pairs.item_b
    ORDER BY cos2_micro DESC, item_a, item_b
    LIMIT 30
    """,
    description=(
        "item-item collaborative filtering: basket-vector cosine² of"
        " co-purchased pairs in exact integer micro units, top-30"
    ),
)
def q_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # basket arrays materialized ONCE (r14): the per-item counts and the
    # pair stream both read the checkpointed per-basket item sets — one
    # groupBy(basket) shuffle replaces the distinct checkpoint + two-sided
    # basket self-join (guide §2.4); pair multiset identical by
    # construction (see _pairs_from_arrays).
    baskets = _basket_arrays(
        _t(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
        ),
        "basket",
        "item",
    ).localCheckpoint()
    cnt = (
        baskets.select(F.explode("__items").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pairs = (
        _pairs_from_arrays(baskets)
        .groupBy(F.col("pa").alias("item_a"), F.col("pb").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= 2)
    )
    # per-item basket counts scale with the part catalog — never hint them
    # broadcast; plain equi-joins let AQE pick broadcast only when it fits
    ca = cnt.select(F.col("item").alias("item_a"), F.col("c").alias("c_a"))
    cb = cnt.select(F.col("item").alias("item_b"), F.col("c").alias("c_b"))
    return (
        pairs.join(ca, "item_a")
        .join(cb, "item_b")
        .select(
            "item_a",
            "item_b",
            "c_ab",
            F.expr("c_ab * c_ab * 1000000 div (c_a * c_b)").alias("cos2_micro"),
        )
        .orderBy(F.desc("cos2_micro"), "item_a", "item_b")
        .limit(30)
    )
