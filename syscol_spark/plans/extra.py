"""Extended relational coverage: cube, ntile/percent_rank/cume_dist,
date/string scalar functions, scalar + correlated subqueries, array
aggregation, non-equi semi join, multimodal feature pipeline.
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


@register(
    "q_cube",
    """
    SELECT COALESCE(o_orderstatus, 'ALL')    AS status,
           COALESCE(o_orderpriority, 'ALL')  AS priority,
           COUNT(*)                          AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE)       AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    description="CUBE grouping sets over two dimensions",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
    )


@register(
    "q_window_distribution",
    """
    SELECT o_orderkey,
           CAST(ntile(4) OVER w AS BIGINT)        AS quartile,
           ROUND(percent_rank() OVER w, 6)        AS pct_rank,
           ROUND(cume_dist() OVER w, 6)           AS cume
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    """,
    description="distribution window functions: ntile, percent_rank, cume_dist",
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "q_date_functions",
    """
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER)    AS yr,
           CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS qtr,
           COUNT(*)                                           AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE)                        AS total
    FROM orders
    GROUP BY 1, 2
    """,
    description="temporal scalar functions: year/quarter extraction + agg",
)
def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").alias("yr"), F.quarter("o_orderdate").alias("qtr"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total"))
    )


@register(
    "q_string_functions",
    """
    SELECT upper(substring(c_name, 1, 8))                      AS name_prefix,
           CAST(length(c_name) AS BIGINT)                      AS name_len,
           regexp_extract(c_name, '([0-9]+)', 1)               AS cust_num,
           concat(c_mktsegment, ':', CAST(c_nationkey AS VARCHAR)) AS seg_nation
    FROM customer
    WHERE c_name LIKE '%1%'
    """,
    description="string scalar functions: upper/substring/length/regexp_extract/concat/LIKE",
)
def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.filter(F.col("c_name").like("%1%")).select(
        F.upper(F.substring("c_name", 1, 8)).alias("name_prefix"),
        F.length("c_name").cast("long").alias("name_len"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("cust_num"),
        F.concat_ws(":", "c_mktsegment", F.col("c_nationkey").cast("string")).alias("seg_nation"),
    )


@register(
    "q_scalar_subquery",
    """
    SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS acctbal
    FROM customer
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*) FROM customer)
    """,
    description="uncorrelated scalar subquery in predicate",
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    avg_bal = c.agg(davg("c_acctbal").alias("a"))
    return (
        c.crossJoin(broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal"))
    )


@register(
    "q_correlated_avg",
    """
    SELECT s_suppkey, s_name, ROUND(s_acctbal, 2) AS acctbal
    FROM supplier s
    WHERE s_acctbal > (SELECT CAST(SUM(CAST(s2.s_acctbal AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*) FROM supplier s2
                       WHERE s2.s_nationkey = s.s_nationkey)
    """,
    description="correlated aggregate subquery (decorrelated to window avg)",
)
def q_correlated_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Decorrelation by hand: per-nation average via window — one shuffle,
    # no join, the plan Catalyst itself would rewrite the subquery into.
    s = _t(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey")
    return (
        s.withColumn("nation_avg", F.sum(dec6("s_acctbal")).over(w).cast("double") / F.count(F.lit(1)).over(w))
        .filter(F.col("s_acctbal") > F.col("nation_avg"))
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("acctbal"))
    )


@register(
    "q_array_agg",
    """
    SELECT n_nationkey,
           array_to_string(list_sort(list(s_suppkey)), ',') AS supplier_ids,
           COUNT(*) AS n_suppliers
    FROM nation JOIN supplier ON n_nationkey = s_nationkey
    GROUP BY n_nationkey
    """,
    description="array aggregation: collect + sort + serialize",
)
def q_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    return (
        s.join(broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_nationkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("s_suppkey")), ",").alias("supplier_ids"),
            F.count(F.lit(1)).alias("n_suppliers"),
        )
    )


@register(
    "q_nonequi_semi_join",
    """
    SELECT o_orderkey, o_orderpriority
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    """,
    description="non-equi (inequality-condition) left-semi join",
)
def q_nonequi_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return o.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    ).select("o_orderkey", "o_orderpriority")


@register(
    "q_pivot",
    """
    SELECT o_orderpriority,
           ROUND(COALESCE("O", 0), 2) AS open_total,
           ROUND(COALESCE("F", 0), 2) AS filled_total,
           ROUND(COALESCE("P", 0), 2) AS pending_total
    FROM (PIVOT orders ON o_orderstatus IN ('O', 'F', 'P')
          USING SUM(o_totalprice) GROUP BY o_orderpriority)
    """,
    description="pivot: status columns from rows",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .sum("o_totalprice")
        .select(
            "o_orderpriority",
            F.round(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("open_total"),
            F.round(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("filled_total"),
            F.round(F.coalesce(F.col("P"), F.lit(0.0)), 2).alias("pending_total"),
        )
    )


@register(
    "q_unpivot",
    """
    WITH wide AS (
      SELECT c_mktsegment,
             CAST(SUM(CAST(CASE WHEN c_nationkey < 10 THEN c_acctbal ELSE 0 END AS DECIMAL(27,6))) AS DOUBLE) AS low_nations,
             CAST(SUM(CAST(CASE WHEN c_nationkey >= 10 THEN c_acctbal ELSE 0 END AS DECIMAL(27,6))) AS DOUBLE) AS high_nations
      FROM customer GROUP BY c_mktsegment
    )
    SELECT c_mktsegment, band, bal
    FROM wide UNPIVOT (bal FOR band IN (low_nations, high_nations))
    """,
    description="unpivot/melt: columns back to rows",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = (
        _t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            dsum(F.when(F.col("c_nationkey") < 10, F.col("c_acctbal")).otherwise(0.0)).alias("low_nations"),
            dsum(F.when(F.col("c_nationkey") >= 10, F.col("c_acctbal")).otherwise(0.0)).alias("high_nations"),
        )
    )
    return wide.unpivot(
        ids=["c_mktsegment"],
        values=["low_nations", "high_nations"],
        variableColumnName="band",
        valueColumnName="bal",
    )


@register(
    "q_argmax",
    """
    SELECT o_custkey,
           arg_max(o_orderkey, CAST(epoch(o_orderdate) AS BIGINT) * 100000000 + o_orderkey) AS latest_orderkey,
           ROUND(arg_max(o_totalprice, CAST(epoch(o_orderdate) AS BIGINT) * 100000000 + o_orderkey), 2) AS latest_price
    FROM orders
    GROUP BY o_custkey
    """,
    description="arg-max aggregation (max_by) with a unique composite key",
)
def q_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    # unique ordering key: (orderdate epoch, orderkey) packed into one long
    key = F.unix_timestamp("o_orderdate") * F.lit(100_000_000).cast("long") + F.col("o_orderkey")
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", key).alias("latest_orderkey"),
        F.round(F.max_by("o_totalprice", key), 2).alias("latest_price"),
    )


@register(
    "q_stats_agg",
    """
    SELECT l_returnflag,
           ROUND(stddev_samp(l_extendedprice), 4) AS sd_price,
           ROUND(var_samp(l_quantity), 4)         AS var_qty,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
           ROUND(median(l_quantity), 4)           AS median_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    description="statistical aggregates: stddev/variance/corr/covar/median",
)
def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
        F.round(F.median("l_quantity"), 4).alias("median_qty"),
    )


@register(
    "q_histogram",
    """
    SELECT CAST(floor(l_discount * 100) AS INTEGER) AS bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) AS total_price
    FROM lineitem
    GROUP BY 1
    """,
    description="histogram bucketing of a continuous column",
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.floor(F.col("l_discount") * 100).cast("int").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_extendedprice").alias("total_price"))
    )


# The stub feature extractor is sha256-expanded bytes (deterministic), so the
# oracle can reproduce it EXACTLY: same counter framing (4-byte BE), same
# uint32/2^31-1 mapping, same double→float32 rounding (both engines IEEE
# round-to-nearest), same left-fold summation order for the norm (Spark
# aggregate starts at 0.0; 0.0+x == x, so list_reduce matches bit-for-bit).
# The norm is emitted UNROUNDED — engine-identical doubles need no rounding,
# and ROUND itself differs across engines at decimal half-points.
# counter framing: 4-byte big-endian via NUL-padded chr() (DuckDB's sha256
# takes VARCHAR and hashes its UTF-8 bytes; chr(c) for c<128 is one byte,
# and chr(0) concatenates cleanly — verified equal to python's
# sha256(utf8 || counter.to_bytes(4,'big')))
_STUB_FEATURE_SQL = """
  list_transform(range(0, 64), j ->
    CAST(CAST(('0x' || substr(sha256(text || chr(0) || chr(0) || chr(0) || chr(CAST(j // 8 AS INTEGER))),
                              (j % 8) * 8 + 1, 8))::BIGINT AS DOUBLE)
         / 2147483648.0 - 1.0 AS REAL))
"""


@register(
    "q_multimodal_features",
    f"""
    SELECT doc_id AS asset_id,
           'image' AS modality,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           list_reduce(list_transform({_STUB_FEATURE_SQL},
                                      f -> CAST(f AS DOUBLE) * CAST(f AS DOUBLE)),
                       (acc, x) -> acc + x) AS feature_sq_norm
    FROM documents
    """,
    description="multimodal decode plumbing: blob → stub feature vector via mapInPandas",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from syscol_spark.operators.multimodal import documents_as_assets, extract_features

    assets = documents_as_assets(_t(spark, sf_dir, "documents"))
    feats = extract_features(assets)
    return feats.select(
        "asset_id",
        "modality",
        "n_bytes",
        F.aggregate(F.transform("feature", lambda x: x.cast("double") * x.cast("double")),
                    F.lit(0.0), lambda a, b: a + b).alias("feature_sq_norm"),
    )


# The frames oracle leans on the documents table being pure ASCII (asserted
# 0 rows with octet_length(encode(text)) != length(text) at every SF), so
# char-based VARCHAR substring in DuckDB equals byte-based binary slicing in
# the Spark operator.
@register(
    "q_multimodal_frames",
    """
    WITH f AS (
      SELECT doc_id AS asset_id, text, length(text) AS len FROM documents
    ), g AS (
      SELECT asset_id, text,
             unnest(generate_series(0, least(8, greatest(1, len // 64)) - 1)) AS i
      FROM f
    )
    SELECT asset_id,
           CAST(i AS INT) AS frame_idx,
           CAST(length(substring(text, i * 64 + 1, 64)) AS BIGINT) AS n_bytes,
           md5(substring(text, i * 64 + 1, 64)) AS frame_md5
    FROM g
    """,
    description="multimodal frame sampling: blob → N frame rows via mapInPandas (video-style sampling)",
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from syscol_spark.operators.multimodal import documents_as_assets, sample_frames

    assets = documents_as_assets(_t(spark, sf_dir, "documents"))
    frames = sample_frames(assets, every_n_bytes=64, max_frames=8)
    return frames.select(
        "asset_id",
        "frame_idx",
        F.length("frame_blob").cast("long").alias("n_bytes"),
        F.md5("frame_blob").alias("frame_md5"),
    )


# Same ASCII-corpus argument as q_multimodal_frames: the stub resize is
# nearest-neighbor BYTE sampling (out[k] = raw[(k*len)//n_out]), which the
# oracle mirrors with char-based substring + a list_transform over the
# output grid.
@register(
    "q_multimodal_resize",
    """
    WITH f AS (SELECT doc_id AS asset_id, text, length(text) AS len FROM documents)
    SELECT asset_id,
           64 AS width, 64 AS height,
           md5(array_to_string(list_transform(range(0, 4096),
               k -> substring(text, (k * len) // 4096 + 1, 1)), '')) AS blob_md5
    FROM f
    """,
    description="multimodal resize plumbing: nearest-neighbor stub kernel via mapInPandas, md5-checked",
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from syscol_spark.operators.multimodal import documents_as_assets, resize_assets

    assets = documents_as_assets(_t(spark, sf_dir, "documents"))
    resized = resize_assets(assets, width=64, height=64)
    return resized.select("asset_id", "width", "height", F.md5("blob").alias("blob_md5"))


# --- full outer join ---------------------------------------------------------
# Monthly order activity vs monthly shipping activity: the ship calendar runs
# past the last order month, so the right-only branch is exercised (and the
# coalesce on both sides is the shape under test).
@register(
    "q_full_outer",
    """
    WITH o AS (
      SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    ), l AS (
      SELECT year(l_shipdate) * 100 + month(l_shipdate) AS ym,
             CAST(COUNT(*) AS BIGINT) AS n_ship_lines
      FROM lineitem GROUP BY 1
    )
    SELECT COALESCE(o.ym, l.ym) AS ym,
           COALESCE(n_orders, 0) AS n_orders,
           COALESCE(n_ship_lines, 0) AS n_ship_lines
    FROM o FULL OUTER JOIN l ON o.ym = l.ym
    """,
    description="full outer join of monthly order vs shipment calendars (zero-filled both sides)",
)
def q_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    ym = lambda c: (F.year(c) * 100 + F.month(c)).alias("ym")  # noqa: E731
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy(ym(F.col("o_orderdate")))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    l = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(ym(F.col("l_shipdate")))
        .agg(F.count(F.lit(1)).alias("n_ship_lines"))
    )
    return (
        o.join(l, "ym", "full_outer")
        .select(
            "ym",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("n_ship_lines", F.lit(0)).alias("n_ship_lines"),
        )
    )


# --- year-over-year growth ---------------------------------------------------
# Monthly revenue series with a 12-row lag comparison. The series is ~80
# rows (one per month), so the single-partition window is the right plan;
# revenue is DECIMAL-exact, the growth ratio divides identical doubles.
@register(
    "q_yoy_growth",
    """
    WITH m AS (
      SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS rev
      FROM orders GROUP BY 1
    )
    SELECT ym, rev,
           LAG(rev, 12) OVER (ORDER BY ym) AS rev_prior,
           ROUND((rev - LAG(rev, 12) OVER (ORDER BY ym))
                 / LAG(rev, 12) OVER (ORDER BY ym), 6) AS yoy
    FROM m
    """,
    description="year-over-year monthly revenue growth (12-offset lag window)",
)
def q_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = (
        _t(spark, sf_dir, "orders")
        .groupBy((F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("ym"))
        .agg(dsum("o_totalprice").alias("rev"))
    )
    w = Window.partitionBy().orderBy("ym")
    prior = F.lag("rev", 12).over(w)
    return m.select(
        "ym",
        "rev",
        prior.alias("rev_prior"),
        F.round((F.col("rev") - prior) / prior, 6).alias("yoy"),
    )


# --- skyline / Pareto frontier -----------------------------------------------
# Parts not strictly dominated on (cheaper price, larger size) — the
# quality-vs-cost frontier shape a curation pipeline uses to pick corpora.
# The ORACLE is the brute-force NOT EXISTS definition; the Spark plan is the
# O(n log n) sweep: collapse to per-price max size (one agg — cardinality
# drops to distinct prices), running max over strictly-cheaper prices (rows
# frame on the collapsed series), then one equi-join back. No self-join.
@register(
    "q_skyline",
    """
    SELECT a.p_partkey, a.p_retailprice, a.p_size
    FROM part a
    WHERE NOT EXISTS (
      SELECT 1 FROM part b
      WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
        AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
    )
    """,
    description="Pareto frontier on (price asc, size desc) via running-max sweep (brute-force oracle)",
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    per_price = part.groupBy("p_retailprice").agg(F.max("p_size").alias("mx"))
    w = Window.orderBy("p_retailprice").rowsBetween(Window.unboundedPreceding, -1)
    pts = per_price.withColumn("m1", F.max("mx").over(w)).filter(
        F.col("m1").isNull() | (F.col("mx") > F.col("m1"))
    )
    return (
        part.join(pts, "p_retailprice")
        .filter(
            (F.col("p_size") == F.col("mx"))
            & (F.col("m1").isNull() | (F.col("p_size") > F.col("m1")))
        )
        .select("p_partkey", "p_retailprice", "p_size")
    )


# --- explicit GROUPING SETS --------------------------------------------------
# The general form behind q_rollup/q_cube: a caller-chosen lattice of
# grouping combinations in ONE pass (Spark Expand + single shuffle — no
# UNION ALL of four scans). grouping_id() disambiguates "ALL" from a real
# NULL group the same way in both engines (same bitmask order).
@register(
    "q_grouping_sets",
    """
    SELECT COALESCE(o_orderstatus, 'ALL')   AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), (o_orderpriority), ())
    """,
    description="explicit GROUPING SETS lattice with grouping_id disambiguation",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [
                ["o_orderstatus", "o_orderpriority"],
                ["o_orderstatus"],
                ["o_orderpriority"],
                [],
            ],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            dsum("o_totalprice").alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "gid",
            "n",
            "total",
        )
    )


# --- co-purchase graph triangles ---------------------------------------------
# Graph analytics over a self-derived edge list: parts that co-occur in >= 2
# orders form an edge; count each node's triangle memberships. The pair
# generation is a per-order self-join on the DEDUPED (order, part) projection
# (orders are small groups, so the quadratic step is bounded by max basket
# size, not corpus size), and the triangle join is two shuffle equi-joins on
# edge endpoints — the standard distributed triangle-enumeration shape where
# pa < pb ordering prevents double counting.
@register(
    "q_copurchase_triangles",
    """
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    tri AS (
      SELECT e1.pa AS x, e1.pb AS y, e2.pb AS z
      FROM edges e1
      JOIN edges e2 ON e2.pa = e1.pb
      JOIN edges e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
    ),
    nodes AS (
      SELECT x AS part FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri
    )
    SELECT part AS l_partkey, COUNT(*) AS n_triangles
    FROM nodes GROUP BY 1
    ORDER BY n_triangles DESC, l_partkey
    LIMIT 10
    """,
    description="triangle counting on the co-purchase graph (edge weight >= 2)",
)
def q_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # edges via the shared basket-array pair stream (r14): one shuffle, no
    # per-basket self-join — see mining._pairs_from_arrays. Checkpointed
    # because the triangle join consumes the edge list three times.
    from syscol_spark.plans.mining import _copurchase_edges

    edges = _copurchase_edges(spark, sf_dir)
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.pa") == F.col("e1.pb"))
        .join(
            e3,
            (F.col("e3.pa") == F.col("e1.pa")) & (F.col("e3.pb") == F.col("e2.pb")),
        )
        .select(
            F.col("e1.pa").alias("x"), F.col("e1.pb").alias("y"), F.col("e2.pb").alias("z")
        )
    )
    nodes = (
        tri.select(F.col("x").alias("part"))
        .unionAll(tri.select("y"))
        .unionAll(tri.select("z"))
    )
    return (
        nodes.groupBy(F.col("part").alias("l_partkey"))
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .orderBy(F.col("n_triangles").desc(), "l_partkey")
        .limit(10)
    )


# --- multimodal near-dup via perceptual hash ----------------------------------
# Image dedup with the aHash construction: bit i = feature_i > vector mean,
# then the SAME pigeonhole banding + exact-Hamming verify as SimHash. The
# sha256 stub decoder has avalanche behavior, so only byte-identical blobs
# collide — twin assets (doc_id + 1M, same bytes) are planted to exercise
# the pair path; a real pixel decoder drops in at extract_features and
# visually-similar images then land at small Hamming with zero plumbing
# changes. Oracle mirrors the stub features (shared _STUB_FEATURE_SQL), the
# left-fold mean (list_reduce ≡ 0.0-seeded fold), the 60-bit assembly and
# the banded join bit-for-bit.
@register(
    "q_multimodal_phash",
    f"""
    WITH assets AS (
      SELECT doc_id AS id, lang AS block, text FROM documents
      UNION ALL
      SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents) AS id, lang AS block, text
      FROM documents WHERE doc_id % 10 = 0
    ), feats AS (
      SELECT id, block, {_STUB_FEATURE_SQL} AS f FROM assets
    ), m AS (
      SELECT id, block, f,
             list_reduce(list_transform(f, x -> CAST(x AS DOUBLE)), (a, x) -> a + x) / 64.0 AS mean
      FROM feats
    ), fp AS (
      SELECT id, block,
             list_reduce(list_transform(range(0, 60),
                 i -> CASE WHEN CAST(f[i + 1] AS DOUBLE) > mean
                           THEN (1::BIGINT << i) ELSE 0::BIGINT END),
                 (a, x) -> a + x) AS phash
      FROM m
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
    FROM fp a JOIN fp b
      ON a.block = b.block AND a.id < b.id
     AND bit_count(xor(a.phash, b.phash)) <= 3
    """,
    description="multimodal near-dup: aHash perceptual fingerprint over the decoded representation, SimHash-style pigeonhole banding + exact Hamming verify (planted twin assets)",
)
def q_multimodal_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from syscol_spark.operators.dedup import simhash_band_pairs
    from syscol_spark.operators.multimodal import documents_as_assets, perceptual_hash

    docs = _t(spark, sf_dir, "documents")
    # twin ids offset by max(doc_id)+1 ON-PLAN (1-row broadcast), never a
    # fixed constant: a literal 1M offset collides with real ids on corpora
    # past 1M docs, silently corrupting the planted-pair semantics
    off = docs.agg((F.max("doc_id") + 1).alias("__off"))
    twins = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .crossJoin(F.broadcast(off))
        .withColumn("doc_id", F.col("doc_id") + F.col("__off"))
        .drop("__off")
    )
    corpus = docs.unionByName(twins)
    hashed = perceptual_hash(documents_as_assets(corpus))
    blocks = corpus.select(F.col("doc_id").alias("asset_id"), F.col("lang").alias("block"))
    fps = hashed.join(blocks, "asset_id").select(
        F.col("asset_id").alias("id"), "block", "phash"
    )
    return simhash_band_pairs(
        fps.localCheckpoint(), fp_col="phash", max_hamming=3, n_bits=60
    ).select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


# --- frame-level dedup across assets ------------------------------------------
# The video dedup unit of work: sample frames (the q_multimodal_frames
# kernel), hash each frame, and measure cross-asset frame duplication — at
# 100 TB this is how near-identical clips (re-uploads, intro/outro reuse)
# are found without decoding full videos twice. Frame extraction is one
# mapInPandas pass; dedup is the exact_dedup one-shuffle digest groupBy.
@register(
    "q_multimodal_frame_dedup",
    """
    WITH f AS (
      SELECT doc_id AS asset_id, text, length(text) AS len FROM documents
    ), g AS (
      SELECT asset_id, text,
             unnest(generate_series(0, least(8, greatest(1, len // 64)) - 1)) AS i
      FROM f
    ), fr AS (
      SELECT asset_id, md5(substring(text, i * 64 + 1, 64)) AS frame_md5 FROM g
    ), d AS (
      SELECT frame_md5,
             CAST(COUNT(*) AS BIGINT) AS n_copies,
             CAST(COUNT(DISTINCT asset_id) AS BIGINT) AS n_assets
      FROM fr GROUP BY frame_md5
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_uniq_frames,
           CAST(SUM(n_copies) AS BIGINT) AS n_frames,
           CAST(SUM(CASE WHEN n_assets > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_frames,
           CAST(MAX(n_assets) AS BIGINT) AS max_assets_per_frame
    FROM d
    """,
    description="frame-level dedup across assets: sampled-frame digests grouped corpus-wide (re-upload / shared-clip detection shape)",
)
def q_multimodal_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from syscol_spark.operators.multimodal import documents_as_assets, sample_frames

    assets = documents_as_assets(_t(spark, sf_dir, "documents"))
    frames = sample_frames(assets, every_n_bytes=64, max_frames=8)
    d = (
        frames.select("asset_id", F.md5("frame_blob").alias("frame_md5"))
        .groupBy("frame_md5")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.countDistinct("asset_id").alias("n_assets"),
        )
    )
    return d.agg(
        F.count(F.lit(1)).alias("n_uniq_frames"),
        F.sum("n_copies").alias("n_frames"),
        F.sum(F.when(F.col("n_assets") > 1, 1).otherwise(0)).alias("n_shared_frames"),
        F.max("n_assets").alias("max_assets_per_frame"),
    )
