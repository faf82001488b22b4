"""Semantic invariants for the data-mining / diagnostics queries
(plans/mining.py) that the oracle hash-compare cannot express: structural
properties (partitions, bounds, monotonicity) rather than value equality.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from syscol_spark.plans.catalog import query_catalog
from syscol_spark.sources.tables import load_table


def _run(spark, sf_dir, name):
    return query_catalog()[name](spark, sf_dir)


def test_fk_audit_clean_on_synthetic_data(spark, sf_dir):
    rows = {r["rel"]: r for r in _run(spark, sf_dir, "q_fk_audit").collect()}
    assert set(rows) == {
        "lineitem->orders",
        "lineitem->part",
        "lineitem->supplier",
        "orders->customer",
        "customer->nation",
    }
    # generated star schema has no dangling FKs
    assert all(r["n_orphan"] == 0 for r in rows.values()), rows
    # child totals match the raw tables
    li = load_table(spark, sf_dir, "lineitem").count()
    assert rows["lineitem->orders"]["n_child"] == li
    assert rows["lineitem->part"]["n_child"] == li


def test_assoc_rules_bounds(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_assoc_rules").collect()
    assert rows
    for r in rows:
        # confidence = P(b|a) <= 1, support of the pair >= threshold
        assert 0 < r["conf_ab_micro"] <= 1_000_000, r
        assert r["pair_supp"] >= 2
        assert r["item_a"] < r["item_b"]
    # deterministic ranking: lift non-increasing
    lifts = [r["lift_micro"] for r in rows]
    assert lifts == sorted(lifts, reverse=True)


def test_skew_profile_bounds(spark, sf_dir):
    r = _run(spark, sf_dir, "q_skew_keys").collect()[0]
    assert 0 <= r["gini_micro"] < 1_000_000
    # max/mean >= 1 by definition; top-1% share in (0, 1]
    assert r["max_over_mean_micro"] >= 1_000_000
    assert 0 < r["top1pct_share_micro"] <= 1_000_000
    assert r["n_rows"] == load_table(spark, sf_dir, "orders").count()


def test_kmeans_partitions_all_vectors(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_kmeans_lloyd").collect()
    n_total = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r["n_vecs"] for r in rows) == n_total
    assert all(r["sse_q2"] >= 0 for r in rows)
    assert len(rows) <= 8


def test_jl_projection_concentrates_near_unity(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_jl_projection").collect()
    total = sum(r["n_pairs"] for r in rows)
    assert total > 6000  # ~C(120,2) minus identical-vector pairs
    # JL with k=16: most mass within ratio [0.4, 1.6) => bands 2..7
    near = sum(r["n_pairs"] for r in rows if 2 <= r["ratio_band"] <= 7)
    assert near / total > 0.9, rows


def test_nearest_centroid_covers_test_split(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_nearest_centroid").collect()
    n_test = (
        load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 5 == 0).count()
    )
    assert sum(r["n_vecs"] for r in rows) == n_test
    # NB: the synthetic label column is geometry-free (accuracy ~ chance),
    # so only structure is asserted; the confusion VALUES are oracle-checked
    assert all(0 <= r["pred_label"] <= 9 and 0 <= r["true_label"] <= 9 for r in rows)
    assert len(rows) <= 100  # at most a 10x10 confusion matrix


def test_cusum_closed_form_matches_recursion(spark, sf_dir):
    """The batch closed form (prefix-sum − prefix-min) must equal the
    textbook max(0, ...) recursion computed in plain python over the same
    minutely counts."""
    minutely = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.expr("ts_us div 60000000").alias("m"))
        .agg(F.count(F.lit(1)).alias("x"))
        .orderBy("m")
        .collect()
    )
    counts = {r["m"]: r["x"] for r in minutely}
    n, s = len(counts), sum(counts.values())
    q2 = sum(x * x for x in counts.values())
    mu = s * 1_000_000 // n
    import math

    sd = int(math.floor(math.sqrt(float((n * q2 - s * s) * 10**12 // (n * n)))))
    ref = {}
    acc = 0
    for m in sorted(counts):
        acc = max(0, acc + counts[m] * 1_000_000 - mu - sd // 2)
        ref[m] = acc
    got = {r["minute_idx"]: r for r in _run(spark, sf_dir, "q_ev_cusum").collect()}
    assert got
    for m, r in got.items():
        assert r["s_plus_micro"] == ref[m], (m, r["s_plus_micro"], ref[m])
        assert r["alarm"] == (ref[m] > 5 * sd)


def test_inc_agg_merge_equals_full_recompute(spark, sf_dir):
    """merge(partial(base), partial(delta)) == full groupBy — the algebraic
    MV-maintenance contract, checked directly against a one-shot Spark agg
    (the oracle already checks it against DuckDB)."""
    full = {
        (r["custkey"]): (r["n_orders"], round(r["total"], 6))
        for r in load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(27,6)")).cast("double").alias("total"),
        )
        .collect()
    }
    merged = {
        (r["custkey"]): (r["n_orders"], round(r["total"], 6))
        for r in _run(spark, sf_dir, "q_inc_agg_merge").collect()
    }
    assert merged == full


def test_bfs_khop_monotone_and_bounded(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_bfs_khop").collect()
    assert len(rows) == 5
    for r in rows:
        # cumulative reachability is monotone in hop count
        assert 0 <= r["n_1hop"] <= r["n_2hop"] <= r["n_3hop"]
    seeds = [r["seed"] for r in rows]
    assert seeds == sorted(seeds)


def test_item_cf_cosine_bounds(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_item_cf").collect()
    assert rows
    for r in rows:
        # cosine^2 in (0, 1]; co-occurrence can't exceed either item count
        assert 0 < r["cos2_micro"] <= 1_000_000, r
        assert r["c_ab"] >= 2
        assert r["item_a"] < r["item_b"]
    vals = [r["cos2_micro"] for r in rows]
    assert vals == sorted(vals, reverse=True)
