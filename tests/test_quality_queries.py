"""Semantic invariants for the data-quality / sketch-infrastructure queries
(plans/quality.py): properties the oracle hash-compare cannot express —
count-min overcount-only and shard-merge linearity, bloom soundness against
a driver-side replay, LM probability mass bounds, coverage monotonicity in
the vocab size, Benford ppm accounting.
"""

from __future__ import annotations

import hashlib
import math

import pyspark.sql.functions as F

from syscol_spark.plans.catalog import query_catalog
from syscol_spark.sources.tables import load_table


def _run(spark, sf_dir, name):
    return query_catalog()[name](spark, sf_dir)


def _md5_bucket(key: int, seed: int, buckets: int) -> int:
    h = hashlib.md5(f"{key}:{seed}".encode()).hexdigest()
    return int(h[:15], 16) % buckets


def test_cms_never_undercounts_and_matches_replay(spark, sf_dir):
    from syscol_spark.plans.quality import _CMS_SEEDS, _CMS_WIDTH

    rows = _run(spark, sf_dir, "q_cms_shards").collect()
    assert len(rows) == 5
    for r in rows:
        assert r["never_undercounts"], r
        assert r["cms_est"] >= r["exact_cnt"]

    # driver-side replay of the sketch for the heaviest key: the merged
    # cell counts must equal a one-shot global build (linearity)
    ev = [
        x["user_id"]
        for x in load_table(spark, sf_dir, "events").select("user_id").collect()
    ]
    top = rows[0]
    for d, seed in enumerate(_CMS_SEEDS):
        b = _md5_bucket(top["user_id"], seed, _CMS_WIDTH)
        cell = sum(1 for u in ev if _md5_bucket(u, seed, _CMS_WIDTH) == b)
        assert cell >= top["exact_cnt"]
    est = min(
        sum(
            1
            for u in ev
            if _md5_bucket(u, seed, _CMS_WIDTH)
            == _md5_bucket(top["user_id"], seed, _CMS_WIDTH)
        )
        for seed in _CMS_SEEDS
    )
    assert est == top["cms_est"]


def test_bloom_prefilter_sound_and_counts_consistent(spark, sf_dir):
    r = _run(spark, sf_dir, "q_bloom_prefilter").collect()[0]
    assert r["bloom_sound"]  # no order-holding customer rejected
    assert r["n_definitely_absent"] + r["n_candidates"] == r["n_customers"]
    # every definite reject is truly order-less (soundness, counted form)
    assert (
        r["n_truly_without_orders"]
        == r["n_definitely_absent"] + r["n_false_positives"]
    )
    assert 0 <= r["n_false_positives"] <= r["n_candidates"]


def test_ngram_lm_probability_bounds(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_ngram_lm").collect()
    assert rows and len(rows) <= 15
    by_ctx: dict[str, list] = {}
    for r in rows:
        by_ctx.setdefault(r["prev"], []).append(r)
        assert 1 <= r["rk"] <= 3
        assert 0 < r["p_ppm"] < 1_000_000
        assert r["cnt"] <= r["ctx_total"]
    for ctx_rows in by_ctx.values():
        cnts = [r["cnt"] for r in sorted(ctx_rows, key=lambda r: r["rk"])]
        assert cnts == sorted(cnts, reverse=True)
        # top-3 smoothed masses can't exceed the whole distribution
        assert sum(r["p_ppm"] for r in ctx_rows) <= 1_000_000


def test_vocab_coverage_bounds_and_monotonicity(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_vocab_coverage").collect()
    assert rows
    for r in rows:
        assert 0 <= r["covered_tokens"] <= r["total_tokens"]
        assert 0 <= r["coverage_ppm"] <= 1_000_000
        assert r["coverage_ppm"] == r["covered_tokens"] * 1_000_000 // r["total_tokens"]
    # corpus-wide: a top-100 vocab over zipf-ish text covers a solid chunk
    total = sum(r["total_tokens"] for r in rows)
    covered = sum(r["covered_tokens"] for r in rows)
    assert covered * 10 >= total  # >= 10% coverage, loose floor


def test_benford_accounting_and_constants(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_benford").collect()
    digits = [r["digit"] for r in rows]
    assert digits == sorted(digits)
    assert set(digits) <= set(range(1, 10))
    n_total = sum(r["n"] for r in rows)
    li = load_table(spark, sf_dir, "lineitem").count()
    assert n_total == li  # every row classified into exactly one digit
    for r in rows:
        want = round(math.log10(1.0 + 1.0 / r["digit"]) * 1_000_000)
        assert r["expected_ppm"] == want
        assert r["abs_dev_ppm"] == abs(r["observed_ppm"] - r["expected_ppm"])
    # observed ppm sums to ~1e6 (integer floor per digit)
    s = sum(r["observed_ppm"] for r in rows)
    assert 1_000_000 - 9 <= s <= 1_000_000


def test_negative_sampling_excludes_interactions(spark, sf_dir):
    """No sampled negative may be an item its user actually purchased, and
    ranks must follow the deterministic hash order."""
    rows = _run(spark, sf_dir, "q_negative_sampling").collect()
    assert rows
    pairs = {(r["custkey"], r["neg_partkey"]) for r in rows}
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    interacted = {
        (r["o_custkey"], r["l_partkey"])
        for r in orders.join(
            li, orders["o_orderkey"] == li["l_orderkey"]
        )
        .select("o_custkey", "l_partkey")
        .filter(F.col("o_custkey").isin([c for c, _ in pairs]))
        .distinct()
        .collect()
    }
    assert pairs.isdisjoint(interacted)
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["custkey"], []).append(r)
    for urows in by_user.values():
        urows.sort(key=lambda r: r["rk"])
        hs = [(r["h"], r["neg_partkey"]) for r in urows]
        assert hs == sorted(hs)  # rank = hash order, partkey tiebreak
        assert len(urows) <= 3


def test_feature_hash_weights_match_replay(spark, sf_dir):
    """The sparse vectors must equal a driver-side md5 replay for one doc."""
    rows = _run(spark, sf_dir, "q_feature_hash").collect()
    assert rows
    doc0 = [r for r in rows if r["doc_id"] == rows[0]["doc_id"]]
    text = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") == rows[0]["doc_id"])
        .collect()[0]["text"]
    )
    want: dict[int, int] = {}
    for tok in text.strip().split():
        b = _md5_bucket(tok, 31, 64)
        s = 1 if _md5_bucket(tok, 37, 2) == 0 else -1
        want[b] = want.get(b, 0) + s
    want = {b: w for b, w in want.items() if w != 0}
    got = {r["bucket"]: r["weight"] for r in doc0}
    assert got == want


def test_join_cardinality_exact_and_estimator(spark, sf_dir):
    r = _run(spark, sf_dir, "q_join_cardinality").collect()[0]
    li = load_table(spark, sf_dir, "lineitem")
    truth = (
        li.groupBy("l_partkey")
        .count()
        .agg(F.sum(F.col("count") * F.col("count")))
        .collect()[0][0]
    )
    assert r["exact_pairs"] == truth
    assert r["n_sampled_keys"] <= r["n_keys"]
    assert r["est_pairs"] % 10 == 0  # 10x-scaled sample sum
