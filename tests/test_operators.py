"""Unit tests for custom operators on tiny constructed inputs with
hand-computed expected outputs (the reference has zero first-party tests —
SURVEY.md §5 — so this strategy is built fresh)."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_asof_join_basic(spark):
    from syscol_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 100, "e1"), (1, 250, "e2"), (2, 50, "e3")], ["k", "ts_us", "name"]
    )
    right = spark.createDataFrame([(1, 100, 10), (1, 200, 20), (2, 60, 30)], ["k", "ts_us", "val"])
    out = {
        r["name"]: (r["val_asof"], r["ts_us_asof"])
        for r in asof_join(left, right, on="k").collect()
    }
    assert out["e1"] == (10, 100)  # exact-time match counts
    assert out["e2"] == (20, 200)  # latest at-or-before
    assert out["e3"] == (None, None)  # nothing at-or-before 50


def test_asof_join_tie_takes_greatest_tiebreak(spark):
    from syscol_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, 100, "e")], ["k", "ts_us", "name"])
    right = spark.createDataFrame([(1, 100, 1), (1, 100, 2)], ["k", "ts_us", "val"])
    [row] = asof_join(left, right, on="k").collect()
    assert row["val_asof"] == 2


def test_range_join_count(spark):
    from syscol_spark.operators.joins import range_join_count

    left = spark.createDataFrame([(1, 1000, "a"), (1, 5000, "b")], ["k", "t", "name"])
    right = spark.createDataFrame([(1, 900), (1, 999), (1, 1000), (1, 4500)], ["k", "t"])
    out = {
        r["name"]: r["n_in_range"]
        for r in range_join_count(
            left, right, on="k", left_time="t", right_time="t", lower_us=-200, upper_us=0
        ).collect()
    }
    # window [t-200, t): for a=1000 → {900, 999}; 1000 itself excluded
    assert out["a"] == 2
    assert out["b"] == 0


def test_range_join_count_exact_bucket_boundaries(spark):
    """Timestamps at epoch-µs magnitude landing EXACTLY on bucket-span
    multiples (±1 µs): float-division bucketing can flip these into the
    adjacent bucket and silently drop the pair; integer floor-div must not."""
    from syscol_spark.operators.joins import range_join_count

    span = 30_000_000
    base = (1_723_500_000_000_000 // span) * span  # exact multiple of span
    lefts = [base - 1, base, base + 1, base + span]
    left = spark.createDataFrame([(1, t, f"L{i}") for i, t in enumerate(lefts)], ["k", "t", "name"])
    # each left row gets one right row exactly at its window's lower edge
    # (included) and one just before it (excluded)
    right = spark.createDataFrame(
        [(1, t - span) for t in lefts] + [(1, t - span - 1) for t in lefts], ["k", "t"]
    )
    out = {
        r["name"]: r["n_in_range"]
        for r in range_join_count(
            left, right, on="k", left_time="t", right_time="t", lower_us=-span, upper_us=0
        ).collect()
    }
    # window [t-span, t): lower edge in, t-span-1 out — but L1's excluded
    # right (base-span-1) is L0's included one, etc.; compute directly:
    expected = {}
    rts = [t - span for t in lefts] + [t - span - 1 for t in lefts]
    for i, t in enumerate(lefts):
        expected[f"L{i}"] = sum(1 for rt in rts if t - span <= rt < t)
    assert out == expected


def test_range_join_count_duplicate_left_rows_not_collapsed(spark):
    """Duplicate left rows must each produce their own output row with their
    own count — not collapse into one row with a summed count."""
    from syscol_spark.operators.joins import range_join_count

    left = spark.createDataFrame([(1, 1000, "a"), (1, 1000, "a")], ["k", "t", "name"])
    right = spark.createDataFrame([(1, 900), (1, 950)], ["k", "t"])
    rows = range_join_count(
        left, right, on="k", left_time="t", right_time="t", lower_us=-200, upper_us=0
    ).collect()
    assert len(rows) == 2
    assert [r["n_in_range"] for r in rows] == [2, 2]


def test_range_join_count_negative_times_floor_semantics(spark):
    """Negative timestamps: truncate-toward-zero bucketing disagrees between
    sides; floor semantics must keep pairs intact below zero too."""
    from syscol_spark.operators.joins import range_join_count

    left = spark.createDataFrame([(1, -1000, "a")], ["k", "t", "name"])
    right = spark.createDataFrame([(1, -1150), (1, -1000), (1, -999)], ["k", "t"])
    [row] = range_join_count(
        left, right, on="k", left_time="t", right_time="t", lower_us=-200, upper_us=0
    ).collect()
    assert row["n_in_range"] == 1  # only -1150 in [-1200, -1000)


def test_exact_dedup(spark):
    from syscol_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame([(1, "x"), (2, "x"), (3, "y")], ["id", "txt"])
    out = {r["canonical_id"]: r["n_copies"] for r in exact_dedup(df, "txt", "id").collect()}
    assert out == {1: 2, 3: 1}


def test_minhash_identical_docs_full_similarity(spark):
    from syscol_spark.operators.dedup import minhash_lsh_candidates, minhash_signatures

    text = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame([(1, text), (2, text), (3, "completely different words entirely here now")], ["id", "txt"])
    sigs = minhash_signatures(df, "txt", "id", n_hashes=8, shingle_n=3)
    pairs = minhash_lsh_candidates(sigs, n_bands=2, rows_per_band=4).collect()
    assert len(pairs) == 1
    assert pairs[0]["id_a"] == 1 and pairs[0]["id_b"] == 2
    assert pairs[0]["est_jaccard"] == 1.0


def test_simhash_identical_zero_hamming(spark):
    from syscol_spark.operators.dedup import hamming64, simhash

    df = spark.createDataFrame([(1, "alpha beta gamma"), (2, "alpha beta gamma")], ["id", "txt"])
    sh = simhash(df, "txt", "id")
    a, b = [r["simhash"] for r in sh.orderBy("id").collect()]
    assert a == b
    [d] = spark.range(1).select(hamming64(F.lit(a), F.lit(b)).alias("h")).collect()
    assert d["h"] == 0


def test_dedup_clusters_two_components(spark):
    from syscol_spark.operators.dedup import dedup_clusters

    # chain 1-2-3 and pair 10-11: two components, min-id labels
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"])
    out = {r["id"]: (r["cluster"], r["cluster_size"]) for r in dedup_clusters(pairs).collect()}
    assert out == {1: (1, 3), 2: (1, 3), 3: (1, 3), 10: (10, 2), 11: (10, 2)}


def test_cosine_similarity_known_values(spark):
    from syscol_spark.functions.vectors import cosine_similarity

    df = spark.createDataFrame([([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0])], ["a", "b"])
    vals = [round(r["c"], 9) for r in df.select(cosine_similarity("a", "b").alias("c")).collect()]
    assert vals[0] == 0.0
    assert abs(vals[1] - 1.0) < 1e-12


def test_word_shingles_and_tokens(spark):
    from syscol_spark.functions.text import token_count, word_shingles

    df = spark.createDataFrame([("a b c d",), ("x y",)], ["txt"])
    rows = df.select(token_count("txt").alias("n"), word_shingles("txt", 3).alias("sh")).collect()
    assert rows[0]["n"] == 4
    assert sorted(rows[0]["sh"]) == ["a b c", "b c d"]
    assert rows[1]["sh"] == ["x y"]  # shorter than n → whole doc


def test_bpe_tokens_and_fingerprint(spark):
    from syscol_spark.functions.text import bpe_tokens, rolling_fingerprint

    df = spark.createDataFrame([("hello, world!!",), ("single",)], ["txt"])
    rows = df.select(
        bpe_tokens("txt").alias("t"), rolling_fingerprint("txt").alias("fp")
    ).collect()
    assert rows[0]["t"] == ["hello", ",", "world", "!!"]
    assert rows[1]["t"] == ["single"]
    # single-token doc: fingerprint == token_int(token) (first-element init)
    assert 0 <= rows[1]["fp"] < 2147483647
    # deterministic across runs
    rows2 = df.select(rolling_fingerprint("txt").alias("fp")).collect()
    assert [r["fp"] for r in rows2] == [r["fp"] for r in rows]


def test_brute_force_topk_self_excluded(spark):
    from syscol_spark.operators.similarity import brute_force_topk

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])], ["vec_id", "embedding"]
    )
    out = brute_force_topk(df, df.filter(F.col("vec_id") == 1), k=2).orderBy("rk").collect()
    assert [r["neighbor_id"] for r in out] == [2, 3]
    assert all(r["query_id"] == 1 for r in out)
