"""Deterministic sampling / mixing / packing / profiling / PII operators."""

from __future__ import annotations

import pyspark.sql.functions as F

from syscol_spark.functions.text import redact_pii
from syscol_spark.operators.profile import profile_columns
from syscol_spark.operators.sampling import (
    hash_sample,
    pack_sequences,
    stratified_sample,
    weighted_mixture,
)


def test_hash_sample_deterministic_and_rate(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {r["doc_id"] for r in hash_sample(docs, "doc_id", 250_000).select("doc_id").collect()}
    b = {r["doc_id"] for r in hash_sample(docs, "doc_id", 250_000).select("doc_id").collect()}
    assert a == b, "same seed must select identical rows"
    n = docs.count()
    assert 0.15 * n <= len(a) <= 0.35 * n, f"~25% expected, got {len(a)}/{n}"
    # threshold nesting: a lower rate with the same seed selects a SUBSET —
    # lets a pipeline grow a sample without resampling everything
    c = {r["doc_id"] for r in hash_sample(docs, "doc_id", 100_000).select("doc_id").collect()}
    assert c <= a


def test_stratified_sample_caps_each_stratum(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = stratified_sample(docs, "lang", "doc_id", 7)
    per = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per and all(v <= 7 for v in per.values())
    assert out.collect() == stratified_sample(docs, "lang", "doc_id", 7).collect()


def test_weighted_mixture_rates_follow_sources(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rate = F.when(F.col("source") == "src0", F.lit(1_000_000)).otherwise(F.lit(0))
    kept = weighted_mixture(docs, "doc_id", rate)
    assert kept.filter(F.col("source") != "src0").count() == 0
    assert kept.count() == docs.filter(F.col("source") == "src0").count()


def test_pack_sequences_invariants(spark):
    rows = [("en", i, t) for i, t in enumerate([100, 500, 20, 512, 1, 1000])] + [
        ("de", 10, 513),
        ("de", 11, 0),  # empty doc still gets a window slot
    ]
    df = spark.createDataFrame(rows, ["lang", "doc_id", "n_tok_in"])
    out = pack_sequences(
        df, group_col="lang", id_col="doc_id", n_tokens=F.col("n_tok_in"), budget=512
    ).orderBy("lang", "doc_id").collect()
    by_lang: dict[str, list] = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        # offsets are the exclusive running sum: contiguous, no gaps/overlap
        run = 0
        for r in rs:
            assert r["offset"] == run
            run += r["n_tok"]
            assert r["first_pack"] == r["offset"] // 512
            width = max(r["n_tok"], 1)
            assert r["last_pack"] == (r["offset"] + width - 1) // 512
            assert r["n_splits"] == r["last_pack"] - r["first_pack"]
    # a doc that exactly fills a window does not spill into the next
    exact = [r for r in out if r["lang"] == "en" and r["n_tok"] == 512][0]
    assert exact["n_splits"] == (1 if exact["offset"] % 512 else 0)
    # a 513-token doc starting at offset 0 must straddle exactly one boundary
    big = [r for r in out if r["lang"] == "de" and r["n_tok"] == 513][0]
    assert (big["first_pack"], big["last_pack"], big["n_splits"]) == (0, 1, 1)


def test_profile_columns_exact(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, 2.5), (2, "b", None), (None, "b", 0.25)],
        ["k", "s", "x"],
    )
    got = {r["column"]: r for r in profile_columns(df, ["k", "s", "x"]).collect()}
    assert got["k"]["n_rows"] == 4 and got["k"]["n_nulls"] == 1 and got["k"]["n_distinct"] == 2
    assert (got["k"]["min_str"], got["k"]["max_str"]) == ("1", "2")
    assert got["s"]["n_nulls"] == 1 and got["s"]["n_distinct"] == 2
    assert (got["s"]["min_str"], got["s"]["max_str"]) == ("a", "b")
    # doubles render through DECIMAL(27,6): fixed scale, engine-portable
    assert (got["x"]["min_str"], got["x"]["max_str"]) == ("0.250000", "2.500000")


def test_profile_columns_empty_cols(spark):
    """cols=[] returns an empty report with the profile schema (previously a
    bare TypeError from reduce() over zero branches)."""
    df = spark.createDataFrame([(1,)], ["k"])
    out = profile_columns(df, [])
    assert out.count() == 0
    assert out.columns == ["column", "n_rows", "n_nulls", "n_distinct", "min_str", "max_str"]


def test_redact_pii_planted(spark):
    df = spark.createDataFrame(
        [("write bob.smith+x@mail.example.org or call 555-123-4567 today",),
         ("no pii here",)],
        ["t"],
    )
    got = [r["r"] for r in df.select(redact_pii("t").alias("r")).collect()]
    assert got[0] == "write [PII] or call [PII] today"
    assert got[1] == "no pii here"


def test_cluster_balanced_sample_rates_and_manifest(spark, sf_dir):
    from syscol_spark.operators.sampling import cluster_balanced_sample, hash_bucket

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # label is a ready-made (imbalanced-enough) cluster column for the test
    kept = cluster_balanced_sample(emb, "label", "vec_id", cap=None)
    rows = kept.select("label", "vec_id", "cluster_n", "keep_ppm").collect()
    assert rows, "mean-cap balance must keep something"
    sizes = {r["label"]: c for r, c in
             ((r, r["cluster_n"]) for r in rows)}
    n = emb.count()
    cap = -(-n // len(emb.select("label").distinct().collect()))  # ceil(mean)
    for r in rows:
        expect = min(1_000_000, (1_000_000 * cap) // r["cluster_n"])
        assert r["keep_ppm"] == expect, (r["label"], r["keep_ppm"], expect)
    # determinism: the kept set is a pure function of (key, seed, rates)
    again = {x["vec_id"] for x in cluster_balanced_sample(emb, "label", "vec_id").select("vec_id").collect()}
    assert {r["vec_id"] for r in rows} == again
    # explicit small cap suppresses large clusters harder than small ones
    capped = cluster_balanced_sample(emb, "label", "vec_id", cap=3)
    per = {r["label"]: r["n"] for r in capped.groupBy("label").agg(F.count("*").alias("n")).collect()}
    # expectation is ~3 per cluster; allow generous slack, forbid blowups
    assert all(v <= 12 for v in per.values()), per

    import pytest

    with pytest.raises(ValueError):
        cluster_balanced_sample(emb, "label", "vec_id", cap=0)


def test_cluster_balanced_sample_cap_monotone_nesting(spark, sf_dir):
    """Lowering the cap must select a SUBSET of the higher-cap sample
    (keep_ppm is monotone in cap and the md5 bucket is fixed) — the same
    threshold-nesting contract hash_sample guarantees, which lets a
    pipeline tighten rebalance pressure without resampling everything."""
    from syscol_spark.operators.sampling import cluster_balanced_sample

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    kept = {
        cap: {r["vec_id"] for r in
              cluster_balanced_sample(emb, "label", "vec_id", cap=cap).select("vec_id").collect()}
        for cap in (5, 20, 80)
    }
    assert kept[5] <= kept[20] <= kept[80]
    assert len(kept[5]) < len(kept[80])
