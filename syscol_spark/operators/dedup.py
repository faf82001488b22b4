"""Deduplication operator family (north-star: training-data pipeline).

Five strategies, all shuffle-based and cluster-scalable:

- exact_dedup:        md5(content) groupBy — one shuffle on a 128-bit key.
- minhash_signatures / minhash_lsh_candidates: MinHash + banded LSH.
  Signature = per-seed min of xxhash64(shingle ++ seed), computed entirely
  with built-in expressions (no Python). Band buckets shuffle-join candidate
  pairs — the standard near-dup pipeline at web scale.
- simhash: 64-bit SimHash from token hashes via bit-count expressions.
- ngram_jaccard_pairs: exact Jaccard over distinct shingle sets for pairs
  sharing a blocking key (bounded quadratic *within* a block only).
- embedding near-dup lives in operators/similarity.py (cosine >= threshold).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from syscol_spark.functions.text import word_shingles


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Groups of byte-identical content: (content_hash, canonical_id, n_copies).
    Canonical row = min id. One hash-partitioned shuffle; no content moves
    twice (hash first, group on the digest)."""
    return (
        df.select(F.md5(F.col(content_col)).alias("content_hash"), F.col(id_col).alias("__id"))
        .groupBy("content_hash")
        .agg(F.min("__id").alias("canonical_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def salted_block_pairs(df: DataFrame, n_salts: int = 32) -> DataFrame:
    """Self-join a blocked frame into unordered pairs (a.id < b.id) with the
    block key SALTED for parallelism.

    A plain self-join on a low-cardinality block key (e.g. 5 languages)
    parallelizes poorly: with a broadcast build side the probe side keeps the
    scan's partitioning (often 1 small file = 1 task doing ALL the quadratic
    compute); with a shuffle join there are only n_blocks partitions. Salting
    the left side by hash(id), replicating the right side across all salts,
    and explicitly round-robin repartitioning the probe side spreads each
    pair exactly once over n_salts-wide parallelism at any block skew.

    Input must have columns (id, block, ...payload); output has a.* / b.*
    accessible via aliases "a" and "b".
    """
    par = max(df.sparkSession.sparkContext.defaultParallelism, n_salts)
    a = (
        df.withColumn("__salt", F.pmod(F.xxhash64("id"), F.lit(n_salts)))
        .repartition(par)  # round-robin: even CPU spread for the probe side
        .alias("a")
    )
    b = (
        df.withColumn("__salt", F.explode(F.array(*[F.lit(s) for s in range(n_salts)])))
        .alias("b")
    )
    return a.join(
        b,
        (F.col("a.block") == F.col("b.block"))
        & (F.col("a.__salt") == F.col("b.__salt"))
        & (F.col("a.id") < F.col("b.id")),
    )


def _shingle_hash(sh: Column, seed: int) -> Column:
    return F.xxhash64(sh, F.lit(seed))


def minhash_signatures(
    df: DataFrame, content_col: str, id_col: str, *, n_hashes: int = 16, shingle_n: int = 3
) -> DataFrame:
    """(id, signature array<long>) — per-seed min over shingle hashes.

    All built-in expressions: shingling via transform(sequence), hashing via
    xxhash64 with the seed parameter, min via array aggregate. Stays in
    whole-stage codegen; scales as a pure map over the corpus.
    """
    sh = word_shingles(content_col, shingle_n)
    sig = F.array(
        *[
            F.aggregate(
                F.transform(sh, lambda s, i=i: _shingle_hash(s, i)),
                F.lit(None).cast("long"),
                lambda acc, x: F.least(F.coalesce(acc, x), x),
            )
            for i in range(n_hashes)
        ]
    )
    return df.select(F.col(id_col).alias("id"), sig.alias("signature"))


def minhash_lsh_candidates(
    signatures: DataFrame, *, n_bands: int = 4, rows_per_band: int = 4
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) sharing ≥1 LSH band bucket,
    with the MinHash-estimated Jaccard similarity.

    Plan shape: explode to (band, bucket_hash) → shuffle join on the bucket →
    distinct pairs. Bucket join is an equi-join, so AQE can split skewed
    buckets; no pairwise scan of the corpus ever happens.
    """
    sig = signatures
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.hash(*[F.col("signature")[b * rows_per_band + r] for r in range(rows_per_band)]).alias("bucket"),
            )
            for b in range(n_bands)
        ]
    )
    exploded = sig.select("id", "signature", F.explode(bands).alias("bb")).select(
        "id", "signature", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    a = exploded.alias("a")
    b = exploded.alias("b")
    pairs = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), F.col("a.signature").alias("sig_a"), F.col("b.signature").alias("sig_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    matches = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")), lambda v: v == 1))
    n_hashes = F.size(F.col("sig_a"))
    return pairs.select("id_a", "id_b", F.round(matches / n_hashes, 6).alias("est_jaccard"))


def simhash(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash per document, built from token xxhash64 values with
    bitwise column expressions (no Python): for each bit position, sum +1/-1
    across token hashes; sign of the sum sets the output bit.
    """
    from syscol_spark.functions.text import tokens

    toks = F.array_distinct(tokens(content_col))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    def bit_contrib(mask: Column) -> Column:
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + F.when(h.bitwiseAND(mask) != 0, 1).otherwise(-1),
        )

    bit_cols = []
    for bit in range(64):
        # bit 63 as a signed-long literal is MIN_LONG (two's complement)
        mask = F.lit((1 << bit) - (1 << 64 if bit == 63 else 0)).cast("long")
        bit_cols.append(F.when(bit_contrib(mask) > 0, mask).otherwise(F.lit(0).cast("long")))
    fingerprint = bit_cols[0]
    for c in bit_cols[1:]:
        fingerprint = fingerprint.bitwiseOR(c)
    return df.select(F.col(id_col).alias("id"), fingerprint.alias("simhash"))


def hamming64(a: Column | str, b: Column | str) -> Column:
    x = (F.col(a) if isinstance(a, str) else a).bitwiseXOR(F.col(b) if isinstance(b, str) else b)
    return F.bit_count(x).cast("long")


def ngram_jaccard_pairs(
    df: DataFrame,
    content_col: str,
    id_col: str,
    block_col: str,
    *,
    shingle_n: int = 3,
    min_jaccard: float = 0.2,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs inside a blocking key.

    Blocking bounds the quadratic term: with B blocks of size s the join is
    O(B·s²) not O(N²); blocks shuffle independently so skew is AQE-split.
    """
    shingled = df.select(
        F.col(id_col).alias("id"), F.col(block_col).alias("block"), word_shingles(content_col, shingle_n).alias("sh")
    )
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh"))).cast("double")
    union = (F.size(F.col("a.sh")) + F.size(F.col("b.sh"))).cast("double") - inter
    return (
        salted_block_pairs(shingled)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(inter / union, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )
