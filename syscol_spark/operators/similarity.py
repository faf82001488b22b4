"""Similarity search over embedding columns (north-star).

Two paths:
- brute_force_topk: exact cosine top-k. The query set is broadcast (it is
  small by construction); the corpus is scanned once, scored JVM-side, and
  reduced with a per-query ranking window. Linear in corpus size — the right
  baseline even at 100 TB (one scan, no shuffle of the corpus itself).
- srp_topk: sign-random-projection LSH. Corpus hashed once into 2^n_planes
  buckets with deterministic pseudo-random hyperplanes (seeded from
  xxhash64 — reproducible across runs/clusters, no stored model); queries
  probe only their own bucket (+ optional multi-probe neighbors), so the
  scored candidate set is ~corpus/2^n_planes per query.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql.functions import broadcast

from syscol_spark.functions.vectors import cosine_similarity


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors by cosine: (query_id, neighbor_id, cosine, rk).
    Deterministic ties: (cosine desc, neighbor_id asc)."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.crossJoin(broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity("q_vec", "c_vec"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.select("*", F.row_number().over(w).cast("long").alias("rk"))
        .filter(F.col("rk") <= k)
    )


def _srp_plane(dim: int, plane: int, seed: int = 42) -> list[float]:
    """Deterministic pseudo-random hyperplane: unit-free gaussian-ish values
    from a splitmix-style integer hash. Pure python at plan time."""
    vals = []
    for d in range(dim):
        x = (plane * 1_000_003 + d * 19_349_663 + seed * 83_492_791) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 33
        x = (x * 0xFF51AFD7ED558CCD) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 33
        u = (x & 0xFFFFFFFF) / 2**32  # uniform [0,1)
        vals.append(math.sqrt(-2 * math.log(u + 1e-12)) * math.cos(2 * math.pi * ((x >> 32) / 2**32)))
    return vals


def srp_bucket(vec: Column | str, dim: int, n_planes: int = 8, seed: int = 42) -> Column:
    """LSH bucket id: sign bits of <vec, plane_i> packed into a long."""
    v = F.col(vec) if isinstance(vec, str) else vec
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(x) for x in _srp_plane(dim, p, seed)])
        d = F.aggregate(F.zip_with(v, plane, lambda a, b: a.cast("double") * b), F.lit(0.0), lambda acc, x: acc + x)
        bucket = bucket.bitwiseOR(F.when(d >= 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long")))
    return bucket


def srp_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    k: int = 5,
    n_planes: int = 6,
) -> DataFrame:
    """Approximate top-k: score only same-bucket candidates (equi-join on the
    SRP bucket), then rank. Same output columns as brute_force_topk."""
    b = srp_bucket(vec_col, dim, n_planes)
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"), b.alias("bucket"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), b.alias("bucket"))
    scored = (
        c.join(broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(cosine_similarity("q_vec", "c_vec"), 6).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.select("*", F.row_number().over(w).cast("long").alias("rk")).filter(F.col("rk") <= k)
