"""Deterministic sampling, dataset mixing and sequence packing (north-star:
training-data pipeline).

Training-data curation needs samples that are REPRODUCIBLE — re-running the
pipeline (or re-running one failed partition) must select the same rows. So
nothing here uses rand(): membership is a pure function of the row key via an
engine-portable md5 bucket (same construction as functions/text.py token_int,
so every query has an exact DuckDB oracle twin).

Scale notes (100 TB):
- hash_sample / weighted_mixture are pure map-side filters — zero shuffle,
  evaluated inside whole-stage codegen at scan rate, and combine with
  predicate pushdown on other columns.
- stratified_sample shuffles once on the stratum key (the per-group cap needs
  a per-group ranking). Stratum cardinality is typically small (language,
  source); AQE handles stratum skew. For per-stratum caps over HUGE strata,
  pre-filter with hash_sample to ~10× the cap first, then rank.
- pack_sequences sorts within each pack group (one shuffle + in-partition
  sort). Packing a 100 TB corpus in ONE global sequence would serialize into
  a single sort; grouping by a shard key (lang, source, date-bucket) keeps
  every group independent and parallel — which is how production pretraining
  pipelines shard packing anyway.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

MILLION = 1_000_000


def hash_bucket(key: Column | str, seed: int = 7, buckets: int = MILLION) -> Column:
    """Deterministic engine-portable bucket in [0, buckets): first 15 hex
    chars of md5(key ':' seed) (60 bits — no sign issues in a long), mod
    buckets. Uniform enough for rate-based sampling; reproducible on any
    engine with md5 (the DuckDB twin is hash_bucket_sql)."""
    k = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(k.cast("string"), F.lit(f":{seed}")))
    return F.pmod(F.conv(F.substring(h, 1, 15), 16, 10).cast("long"), F.lit(buckets))


def hash_bucket_sql(key_expr: str, seed: int = 7, buckets: int = MILLION) -> str:
    """DuckDB twin of hash_bucket, for oracle SQL construction."""
    return (
        f"(('0x' || substr(md5(CAST({key_expr} AS VARCHAR) || ':{seed}'), 1, 15))::BIGINT"
        f" % {buckets})"
    )


def hash_sample(df: DataFrame, key_col: str, keep_ppm: int, seed: int = 7) -> DataFrame:
    """Keep rows whose bucket < keep_ppm (parts-per-million) — a deterministic
    ~keep_ppm/1e6 sample. Pure filter: no shuffle, no state, re-runs select
    identical rows."""
    return df.filter(hash_bucket(key_col, seed) < F.lit(keep_ppm))


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    n_per_stratum: int,
    seed: int = 7,
) -> DataFrame:
    """At most ``n_per_stratum`` rows per stratum, chosen deterministically:
    rank rows within the stratum by (hash bucket, key) and keep the first n.
    The hash ordering makes the selection uniform-ish over the stratum while
    staying reproducible; the key tie-break makes it total."""
    w = Window.partitionBy(stratum_col).orderBy(hash_bucket(key_col, seed), F.col(key_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def weighted_mixture(
    df: DataFrame,
    key_col: str,
    rate_ppm: Column,
    seed: int = 7,
) -> DataFrame:
    """Keep each row iff hash_bucket(key) < rate_ppm(row) — the dataset-
    mixing primitive (upweight curated sources, downweight web crawl). With
    a per-source ``rate_ppm`` expression (CASE/map on the source column)
    every source is independently down-sampled to its target weight in one
    codegen'd filter pass — no shuffle, no unions, deterministic; the rate
    table lives in the plan, not in a join."""
    return df.filter(hash_bucket(key_col, seed) < rate_ppm)


def cluster_balanced_sample(
    df: DataFrame,
    cluster_col: str,
    key_col: str,
    cap: int | None = None,
    seed: int = 7,
) -> DataFrame:
    """Cluster-balanced down-sampling: keep each row with probability
    ``min(1, cap / cluster_size)`` so every cluster contributes at most
    ~``cap`` rows in expectation — the cluster-rebalance step of
    SemDeDup-style curation (prune over-represented semantic clusters
    without touching rare ones). ``cap=None`` balances to the MEAN
    cluster size, derived on-plan (no driver count, so the same plan
    serves any corpus size).

    Rates are derived on-plan: one small aggregate (k rows, one per
    cluster) broadcast back onto the corpus, then the same deterministic
    md5-ppm filter as hash_sample. Deliberately NOT a per-cluster
    row_number window (stratified_sample): a window shuffles the full
    corpus on the cluster key and a hot cluster lands on one task, while
    this shape is a tiny agg + a map-side join + a codegen'd filter —
    skew-immune at 100 TB. The trade is exact-n vs expected-n; rebalance
    wants rates, not exact counts.

    Adds ``cluster_n`` (cluster size) and ``keep_ppm`` (applied rate) to
    the surviving rows so the sampling manifest is auditable downstream.
    """
    counts = df.groupBy(cluster_col).agg(F.count(F.lit(1)).alias("cluster_n"))
    if cap is None:
        mean = counts.agg(
            F.ceil(F.sum("cluster_n").cast("double") / F.count(F.lit(1)))
            .cast("long")
            .alias("__cap")
        )
        counts = counts.crossJoin(F.broadcast(mean))
        cap_col = F.col("__cap")
    else:
        if cap <= 0:
            raise ValueError("cap must be positive")
        cap_col = F.lit(cap).cast("long")
    rate = F.least(
        F.lit(MILLION).cast("long"),
        F.floor((F.lit(MILLION) * cap_col) / F.col("cluster_n")).cast("long"),
    )
    counts = counts.withColumn("keep_ppm", rate).drop("__cap")
    return (
        df.join(F.broadcast(counts), cluster_col)
        .filter(hash_bucket(key_col, seed) < F.col("keep_ppm"))
    )


def pack_sequences(
    df: DataFrame,
    group_col: str,
    id_col: str,
    n_tokens: Column,
    budget: int,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid end-to-end in
    deterministic (group, id) order and cut into fixed ``budget``-token
    context windows — the standard pretraining packing scheme (docs straddle
    window boundaries and are split, nothing is padded away).

    Emits the packing manifest: each doc's global token ``offset`` within
    its group, the ``first_pack``/``last_pack`` window ids it lands in, and
    ``n_splits`` (how many window boundaries cut it). Downstream, the actual
    tensor assembly is a per-pack gather driven by this manifest.

    All integer arithmetic (exclusive running sum + integer div) — exact at
    any corpus size; one shuffle on the group key."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = n_tokens.cast("long")
    out = (
        df.withColumn("n_tok", toks)
        .withColumn("offset", F.coalesce(F.sum("n_tok").over(w), F.lit(0)).cast("long"))
        # empty docs still occupy a position: treat them as 1 token wide for
        # window membership so first<=last always holds
        .withColumn("__w", F.greatest(F.col("n_tok"), F.lit(1)))
        .withColumn("first_pack", F.expr(f"offset div {budget}"))
        .withColumn("last_pack", F.expr(f"(offset + __w - 1) div {budget}"))
        .withColumn("n_splits", (F.col("last_pack") - F.col("first_pack")).cast("long"))
        .drop("__w")
    )
    return out
