"""Iterative graph analytics over edge lists (PageRank).

Complements the connected-components operator (operators/dedup.py::
dedup_clusters) with the other canonical iterative-dataflow shape: a
damped fixed-point over incoming-edge contributions. In a curation
pipeline this ranks the k-NN graph (operators/similarity.py::knn_graph):
high-rank nodes sit in dense semantic neighborhoods — SemDeDup-style
prune candidates; low-rank nodes are outliers worth auditing.

Scale shape (mirrors dedup_clusters):
- per-iteration work is one equi-join (edges ⋈ ranks on src) plus one
  groupBy(dst) — both shuffle on node ids, never materialize anything
  denser than the edge list;
- out-degrees are computed ONCE outside the loop;
- the iteration chain is truncated every THIRD iteration with a
  localCheckpoint (r14 A/B: a fully-lazy 5-iteration chain measured
  SLOWER — 6.6 s vs 5.0 s at sf0.1 — because the un-materialized rank
  side re-sorts through the deep plan each round; the periodic cut keeps
  plan depth bounded at 3 while paying only ceil(iters/3) eager jobs);
- the node count (the only driver-side constant) comes from one count(),
  the same one-collect-for-constants rule the k-means trainer follows.

Ranks are scaled by N (start at 1.0, sum to N) so emitted values sit
near 1 where a 6dp round is far coarser than the float-sum ulp noise —
the engine-parity discipline from plans/catalog.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    *,
    damping: float = 0.85,
    iterations: int = 5,
) -> DataFrame:
    """N-scaled PageRank after a fixed number of damped iterations.

    Output: (node, pr) with pr rounded to 6dp; sum(pr) ≈ N.
    """
    # Materialize the degree-weighted edge list ONCE, hash-partitioned on
    # src (r15 — was TWO materializations: a repartitioned copy of the raw
    # edges, then deg computed from it and joined back). One aggregation
    # over the producing subplan (e.g. the whole knn_graph build) yields
    # per-src neighbor arrays + degree; exploding restores the edge rows
    # WITH deg attached, and the groupBy's own hash partitioning on src is
    # exactly the layout every iteration's join reuses. Out-degree per src
    # is bounded (k-NN edges), so the transient arrays are small.
    weighted = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .groupBy("src")
        .agg(F.collect_list("dst").alias("__ds"), F.count(F.lit(1)).alias("deg"))
        .select("src", F.explode("__ds").alias("dst"), "deg")
        .localCheckpoint()
    )  # (src, dst, deg) fixed
    # ONE aggregation derives both driver-fixed node frames (r14 — was two
    # checkpoints: a union-distinct for `nodes` plus a left-anti join for
    # `dangling`): every node tagged with whether ANY in-edge reaches it.
    # Nodes with no in-edges are a constant set whose rank is (1-d) after
    # the first iteration, every iteration — computing them once replaces
    # the per-iteration nodes-⋈-contrib left join with a shuffle-free
    # union of a fixed frame.
    nd = (
        weighted.select(F.col("src").alias("node"), F.lit(0).alias("has_in"))
        .unionAll(weighted.select(F.col("dst").alias("node"), F.lit(1).alias("has_in")))
        .groupBy("node")
        .agg(F.max("has_in").alias("has_in"))
        .localCheckpoint()
    )
    dangling = nd.filter(F.col("has_in") == 0).select(
        "node", F.lit(1.0 - damping).alias("pr")
    )

    pr = nd.select("node", F.lit(1.0).alias("pr"))
    for it in range(iterations):
        contrib = (
            weighted.join(pr, weighted.src == pr.node)
            .select("dst", (F.col("pr") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        # every src is in pr by construction (contrib ∪ dangling covers all
        # nodes), so no contribution is ever dropped and the coalesce of the
        # old left join is exactly the dangling union below
        pr = contrib.select(
            F.col("dst").alias("node"),
            (F.lit(1.0 - damping) + F.lit(damping) * F.col("s")).alias("pr"),
        ).unionByName(dangling)
        # truncate lineage every THIRD iteration: each localCheckpoint is an
        # eager job (~0.3-0.5 s scheduling latency at local scale), and a
        # 3-iteration plan is still shallow — cuts the job count by a third.
        # (r14 A/B: removing these entirely and leaving the 5-iteration
        # chain fully lazy measured SLOWER — 6.6 s vs 5.0 s at sf0.1 — the
        # un-materialized pr side re-sorts through the deep plan; keep the
        # periodic truncation.)
        if it % 3 == 2 or it == iterations - 1:
            pr = pr.localCheckpoint()
    return pr.select("node", F.round("pr", 6).alias("pr"))
