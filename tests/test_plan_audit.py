"""Catalog-wide physical-plan audit — the scale contract, enforced.

Correctness oracles prove the small-SF answer; these assertions prove the
PLAN is one that survives a 1000-executor / 100 TB scale-up:

* no CartesianProduct anywhere (a non-broadcast cross join is O(n*m)
  shuffle-and-compare — the canonical scale killer; intentional 1-row
  cross joins plan as BroadcastNestedLoopJoin and are fine),
* no BatchEvalPython (row-at-a-time Python UDFs serialize row-by-row
  through the Python worker; every Python crossing must be Arrow-batched
  ArrowEvalPython / mapInPandas / FlatMapGroupsInPandas),
* filters/projections reach the parquet scans of the selective TPC-H
  queries (PushedFilters + pruned ReadSchema), so Catalyst pushdown is
  actually happening through our loader shims.

Plans are only BUILT here (no noop-sink execution of the query itself), but
some builders run eager Spark work at plan-construction time — q_ann_ivf's
bounded k-means training collect and the localCheckpoint() calls in
q_minhash_lsh / q_simhash / pagerank / ngram_jaccard_pairs — so the
module-scoped fixture does execute jobs for those queries (the reason
SF_DIR points at the smallest fixture). The audit still fails on the
offending query by name.
"""

from __future__ import annotations

import re

import pytest

from syscol_spark.plans.catalog import QUERIES, _ensure_loaded

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def built(spark):
    _ensure_loaded()
    phys: dict[str, str] = {}
    logical: dict[str, str] = {}
    for name, spec in QUERIES.items():
        qe = spec.builder(spark, SF_DIR)._jdf.queryExecution()
        phys[name] = qe.executedPlan().toString()
        logical[name] = qe.optimizedPlan().toString()
    return phys, logical


@pytest.fixture(scope="module")
def plans(built):
    return built[0]


@pytest.fixture(scope="module")
def logical_plans(built):
    return built[1]


def test_catalog_covered(plans):
    assert len(plans) >= 107


def test_no_cartesian_product_anywhere(plans):
    offenders = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert offenders == [], f"non-broadcast cross joins in: {offenders}"


def test_no_row_at_a_time_python_udf_anywhere(plans):
    offenders = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert offenders == [], f"row-at-a-time Python UDFs in: {offenders}"


def test_q06_filters_pushed_to_scan(plans):
    plan = plans["q06_forecast_revenue"]
    assert "PushedFilters: [" in plan
    # the selective predicates must reach the parquet reader, not a
    # post-scan Filter only
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "l_discount" in pushed and "l_quantity" in pushed, pushed


def test_q06_scan_prunes_columns(plans):
    plan = plans["q06_forecast_revenue"]
    read = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    # 4-column query over a 16-column table: the scan must not read all 16
    assert "l_extendedprice" in read and "l_comment" not in read, read


def test_q03_small_dim_broadcast(plans):
    # customer filtered to one segment joins orders/lineitem: the plan must
    # broadcast a side rather than shuffle both (local sizes make every
    # side broadcastable; what we assert is that SOME broadcast join was
    # chosen, i.e. the plan is not all-shuffle)
    assert "BroadcastHashJoin" in plans["q03_shipping_priority"]


# Queries whose SEMANTICS require Expand (grouping-set replication, sliding
# windows, unpivot). Everything else must plan without it: an unexpected
# Expand means a multi-distinct aggregate rewrite multiplying every input
# row (the q_profile/q_approx_distinct trap — measured x6 row inflation).
_EXPAND_JUSTIFIED = {"q_rollup", "q_cube", "q_grouping_sets", "q_ev_sliding", "q_unpivot"}


def test_no_unjustified_expand_anywhere(plans):
    offenders = [
        n for n, p in plans.items() if "Expand" in p and n not in _EXPAND_JUSTIFIED
    ]
    assert offenders == [], f"unexpected Expand (multi-distinct rewrite?) in: {offenders}"


# --- broadcast-hint discipline -------------------------------------------------
# A broadcast() HINT forces the build side onto every executor regardless of
# runtime size, so a hinted side whose row count derives from a GROUPED
# aggregation of data (distinct keys, per-token counts, segment hashes) is a
# guaranteed OOM at the 100 TB design point even when it is tiny at test SF.
# This audit walks every optimized logical plan: for each broadcast-hinted
# join side it proves the row count bounded — a GlobalLimit, a global (un-
# grouped) Aggregate (exactly 1 row), a LocalRelation / createDataFrame
# trainer table, or compositions thereof. A grouped Aggregate on the
# cardinality spine fails the proof and the query must either drop the hint
# (plain equi-join — AQE broadcasts at runtime only when it fits) or appear
# in the justified allowlist below with a reason the walker cannot see
# (value-domain caps like pmod-by-literal group keys, literal-filtered key
# sets, bounded label/cluster/dimension domains).

_TREE_NODE = re.compile(r"^((?::  |   )*)(?::-|\+-) (.*)$")


def _parse_tree(plan: str) -> list[tuple[int, str]]:
    nodes = []
    for line in plan.splitlines():
        m = _TREE_NODE.match(line)
        if m:
            nodes.append((len(m.group(1)) // 3 + 1, m.group(2)))
        elif line.strip():
            nodes.append((0, line.strip()))
    return nodes


def _children(nodes: list[tuple[int, str]], i: int) -> list[int]:
    d = nodes[i][0]
    out = []
    for j in range(i + 1, len(nodes)):
        if nodes[j][0] <= d:
            break
        if nodes[j][0] == d + 1:
            out.append(j)
    return out


def _is_grouped_aggregate(text: str) -> bool:
    # grouped prints "Aggregate [keys], [exprs]"; global prints one list
    if not text.startswith("Aggregate ["):
        return False
    depth = 0
    for pos in range(len("Aggregate "), len(text)):
        ch = text[pos]
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                return text[pos + 1 : pos + 4] == ", ["
    return False


def _bounded(nodes: list[tuple[int, str]], i: int, why: list[str]) -> bool:
    """True if the subtree at i provably yields a bounded row count. Raw
    relation scans are treated as bounded here on purpose: plain dimension
    broadcasts and literal-filtered query sets are the intended uses of the
    hint, and flagging them would force the allowlist to enumerate every
    TPC-H dim join. The unbounded-AGGREGATION pattern is what this audit
    exists to ban."""
    _d, text = nodes[i]
    if text.startswith(("GlobalLimit", "LocalLimit")):
        return True
    if text.startswith("Aggregate"):
        if _is_grouped_aggregate(text):
            why.append(text.split("],")[0] + "]")
            return False
        return True  # global aggregate: exactly one row
    if text.startswith(("LocalRelation", "OneRowRelation", "Relation", "LogicalRDD")):
        return True
    kids = _children(nodes, i)
    if not kids:
        return True
    return all(_bounded(nodes, k, why) for k in kids)


def _unbounded_agg_broadcasts(plan: str) -> list[str]:
    nodes = _parse_tree(plan)
    hits: list[str] = []
    for i, (_d, text) in enumerate(nodes):
        if not text.startswith("Join"):
            continue
        kids = _children(nodes, i)
        for hint, idx in (("leftHint", 0), ("rightHint", 1)):
            if f"{hint}=(strategy=broadcast)" not in text or idx >= len(kids):
                continue
            why: list[str] = []
            if not _bounded(nodes, kids[idx], why):
                hits.extend(why)
    return hits


# Hinted grouped-aggregation broadcasts whose bound is real but invisible to
# the plan walker. Every entry needs a reason; anything NOT listed here that
# broadcasts a grouped aggregation fails the audit.
_BOUNDED_AGG_BROADCAST_JUSTIFIED = {
    # group key is pmod(hash, literal): value domain capped regardless of
    # input key count (the sketch-prefilter bucket table, 2^20 rows max)
    "q_sketch_prefilter_join",
    # bloom bit-position table: DISTINCT over pmod(md5, 8192) — <= m rows
    # by construction regardless of build-side key count
    "q_bloom_prefilter",
    # 256 pmod token buckets (bucket-level DSIR importance weights)
    "q_dsir_weights",
    # per-(label, dim) / per-(cluster, dim) centroid tables: label and
    # cluster domains are fixed and dims is the embedding width
    "q_nearest_centroid",
    "q_kmeans_lloyd",
    "q_embed_outliers",
    "q_embed_quantize",
    "q_cluster_balance",
    # language x char-n-gram profile: both domains bounded (not vocabulary)
    "q_lang_id_ngram",
    "q_pipeline_e2e",
    # per-token df over tokens FILTERED to a literal query-term list
    "q_bm25",
    "q_rank_fusion",
    # q_lm_perplexity dropped from this list in r14: its alphabet^2-bounded
    # char-bigram count table is now materialised via localCheckpoint, so the
    # audit no longer sees a grouped aggregation beneath the broadcast hint
    # (the boundedness argument is unchanged, recorded at the builder).
    # Misra-Gries candidate set: capacity-bounded by construction
    "q_heavy_hitters",
    # benchmark n-gram set: bounded by the (small) decontamination bench
    "q_decontaminate",
}


def test_no_broadcast_hint_on_unbounded_aggregation(logical_plans):
    offenders = {
        n: hits
        for n, p in logical_plans.items()
        if n not in _BOUNDED_AGG_BROADCAST_JUSTIFIED
        and (hits := _unbounded_agg_broadcasts(p))
    }
    assert offenders == {}, (
        "broadcast-hinted join sides built from grouped aggregations "
        f"(data-proportional at scale — drop the hint or justify): {offenders}"
    )


def test_broadcast_allowlist_entries_still_hinted(logical_plans):
    # keep the allowlist honest: every justified query must still contain a
    # hinted grouped-aggregation broadcast, else the entry is stale
    stale = [
        n
        for n in sorted(_BOUNDED_AGG_BROADCAST_JUSTIFIED)
        if n in logical_plans and not _unbounded_agg_broadcasts(logical_plans[n])
    ]
    assert stale == [], f"allowlist entries no longer needed: {stale}"
