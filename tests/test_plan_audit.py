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

import pytest

from syscol_spark.plans.catalog import QUERIES, _ensure_loaded

SF_DIR = "/root/testdata/sf0.001"


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def plans(spark):
    _ensure_loaded()
    out: dict[str, str] = {}
    for name, spec in QUERIES.items():
        out[name] = _physical_plan(spec.builder(spark, SF_DIR))
    return out


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
