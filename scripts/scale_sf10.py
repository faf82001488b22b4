"""sf10 scale probe: a 100x sf0.1 dataset, measured against sf1 (10x step).

Round 10/11 proved the probe discipline: sf1 (10x) measurement caught a
band-saturation scale defect every plan audit had missed. This script takes
the same deterministic inflation two orders of magnitude above the
correctness scale — lineitem 60M rows, documents 500k, embeddings 200k —
and times a hand-picked set of the heaviest, most scale-revealing queries at
BOTH sf1 and sf10 in one session. The 10x-step ratio sf10/sf1 is the honest
scale signal (same session, same warmup, same box); anything superlinear
beyond ~12x (linear + log headroom) is a defect to profile, exactly the
knn_graph treatment.

Dataset derivation is scale_sf1.py's, reused verbatim with K=100 (disjoint
per-copy key spaces; token-salted documents; Rademacher-sign-scrambled
embeddings — see that module's docstring for why each transform preserves
per-copy operator structure while keeping cross-copy interaction zero).

Usage:
    python scripts/scale_sf10.py             # generate (if missing) + probe
    python scripts/scale_sf10.py --gen-only
    python scripts/scale_sf10.py --probe-only

Writes SCALE_SF10.json at the repo root. Run ALONE (bench discipline).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import scale_sf1  # noqa: E402 - the generator/probe library this reuses

from syscol_spark.plans.catalog import QUERIES, _ensure_loaded  # noqa: E402
from syscol_spark.session import get_session  # noqa: E402

SF10_DIR = os.path.join(REPO, ".localdata", "sf10")
SF1_DIR = scale_sf1.SF1_DIR

# One query per scale-critical plan family, heaviest-first — NOT the full
# catalog (a 100x sweep of 202 queries would be a day of wall): each row
# here is the family's worst case, so a clean ratio covers its siblings.
PROBE = [
    "q_knn_graph",          # SRP banding + pair scoring + top-k (auto band width)
    "q_pagerank",           # iterative joins over knn edges
    "q_minhash_lsh",        # banded LSH candidate generation
    "q_substring_dedup",    # positional n-gram explode + groupBy
    "q_lm_perplexity",      # whole-corpus char explode (broadcast-model plan)
    "q_ann_ivfadc_rr_bulk", # distributed IVFADC+R serving joins
    "q_kmeans_lloyd",       # iterative centroid updates
    "q_skew_salted_join",   # hot-key salting at a 60M-row fact table
    "q_ev_session",         # sessionization window over 10M events
    "q01_pricing_summary",  # scan-rate baseline: pushdown + one shuffle
    "q_tfidf",              # token explode + idf join (Arrow-free JVM lane)
    "q_dedup_exact",        # digest groupBy at 500k docs
]

BUDGET_SEC = float(os.environ.get("SCALE_SF10_BUDGET", "4500"))
PER_QUERY_CAP = float(os.environ.get("SCALE_SF10_CAP", "900"))


def generate(spark) -> None:
    # reuse scale_sf1's inflation with K=100 into the sf10 dir
    scale_sf1.K = 100
    scale_sf1.SF1_DIR = SF10_DIR
    try:
        scale_sf1.generate(spark)
    finally:
        scale_sf1.K = 10
        scale_sf1.SF1_DIR = SF1_DIR


def probe(spark) -> dict:
    _ensure_loaded()
    results: dict[str, dict] = {}
    t_start = time.time()
    for name in PROBE:
        if name not in QUERIES:
            continue
        if time.time() - t_start > BUDGET_SEC:
            results[name] = {"status": "budget_exhausted"}
            continue
        row: dict = {}
        try:
            t1 = scale_sf1._time_query(spark, name, SF1_DIR, 1)[0]
            row["sf1_s"] = t1
            if t1 > PER_QUERY_CAP / 12:
                # a 100x run at >=12x of an already-capped sf1 wall would
                # blow the per-query cap; record the skip instead of hanging
                row["status"] = "sf10_skipped_projected_over_cap"
                results[name] = row
                continue
            t10 = scale_sf1._time_query(spark, name, SF10_DIR, 1)[0]
            row["sf10_s"] = t10
            row["ratio_10x_step"] = round(t10 / max(t1, 1e-9), 2)
            row["status"] = "ok"
        except Exception as exc:  # noqa: BLE001 - record, keep probing
            row["status"] = f"error: {exc}"[:300]
        results[name] = row
        print(f"# {name}: {row}", file=sys.stderr)
    return results


def main() -> int:
    gen_only = "--gen-only" in sys.argv
    probe_only = "--probe-only" in sys.argv
    spark = get_session("scale_sf10")
    if not probe_only and not os.path.isdir(SF10_DIR):
        generate(spark)
    elif not probe_only:
        print(f"# {SF10_DIR} exists, skipping generation", file=sys.stderr)
    if gen_only:
        return 0
    if not os.path.isdir(SF1_DIR):
        scale_sf1.generate(spark)
    scale_sf1._warmup(spark)
    results = probe(spark)
    ratios = [r["ratio_10x_step"] for r in results.values() if "ratio_10x_step" in r]
    out = {
        "metric": "sf10_scale_probe",
        "data_factor": "100x sf0.1 (10x step measured vs sf1, same session)",
        "sf1_dir": SF1_DIR,
        "sf10_dir": SF10_DIR,
        "queries": results,
        "n_probed": len(ratios),
        "max_ratio_10x_step": max(ratios) if ratios else None,
        "budget_sec": BUDGET_SEC,
    }
    with open(os.path.join(REPO, "SCALE_SF10.json"), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({k: v for k, v in out.items() if k != "queries"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
