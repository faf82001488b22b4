"""Re-time specific catalog queries in a clean window (min-of-N, solo).

BENCH_r12 flagged q_rank_fusion (+32.9%) and q_bm25 (+30.5%) vs the r10
reference with zero changes to plans/retrieval.py — likely window noise,
but >30% must be re-timed solo before being dismissed. This times the
named queries exactly like bench.py's solo lane (fresh engine session,
noop sink, min over reps) and writes RETIME.json with the measured mins
next to the committed BENCH_FULL.json reference values.

Usage (run ALONE):
    python scripts/retime.py q_rank_fusion q_bm25 [--reps 5] [--sf DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from syscol_spark.plans.catalog import QUERIES, _ensure_loaded  # noqa: E402
from syscol_spark.session import get_session  # noqa: E402


def main() -> int:
    argv = list(sys.argv[1:])
    reps = 5
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        del argv[i : i + 2]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in argv:
        i = argv.index("--sf")
        sf_dir = argv[i + 1]
        del argv[i : i + 2]
    names = argv or ["q_rank_fusion", "q_bm25"]

    _ensure_loaded()
    spark = get_session("retime")
    # warmup: touch every input table + codegen once per query
    for name in names:
        QUERIES[name].builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    with open(os.path.join(REPO, "BENCH_FULL.json")) as fh:
        ref = json.load(fh).get("queries", {})

    # MERGE into an existing artifact so successive targeted runs accumulate
    # instead of erasing each other's rows
    art = os.path.join(REPO, "RETIME.json")
    out = {"metric": "solo_retime", "sf_dir": sf_dir, "reps": reps, "queries": {}}
    if os.path.exists(art):
        prev = json.load(open(art))
        if prev.get("sf_dir") == sf_dir:
            out["queries"] = prev.get("queries", {})
            if "note" in prev:
                out["note"] = prev["note"]
    for name in names:
        times = []
        for _ in range(reps):
            t0 = time.time()
            QUERIES[name].builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(round(time.time() - t0, 3))
        best = min(times)
        row = {
            "min_s": best,
            "all_s": times,
            "ref_s": ref.get(name),
            "ratio_vs_ref": round(best / ref[name], 3) if ref.get(name) else None,
        }
        out["queries"][name] = row
        print(f"# {name}: {row}", file=sys.stderr)
    with open(os.path.join(REPO, "RETIME.json"), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
