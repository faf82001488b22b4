"""Compare two bench JSON artifacts per query: regressions and wins.

Usage: python scripts/bench_diff.py OLD.json NEW.json [threshold_pct]

Reads the per-query min-of-3 seconds from each artifact's "queries" dict
(falling back to "queries_single_pass") and prints queries whose time moved
more than ``threshold_pct`` (default 30) in either direction, plus totals.
Pure driver-side — safe to run next to nothing (it never touches Spark).
"""

from __future__ import annotations

import json
import sys


def _queries(path: str) -> dict[str, float]:
    with open(path) as fh:
        data = json.load(fh)
    q = data.get("queries") or data.get("queries_single_pass") or {}
    return {k: float(v) for k, v in q.items()}


def main() -> int:
    old_path, new_path = sys.argv[1], sys.argv[2]
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 30.0
    old, new = _queries(old_path), _queries(new_path)
    common = sorted(set(old) & set(new))
    print(f"common={len(common)}  only_old={len(set(old)-set(new))}  only_new={len(set(new)-set(old))}")
    print(f"sum_old={sum(old[q] for q in common):.1f}s  sum_new={sum(new[q] for q in common):.1f}s (common queries)")
    moved = []
    for q in common:
        a, b = old[q], new[q]
        base = max(a, 0.05)
        pct = 100.0 * (b - a) / base
        if abs(pct) >= thresh and abs(b - a) >= 0.3:
            moved.append((pct, q, a, b))
    for pct, q, a, b in sorted(moved, reverse=True):
        print(f"{pct:+7.1f}%  {q:32s} {a:6.2f}s -> {b:6.2f}s")
    if not moved:
        print(f"no query moved more than {thresh}% (and 0.3s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
