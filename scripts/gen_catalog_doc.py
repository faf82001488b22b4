"""Regenerate CATALOG.md from the query registry (one row per query)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from syscol_spark.plans.catalog import QUERIES, _ensure_loaded  # noqa: E402


def main() -> None:
    _ensure_loaded()
    lines = [
        "# CATALOG — every query, auto-generated from the registry",
        "",
        "Regenerate with `python scripts/gen_catalog_doc.py`. Each row is one",
        "`queries()` entry with a DuckDB oracle twin; `python scripts/parity.py`",
        "verifies all of them (row count + schema + order-insensitive value hash).",
        "",
        f"{len(QUERIES)} queries, {sum(1 for s in QUERIES.values() if s.oracle)} with oracles.",
        "",
        "| query | description |",
        "|---|---|",
    ]
    for name in sorted(QUERIES):
        lines.append(f"| `{name}` | {QUERIES[name].description} |")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "CATALOG.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {len(QUERIES)} entries to {out}")


if __name__ == "__main__":
    main()
