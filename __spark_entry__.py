"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``syscol_spark.plans`` (catalog of
(Spark builder, DuckDB oracle) pairs); this module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: average metric value per
    entity per minute over the stream-shaped events table (SURVEY.md §7 M1)."""
    from syscol_spark.plans.catalog import query_catalog

    return query_catalog()["q_ev_minutely"](spark, SF0001)


# The driver records at most 50 CORRECTNESS entries per round, in queries()
# dict order. Four-tier priority so the union of per-round records converges
# on a FRESH green row for the whole catalog: entries never recorded by any
# prior round first, then entries recorded only with errors (a fixed query
# gets re-verified), then entries whose BUILDER MODULE changed in git since
# the round that recorded their last green row (a green from r2 proves
# nothing about an operator rewritten in r5 — the drift tier re-spends
# record slots on exactly those), then entries whose green is still fresh.
# Computed from the CORRECTNESS_r*.json files + git — no hand-kept list to
# go stale. (Every entry is also independently checkable via
# `python scripts/parity.py <name>`.)


def _history() -> tuple[set[str], dict[str, int]]:
    """(recorded, last_green): names seen in any prior round's record, and
    for each passing name the LATEST round number with an err-free row."""
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    recorded: set[str] = set()
    last_green: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            recorded.add(name)
            if isinstance(row, dict) and not row.get("err"):
                last_green[name] = max(last_green.get(name, 0), rnd)
    return recorded, last_green


def _drifted(cat: dict, last_green: dict[str, int]) -> set[str]:
    """Names whose builder's source module changed since the commit that
    recorded their last green round. Best-effort: any git/inspect failure
    degrades to 'not drifted' rather than breaking the driver contract."""
    import inspect
    import os
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))

    def _git(*args: str) -> str:
        return subprocess.run(
            ["git", "-C", here, *args],
            capture_output=True, text=True, timeout=30, check=True,
        ).stdout

    changed_since: dict[int, set[str]] = {}
    out: set[str] = set()
    for name, fn in cat.items():
        rnd = last_green.get(name)
        if rnd is None:
            continue
        try:
            if rnd not in changed_since:
                rec = _git("log", "-n1", "--format=%H", "--", f"CORRECTNESS_r{rnd}.json").strip()
                if not rec:
                    changed_since[rnd] = set()
                else:
                    # diff vs the working tree (not HEAD) so uncommitted
                    # builder edits count as drift too
                    diff = _git("diff", "--name-only", rec)
                    changed_since[rnd] = {ln.strip() for ln in diff.splitlines() if ln.strip()}
            src = inspect.getsourcefile(inspect.unwrap(fn))
            rel = os.path.relpath(os.path.abspath(src), here)
            if rel in changed_since[rnd]:
                out.add(name)
        except Exception:  # noqa: BLE001 - prioritization is best-effort
            continue
    return out


def _prioritized(cat: dict) -> dict:
    recorded, last_green = _history()
    drift = _drifted(cat, last_green)
    never_recorded = {n: f for n, f in cat.items() if n not in recorded}
    errored = {n: f for n, f in cat.items() if n in recorded and n not in last_green}
    drifted = {n: f for n, f in cat.items() if n in last_green and n in drift}
    rest = {n: f for n, f in cat.items() if n in last_green and n not in drift}
    return {**never_recorded, **errored, **drifted, **rest}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.11."""
    from syscol_spark.plans.catalog import query_catalog

    return _prioritized(query_catalog())


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins; omitted keys get rows-only checks."""
    from syscol_spark.plans.catalog import oracle_sql_catalog

    return oracle_sql_catalog()
