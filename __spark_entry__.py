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


def _history() -> tuple[set[str], dict[str, int], dict[int, str]]:
    """(recorded, last_green, record_file): names seen in any prior round's
    record, for each passing name the LATEST round number with an err-free
    row, and for each round the record file's ACTUAL basename (the files on
    disk are zero-padded — CORRECTNESS_r06.json — so reconstructing the name
    from the int silently misses them; round 6's drift tier was a no-op
    because of exactly that)."""
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    recorded: set[str] = set()
    last_green: dict[str, int] = {}
    record_file: dict[int, str] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        record_file[rnd] = os.path.basename(path)
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
    return recorded, last_green, record_file


def _first_party_closure(src: str, here: str, _cache: dict | None = None) -> set[str]:
    """Transitive set of repo-relative syscol_spark/*.py paths reachable from
    ``src`` via static imports (ast scan — no execution). Drift keyed only on
    the plan wrapper's own module missed operator rewrites: a query whose
    wrapper lives in plans/northstar.py delegates to operators/dedup.py, and
    an edit there must mark it drifted too."""
    import ast
    import os

    if _cache is None:
        _cache = {}

    def _module_paths(modname: str):
        parts = modname.split(".")
        for cand in (
            os.path.join(*parts) + ".py",
            os.path.join(*parts, "__init__.py"),
        ):
            if os.path.exists(os.path.join(here, cand)):
                yield cand

    def _direct(rel: str) -> set[str]:
        """Repo-relative paths of first-party modules ``rel`` imports
        directly. Cached per module — cycle-safe because the cache only ever
        holds COMPLETE direct-import sets; the transitive closure below is a
        separate fixpoint walk (a pre-seeded recursive cache let a cyclic
        dependent snapshot a partially-built set and permanently miss deps)."""
        if rel in _cache:
            return _cache[rel]
        try:
            with open(os.path.join(here, rel)) as fh:
                tree = ast.parse(fh.read())
        except (OSError, SyntaxError):
            _cache[rel] = set()
            return _cache[rel]
        pkg_parts = rel.split(os.sep)[:-1]  # package dirs of this module
        names: set[str] = set()
        for node in ast.walk(tree):
            if isinstance(node, ast.Import):
                names.update(a.name for a in node.names)
            elif isinstance(node, ast.ImportFrom):
                if node.level:  # relative: resolve against this pkg
                    base = pkg_parts[: len(pkg_parts) - (node.level - 1)]
                    prefix = ".".join(base)
                    mod = f"{prefix}.{node.module}" if node.module else prefix
                else:
                    mod = node.module or ""
                if mod:
                    names.add(mod)
                    # `from pkg.mod import name` where name is itself a module
                    names.update(f"{mod}.{a.name}" for a in node.names)
        deps: set[str] = set()
        for modname in names:
            if not modname.startswith("syscol_spark"):
                continue
            deps.update(_module_paths(modname))
        _cache[rel] = deps
        return deps

    start = os.path.relpath(os.path.abspath(src), here)
    out = {start}
    frontier = [start]
    while frontier:
        rel = frontier.pop()
        for dep in _direct(rel):
            if dep not in out:
                out.add(dep)
                frontier.append(dep)
    return out


def _drifted(cat: dict, last_green: dict[str, int], record_file: dict[int, str]) -> set[str]:
    """Names whose builder module — or any first-party module it transitively
    imports — changed since the commit that recorded their last green round.
    An unresolvable record commit counts as drifted (unknown freshness must
    be re-verified, not trusted). Best-effort: any git/inspect failure
    degrades to 'drifted' for that name rather than breaking the contract."""
    import inspect
    import os
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))

    def _git(*args: str) -> str:
        return subprocess.run(
            ["git", "-C", here, *args],
            capture_output=True, text=True, timeout=30, check=True,
        ).stdout

    changed_since: dict[int, set[str] | None] = {}
    closure_cache: dict = {}
    out: set[str] = set()
    for name, fn in cat.items():
        rnd = last_green.get(name)
        if rnd is None:
            continue
        try:
            if rnd not in changed_since:
                rec_name = record_file.get(rnd)
                rec = (
                    _git("log", "-n1", "--format=%H", "--", rec_name).strip()
                    if rec_name
                    else ""
                )
                if not rec:
                    changed_since[rnd] = None  # unknown → treat as drifted
                else:
                    # diff vs the working tree (not HEAD) so uncommitted
                    # builder edits count as drift too
                    diff = _git("diff", "--name-only", rec)
                    changed_since[rnd] = {ln.strip() for ln in diff.splitlines() if ln.strip()}
            changed = changed_since[rnd]
            if changed is None:
                out.add(name)
                continue
            src = inspect.getsourcefile(inspect.unwrap(fn))
            deps = _first_party_closure(src, here, closure_cache)
            if deps & changed:
                out.add(name)
        except Exception:  # noqa: BLE001 - unknown freshness → re-verify
            out.add(name)
    return out


def _prioritized(cat: dict) -> dict:
    recorded, last_green, record_file = _history()
    drift = _drifted(cat, last_green, record_file)
    never_recorded = {n: f for n, f in cat.items() if n not in recorded}
    errored = {n: f for n, f in cat.items() if n in recorded and n not in last_green}
    # stalest-first inside the drift tier: with more drifted names than the
    # driver's 50 record slots, the slots must land on the OLDEST greens
    drifted = {
        n: cat[n]
        for n in sorted(
            (n for n in cat if n in last_green and n in drift),
            key=lambda n: (last_green[n], list(cat).index(n)),
        )
    }
    # fresh tier also oldest-record-first: when nothing drifts, the driver's
    # leftover record slots keep cycling through the names whose latest green
    # row is oldest instead of re-recording the top of the catalog
    rest = {
        n: cat[n]
        for n in sorted(
            (n for n in cat if n in last_green and n not in drift),
            key=lambda n: (last_green[n], list(cat).index(n)),
        )
    }
    return {**never_recorded, **errored, **drifted, **rest}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.11."""
    from syscol_spark.plans.catalog import query_catalog

    return _prioritized(query_catalog())


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins; omitted keys get rows-only checks."""
    from syscol_spark.plans.catalog import oracle_sql_catalog

    return oracle_sql_catalog()
