"""Drift-re-verification tier tests (__spark_entry__._drifted).

Round 6 shipped this tier broken: the record filename was reconstructed
un-padded (CORRECTNESS_r6.json vs the on-disk CORRECTNESS_r06.json), so
`git log` found no commit, changed_since degraded to the empty set, and
zero entries were ever classified drifted. These tests pin the fixed
behavior against the REAL repo + git history (frozen facts: the r02
record's commit exists, and plans/northstar.py changed after it), so they
stay deterministic across future rounds.
"""

from __future__ import annotations

import os
import subprocess

import __spark_entry__ as entry

HERE = os.path.dirname(os.path.abspath(entry.__file__))


def _catalog():
    from syscol_spark.plans.catalog import query_catalog

    return query_catalog()


def test_history_returns_real_record_filenames():
    """Every record file must exist with its ACTUAL zero-padded basename.

    A record file with no git history is LEGAL — the driver drops the
    current round's CORRECTNESS_r{N}.json before the builder can commit it
    — so for those we assert the conservative fallback instead: every entry
    whose last green lives only in an uncommitted record classifies as
    drifted (unknown freshness is re-verified, never trusted)."""
    recorded, last_green, record_file = entry._history()
    assert recorded and last_green
    uncommitted_rounds = set()
    for rnd, fname in record_file.items():
        assert os.path.exists(os.path.join(HERE, fname)), fname
        rec = subprocess.run(
            ["git", "-C", HERE, "log", "-n1", "--format=%H", "--", fname],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
        if not rec:
            uncommitted_rounds.add(rnd)
    if uncommitted_rounds:
        cat = _catalog()
        drift = entry._drifted(cat, last_green, record_file)
        stranded = {
            n for n, rnd in last_green.items()
            if rnd in uncommitted_rounds and n in cat
        }
        assert stranded <= drift, sorted(stranded - drift)


def test_uncommitted_record_falls_back_to_drifted(tmp_path):
    """Simulated driver drop: a record file that exists on disk but has no
    git history must make its round's entries classify as drifted."""
    cat = _catalog()
    name = next(iter(cat))
    fname = "CORRECTNESS_r98.json"
    path = os.path.join(HERE, fname)
    assert not os.path.exists(path), "test round collides with a real record"
    with open(path, "w") as fh:
        fh.write("{}")
    try:
        drift = entry._drifted(cat, {name: 98}, {98: fname})
        assert name in drift
    finally:
        os.remove(path)


def test_drift_fires_for_stale_northstar_green():
    """A query whose builder lives in plans/northstar.py and whose last
    green is round 2 MUST be drifted: northstar.py gained ~1000 lines after
    the commit that recorded CORRECTNESS_r02.json (frozen git history)."""
    cat = _catalog()
    _, _, record_file = entry._history()
    assert 2 in record_file
    assert "q_ngram_jaccard" in cat
    drift = entry._drifted(cat, {"q_ngram_jaccard": 2}, record_file)
    assert "q_ngram_jaccard" in drift


def test_unresolvable_record_round_counts_as_drifted():
    """A last-green round with no record file (or no git history) is
    'freshness unknown' and must be re-verified, not trusted."""
    cat = _catalog()
    name = next(iter(cat))
    drift = entry._drifted(cat, {name: 99}, {})
    assert name in drift


def test_closure_tracks_operator_modules():
    """Drift must key on the TRANSITIVE first-party import set, not just the
    plan wrapper's own module: editing only operators/dedup.py has to mark
    northstar-built dedup queries (e.g. q_ngram_jaccard) as drifted."""
    src = os.path.join(HERE, "syscol_spark", "plans", "northstar.py")
    closure = entry._first_party_closure(src, HERE)
    assert os.path.join("syscol_spark", "plans", "northstar.py") in closure
    assert os.path.join("syscol_spark", "operators", "dedup.py") in closure
    assert os.path.join("syscol_spark", "operators", "similarity.py") in closure
    assert os.path.join("syscol_spark", "functions", "text.py") in closure


def test_closure_survives_import_cycles(tmp_path):
    """A<->B cycle where A also imports C: closure(B) must still reach C
    (the old pre-seeded recursive cache let B snapshot A's partially-built
    set and permanently miss C)."""
    pkg = tmp_path / "syscol_spark"
    pkg.mkdir()
    (pkg / "__init__.py").write_text("")
    (pkg / "a.py").write_text("import syscol_spark.b\nimport syscol_spark.c\n")
    (pkg / "b.py").write_text("import syscol_spark.a\n")
    (pkg / "c.py").write_text("x = 1\n")
    closure = entry._first_party_closure(str(pkg / "b.py"), str(tmp_path))
    assert os.path.join("syscol_spark", "c.py") in closure
    # and the cached variant agrees when A was resolved first (cycle entry
    # point order must not matter)
    cache: dict = {}
    entry._first_party_closure(str(pkg / "a.py"), str(tmp_path), cache)
    closure_b = entry._first_party_closure(str(pkg / "b.py"), str(tmp_path), cache)
    assert os.path.join("syscol_spark", "c.py") in closure_b


def test_real_repo_drift_covers_all_stale_r2_greens():
    """Every query still carrying an r2 green whose builder closure touches
    plans/northstar.py must be in today's drift set. Future-proof: once a
    later round refreshes a query's green, last_green moves past 2 and the
    name drops out of the expectation automatically."""
    import inspect

    cat = _catalog()
    _, last_green, record_file = entry._history()
    drift = entry._drifted(cat, last_green, record_file)
    northstar = os.path.join("syscol_spark", "plans", "northstar.py")
    cache: dict = {}
    expected = set()
    for name, fn in cat.items():
        if last_green.get(name) != 2:
            continue
        src = inspect.getsourcefile(inspect.unwrap(fn))
        if northstar in entry._first_party_closure(src, HERE, cache):
            expected.add(name)
    assert expected <= drift, sorted(expected - drift)


def test_prioritized_orders_drift_stalest_first():
    cat = _catalog()
    ordered = entry._prioritized(cat)
    assert set(ordered) == set(cat)
    _, last_green, record_file = entry._history()
    drift = entry._drifted(cat, last_green, record_file)
    # within the drifted tier, last-green rounds must be non-decreasing
    tier = [n for n in ordered if n in drift and n in last_green]
    rounds = [last_green[n] for n in tier]
    assert rounds == sorted(rounds)


def test_prioritized_orders_fresh_tier_oldest_record_first():
    """The rest (fresh, undrifted) tier must also be ascending in last-green
    round, so leftover driver record slots cycle through the stalest greens
    even when nothing drifts."""
    cat = _catalog()
    ordered = entry._prioritized(cat)
    _, last_green, record_file = entry._history()
    drift = entry._drifted(cat, last_green, record_file)
    tier = [n for n in ordered if n in last_green and n not in drift]
    rounds = [last_green[n] for n in tier]
    assert rounds == sorted(rounds)
