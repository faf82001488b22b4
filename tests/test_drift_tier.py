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
    recorded, last_green, record_file = entry._history()
    assert recorded and last_green
    # every round's record file is the ACTUAL zero-padded basename and its
    # git history resolves to a commit (the exact lookup _drifted performs)
    for rnd, fname in record_file.items():
        assert os.path.exists(os.path.join(HERE, fname)), fname
        rec = subprocess.run(
            ["git", "-C", HERE, "log", "-n1", "--format=%H", "--", fname],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
        assert rec, f"record file {fname} (round {rnd}) has no git history"


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
