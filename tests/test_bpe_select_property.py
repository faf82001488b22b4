"""Property test for the parallel-BPE greedy disjoint-merge selection
(operators/bpe.py::_select_disjoint): the invariants that make one fold
pass safe for a whole batch — no symbol participates in two picked merges,
greedy order is respected, and the selection equals an independent
reference implementation.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from syscol_spark.operators.bpe import _select_disjoint

_SYM = st.text(alphabet="ab", min_size=1, max_size=3)
_PAIRS = st.lists(st.tuples(_SYM, _SYM), min_size=0, max_size=12)


def _reference(pairs, batch):
    used, out = set(), []
    for left, right in pairs:
        if {left, right, left + right} & used:
            continue
        used |= {left, right, left + right}
        out.append((left, right))
        if len(out) >= batch:
            break
    return out


@settings(max_examples=300, deadline=None)
@given(pairs=_PAIRS, batch=st.integers(min_value=1, max_value=6))
def test_select_disjoint_invariants(pairs, batch):
    keyed = [(f"|{left}|{right}|", i + 1) for i, (left, right) in enumerate(pairs)]
    picked = _select_disjoint(keyed, batch)

    assert len(picked) <= batch
    # no symbol (left, right, or merged result) participates twice — the
    # invariance that lets one fold apply the whole batch
    used: set[str] = set()
    for left, right, _cnt in picked:
        assert not ({left, right, left + right} & used)
        used |= {left, right, left + right}
    # greedy: equals the reference selection over the same order
    assert [(left, right) for left, right, _ in picked] == _reference(pairs, batch)
    # the first pair in the list is always admissible, so non-empty input
    # with batch >= 1 always picks it
    if pairs:
        assert picked and (picked[0][0], picked[0][1]) == pairs[0]
