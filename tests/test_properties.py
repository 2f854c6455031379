"""Property-based tests: port of the reference fuzz target
(crates/example-sear/fuzz/fuzz_targets/sear0.rs:65-135, FIXTURES.md §B.5).

Property 1: shelve → minimize → replay ≡ sequential left-fold of literal
            replaces.
Property 2: try_merge over the resulting head set never errors, and the
            merged replay still equals the sequential result.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from esvc_spark.core import Event, Graph, IncludeSpec, WorkCache
from esvc_spark.core.engines import SearEngine, sear

ALL = IncludeSpec.INCLUDE_ALL

# Small alphabet maximizes overlap between searches (the interesting cases);
# reference fuzzing is unbounded, bounded here for CI (FIXTURES.md §B.5).
_text = st.text(alphabet="abX|", max_size=8)
_netext = st.text(alphabet="abX|", min_size=1, max_size=4)
_sears = st.lists(
    st.builds(sear, search=_netext, replacement=_text), min_size=1, max_size=6
)


def _sequential(start: str, sears: list[dict]) -> str:
    out = start
    for s in sears:
        out = out.replace(s["search"], s["replacement"])
    return out


@settings(max_examples=120, deadline=None)
@given(start=st.text(alphabet="abX|", min_size=1, max_size=8), sears=_sears)
def test_shelve_replay_equals_sequential(start, sears):
    g = Graph()
    w = WorkCache(SearEngine(), start)
    xs: set[bytes] = set()
    for arg in sears:
        h = w.shelve_event(g, set(xs), Event(cmd=0, arg=arg))
        if h is not None:
            xs.add(h)
    minx = set(g.fold_state({h: False for h in xs}, expand=False).keys())
    got, tt = w.run_foreach_recursively(g, {h: ALL for h in minx})
    assert tt == frozenset(xs)
    assert got == _sequential(start, sears)


@settings(max_examples=60, deadline=None)
@given(start=st.text(alphabet="abX|", min_size=1, max_size=8), sears=_sears)
def test_merge_never_errors(start, sears):
    g = Graph()
    w = WorkCache(SearEngine(), start)
    xs: set[bytes] = set()
    for arg in sears:
        h = w.shelve_event(g, set(xs), Event(cmd=0, arg=arg))
        if h is not None:
            xs.add(h)
    # must not raise (sear0.rs:124-135)
    w.try_merge(g, set(xs))
    got, _ = w.run_foreach_recursively(g, {h: ALL for h in xs})
    assert got == _sequential(start, sears)
