"""Event-log core tests: ports of the reference's unit/regression tests
(SURVEY.md §5, FIXTURES.md §B) against the in-memory engines."""

from __future__ import annotations

import pytest

from esvc_spark.core import (
    DependencyCircuit,
    Event,
    Graph,
    IncludeSpec,
    WorkCache,
    calculate_hash,
    format_hash,
    parse_hash,
)
from esvc_spark.core.engines import ExEngine, SearEngine, sear
from esvc_spark.core.exparse import (
    AddressParseError,
    make_command,
    parse_address,
    parse_command,
)

ALL = IncludeSpec.INCLUDE_ALL

# ---------------------------------------------------------------- hashing
# Known-answer vector ≙ hash.rs:109-127 (pins blake2b-512 compatibility)

GUTEN_TAG = (
    "blake2b512:z3L37mvoETflutamuNBg_EMgHMtxwm8YlZ2Jf7d2eZwOICKEivONmVdMbZH3bWzmDdIF"
    "JjhMEilg6XrrN0Jrlg"
)


def test_hash_known_answer():
    h = calculate_hash(b"Guten Tag!")
    assert format_hash(h) == GUTEN_TAG
    assert parse_hash(GUTEN_TAG) == h


def test_hash_parse_errors():
    with pytest.raises(ValueError):
        parse_hash("hello:1234")
    with pytest.raises(ValueError):
        parse_hash("blake2b512:.")


def test_hash_roundtrip():
    h = calculate_hash(b"anything")
    assert parse_hash(format_hash(h)) == h


# ---------------------------------------------------------------- graph


def _shelve_chain(engine, start, args_list):
    """Shelve a sequence of events, returning (graph, workcache, head-set)."""
    g = Graph()
    w = WorkCache(engine, start)
    xs: set[bytes] = set()
    for arg in args_list:
        h = w.shelve_event(g, set(xs), Event(cmd=0, arg=arg))
        if h is not None:
            xs.add(h)
    return g, w, xs


def assert_no_reorder(start: str, sears: list[dict]):
    """≙ workcache.rs:513-545: shelve → minimize → replay must equal the
    sequential fold oracle."""
    expected = start
    for s in sears:
        expected = expected.replace(s["search"], s["replacement"])
    g, w, xs = _shelve_chain(SearEngine(), start, sears)
    minx = set(g.fold_state({h: False for h in xs}, expand=False).keys())
    got, tt = w.run_foreach_recursively(g, {h: ALL for h in minx})
    assert tt == frozenset(xs)
    assert got == expected


def test_equal_but_non_idempotent():
    assert_no_reorder("x", [sear("x", "xx"), sear("x", "xx"), sear("x", "y")])


def test_indirect_dep():
    assert_no_reorder(
        "Hi, what's up??",
        [
            sear("Hi", "Hello UwU"),
            sear("UwU", "World"),
            sear("what", "wow"),
            sear("s up", "sup"),
            sear("??", "!"),
            sear("sup!", "soap?"),
            sear("p", "np"),
        ],
    )


def test_revert_then():
    assert_no_reorder("a", [sear("a", "xaa"), sear("xa", ""), sear("a", "bbbbb")])


def test_diverg_mult_steps():
    assert_no_reorder(
        "XXXXX",
        [sear("X", "XXXX"), sear("X", "X" * 46), sear("X" * 10, "X" * 14)],
    )


def test_diverg_mult_steps2():
    assert_no_reorder(
        "\0" * 5,
        [sear("\0", "\0" * 4), sear("\0", "\0" * 46), sear("\0" * 10, "\0" * 14)],
    )


def assert_simple_merge(start, dest, common, tomerge):
    """≙ workcache.rs:644-690: shelve common prefix, branch each tomerge
    event off the common state, try_merge, replay must equal dest."""
    e = SearEngine()
    g = Graph()
    w = WorkCache(e, start)
    xs: set[bytes] = set()
    for arg in common:
        h = w.shelve_event(g, set(xs), Event(cmd=0, arg=arg))
        assert h is not None
        xs.add(h)
    oldxs = set(xs)
    for arg in tomerge:
        h = w.shelve_event(g, set(oldxs), Event(cmd=0, arg=arg))
        assert h is not None
        xs.add(h)
    w.try_merge(g, set(xs))
    got, _ = w.run_foreach_recursively(g, {h: ALL for h in xs})
    assert got == dest


def test_basic_merge():
    assert_simple_merge(
        "A|B|C",
        "E|D|F",
        [sear("B", "D")],
        [sear("A|D", "E|D"), sear("D|C", "D|F")],
    )


def test_merge2():
    prog_typo = 'fn main() {\n    println!("Hewwo!");\n    println!("Hello Wrold!");\n}'
    prog_dest = 'fn main() {\n    println!("Hewwo UwU!");\n    println!("Hello World!");\n}'
    assert_simple_merge(
        "XXXX",
        prog_dest,
        [sear("XXXX", prog_typo)],
        [sear("o!", "o UwU!"), sear("Wrold", "World")],
    )


def test_merge_after_clear():
    g, w, xs = _shelve_chain(SearEngine(), "X", [sear("X", "XXX"), sear("X", "")])
    assert len(xs) == 2
    w.try_merge(g, set(xs))
    got, _ = w.run_foreach_recursively(g, {h: ALL for h in xs})
    assert got == ""


def test_merge_after_clear2():
    g, w, xs = _shelve_chain(
        SearEngine(), "\0", [sear("\0", "\0" * 74), sear("\0", "")]
    )
    assert len(xs) == 2
    w.try_merge(g, set(xs))
    got, _ = w.run_foreach_recursively(g, {h: ALL for h in xs})
    assert got == ""


# --------------------------------------------------- example-sear pipeline
# ≙ crates/example-sear/src/main.rs:31-58: golden end-to-end chain.


def test_example_pipeline_golden():
    start = "Hi, what's up??"
    events = [
        sear("Hi", "Hello UwU"),
        sear("UwU", "World"),
        sear("what", "wow"),
        sear("s up", "sup"),
        sear("??", "!"),
        sear("sup!", "soap?"),
        sear("p", "np"),
    ]
    expected = start
    for s in events:
        expected = expected.replace(s["search"], s["replacement"])
    g, w, xs = _shelve_chain(SearEngine(), start, events)
    got, tt = w.run_foreach_recursively(g, {h: ALL for h in xs})
    assert got == expected
    assert tt == frozenset(xs)


# ---------------------------------------------------------------- graph ops


def test_ensure_event_idempotent():
    g = Graph()
    ev = Event(cmd=0, arg=sear("a", "b"))
    coll, h1 = g.ensure_event(ev)
    assert coll is None
    coll2, h2 = g.ensure_event(Event(cmd=0, arg=sear("a", "b")))
    assert coll2 is None and h1 == h2 and len(g.events) == 1


def test_dependency_cycle_detected():
    g = Graph()
    ev_a = Event(cmd=0, arg=sear("a", "b"))
    _, ha = g.ensure_event(ev_a)
    # manufacture a cycle: b depends on a, then overwrite a to depend on b
    ev_b = Event(cmd=0, arg=sear("b", "c"), deps={ha: True})
    _, hb = g.ensure_event(ev_b)
    g.events[ha] = Event(cmd=0, arg=sear("a", "b"), deps={hb: True})
    with pytest.raises(DependencyCircuit):
        g.calculate_dependencies(set(), {ha: ALL})


def test_intermediate_dependency_cycle_detected():
    # Cycle among INTERMEDIATE deps, not through the main event: the
    # reference has a TODO here (graph.rs:103-106 only checks main), but a
    # cyclic graph ingested from foreign parquet must raise, not hang.
    g = Graph()
    _, hb = g.ensure_event(Event(cmd=0, arg=sear("b", "c")))
    _, hc = g.ensure_event(Event(cmd=0, arg=sear("c", "d"), deps={hb: True}))
    # overwrite b to depend on c -> b <-> c cycle below main event a
    g.events[hb] = Event(cmd=0, arg=sear("b", "c"), deps={hc: True})
    _, ha = g.ensure_event(Event(cmd=0, arg=sear("a", "b"), deps={hb: True}))
    with pytest.raises(DependencyCircuit):
        g.calculate_dependencies(set(), {ha: ALL})


def test_fold_state_expand_and_minimize():
    e = SearEngine()
    g = Graph()
    w = WorkCache(e, "abc")
    h1 = w.shelve_event(g, set(), Event(cmd=0, arg=sear("a", "x")))
    h2 = w.shelve_event(g, {h1}, Event(cmd=0, arg=sear("x", "y")))  # depends on h1
    full = g.fold_state({h2: False}, expand=True)
    assert set(full) == {h1, h2}
    minimized = g.fold_state({h1: False, h2: False}, expand=False)
    assert set(minimized) == {h2}


# ---------------------------------------------------------------- ex engine


def ex_apply(lines: list[str], addr_s: str, cmd: str, body=None) -> list[str]:
    addr, rest = parse_address(addr_s)
    assert rest == ""
    arg = make_command(addr, cmd, body)
    eng = ExEngine()
    return list(eng.run_event_bare(0, arg, tuple(lines)))


def test_addr_grammar():
    # ≙ addr.rs:103-119
    assert parse_address("0") == ({"type": "rng", "start": 0, "end": 1}, "")
    assert parse_address("0,") == ({"type": "rngf", "start": 0}, "")
    assert parse_address("1") == ({"type": "rng", "start": 1, "end": 2}, "")
    assert parse_address("$") == ({"type": "last"}, "")
    assert parse_address("$1") == ({"type": "last"}, "1")
    assert parse_address("/hewwo?/") == ({"type": "rgx", "pattern": "hewwo?"}, "")
    assert parse_address("/hewwo?/i") == ({"type": "rgx", "pattern": "hewwo?"}, "i")
    assert parse_address("/a'/b/") == ({"type": "rgx", "pattern": "a/b"}, "")
    assert parse_address("/a'nb/") == ({"type": "rgx", "pattern": "a\nb"}, "")
    with pytest.raises(AddressParseError):
        parse_address("5,2")
    with pytest.raises(AddressParseError):
        parse_address("x")


def test_parse_command_forms():
    assert parse_command("$a")[0] == {"addr": {"type": "last"}, "cmd": "append"}
    assert parse_command("0,")[0] == {"addr": {"type": "rngf", "start": 0}, "cmd": "print"}
    assert parse_command("/foo/s")[0] == {
        "addr": {"type": "rgx", "pattern": "foo"},
        "cmd": "substitute",
    }


def test_ex_editor_script():
    """Representative end-to-end script (FIXTURES.md §B.6) vs. hand oracle."""
    lines: list[str] = []
    # start empty → $a append
    lines = ex_apply(lines, "$", "append", ["foo one", "bar", "foo two", "baz"])
    assert lines == ["foo one", "bar", "foo two", "baz"]
    # /foo/s substitute on matching lines
    lines = ex_apply(lines, "/foo/", "substitute", ["foo", "FOO"])
    assert lines == ["FOO one", "bar", "FOO two", "baz"]
    # 1,3d delete range [1,3)
    lines = ex_apply(lines, "1,3", "delete")
    assert lines == ["FOO one", "baz"]
    # 0,i insert at top — note: RngF(0) selects the whole tail, insert
    # prepends before it
    lines = ex_apply(lines, "0,", "insert", ["head"])
    assert lines == ["head", "FOO one", "baz"]
    # 2c change line 2
    lines = ex_apply(lines, "2", "change", ["tail"])
    assert lines == ["head", "FOO one", "tail"]


def test_ex_empty_data_special_cases():
    # ≙ en.rs:107-114: on empty data only `0,` and `$` select an insertion
    # point
    assert ex_apply([], "$", "append", ["a"]) == ["a"]
    assert ex_apply([], "0,", "append", ["a"]) == ["a"]
    assert ex_apply([], "1", "append", ["a"]) == []
    assert ex_apply([], "/x/", "append", ["a"]) == []


def test_ex_rng_edge_cases():
    # start >= len → nothing selected
    assert ex_apply(["a", "b"], "5,7", "delete") == ["a", "b"]
    # end beyond len → select to end
    assert ex_apply(["a", "b", "c"], "1,9", "delete") == ["a"]
    # rngf at exactly len → empty insertion point at end
    assert ex_apply(["a"], "1,", "append", ["z"]) == ["a", "z"]
    # last
    assert ex_apply(["a", "b"], "$", "change", ["Z"]) == ["a", "Z"]
    # rgx append: appends after EACH matching line
    assert ex_apply(["x1", "y", "x2"], "/x/", "append", ["+"]) == [
        "x1",
        "+",
        "y",
        "x2",
        "+",
    ]


def test_ex_shelve_with_workcache():
    """The editor engine driven through the event log: two independent
    line edits commute; a dependent edit is ordered."""
    eng = ExEngine()
    g = Graph()
    w = WorkCache(eng, ("alpha", "beta", "gamma"))
    a1 = make_command({"type": "rgx", "pattern": "alpha"}, "substitute", ["alpha", "ALPHA"])
    a2 = make_command({"type": "rgx", "pattern": "beta"}, "substitute", ["beta", "BETA"])
    a3 = make_command({"type": "rgx", "pattern": "ALPHA"}, "substitute", ["ALPHA", "A+"])
    xs: set[bytes] = set()
    for arg in (a1, a2, a3):
        h = w.shelve_event(g, set(xs), Event(cmd=0, arg=arg))
        assert h is not None
        xs.add(h)
    got, _ = w.run_foreach_recursively(g, {h: ALL for h in xs})
    assert got == ("A+", "BETA", "gamma")
    # a1 and a2 are independent (commute); a3 depends on a1
    deps_of = {h: g.events[h].deps for h in xs}
    n_roots = sum(1 for d in deps_of.values() if not d)
    assert n_roots == 2
