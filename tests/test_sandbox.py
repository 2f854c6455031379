"""SandboxEngine (core/sandbox.py): WasmEngine parity — untrusted
command modules run with a FRESH instance per call, resource-limited,
over the byte-buffer ABI (ref crates/esvc-wasm/src/lib.rs:11-108).

The headline test drives the ported golden 7-event pipeline
(≙ crates/example-sear/src/main.rs:31-58, same chain as
tests/test_core.py::test_example_pipeline_golden) entirely through the
sandbox: dependency inference replays commands via subprocesses and the
final document must equal the sequential fold oracle."""

from __future__ import annotations

import pytest

from esvc_spark.core.engines import CommandNotFound, sear
from esvc_spark.core.graph import Event, Graph, IncludeSpec
from esvc_spark.core.sandbox import SandboxEngine, SandboxError
from esvc_spark.core.workcache import WorkCache

ALL = IncludeSpec.INCLUDE_ALL

# The sear command as an untrusted module: same semantics as the
# reference's example-sear wasm module (literal replace over bytes,
# arg delivered as canonical-JSON bytes).
SEAR_SRC = """
import json
def transform(arg, dat):
    a = json.loads(arg.decode("utf-8"))
    return dat.replace(a["search"].encode("utf-8"),
                       a["replacement"].encode("utf-8"))
"""


def _engine(**kw) -> SandboxEngine:
    e = SandboxEngine(**kw)
    first, n = e.add_commands([SEAR_SRC])
    assert (first, n) == (0, 1)
    return e


def _shelve_chain(engine, start, args_list):
    g = Graph()
    w = WorkCache(engine, start)
    xs: set[bytes] = set()
    for arg in args_list:
        h = w.shelve_event(g, set(xs), Event(cmd=0, arg=arg))
        if h is not None:
            xs.add(h)
    return g, w, xs


def test_example_pipeline_golden_through_sandbox():
    start = b"Hi, what's up??"
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
        expected = expected.replace(
            s["search"].encode(), s["replacement"].encode()
        )
    g, w, xs = _shelve_chain(_engine(), start, events)
    got, tt = w.run_foreach_recursively(g, {h: ALL for h in xs})
    assert got == expected
    assert tt == frozenset(xs)


def test_sandbox_matches_in_process_engine_hashes():
    """Same commands, same dependency DAG: the sandboxed replay must
    infer byte-identical event hashes to the in-process SearEngine on a
    bytes-equivalent document (identity is content-addressed, so this
    pins the whole inference path, not just the final text)."""
    from esvc_spark.core.engines import SearEngine

    chain = [sear("x", "xx"), sear("x", "y"), sear("yy", "z")]
    g_s, _, xs_s = _shelve_chain(SearEngine(), "x", chain)
    g_b, _, xs_b = _shelve_chain(_engine(), b"x", chain)
    assert xs_s == xs_b
    assert set(g_s.events) == set(g_b.events)


def test_fresh_instance_per_call():
    """State written by one call must be invisible to the next — the
    wasm engine's fresh-Store property (lib.rs:36-37). A stateful
    module returns its counter; if the interpreter survived between
    calls both invocations would disagree."""
    e = SandboxEngine()
    counter_src = """
COUNT = [0]
def transform(arg, dat):
    COUNT[0] += 1
    return dat + str(COUNT[0]).encode()
"""
    cmd = e.register(counter_src)
    assert e.run_event_bare(cmd, b"{}", b"a") == b"a1"
    assert e.run_event_bare(cmd, b"{}", b"a") == b"a1"  # not a2


def test_unknown_command_raises():
    with pytest.raises(CommandNotFound):
        _engine().run_event_bare(99, b"{}", b"x")


def test_registration_validates_without_executing(tmp_path):
    e = SandboxEngine()
    with pytest.raises(SyntaxError):
        e.register("def transform(:")
    marker = tmp_path / "executed"
    # top-level side effects must NOT run at registration time
    e.register(f"open({str(marker)!r}, 'w').close()\n"
               "def transform(arg, dat): return dat")
    assert not marker.exists()


def test_crash_is_contained():
    e = SandboxEngine()
    cmd = e.register("def transform(arg, dat): raise RuntimeError('boom')")
    with pytest.raises(SandboxError, match="boom"):
        e.run_event_bare(cmd, b"{}", b"x")


def test_non_bytes_return_rejected():
    e = SandboxEngine()
    cmd = e.register("def transform(arg, dat): return 'text'")
    with pytest.raises(SandboxError, match="must return bytes"):
        e.run_event_bare(cmd, b"{}", b"x")


def test_missing_transform_rejected():
    e = SandboxEngine()
    cmd = e.register("x = 1")
    with pytest.raises(SandboxError, match="no transform"):
        e.run_event_bare(cmd, b"{}", b"x")


def test_wall_timeout_contained():
    e = SandboxEngine(timeout=2.0)
    cmd = e.register(
        "import time\ndef transform(arg, dat):\n"
        "    time.sleep(60)\n    return dat"
    )
    with pytest.raises(SandboxError, match="wall timeout"):
        e.run_event_bare(cmd, b"{}", b"x")


def test_memory_limit_contained():
    e = SandboxEngine(memory_limit_mb=128)
    cmd = e.register(
        "def transform(arg, dat): return b'x' * (1 << 31)"  # 2 GiB
    )
    with pytest.raises(SandboxError):
        e.run_event_bare(cmd, b"{}", b"x")


def test_binary_safe_payloads():
    """Arbitrary bytes (NULs, invalid UTF-8) travel unmangled through
    the frame protocol in both directions."""
    e = SandboxEngine()
    cmd = e.register("def transform(arg, dat): return arg + b'|' + dat")
    arg = bytes(range(256))
    dat = b"\x00\xff\xfe" * 100
    assert e.run_event_bare(cmd, arg, dat) == arg + b"|" + dat
