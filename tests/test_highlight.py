"""Print syntax highlighting (core/highlight.py — the reduced syntect
twin of main.rs:133-175) + the session-path REPL forms it unlocked
(bare `w`, bare `m<`, extension-keyed highlighting)."""

from __future__ import annotations

import io
import re

from esvc_spark.cli import Repl
from esvc_spark.core.highlight import Highlighter

_ANSI = re.compile(r"\x1b\[[0-9;]*m")


def _strip(s: str) -> str:
    return _ANSI.sub("", s)


def test_for_path_final_extension_rule():
    assert Highlighter.for_path("notes.py") is not None
    assert Highlighter.for_path("lib.rs") is not None
    assert Highlighter.for_path("q.sql") is not None
    assert Highlighter.for_path("cfg.json") is not None
    # the reference keys on path.extension() — the FINAL suffix — so a
    # graph file notes.py.zst gets no syntax, same as syntect
    assert Highlighter.for_path("notes.py.zst") is None
    assert Highlighter.for_path("README.txt") is None
    assert Highlighter.for_path(None) is None


def test_highlight_is_lossless_and_colors_token_classes():
    h = Highlighter("python")
    line = 'def f(x):  # add\n    return x + 42 or "s"'.split("\n")[0]
    painted = h.highlight_line(line)
    assert _strip(painted) == line  # colors only, text byte-identical
    kw = "\x1b[38;2;168;155;185m"  # mocha keyword
    cm = "\x1b[38;2;126;112;90m"  # mocha comment
    assert kw + "def" in painted
    assert cm + "# add" in painted


def test_cross_line_state_stays_in_sync():
    """The 'kept in sync' contract (main.rs:146): a triple-quote opened
    on one line paints the NEXT line as string, and the close returns
    to code."""
    h = Highlighter("python")
    st = "\x1b[38;2;190;181;91m"  # mocha string
    kw = "\x1b[38;2;168;155;185m"
    h.highlight_line('x = """start')
    mid = h.highlight_line("still a doc")
    assert mid == st + "still a doc"
    h.highlight_line('end"""')
    after = h.highlight_line("return 1")
    assert after.startswith(kw + "return")


def test_rust_block_comment_and_sql_casefold():
    h = Highlighter("rust")
    cm = "\x1b[38;2;126;112;90m"
    h.highlight_line("let a = 1; /* open")
    assert h.highlight_line("inner") == cm + "inner"
    h.highlight_line("done */ fn f() {}")
    assert "\x1b[38;2;168;155;185mfn" in h.highlight_line("fn g() {}")
    s = Highlighter("sql")
    painted = s.highlight_line("SeLeCt x FROM t -- c")
    assert "\x1b[38;2;168;155;185mSeLeCt" in painted  # case-insensitive kw


def test_theme_env_override(monkeypatch):
    monkeypatch.setenv("EXVC_DEFAULT_THEME", "base16-ocean.dark")
    h = Highlighter("python")
    assert "\x1b[38;2;180;142;173mdef" in h.highlight_line("def f():")
    monkeypatch.setenv("EXVC_DEFAULT_THEME", "no-such-theme")
    h2 = Highlighter("python")  # unknown name -> reference default
    assert "\x1b[38;2;168;155;185mdef" in h2.highlight_line("def f():")


def _print_all(repl) -> str:
    out = io.StringIO()
    assert repl.handle_line("0,", out, lambda: [])
    return out.getvalue()


def test_repl_print_highlights_by_session_path():
    repl = Repl(path="scratch.py")
    out = io.StringIO()
    assert repl.handle_line("$a", out, lambda: ["def f():", "    return 1"])
    got = _print_all(repl)
    assert "\x1b[38;5;240m" in got  # grey Fixed(240) line numbers
    assert "\x1b[38;2;168;155;185mdef" in got
    assert got.count("\x1b[0m\n") == 2  # per-line reset (main.rs:151)
    # text survives colorization byte-identical, numbering unchanged
    assert _strip(got) == "     1  def f():\n     2      return 1\n"


def test_repl_print_plain_without_path_is_unchanged():
    repl = Repl()
    out = io.StringIO()
    assert repl.handle_line("$a", out, lambda: ["def f():"])
    got = _print_all(repl)
    assert "\x1b[" not in got
    assert got == "     1  def f():\n"


def test_highlight_state_advances_through_unselected_lines():
    """Print a range BELOW a triple-quote opener: the unselected opener
    still advanced the highlighter, so the selected line paints as
    string — selected-only feeding would mispaint it as code."""
    repl = Repl(path="s.py")
    out = io.StringIO()
    assert repl.handle_line(
        "$a", out, lambda: ['x = """top', "return inside", 'end"""']
    )
    sel = io.StringIO()
    assert repl.handle_line("1,2", sel, lambda: [])
    got = sel.getvalue()
    assert "\x1b[38;2;190;181;91mreturn inside" in got  # string, not kw
    assert "\x1b[38;2;168;155;185m" not in got


def test_bare_w_writes_session_path_and_roundtrips(tmp_path):
    """≙ main.rs:44-52: bare `w` serializes to the session path; a new
    session started on that path sees the saved head."""
    path = str(tmp_path / "sess.py")  # any extension — ref writes
    repl = Repl(path=path)  # bincode+zstd regardless
    out = io.StringIO()
    assert repl.handle_line("$a", out, lambda: ["hello"])
    assert repl.handle_line("w", out, lambda: [])
    assert out.getvalue() == ""
    again = Repl(path=path)
    again.merge_from(path)
    assert len(again.heads) == 1
    assert again.materialize() == ("hello",)


def test_bare_w_without_path_reports():
    repl = Repl()
    out = io.StringIO()
    assert repl.handle_line("w", out, lambda: [])
    assert out.getvalue() == (
        "?w: no file path is associated with this session\n"
    )


def test_bare_m_reads_path_from_next_line(tmp_path):
    """≙ main.rs:54-58: bare `m<` takes the path from the next input
    line."""
    path = str(tmp_path / "other.exvc.zst")
    a = Repl()
    out = io.StringIO()
    assert a.handle_line("$a", out, lambda: ["merged-in"])
    assert a.handle_line(f"w {path}", out, lambda: [])
    b = Repl()
    assert b.handle_line(
        "m<", out, lambda: [], read_line=lambda: path
    )
    assert b.materialize() == ("merged-in",)
    # and without a line source it reports instead of crashing
    err = io.StringIO()
    assert Repl().handle_line("m<", err, lambda: [])
    assert err.getvalue().startswith("?m<:")
