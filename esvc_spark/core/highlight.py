"""Line-stateful ANSI syntax highlighting for the REPL's Print
(≙ crates/exvc/src/main.rs:133-175, which runs syntect's Sublime-Text
grammars under a base16 theme).

Honest reduced twin — syntect interprets full `.sublime-syntax`
grammars (not portable to this dependency-free container); this is a
regex token classifier (comments / strings / numbers / keywords /
identifiers) for a small set of extensions. The OBSERVABLE contract
matches the reference path:

- the syntax is chosen by the SESSION file's final extension
  (main.rs:134-138 ``find_syntax_by_extension``); an unrecognized
  extension falls back to the plain un-highlighted print, exactly like
  syntect returning no syntax;
- highlight state advances over EVERY line, selected or not — "the
  highlighting needs to be kept in sync" (main.rs:146) — the
  cross-line state here is Python triple-quoted strings and
  Rust/SQL/C block comments;
- output is 24-bit terminal escapes with a trailing reset per line
  (main.rs:148-155 ``as_24_bit_terminal_escaped``), line numbers in
  the 256-color grey 240 (``Colour::Fixed(240)``);
- the theme comes from ``EXVC_DEFAULT_THEME`` with the reference's
  ``base16-mocha.dark`` default (main.rs:141-143; read at runtime
  here, compile-time ``option_env!`` there — same spelling). Unknown
  theme names fall back to the default, mirroring syntect's themeset
  lookup never failing on the shipped names.
"""

from __future__ import annotations

import os
import re

# base16 palettes (public base16 scheme definitions), mapped by token
# class. Values are (r, g, b).
_THEMES: dict[str, dict[str, tuple[int, int, int]]] = {
    "base16-mocha.dark": {
        "comment": (0x7E, 0x70, 0x5A),
        "string": (0xBE, 0xB5, 0x5B),
        "number": (0xD2, 0x8B, 0x71),
        "keyword": (0xA8, 0x9B, 0xB9),
        "text": (0xD0, 0xC8, 0xC6),
    },
    "base16-ocean.dark": {
        "comment": (0x65, 0x73, 0x7E),
        "string": (0xA3, 0xBE, 0x8C),
        "number": (0xD0, 0x87, 0x70),
        "keyword": (0xB4, 0x8E, 0xAD),
        "text": (0xC0, 0xC5, 0xCE),
    },
}
_DEFAULT_THEME = "base16-mocha.dark"

_NUM = r"\b\d+(?:\.\d+)?(?:[eE][+-]?\d+)?\b|\b0[xXbBoO][0-9a-fA-F_]+\b"

# Per-language: line-comment regex, (block_open, block_close, class)
# multi-line constructs, string regexes, keyword set. Keyword lists are
# the core reserved words — enough to make the cosmetic point; this is
# presentation-only by SURVEY's call (§2 Print row).
_LANGS: dict[str, dict] = {
    "python": {
        "line_comment": r"#.*",
        "blocks": [('"""', '"""', "string"), ("'''", "'''", "string")],
        "strings": [r"[rbfu]{0,2}\"(?:[^\"\\]|\\.)*\"", r"[rbfu]{0,2}'(?:[^'\\]|\\.)*'"],
        "keywords": {
            "False", "None", "True", "and", "as", "assert", "async",
            "await", "break", "class", "continue", "def", "del", "elif",
            "else", "except", "finally", "for", "from", "global", "if",
            "import", "in", "is", "lambda", "nonlocal", "not", "or",
            "pass", "raise", "return", "try", "while", "with", "yield",
        },
    },
    "rust": {
        "line_comment": r"//.*",
        "blocks": [("/*", "*/", "comment")],
        "strings": [r"b?\"(?:[^\"\\]|\\.)*\"", r"'(?:[^'\\]|\\.)'"],
        "keywords": {
            "as", "async", "await", "break", "const", "continue",
            "crate", "dyn", "else", "enum", "extern", "false", "fn",
            "for", "if", "impl", "in", "let", "loop", "match", "mod",
            "move", "mut", "pub", "ref", "return", "self", "Self",
            "static", "struct", "super", "trait", "true", "type",
            "unsafe", "use", "where", "while",
        },
    },
    "sql": {
        "line_comment": r"--.*",
        "blocks": [("/*", "*/", "comment")],
        "strings": [r"'(?:[^']|'')*'", r"\"(?:[^\"]|\"\")*\""],
        "keywords": {
            "select", "from", "where", "group", "by", "order", "having",
            "join", "left", "right", "full", "inner", "outer", "on",
            "union", "all", "distinct", "as", "with", "insert", "into",
            "values", "update", "set", "delete", "create", "table",
            "and", "or", "not", "null", "is", "in", "like", "between",
            "case", "when", "then", "else", "end", "limit", "offset",
        },
        "casefold_keywords": True,
    },
    "json": {
        "line_comment": None,
        "blocks": [],
        "strings": [r"\"(?:[^\"\\]|\\.)*\""],
        "keywords": {"true", "false", "null"},
    },
}

_EXT_TO_LANG = {
    "py": "python",
    "pyi": "python",
    "rs": "rust",
    "sql": "sql",
    "json": "json",
}


def _esc(rgb: tuple[int, int, int]) -> str:
    return f"\x1b[38;2;{rgb[0]};{rgb[1]};{rgb[2]}m"


class Highlighter:
    """Stateful per-session highlighter: call :meth:`highlight_line` on
    every materialized line IN ORDER (selected or not) so multi-line
    constructs stay in sync, print only the selected ones."""

    def __init__(self, lang: str, theme: str | None = None):
        spec = _LANGS[lang]
        theme = theme or os.environ.get("EXVC_DEFAULT_THEME", _DEFAULT_THEME)
        self._palette = _THEMES.get(theme, _THEMES[_DEFAULT_THEME])
        self._blocks = spec["blocks"]
        self._keywords = spec["keywords"]
        self._casefold = spec.get("casefold_keywords", False)
        # block-opens are the FIRST alternative: at the same start
        # position the regex engine prefers earlier alternatives, so a
        # mid-line `"""` beats the inline empty-string match `""`
        alts = []
        if self._blocks:
            alts.append(
                "(?P<blockopen>"
                + "|".join(re.escape(o) for o, _, _ in self._blocks)
                + ")"
            )
        if spec["line_comment"]:
            alts.append(f"(?P<comment>{spec['line_comment']})")
        if spec["strings"]:
            alts.append("(?P<string>" + "|".join(spec["strings"]) + ")")
        alts.append(f"(?P<number>{_NUM})")
        alts.append(r"(?P<word>[A-Za-z_][A-Za-z0-9_]*)")
        self._token = re.compile("|".join(alts))
        self._block_open = {o: (c, cls) for o, c, cls in self._blocks}
        # (close_delim, class) while inside a block, else None
        self._in_block: tuple[str, str] | None = None

    @staticmethod
    def for_path(path: str | None) -> "Highlighter | None":
        """Syntax by final extension, the reference's
        ``path.extension()`` rule — ``notes.py.zst`` has extension
        ``zst`` and gets NO highlighting, same as syntect."""
        if not path:
            return None
        ext = os.path.splitext(str(path))[1].lstrip(".").lower()
        lang = _EXT_TO_LANG.get(ext)
        return Highlighter(lang) if lang else None

    def _paint(self, cls: str, text: str) -> str:
        if not text:
            return ""
        return _esc(self._palette.get(cls, self._palette["text"])) + text

    def highlight_line(self, line: str) -> str:
        out: list[str] = []
        i = 0
        n = len(line)
        while i < n:
            if self._in_block is not None:
                close, cls = self._in_block
                end = line.find(close, i)
                if end < 0:
                    out.append(self._paint(cls, line[i:]))
                    i = n
                    break
                out.append(self._paint(cls, line[i : end + len(close)]))
                i = end + len(close)
                self._in_block = None
                continue
            m = self._token.search(line, i)
            if m is None:
                out.append(self._paint("text", line[i:]))
                break
            if m.start() > i:
                out.append(self._paint("text", line[i : m.start()]))
            kind = m.lastgroup
            tok = m.group(0)
            if kind == "blockopen":
                close, cls = self._block_open[tok]
                end = line.find(close, m.end())
                if end < 0:
                    self._in_block = (close, cls)
                    out.append(self._paint(cls, line[m.start() :]))
                    i = n
                    break
                out.append(self._paint(cls, line[m.start() : end + len(close)]))
                i = end + len(close)
                continue
            if kind == "word":
                word = tok.lower() if self._casefold else tok
                kind = "keyword" if word in self._keywords else "text"
            out.append(self._paint(kind, tok))
            i = m.end()
        return "".join(out)
