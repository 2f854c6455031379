"""Parsers for the ed/ex-style command language (driver-side, pure Python).

Grammar parity with crates/exvc/src/addr.rs:47-97 and en.rs:84-103:
  address := '$'                     -> last line
           | '/' regex '/'           -> per-line regex match; '-escapes:
                                        '' -> ', '/ -> /, 'n -> \n, 't -> \t
           | N                       -> line N (range N..N+1)
           | N ',' M                 -> half-open range N..M, requires N<M
           | N ','                   -> N..end
  command := address [a|c|d|i|s]     (empty command char -> Print)
"""

from __future__ import annotations


class AddressParseError(ValueError):
    pass


def parse_lnum(s: str) -> tuple[int, str] | None:
    i = 0
    while i < len(s) and s[i].isdigit():
        i += 1
    if i == 0:
        return None
    return int(s[:i]), s[i:]


def parse_address(s: str) -> tuple[dict, str]:
    """Returns (address, rest-of-string) — address as the canonical dict
    used by the engines (see engines.resolve_addr)."""
    if s.startswith("$"):
        return {"type": "last"}, s[1:]
    if s.startswith("/"):
        pat: list[str] = []
        escaped = False
        i = 1
        closed = False
        while i < len(s):
            ch = s[i]
            i += 1
            if escaped:
                pat.append({"'": "'", "/": "/", "n": "\n", "t": "\t"}.get(ch, ch))
                escaped = False
            elif ch == "'":
                escaped = True
            elif ch == "/":
                closed = True
                break
            else:
                pat.append(ch)
        if escaped:
            raise AddressParseError("regex: escaped EOL")
        if not closed:
            # reference consumes to EOL; remaining is empty
            pass
        return {"type": "rgx", "pattern": "".join(pat)}, s[i:]
    lnum = parse_lnum(s)
    if lnum is None:
        raise AddressParseError(f"addr: unable to parse address at {s!r}")
    start, rest = lnum
    if rest.startswith(","):
        rest = rest[1:]
        lnum2 = parse_lnum(rest)
        if lnum2 is not None:
            end, rest2 = lnum2
            if start >= end:
                raise AddressParseError(f"addr: unable to parse range {start},{end}")
            return {"type": "rng", "start": start, "end": end}, rest2
        return {"type": "rngf", "start": start}, rest
    return {"type": "rng", "start": start, "end": start + 1}, rest


_CMD_CHARS = {"a": "append", "c": "change", "d": "delete", "i": "insert", "s": "substitute"}


def parse_command(s: str) -> tuple[dict, str]:
    """Parse `address [acdis]`; empty command char means Print
    (≙ en.rs:84-103). Returns ({"addr":..., "cmd": name}, rest). The
    command body (lines / pat+repl) is supplied separately by the caller,
    as in the reference REPL (main.rs:183-210)."""
    addr, rest = parse_address(s)
    if not rest:
        return {"addr": addr, "cmd": "print"}, ""
    ch = rest[0]
    if ch not in _CMD_CHARS:
        raise AddressParseError(f"unknown command {ch!r}")
    return {"addr": addr, "cmd": _CMD_CHARS[ch]}, rest[1:]


def make_command(addr: dict, cmd: str, body: list[str] | None = None) -> dict:
    """Build the serializable event argument (the stored AST,
    ≙ en.rs:46-60)."""
    if cmd in ("append", "change", "insert"):
        return {"addr": addr, "kind": {"kind": cmd, "lines": list(body or [])}}
    if cmd == "delete":
        return {"addr": addr, "kind": {"kind": "delete"}}
    if cmd == "substitute":
        if not body or len(body) != 2:
            raise ValueError("substitute expects [pat, repl]")
        return {"addr": addr, "kind": {"kind": "substitute", "pat": body[0], "repl": body[1]}}
    raise ValueError(f"unknown command {cmd!r}")
