"""Graphviz export of the event DAG (≙ crates/esvc-core/src/dot.rs:10-61):
node labels "<short-hash>\\ncmd:arg", edges labeled hard/soft, nstates as
clusters. Pure driver-side formatting."""

from __future__ import annotations

import json

from .graph import Graph
from .hashing import format_hash


def _short(h: bytes) -> str:
    return format_hash(h)[len("blake2b512:"):][:12]


def to_dot(graph: Graph) -> str:
    out = ["digraph esvc {"]
    for h, ev in sorted(graph.events.items()):
        arg = json.dumps(ev.arg, sort_keys=True)
        if len(arg) > 40:
            arg = arg[:37] + "..."
        label = f"{_short(h)}\\n{ev.cmd}:{arg}".replace('"', '\\"')
        out.append(f'  "{_short(h)}" [label="{label}"];')
        for dep, is_hard in sorted(ev.deps.items()):
            style = "solid" if is_hard else "dashed"
            lbl = "hard" if is_hard else "soft"
            out.append(
                f'  "{_short(dep)}" -> "{_short(h)}" [style={style}, label="{lbl}"];'
            )
    for i, (name, heads) in enumerate(sorted(graph.nstates.items())):
        out.append(f"  subgraph cluster_{i} {{")
        out.append(f'    label="state: {name or chr(39) + chr(39)}";')
        for h in sorted(heads):
            out.append(f'    "{_short(h)}";')
        out.append("  }")
    out.append("}")
    return "\n".join(out)
