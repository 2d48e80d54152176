"""Hierarchical netlists: `.SUBCKT name ports... / .ENDS` + `Xinst`
instances (extension — the reference parser is flat-only).

Flattening is a statement-level rewrite that runs before parsing proper,
so every downstream stage (Python or native device parsing, lowering,
analyses) sees an ordinary flat netlist:

- instance element names keep their leading type letter (the device
  dispatch key): `R1` inside `X1` becomes `R1@X1`, nested `R1@X2@X1`;
- internal nodes become `<instancepath>.<node>`: `n` in `X1` -> `X1.n`;
  ports map to the caller's (already flattened) nets; ground names
  (`0`/`gnd`) are always global;
- `.MODEL` cards found inside a definition are hoisted to the top level
  (the model registry is global, matching the two-pass prescan);
- other dot cards inside a definition are ignored with a warning;
- nested instances are supported to MAX_DEPTH; nested *definitions* are
  not (a warning is emitted and the inner definition is still registered
  globally, which matches most SPICE dialects' effective behavior).
"""

from __future__ import annotations

import sys
from typing import Dict, List, Tuple

from .lexer import Statement
from ..utils.numbers import is_ground_name

MAX_DEPTH = 20

# token index ranges [lo, hi) holding node names, keyed by element letter
_NODE_RANGES = {
    "R": (1, 3), "C": (1, 3), "L": (1, 3), "V": (1, 3), "I": (1, 3),
    "M": (1, 4), "D": (1, 3), "Q": (1, 4), "E": (1, 5), "G": (1, 5),
    "F": (1, 3), "H": (1, 3), "S": (1, 5), "W": (1, 3), "J": (1, 4),
    "T": (1, 5),
    # B: only the two terminal tokens are renamed; v()/i() references
    # inside the expression are NOT rewritten (they resolve at lowering,
    # so a reference to a subckt-internal node fails loudly there)
    "B": (1, 3),
}
# token indices referring to another element (renamed like element names)
_ELEM_REFS = {"F": (3,), "H": (3,), "K": (1, 2), "W": (3,)}


def _warn(line_no: int, msg: str) -> None:
    print(f"Line {line_no}: {msg}", file=sys.stderr)


def _rename(st: Statement, mapping: Dict[str, str], prefix: str) -> Statement:
    """Apply instance-context renaming to one body statement."""
    toks = list(st.tokens)
    c0 = toks[0][0].upper()
    toks[0] = f"{toks[0]}@{prefix}"

    def map_node(t: str) -> str:
        if is_ground_name(t):
            return t
        if t in mapping:
            return mapping[t]
        return f"{prefix}.{t}"

    import re as _re
    poly = (c0 in "EGFH" and len(toks) > 3
            and _re.fullmatch(r"poly\((\d+)\)", toks[3].lower()))
    if c0 == "X":
        for j in range(1, len(toks) - 1):
            toks[j] = map_node(toks[j])
    elif poly:
        # POLY(n) controlled source: output nodes, then n node pairs (E/G)
        # or n controlling V-source names (F/H); coefficients untouched
        n = int(poly.group(1))
        toks[1] = map_node(toks[1])
        toks[2] = map_node(toks[2])
        if c0 in "EG":
            for j in range(4, min(4 + 2 * n, len(toks))):
                toks[j] = map_node(toks[j])
        else:
            for j in range(4, min(4 + n, len(toks))):
                toks[j] = f"{toks[j]}@{prefix}"
    else:
        lo, hi = _NODE_RANGES.get(c0, (1, 1))
        for j in range(lo, min(hi, len(toks))):
            toks[j] = map_node(toks[j])
        for j in _ELEM_REFS.get(c0, ()):
            if j < len(toks):
                toks[j] = f"{toks[j]}@{prefix}"
    return Statement(line_no=st.line_no, raw=" ".join(toks), tokens=toks)


def flatten_subcircuits(stmts: List[Statement]) -> List[Statement]:
    """Collect .SUBCKT definitions and expand X instances recursively."""
    defs: Dict[str, Tuple[List[str], List[Statement]]] = {}
    top: List[Statement] = []

    def collect(seq: List[Statement], sink: List[Statement],
                nested: bool) -> None:
        i = 0
        while i < len(seq):
            st = seq[i]
            head = st.tokens[0].lower() if st.tokens else ""
            if head == ".subckt":
                if nested:
                    _warn(st.line_no, "nested .SUBCKT definition; "
                          "registering it globally")
                if len(st.tokens) < 2:
                    _warn(st.line_no, f"invalid .SUBCKT: {st.raw}")
                name = st.tokens[1].lower() if len(st.tokens) > 1 else ""
                body: List[Statement] = []
                depth = 1
                i += 1
                while i < len(seq):
                    h2 = seq[i].tokens[0].lower() if seq[i].tokens else ""
                    if h2 == ".subckt":
                        depth += 1
                    elif h2 == ".ends":
                        depth -= 1
                        if depth == 0:
                            break
                    body.append(seq[i])
                    i += 1
                else:
                    _warn(st.line_no, f".SUBCKT {name} missing .ENDS")
                i += 1  # skip the .ends
                inner: List[Statement] = []
                collect(body, inner, nested=True)
                if name:
                    defs[name] = ([t for t in (st.tokens[2:] if
                                               len(st.tokens) > 2 else [])],
                                  inner)
            elif head == ".ends":
                _warn(st.line_no, ".ENDS without .SUBCKT; ignored")
                i += 1
            elif head == ".model":
                # global model registry: hoist out of definitions
                top.append(st) if nested else sink.append(st)
                i += 1
            else:
                sink.append(st)
                i += 1

    collect(stmts, top, nested=False)
    if not defs and not any(
            st.tokens and st.tokens[0][0].upper() == "X" for st in top):
        return top

    out: List[Statement] = []

    def expand(st: Statement, depth: int) -> None:
        toks = st.tokens
        if not toks or toks[0][0].upper() != "X":
            out.append(st)
            return
        if depth > MAX_DEPTH:
            _warn(st.line_no, "subcircuit nesting too deep (cycle?); "
                  f"dropping {toks[0]}")
            return
        if len(toks) < 2:
            _warn(st.line_no, f"invalid instance: {st.raw}")
            return
        subname = toks[-1].lower()
        if subname not in defs:
            _warn(st.line_no, f"unknown subcircuit {toks[-1]!r}; "
                  f"dropping {toks[0]}")
            return
        ports, body = defs[subname]
        nets = toks[1:-1]
        if len(nets) != len(ports):
            _warn(st.line_no,
                  f"{toks[0]}: {len(nets)} nets for {len(ports)} ports "
                  f"of {subname}; dropping instance")
            return
        mapping = dict(zip(ports, nets))
        for bst in body:
            expand(_rename(bst, mapping, toks[0]), depth + 1)

    for st in top:
        expand(st, 0)
    return out
