"""Arithmetic expression evaluator for `.PARAM` and `{...}` netlist
values (extension; the reference has no parameter system — every value in
its grammar is a literal, utils.hpp:20-74).

A small Pratt/recursive-descent parser over:

  * SPICE numbers with magnitude suffixes (2.2k, 1meg, 10u, ...),
  * parameter names (case-insensitive, resolved via a bindings dict),
  * constants ``pi`` and ``e``,
  * operators ``+ - * / % **`` (also ``^`` for power), unary ``+/-``,
  * functions: sin cos tan asin acos atan atan2 sinh cosh tanh exp ln
    log log10 sqrt abs floor ceil pow min max,
  * parentheses.

Evaluation is immediate (host floats) — parameters are compile-time
constants of a netlist; `.STEP` re-binds them and re-evaluates.  No
Python ``eval`` is involved.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

from .numbers import parse_spice_number

_FUNCS1 = {
    "sin": math.sin, "cos": math.cos, "tan": math.tan,
    "asin": math.asin, "acos": math.acos, "atan": math.atan,
    "sinh": math.sinh, "cosh": math.cosh, "tanh": math.tanh,
    "exp": math.exp, "ln": math.log, "log": math.log,
    "log10": math.log10, "sqrt": math.sqrt, "abs": abs,
    "floor": math.floor, "ceil": math.ceil,
}
_FUNCS2 = {
    "pow": math.pow, "atan2": math.atan2, "min": min, "max": max,
}
_CONSTS = {"pi": math.pi, "e": math.e}


class ExprError(ValueError):
    pass


def _tokenize(s: str) -> List[Tuple[str, str]]:
    """[(kind, text)]; kinds: num, name, op, lpar, rpar, comma."""
    toks = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c.isspace():
            i += 1
        elif c.isdigit() or (c == "." and i + 1 < n and s[i + 1].isdigit()):
            j = i
            while j < n and (s[j].isdigit() or s[j] == "."):
                j += 1
            if j < n and s[j] in "eE":
                k = j + 1
                if k < n and s[k] in "+-":
                    k += 1
                if k < n and s[k].isdigit():
                    j = k
                    while j < n and s[j].isdigit():
                        j += 1
            while j < n and s[j].isalpha():   # magnitude suffix (k, meg, ...)
                j += 1
            toks.append(("num", s[i:j]))
            i = j
        elif c.isalpha() or c == "_":
            j = i
            while j < n and (s[j].isalnum() or s[j] == "_"):
                j += 1
            toks.append(("name", s[i:j]))
            i = j
        elif c == "*" and i + 1 < n and s[i + 1] == "*":
            toks.append(("op", "**"))
            i += 2
        elif c in "+-*/%^":
            toks.append(("op", c))
            i += 1
        elif c == "(":
            toks.append(("lpar", c))
            i += 1
        elif c == ")":
            toks.append(("rpar", c))
            i += 1
        elif c == ",":
            toks.append(("comma", c))
            i += 1
        else:
            raise ExprError(f"unexpected character {c!r} in expression {s!r}")
    return toks


class _Parser:
    def __init__(self, toks: List[Tuple[str, str]],
                 bindings: Dict[str, float]):
        self.toks = toks
        self.pos = 0
        self.bindings = bindings

    def peek(self) -> Optional[Tuple[str, str]]:
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def next(self) -> Tuple[str, str]:
        t = self.peek()
        if t is None:
            raise ExprError("unexpected end of expression")
        self.pos += 1
        return t

    def expect(self, kind: str) -> None:
        t = self.next()
        if t[0] != kind:
            raise ExprError(f"expected {kind}, got {t[1]!r}")

    # additive <- multiplicative (('+'|'-') multiplicative)*
    def additive(self) -> float:
        v = self.multiplicative()
        while True:
            t = self.peek()
            if t and t[0] == "op" and t[1] in "+-":
                self.next()
                rhs = self.multiplicative()
                v = v + rhs if t[1] == "+" else v - rhs
            else:
                return v

    def multiplicative(self) -> float:
        v = self.unary()
        while True:
            t = self.peek()
            if t and t[0] == "op" and t[1] in ("*", "/", "%"):
                self.next()
                rhs = self.unary()
                if t[1] == "*":
                    v = v * rhs
                elif t[1] == "/":
                    v = v / rhs
                else:
                    v = math.fmod(v, rhs)
            else:
                return v

    def unary(self) -> float:
        t = self.peek()
        if t and t[0] == "op" and t[1] in "+-":
            self.next()
            v = self.unary()
            return -v if t[1] == "-" else v
        return self.power()

    # right-associative power binds tighter than unary minus on the left
    # of the base only through explicit parens (matches ngspice: -2**2=-4)
    def power(self) -> float:
        v = self.atom()
        t = self.peek()
        if t and t[0] == "op" and t[1] in ("**", "^"):
            self.next()
            return math.pow(v, self.unary())
        return v

    def atom(self) -> float:
        t = self.next()
        if t[0] == "num":
            return parse_spice_number(t[1])
        if t[0] == "name":
            name = t[1].lower()
            nxt = self.peek()
            if nxt and nxt[0] == "lpar":
                self.next()
                args = [self.additive()]
                while self.peek() and self.peek()[0] == "comma":
                    self.next()
                    args.append(self.additive())
                self.expect("rpar")
                if name in _FUNCS1 and len(args) == 1:
                    return float(_FUNCS1[name](args[0]))
                if name in _FUNCS2 and len(args) == 2:
                    return float(_FUNCS2[name](*args))
                raise ExprError(
                    f"unknown function {name}/{len(args)}")
            if name in self.bindings:
                return float(self.bindings[name])
            if name in _CONSTS:
                return _CONSTS[name]
            raise ExprError(f"undefined parameter {t[1]!r}")
        if t[0] == "lpar":
            v = self.additive()
            self.expect("rpar")
            return v
        raise ExprError(f"unexpected token {t[1]!r}")


def eval_expr(s: str, bindings: Optional[Dict[str, float]] = None) -> float:
    """Evaluate an expression string with the given parameter bindings
    (names matched case-insensitively).  Raises ExprError on any problem."""
    toks = _tokenize(s)
    if not toks:
        raise ExprError("empty expression")
    b = {k.lower(): v for k, v in (bindings or {}).items()}
    p = _Parser(toks, b)
    try:
        v = p.additive()
    except ZeroDivisionError:
        raise ExprError(f"division by zero in {s!r}")
    except (ValueError, OverflowError) as e:
        if isinstance(e, ExprError):
            raise
        raise ExprError(f"math error in {s!r}: {e}")
    if p.peek() is not None:
        raise ExprError(f"trailing tokens after expression in {s!r}")
    if not math.isfinite(v):
        raise ExprError(f"non-finite result for {s!r}")
    return float(v)
