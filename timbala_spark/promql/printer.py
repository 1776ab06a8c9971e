"""AST → PromQL source printer.

Mirrors the reference's ``Expr.String()`` implementations
(``vendor/.../promql/printer.go:61-192``): selectors print their
matchers sorted as written, durations in milliseconds (always valid
duration syntax), binary expressions print their matching spec
(``on``/``ignoring`` + ``group_left``/``group_right``), aggregations
print leading ``by``/``without`` modifiers.

Deviation from the reference: compound sub-expressions are printed
fully parenthesized instead of relying on operator precedence — the
output re-parses to the same AST (modulo the explicit ``ParenExpr``
nodes), which is the property the round-trip tests pin.
"""

from __future__ import annotations

import json
import math

from .ast import (
    AggregateExpr,
    BinaryExpr,
    Call,
    Expr,
    MatrixSelector,
    NumberLiteral,
    ParenExpr,
    StringLiteral,
    UnaryExpr,
    VectorMatchCardinality,
    VectorMatching,
    VectorSelector,
)


def _num(v: float) -> str:
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "Inf" if v > 0 else "-Inf"
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def _string(s: str) -> str:
    # Go-style double-quoted string; json escaping is a subset of the
    # PromQL string syntax (strutil.Unquote handles \", \\, \uXXXX)
    return json.dumps(s)


def _matchers(name: str | None, matchers) -> str:
    inner = ", ".join(
        f"{m.name}{m.type.value}{_string(m.value)}"
        for m in matchers
        if not (name is not None and m.name == "__name__")
    )
    base = name or ""
    if inner or not base:
        return f"{base}{{{inner}}}"
    return base


def _offset(ms: int) -> str:
    return f" offset {ms}ms" if ms else ""


def _matching(m: VectorMatching | None) -> str:
    if m is None:
        return ""
    out = ""
    if m.on:
        out = f" on({', '.join(m.matching_labels)})"
    elif m.matching_labels:
        out = f" ignoring({', '.join(m.matching_labels)})"
    if m.card == VectorMatchCardinality.MANY_TO_ONE:
        out += f" group_left({', '.join(m.include)})"
    elif m.card == VectorMatchCardinality.ONE_TO_MANY:
        out += f" group_right({', '.join(m.include)})"
    return out


def _p(e: Expr) -> str:
    """Print a sub-expression, parenthesizing only compound nodes —
    atoms, calls, aggregations, and already-parenthesized expressions
    re-parse unambiguously, so wrapping them again would make printing
    non-idempotent."""
    if isinstance(e, (BinaryExpr, UnaryExpr)):
        return f"({to_promql(e)})"
    return to_promql(e)


def to_promql(e: Expr) -> str:
    """Serialize an AST back to parseable PromQL."""
    if isinstance(e, NumberLiteral):
        return _num(e.value)
    if isinstance(e, StringLiteral):
        return _string(e.value)
    if isinstance(e, VectorSelector):
        return _matchers(e.name, e.matchers) + _offset(e.offset_ms)
    if isinstance(e, MatrixSelector):
        return (
            _matchers(e.name, e.matchers)
            + f"[{e.range_ms}ms]"
            + _offset(e.offset_ms)
        )
    if isinstance(e, ParenExpr):
        return f"({to_promql(e.expr)})"
    if isinstance(e, UnaryExpr):
        return f"{e.op}{_p(e.expr)}"
    if isinstance(e, BinaryExpr):
        b = " bool" if e.return_bool else ""
        return f"{_p(e.lhs)} {e.op}{b}{_matching(e.matching)} {_p(e.rhs)}"
    if isinstance(e, AggregateExpr):
        mod = ""
        if e.without:
            mod = f" without({', '.join(e.grouping)})"
        elif e.grouping:
            mod = f" by({', '.join(e.grouping)})"
        args = ([to_promql(e.param)] if e.param is not None else []) + [
            to_promql(e.expr)
        ]
        return f"{e.op}{mod}({', '.join(args)})"
    if isinstance(e, Call):
        return f"{e.func.name}({', '.join(to_promql(a) for a in e.args)})"
    raise TypeError(f"unknown expression node {type(e).__name__}")
