"""Printer round-trip + parser fuzz tests.

The reference exposes ``Expr.String()`` (printer.go) and go-fuzz
targets over the parser (fuzz.go:61-91 — "panic-free on arbitrary
input" is the contract). The Spark port pins the same two properties:

* print → parse → print is a fixpoint, and reparsing yields the same
  AST modulo explicit parenthesization;
* the parser never raises anything except ``PromQLSyntaxError`` on
  arbitrary input.

No SparkSession needed — this is pure front-end.
"""

from __future__ import annotations

import dataclasses

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st

from timbala_spark.promql.ast import ParenExpr, UnaryExpr
from timbala_spark.promql.lexer import PromQLSyntaxError
from timbala_spark.promql.parser import parse
from timbala_spark.promql.printer import to_promql

CORPUS = [
    "1",
    "-1.5",
    "Inf",
    "NaN",
    "2e10",
    '"a string"',
    "foo",
    'foo{bar="baz"}',
    '{__name__=~".+"}',
    'foo{a="1", b!="2", c=~"x.*", d!~"y"}',
    "foo offset 5m",
    "foo[5m]",
    "foo[1h] offset 30s",
    "-foo",
    "(foo)",
    "foo + bar",
    "foo / on(a, b) bar",
    "foo * ignoring(c) group_left(d) bar",
    "foo - on() group_right() bar",
    "foo > bool bar",
    "foo and bar",
    "foo unless on(x) bar",
    "2 ^ 3 ^ 2",
    "sum(foo)",
    "sum by(a, b) (foo)",
    "count without(c) (foo)",
    "topk(5, foo)",
    "quantile(0.9, sum by(u) (foo))",
    'count_values("ver", build_info)',
    "rate(foo[5m])",
    "histogram_quantile(0.9, sum by(le) (rate(h[10m])))",
    'label_replace(m, "dst", "$1", "src", "(.*)")',
    "clamp_max(clamp_min(foo, 1), 2)",
    "holt_winters(foo[1h], 0.5, 0.1)",
    "avg_over_time(foo[5m]) / scalar(sum(bar))",
    "time()",
    "vector(1)",
    "absent(nonexistent{job=\"x\"})",
    'sum(rate(http_requests_total{job="api", code=~"5.."}[5m])) '
    "/ sum(rate(http_requests_total[5m]))",
]


def strip_parens(e):
    """Structural normal form: drop ParenExpr wrappers everywhere."""
    while isinstance(e, ParenExpr):
        e = e.expr
    if not dataclasses.is_dataclass(e):
        return e
    out = {}
    for f in dataclasses.fields(e):
        v = getattr(e, f.name)
        if dataclasses.is_dataclass(v) and not isinstance(v, type):
            out[f.name] = (
                strip_parens(v) if hasattr(v, "type") or isinstance(v, ParenExpr) else v
            )
        elif isinstance(v, list):
            out[f.name] = [
                strip_parens(x) if hasattr(x, "type") else x for x in v
            ]
        else:
            out[f.name] = v
    return dataclasses.replace(e, **out)


@pytest.mark.parametrize("src", CORPUS)
def test_roundtrip_corpus(src):
    ast1 = parse(src)
    printed = to_promql(ast1)
    ast2 = parse(printed)
    assert to_promql(ast2) == printed, f"print not a fixpoint for {src!r}"
    # structural identity modulo parenthesization, compared via the
    # printed normal form (dataclass == chokes on NaN literals, and
    # unary over literals may constant-fold on reparse)
    a1, a2 = strip_parens(ast1), strip_parens(ast2)
    assert to_promql(a1) == to_promql(a2), f"AST drift for {src!r}"


@given(st.text(max_size=80))
@settings(max_examples=500, deadline=None)
def test_parser_total_on_garbage(s):
    """Arbitrary input either parses or raises PromQLSyntaxError —
    never any other exception (fuzz.go's panic-free contract)."""
    try:
        parse(s)
    except PromQLSyntaxError:
        pass
    except RecursionError:
        pass  # pathological nesting depth; Go fuzz accepts this too


_IDENT = st.from_regex(r"[a-zA-Z_][a-zA-Z0-9_]{0,8}", fullmatch=True)


@st.composite
def selectors(draw):
    name = draw(_IDENT)
    if not draw(st.booleans()):
        return name
    op = draw(st.sampled_from(["=", "!=", "=~", "!~"]))
    lbl, val = draw(_IDENT), draw(_IDENT)
    off = draw(st.sampled_from(["", " offset 5m", " offset 1h30m"]))
    return f'{name}{{{lbl}{op}"{val}"}}{off}'


@st.composite
def exprs(draw, depth=0):
    if depth > 3:
        return draw(
            st.sampled_from(["m", "1", "rate(m[5m])", 'm{a="b"}'])
        )
    kind = draw(st.integers(0, 7))
    if kind == 0:
        return draw(selectors())
    if kind == 1:
        return f"{draw(st.floats(allow_nan=False, allow_infinity=False, width=32))}"
    if kind == 2:
        op = draw(st.sampled_from(["+", "-", "*", "/", "%", "^", "and", "or"]))
        return f"({draw(exprs(depth + 1))}) {op} ({draw(exprs(depth + 1))})"
    if kind == 3:
        agg = draw(st.sampled_from(["sum", "avg", "min", "max", "count"]))
        mod = draw(st.sampled_from(["by", "without"]))
        lbl = draw(_IDENT)
        return f"{agg} {mod}({lbl}) ({draw(exprs(depth + 1))})"
    if kind == 4:
        return f"abs({draw(exprs(depth + 1))})"
    if kind == 5:
        # vector matching with grouping modifiers
        match = draw(st.sampled_from(["on", "ignoring"]))
        card = draw(st.sampled_from(["", " group_left", " group_right()"]))
        lbl = draw(_IDENT)
        return (
            f"({draw(selectors())}) / {match}({lbl}){card} "
            f"({draw(selectors())})"
        )
    if kind == 6:
        cmp = draw(st.sampled_from(["==", "!=", ">", "<", ">=", "<="]))
        b = draw(st.sampled_from(["", " bool"]))
        return f"({draw(selectors())}) {cmp}{b} ({draw(selectors())})"
    rng = draw(st.sampled_from(["30s", "5m", "1h", "90m"]))
    off = draw(st.sampled_from(["", " offset 10m"]))
    fn = draw(st.sampled_from(["avg_over_time", "rate", "changes", "delta"]))
    return f"{fn}({draw(_IDENT)}[{rng}]{off})"


@given(exprs())
@settings(max_examples=200, deadline=None)
def test_roundtrip_generated(src):
    try:
        ast1 = parse(src)
    except PromQLSyntaxError:
        return  # generator can produce type errors (scalar and scalar)
    printed = to_promql(ast1)
    ast2 = parse(printed)
    assert to_promql(ast2) == printed
