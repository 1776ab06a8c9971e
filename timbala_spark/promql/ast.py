"""PromQL AST node types.

Mirrors the node taxonomy of the reference's AST
(``vendor/.../promql/ast.go``): expressions only — the engine evaluates
``EvalStmt`` and nothing else (``promql/engine.go:346-353``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


class ValueType(str, Enum):
    SCALAR = "scalar"
    VECTOR = "instant vector"
    MATRIX = "range vector"
    STRING = "string"


class MatchType(str, Enum):
    EQ = "="
    NEQ = "!="
    RE = "=~"
    NRE = "!~"


@dataclass(frozen=True)
class LabelMatcher:
    """A single label matcher; regexes are fully anchored at match time
    (``pkg/labels/matcher.go:62``: ``^(?:re)$``)."""

    type: MatchType
    name: str
    value: str

    def matches_empty(self) -> bool:
        """Whether this matcher accepts the empty string (i.e. an absent
        label)."""
        import re

        from .lexer import PromQLSyntaxError
        from .re2 import re2_to_host

        if self.type == MatchType.EQ:
            return self.value == ""
        if self.type == MatchType.NEQ:
            return self.value != ""
        try:
            # no (?:...) wrap: fullmatch already requires the whole
            # string, and wrapping would push RE2's leading global
            # flags ((?i)...) off the start, which Python rejects
            ok = (
                re.fullmatch(re2_to_host(self.value, dialect="python"), "")
                is not None
            )
        except (re.error, ValueError) as e:
            # invalid pattern is a parse error (parse.go reports RE2
            # compile failures as syntax errors)
            raise PromQLSyntaxError(f"invalid regex {self.value!r}: {e}")
        return ok if self.type == MatchType.RE else not ok


class Expr:
    """Base class for all expression nodes."""

    @property
    def type(self) -> ValueType:  # pragma: no cover - abstract
        raise NotImplementedError


@dataclass
class NumberLiteral(Expr):
    value: float

    @property
    def type(self) -> ValueType:
        return ValueType.SCALAR


@dataclass
class StringLiteral(Expr):
    value: str

    @property
    def type(self) -> ValueType:
        return ValueType.STRING


@dataclass
class VectorSelector(Expr):
    name: str | None
    matchers: list[LabelMatcher]
    offset_ms: int = 0

    @property
    def type(self) -> ValueType:
        return ValueType.VECTOR


@dataclass
class MatrixSelector(Expr):
    name: str | None
    matchers: list[LabelMatcher]
    range_ms: int
    offset_ms: int = 0

    @property
    def type(self) -> ValueType:
        return ValueType.MATRIX


class VectorMatchCardinality(str, Enum):
    ONE_TO_ONE = "one-to-one"
    MANY_TO_ONE = "many-to-one"
    ONE_TO_MANY = "one-to-many"
    MANY_TO_MANY = "many-to-many"


@dataclass
class VectorMatching:
    """Vector matching spec (``promql/ast.go:224-238``)."""

    card: VectorMatchCardinality = VectorMatchCardinality.ONE_TO_ONE
    matching_labels: list[str] = field(default_factory=list)
    on: bool = False
    include: list[str] = field(default_factory=list)


ARITHMETIC_OPS = {"+", "-", "*", "/", "%", "^"}
COMPARISON_OPS = {"==", "!=", ">", "<", ">=", "<="}
SET_OPS = {"and", "or", "unless"}


@dataclass
class BinaryExpr(Expr):
    op: str
    lhs: Expr
    rhs: Expr
    matching: VectorMatching | None = None
    return_bool: bool = False

    @property
    def type(self) -> ValueType:
        if (
            self.lhs.type == ValueType.SCALAR
            and self.rhs.type == ValueType.SCALAR
        ):
            return ValueType.SCALAR
        return ValueType.VECTOR


@dataclass
class UnaryExpr(Expr):
    op: str  # '+' or '-'
    expr: Expr

    @property
    def type(self) -> ValueType:
        return self.expr.type


@dataclass
class ParenExpr(Expr):
    expr: Expr

    @property
    def type(self) -> ValueType:
        return self.expr.type


AGGREGATORS = {
    "sum",
    "avg",
    "count",
    "min",
    "max",
    "stddev",
    "stdvar",
    "topk",
    "bottomk",
    "count_values",
    "quantile",
}
AGGREGATORS_WITH_PARAM = {"topk", "bottomk", "count_values", "quantile"}


@dataclass
class AggregateExpr(Expr):
    op: str
    expr: Expr
    param: Expr | None = None
    grouping: list[str] = field(default_factory=list)
    without: bool = False

    @property
    def type(self) -> ValueType:
        return ValueType.VECTOR


@dataclass
class Call(Expr):
    func: "Function"
    args: list[Expr]

    @property
    def type(self) -> ValueType:
        return self.func.return_type


@dataclass(frozen=True)
class Function:
    """Registry entry (``promql/functions.go:948-1243``)."""

    name: str
    arg_types: tuple[ValueType, ...]
    return_type: ValueType
    # number of trailing optional args (e.g. round's `nearest`, the
    # zero-arg-defaulting date functions)
    optional: int = 0
    variadic: bool = False  # label_join's src labels


@dataclass
class RecordStmt:
    """``name[{labels}] = expr`` recording rule (``promql/ast.go:74-84``).

    The reference parser accepts the statement grammar even though
    timbala wires no rule engine; the Spark-side evaluation lives in
    ``streaming/rules.py``."""

    name: str
    labels: dict[str, str]
    expr: Expr


@dataclass
class AlertStmt:
    """``ALERT name IF expr [FOR d] [LABELS {..}] [ANNOTATIONS {..}]``
    (``promql/ast.go:54-66``, ``parse.go:369-418``)."""

    name: str
    expr: Expr
    duration_ms: int
    labels: dict[str, str]
    annotations: dict[str, str]


def walk(expr: Expr):
    """Yield every node of the AST (pre-order)."""
    yield expr
    if isinstance(expr, BinaryExpr):
        yield from walk(expr.lhs)
        yield from walk(expr.rhs)
    elif isinstance(expr, (UnaryExpr, ParenExpr)):
        yield from walk(expr.expr)
    elif isinstance(expr, AggregateExpr):
        if expr.param is not None:
            yield from walk(expr.param)
        yield from walk(expr.expr)
    elif isinstance(expr, Call):
        for a in expr.args:
            yield from walk(a)
