from .ast import (  # noqa: F401
    AggregateExpr,
    BinaryExpr,
    Call,
    Expr,
    LabelMatcher,
    MatchType,
    MatrixSelector,
    NumberLiteral,
    ParenExpr,
    StringLiteral,
    UnaryExpr,
    ValueType,
    VectorMatchCardinality,
    VectorMatching,
    VectorSelector,
)
from .functions import FUNCTIONS, get_function  # noqa: F401
from .printer import to_promql  # noqa: F401
from .lexer import PromQLSyntaxError, parse_duration_ms  # noqa: F401
from .parser import parse, parse_metric_selector  # noqa: F401
