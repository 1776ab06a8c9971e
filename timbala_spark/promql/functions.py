"""The closed PromQL function registry — all 46 functions.

Mirrors ``vendor/.../promql/functions.go:957-1243``; an unknown name is
a parse error (``functions.go:1246-1249``, ``parse.go:765-771``).
"""

from __future__ import annotations

from .ast import Function, ValueType

V = ValueType.VECTOR
S = ValueType.SCALAR
M = ValueType.MATRIX
STR = ValueType.STRING


def _f(name, args, ret, optional=0, variadic=False):
    return Function(name, tuple(args), ret, optional, variadic)


FUNCTIONS: dict[str, Function] = {
    f.name: f
    for f in [
        _f("abs", [V], V),
        _f("absent", [V], V),
        _f("avg_over_time", [M], V),
        _f("ceil", [V], V),
        _f("changes", [M], V),
        _f("clamp_max", [V, S], V),
        _f("clamp_min", [V, S], V),
        _f("count_over_time", [M], V),
        _f("days_in_month", [V], V, optional=1),
        _f("day_of_month", [V], V, optional=1),
        _f("day_of_week", [V], V, optional=1),
        _f("delta", [M], V),
        _f("deriv", [M], V),
        _f("exp", [V], V),
        _f("floor", [V], V),
        _f("histogram_quantile", [S, V], V),
        _f("holt_winters", [M, S, S], V),
        _f("hour", [V], V, optional=1),
        _f("idelta", [M], V),
        _f("increase", [M], V),
        _f("irate", [M], V),
        _f("label_replace", [V, STR, STR, STR, STR], V),
        _f("label_join", [V, STR, STR, STR], V, variadic=True),
        _f("ln", [V], V),
        _f("log10", [V], V),
        _f("log2", [V], V),
        _f("max_over_time", [M], V),
        _f("min_over_time", [M], V),
        _f("minute", [V], V, optional=1),
        _f("month", [V], V, optional=1),
        _f("predict_linear", [M, S], V),
        _f("quantile_over_time", [S, M], V),
        _f("rate", [M], V),
        _f("resets", [M], V),
        _f("round", [V, S], V, optional=1),
        _f("scalar", [V], S),
        _f("sort", [V], V),
        _f("sort_desc", [V], V),
        _f("sqrt", [V], V),
        _f("stddev_over_time", [M], V),
        _f("stdvar_over_time", [M], V),
        _f("sum_over_time", [M], V),
        _f("time", [], S),
        _f("timestamp", [V], V),
        _f("vector", [S], V),
        _f("year", [V], V, optional=1),
    ]
}


def get_function(name: str) -> Function | None:
    return FUNCTIONS.get(name)
