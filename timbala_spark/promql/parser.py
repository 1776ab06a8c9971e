"""PromQL parser: precedence-climbing over the lexer's token stream.

Re-implements the grammar of the reference's recursive-descent parser
(``vendor/.../prometheus/promql/parse.go:442-540`` binary expressions,
``:596-622`` selectors, ``:704-759`` aggregations, ``:814-894``
matchers) and the typecheck pass (``parse.go:984-1121``).  No
subqueries and no ``@`` modifier — those do not exist in the vendored
engine version (SURVEY.md §2.5 scope note).
"""

from __future__ import annotations

from .ast import (
    AGGREGATORS,
    AGGREGATORS_WITH_PARAM,
    ARITHMETIC_OPS,
    COMPARISON_OPS,
    SET_OPS,
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
    walk,
)
from .functions import get_function
from .lexer import (
    COMMA,
    DURATION,
    EOF,
    IDENT,
    KEYWORDS,
    LBRACE,
    LBRACKET,
    LPAREN,
    NUMBER,
    RBRACE,
    RBRACKET,
    RPAREN,
    STRING,
    PromQLSyntaxError,
    Token,
    number_value,
    parse_duration_ms,
    tokenize,
)

# precedence table (lex.go:95-112); ^ is right-associative (:114-122)
PRECEDENCE = {
    "or": 1,
    "and": 2,
    "unless": 2,
    "==": 3,
    "!=": 3,
    "<=": 3,
    "<": 3,
    ">=": 3,
    ">": 3,
    "+": 4,
    "-": 4,
    "*": 5,
    "/": 5,
    "%": 5,
    "^": 6,
}
RIGHT_ASSOC = {"^"}
UNARY_PREC = 6  # `-1^2` parses as `-(1^2)`

BINARY_OPS = ARITHMETIC_OPS | COMPARISON_OPS | SET_OPS

METRIC_NAME_LABEL = "__name__"

_MATCH_TYPES = {
    "=": MatchType.EQ,
    "!=": MatchType.NEQ,
    "=~": MatchType.RE,
    "!~": MatchType.NRE,
}


class Parser:
    def __init__(self, src: str):
        self.toks = tokenize(src)
        self.pos = 0

    # -- token helpers -------------------------------------------------
    def peek(self) -> Token:
        return self.toks[self.pos]

    def next(self) -> Token:
        t = self.toks[self.pos]
        if t.kind != EOF:
            self.pos += 1
        return t

    def expect(self, kind: str) -> Token:
        t = self.peek()
        if t.kind != kind:
            raise PromQLSyntaxError(
                f"expected {kind!r}, got {t.kind!r} ({t.text!r}) at {t.pos}"
            )
        return self.next()

    def accept(self, kind: str) -> Token | None:
        if self.peek().kind == kind:
            return self.next()
        return None

    def accept_keyword(self, word: str) -> bool:
        t = self.peek()
        if t.kind == IDENT and t.text == word:
            self.next()
            return True
        return False

    # -- entry ---------------------------------------------------------
    def parse_expr(self) -> Expr:
        if self.peek().kind == EOF:  # parse.go:152
            raise PromQLSyntaxError("no expression found in input")
        e = self.parse_binary(0)
        t = self.peek()
        if t.kind != EOF:
            raise PromQLSyntaxError(
                f"could not parse remaining input {t.text!r} at {t.pos}"
            )
        typecheck(e)
        return e

    # -- binary expressions (precedence climbing) ----------------------
    def parse_binary(self, min_prec: int) -> Expr:
        lhs = self.parse_unary()
        while True:
            t = self.peek()
            op = t.text if t.kind == IDENT else t.kind
            if op not in BINARY_OPS or PRECEDENCE[op] < min_prec:
                return lhs
            self.next()
            return_bool = False
            if self.accept_keyword("bool"):
                return_bool = True
            matching = self.parse_matching()
            nxt = PRECEDENCE[op] if op in RIGHT_ASSOC else PRECEDENCE[op] + 1
            rhs = self.parse_binary(nxt)
            lhs = BinaryExpr(op, lhs, rhs, matching=matching, return_bool=return_bool)

    def parse_matching(self) -> VectorMatching | None:
        """`on(...)` / `ignoring(...)` [group_left/right(...)]
        (parse.go:475-495)."""
        matching = None
        if self.peek().kind == IDENT and self.peek().text in ("on", "ignoring"):
            kw = self.next().text
            labels = self.parse_label_list()
            matching = VectorMatching(
                matching_labels=labels, on=(kw == "on")
            )
        t = self.peek()
        if t.kind == IDENT and t.text in ("group_left", "group_right"):
            self.next()
            if matching is None:
                matching = VectorMatching()
            matching.card = (
                VectorMatchCardinality.MANY_TO_ONE
                if t.text == "group_left"
                else VectorMatchCardinality.ONE_TO_MANY
            )
            if self.peek().kind == LPAREN:
                matching.include = self.parse_label_list()
        if matching is not None:
            if matching.on:
                dup = set(matching.matching_labels) & set(matching.include)
                if dup:
                    raise PromQLSyntaxError(
                        f"label {sorted(dup)[0]!r} must not occur in ON and GROUP clause at once"
                    )
        return matching

    def parse_label_list(self) -> list[str]:
        self.expect(LPAREN)
        labels: list[str] = []
        if self.peek().kind != RPAREN:
            while True:
                t = self.expect(IDENT)
                if ":" in t.text:
                    raise PromQLSyntaxError(f"invalid label name {t.text!r}")
                labels.append(t.text)
                if not self.accept(COMMA):
                    break
        self.expect(RPAREN)
        return labels

    # -- unary / atoms ---------------------------------------------------
    def parse_unary(self) -> Expr:
        t = self.peek()
        if t.kind in ("+", "-"):
            self.next()
            operand = self.parse_binary(UNARY_PREC)
            # constant-fold unary minus on number literals (parse.go:552-558)
            if isinstance(operand, NumberLiteral):
                return NumberLiteral(
                    -operand.value if t.kind == "-" else operand.value
                )
            return UnaryExpr(t.kind, operand)
        return self.parse_postfix(self.parse_atom())

    def parse_postfix(self, e: Expr) -> Expr:
        """Range `[5m]` and `offset 5m` suffixes."""
        if self.peek().kind == LBRACKET:
            if not isinstance(e, VectorSelector):
                # Go's %T of the preceding node (parse.go:574): our AST
                # classes carry the reference's type names
                raise PromQLSyntaxError(
                    "range specification must be preceded by a metric "
                    f"selector, but follows a *promql.{type(e).__name__} "
                    "instead"
                )
            self.next()
            d = self.expect(DURATION)
            self.expect(RBRACKET)
            e = MatrixSelector(
                e.name, e.matchers, range_ms=parse_duration_ms(d.text)
            )
        if self.peek().kind == IDENT and self.peek().text == "offset":
            self.next()
            d = self.expect(DURATION)
            off = parse_duration_ms(d.text)
            if isinstance(e, (VectorSelector, MatrixSelector)):
                e.offset_ms = off
            else:
                raise PromQLSyntaxError(
                    "offset modifier must be preceded by an instant or "
                    f"range selector, but follows a *promql.{type(e).__name__} "
                    "instead"
                )
        return e

    def parse_atom(self) -> Expr:
        t = self.peek()
        if t.kind == NUMBER:
            self.next()
            return NumberLiteral(number_value(t.text))
        if t.kind == STRING:
            self.next()
            return StringLiteral(t.text)
        if t.kind == LPAREN:
            self.next()
            e = self.parse_binary(0)
            self.expect(RPAREN)
            return ParenExpr(e)
        if t.kind == LBRACE:
            return self.parse_selector(None)
        if t.kind == IDENT:
            if t.text in AGGREGATORS:
                return self.parse_aggregate()
            if t.text in KEYWORDS:
                # a bare keyword (`on`, `bool`, `alert`, ...) lexes as
                # its keyword item in the reference and can never start
                # an expression (lex.go:201-234) — a metric by that
                # name is only reachable via {__name__="on"}
                raise PromQLSyntaxError(
                    f"no valid expression found at position {t.pos} "
                    f"({t.text!r} is a reserved keyword)"
                )
            if self.toks[self.pos + 1].kind == LPAREN:
                # the reference treats ident+'(' unconditionally as a
                # call (parse.go primaryExpr → call), so a name missing
                # from the registry is "unknown function", not a
                # selector followed by junk
                if get_function(t.text) is None:
                    raise PromQLSyntaxError(
                        f'unknown function with name "{t.text}"'
                    )
                return self.parse_call()
            self.next()
            return self.parse_selector(t.text)
        raise PromQLSyntaxError(
            f"no valid expression found at position {t.pos} ({t.text!r})"
        )

    # -- aggregations (parse.go:704-759) -------------------------------
    def parse_aggregate(self) -> Expr:
        op = self.next().text
        grouping: list[str] = []
        without = False
        seen_mod = False
        if self.peek().kind == IDENT and self.peek().text in ("by", "without"):
            without = self.next().text == "without"
            grouping = self.parse_label_list()
            seen_mod = True
        self.expect(LPAREN)
        param = None
        if op in AGGREGATORS_WITH_PARAM:
            param = self.parse_binary(0)
            self.expect(COMMA)
        e = self.parse_binary(0)
        self.expect(RPAREN)
        if (
            not seen_mod
            and self.peek().kind == IDENT
            and self.peek().text in ("by", "without")
        ):
            without = self.next().text == "without"
            grouping = self.parse_label_list()
        return AggregateExpr(op, e, param=param, grouping=grouping, without=without)

    # -- function calls --------------------------------------------------
    def parse_call(self) -> Expr:
        name = self.next().text
        fn = get_function(name)
        self.expect(LPAREN)
        args: list[Expr] = []
        if self.peek().kind != RPAREN:
            while True:
                args.append(self.parse_binary(0))
                if not self.accept(COMMA):
                    break
        self.expect(RPAREN)
        min_args = len(fn.arg_types) - fn.optional
        if fn.variadic:
            # vendored arity rule (parse.go): a variadic function's
            # LAST declared arg is part of the repeating tail, so the
            # minimum is len(ArgTypes) - 1 — label_join(v, dst, sep)
            # with zero source labels is legal
            if len(args) < len(fn.arg_types) - 1:
                raise PromQLSyntaxError(
                    f"expected at least {len(fn.arg_types) - 1} argument(s) in call to {name!r}, got {len(args)}"
                )
        elif not (min_args <= len(args) <= len(fn.arg_types)):
            raise PromQLSyntaxError(
                f"expected {len(fn.arg_types)} argument(s) in call to {name!r}, got {len(args)}"
            )
        return Call(fn, args)

    # -- selectors (parse.go:596-622, 814-894) --------------------------
    def parse_selector(self, name: str | None) -> Expr:
        matchers: list[LabelMatcher] = []
        if self.peek().kind == LBRACE:
            self.next()
            if self.peek().kind != RBRACE:
                while True:
                    ln = self.peek()
                    # Keywords already lex as IDENT; operator tokens
                    # (==, <, ...) are never valid label names
                    # (parse.go:826-832).
                    if ln.kind != IDENT:
                        raise PromQLSyntaxError(
                            f"expected label name, got {ln.text!r} at {ln.pos}"
                        )
                    # keywords are valid label names inside braces
                    lname = self.next().text
                    opt = self.peek()
                    if opt.kind not in _MATCH_TYPES:
                        # item desc (lex.go:31-48): operators print as
                        # <op:x>, identifiers as %q
                        desc = (
                            f'"{opt.text}"'
                            if opt.kind == IDENT
                            else f"<op:{opt.text}>"
                        )
                        raise PromQLSyntaxError(
                            f"expected label matching operator but got {desc}"
                        )
                    self.next()
                    val = self.expect(STRING)
                    matchers.append(
                        LabelMatcher(_MATCH_TYPES[opt.kind], lname, val.text)
                    )
                    # identifier directly after a matcher: the comma is
                    # missing (parse.go:868-870, checked BEFORE the
                    # comma/terminator decision)
                    if self.peek().kind == IDENT:
                        raise PromQLSyntaxError(
                            "missing comma before next identifier "
                            f'"{self.peek().text}"'
                        )
                    if not self.accept(COMMA):
                        break
                    if self.peek().kind == RBRACE:
                        break
            self.expect(RBRACE)
        if name is not None:
            for m in matchers:
                if m.name == METRIC_NAME_LABEL:
                    raise PromQLSyntaxError(  # %q quoting (parse.go:949)
                        f'metric name must not be set twice: "{name}" or '
                        f'"{m.value}"'
                    )
            matchers.append(
                LabelMatcher(MatchType.EQ, METRIC_NAME_LABEL, name)
            )
        if not matchers:
            raise PromQLSyntaxError(
                "vector selector must contain label matchers or metric name"
            )
        # at least one matcher must not match the empty string
        # (parse.go:879-894)
        if all(m.matches_empty() for m in matchers):
            raise PromQLSyntaxError(
                "vector selector must contain at least one non-empty matcher"
            )
        return VectorSelector(name, matchers)


# -- typecheck (parse.go:984-1121) --------------------------------------


def typecheck(e: Expr) -> None:
    if isinstance(e, BinaryExpr):
        typecheck(e.lhs)
        typecheck(e.rhs)
        lt, rt = e.lhs.type, e.rhs.type
        if lt not in (ValueType.SCALAR, ValueType.VECTOR) or rt not in (
            ValueType.SCALAR,
            ValueType.VECTOR,
        ):
            raise PromQLSyntaxError(
                "binary expression must contain only scalar and instant vector types"
            )
        if e.return_bool and e.op not in COMPARISON_OPS:
            raise PromQLSyntaxError("bool modifier can only be used on comparison operators")
        if (
            e.op in COMPARISON_OPS
            and lt == ValueType.SCALAR
            and rt == ValueType.SCALAR
            and not e.return_bool
        ):
            raise PromQLSyntaxError(
                "comparisons between scalars must use BOOL modifier"
            )
        if e.op in SET_OPS and (lt == ValueType.SCALAR or rt == ValueType.SCALAR):
            raise PromQLSyntaxError(
                f"set operator {e.op!r} not allowed in binary scalar expression"
            )
        if lt == ValueType.SCALAR or rt == ValueType.SCALAR:
            if e.matching is not None and (
                e.matching.on or e.matching.matching_labels
            ):
                raise PromQLSyntaxError(
                    "vector matching only allowed between instant vectors"
                )
        if lt == ValueType.VECTOR and rt == ValueType.VECTOR and e.matching:
            if e.op in SET_OPS:
                if e.matching.card != VectorMatchCardinality.ONE_TO_ONE:
                    raise PromQLSyntaxError(
                        "no grouping allowed for set operations"
                    )
                e.matching.card = VectorMatchCardinality.MANY_TO_MANY
        if (
            e.matching is not None
            and e.matching.card
            in (
                VectorMatchCardinality.MANY_TO_ONE,
                VectorMatchCardinality.ONE_TO_MANY,
            )
            and e.op in SET_OPS
        ):
            raise PromQLSyntaxError("no grouping allowed for set operations")
    elif isinstance(e, UnaryExpr):
        typecheck(e.expr)
        if e.expr.type not in (ValueType.SCALAR, ValueType.VECTOR):
            raise PromQLSyntaxError(
                "only scalar and instant vector types allowed in unary expression"
            )
    elif isinstance(e, ParenExpr):
        typecheck(e.expr)
    elif isinstance(e, AggregateExpr):
        typecheck(e.expr)
        if e.expr.type != ValueType.VECTOR:
            raise PromQLSyntaxError(
                "aggregation operator expects an instant vector"
            )
        if e.param is not None:
            typecheck(e.param)
            want = (
                ValueType.STRING if e.op == "count_values" else ValueType.SCALAR
            )
            if e.param.type != want:
                raise PromQLSyntaxError(
                    f"expected type {want.value} in aggregation parameter"
                )
    elif isinstance(e, Call):
        for a in e.args:
            typecheck(a)
        n_fixed = len(e.func.arg_types)
        for i, a in enumerate(e.args):
            want = e.func.arg_types[min(i, n_fixed - 1)]
            if a.type != want:
                raise PromQLSyntaxError(
                    f"expected type {want.value} in call to function {e.func.name!r},"
                    f" got {a.type.value}"
                )


def parse(src: str) -> Expr:
    """Parse a PromQL expression string into a typechecked AST."""
    return Parser(src).parse_expr()


def parse_rules(src: str):
    """Parse a rule file body into ``RecordStmt``/``AlertStmt`` lists
    (``parse.go:354-439``): statements are ``name[{labels}] = expr``
    recording rules or ``ALERT name IF expr [FOR d] [LABELS {..}]
    [ANNOTATIONS {..}]`` alerting rules, concatenated freely."""
    from .ast import AlertStmt, RecordStmt

    p = Parser(src)
    stmts: list = []
    while p.peek().kind != EOF:
        t = p.peek()
        if t.kind != IDENT:
            raise PromQLSyntaxError(
                f"no valid statement detected at {t.pos} ({t.text!r})"
            )
        if t.text == "alert":
            stmts.append(_parse_alert_stmt(p))
        else:
            stmts.append(_parse_record_stmt(p))
    for s in stmts:
        typecheck(s.expr)
        if isinstance(s, AlertStmt) and s.expr.type != ValueType.VECTOR:
            # alerts require an instant-vector expression (parse.go:380)
            raise PromQLSyntaxError(
                "alert expression must evaluate to an instant vector"
            )
    return stmts


def _parse_label_set(p: Parser) -> dict[str, str]:
    """``{name="value", ...}`` — equality pairs only (labelSet,
    parse.go:556-580)."""
    p.expect("{")
    out: dict[str, str] = {}
    while p.peek().kind != "}":
        name = p.expect(IDENT)
        if ":" in name.text:
            raise PromQLSyntaxError(f"invalid label name {name.text!r}")
        p.expect("=")
        val = p.expect(STRING)
        if name.text in out:
            raise PromQLSyntaxError(f"duplicate label {name.text!r}")
        out[name.text] = val.text
        if not p.accept(","):
            break
    p.expect("}")
    return out


def _parse_record_stmt(p: Parser):
    from .ast import RecordStmt

    name = p.expect(IDENT).text
    labels: dict[str, str] = {}
    if p.peek().kind == "{":
        labels = _parse_label_set(p)
    p.expect("=")
    expr = p.parse_binary(0)
    return RecordStmt(name=name, labels=labels, expr=expr)


def _parse_alert_stmt(p: Parser):
    from .ast import AlertStmt
    from .lexer import parse_duration_ms

    p.next()  # 'alert'
    name = p.expect(IDENT).text
    if not p.accept_keyword("if"):
        raise PromQLSyntaxError("expected 'IF' in alert statement")
    expr = p.parse_binary(0)
    duration_ms = 0
    if p.accept_keyword("for"):
        duration_ms = parse_duration_ms(p.expect(DURATION).text)
    labels: dict[str, str] = {}
    annotations: dict[str, str] = {}
    if p.accept_keyword("labels"):
        labels = _parse_label_set(p)
    if p.accept_keyword("annotations"):
        annotations = _parse_label_set(p)
    return AlertStmt(
        name=name,
        expr=expr,
        duration_ms=duration_ms,
        labels=labels,
        annotations=annotations,
    )


def parse_metric_selector(src: str) -> list[LabelMatcher]:
    """Parse a bare series selector (used by the /series API path,
    reference ``promql/parse.go:79-90``)."""
    e = Parser(src).parse_expr()
    inner = e
    while isinstance(inner, ParenExpr):
        inner = inner.expr
    if not isinstance(inner, VectorSelector) or inner.offset_ms:
        raise PromQLSyntaxError("expected a metric selector")
    return inner.matchers


__all__ = [
    "parse",
    "parse_rules",
    "parse_metric_selector",
    "Parser",
    "PromQLSyntaxError",
    "walk",
]
