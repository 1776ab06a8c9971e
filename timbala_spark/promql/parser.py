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
    go_quote,
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

# `and`/`or`/`unless` are operator items in the reference lexer, not
# keywords (lex.go itemLAND..itemLUnless in the operator range), so
# their item desc is <op:and>, not <and>
_WORD_OPS = {"and", "or", "unless"}


def format_parse_error(src: str, pos0: int, leaf: str) -> PromQLSyntaxError:
    """Wrap a leaf message exactly like ``ParseErr.Error``
    (``parse.go:46-51``): ``parse error at char N: <leaf>`` with the
    1-based position computed from the offending token's start offset
    (``lex.go:399-411`` lineNumber/linePosition — including its
    off-by-one flavor for lines after the first), and the line form
    only when the trimmed input spans multiple lines."""
    line = 1 + src[:pos0].count("\n")
    lb = src[:pos0].rfind("\n")
    char = 1 + pos0 if lb == -1 else 1 + pos0 - lb
    if src.strip().count("\n") == 0:
        msg = f"parse error at char {char}: {leaf}"
    else:
        msg = f"parse error at line {line}, char {char}: {leaf}"
    e = PromQLSyntaxError(msg)
    e.formatted = True
    e.leaf = leaf
    e.char = char
    e.line = line
    return e


def _tok_desc(t: Token) -> str:
    """``item.desc()`` (lex.go:31-48, 284-291): how an unexpected
    token prints inside an error message."""
    if t.kind == EOF:
        return "end of input"
    if t.kind == IDENT:
        if t.text in AGGREGATORS:
            return f"<aggr:{t.text}>"
        if t.text in _WORD_OPS:
            return f"<op:{t.text}>"
        if t.text in KEYWORDS:
            return f"<{t.text}>"
        return f"identifier {go_quote(t.text)}"
    if t.kind in (NUMBER, DURATION, STRING):
        base = {NUMBER: "number", DURATION: "duration", STRING: "string"}[
            t.kind
        ]
        val = t.raw if (t.kind == STRING and t.raw is not None) else t.text
        s = go_quote(val) if len(val) <= 10 else go_quote(val[:10]) + "..."
        return f"{base} {s}"
    if t.kind in ("(", ")", "{", "}", "[", "]", ","):
        return go_quote(t.text)
    return f"<op:{t.text}>"  # operator kinds (incl. `=` as itemEQL)


_OPERATOR_KINDS = {
    "==", "!=", "<=", ">=", "=~", "!~", "<", ">", "=",
    "+", "-", "*", "/", "%", "^",
}


def _type_str(t: Token) -> str:
    """Go ``%s`` of an itemTYPE (lex.go:276-281): the bare symbol or
    word for items with a default string form; value-carrying items
    (identifier/number/...) have none and Go prints an internal
    ``<item N>`` — we substitute the readable kind name."""
    if t.kind == IDENT:
        if (
            t.text in _WORD_OPS
            or t.text in KEYWORDS
            or t.text in AGGREGATORS
        ):
            return t.text
        return "<item identifier>"
    if t.kind in (NUMBER, DURATION, STRING, EOF):
        return f"<item {_kind_desc(t.kind)}>"
    return t.kind


def _kind_desc(kind: str) -> str:
    """``itemType.desc()`` (lex.go:294-313): how an EXPECTED token
    kind prints."""
    if kind == IDENT:
        return "identifier"
    if kind == STRING:
        return "string"
    if kind == NUMBER:
        return "number"
    if kind == DURATION:
        return "duration"
    if kind == EOF:
        return "end of input"
    return go_quote(kind)


class Parser:
    def __init__(self, src: str):
        self.src = src
        #: index of the furthest token ever examined — the analog of
        #: the reference lexer's ``lastPos`` (position of the most
        #: recently lexed item), which is what EVERY parse error
        #: reports (parse.go:304-314)
        self.max_scanned = 0
        try:
            self.toks = tokenize(src)
        except PromQLSyntaxError as e:
            raise format_parse_error(
                src, getattr(e, "char_pos", 0), str(e)
            ) from None
        self.pos = 0

    # -- errors --------------------------------------------------------
    def error(self, leaf: str):
        """Raise ``leaf`` wrapped with the current lastPos-equivalent
        position, exactly like ``p.errorf`` (parse.go:299-314)."""
        i = min(self.max_scanned, len(self.toks) - 1)
        raise format_parse_error(self.src, self.toks[i].pos, leaf) from None

    # -- token helpers -------------------------------------------------
    def _mark(self) -> None:
        if self.pos > self.max_scanned:
            self.max_scanned = self.pos

    def look(self, k: int) -> Token:
        """Lookahead that records the scan position like the
        reference's buffered ``p.peek`` does (it lexes the item, so
        ``lastPos`` advances to it)."""
        i = min(self.pos + k, len(self.toks) - 1)
        if i > self.max_scanned:
            self.max_scanned = i
        return self.toks[i]

    def peek(self) -> Token:
        self._mark()
        return self.toks[self.pos]

    def next(self) -> Token:
        self._mark()
        t = self.toks[self.pos]
        if t.kind != EOF:
            self.pos += 1
        return t

    def expect(self, kind: str, ctx: str = "expression") -> Token:
        t = self.peek()
        if t.kind != kind:
            self.error(
                f"unexpected {_tok_desc(t)} in {ctx}, "
                f"expected {_kind_desc(kind)}"
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
        try:
            if self.peek().kind == EOF:  # parse.go:152
                self.error("no expression found in input")
            e = self.parse_binary(0)
            t = self.peek()
            if t.kind != EOF:
                rest = self.src[t.pos :]
                self.error(
                    "could not parse remaining input "
                    f"{go_quote(rest[:15])}..."
                )
            typecheck(e)
            return e
        except PromQLSyntaxError as err:
            if getattr(err, "formatted", False):
                raise
            self.error(str(err))  # leaf from typecheck/duration/matcher

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
            t2 = self.peek()
            if t2.kind == IDENT and t2.text == "bool":
                # parse-time check like the reference (parse.go:468):
                # the error reports at the `bool` token, before the
                # modifier is consumed
                if op not in COMPARISON_OPS:
                    self.error(
                        "bool modifier can only be used on comparison "
                        "operators"
                    )
                self.next()
                return_bool = True
            matching = self.parse_matching()
            nxt = PRECEDENCE[op] if op in RIGHT_ASSOC else PRECEDENCE[op] + 1
            rhs = self.parse_binary(nxt)
            if (
                op in COMPARISON_OPS
                and not return_bool
                and lhs.type == ValueType.SCALAR
                and rhs.type == ValueType.SCALAR
            ):
                # balance()-time check (parse.go:530-532) — fires while
                # parsing, so the position is the token after the rhs
                self.error("comparisons between scalars must use BOOL modifier")
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
                    self.error(  # %q quoting (parse.go:501)
                        f"label {go_quote(sorted(dup)[0])} must not occur "
                        "in ON and GROUP clause at once"
                    )
        return matching

    def parse_label_list(self) -> list[str]:
        # `labels()` (parse.go:679-700): ctx "grouping opts"; any
        # token is consumed then validated with isLabel, producing
        # "unexpected ... expected label" (not the expect() wording)
        ctx = "grouping opts"
        self.expect(LPAREN, ctx)
        labels: list[str] = []
        if self.peek().kind != RPAREN:
            while True:
                t = self.next()
                if t.kind != IDENT or ":" in t.text:
                    self.error(
                        f"unexpected {_tok_desc(t)} in {ctx}, expected label"
                    )
                labels.append(t.text)
                if not self.accept(COMMA):
                    break
        self.expect(RPAREN, ctx)
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
                self.error(
                    "range specification must be preceded by a metric "
                    f"selector, but follows a *promql.{type(e).__name__} "
                    "instead"
                )
            self.next()
            # duration validated BEFORE the closing bracket is
            # expected (rangeSelector, parse.go:602-614) so a bad
            # duration reports at the duration token
            d = self.expect(DURATION, "range selector")
            range_ms = parse_duration_ms(d.text)
            self.expect(RBRACKET, "range selector")
            e = MatrixSelector(e.name, e.matchers, range_ms=range_ms)
        if self.peek().kind == IDENT and self.peek().text == "offset":
            self.next()
            d = self.expect(DURATION, "offset")
            off = parse_duration_ms(d.text)
            if isinstance(e, (VectorSelector, MatrixSelector)):
                e.offset_ms = off
            else:
                self.error(
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
                # an expression (lex.go:201-234) — primaryExpr's
                # default case (parse.go:670); a metric by that name is
                # only reachable via {__name__="on"}
                self.error("no valid expression found")
            if self.look(1).kind == LPAREN:
                # the reference treats ident+'(' unconditionally as a
                # call (parse.go primaryExpr → call), so a name missing
                # from the registry is "unknown function" — reported at
                # the '(' (the most recently lexed item)
                if get_function(t.text) is None:
                    self.error(f"unknown function with name {go_quote(t.text)}")
                return self.parse_call()
            self.next()
            return self.parse_selector(t.text)
        self.error("no valid expression found")

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
        self.expect(LPAREN, "aggregation")
        param = None
        if op in AGGREGATORS_WITH_PARAM:
            param = self.parse_binary(0)
            self.expect(COMMA, "aggregation")
        e = self.parse_binary(0)
        self.expect(RPAREN, "aggregation")
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
        self.expect(LPAREN, "function call")
        args: list[Expr] = []
        if self.peek().kind != RPAREN:
            while True:
                args.append(self.parse_binary(0))
                if not self.accept(COMMA):
                    break
        self.expect(RPAREN, "function call")
        # arity is validated in the TYPECHECK pass (checkType,
        # parse.go:1081-1095), not here — so arity errors report at
        # the end-of-input position like the reference's
        return Call(fn, args)

    # -- selectors (parse.go:596-622, 814-894) --------------------------
    def parse_selector(self, name: str | None) -> Expr:
        matchers: list[LabelMatcher] = []
        ctx = "label matching"
        if self.peek().kind == LBRACE:
            self.next()
            if self.peek().kind != RBRACE:
                while True:
                    # Keywords already lex as IDENT; anything else is
                    # the expect() wording (labelMatchers,
                    # parse.go:828): "unexpected ... in label
                    # matching, expected identifier"
                    lname = self.expect(IDENT, ctx).text
                    opt = self.next()
                    is_op = opt.kind in _OPERATOR_KINDS or (
                        opt.kind == IDENT and opt.text in _WORD_OPS
                    )
                    if not is_op:
                        # parse.go:831-832 prints the itemTYPE's plain
                        # string (symbol for symbolic items); for
                        # value-carrying items Go prints an internal
                        # <item N> — we print the nearest readable form
                        self.error(
                            "expected label matching operator but got "
                            f"{_type_str(opt)}"
                        )
                    if opt.kind not in _MATCH_TYPES:
                        # parse.go:838-840
                        self.error(
                            'operator must be one of ["=" "!=" "=~" "!~"], '
                            f'is "{opt.text}"'
                        )
                    val = self.expect(STRING, ctx)
                    matchers.append(
                        LabelMatcher(_MATCH_TYPES[opt.kind], lname, val.text)
                    )
                    # identifier directly after a matcher: the comma is
                    # missing (parse.go:868-870, checked BEFORE the
                    # comma/terminator decision)
                    if self.peek().kind == IDENT:
                        self.error(
                            "missing comma before next identifier "
                            f"{go_quote(self.peek().text)}"
                        )
                    if not self.accept(COMMA):
                        break
                    if self.peek().kind == RBRACE:
                        break
            self.expect(RBRACE, ctx)
        if name is not None:
            for m in matchers:
                if m.name == METRIC_NAME_LABEL:
                    self.error(  # %q quoting (parse.go:949)
                        f"metric name must not be set twice: "
                        f"{go_quote(name)} or {go_quote(m.value)}"
                    )
            matchers.append(
                LabelMatcher(MatchType.EQ, METRIC_NAME_LABEL, name)
            )
        if not matchers:
            self.error(
                "vector selector must contain label matchers or metric name"
            )
        # at least one matcher must not match the empty string
        # (parse.go:879-894)
        if all(m.matches_empty() for m in matchers):
            self.error(
                "vector selector must contain at least one non-empty matcher"
            )
        return VectorSelector(name, matchers)


# -- typecheck (parse.go:984-1121) --------------------------------------


def _expect_type(e: Expr, want: ValueType, context: str) -> None:
    """``expectType`` (parse.go:984-989): wording and documentedType
    names come straight from the reference (our ValueType values ARE
    the documented forms — "instant vector", "range vector", ...)."""
    typecheck(e)
    if e.type != want:
        raise PromQLSyntaxError(
            f"expected type {want.value} in {context}, got {e.type.value}"
        )


def typecheck(e: Expr) -> None:
    """``checkType`` (parse.go:996-1121) — messages verbatim, raised
    as leaf errors; the parser entry points wrap them with the
    end-of-input position, exactly where the reference's typecheck
    pass reports (the lexer is exhausted by then)."""
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
                f"set operator {go_quote(e.op)} not allowed in binary scalar "
                "expression"
            )
        if (lt != ValueType.VECTOR or rt != ValueType.VECTOR) and (
            e.matching is not None
        ):
            # parse.go:1062-1067: explicit matching labels with a
            # non-vector operand error; a bare on()/group modifier is
            # silently dropped
            if e.matching.matching_labels:
                raise PromQLSyntaxError(
                    "vector matching only allowed between instant vectors"
                )
            e.matching = None
        elif e.matching is not None and e.op in SET_OPS:
            # parse.go:1069-1075 — %q of the operator item
            if e.matching.card in (
                VectorMatchCardinality.MANY_TO_ONE,
                VectorMatchCardinality.ONE_TO_MANY,
            ):
                raise PromQLSyntaxError(
                    f'no grouping allowed for "{e.op}" operation'
                )
            # the reference parser pre-sets many-to-many for set ops;
            # ours defaults the card at construction, so normalize here
            e.matching.card = VectorMatchCardinality.MANY_TO_MANY
    elif isinstance(e, UnaryExpr):
        typecheck(e.expr)
        if e.expr.type not in (ValueType.SCALAR, ValueType.VECTOR):
            raise PromQLSyntaxError(
                "unary expression only allowed on expressions of type "
                f'scalar or instant vector, got "{e.expr.type.value}"'
            )
    elif isinstance(e, ParenExpr):
        typecheck(e.expr)
    elif isinstance(e, AggregateExpr):
        _expect_type(e.expr, ValueType.VECTOR, "aggregation expression")
        if e.param is not None:
            want = (
                ValueType.STRING if e.op == "count_values" else ValueType.SCALAR
            )
            _expect_type(e.param, want, "aggregation parameter")
    elif isinstance(e, Call):
        # arity first (checkType, parse.go:1081-1095): Variadic==0 is
        # exact; our optional=k maps to Go Variadic=k (bounded tail),
        # variadic=True to Variadic=-1 (unbounded)
        fn = e.func
        nargs = len(fn.arg_types)
        got = len(e.args)
        if not fn.variadic and fn.optional == 0:
            if nargs != got:
                raise PromQLSyntaxError(
                    f"expected {nargs} argument(s) in call to "
                    f"{go_quote(fn.name)}, got {got}"
                )
        else:
            na = nargs - 1
            if na > got:
                raise PromQLSyntaxError(
                    f"expected at least {na} argument(s) in call to "
                    f"{go_quote(fn.name)}, got {got}"
                )
            elif not fn.variadic and na + fn.optional < got:
                raise PromQLSyntaxError(
                    f"expected at most {na + fn.optional} argument(s) in "
                    f"call to {go_quote(fn.name)}, got {got}"
                )
        n_fixed = len(fn.arg_types)
        for i, a in enumerate(e.args):
            want = fn.arg_types[min(i, n_fixed - 1)]
            _expect_type(
                a, want, f"call to function {go_quote(fn.name)}"
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
    try:
        stmts: list = []
        while p.peek().kind != EOF:
            t = p.peek()
            if t.kind != IDENT:
                p.error("no valid statement detected")  # parse.go:366
            if t.text == "alert":
                stmts.append(_parse_alert_stmt(p))
            else:
                stmts.append(_parse_record_stmt(p))
        for s in stmts:
            if isinstance(s, AlertStmt):
                # checkType *AlertStmt (parse.go:1017): expectType
                # against the alert-statement context
                _expect_type(s.expr, ValueType.VECTOR, "alert statement")
            else:
                ty = s.expr.type
                typecheck(s.expr)
                if ty not in (ValueType.VECTOR, ValueType.SCALAR):
                    # checkType *RecordStmt (parse.go:1025-1028)
                    raise PromQLSyntaxError(
                        "record statement must have a valid expression "
                        f"of type instant vector or scalar but got "
                        f"{ty.value}"
                    )
        return stmts
    except PromQLSyntaxError as err:
        if getattr(err, "formatted", False):
            raise
        p.error(str(err))


def _parse_label_set(p: Parser) -> dict[str, str]:
    """``{name="value", ...}`` — equality pairs only (labelSet,
    parse.go:556-580)."""
    ctx = "label matching"
    p.expect("{", ctx)
    out: dict[str, str] = {}
    while p.peek().kind != "}":
        name = p.expect(IDENT, ctx)
        if ":" in name.text:
            p.error(f"invalid label name {go_quote(name.text)}")
        t = p.peek()
        if t.kind in _OPERATOR_KINDS and t.kind != "=":
            # labelSet routes through labelMatchers(itemEQL)
            # (parse.go:800-806): a non-= matcher operator errors with
            # the allowed-set wording
            p.next()
            p.error(f'operator must be one of ["="], is "{t.text}"')
        p.expect("=", ctx)
        val = p.expect(STRING, ctx)
        if name.text in out:
            p.error(f"duplicate label {go_quote(name.text)}")
        out[name.text] = val.text
        if not p.accept(","):
            break
    p.expect("}", ctx)
    return out


def _parse_record_stmt(p: Parser):
    from .ast import RecordStmt

    ctx = "record statement"
    name = p.expect(IDENT, ctx).text
    labels: dict[str, str] = {}
    if p.peek().kind == "{":
        labels = _parse_label_set(p)
    p.expect("=", ctx)
    expr = p.parse_binary(0)
    return RecordStmt(name=name, labels=labels, expr=expr)


def _parse_alert_stmt(p: Parser):
    from .ast import AlertStmt
    from .lexer import parse_duration_ms

    ctx = "alert statement"
    p.next()  # 'alert'
    name = p.expect(IDENT, ctx).text
    if not p.accept_keyword("if"):
        # p.expect(itemIf, ctx) wording (parse.go:381)
        p.error(
            f'unexpected {_tok_desc(p.peek())} in {ctx}, expected "if"'
        )
    expr = p.parse_binary(0)
    duration_ms = 0
    if p.accept_keyword("for"):
        duration_ms = parse_duration_ms(p.expect(DURATION, ctx).text)
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
