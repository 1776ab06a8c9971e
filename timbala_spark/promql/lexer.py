"""Hand-written PromQL lexer.

Re-implements the token surface of the reference's state-machine lexer
(``vendor/.../prometheus/promql/lex.go``): numbers incl. hex/inf/nan
(``lex.go:272-274``), durations, three string syntaxes, operators with
the precedence table consumed by the parser (``lex.go:95-122``), and
keywords (``lex.go:168-218``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass


class PromQLSyntaxError(ValueError):
    pass


# token kinds
NUMBER = "NUMBER"
DURATION = "DURATION"
STRING = "STRING"
IDENT = "IDENT"  # includes metric identifiers with ':'
LPAREN, RPAREN = "(", ")"
LBRACE, RBRACE = "{", "}"
LBRACKET, RBRACKET = "[", "]"
COMMA = ","
EOF = "EOF"

OPERATORS = [
    "==",
    "!=",
    "<=",
    ">=",
    "=~",
    "!~",
    "<",
    ">",
    "=",
    "+",
    "-",
    "*",
    "/",
    "%",
    "^",
]

KEYWORDS = {
    "and",
    "or",
    "unless",
    "by",
    "without",
    "on",
    "ignoring",
    "group_left",
    "group_right",
    "offset",
    "bool",
    # rule-statement keywords (lex.go:220-226) — case-folded like the
    # rest; the reference rejects these as metric names in queries too
    "alert",
    "if",
    "for",
    "labels",
    "annotations",
    # aggregators are keywords in the reference lexer (lex.go:168-181)
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

_DUR_RE = re.compile(r"(?:[0-9]+(?:ms|[smhdwy]))+")
_NUM_RE = re.compile(
    r"0[xX][0-9a-fA-F]+|[0-9]+\.?[0-9]*(?:[eE][+-]?[0-9]+)?|\.[0-9]+(?:[eE][+-]?[0-9]+)?"
)
_IDENT_RE = re.compile(r"[a-zA-Z_][a-zA-Z0-9_]*")
_METRIC_IDENT_RE = re.compile(r"[a-zA-Z_:][a-zA-Z0-9_:]*")

_DUR_UNIT_MS = {
    "ms": 1,
    "s": 1000,
    "m": 60 * 1000,
    "h": 60 * 60 * 1000,
    "d": 24 * 60 * 60 * 1000,
    "w": 7 * 24 * 60 * 60 * 1000,
    "y": 365 * 24 * 60 * 60 * 1000,
}


_SINGLE_DUR_RE = re.compile(r"([0-9]+)(ms|[smhdwy])")


def parse_duration_ms(s: str) -> int:
    """Duration string → milliseconds.

    The vendored ``model.ParseDuration`` regex is a SINGLE
    ``<integer><unit>`` group (``^([0-9]+)(y|w|d|h|m|s|ms)$``,
    common/model/time.go:178) and the promql parser routes every query
    duration through it (``parse.go:1131-1139``), so compound forms
    like ``1m30s`` are syntax errors — the lexer still consumes them
    as one token so the error is a clean "not a valid duration" rather
    than trailing-input noise."""
    m = _SINGLE_DUR_RE.fullmatch(s)
    if not m:
        raise PromQLSyntaxError(f"not a valid duration string: {s!r}")
    total = int(m.group(1)) * _DUR_UNIT_MS[m.group(2)]
    if total == 0:
        raise PromQLSyntaxError(f"duration must be greater than 0: {s!r}")
    return total


@dataclass
class Token:
    kind: str
    text: str
    pos: int

    def __repr__(self):  # pragma: no cover
        return f"Token({self.kind}, {self.text!r})"


_ESCAPES = {
    "a": "\a",
    "b": "\b",
    "f": "\f",
    "n": "\n",
    "r": "\r",
    "t": "\t",
    "v": "\v",
    "\\": "\\",
    "'": "'",
    '"': '"',
}


def _unquote(s: str, pos: int) -> str:
    quote = s[0]
    if quote == "`":
        if not s.endswith("`") or len(s) < 2:
            raise PromQLSyntaxError(f"unterminated raw string at {pos}")
        return s[1:-1]
    out = []
    i = 1
    while i < len(s) - 1:
        c = s[i]
        if c == "\\":
            i += 1
            if i >= len(s) - 1:
                raise PromQLSyntaxError(f"bad escape at {pos}")
            e = s[i]
            if e in _ESCAPES:
                out.append(_ESCAPES[e])
                i += 1
            elif e == "x":
                out.append(chr(int(s[i + 1 : i + 3], 16)))
                i += 3
            elif e in "01234567":
                out.append(chr(int(s[i : i + 3], 8)))
                i += 3
            elif e == "u":
                out.append(chr(int(s[i + 1 : i + 5], 16)))
                i += 5
            elif e == "U":
                out.append(chr(int(s[i + 1 : i + 9], 16)))
                i += 9
            else:
                raise PromQLSyntaxError(f"unknown escape \\{e} at {pos}")
        else:
            out.append(c)
            i += 1
    return "".join(out)


def tokenize(src: str) -> list[Token]:
    toks: list[Token] = []
    i, n = 0, len(src)
    brace_depth = 0
    while i < n:
        c = src[i]
        if c in " \t\r\n":
            i += 1
            continue
        if c == "#":  # comment to end of line
            while i < n and src[i] != "\n":
                i += 1
            continue
        if c in "(){}[],":
            if c == "{":
                brace_depth += 1
            elif c == "}":
                brace_depth = max(brace_depth - 1, 0)
            toks.append(Token(c, c, i))
            i += 1
            continue
        if c in "\"'`":
            j = i + 1
            if c == "`":
                while j < n and src[j] != "`":
                    j += 1
            else:
                while j < n and src[j] != c:
                    if src[j] == "\\":
                        j += 1
                    j += 1
            if j >= n:
                raise PromQLSyntaxError(f"unterminated string at {i}")
            raw = src[i : j + 1]
            toks.append(Token(STRING, _unquote(raw, i), i))
            i = j + 1
            continue
        # durations before numbers: `5m` must lex as one token
        m = _DUR_RE.match(src, i)
        if m and c.isdigit():
            nxt = m.end()
            # not a duration if followed by ident chars (e.g. `5ms_x`?)
            if nxt >= n or not (src[nxt].isalnum() or src[nxt] == "_" or src[nxt] == ":"):
                toks.append(Token(DURATION, m.group(0), i))
                i = nxt
                continue
        m = _NUM_RE.match(src, i)
        if m and (c.isdigit() or c == "."):
            toks.append(Token(NUMBER, m.group(0), i))
            i = m.end()
            continue
        m = _METRIC_IDENT_RE.match(src, i)
        if m:
            text = m.group(0)
            # `inf`/`nan` are number literals at the lexer level
            # (lex.go:272-274), never identifiers.
            kind = NUMBER if text.lower() in ("inf", "nan") else IDENT
            # keywords are case-insensitive OUTSIDE braces
            # (lexKeywordOrIdentifier does strings.ToLower before the
            # key lookup, lex.go:853; lexIdentifier inside braces does
            # not, lex.go:832-839) — canonicalize to lowercase so the
            # parser's keyword comparisons match `SUM BY` / `OFFSET`
            if (
                kind == IDENT
                and brace_depth == 0
                and text.lower() in KEYWORDS
            ):
                text = text.lower()
            toks.append(Token(kind, text, i))
            i = m.end()
            continue
        matched = False
        for op in OPERATORS:
            if src.startswith(op, i):
                toks.append(Token(op, op, i))
                i += len(op)
                matched = True
                break
        if matched:
            continue
        raise PromQLSyntaxError(f"unexpected character {c!r} at position {i}")
    toks.append(Token(EOF, "", n))
    return toks


def number_value(text: str) -> float:
    low = text.lower()
    if low.startswith("0x"):
        return float(int(text, 16))
    if low in ("inf", "+inf"):
        return float("inf")
    if low == "-inf":
        return float("-inf")
    if low == "nan":
        return float("nan")
    return float(text)
