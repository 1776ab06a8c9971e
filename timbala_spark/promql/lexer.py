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
    """A PromQL parse error.

    Leaf messages match the vendored engine's wordings; the parser
    entry points wrap them as ``parse error at char N: <leaf>``
    (``parse.go:46-51`` ParseErr.Error), carrying attributes
    ``formatted`` (wrapper applied), ``leaf`` (unwrapped message) and
    ``char`` (1-based position, Go ``lex.go:399-411`` semantics).
    Lexer-level raises attach ``char_pos`` (0-based offset of the
    offending token start) for the parser to format."""


def go_quote(s: str) -> str:
    """Go ``%q`` for strings: double-quoted with backslash escapes
    (``strconv.Quote``). Covers the escapes reachable through PromQL
    error messages; non-printables use ``\\x`` like Go."""
    out = ['"']
    for ch in s:
        if ch == '"':
            out.append('\\"')
        elif ch == "\\":
            out.append("\\\\")
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\t":
            out.append("\\t")
        elif ch == "\r":
            out.append("\\r")
        elif " " <= ch <= "~":
            out.append(ch)
        else:
            o = ord(ch)
            out.append(f"\\x{o:02x}" if o < 0x100 else f"\\u{o:04x}")
    out.append('"')
    return "".join(out)


def _err(msg: str, pos: int) -> PromQLSyntaxError:
    e = PromQLSyntaxError(msg)
    e.char_pos = pos
    return e


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
        raise PromQLSyntaxError(f"not a valid duration string: {go_quote(s)}")
    total = int(m.group(1)) * _DUR_UNIT_MS[m.group(2)]
    if total == 0:
        raise PromQLSyntaxError("duration must be greater than 0")
    return total


@dataclass
class Token:
    kind: str
    text: str
    pos: int
    raw: str | None = None  # STRING tokens: source text incl. quotes

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


def _go_rune(ch: str) -> str:
    # Go's %#U verb: "U+0071 'q'" (char shown when printable)
    o = ord(ch)
    s = f"U+{o:04X}"
    return f"{s} {ch!r}" if ch.isprintable() else s


def _unquote(s: str, pos: int) -> str:
    """Decode one lexed string literal. Error wordings match the
    reference lexer's escape scanner (``lex.go:660-690``) — escapes
    are validated at LEX time there, so these surface with the string
    token's position."""
    quote = s[0]
    if quote == "`":
        if not s.endswith("`") or len(s) < 2:
            raise _err("unterminated raw string", pos)
        return s[1:-1]
    out = []
    i = 1

    def hexpart(start: int, width: int) -> str:
        part = s[start : start + width]
        if len(part) < width or start + width > len(s) - 1:
            raise _err("escape sequence not terminated", pos)
        for ch in part:
            if ch not in "0123456789abcdefABCDEF":
                raise _err(
                    f"illegal character {_go_rune(ch)} in escape sequence", pos
                )
        return part

    while i < len(s) - 1:
        c = s[i]
        if c == "\\":
            i += 1
            if i >= len(s) - 1:
                raise _err("escape sequence not terminated", pos)
            e = s[i]
            if e in _ESCAPES:
                out.append(_ESCAPES[e])
                i += 1
            elif e == "x":
                out.append(chr(int(hexpart(i + 1, 2), 16)))
                i += 3
            elif e in "01234567":
                part = s[i : i + 3]
                if len(part) < 3 or i + 3 > len(s) - 1:
                    raise _err("escape sequence not terminated", pos)
                for ch in part:
                    if ch not in "01234567":
                        raise _err(
                            f"illegal character {_go_rune(ch)} in escape "
                            "sequence",
                            pos,
                        )
                v = int(part, 8)
                if v > 0xFF:
                    raise _err(
                        "escape sequence is an invalid Unicode code point", pos
                    )
                out.append(chr(v))
                i += 3
            elif e == "u":
                out.append(chr(int(hexpart(i + 1, 4), 16)))
                i += 5
            elif e == "U":
                v = int(hexpart(i + 1, 8), 16)
                if v > 0x10FFFF:
                    raise _err(
                        "escape sequence is an invalid Unicode code point", pos
                    )
                out.append(chr(v))
                i += 9
            else:
                raise _err(f"unknown escape sequence {_go_rune(e)}", pos)
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
                raise _err(
                    "unterminated raw string"
                    if c == "`"
                    else "unterminated quoted string",
                    i,
                )
            raw = src[i : j + 1]
            toks.append(Token(STRING, _unquote(raw, i), i, raw=raw))
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
        raise _err(f"unexpected character: {c!r}", i)
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
