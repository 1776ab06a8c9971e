"""RE2 → host-regex dialect translation.

The reference matches label regexes with Go's RE2
(``pkg/labels/matcher.go:62``, fully anchored). Spark ``rlike`` uses
``java.util.regex`` and the parser's empty-match analysis uses Python
``re`` — both reject RE2's POSIX character classes
(``[[:alpha:]]`` etc.), which is the one place valid reference
queries would break (SURVEY §7.8 risk 3; RE2's remaining surface —
no backreferences, no lookaround — is a strict subset of both hosts).
"""

from __future__ import annotations

import re

#: POSIX class name → character-class body understood by Java and
#: Python alike.
POSIX_CLASSES = {
    "alnum": "a-zA-Z0-9",
    "alpha": "a-zA-Z",
    "ascii": "\\x00-\\x7f",
    "blank": " \\t",
    "cntrl": "\\x00-\\x1f\\x7f",
    "digit": "0-9",
    "graph": "\\x21-\\x7e",
    "lower": "a-z",
    "print": "\\x20-\\x7e",
    "punct": "!-/:-@\\[-`{-~",
    "space": " \\t\\n\\x0b\\f\\r",
    "upper": "A-Z",
    "word": "a-zA-Z0-9_",
    "xdigit": "0-9a-fA-F",
}

_POSIX_RE = re.compile(r"\[:(\^?)(" + "|".join(POSIX_CLASSES) + r"):\]")


def re2_to_host(regex: str, dialect: str = "java") -> str:
    """Expand ``[:class:]`` occurrences (valid only inside bracket
    expressions, where the expansion is a plain range list). Negated
    classes (``[:^digit:]``) use RE2-only semantics with no direct
    host form and are left for the host to reject explicitly.

    ``dialect="java"`` additionally rewrites RE2/Python-style named
    groups ``(?P<name>...)`` to plain capturing groups ``(...)`` — Java
    rejects the ``P`` form outright, and also rejects RE2-legal group
    names containing ``_``; dropping the name keeps group *numbering*
    (and thus match semantics and ``regexp_extract`` indices) identical,
    and PromQL never reads group names from matchers. The scan tracks
    backslash-escape parity and character-class state properly, so
    ``\\\\(?P<x>...)`` (escaped backslash, then a real group) is
    rewritten while ``\\(?P<x>`` (escaped paren) and class-internal
    literals are not. ``dialect="python"`` leaves them (Python only
    accepts the ``P`` form)."""

    def sub(m: re.Match[str]) -> str:
        if m.group(1):
            raise ValueError(
                f"negated POSIX class [:^{m.group(2)}:] is not supported"
            )
        return POSIX_CLASSES[m.group(2)]

    out = _POSIX_RE.sub(sub, regex)
    if dialect == "java":
        out = _strip_group_names(out)
    return out


_NAME_RE = re.compile(r"[A-Za-z0-9_]+")


def _strip_group_names(regex: str) -> str:
    """Replace every real ``(?P<name>`` group opener with ``(``."""
    out: list[str] = []
    i, n = 0, len(regex)
    in_class = False
    class_start = -1
    while i < n:
        c = regex[i]
        if c == "\\":
            out.append(regex[i : i + 2])
            i += 2
            continue
        if in_class:
            # `]` is a literal immediately after `[` or `[^`
            if c == "]" and i > class_start + (
                2 if regex[class_start + 1 : class_start + 2] == "^" else 1
            ):
                in_class = False
            out.append(c)
            i += 1
            continue
        if c == "[":
            in_class = True
            class_start = i
            out.append(c)
            i += 1
            continue
        if regex.startswith("(?P<", i):
            m = _NAME_RE.match(regex, i + 4)
            if m and regex[m.end() : m.end() + 1] == ">":
                out.append("(")
                i = m.end() + 1
                continue
        out.append(c)
        i += 1
    return "".join(out)
