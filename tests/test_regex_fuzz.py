"""Regex dialect fuzz: the Java regex the engine matches with must
agree with Go RE2 on the pattern subset PromQL users write.

The engine anchors matchers as ``^(?:re2_to_host(p))$`` and evaluates
them with java.util.regex (`compiler._anchored`, rlike); the reference
anchors the raw pattern with Go RE2 (``pkg/labels/matcher.go:62``).
There is no Go here, so the oracle is Python's ``re.fullmatch`` over
``re2_to_host(p, "python")`` — on the generated subset (literals,
escaped metacharacters, ``.``, bracket classes incl. POSIX names,
quantifiers incl. non-greedy and bounded repetition, alternation,
groups incl. named, anchors) RE2, PCRE/Python, and java.util.regex
document identical semantics, so any THREE-way divergence the fuzz
can see is a translation bug in ``promql/re2.py`` or an anchoring bug
in the compiler.

All (pattern, subject) pairs are evaluated in ONE Spark job — subject
RLIKE pattern with a per-row pattern column — so the gate stays cheap.
"""

from __future__ import annotations

import random
import re as pyre

import pytest
from pyspark.sql import functions as F

from timbala_spark.compiler import _anchored
from timbala_spark.promql.re2 import re2_to_host

ATOMS = [
    "a", "b", "z", "0", "9", "_", "-", ".", r"\.", r"\d", r"\w", r"\s",
    "[abc]", "[^abc]", "[a-f0-9]", "[[:digit:]]", "[[:alpha:]x]",
    r"\(", r"\)", r"\[", "(?P<g1>ab)", "(ab|cd)", "x|y",
]
QUANTS = ["", "", "*", "+", "?", "{2}", "{1,3}", "*?", "+?"]


def gen_pattern(rng: random.Random) -> str:
    parts = []
    for _ in range(rng.randrange(1, 5)):
        atom = rng.choice(ATOMS)
        q = rng.choice(QUANTS)
        if q and (atom in ("x|y",) or atom.startswith("\\(")):
            q = ""  # avoid quantifying a bare alternation / escape pair
        if q and "|" in atom and not atom.startswith("("):
            q = ""
        parts.append(atom + q)
    p = "".join(parts)
    if rng.random() < 0.2:
        p = f"({p})|({rng.choice(['ab', 'x.z', '[0-9]+'])})"
    return p


def gen_subject(rng: random.Random) -> str:
    alphabet = "abczxy019_-. ()[]"
    return "".join(
        rng.choice(alphabet) for _ in range(rng.randrange(0, 7))
    )


def test_java_matching_agrees_with_python_re2_translation(spark):
    rng = random.Random(20260815)
    rows = []
    for _ in range(120):
        p = gen_pattern(rng)
        try:  # the oracle must itself accept the translated pattern
            pc = pyre.compile(re2_to_host(p, "python"))
        except pyre.error:
            continue
        for _ in range(25):
            s = gen_subject(rng)
            rows.append((p, _anchored(p), s, pc.fullmatch(s) is not None))
    assert len(rows) > 2000
    df = spark.createDataFrame(
        rows, "pattern string, anchored string, subject string, want boolean"
    )
    got = (
        df.withColumn("got", F.expr("subject RLIKE anchored"))
        .filter(F.col("got") != F.col("want"))
        .collect()
    )
    assert not got, [
        (r["pattern"], r["subject"], r["want"], r["got"]) for r in got[:10]
    ]
