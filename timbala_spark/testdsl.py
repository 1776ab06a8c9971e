"""Golden-test DSL harness.

Re-implements the reference's PromQL test-script interpreter
(``vendor/.../promql/test.go:33-543``): ``load <step>`` blocks with
series-expansion notation (``parse.go:108-114,171-250``) and
``eval[_ordered|_fail] instant at <t> <query>`` assertions, compared at
relative ε = 1e-6 (``test.go:513-531``).  Timestamps count from the
Unix epoch (``test.go:45``).

Series notation::

    metric{l="v"}  0+10x10     # 11 samples: 0,10,...,100 at t=0,step,...
    metric         1 2 _ 4     # literal values; `_` leaves a gap
    metric         5x3         # 5,5,5,5 (bare value repeated)
    metric         1 stale 3   # `stale` writes a staleness marker
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from .engine import Engine
from .model import METRIC_NAME_LABEL, prepare_samples
from .promql.lexer import PromQLSyntaxError

_DSL_DUR_RE = re.compile(r"([0-9]+)(ms|[smhdwy])")
_DSL_UNIT_MS = {
    "ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000,
    "d": 86_400_000, "w": 7 * 86_400_000, "y": 365 * 86_400_000,
}


def _dsl_duration_ms(s: str) -> int:
    """Test-script timestamps accept COMPOUND durations (``2m30s``) —
    a harness convenience; the query language itself is restricted to
    the reference's single ``<int><unit>`` form."""
    pos, total = 0, 0
    for m in _DSL_DUR_RE.finditer(s):
        if m.start() != pos:
            raise PromQLSyntaxError(f"invalid duration {s!r}")
        total += int(m.group(1)) * _DSL_UNIT_MS[m.group(2)]
        pos = m.end()
    if pos == 0 or pos != len(s):
        raise PromQLSyntaxError(f"invalid duration {s!r}")
    return total

EPSILON = 1e-6

_SERIES_RE = re.compile(r"^\s*(?P<sel>[a-zA-Z_:][a-zA-Z0-9_:]*)?(?P<braces>\{[^}]*\})?\s+(?P<vals>.*)$")
_MATCHER_RE = re.compile(r'([a-zA-Z_][a-zA-Z0-9_]*)\s*=\s*"((?:[^"\\]|\\.)*)"')
_NUM = r"-?(?:\d+\.?\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|Inf|NaN)"
_EXPAND_RE = re.compile(rf"^({_NUM})(?:([+-])({_NUM}))?x(\d+)$", re.IGNORECASE)


class GoldenTestError(AssertionError):
    pass


def _num(s: str) -> float:
    low = s.lower()
    if low in ("inf", "+inf"):
        return math.inf
    if low == "-inf":
        return -math.inf
    if low == "nan":
        return math.nan
    return float(s)


def parse_series_values(spec: str) -> list[float | None]:
    """Expand a value-sequence spec into per-step values (None = gap)."""
    out: list[float | None | str] = []
    for tok in spec.split():
        if tok == "_":
            out.append(None)
            continue
        if tok == "stale":
            out.append("stale")
            continue
        m = _EXPAND_RE.match(tok)
        if m:
            start = _num(m.group(1))
            sign = -1.0 if m.group(2) == "-" else 1.0
            delta = sign * _num(m.group(3)) if m.group(3) is not None else 0.0
            n = int(m.group(4))
            out.extend(start + i * delta for i in range(n + 1))
            continue
        out.append(_num(tok))
    return out


def parse_labels(sel: str | None, braces: str | None) -> dict[str, str]:
    labels: dict[str, str] = {}
    if braces:
        for name, value in _MATCHER_RE.findall(braces):
            labels[name] = value.encode().decode("unicode_escape")
    if sel:
        labels[METRIC_NAME_LABEL] = sel
    return labels


@dataclass
class ExpectedSample:
    labels: dict[str, str]
    value: float


@dataclass
class EvalCmd:
    at_ms: int
    query: str
    expected: list[ExpectedSample] = field(default_factory=list)
    scalar: float | None = None
    ordered: bool = False
    fail: bool = False
    line: int = 0


def almost_equal(a: float, b: float) -> bool:
    """Relative ε comparison (test.go:513-531)."""
    if math.isnan(a) and math.isnan(b):
        return True
    if a == b:
        return True
    if b == 0:
        return abs(a) < EPSILON
    return abs(a - b) / abs(b) < EPSILON


class GoldenTest:
    def __init__(self, spark: SparkSession, content: str, strict: bool = True):
        self.spark = spark
        self.strict = strict
        self.load_step_ms = 60_000
        self.rows: list[tuple[dict, int, float]] = []
        self.evals: list[EvalCmd] = []
        self._parse(content)

    def _parse(self, content: str) -> None:
        lines = content.split("\n")
        i = 0
        while i < len(lines):
            line = lines[i].strip()
            i += 1
            if not line or line.startswith("#"):
                continue
            if line.startswith("load"):
                step = _dsl_duration_ms(line.split()[1])
                while i < len(lines) and lines[i].startswith((" ", "\t")):
                    sline = lines[i].rstrip()
                    i += 1
                    if not sline.strip():
                        continue
                    m = _SERIES_RE.match(sline)
                    if not m:
                        raise PromQLSyntaxError(f"bad series line: {sline!r}")
                    labels = parse_labels(m.group("sel"), m.group("braces"))
                    vals = parse_series_values(m.group("vals"))
                    for idx, v in enumerate(vals):
                        if v == "stale":
                            # staleness marker: NULL value
                            self.rows.append((labels, idx * step, None))
                        elif v is not None:
                            self.rows.append((labels, idx * step, v))
                continue
            m = re.match(
                r"^eval(_ordered|_fail)?\s+instant\s+at\s+(\S+)\s+(.*)$", line
            )
            if m:
                mod, at, q = m.group(1), m.group(2), m.group(3)
                if re.fullmatch(r"0+(?:ms|[smhdwy])?", at):
                    at_ms = 0
                else:
                    at_ms = _dsl_duration_ms(at)
                cmd = EvalCmd(
                    at_ms=at_ms,
                    query=q,
                    ordered=(mod == "_ordered"),
                    fail=(mod == "_fail"),
                    line=i,
                )
                while i < len(lines) and lines[i].startswith((" ", "\t")):
                    ex = lines[i].strip()
                    i += 1
                    if not ex or ex.startswith("#"):
                        continue
                    sm = _SERIES_RE.match(ex)
                    if sm and (sm.group("sel") or sm.group("braces")):
                        labels = parse_labels(sm.group("sel"), sm.group("braces"))
                        cmd.expected.append(
                            ExpectedSample(labels, _num(sm.group("vals").strip()))
                        )
                    else:
                        cmd.scalar = _num(ex)
                self.evals.append(cmd)
                continue
            raise PromQLSyntaxError(f"unrecognized test command: {line!r}")

    def run(self) -> None:
        df = self.spark.createDataFrame(
            [(labels, t, v) for labels, t, v in self.rows]
            or [({}, 0, 0.0)],  # absent() needs a frame even with no data
            "labels map<string,string>, t long, v double",
        )
        if not self.rows:
            df = df.limit(0)
        samples = prepare_samples(df)
        engine = Engine(self.spark, samples, strict=self.strict)
        failures: list[str] = []
        for cmd in self.evals:
            try:
                self._run_eval(engine, cmd)
            except GoldenTestError as e:
                failures.append(str(e))
        if failures:
            raise GoldenTestError("\n".join(failures))

    def _run_eval(self, engine: Engine, cmd: EvalCmd) -> None:
        ts = cmd.at_ms / 1000.0
        where = f"line {cmd.line}: {cmd.query!r} at {cmd.at_ms}ms"
        if cmd.fail:
            try:
                engine.query(cmd.query, ts).collect()
            except Exception:
                return
            raise GoldenTestError(f"{where}: expected error, got success")
        try:
            rows = engine.query(cmd.query, ts).collect()
        except Exception as e:
            raise GoldenTestError(f"{where}: query failed: {e}") from e
        got = [(dict(r["labels"]), r["v"]) for r in rows]
        if cmd.scalar is not None:
            if len(got) != 1 or not almost_equal(got[0][1], cmd.scalar):
                raise GoldenTestError(
                    f"{where}: expected scalar {cmd.scalar}, got {got}"
                )
            return
        want = [(e.labels, e.value) for e in cmd.expected]
        if cmd.ordered:
            ok = len(got) == len(want) and all(
                g[0] == w[0] and almost_equal(g[1], w[1])
                for g, w in zip(got, want)
            )
        else:
            key = lambda p: sorted(p[0].items())  # noqa: E731
            gs, ws = sorted(got, key=key), sorted(want, key=key)
            ok = len(gs) == len(ws) and all(
                g[0] == w[0] and almost_equal(g[1], w[1])
                for g, w in zip(gs, ws)
            )
        if not ok:
            raise GoldenTestError(
                f"{where}:\n  want: {sorted(want, key=lambda p: sorted(p[0].items()))}"
                f"\n  got:  {sorted(got, key=lambda p: sorted(p[0].items()))}"
            )


def run_golden(spark: SparkSession, content: str, strict: bool = True) -> None:
    GoldenTest(spark, content, strict=strict).run()
