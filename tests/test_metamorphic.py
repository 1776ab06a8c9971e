"""Metamorphic PromQL fuzz: a seeded random expression generator plus
the two identities every evaluation in this engine rests on.

The reference evaluates every range-grid step independently
(``vendor/.../promql/engine.go:1016-1044``) and resolves ``offset`` by
shifting the selection window, with range-function extrapolation
bounds offset-adjusted too (``functions.go:55-56`` — ``rangeStart =
ev.Timestamp - (Range+Offset)``). Two metamorphic properties follow:

* **P1 (per-step independence)**: for any expression, an instant
  evaluation at ``t`` is bit-identical to the ``t`` grid point of any
  range evaluation whose grid contains ``t``.
* **P2 (offset shift)**: adding ``offset d`` to EVERY selector and
  evaluating at ``t+d`` selects exactly the same raw rows, so the
  result is the same (labels, value) multiset with output timestamps
  shifted by exactly ``d`` — for every expression whose value does not
  read the evaluation clock itself. The clock-reading exceptions,
  straight from the vendored source: ``time()`` (``functions.go:39``),
  ``timestamp()`` (``:606``), and ``predict_linear`` whose intercept is
  the UNSHIFTED ``ev.Timestamp`` (``:680`` — so with offset it predicts
  ``d`` further ahead; excluded by tagging, not special-cased).

The generator composes the full grammar — matchers, range functions,
binary operators with vector matching, set operators, aggregations,
elementwise functions, histogram_quantile, label functions — to depth
3 over a fixture corpus with counters (resets), gauges (negatives,
NaN), a cumulative histogram, and a sparse gappy series. Random
compositions the hand-written corpus never tried get pinned against
the engine's own axioms, with no oracle needed.

Error parity is part of the property: under P2 the two variants see
identical data, so if one raises, the other must raise the SAME
message. Under P1 an instant error must reproduce in the covering
range query (the converse is vacuous — a range query can error on a
grid step the instant never evaluates).

Replay trick: the generator is re-run with the same seed and a
different ``extra_offset``; no random draw depends on the offset, so
the two passes make identical choices and differ only in the selector
``offset`` suffixes.
"""

from __future__ import annotations

import random

import pytest

from timbala_spark import Engine, prepare_samples

MIN = 60_000


def fixture_rows():
    """The fuzz corpus: gauges with negatives and a NaN stripe,
    counters with resets, a cumulative histogram, a gappy sparse
    series. Shared with the store-roundtrip fuzz
    (test_metamorphic_store.py)."""
    rows = []
    # gauge m{i,j}: negatives, a NaN stripe on one series
    for i_idx, i in enumerate(["a", "b", "c"]):
        for j_idx, j in enumerate(["x", "y"]):
            for k in range(46):
                v = (k - 20) * (i_idx + 1) * 1.5 - j_idx * 7.25
                if i == "b" and j == "y" and k % 11 == 3:
                    v = float("nan")
                rows.append(
                    ({"__name__": "m", "i": i, "j": j}, k * MIN, float(v))
                )
    # counter c{i}: two reset points, different slopes
    for i_idx, i in enumerate(["a", "b"]):
        acc = 0.0
        for k in range(46):
            acc += 3.0 + i_idx * 2.0 + (k % 5)
            if k in (17, 31):
                acc = float(k % 7)  # counter reset
            rows.append(({"__name__": "c", "i": i}, k * MIN, acc))
    # cumulative histogram h_bucket{le,i}
    for i in ["a", "b"]:
        for k in range(46):
            base = (k % 13) + (1 if i == "b" else 0)
            counts = {
                "0.1": base,
                "1": base * 2 + 3,
                "10": base * 3 + 5,
                "+Inf": base * 3 + 7,
            }
            for le, cnt in counts.items():
                rows.append(
                    (
                        {"__name__": "h_bucket", "le": le, "i": i},
                        k * MIN,
                        float(cnt),
                    )
                )
    # sparse series with gaps longer than the 5m lookback
    for k in [0, 1, 2, 9, 10, 22, 23, 24, 40]:
        rows.append(({"__name__": "sparse"}, k * MIN, float(k) * 1.25))
    return rows


@pytest.fixture(scope="module")
def engine(spark):
    df = spark.createDataFrame(
        fixture_rows(), "labels map<string,string>, t long, v double"
    )
    return Engine(spark, prepare_samples(df))


class Gen:
    """Seeded random PromQL generator. ``extra_offset_s`` is added to
    every selector's offset without consuming any randomness, so the
    same seed replays the same expression shifted (P2's device).
    ``self.clock`` is set when the expression's VALUE depends on the
    evaluation timestamp (not just its output ``t`` column)."""

    RANGES = ["3m", "5m", "10m"]
    OFFSETS = [0, 0, 0, 300]  # seconds; mostly none, sometimes 5m

    def __init__(self, seed: int, extra_offset_s: int = 0):
        self.rng = random.Random(seed)
        self.extra = extra_offset_s
        self.clock = False
        #: True when the expression selects AMONG tied values
        #: (topk/bottomk): at an exact k-boundary tie either series is
        #: a valid answer (the reference tie-breaks in Go map order),
        #: so cross-plan comparisons must not assume label identity
        self.unstable = False

    # -- leaves --------------------------------------------------------
    def selector(self) -> str:
        r = self.rng
        name = r.choice(["m", "m", "m", "c", "c", "h_bucket", "sparse"])
        matchers = []
        if name == "m" and r.random() < 0.6:
            kind = r.randrange(4)
            if kind == 0:
                matchers.append(f'i="{r.choice(["a", "b", "c"])}"')
            elif kind == 1:
                matchers.append(f'i!="{r.choice(["a", "b"])}"')
            elif kind == 2:
                matchers.append('i=~"[ab]"')
            else:
                matchers.append('j!~"y.*"')
        if name == "c" and r.random() < 0.4:
            matchers.append(f'i="{r.choice(["a", "b"])}"')
        off = r.choice(self.OFFSETS) + self.extra
        s = name + ("{" + ",".join(matchers) + "}" if matchers else "")
        if off:
            s += f" offset {off}s"
        return s

    def matrix(self) -> str:
        r = self.rng
        name = r.choice(["m", "c", "c", "h_bucket", "sparse"])
        rng_d = r.choice(self.RANGES)
        off = r.choice(self.OFFSETS) + self.extra
        s = f"{name}[{rng_d}]"
        if off:
            # offset binds to the selector: `c[5m] offset 90s`
            s += f" offset {off}s"
        return s

    # -- scalar expressions --------------------------------------------
    def scalar(self, depth: int) -> str:
        r = self.rng
        roll = r.random()
        if depth <= 0 or roll < 0.5:
            return r.choice(["2", "0.5", "-3", "10", "0"])
        if roll < 0.8:
            return f"scalar({self.vector(depth - 1)})"
        self.clock = True
        return "time()"

    # -- vector expressions --------------------------------------------
    def vector(self, depth: int) -> str:
        r = self.rng
        if depth <= 0:
            return self.selector()
        roll = r.randrange(10)
        if roll == 0:
            return self.selector()
        if roll == 1:  # aggregation
            op = r.choice(
                ["sum", "avg", "min", "max", "count", "stddev", "stdvar"]
            )
            grp = r.choice(["", " by (i)", " by (i, j)", " without (j)"])
            return f"{op}{grp} ({self.vector(depth - 1)})"
        if roll == 2:  # parameterized aggregation
            kind = r.randrange(3)
            inner = self.vector(depth - 1)
            if kind == 0:
                op = r.choice(["topk", "bottomk"])
                self.unstable = True
                return f"{op}({r.choice([1, 2, 3])}, {inner})"
            if kind == 1:
                phi = r.choice(["0", "0.25", "0.9", "1"])
                return f"quantile{r.choice(['', ' by (i)'])} ({phi}, {inner})"
            return f'count_values("val", {inner})'
        if roll == 3:  # range function over a matrix selector
            fn = r.choice(
                [
                    "rate", "increase", "delta", "irate", "idelta",
                    "resets", "changes", "deriv", "avg_over_time",
                    "min_over_time", "max_over_time", "sum_over_time",
                    "count_over_time", "stddev_over_time",
                    "stdvar_over_time",
                ]
            )
            return f"{fn}({self.matrix()})"
        if roll == 4:  # parameterized range function
            kind = r.randrange(3)
            if kind == 0:
                self.clock = True  # intercept at unshifted ev.Timestamp
                return f"predict_linear({self.matrix()}, {r.choice([60, 600])})"
            if kind == 1:
                return f"holt_winters({self.matrix()}, 0.5, 0.1)"
            phi = r.choice(["0", "0.1", "0.5", "0.95", "1"])
            return f"quantile_over_time({phi}, {self.matrix()})"
        if roll == 5:  # elementwise (incl. date fns on sample VALUES —
            # value-dependent, so shift-invariant under P2)
            fn = r.choice(
                ["abs", "ceil", "floor", "exp", "ln", "log2", "log10",
                 "sqrt", "sort", "sort_desc", "days_in_month",
                 "day_of_week", "month", "year", "minute"]
            )
            if fn in ("exp",):  # keep magnitudes sane
                return f"exp(clamp_max({self.vector(depth - 1)}, 20))"
            return f"{fn}({self.vector(depth - 1)})"
        if roll == 6:  # clamp / round / label fns / date-on-values
            kind = r.randrange(5)
            inner = self.vector(depth - 1)
            if kind == 0:
                return f"clamp_min({inner}, {self.scalar(depth - 1)})"
            if kind == 1:
                return f"clamp_max({inner}, {self.scalar(depth - 1)})"
            if kind == 2:
                return f"round({inner}, {r.choice(['1', '0.5', '10', '0.001'])})"
            if kind == 3:
                return f'label_replace({inner}, "k", "$1-r", "i", "(.+)")'
            return f'label_join({inner}, "k", "-", "i", "j")'
        if roll == 7:  # arithmetic / comparison binop
            op = r.choice(["+", "-", "*", "/", "%", "^", ">", "<", ">=",
                           "<=", "==", "!="])
            boolm = " bool" if op in (">", "<", ">=", "<=", "==", "!=") \
                and r.random() < 0.5 else ""
            if r.random() < 0.5:  # vector ∘ scalar
                return (
                    f"({self.vector(depth - 1)}) {op}{boolm} "
                    f"{self.scalar(depth - 1)}"
                )
            matching = r.choice(["", "", " on (i)", " ignoring (j)"])
            gl = ""
            if matching and r.random() < 0.3 and not boolm:
                gl = r.choice([" group_left", " group_right"])
            return (
                f"({self.vector(depth - 1)}) {op}{boolm}{matching}{gl} "
                f"({self.vector(depth - 1)})"
            )
        if roll == 8:  # set operator
            op = r.choice(["and", "or", "unless"])
            matching = r.choice(["", " on (i)", " ignoring (j)"])
            return (
                f"({self.vector(depth - 1)}) {op}{matching} "
                f"({self.vector(depth - 1)})"
            )
        # roll == 9: the specials
        kind = r.randrange(4)
        if kind == 0:
            phi = r.choice(["0.5", "0.9", "0.99"])
            off = f" offset {self.extra}s" if self.extra else ""
            return (
                f"histogram_quantile({phi}, "
                f"rate(h_bucket[5m]{off}))"
            )
        if kind == 1:
            off = f" offset {self.extra}s" if self.extra else ""
            return f'absent(m{{i="nope"}}{off})'
        if kind == 2:
            return f"-({self.vector(depth - 1)})"
        return f"vector({self.scalar(depth - 1)})"


def gen_expr(seed: int, extra_offset_s: int = 0) -> tuple[str, bool]:
    g = Gen(seed, extra_offset_s)
    return g.vector(3), g.clock


def gen_expr_full(seed: int, extra_offset_s: int = 0):
    """(promql, clock, unstable) — see Gen's attribute docs."""
    g = Gen(seed, extra_offset_s)
    return g.vector(3), g.clock, g.unstable


def canon(rows, shift_ms: int = 0):
    return sorted(
        (
            tuple(sorted(dict(r["labels"]).items())),
            r["t"] - shift_ms,
            "NaN" if r["v"] != r["v"] else repr(float(r["v"])),
        )
        for r in rows
    )


def assert_rows_match(a, b, ctx):
    """Labels and timestamps exactly; values bit-identical OR within
    1e-9 relative. The slack exists because float aggregations
    re-associate across physical plans (an offset changes partition
    pruning, so ``avg by (i)`` may sum its inputs in a different
    order) — the reference has the identical property, summing in Go
    map-iteration order (``promql/engine.go`` aggregation maps), so
    cross-plan bit-equality is not a semantic of the language. The
    sweep that motivated the slack: seed 32,
    ``avg by (i) (quantile_over_time(0.1, h_bucket[3m]))`` →
    4.199999999999999 vs 4.2."""
    assert len(a) == len(b), ctx
    for x, y in zip(a, b):
        assert x[0] == y[0] and x[1] == y[1], (x, y, ctx)
        if x[2] == y[2]:
            continue
        assert x[2] != "NaN" and y[2] != "NaN", (x, y, ctx)
        fx, fy = float(x[2]), float(y[2])
        assert abs(fx - fy) <= 1e-9 * max(abs(fx), abs(fy)), (x, y, ctx)


SEEDS = list(range(24))


class TestHarnessSensitivity:
    """The comparators must actually catch divergences — a fuzz family
    is only as strong as its assert."""

    def test_label_and_time_mismatches_fail(self):
        a = [((("i", "a"),), 1000, "1.0")]
        with pytest.raises(AssertionError):
            assert_rows_match(a, [((("i", "b"),), 1000, "1.0")], "lbl")
        with pytest.raises(AssertionError):
            assert_rows_match(a, [((("i", "a"),), 2000, "1.0")], "t")
        with pytest.raises(AssertionError):
            assert_rows_match(a, [], "len")

    def test_value_tolerance_is_tight(self):
        a = [((), 0, "1.0")]
        assert_rows_match(a, [((), 0, repr(1.0 + 4e-10))], "ok")
        with pytest.raises(AssertionError):
            assert_rows_match(a, [((), 0, "1.001")], "far")
        with pytest.raises(AssertionError):
            assert_rows_match(a, [((), 0, "NaN")], "nan-vs-num")
        assert_rows_match([((), 0, "NaN")], [((), 0, "NaN")], "nan-eq")


class TestMetamorphic:
    @pytest.mark.parametrize("seed", SEEDS)
    def test_per_step_independence(self, engine, seed):
        expr, _clock = gen_expr(seed)
        rng = random.Random(seed * 7919 + 13)
        t = rng.randrange(900, 2100)
        step = rng.choice([30, 60, 75])
        a = t - rng.randrange(0, 3) * step
        b = t + rng.randrange(0, 3) * step
        try:
            inst = canon(engine.query(expr, t).collect())
        except Exception:
            # instant error ⇒ the covering range query must error too
            with pytest.raises(Exception):
                engine.query_range(expr, a, b, step).collect()
            return
        try:
            grid = engine.query_range(expr, a, b, step).collect()
        except Exception:
            return  # error on a grid step the instant never evaluated
        at_t = canon([r for r in grid if r["t"] == t * 1000])
        assert_rows_match(inst, at_t, (expr, t, step, a, b))

    @pytest.mark.parametrize("seed", SEEDS)
    @pytest.mark.parametrize("d", [90, 420])
    def test_offset_shift(self, engine, seed, d):
        base, clock = gen_expr(seed)
        if clock:
            pytest.skip("expression reads the evaluation clock")
        shifted, _ = gen_expr(seed, extra_offset_s=d)
        rng = random.Random(seed * 104729 + d)
        t = rng.randrange(900, 2100)
        err_base = err_shift = None
        rows_base = rows_shift = None
        try:
            rows_base = engine.query(base, t).collect()
        except Exception as e:
            err_base = str(e)
        try:
            rows_shift = engine.query(shifted, t + d).collect()
        except Exception as e:
            err_shift = str(e)
        if err_base is not None or err_shift is not None:
            # Parse errors: the two texts genuinely differ, and the
            # injected ` offset Ns` can even land inside what the
            # grammar treats as grouping opts (`group_right (c)` eats
            # the paren as a label list — same ambiguity as the
            # reference's parser), so for UNPARSEABLE seeds only
            # both-fail parity is implied, not message equality.
            if (err_base or "").startswith("parse error") or (
                err_shift or ""
            ).startswith("parse error"):
                assert err_base is not None and err_shift is not None, (
                    base, shifted, t, d,
                )
                return
            # identical selected data ⇒ identical evaluation failure
            assert err_base == err_shift, (base, shifted, t, d)
            return
        assert_rows_match(
            canon(rows_base),
            canon(rows_shift, shift_ms=d * 1000),
            (base, shifted, t, d),
        )
