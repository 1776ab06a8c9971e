"""Metamorphic sweep over the rollup router (the freshest r7 code).

`tests/test_rollup.py` pins hand-picked shapes; this file generates
random ANSWERABLE shapes — random routable function, window multiple,
offset multiple, grid stride, and a random wrapper composition
(aggregation, elementwise, scalar binop, routed∘routed binop) — over
randomized irregular data, and asserts the routed engine answers
exactly what the raw engine answers. Every generated inner call is
checked to actually route (`pick_rollup`), so a silent fallback can't
make the sweep vacuous. A two-resolution engine exercises the
coarsest-wins pick on the same shapes.

Values compare at 1e-9 relative (labels and timestamps exact): the
routed plans re-associate float sums (rate's correction sum, avg's
partials) exactly like Spark's own partial aggregation does; the
bit-identical classes (count/min/max, delta/resets/changes,
irate/idelta) are pinned as such by test_rollup.py's fixed shapes.
"""

from __future__ import annotations

import math
import random

import pytest

from timbala_spark.engine import Engine
from timbala_spark.model import prepare_samples
from timbala_spark.rollup import (
    ROUTABLE,
    SELECTOR,
    build_rollup,
    pick_rollup,
)

W = 300_000  # 5m base rollup
W2 = 900_000  # 15m coarse rollup (3x)
T0 = 1_700_000_100_000 - (1_700_000_100_000 % W2)
SPAN = 6 * 3_600_000


def _mk_samples(spark):
    random.seed(1031)
    rows = []
    # gauges with NaN stripes, STALENESS MARKERS (NULL v — the r8
    # selector routing must kill a series whose most recent lookback
    # point is a marker), and window-boundary-aligned points
    for s in range(3):
        t = T0
        while t < T0 + SPAN:
            r = random.random()
            v = (
                None
                if r < 0.04
                else float("nan")
                if r < 0.09
                else float(random.uniform(-9, 90))
            )
            rows.append(({"__name__": "m", "i": str(s)}, int(t), v))
            t += random.choice([15_000, 45_000, 150_000, 300_000])
    # counters with resets (exercise the pair family's corr sum)
    for s in range(2):
        t, acc = T0, 0.0
        while t < T0 + SPAN:
            acc += random.uniform(0, 8)
            if random.random() < 0.03:
                acc = random.uniform(0, 2)  # reset
            rows.append(({"__name__": "c", "i": str(s)}, int(t), float(acc)))
            t += random.choice([30_000, 60_000, 240_000])
    # sparse: whole windows empty (cross-window gap reconstruction)
    for k in [0, 1, 7, 8, 9, 30, 31, 55]:
        rows.append(({"__name__": "sp"}, T0 + k * 120_000, float(k)))
    return prepare_samples(
        spark.createDataFrame(rows, "labels map<string,string>, t long, v double")
    )


@pytest.fixture(scope="module")
def engines(spark):
    df = _mk_samples(spark).cache()
    df.count()
    ru = build_rollup(df, W).cache()
    ru.count()
    ru2 = build_rollup(df, W2).cache()
    ru2.count()
    return (
        Engine(spark, df),
        Engine(spark, df, rollups={W: ru}),
        Engine(spark, df, rollups={W: ru, W2: ru2}),
    )


def _canon(res):
    return {
        (tuple(sorted(r["labels"].items())), r["t"]): r["v"]
        for r in res.collect()
    }


def _assert_same(a, b, ctx):
    assert set(a) == set(b), ctx
    for k in a:
        x, y = a[k], b[k]
        if math.isnan(x) or math.isnan(y):
            assert math.isnan(x) and math.isnan(y), (k, x, y, ctx)
        elif x != y:
            assert abs(x - y) <= 1e-9 * max(1.0, abs(x), abs(y)), (k, x, y, ctx)


def _assert_same_values(a, b, ctx):
    """topk at an exact k-boundary tie may keep EITHER tied series —
    the reference's heap breaks ties in Go map-iteration order
    (nondeterministic), so label identity there is not a semantic of
    the language. The per-timestamp sorted VALUE multiset is: with
    {3,3,3} and k=2 every valid answer returns {3,3}. Compare that."""

    def by_t(res):
        out: dict[int, list[float]] = {}
        for (_lbls, t), v in res.items():
            out.setdefault(t, []).append(v)
        return {
            t: sorted(vs, key=lambda v: (math.isnan(v), v))
            for t, vs in out.items()
        }

    ga, gb = by_t(a), by_t(b)
    assert set(ga) == set(gb), ctx
    for t in ga:
        xs, ys = ga[t], gb[t]
        assert len(xs) == len(ys), (t, xs, ys, ctx)
        for x, y in zip(xs, ys):
            if math.isnan(x) or math.isnan(y):
                assert math.isnan(x) and math.isnan(y), (t, x, y, ctx)
            elif x != y:
                assert abs(x - y) <= 1e-9 * max(1.0, abs(x), abs(y)), (
                    t, x, y, ctx,
                )


def gen_shape(seed: int):
    """Returns (promql, inner_range_ms, inner_offset_ms, start_ms,
    step_ms, n_steps) with every inner call answerable at W."""
    r = random.Random(seed)
    metric = r.choice(["m", "m", "c", "sp"])
    dense = metric != "sp"
    fn = r.choice(sorted(ROUTABLE))
    off_w = r.choice([0, 0, 1, 2])
    off_ms = off_w * W
    off = f" offset {off_ms // 60000}m" if off_ms else ""
    if fn == SELECTOR:
        # bare instant selector: routes on the 5m lookback (== W)
        rng_ms = 300_000
        inner = f"{metric}{off}"
    else:
        k = r.choice([1, 2, 3, 6])
        rng_ms = k * W
        rng_s = f"{rng_ms // 60000}m"
        inner = f"{fn}({metric}[{rng_s}]{off})"
    wrap = r.randrange(6)
    labels_stable = wrap != 2  # topk tie-breaks are label-unstable
    if wrap == 1:
        op = r.choice(["sum", "avg", "min", "max", "count"])
        grp = r.choice(["", " by (i)", " without (i)"])
        q = f"{op}{grp} ({inner})"
    elif wrap == 2:
        q = f"topk({r.choice([1, 2])}, {inner})"
    elif wrap == 3:
        q = f"{r.choice(['abs', 'ceil', 'floor'])}({inner})"
    elif wrap == 4:
        q = f"({inner}) {r.choice(['+', '*', '-'])} {r.choice(['2', '0.5'])}"
    elif wrap == 5:
        fn2 = r.choice(sorted(ROUTABLE))
        rng2 = f"{rng_ms // 60000}m"
        second = (
            f"{metric}{off}"
            if fn2 == SELECTOR
            else f"{fn2}({metric}[{rng2}]{off})"
        )
        q = f"({inner}) + ({second})"
    else:
        q = inner
    # grid: start on a window boundary in raw time, W-multiple step
    start = T0 + 2 * 3_600_000 + off_ms  # (start - off) % W == 0
    step_ms = r.choice([W, 2 * W, 3 * W])
    n_steps = r.choice([1, 5, 13])
    return q, fn, rng_ms, off_ms, start, step_ms, n_steps, dense, labels_stable


SEEDS = list(range(18))


class TestRollupMetamorphic:
    @pytest.mark.parametrize("seed", SEEDS)
    def test_routed_equals_raw(self, engines, seed):
        raw, routed, routed2 = engines
        (q, fn, rng_ms, off_ms, start, step_ms, n_steps, dense,
         labels_stable) = gen_shape(seed)
        assert (
            pick_rollup(
                routed.rollups, rng_ms, off_ms, start, step_ms, n_steps, fn
            )
            == W
        ), (q, "generated shape must actually route")
        end = start + (n_steps - 1) * step_ms
        a = _canon(raw.query_range(q, start / 1000, end / 1000, step_ms / 1000))
        if dense:  # dense metrics inside the data span must answer —
            # an empty/empty comparison would prove nothing
            assert a, (q, start, step_ms, n_steps)
        b = _canon(routed.query_range(q, start / 1000, end / 1000, step_ms / 1000))
        cmp = _assert_same if labels_stable else _assert_same_values
        cmp(a, b, (q, start, step_ms, n_steps, "W"))
        # two-resolution engine: router may pick W2 when aligned —
        # whatever it picks must still answer the raw result
        c = _canon(routed2.query_range(q, start / 1000, end / 1000, step_ms / 1000))
        cmp(a, c, (q, start, step_ms, n_steps, "W+W2"))

    @pytest.mark.parametrize("seed", [3, 7, 11])
    def test_coarse_pick_fires_when_aligned(self, engines, seed):
        """For W2-divisible shapes the two-resolution router must pick
        the COARSER table (coarsest-wins, rollup.py pick_rollup)."""
        _, _, routed2 = engines
        r = random.Random(seed)
        fn = r.choice(sorted(ROUTABLE))
        rng_ms = r.choice([1, 2]) * W2
        start = T0 + 2 * 3_600_000
        assert (
            pick_rollup(routed2.rollups, rng_ms, 0, start, W2, 5, fn) == W2
        )
