"""Query-frontend results cache (timbala_spark.frontend).

The contract under test: a PromAPI with the range-results cache ON
returns BYTE-IDENTICAL JSON envelopes to one with it OFF, for aligned
and misaligned step phases, while actually serving advancing-`now()`
refreshes from cache. Mirrors the correctness obligation of the
Cortex/Thanos query-frontend (step-aligned splitting must be
invisible); reference grid semantics at ``promql/engine.go:1016-1044``
(per-step independent evaluation, points strictly inside [start, end]).
"""

import pytest

from timbala_spark import Engine, prepare_samples
from timbala_spark.api import PromAPI
from timbala_spark.frontend import RangeResultCache, quantize_range


class TestQuantizeRange:
    def test_window_contains_and_phase_preserved(self):
        for start, end, step, q in [
            (1_700_000_000_000, 1_700_021_600_000, 60_000, None),
            (1_700_000_007_000, 1_700_000_777_000, 13_000, None),
            (0, 1, 1, None),
            (1_700_000_000_500, 1_700_003_600_500, 15_000, 600_000),
            (5, 5, 7, 11),  # degenerate single-point request
        ]:
            a, b = quantize_range(start, end, step, q)
            assert a <= start and b >= end
            assert a % step == start % step  # phase preserved

    def test_stable_under_advance_within_quantum(self):
        step, q = 15_000, 600_000
        start, end = 1_700_000_000_000, 1_700_003_600_000
        a0, b0 = quantize_range(start, end, step, q)
        # a dashboard advancing by one step per refresh shares the
        # window until the end crosses a quantum boundary
        hits = sum(
            1
            for i in range(1, 10)
            if quantize_range(start + i * step, end + i * step, step, q)
            == (a0, b0)
        )
        assert hits >= 5

    def test_window_invariants_property(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=300, deadline=None)
        @given(
            start=st.integers(min_value=-(2**40), max_value=2**40),
            extent=st.integers(min_value=0, max_value=10**9),
            step=st.integers(min_value=1, max_value=10**7),
            quantum=st.one_of(
                st.none(), st.integers(min_value=1, max_value=10**8)
            ),
        )
        def check(start, extent, step, quantum):
            end = start + extent
            a, b = quantize_range(start, end, step, quantum)
            assert a <= start and b >= end
            assert a % step == start % step  # grid superset guarantee
            assert (b - a) % step == 0
            # bounded widening: at most one rounded quantum behind;
            # ahead, the r8 prefetch margin guarantees AT LEAST one
            # quantum (advancing dashboards hit until a full quantum
            # is consumed) and at most two (plus step rounding)
            q = -(-max(quantum or 1, step) // step) * step
            if quantum is not None:
                assert (start - a) < q
                assert q <= (b - end) < 2 * q + step
            # stability: a request sliding within the same quantum cell
            # maps to the same window (cache-hit guarantee)
            if quantum is not None and extent >= step:
                a2, b2 = quantize_range(
                    start + step, end + step, step, quantum
                )
                assert a2 % step == a % step
                assert a2 in (a, a + q)

        check()

    def test_cache_row_budget_eviction(self):
        c = RangeResultCache(max_rows=10)
        c.get_or_fill(("a",), lambda: list(range(6)))
        c.get_or_fill(("b",), lambda: list(range(6)))  # evicts a
        calls = []
        c.get_or_fill(("a",), lambda: calls.append(1) or list(range(6)))
        assert calls  # re-filled after eviction
        big = c.get_or_fill(("huge",), lambda: list(range(100)))
        assert len(big) == 100  # over-budget results pass through uncached


@pytest.fixture(scope="module")
def apis(spark):
    """(cached, direct) PromAPI pair over one in-memory engine."""
    t0 = 1_700_000_000_000
    rows = []
    for s in range(6):
        for i in range(240):  # 4h of minutely data, 6 series
            rows.append(
                (
                    {"__name__": "m", "i": str(s % 3), "j": str(s % 2)},
                    t0 + i * 60_000 + s * 1_000,
                    float((i * 7 + s * 13) % 50),
                )
            )
    df = prepare_samples(
        spark.createDataFrame(
            rows, "labels map<string,string>, t long, v double"
        )
    )
    eng = Engine(spark, df)
    return (
        PromAPI(eng, timeout_s=600),
        PromAPI(eng, timeout_s=600, range_cache_rows=0),
        t0,
    )


EXPRS = [
    "m",
    "sum by (i) (m)",
    "rate(m[10m])",
    "topk(2, sum by (i, j) (m))",
    "avg_over_time(m[7m]) + 1",
    "scalar(count(m)) * time() % 97",  # time()-dependent: per-step exact
    "absent(nosuch)",
]


class TestCachedEqualsDirect:
    @pytest.mark.parametrize("phase_s", [0, 7.5])
    def test_envelopes_identical(self, apis, phase_s):
        cached, direct, t0 = apis
        start = t0 / 1000 + 600 + phase_s  # misaligned phase too
        end = start + 5400
        for expr in EXPRS:
            for step in (60, 73):  # odd step: grid never lands on :00
                got = cached.query_range(expr, start, end, step)
                want = direct.query_range(expr, start, end, step)
                assert got == want, (expr, step, phase_s)

    def test_advancing_refreshes_hit_cache_and_stay_exact(self, apis):
        cached, direct, t0 = apis
        step = 60
        # step-aligned advance, as dashboard clients issue it (Grafana
        # aligns start to the step); a client advancing by a non-step
        # refresh interval cycles through step/gcd phases and still
        # converges to hits after one cycle
        rc = cached._range_cache
        hits0, misses0 = rc.hits, rc.misses
        for i in range(8):
            start = t0 / 1000 + 600 + i * step
            end = start + 3600
            got = cached.query_range("sum by (i) (rate(m[5m]))", start, end, step)
            want = direct.query_range("sum by (i) (rate(m[5m]))", start, end, step)
            assert got == want, i
        assert rc.hits - hits0 >= 6  # only quantum-boundary crossings miss
        assert rc.misses - misses0 <= 2

    def test_eval_error_surfaces_identically(self, apis):
        cached, direct, t0 = apis
        start, end = t0 / 1000 + 600, t0 / 1000 + 600 + 1800
        # step-varying k is NaN -> the reference errors in evalInt
        got = cached.query_range("topk(scalar(nosuch), m)", start, end, 60)
        want = direct.query_range("topk(scalar(nosuch), m)", start, end, 60)
        assert got == want and got["status"] == "error"
        # parse errors too
        got = cached.query_range("m[", start, end, 60)
        want = direct.query_range("m[", start, end, 60)
        assert got == want and got["errorType"] == "bad_data"

    def test_metadata_endpoints_cache_per_snapshot(self, apis):
        cached, _direct, _t0 = apis
        a = cached.label_values("i")
        b = cached.label_values("i")
        assert a is b  # served from the snapshot-scoped cache
        assert a["data"] == ["0", "1", "2"]
        s1 = cached.series(["m"], 0, 4e9)
        s2 = cached.series(["m"], 0, 4e9)
        assert s1 is s2 and s1["status"] == "success"
        # errors are never cached
        e1 = cached.label_values("0bad")
        e2 = cached.label_values("0bad")
        assert e1 is not e2 and e1["status"] == "error"

    @pytest.mark.parametrize(
        "expr",
        [
            "sum by (i) (m)",
            "rate(m[7m])",
            "topk(2, sum by (i, j) (m))",
            "avg_over_time(m[9m]) + scalar(count(m))",
            "absent(nosuch)",
        ],
    )
    def test_per_step_independence_property(self, apis, expr):
        """The axiom BOTH caches rest on, pinned directly: an instant
        evaluation at t is bit-identical to the grid point t of any
        range evaluation whose grid contains t, for randomized
        (t, step, window) placements (promql/engine.go:1016-1044
        evaluates each grid step independently)."""
        import random

        _cached, direct, t0 = apis
        eng = direct.engine
        rng = random.Random(hash(expr) & 0xFFFF)

        def canon(rows):
            return sorted(
                (
                    tuple(sorted(dict(r["labels"]).items())),
                    r["t"],
                    "NaN" if r["v"] != r["v"] else r["v"],
                )
                for r in rows
            )

        for _ in range(3):
            t = t0 / 1000 + rng.randrange(600, 13800)
            step = rng.choice([7, 13, 60])
            a = t - rng.randrange(0, 4) * step
            b = t + rng.randrange(0, 3) * step
            inst = canon(eng.query(expr, t).collect())
            grid = eng.query_range(expr, a, b, step).collect()
            at_t = canon([r for r in grid if r["t"] == int(t * 1000)])
            assert inst == at_t, (expr, t, step, a, b)

    def test_instant_cached_equals_direct_and_hits(self, apis):
        """Instant queries at advancing whole-second times serve from
        the widened 1 s-grid window: byte-identical envelopes, one
        fill per (expr, quantum window)."""
        cached, direct, t0 = apis
        rc = cached._range_cache
        for expr in EXPRS:
            hits0, misses0 = rc.hits, rc.misses
            for i in range(6):  # advancing now(), 1 s per refresh
                t = t0 / 1000 + 3600 + i
                got = cached.query(expr, t)
                want = direct.query(expr, t)
                assert got == want, (expr, i)
            assert rc.misses - misses0 <= 2, expr  # ≤ windows touched
            assert rc.hits - hits0 >= 4, expr

    def test_instant_off_grid_and_ordered_bypass(self, apis):
        cached, direct, t0 = apis
        rc = cached._range_cache
        h0, m0 = rc.hits, rc.misses
        t = t0 / 1000 + 3600 + 0.5  # off the 1 s grid: direct path
        assert cached.query("sum(m)", t) == direct.query("sum(m)", t)
        # sort()'s wire order comes from the plan's collect order — the
        # shared cache must not assume it, so it bypasses too
        ts = t0 / 1000 + 3600
        assert cached.query("sort(m)", ts) == direct.query("sort(m)", ts)
        # matrix-selector instant queries return raw samples (not a
        # grid evaluation) and bypass as well
        assert cached.query("m[5m]", ts) == direct.query("m[5m]", ts)
        assert (rc.hits, rc.misses) == (h0, m0)

    def test_instant_errors_surface_identically(self, apis):
        cached, direct, t0 = apis
        t = t0 / 1000 + 3600
        got = cached.query("topk(scalar(nosuch), m)", t)
        want = direct.query("topk(scalar(nosuch), m)", t)
        assert got == want and got["status"] == "error"

    def test_points_cap_respects_requested_grid(self, apis):
        cached, direct, t0 = apis
        start = t0 / 1000
        # requested grid is exactly at the cap: widening must NOT turn
        # a legal request into an 11k error (the cached path bypasses)
        eng = cached.engine
        n = eng.max_points  # cap counts INTERVALS (api.go:211-216)
        end = start + n * 1
        got = cached.query_range("m", start, end, 1)
        assert got["status"] == "success"
        # one past the cap errors, same as direct, with the
        # reference's verbatim message
        got = cached.query_range("m", start, end + 1, 1)
        want = direct.query_range("m", start, end + 1, 1)
        assert got == want and got["status"] == "error"
        assert got["errorType"] == "bad_data"
        assert got["error"] == (
            "exceeded maximum resolution of 11,000 points per "
            "timeseries. Try decreasing the query resolution (?step=XX)"
        )
