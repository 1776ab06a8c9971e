"""Frontend results-cache fuzz: P4 — cache transparency under random
expressions.

`tests/test_frontend.py` pins byte-identical envelopes for a fixed
expression list; this file drives the cache with the SAME random
generator as the other metamorphic families (test_metamorphic.Gen)
over the richer corpus (NaN stripes, counters with resets, histogram,
sparse gaps), simulating what the cache exists for: an advancing
dashboard re-issuing one shape at a sliding `now()`. Every refresh's
envelope from the cached PromAPI must equal the cache-off PromAPI's
exactly — including error envelopes — and the cache must actually hit
across refreshes (a never-hitting cache would make the equality
vacuous).

topk/bottomk shapes are skipped (`Gen.unstable`): at an exact
k-boundary tie either series is a valid answer and the cached plan
evaluates a WIDER grid than the direct plan, so label identity there
is not promised by the language (the reference tie-breaks in Go map
order) — the other three fuzz families cover those shapes with
value-multiset comparisons.
"""

from __future__ import annotations

import random

import pytest

from test_metamorphic import fixture_rows, gen_expr_full
from timbala_spark import Engine, prepare_samples
from timbala_spark.api import PromAPI


@pytest.fixture(scope="module")
def apis(spark):
    df = prepare_samples(
        spark.createDataFrame(
            fixture_rows(), "labels map<string,string>, t long, v double"
        )
    )
    eng = Engine(spark, df)
    cached = PromAPI(eng, timeout_s=600)
    direct = PromAPI(eng, timeout_s=600, range_cache_rows=0)
    assert cached._range_cache is not None and direct._range_cache is None
    return cached, direct


SEEDS = list(range(14))


class TestFrontendFuzz:
    @pytest.mark.parametrize("seed", SEEDS)
    def test_advancing_dashboard_envelopes_match(self, apis, seed):
        cached, direct = apis
        expr, _clock, unstable = gen_expr_full(seed)
        if unstable:
            pytest.skip("topk/bottomk tie-break is not label-stable")
        rng = random.Random(seed * 7001 + 3)
        step = rng.choice([15, 30, 60])
        extent = rng.choice([600, 1200, 1800])
        now = rng.randrange(1200, 1500)
        h0 = cached._range_cache.hits
        for _ in range(4):  # the dashboard refresh loop
            a = cached.query_range(expr, now - extent, now, step)
            b = direct.query_range(expr, now - extent, now, step)
            assert a == b, (expr, now - extent, now, step)
            now += step  # advance within (usually) one quantum cell
        if a.get("status") == "success":
            # the equality must not be vacuous: refreshes of a
            # successful shape have to serve from cache at least once
            assert cached._range_cache.hits > h0, expr

    @pytest.mark.parametrize("seed", [1, 4, 6, 9])
    def test_advancing_instants_match(self, apis, seed):
        cached, direct = apis
        expr, _clock, unstable = gen_expr_full(seed)
        if unstable:
            pytest.skip("topk/bottomk tie-break is not label-stable")
        rng = random.Random(seed * 9001 + 11)
        t = rng.randrange(1200, 1900)
        for _ in range(3):
            a = cached.query(expr, t)
            b = direct.query(expr, t)
            assert a == b, (expr, t)
            t += 1  # advancing whole-second instants ride the cache
