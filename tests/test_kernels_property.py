"""Property tests: the Spark kernels vs straight Python ports of the
reference algorithms (extrapolatedRate functions.go:50-127,
holt_winters functions.go:193-285, quantile quantile.go:155-183) on
randomized series. Relative tolerance 1e-9 — far tighter than the
golden harness's 1e-6."""

import math

import numpy as np
import pytest

from timbala_spark import Engine, prepare_samples


def py_extrapolated_rate(points, range_start, range_end, range_ms, is_counter, is_rate):
    """Python port of extrapolatedRate (functions.go:50-127)."""
    if len(points) < 2:
        return None
    correction = 0.0
    last = points[0][1]
    for _, v in points[1:]:
        if v < last:
            correction += last
        last = v
    result = points[-1][1] - points[0][1] + (correction if is_counter else 0.0)
    dur_start = (points[0][0] - range_start) / 1000.0
    dur_end = (range_end - points[-1][0]) / 1000.0
    sampled = (points[-1][0] - points[0][0]) / 1000.0
    avg_between = sampled / (len(points) - 1)
    if is_counter and result > 0 and points[0][1] >= 0:
        dur_zero = sampled * (points[0][1] / result)
        if dur_zero < dur_start:
            dur_start = dur_zero
    threshold = avg_between * 1.1
    extrap = sampled
    extrap += dur_start if dur_start < threshold else avg_between / 2
    extrap += dur_end if dur_end < threshold else avg_between / 2
    result = result * (extrap / sampled)
    if is_rate:
        result = result / (range_ms / 1000.0)
    return result


def py_holt_winters(values, sf, tf):
    """Python port of funcHoltWinters (functions.go:193-285)."""
    if len(values) < 2:
        return None
    s0, s1 = 0.0, values[0]
    b = values[1] - values[0]
    for i in range(1, len(values)):
        x = sf * values[i]
        if i - 1 == 0:
            trend = b
        else:
            trend = tf * (s1 - s0) + (1 - tf) * b
        b = trend
        y = (1 - sf) * (s1 + b)
        s0, s1 = s1, x + y
    return s1


@pytest.fixture(scope="module")
def random_engine(spark):
    """40 random series: counters with injected resets + noisy gauges,
    irregular timestamps."""
    rng = np.random.RandomState(7)
    rows = []
    for s in range(40):
        kind = "ctr" if s % 2 == 0 else "gauge"
        t = 0
        v = float(rng.randint(0, 50))
        for _ in range(rng.randint(5, 40)):
            t += int(rng.randint(5_000, 120_000))
            if kind == "ctr":
                v += float(rng.exponential(10))
                if rng.rand() < 0.08:
                    v = float(rng.rand() * 5)  # counter reset
            else:
                v = float(rng.standard_normal() * 100)
            rows.append(
                ({"__name__": kind, "series": str(s)}, t, round(v, 3))
            )
    import pyspark

    spark_df = spark.createDataFrame(
        rows, "labels map<string,string>, t long, v double"
    )
    eng = Engine(spark, prepare_samples(spark_df))
    return eng, rows


def _windows(rows, name, eval_ms, range_ms):
    by_series = {}
    for labels, t, v in rows:
        if labels["__name__"] != name:
            continue
        if eval_ms - range_ms <= t <= eval_ms:
            by_series.setdefault(labels["series"], []).append((t, v))
    return {k: sorted(pts) for k, pts in by_series.items()}


@pytest.mark.parametrize("eval_s", [600, 1200, 2000])
def test_rate_matches_reference_port(random_engine, eval_s):
    eng, rows = random_engine
    range_ms = 10 * 60 * 1000
    got = {
        lab["series"]: v
        for lab, v in eng.query_values(f"rate(ctr[10m])", eval_s)
    }
    want = {}
    for series, pts in _windows(rows, "ctr", eval_s * 1000, range_ms).items():
        r = py_extrapolated_rate(
            pts, eval_s * 1000 - range_ms, eval_s * 1000, range_ms, True, True
        )
        if r is not None:
            want[series] = r
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9), k


@pytest.mark.parametrize("eval_s", [900, 1800])
def test_delta_matches_reference_port(random_engine, eval_s):
    eng, rows = random_engine
    range_ms = 15 * 60 * 1000
    got = {
        lab["series"]: v
        for lab, v in eng.query_values(f"delta(gauge[15m])", eval_s)
    }
    want = {}
    for series, pts in _windows(rows, "gauge", eval_s * 1000, range_ms).items():
        r = py_extrapolated_rate(
            pts, eval_s * 1000 - range_ms, eval_s * 1000, range_ms, False, False
        )
        if r is not None:
            want[series] = r
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9), k


def test_holt_winters_matches_reference_port(random_engine):
    eng, rows = random_engine
    eval_s, range_ms = 2000, 30 * 60 * 1000
    got = {
        lab["series"]: v
        for lab, v in eng.query_values("holt_winters(gauge[30m], 0.4, 0.3)", eval_s)
    }
    want = {}
    for series, pts in _windows(rows, "gauge", eval_s * 1000, range_ms).items():
        r = py_holt_winters([v for _, v in pts], 0.4, 0.3)
        if r is not None:
            want[series] = r
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9), k


def test_quantile_matches_go_interpolation(random_engine):
    eng, rows = random_engine
    eval_s = 2000
    for q in (0.1, 0.5, 0.9):
        got = eng.query_values(f"quantile({q}, gauge)", eval_s)
        # latest sample per series within 5m lookback
        latest = {}
        for labels, t, v in rows:
            if labels["__name__"] != "gauge":
                continue
            if eval_s * 1000 - 300_000 <= t <= eval_s * 1000:
                if labels["series"] not in latest or t > latest[labels["series"]][0]:
                    latest[labels["series"]] = (t, v)
        values = sorted(v for _, v in latest.values())
        if not values:
            assert got == []
            continue
        rank = q * (len(values) - 1)
        lo = int(math.floor(rank))
        hi = min(len(values) - 1, lo + 1)
        w = rank - lo
        want = values[lo] * (1 - w) + values[hi] * w
        assert len(got) == 1
        assert got[0][1] == pytest.approx(want, rel=1e-9)


def py_go_quantile(q, values):
    """Port of quantile() (quantile.go:156-183) with the NaN-first
    heap ordering (functions.go:1257-1262)."""
    if not values:
        return math.nan
    if q < 0:
        return -math.inf
    if q > 1:
        return math.inf
    vals = sorted(values, key=lambda x: (not math.isnan(x), x))
    n = len(vals)
    rank = q * (n - 1)
    lo = max(0, math.floor(rank))
    hi = min(n - 1, lo + 1)
    w = rank - math.floor(rank)
    return vals[int(lo)] * (1 - w) + vals[int(hi)] * w


def py_naive_var(values):
    """Port of the one-pass stdvar (engine.go:1359-1407)."""
    s = sq = 0.0
    for v in values:
        s += v
        sq += v * v
    mean = s / len(values)
    return sq / len(values) - mean * mean


@pytest.mark.parametrize("q", [0.0, 0.25, 0.5, 0.9, 1.0])
def test_quantile_agg_matches_reference_port(random_engine, q):
    """quantile() across series incl. NaN samples: the engine must
    reproduce the NaN-first ordering and interpolation arithmetic."""
    eng, rows = random_engine
    eval_s = 1200
    # per-series latest sample within lookback (the selector input)
    latest = {}
    for labels, t, v in rows:
        if labels["__name__"] != "gauge":
            continue
        if t <= eval_s * 1000 and (eval_s * 1000) - t <= 5 * 60 * 1000:
            key = labels["series"]
            if key not in latest or t > latest[key][0]:
                latest[key] = (t, v)
    values = [v for _, v in latest.values()]
    # make some inputs NaN via an engine-side expression: gauge^0.5 of
    # negative values is NaN with the same label sets
    got = eng.query_values(f"quantile({q}, sqrt(gauge))", eval_s)
    want = py_go_quantile(q, [math.sqrt(v) if v >= 0 else math.nan
                              for v in values])
    assert len(got) == 1
    gv = got[0][1]
    if math.isnan(want):
        assert math.isnan(gv)
    else:
        assert gv == pytest.approx(want, rel=1e-12)


def test_stdvar_agg_matches_reference_port(random_engine):
    eng, rows = random_engine
    eval_s = 1200
    latest = {}
    for labels, t, v in rows:
        if labels["__name__"] != "gauge":
            continue
        if t <= eval_s * 1000 and (eval_s * 1000) - t <= 5 * 60 * 1000:
            key = labels["series"]
            if key not in latest or t > latest[key][0]:
                latest[key] = (t, v)
    values = [v for _, v in latest.values()]
    got = eng.query_values("stdvar(gauge)", eval_s)
    want = py_naive_var(values)
    assert len(got) == 1
    # summation order differs (Spark partials vs left fold): allow the
    # relative wobble that reordering float sums can introduce
    assert got[0][1] == pytest.approx(want, rel=1e-9)

    got_ot = eng.query_values("stdvar_over_time(gauge[10m])", eval_s)
    win = _windows(rows, "gauge", eval_s * 1000, 10 * 60 * 1000)
    want_ot = {k: py_naive_var([v for _, v in pts]) for k, pts in win.items()}
    assert {lab["series"]: v for lab, v in got_ot}.keys() == want_ot.keys()
    for lab, v in got_ot:
        assert v == pytest.approx(want_ot[lab["series"]], rel=1e-9)
