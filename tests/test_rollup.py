"""Exact rollup routing (timbala_spark.rollup, VERDICT r6 #7).

The bar: for every ANSWERABLE shape, the routed engine must return the
raw engine's answer — count/min/max bit-identical, sum/avg within
float re-association (the same reordering Spark's partial aggregation
already applies) — and every non-answerable shape must silently take
the raw path. A poisoned-rollup probe proves routing genuinely fires.
"""

import math
import random

import pytest
from pyspark.sql import functions as F

from timbala_spark.engine import Engine
from timbala_spark.model import prepare_samples
from timbala_spark.rollup import ROUTABLE_OVER_TIME, build_rollup, pick_rollup

W = 300_000  # 5m rollup
T0 = 1_700_000_100_000 - (1_700_000_100_000 % W)  # W-aligned epoch
FNS = sorted(ROUTABLE_OVER_TIME)


def _mk_samples(spark):
    """4 series x 4h of samples at IRREGULAR intervals, deliberately
    including window-boundary-aligned timestamps (the inclusive-range
    corner the s_* columns exist for) and NaN values."""
    random.seed(7)
    rows = []
    for s in range(4):
        t = T0
        while t < T0 + 4 * 3_600_000:
            v = float("nan") if random.random() < 0.04 else random.uniform(-5, 50)
            rows.append(({"__name__": "m", "i": str(s)}, int(t), v))
            t += random.choice([15_000, 60_000, 150_000, 300_000])
    return prepare_samples(
        spark.createDataFrame(
            rows, "labels map<string,string>, t long, v double"
        )
    )


@pytest.fixture(scope="module")
def engines(spark):
    df = _mk_samples(spark).cache()
    df.count()
    ru = build_rollup(df, W).cache()
    ru.count()
    return Engine(spark, df), Engine(spark, df, rollups={W: ru})


def _canon(res):
    return {
        (tuple(sorted(r["labels"].items())), r["t"]): r["v"]
        for r in res.collect()
    }


def _same(a, b, exact):
    if set(a) != set(b):
        return False
    for k in a:
        x, y = a[k], b[k]
        if math.isnan(x) or math.isnan(y):
            if not (math.isnan(x) and math.isnan(y)):
                return False
        elif exact:
            if x != y:
                return False
        elif x != y and abs(x - y) > 1e-9 * max(1.0, abs(x)):
            return False
    return True


class TestRoutedEqualsRaw:
    # count/min/max combine through integer addition and order
    # statistics — bit-identical; sum/avg re-associate float addition
    EXACT = {"count_over_time", "min_over_time", "max_over_time"}

    @pytest.mark.parametrize("fn", FNS)
    @pytest.mark.parametrize(
        "rng_ms,step_s,off_ms",
        [
            (600_000, 300, 0),  # 10m range, W-stride steps
            (1_800_000, 600, 0),  # 30m range, 2W steps
            (3_600_000, 900, 600_000),  # 1h range, offset 10m
            (300_000, 300, 0),  # range == exactly one window
        ],
        ids=["10m", "30m/2W", "1h+off", "R=W"],
    )
    def test_answerable_range_shapes(self, engines, fn, rng_ms, step_s, off_ms):
        raw, routed = engines
        start, end = T0 + 3_600_000, T0 + 3 * 3_600_000
        # the shape must actually route — a silent fallback would make
        # this test vacuous
        assert (
            pick_rollup(
                routed.rollups, rng_ms, off_ms, start, step_s * 1000,
                (end - start) // (step_s * 1000) + 1, fn,
            )
            == W
        )
        rng = f"{rng_ms // 60000}m"
        off = f" offset {off_ms // 60000}m" if off_ms else ""
        q = f"{fn}(m[{rng}]{off})"
        a = _canon(raw.query_range(q, start / 1000, end / 1000, step_s))
        b = _canon(routed.query_range(q, start / 1000, end / 1000, step_s))
        assert a, "empty result would prove nothing"
        assert _same(a, b, exact=fn in self.EXACT), q

    @pytest.mark.parametrize("fn", FNS)
    def test_answerable_instant(self, engines, fn):
        raw, routed = engines
        t = (T0 + 2 * 3_600_000) / 1000  # aligned whole-window instant
        q = f"{fn}(m[30m])"
        a = _canon(raw.query(q, t))
        b = _canon(routed.query(q, t))
        assert a and _same(a, b, exact=fn in self.EXACT)

    def test_routing_actually_fires_poisoned_probe(self, engines, spark):
        """Give an engine a rollup whose sums are wrong: an ANSWERABLE
        query must now return the wrong answer (proving the rollup was
        used), while a NON-answerable one still matches raw (proving
        the fallback ignores the poison)."""
        raw, routed = engines
        poisoned_df = routed.rollups[W].withColumn(
            "sm", F.col("sm") + F.lit(1000.0)
        ).withColumn("s_sm", F.col("s_sm") + F.lit(1000.0))
        poisoned = Engine(spark, raw.samples, rollups={W: poisoned_df})
        start, end = T0 + 3_600_000, T0 + 2 * 3_600_000
        a = _canon(raw.query_range("sum_over_time(m[10m])", start / 1000, end / 1000, 300))
        b = _canon(
            poisoned.query_range("sum_over_time(m[10m])", start / 1000, end / 1000, 300)
        )
        assert not _same(a, b, exact=False)  # poison visible => routed
        # misaligned range -> raw path, poison invisible
        a = _canon(raw.query_range("sum_over_time(m[7m])", start / 1000, end / 1000, 300))
        b = _canon(
            poisoned.query_range("sum_over_time(m[7m])", start / 1000, end / 1000, 300)
        )
        assert _same(a, b, exact=True)

    def test_nested_expression_routes_inner_call(self, engines):
        """Routing happens at the Call node, so surrounding operators
        (aggregation, binops) compose over the routed result."""
        raw, routed = engines
        start, end = T0 + 3_600_000, T0 + 2 * 3_600_000
        q = "sum by (i) (count_over_time(m[10m])) * 2"
        a = _canon(raw.query_range(q, start / 1000, end / 1000, 300))
        b = _canon(routed.query_range(q, start / 1000, end / 1000, 300))
        assert a and _same(a, b, exact=True)


class TestPairFamilyRoutedEqualsRaw:
    """rate/increase/delta/resets/changes served from rollups (r7).

    delta/resets/changes are bit-identical (first/last/counts combine
    exactly and the extrapolation arithmetic runs on identical
    doubles); rate/increase re-associate the float correction sum."""

    EXACT = {"delta", "resets", "changes", "irate", "idelta"}
    FNS = ["rate", "increase", "delta", "resets", "changes", "irate", "idelta"]

    @pytest.mark.parametrize("fn", FNS)
    @pytest.mark.parametrize(
        "rng_ms,step_s,off_ms",
        [
            (600_000, 300, 0),
            (1_800_000, 600, 0),
            (3_600_000, 900, 600_000),
            (300_000, 300, 0),  # R == W: one full window + boundary
        ],
        ids=["10m", "30m/2W", "1h+off", "R=W"],
    )
    def test_answerable_range_shapes(self, engines, fn, rng_ms, step_s, off_ms):
        raw, routed = engines
        start, end = T0 + 3_600_000, T0 + 3 * 3_600_000
        assert (
            pick_rollup(
                routed.rollups, rng_ms, off_ms, start, step_s * 1000,
                (end - start) // (step_s * 1000) + 1, fn,
            )
            == W
        )
        rng = f"{rng_ms // 60000}m"
        off = f" offset {off_ms // 60000}m" if off_ms else ""
        q = f"{fn}(m[{rng}]{off})"
        a = _canon(raw.query_range(q, start / 1000, end / 1000, step_s))
        b = _canon(routed.query_range(q, start / 1000, end / 1000, step_s))
        assert a, "empty result would prove nothing"
        assert _same(a, b, exact=fn in self.EXACT), q

    @pytest.mark.parametrize("fn", FNS)
    def test_answerable_instant(self, engines, fn):
        raw, routed = engines
        t = (T0 + 2 * 3_600_000) / 1000
        q = f"{fn}(m[30m])"
        a = _canon(raw.query(q, t))
        b = _canon(routed.query(q, t))
        assert a and _same(a, b, exact=fn in self.EXACT)

    def test_counter_semantics_on_real_counter(self, engines, spark):
        """A monotonic-with-resets counter series: the corr term must
        reconstruct identically from within-window pre-aggregates plus
        cross-window boundary drops — including a reset that happens
        exactly ACROSS a window boundary and one exactly AT a boundary
        sample."""
        rows, v, t = [], 0.0, T0
        for i in range(400):
            # resets at varied phases relative to the 5m windows,
            # including one landing exactly on a window-start sample
            v = 0.0 if i % 37 == 0 and i else v + (i % 7) + 0.25
            rows.append(({"__name__": "c"}, int(t), float(v)))
            t += 75_000  # W/4: every 4th sample on a boundary
        df = prepare_samples(
            spark.createDataFrame(
                rows, "labels map<string,string>, t long, v double"
            )
        ).cache()
        ru = build_rollup(df, W).cache()
        raw, routed = Engine(spark, df), Engine(spark, df, rollups={W: ru})
        start, end = T0 + 3_600_000, T0 + 6 * 3_600_000
        for q in ("rate(c[30m])", "increase(c[1h])", "resets(c[30m])"):
            a = _canon(raw.query_range(q, start / 1000, end / 1000, 600))
            b = _canon(routed.query_range(q, start / 1000, end / 1000, 600))
            assert a and _same(a, b, exact=q.startswith("resets")), q

    def test_sparse_series_cross_window_gaps(self, engines, spark):
        """Windows with gaps between them: the cross-window pair is
        (last of window i, first of window j) for NON-adjacent present
        windows too — the lag is over present rows, mirroring raw
        consecutiveness."""
        rows = [
            ({"__name__": "g"}, int(T0 + dt), val)
            for dt, val in [
                (0, 10.0), (60_000, 4.0),          # window 0: reset in-window
                (3 * W, 2.0),                       # gap; drop 4->2 across
                (3 * W + 150_000, 7.0),
                (7 * W, 1.0),                       # another gap, drop 7->1
                (8 * W, 9.0),                       # boundary-aligned
            ]
        ]
        df = prepare_samples(
            spark.createDataFrame(
                rows, "labels map<string,string>, t long, v double"
            )
        )
        ru = build_rollup(df, W)
        raw, routed = Engine(spark, df), Engine(spark, df, rollups={W: ru})
        end = T0 + 8 * W
        for q in ("increase(g[40m])", "delta(g[40m])", "resets(g[40m])",
                  "changes(g[40m])", "irate(g[40m])", "idelta(g[40m])"):
            a = _canon(raw.query(q, end / 1000))
            b = _canon(routed.query(q, end / 1000))
            assert a and _same(a, b, exact=not q.startswith("increase")), q


class TestPickRollup:
    RU = {300_000: "r5m", 600_000: "r10m"}

    def test_alignment_conditions(self):
        t1 = T0 - (T0 % 600_000)  # aligned to BOTH resolutions
        ok = dict(rollups=self.RU, range_ms=600_000, offset_ms=0,
                  start_ms=t1, step_ms=600_000, n_steps=10,
                  fn_name="sum_over_time")
        assert pick_rollup(**ok) == 600_000  # coarsest wins
        # range not a multiple of the coarse resolution -> finer one
        assert pick_rollup(**{**ok, "range_ms": 900_000}) == 300_000
        # nothing divides -> raw
        assert pick_rollup(**{**ok, "range_ms": 450_000}) is None
        # misaligned start
        assert pick_rollup(**{**ok, "start_ms": t1 + 1000}) is None
        # offset realigns start: (start - offset) % W is the test
        assert pick_rollup(**{**ok, "start_ms": t1 + 1000, "offset_ms": 1000}) == 600_000
        # step misaligned matters only for n_steps > 1
        assert pick_rollup(**{**ok, "step_ms": 450_000}) is None
        assert pick_rollup(**{**ok, "step_ms": 450_000, "n_steps": 1}) == 600_000
        # range smaller than every resolution
        assert pick_rollup(**{**ok, "range_ms": 150_000}) is None
        # non-routable function / no rollups registered
        assert pick_rollup(**{**ok, "fn_name": "quantile_over_time"}) is None
        assert pick_rollup(**{**ok, "fn_name": "holt_winters"}) is None
        assert pick_rollup(**{**ok, "rollups": None}) is None
        # the pair family routes under the same tiling conditions (r7)
        assert pick_rollup(**{**ok, "fn_name": "rate"}) == 600_000
        assert pick_rollup(**{**ok, "fn_name": "irate"}) == 600_000
        assert pick_rollup(**{**ok, "fn_name": "changes", "range_ms": 450_000}) is None


class TestBuildRollup:
    def test_boundary_columns_and_stale_filter(self, spark):
        rows = [
            ({"__name__": "m"}, T0, 1.0),  # exactly on the boundary
            ({"__name__": "m"}, T0 + 1000, 2.0),
            ({"__name__": "m"}, T0 + W, 8.0),  # next window's boundary
        ]
        df = prepare_samples(
            spark.createDataFrame(
                rows, "labels map<string,string>, t long, v double"
            )
        )
        # add a stale marker (NULL v): must not appear in any aggregate
        stale = df.limit(1).withColumn("v", F.lit(None).cast("double")).withColumn(
            "t", F.lit(T0 + 2000).cast("long")
        )
        ru = {
            r["t"]: r
            for r in build_rollup(df.unionByName(stale), W).collect()
        }
        w0, w1 = ru[T0], ru[T0 + W]
        assert (w0["cnt"], w0["sm"]) == (2, 3.0)  # stale row excluded
        assert (w0["s_cnt"], w0["s_sm"]) == (1, 1.0)  # boundary sample
        assert (w1["cnt"], w1["s_cnt"], w1["s_sm"]) == (1, 1, 8.0)
        assert w0["mn"] == 1.0 and w0["mx"] == 2.0 and w0["nan"] == 0

    def test_day_partitioned_build_is_bit_identical(self, spark):
        """The (series_id, day)-partitioned lag window (the pruning
        mode the dirty hybrid read and compaction use) must produce
        EXACTLY the plain build's rows for a day-divisible resolution:
        randomized series crossing several UTC day boundaries, with
        NaNs, stale markers, boundary-aligned samples, and counter
        resets. Pairs whose predecessor lies in the previous day are
        excluded by pair_in either way — this pins that argument."""
        from timbala_spark.model import utc_day_expr
        from timbala_spark.rollup import PAYLOAD_COLUMNS, build_rollup_narrow

        day = 86_400_000
        w = 3_600_000
        d0 = (1_700_000_000_000 // day) * day
        random.seed(13)
        rows = []
        for s in range(3):
            t = d0 - 2 * w  # start before the first day boundary
            v = 0.0
            while t < d0 + 2 * day + 2 * w:
                v = 0.0 if random.random() < 0.03 else v + random.random()
                val = float("nan") if random.random() < 0.05 else v
                if random.random() < 0.02:
                    val = None  # stale marker
                rows.append((s, int(t), val))
                # hit exact day/window boundaries often
                t += random.choice([1, w - 1, w, day - t % day or w, 137_000])
        df = spark.createDataFrame(
            rows, "series_id long, t long, v double"
        ).withColumn("day", utc_day_expr(F.col("t")))
        plain = build_rollup_narrow(df.select("series_id", "t", "v"), w)
        fast = build_rollup_narrow(df, w, day_partitioned=True)

        def canon(r):
            out = {}
            for row in r.collect():
                key = (row["series_id"], row["t"], str(row["day"]))
                out[key] = tuple(
                    None
                    if row[c] is None
                    else ("nan" if isinstance(row[c], float)
                          and math.isnan(row[c]) else row[c])
                    for c in PAYLOAD_COLUMNS
                )
            return out
        a, b = canon(plain), canon(fast)
        assert set(a) == set(b)
        for k in a:
            assert a[k] == b[k], (k, a[k], b[k])

    def test_day_partitioned_validation(self, spark):
        from timbala_spark.rollup import build_rollup_narrow

        df = spark.createDataFrame(
            [(1, 0, 1.0)], "series_id long, t long, v double"
        )
        with pytest.raises(ValueError, match="day column"):
            build_rollup_narrow(df, 3_600_000, day_partitioned=True)
        with pytest.raises(ValueError, match="dividing a day"):
            build_rollup_narrow(
                df.withColumn("day", F.lit("19700101")),
                7_000_000,
                day_partitioned=True,
            )
