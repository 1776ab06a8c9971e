"""Engine: the public query API.

Mirrors the reference's two evaluation entry points
(``internal/api/v1/api.go:142-250``):

* ``query(promql, ts)``           — instant query at one timestamp
* ``query_range(promql, start, end, step)`` — range query over a step grid

Both return a DataFrame ``(labels map<string,string>, t long-ms,
v double)``; scalars come back as a single (or per-step) row with empty
labels.  Timestamps are Unix **seconds** (float ok) like the HTTP API;
milliseconds internally like the reference engine.
"""

from __future__ import annotations

import threading
from collections import OrderedDict

from pyspark.sql import DataFrame, SparkSession, functions as F

from .compiler import (
    EvalContext,
    PromQLBadQueryError,
    PromQLEvalError,
    ScalarValue,
    StringValue,
    VectorValue,
    _base_scan,
    compile_query,
)
from .model import DEFAULT_LOOKBACK_MS, canonical_labels_expr, prepare_samples
from .promql.ast import MatrixSelector, ParenExpr, ValueType
from .promql.parser import parse

#: Range-query guard: ≤11,000 grid INTERVALS per series — the
#: reference's check divides durations (``end.Sub(start)/step > 11000``,
#: ``internal/api/v1/api.go:211-216``), so its largest accepted grid is
#: actually 11,001 points while the message says 11,000; both quirks
#: are reproduced.
MAX_POINTS_PER_SERIES = 11000


class Engine:
    def __init__(
        self,
        spark: SparkSession,
        samples: DataFrame,
        lookback_ms: int = DEFAULT_LOOKBACK_MS,
        strict: bool = True,
        max_points: int = MAX_POINTS_PER_SERIES,
        prepare: bool = False,
        rollups: dict | None = None,
    ):
        """``samples`` must be in the canonical long format
        (``model.SAMPLES_SCHEMA``); pass ``prepare=True`` to normalize an
        arbitrary (labels, t, v) frame.

        ``rollups`` (opt-in): ``{resolution_ms: rollup_df}`` built by
        :func:`timbala_spark.rollup.build_rollup` over the SAME samples
        — decomposable ``*_over_time`` calls whose ranges tile exactly
        are served from the downsampled table with identical results
        (see that module's exactness argument); everything else falls
        back to the raw path automatically."""
        self.spark = spark
        self.samples = prepare_samples(samples) if prepare else samples
        self.lookback_ms = lookback_ms
        self.strict = strict
        self.max_points = max_points
        self.rollups = rollups
        # Compiled-plan cache: identical (promql, grid) requests return
        # the SAME DataFrame object, so Catalyst analysis/optimization
        # runs once per distinct query shape — the analog of the
        # reference parsing the expression once per request but our
        # driver-side planning being the measured per-query overhead
        # (PERF.md §6). Safe because `samples` is fixed for an Engine's
        # lifetime (the HTTP layer rebuilds the Engine on writes) and a
        # DataFrame is immutable. `plan_cache_size=0` disables.
        self.plan_cache_size = 128
        self._plan_cache: "OrderedDict[tuple, DataFrame]" = OrderedDict()
        self._plan_lock = threading.Lock()

    def _cached_plan(self, key: tuple, build) -> DataFrame:
        if self.plan_cache_size <= 0:
            return build()
        with self._plan_lock:
            if key in self._plan_cache:
                self._plan_cache.move_to_end(key)
                return self._plan_cache[key]
        df = build()
        with self._plan_lock:
            self._plan_cache[key] = df
            self._plan_cache.move_to_end(key)
            while len(self._plan_cache) > self.plan_cache_size:
                self._plan_cache.popitem(last=False)
        return df

    # -- public API ----------------------------------------------------
    def query(self, promql: str, ts: float, sorted: bool = False) -> DataFrame:
        """Instant query at unix-seconds ``ts`` (api.go:142-185).

        ``sorted=True`` appends the canonical (label-set, t) output
        order as a Spark-side sort — an all-to-one stage that a
        programmatic caller composing further transformations never
        needs (and the one serialization point in an otherwise
        shuffle-minimal plan at scale). The HTTP layer orders its
        (collected, bounded) wire output driver-side instead."""
        t_ms = _to_ms(ts)
        return self._cached_plan(
            ("i", promql, t_ms, sorted), lambda: self._query(promql, t_ms, sorted)
        )

    def _query(self, promql: str, t_ms: int, sorted: bool) -> DataFrame:
        expr = parse(promql)
        ctx = self._ctx(t_ms, t_ms, 1)
        inner = _unparen(expr)
        if isinstance(inner, MatrixSelector):
            return self._matrix_result(inner, ctx, sorted)
        val = compile_query(expr, ctx)
        return self._shape(val, ctx, sorted)

    def query_range(
        self,
        promql: str,
        start: float,
        end: float,
        step: float,
        sorted: bool = False,
    ) -> DataFrame:
        """Range query; ``step`` in seconds (api.go:187-250).
        ``sorted``: see :meth:`query`."""
        start_ms, end_ms, step_ms = _to_ms(start), _to_ms(end), _to_ms(step)
        return self._cached_plan(
            ("r", promql, start_ms, end_ms, step_ms, sorted),
            lambda: self._query_range(promql, start_ms, end_ms, step_ms, sorted),
        )

    def _query_range(
        self, promql: str, start_ms: int, end_ms: int, step_ms: int, sorted: bool
    ) -> DataFrame:
        expr = parse(promql)
        if expr.type not in (ValueType.SCALAR, ValueType.VECTOR):
            # NewRangeQuery's verbatim message (engine.go:271): the
            # documentedType quoted %q, capital-S Scalar / capital-V
            # Vector — our ValueType values ARE the documented names
            raise PromQLBadQueryError(
                f'invalid expression type "{expr.type.value}" for range '
                "query, must be Scalar or instant Vector"
            )
        if step_ms <= 0:
            raise PromQLBadQueryError("zero or negative query resolution step")
        # boundary matches api.go:211-216 exactly: `end.Sub(start)/step
        # > 11000` counts INTERVALS, so a grid of 11,001 points is the
        # largest the reference accepts (its message undercounts by
        # one — kept verbatim, comma grouping and all)
        if (end_ms - start_ms) // step_ms > self.max_points:
            raise PromQLBadQueryError(
                f"exceeded maximum resolution of {self.max_points:,} "
                "points per timeseries. Try decreasing the query "
                "resolution (?step=XX)"
            )
        ctx = self._ctx(start_ms, end_ms, step_ms)
        val = compile_query(expr, ctx)
        return self._shape(val, ctx, sorted)

    def explain(self, promql: str, start: float, end: float, step: float) -> None:
        """Print the physical plan for a range query (debug/perf tool)."""
        self.query_range(promql, start, end, step).explain("formatted")

    # -- internals ------------------------------------------------------
    def _ctx(self, start_ms: int, end_ms: int, step_ms: int) -> EvalContext:
        return EvalContext(
            self.spark,
            self.samples,
            start_ms,
            end_ms,
            step_ms,
            lookback_ms=self.lookback_ms,
            strict=self.strict,
            rollups=self.rollups,
        )

    def _shape(self, val, ctx: EvalContext, sorted_out: bool = False) -> DataFrame:
        if isinstance(val, VectorValue):
            out = val.df.select(
                F.col("labels"),
                F.col("step_t").alias("t"),
                F.col("v").cast("double").alias("v"),
            )
            if val.ordered:  # sort()/sort_desc() define the output order
                return out
            if sorted_out:
                return out.orderBy(
                    canonical_labels_expr(F.col("labels")), F.col("t")
                )
            return out
        if isinstance(val, ScalarValue):
            sdf = ctx.scalar_df(val)
            empty_map = F.map_from_arrays(
                F.array().cast("array<string>"), F.array().cast("array<string>")
            )
            out = sdf.select(
                empty_map.alias("labels"),
                F.col("step_t").alias("t"),
                F.col("v").cast("double").alias("v"),
            )
            return out.orderBy("t") if sorted_out else out
        if isinstance(val, StringValue):
            raise PromQLEvalError(
                "string results are driver-side values; use parse() directly"
            )
        raise PromQLEvalError(f"unexpected value {type(val).__name__}")

    def _matrix_result(
        self, ms: MatrixSelector, ctx: EvalContext, sorted_out: bool = False
    ) -> DataFrame:
        """Top-level `m[5m]` instant query → raw samples in the window
        (engine.go:836-892)."""
        lo = ctx.start - ms.range_ms - ms.offset_ms
        hi = ctx.end - ms.offset_ms
        base = _base_scan(ctx, ms.name, ms.matchers, lo, hi)
        base = base.filter(F.col("v").isNotNull())  # stale markers
        out = base.select(
            "labels",
            (F.col("t") + F.lit(ms.offset_ms)).alias("t"),
            F.col("v").cast("double").alias("v"),
        )
        if sorted_out:
            return out.orderBy(canonical_labels_expr(F.col("labels")), F.col("t"))
        return out

    # convenience for tests / smoke checks
    def query_values(self, promql: str, ts: float):
        """Instant query → list of (labels dict, value) pairs."""
        rows = self.query(promql, ts).collect()
        return [(dict(r["labels"]), r["v"]) for r in rows]


def _to_ms(ts: float) -> int:
    return int(round(float(ts) * 1000))


def _unparen(e):
    while isinstance(e, ParenExpr):
        e = e.expr
    return e
