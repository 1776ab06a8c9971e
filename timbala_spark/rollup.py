"""Multi-aggregate downsampled rollups with EXACT query routing.

VERDICT r6 #7: at 100 TB a 30-day dashboard re-scans raw samples for
every ``avg_over_time`` refresh. Thanos/Cortex solve this with
compacted downsampling (5m/1h blocks storing count/sum/min/max/counter
per window) and a ``max_source_resolution`` router that serves queries
from the coarsest usable resolution — at the price of *approximate*
results. This engine's posture is exactness, so the router here only
fires when the answer from rollups is **mathematically identical** to
the answer from raw samples, and falls back to the raw path otherwise.

The exactness argument. The vendored engine aggregates samples whose
shifted time lies in the both-ends-inclusive window ``[T-R, T]``
(``engine.go:869``; ``compiler._explode_grid``). Tile raw time into
half-open windows ``[ws, ws+W)`` (``ws = t - t mod W``). If ``W | R``,
``W | (T - offset)`` and (for range queries) ``W | step``, then

    [T-R, T] = [T-R, T) ∪ {T}
             = windows [T-R, ·) ... [T-W, ·)  ∪  {samples at exactly T}

so any decomposable aggregate over ``[T-R, T]`` combines k = R/W
whole-window aggregates plus a *boundary* sub-aggregate of the samples
at exactly time T — which is why each rollup row also stores the
sub-aggregates of its own start-boundary samples (``t == ws``): the
boundary term for step T is the ``s_*`` columns of the window starting
AT T. Count/min/max combine exactly (integer addition and order
statistics are associative); sum/avg combine exactly up to float
re-association — the same reordering Spark's own partial aggregation
already applies to the raw path, and within the vendored engine's
``almostEqual`` comparison.

Routable today: ``sum_over_time`` ``count_over_time`` ``min_over_time``
``max_over_time`` ``avg_over_time`` (the decomposable ``*_over_time``
family). ``stddev/stdvar/quantile_over_time`` need sum-of-squares /
full distributions; ``rate``-family needs per-window counter-reset
chains — both possible extensions, not implemented.

100 TB design notes: ``build_rollup`` is one hash aggregation keyed by
``(series_id, window)`` — map-side partial, no join, output is W/scrape
-interval× smaller than raw (e.g. 20× for 5 m windows at 15 s scrape).
The routed query plan is the SAME shape as the raw plan (scan →
grid-explode → hash aggregate, one exchange) over that much smaller
table; matcher + time + day-partition pushdown all apply because the
rollup table carries the canonical (name, labels, t, day) columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: functions servable from a multi-aggregate rollup, exactly
ROUTABLE_OVER_TIME = frozenset(
    {
        "sum_over_time",
        "count_over_time",
        "min_over_time",
        "max_over_time",
        "avg_over_time",
    }
)


def build_rollup(samples: DataFrame, resolution_ms: int) -> DataFrame:
    """One rollup row per (series, ``resolution_ms`` window) over a
    canonical samples frame.

    Output columns: the canonical identity/selection columns
    (``name``, ``labels``, ``series_id``, ``t`` = window START, plus
    ``day`` for partition pruning) and the aggregate payload:

    * ``cnt``/``sm`` — count (NaN samples included, like
      ``count_over_time``) and float sum (NaN-propagating, like
      ``sum_over_time``) of the window's samples;
    * ``mn``/``mx``/``nan`` — min/max over non-NaN samples (NULL when
      all are NaN) and a had-NaN flag, because the vendored
      ``min/max_over_time`` return NaN if ANY sample is NaN
      (``functions.go`` math.Min/Max semantics);
    * ``s_cnt``/``s_sm``/``s_mn``/``s_mx``/``s_nan`` — the same five,
      restricted to samples at EXACTLY the window start (``t == ws``):
      the boundary term of the inclusive-range decomposition above.

    Stale markers (NULL ``v``) are dropped first — range vectors never
    see them (``engine.go:869``), so neither may rollups.
    """
    w = int(resolution_ms)
    if w <= 0:
        raise ValueError("resolution_ms must be positive")
    base = samples.filter(F.col("v").isNotNull()).selectExpr(
        "*", f"CAST(t - pmod(t, {w}) AS BIGINT) AS _ws"
    )
    out = base.groupBy("series_id", "_ws").agg(
        F.expr("min(name) AS name"),
        F.expr("max_by(labels, t) AS labels"),
        F.expr("count(1) AS cnt"),
        F.expr("sum(v) AS sm"),
        F.expr("min(CASE WHEN NOT isnan(v) THEN v END) AS mn"),
        F.expr("max(CASE WHEN NOT isnan(v) THEN v END) AS mx"),
        F.expr("max(CAST(isnan(v) AS INT)) AS nan"),
        F.expr("sum(CASE WHEN t = _ws THEN 1 ELSE 0 END) AS s_cnt"),
        F.expr("sum(CASE WHEN t = _ws THEN v END) AS s_sm"),
        F.expr(
            "min(CASE WHEN t = _ws AND NOT isnan(v) THEN v END) AS s_mn"
        ),
        F.expr(
            "max(CASE WHEN t = _ws AND NOT isnan(v) THEN v END) AS s_mx"
        ),
        F.expr(
            "max(CASE WHEN t = _ws THEN CAST(isnan(v) AS INT) ELSE 0 END)"
            " AS s_nan"
        ),
    )
    return out.selectExpr(
        "name",
        "labels",
        "series_id",
        "_ws AS t",
        "date_format(timestamp_millis(_ws), 'yyyyMMdd') AS day",
        "cnt", "sm", "mn", "mx", "nan",
        "s_cnt", "s_sm", "s_mn", "s_mx", "s_nan",
    )


def pick_rollup(
    rollups: dict[int, DataFrame] | None,
    range_ms: int,
    offset_ms: int,
    start_ms: int,
    step_ms: int,
    n_steps: int,
    fn_name: str,
) -> int | None:
    """The router predicate: the COARSEST registered resolution whose
    windows tile the query's inclusive ranges exactly (see module
    docstring), or None → raw path. Conditions: ``W | R`` (whole
    windows), ``W | (start - offset)`` (every evaluation timestamp
    lands on a window boundary in raw time) and — when there is more
    than one step — ``W | step`` (so every later step does too)."""
    if not rollups or fn_name not in ROUTABLE_OVER_TIME:
        return None
    best = None
    for w in rollups:
        if w <= 0 or range_ms < w or range_ms % w:
            continue
        if (start_ms - offset_ms) % w:
            continue
        if n_steps > 1 and step_ms % w:
            continue
        if best is None or w > best:
            best = w
    return best
