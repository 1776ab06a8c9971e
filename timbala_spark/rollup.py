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

Routable today (r7 extension): the decomposable ``*_over_time``
family — ``sum`` ``count`` ``min`` ``max`` ``avg`` plus ``stddev``/
``stdvar`` (the engine's bug-for-bug naive ``sumsq/n − mean²`` variance
is itself decomposable, so each window also stores the sum of squares)
— AND the extrapolation/pair family ``rate`` ``increase`` ``delta``
``resets`` ``changes``. The pair family decomposes because consecutive
retained-sample pairs either lie within one window (pre-aggregated at
build time into ``corr``/``rst``/``chg`` via the same lag pass the raw
kernel uses) or straddle two *adjacent present* windows — and with the
range tiled by whole windows, the straddling pair is always (last
sample of window i, first sample of window i+1), reconstructed at
query time from the stored ``f_*``/``l_*`` columns by one lag over the
per-step window sequence. first/last/count/reset-counts are
bit-identical; the extrapolation formula is post-aggregation
arithmetic on them, so rate/increase/delta land in the same exactness
class as ``sum`` (float re-association only, in ``corr``).
``irate``/``idelta`` route too: the last two in-range samples are
always reconstructible from the tail window's last/second-last columns
plus the previous present window's last (windows tile time, so no
sample can hide between present windows). ``quantile_over_time`` needs
the full distribution and stays raw-only.

Invariant relied on by the pair family: canonical samples are unique
per ``(series_id, t)`` (``model.prepare_samples`` dup-drop), so a
window's start-boundary sub-aggregate describes at most ONE sample and
``s_sm`` IS that sample's value.

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

#: decomposable *_over_time functions servable from a rollup, exactly
ROUTABLE_OVER_TIME = frozenset(
    {
        "sum_over_time",
        "count_over_time",
        "min_over_time",
        "max_over_time",
        "avg_over_time",
        "stddev_over_time",
        "stdvar_over_time",
    }
)

#: consecutive-pair / extrapolation functions servable from a rollup
#: via within-window pre-aggregates + cross-window lag (r7); irate/
#: idelta ride the same machinery — the last TWO in-range samples are
#: always (tail window's l2, tail window's l) or, when the tail window
#: holds a single in-range sample, (previous present window's l, tail's
#: l), both reconstructible from stored columns
ROUTABLE_PAIR = frozenset(
    {"rate", "increase", "delta", "resets", "changes", "irate", "idelta"}
)

#: sentinel "function" name for the instant-selector/lookback class
#: (r8): the most recent point in the inclusive window ``[T-L, T]``
#: (``engine.go:788-799`` — ``t < refTime - LookbackDelta`` is the
#: REJECT condition, so the left bound is inclusive, same as the range
#: argument; NB this is the vendored 1.x semantics — modern Prometheus
#: later made the bound exclusive). The decomposition: the answer is
#: the boundary sample at exactly T (the ``s_*`` columns of the window
#: starting AT T) if present, else the ``l_*`` columns of the latest
#: present interior window — bit-identical, no float combine at all.
#: Staleness needs ``st_l``/``s_st``: a marker later than the latest
#: sample kills the series.
SELECTOR = "__selector__"

ROUTABLE = ROUTABLE_OVER_TIME | ROUTABLE_PAIR | {SELECTOR}


def build_rollup(samples: DataFrame, resolution_ms: int) -> DataFrame:
    """One rollup row per (series, ``resolution_ms`` window) over a
    canonical samples frame.

    Output columns: the canonical identity/selection columns
    (``name``, ``labels``, ``series_id``, ``t`` = window START, plus
    ``day`` for partition pruning) and the aggregate payload:

    * ``cnt``/``sm``/``sq`` — count (NaN samples included, like
      ``count_over_time``), float sum and float sum of squares
      (NaN-propagating, like ``sum_over_time`` / the naive variance)
      of the window's samples;
    * ``mn``/``mx``/``nan`` — min/max over non-NaN samples (NULL when
      all are NaN) and a had-NaN flag, because the vendored
      ``min/max_over_time`` return NaN if ANY sample is NaN
      (``functions.go`` math.Min/Max semantics);
    * ``f_t``/``f_v``/``l_t``/``l_v`` — the window's first/last sample
      (raw time + value), the combine inputs for the rate family's
      extrapolation (``functions.go:99-119``) and for cross-window
      pair reconstruction;
    * ``l2_t``/``l2_v`` — the window's second-to-last sample (NULL for
      single-sample windows): with the previous present window's
      ``l_*``, reconstructs the last TWO samples of any tiled range
      (irate/idelta, ``functions.go:144-191``);
    * ``corr``/``rst``/``chg`` — consecutive-pair aggregates over pairs
      whose BOTH samples lie in this window, with the raw kernels' NaN
      guards (``compiler._fn_resets/_fn_changes``): counter-reset drop
      sum (rate's correction term), reset count, change count;
    * ``s_cnt``/``s_sm``/``s_sq``/``s_mn``/``s_mx``/``s_nan`` — the
      scalar aggregates restricted to samples at EXACTLY the window
      start (``t == ws``): the boundary term of the inclusive-range
      decomposition above. Pair aggregates need no boundary variant —
      a boundary term holds at most one sample (canonical
      ``(series_id, t)`` uniqueness), hence no within-boundary pairs,
      and its value for cross-window pairing IS ``s_sm``.

    Stale markers (NULL ``v``) are EXCLUDED from every sample-side
    aggregate — range vectors never see them (``engine.go:869``), so
    neither may the range-function payload — but their POSITIONS are
    kept (``st_l``/``s_st``), because the instant selector DOES see
    them (a marker that is the most recent point in the lookback kills
    the series, ``engine.go:797-799``) and the r8 selector router needs
    them. The pair columns add one per-series time sort to the build
    (the same lag window the raw rate kernel runs per QUERY,
    ``_matrix_lagged``); the build stays one shuffle + one hash
    aggregation.
    """
    return _build(samples, resolution_ms, identity=True)


#: the rollup payload columns, in schema order (st_l/s_st: staleness-
#: marker positions, r8 — absent in pre-r8 tables, and the selector
#: router refuses to route from a table without them)
PAYLOAD_COLUMNS = (
    "cnt", "sm", "sq", "mn", "mx", "nan",
    "f_t", "f_v", "l_t", "l_v", "l2_t", "l2_v", "corr", "rst", "chg",
    "s_cnt", "s_sm", "s_sq", "s_mn", "s_mx", "s_nan", "st_l", "s_st",
)


def build_rollup_narrow(
    samples: DataFrame,
    resolution_ms: int,
    day_partitioned: bool = False,
) -> DataFrame:
    """``build_rollup`` over a NARROW samples frame (``series_id``,
    ``t``, ``v`` — the split store's samples side, no name/labels):
    output is ``series_id``, ``t`` (window start), ``day`` + the
    payload columns. The read path joins the store's series dictionary
    to recover name/labels, exactly like ``ingest.read_samples_table``
    — the rollup never duplicates the labels map on disk.

    ``day_partitioned``: the input additionally carries the store's
    physical ``day`` partition column and ``resolution_ms`` divides a
    day. Then no window (and no in-window sample pair — ``pair_in``
    already excludes any pair whose predecessor lies before the window)
    ever crosses a day boundary, so the lag window can partition by
    ``(series_id, day)`` and the output can carry ``day`` VERBATIM:
    bit-identical results, but a filter on ``day`` now pushes below
    the window function all the way into the parquet scan as a
    partition filter. The dirty-generation hybrid read
    (``ingest.read_rollup_tables``) needs this — without it, every
    routed query during a dirty window re-scans ALL live raw days
    regardless of its time range."""
    return _build(
        samples, resolution_ms, identity=False,
        day_partitioned=day_partitioned,
    )


def _build(
    samples: DataFrame,
    resolution_ms: int,
    identity: bool,
    day_partitioned: bool = False,
) -> DataFrame:
    w = int(resolution_ms)
    if w <= 0:
        raise ValueError("resolution_ms must be positive")
    if day_partitioned:
        if 86_400_000 % w:
            raise ValueError(
                "day_partitioned requires a resolution dividing a day"
            )
        if "day" not in samples.columns:
            raise ValueError("day_partitioned requires a day column")
    part = "series_id, day" if day_partitioned else "series_id"
    # stale markers (NULL v) are KEPT as rows (r8): the instant-
    # selector router needs each window's marker positions (st_l /
    # s_st below). Every sample-side aggregate is restricted to
    # retained rows, and the consecutive-pair lag skips markers
    # (IGNORE NULLS), so all pre-r8 payload columns are value-
    # identical to the old drop-markers-first build; the only new
    # rows are marker-ONLY windows (cnt = 0), which every range-
    # function consumer already filters (`_cnt > 0` / `e_cnt > 0`).
    base = (
        samples.selectExpr(
            "*",
            "lag(CASE WHEN v IS NOT NULL THEN t END) IGNORE NULLS"
            f" OVER (PARTITION BY {part} ORDER BY t) AS _pt",
            "lag(CASE WHEN v IS NOT NULL THEN v END) IGNORE NULLS"
            f" OVER (PARTITION BY {part} ORDER BY t) AS _pv",
        )
        .selectExpr("*", f"CAST(t - pmod(t, {w}) AS BIGINT) AS _ws")
    )
    # both ends of the pair are in this window iff the current row is
    # retained and its retained predecessor is in-window (windows tile
    # time and _pt < t)
    pair_in = "(v IS NOT NULL AND _pt IS NOT NULL AND _pt >= _ws)"
    is_reset = f"{pair_in} AND NOT isnan(_pv) AND NOT isnan(v) AND v < _pv"
    is_change = (
        f"{pair_in} AND v != _pv AND NOT (isnan(v) AND isnan(_pv))"
    )
    # ordering key restricted to retained rows: max_by/min_by ignore
    # NULL keys, so trailing markers can never hijack l_v/l2_*
    rt = "(CASE WHEN v IS NOT NULL THEN t END)"
    aggs = []
    if identity:
        aggs += [
            F.expr("min(name) AS name"),
            F.expr("max_by(labels, t) AS labels"),
        ]
    aggs += [
        F.expr("count(v) AS cnt"),
        F.expr("sum(v) AS sm"),
        F.expr("sum(v * v) AS sq"),
        F.expr("min(CASE WHEN NOT isnan(v) THEN v END) AS mn"),
        F.expr("max(CASE WHEN NOT isnan(v) THEN v END) AS mx"),
        F.expr("max(CAST(isnan(v) AS INT)) AS nan"),
        F.expr(f"min({rt}) AS f_t"),
        F.expr(f"min_by(v, {rt}) AS f_v"),
        F.expr(f"max({rt}) AS l_t"),
        F.expr(f"max_by(v, {rt}) AS l_v"),
        # the LAST retained row's in-window predecessor (NULL when the
        # window's last sample is also its first) — max_by keeps the
        # value from the max-key row even when that value is NULL,
        # which is exactly the wanted semantics
        F.expr(f"max_by(CASE WHEN {pair_in} THEN _pt END, {rt}) AS l2_t"),
        F.expr(f"max_by(CASE WHEN {pair_in} THEN _pv END, {rt}) AS l2_v"),
        F.expr(f"sum(CASE WHEN {is_reset} THEN _pv ELSE 0.0D END) AS corr"),
        F.expr(f"sum(CASE WHEN {is_reset} THEN 1.0D ELSE 0.0D END) AS rst"),
        F.expr(f"sum(CASE WHEN {is_change} THEN 1.0D ELSE 0.0D END) AS chg"),
        F.expr(
            "sum(CASE WHEN t = _ws AND v IS NOT NULL THEN 1 ELSE 0 END)"
            " AS s_cnt"
        ),
        F.expr("sum(CASE WHEN t = _ws THEN v END) AS s_sm"),
        F.expr("sum(CASE WHEN t = _ws THEN v * v END) AS s_sq"),
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
        # staleness-marker positions (r8, instant-selector routing):
        # last marker time in the window, and a marker-at-window-start
        # flag (the boundary term — a marker at exactly the evaluation
        # time kills the series, engine.go:797-799 IsStaleNaN)
        F.expr("max(CASE WHEN v IS NULL THEN t END) AS st_l"),
        F.expr(
            "max(CASE WHEN t = _ws AND v IS NULL THEN 1 ELSE 0 END)"
            " AS s_st"
        ),
    ]
    keys = ["series_id", "_ws"] + (["day"] if day_partitioned else [])
    out = base.groupBy(*keys).agg(*aggs)
    head = ["name", "labels"] if identity else []
    # day_partitioned carries the grouping key verbatim (window day ==
    # sample day when W divides a day) so it stays the scan's physical
    # partition column for pushdown; otherwise derive it from _ws
    day = (
        "day"
        if day_partitioned
        else "date_format(timestamp_millis(_ws), 'yyyyMMdd') AS day"
    )
    return out.selectExpr(
        *head,
        "series_id",
        "_ws AS t",
        day,
        *PAYLOAD_COLUMNS,
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
    if not rollups or fn_name not in ROUTABLE:
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
