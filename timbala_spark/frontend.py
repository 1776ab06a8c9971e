"""Range-query results caching: the query-frontend analog.

The engine's compiled-plan cache (``engine.Engine._cached_plan``) keys
on the absolute evaluation timestamps, so a real dashboard — the same
query SHAPE re-issued at an advancing ``now()`` — misses every time
and pays the full driver-side planning cost per refresh (measured at
sf0.01/local[8]: ~470 ms py4j plan construction + ~140 ms Catalyst per
unique-timestamp request vs ~290 ms pure execution; PERF.md).

The Prometheus ecosystem's answer is a caching query frontend in front
of the engine (Cortex/Thanos ``query-frontend``: step-aligned query
splitting + a results cache keyed on aligned intervals). This module
is that design reduced to one node:

* **Quantized evaluation window.** A range request ``(start, end,
  step)`` is widened to ``(a, b, step)`` where ``a ≤ start`` and
  ``b ≥ end`` sit on a quantum grid (quantum = a step multiple,
  auto-sized from the extent) **with the request's step phase
  preserved** (``a ≡ start (mod step)``), so the widened grid is a
  superset of the requested grid. Successive dashboard refreshes that
  advance ``start``/``end`` by less than the quantum map to the SAME
  widened window — one plan, one execution, many requests.
* **Exact restriction.** PromQL range evaluation is per-step
  independent (each grid point evaluates the expression at that
  instant — ``promql/engine.go:1016-1044`` walks the grid), so
  restricting the widened result to ``start ≤ t ≤ end`` reproduces
  the direct evaluation bit-for-bit. The restriction runs driver-side
  on the (≤ 11k-points-per-series, gate-bounded) collected rows.
* **Snapshot-scoped validity.** An ``Engine`` is an immutable snapshot
  of its samples DataFrame (the HTTP layer builds a NEW engine — and
  with it a new ``PromAPI`` and a new cache — whenever a write or a
  maintenance commit invalidates the old one), so cached rows can
  never go stale within their engine's lifetime, including rows at
  grid points past the newest sample. Nothing is ever served across
  engine rebuilds — the Cortex ``max_freshness`` knob collapses away.
* **Exact fallback.** Anything that stops the widened evaluation from
  standing in for the direct one — the widened grid tripping the 11k
  cap, or an evaluation error at a widened-only step (e.g. a
  step-varying ``topk`` k that is NaN outside the requested range) —
  falls back to the direct, uncached path, preserving the reference's
  error behavior exactly.

* **Instant queries at whole seconds share the same cache.** An
  instant query at time ``T`` is exactly the grid point ``T`` of a
  range evaluation whose grid contains ``T`` (per-step independence
  again), so when ``T`` is a multiple of :data:`INSTANT_STEP_MS` the
  API widens it to the enclosing quantum window at that step and
  restricts to the one grid row — advancing-``now()`` instant
  dashboards then hit one fill per quantum instead of paying the
  ~0.4 s direct plan+eval per refresh (PERF.md §13). A ``time`` off
  the 1 s grid lies on no shareable grid and takes the direct path
  (the upstream frontends stop at ``query_range`` entirely; this
  exact-reuse extension is safe for the same restriction reason as
  the range path).
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from collections.abc import Callable

#: auto quantum bounds (seconds): a quarter of the request extent,
#: clamped so tiny requests still share windows and huge ones stay
#: bounded — backward widening is < one quantum (≤ 1 h), forward
#: widening is that same bare alignment plus the unconditional
#: one-quantum prefetch margin, so up to two quanta (≤ 2 h)
MIN_QUANTUM_S = 60.0
MAX_QUANTUM_S = 3600.0

#: grid step for caching INSTANT queries: a request whose ``time`` is
#: a whole multiple of this lands on a shareable widened-window grid;
#: anything finer takes the direct path. 1 s covers the dominant
#: dashboard pattern (clients issue whole-second ``now()``).
INSTANT_STEP_MS = 1000


def quantize_range(
    start_ms: int, end_ms: int, step_ms: int, quantum_ms: int | None = None
) -> tuple[int, int]:
    """Widen ``[start, end]`` to the enclosing quantum-aligned window
    ``[a, b]`` that preserves the step phase: ``a ≤ start``,
    ``b ≥ end``, ``a ≡ start (mod step)`` and ``(b - a)`` a multiple
    of the (step-rounded) quantum — so the widened step grid contains
    every requested grid point and the window is stable while the
    request slides within one quantum."""
    if quantum_ms is None:
        extent = end_ms - start_ms
        quantum_ms = int(
            min(max(extent / 4, MIN_QUANTUM_S * 1000), MAX_QUANTUM_S * 1000)
        )
    # quantum must be a step multiple or the aligned window's grid
    # would drift off the request's phase
    q = -(-max(quantum_ms, step_ms) // step_ms) * step_ms
    phase = start_ms % step_ms
    a = (start_ms - phase) // q * q + phase
    b = a + -(-(end_ms - a) // q) * q if end_ms > a else a
    # Prefetch margin (r8): guarantee at least one quantum PAST end.
    # The dashboard pattern advances end monotonically; with b bare-
    # aligned the forward margin is uniform in [0, q) — zero when end
    # lands on the grid — and every quantum boundary costs a miss.
    # One extra quantum makes an advancing shape hit until a full
    # quantum is consumed, for ~q/extent more rows per fill (the fill
    # is dominated by fixed plan+exec cost, not rows; the 11k-cap
    # fallback still catches grids the margin pushes over). Bare
    # alignment gives b - end in [0, q) always, so the margin is
    # unconditional (r9: the former `if b - end < q` guard was a
    # tautology — asserted instead).
    assert 0 <= b - end_ms < q
    b += q
    return a, b


class RangeResultCache:
    """LRU of collected range-query results keyed on the widened
    window, bounded by total cached ROWS (a matrix result is one row
    per series per step; bounding entries alone would let a few
    high-cardinality results hold arbitrary memory)."""

    def __init__(self, max_rows: int = 2_000_000):
        self.max_rows = max_rows
        self._entries: OrderedDict[tuple, list] = OrderedDict()
        self._rows = 0
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0

    def get_or_fill(self, key: tuple, fill: Callable[[], list]) -> list:
        with self._lock:
            if key in self._entries:
                self._entries.move_to_end(key)
                self.hits += 1
                return self._entries[key]
        # fill outside the lock: a Spark collect must never serialize
        # other requests behind it (concurrent same-key fills are
        # benign — last one wins, both are correct)
        rows = fill()
        with self._lock:
            self.misses += 1
            if len(rows) <= self.max_rows:
                if key not in self._entries:
                    self._rows += len(rows)
                self._entries[key] = rows
                self._entries.move_to_end(key)
                while self._rows > self.max_rows and len(self._entries) > 1:
                    _, old = self._entries.popitem(last=False)
                    self._rows -= len(old)
        return rows


__all__ = [
    "RangeResultCache",
    "quantize_range",
    "MIN_QUANTUM_S",
    "MAX_QUANTUM_S",
    "INSTANT_STEP_MS",
]
