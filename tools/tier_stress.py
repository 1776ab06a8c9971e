"""Retention-tier stress: the 100 TB dashboard-over-expired-raw story
(PERF.md §16 tiers extension).

Builds a DAYS-day dense counter store, materializes a 1 h rollup into
the compacted generation, then measures the wide-range routable
dashboard shapes RAW vs ROUTED interleaved in one session (the §10
noise discipline), applies a retention tier (keep RAW_KEEP_DAYS of
raw, archive the 1 h rollups for the full span), re-times the routed
shapes over the now-partially-expired range, and asserts the answers
did not move (tolerance 1e-9 relative — rate's correction sum may
re-associate).

Also reports the store's byte footprint before/after: the tier's
storage claim (a year of rollups ~ weeks of raw) made measurable.

Run:  python tools/tier_stress.py
Env:  STRESS_N (default 10M samples), STRESS_DAYS (30),
      RAW_KEEP_DAYS (7), SPARK_GRAFT_CPUS (32), STRESS_KEEP
Prints one JSON line.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("STRESS_N", 10_000_000))
DAYS = int(os.environ.get("STRESS_DAYS", 30))
RAW_KEEP_DAYS = int(os.environ.get("RAW_KEEP_DAYS", 7))
METRICS = 10
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
DAY_MS = 86_400_000
BASE_MS = (1_700_000_000_000 // DAY_MS) * DAY_MS  # UTC-day-aligned
INTERVAL_S = 259  # prime scrape interval: no step aliasing
W = 3_600_000  # 1 h rollup


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _gen_footprint(store: str) -> tuple[int, int]:
    """(raw+dict bytes, rollup bytes) of the CURRENT generation only —
    retired generations awaiting GC grace and their hardlinked twins
    must not count."""
    from timbala_spark.streaming.store import resolve_store

    gdir = os.path.dirname(resolve_store(store).samples)
    raw = rollup = 0
    for entry in os.listdir(gdir):
        p = os.path.join(gdir, entry)
        if not os.path.isdir(p):
            continue
        if entry.startswith("rollup-"):
            rollup += _du(p)
        else:
            raw += _du(p)
    return raw, rollup


def _canon(df):
    return {
        (tuple(sorted(r["labels"].items())), r["t"]): r["v"]
        for r in df.collect()
    }


def _same(a, b):
    if set(a) != set(b):
        return False
    for k in a:
        x, y = a[k], b[k]
        if math.isnan(x) or math.isnan(y):
            if not (math.isnan(x) and math.isnan(y)):
                return False
        elif not (x == y or abs(x - y) <= 1e-9 * max(1.0, abs(x))):
            return False
    return True


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from timbala_spark import Engine, prepare_samples
    from timbala_spark.streaming.compact import (
        apply_retention,
        compact_store,
    )
    from timbala_spark.streaming.ingest import (
        read_rollup_tables,
        read_samples_table,
        write_samples_batch,
    )

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("tier-stress")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )

    samples_per_series = DAYS * 86_400 // INTERVAL_S
    n_series = max(N // samples_per_series, 1)
    instances = max(n_series // METRICS, 1)
    n_rows = METRICS * instances * samples_per_series
    store = tempfile.mkdtemp(prefix="tier_stress_")
    print(
        f"tier: building {n_rows} samples, {METRICS} x {instances} series, "
        f"{DAYS} days @ {INTERVAL_S}s -> {store}",
        file=sys.stderr,
    )
    sid = F.col("id") % (METRICS * instances)
    k = (F.col("id") / (METRICS * instances)).cast("long")
    metric = F.concat(F.lit("m_"), (sid % METRICS).cast("string"))
    inst = F.concat(F.lit("i"), (sid / METRICS).cast("long").cast("string"))
    t_ms = F.lit(BASE_MS) + (k * INTERVAL_S + (sid % INTERVAL_S)) * 1000
    v = ((t_ms - BASE_MS) / 1000.0 * (1 + sid % 5)) % 100_000
    raw_df = spark.range(n_rows).select(
        F.map_from_arrays(
            F.array(F.lit("__name__"), F.lit("instance"), F.lit("job")),
            F.array(metric, inst, F.lit("stress")),
        ).alias("labels"),
        t_ms.cast("long").alias("t"),
        v.cast("double").alias("v"),
    )
    t0 = time.monotonic()
    write_samples_batch(prepare_samples(raw_df), store)
    compact_store(spark, store, rollup_ms=(W,))
    build_s = round(time.monotonic() - t0, 1)

    bytes_raw_full, bytes_rollup = _gen_footprint(store)

    def engines():
        samples = read_samples_table(spark, store)
        ru = read_rollup_tables(spark, store)
        assert ru, "rollups must be servable"
        raw_e = Engine(spark, samples)
        routed_e = Engine(spark, samples, rollups=ru)
        raw_e.plan_cache_size = routed_e.plan_cache_size = 0
        return raw_e, routed_e

    raw_eng, routed_eng = engines()
    end_ms = BASE_MS + DAYS * DAY_MS
    end_s, day = end_ms / 1000.0, 86_400.0
    span = (DAYS - 2) * day  # leave the first grid windows fully covered
    # every shape tiles the 1 h rollup: range % 1h == 0, step % 1h == 0,
    # W-aligned start
    shapes = {
        "sum_rate_6h_fullspan_6h_step": lambda e: e.query_range(
            "sum by (instance) (rate(m_0[6h]))", end_s - span, end_s, 6 * 3600
        ),
        "increase_1d_fullspan_12h_step": lambda e: e.query_range(
            "sum(increase(m_0[1d]))", end_s - span, end_s, 12 * 3600
        ),
        "avg_ot_1d_fullspan_1d_step": lambda e: e.query_range(
            "avg_over_time(m_0[1d])", end_s - span, end_s, 86_400
        ),
        "resets_1d_fullspan_12h_step": lambda e: e.query_range(
            "sum(resets(m_0[1d]))", end_s - span, end_s, 12 * 3600
        ),
    }

    def timed(fn, eng):
        runs = []
        for _ in range(4):
            t1 = time.monotonic()
            fn(eng).collect()
            runs.append(round(time.monotonic() - t1, 2))
        return statistics.median(runs[1:]), runs

    pre = {}
    for name, fn in shapes.items():
        # interleave raw/routed reps in one session (PERF §10)
        raw_med, raw_runs = timed(fn, raw_eng)
        routed_med, routed_runs = timed(fn, routed_eng)
        pre[name] = {"raw_s": raw_med, "routed_s": routed_med}
        print(
            f"tier: {name}: raw {raw_med}s {raw_runs} | "
            f"routed {routed_med}s {routed_runs}",
            file=sys.stderr,
        )
    baseline = {n: _canon(fn(routed_eng)) for n, fn in shapes.items()}

    # the tier: keep RAW_KEEP_DAYS of raw, archive 1 h rollups in full
    t0 = time.monotonic()
    dropped = apply_retention(
        store, end_ms - RAW_KEEP_DAYS * DAY_MS, rollup_min_t_ms=BASE_MS
    )
    retention_s = round(time.monotonic() - t0, 1)
    assert len(dropped) == DAYS - RAW_KEEP_DAYS, dropped

    bytes_raw_kept, bytes_archive = _gen_footprint(store)

    _raw2, routed2 = engines()
    post = {}
    mismatches = []
    for name, fn in shapes.items():
        med, runs = timed(fn, routed2)
        post[name] = med
        print(f"tier: post-retention {name}: routed {med}s {runs}",
              file=sys.stderr)
        if not _same(baseline[name], _canon(fn(routed2))):
            mismatches.append(name)
    assert not mismatches, f"post-retention drift: {mismatches}"

    out = {
        "n_samples": n_rows,
        "n_series": METRICS * instances,
        "days": DAYS,
        "raw_keep_days": RAW_KEEP_DAYS,
        "build_s": build_s,
        "retention_s": retention_s,
        "cpus": int(CPUS),
        "bytes_raw_full": bytes_raw_full,
        "bytes_rollup_1h": bytes_rollup,
        "bytes_raw_kept": bytes_raw_kept,
        "bytes_archive_1h": bytes_archive,
        "shapes_pre": pre,
        "shapes_post_routed": post,
        "post_retention_exact": not mismatches,
    }
    print(json.dumps(out))
    if not os.environ.get("STRESS_KEEP"):
        shutil.rmtree(store, ignore_errors=True)


if __name__ == "__main__":
    main()
