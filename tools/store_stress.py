"""Split-store scale stress for the PromQL engine (PERF.md §6c/§9).

Builds an N-sample store (dense scrapes: METRICS × INSTANCES series at
a fixed interval over DAYS days), then times the headline query shapes
— including the wide-window range vectors ([1d]/[7d] at small steps)
where per-(series, step) windows get fat and the rate kernel and the
grid explode actually get stressed.

Values are counters with periodic resets (modulo wrap) so the reset
correction path does real work.

Run:  STRESS_N=10000000 python tools/store_stress.py
Env:  STRESS_N (default 10M), STRESS_DAYS (30), STRESS_METRICS (10),
      SPARK_GRAFT_CPUS (32), STRESS_KEEP (keep store dir)
Prints one JSON line with per-shape median-of-3 warmed seconds.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("STRESS_N", 10_000_000))
DAYS = int(os.environ.get("STRESS_DAYS", 30))
METRICS = int(os.environ.get("STRESS_METRICS", 10))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
BASE_MS = 1_700_000_000_000  # aligned start; epoch-ms
INTERVAL_S = 259  # ~4.3 min scrape interval (prime: no step aliasing)


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from timbala_spark import Engine
    from timbala_spark.streaming.compact import compact_store
    from timbala_spark.streaming.ingest import (
        read_samples_table,
        write_samples_batch,
    )

    evdir = tempfile.mkdtemp(prefix="store_stress_evlog_")
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("store-stress")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", evdir)
        .config("spark.eventLog.compress", "false")
        .getOrCreate()
    )

    samples_per_series = DAYS * 86_400 // INTERVAL_S
    n_series = max(N // samples_per_series, 1)
    instances = max(n_series // METRICS, 1)
    n_rows = METRICS * instances * samples_per_series
    store = tempfile.mkdtemp(prefix="store_stress_")
    print(
        f"stress: building {n_rows} samples, {METRICS} metrics x "
        f"{instances} instances, {DAYS} days @ {INTERVAL_S}s -> {store}",
        file=sys.stderr,
    )

    t0 = time.monotonic()
    sid = F.col("id") % (METRICS * instances)
    # sample index within series
    k = (F.col("id") / (METRICS * instances)).cast("long")
    metric = F.concat(F.lit("m_"), (sid % METRICS).cast("string"))
    inst = F.concat(F.lit("i"), (sid / METRICS).cast("long").cast("string"))
    t_ms = F.lit(BASE_MS) + (k * INTERVAL_S + (sid % INTERVAL_S)) * 1000
    # counter with rate ~ (1 + sid%5)/s and resets every ~100k counts
    v = ((t_ms - BASE_MS) / 1000.0 * (1 + sid % 5)) % 100_000
    raw = (
        spark.range(n_rows)
        .select(
            F.map_from_arrays(
                F.array(F.lit("__name__"), F.lit("instance"), F.lit("job")),
                F.array(metric, inst, F.lit("stress")),
            ).alias("labels"),
            t_ms.cast("long").alias("t"),
            v.cast("double").alias("v"),
        )
    )
    from timbala_spark import prepare_samples

    write_samples_batch(prepare_samples(raw), store)
    ingest_s = round(time.monotonic() - t0, 1)
    t0 = time.monotonic()
    compact_store(spark, store)
    compact_s = round(time.monotonic() - t0, 1)

    eng = Engine(spark, read_samples_table(spark, store))
    # bypass the engine's compiled-plan cache: a cached DataFrame's
    # re-execution reuses shuffle map outputs, so repeat runs would
    # measure shuffle-reuse, not query execution
    eng.plan_cache_size = 0
    end_s = (BASE_MS + (samples_per_series - 1) * INTERVAL_S * 1000) / 1000.0

    def timed(fn):
        runs = []
        for _ in range(4):
            t0 = time.monotonic()
            fn().collect()
            runs.append(round(time.monotonic() - t0, 2))
        return statistics.median(runs[1:]), runs  # runs[0] is cold

    day = 86_400.0
    shapes = {
        "selector_instant": lambda: eng.query("m_0", end_s),
        "sum_rate_1h_24h_range": lambda: eng.query_range(
            "sum(rate(m_0[1h]))", end_s - day, end_s, 3600
        ),
        "rate_1d_24h_range": lambda: eng.query_range(
            "sum by (instance) (rate(m_0[1d]))", end_s - day, end_s, 3600
        ),
        "rate_7d_instant": lambda: eng.query("sum(rate(m_0[7d]))", end_s),
        "increase_1d_7d_range_6h": lambda: eng.query_range(
            "sum(increase(m_0[1d]))", end_s - 7 * day, end_s, 6 * 3600
        ),
        "resets_1d_24h_range": lambda: eng.query_range(
            "sum(resets(m_0[1d]))", end_s - day, end_s, 3600
        ),
        "all_metrics_rate_1h_6h": lambda: eng.query_range(
            'sum by (__name__) (rate({__name__=~"m_.*"}[1h]))',
            end_s - 6 * 3600,
            end_s,
            3600,
        ),
        "irate_1h_24h_range": lambda: eng.query_range(
            "sum(irate(m_0[1h]))", end_s - day, end_s, 3600
        ),
    }
    results = {}
    for name, fn in shapes.items():
        med, runs = timed(fn)
        results[name] = med
        print(f"stress: {name}: median {med}s of {runs}", file=sys.stderr)

    spark.stop()  # flush the event log

    # spill audit over every task of the run (the "no stage spills past
    # the memory budget" gate): task-end metrics carry memory/disk
    # bytes spilled
    mem_spill = disk_spill = 0
    peak_exec_mem = 0
    logs = []
    for root, _dirs, files in os.walk(evdir):
        logs.extend(os.path.join(root, f) for f in files if "eventLog" in f or f.startswith("local-") or f.startswith("app"))
    for path in logs:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") != "SparkListenerTaskEnd":
                    continue
                tm = ev.get("Task Metrics") or {}
                mem_spill += tm.get("Memory Bytes Spilled", 0)
                disk_spill += tm.get("Disk Bytes Spilled", 0)
                peak_exec_mem = max(
                    peak_exec_mem, tm.get("Peak Execution Memory", 0)
                )
    shutil.rmtree(evdir, ignore_errors=True)

    out = {
        "n_samples": n_rows,
        "n_series": METRICS * instances,
        "days": DAYS,
        "interval_s": INTERVAL_S,
        "ingest_s": ingest_s,
        "compact_s": compact_s,
        "cpus": int(CPUS),
        "shapes": results,
        "memory_bytes_spilled": mem_spill,
        "disk_bytes_spilled": disk_spill,
        "peak_task_execution_memory": peak_exec_mem,
    }
    print(json.dumps(out))
    if not os.environ.get("STRESS_KEEP"):
        shutil.rmtree(store, ignore_errors=True)


if __name__ == "__main__":
    main()
