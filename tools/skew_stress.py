"""Hot-series skew stress (PERF.md §8; VERDICT items r1-r3).

The reference gates on shard balance across nodes
(internal/cluster/distribution_test.go:185-187: most/least loaded node
within 20%). The Spark analog of the failure mode is a single hot
series: every engine shuffle keys on (series signature, step) — if one
series holds half the samples, do its tasks straggle?

Method: synthesize N samples where ONE series carries 50% and the rest
spread over 10k series, run the two headline shapes (per-series rate
kernel; label-regrouping sum by) as range queries, and measure per-task
executor run times from the Spark event log. PASS = max/median task
time < 4x in every stage that does real work.

Run: python tools/skew_stress.py  (prints one JSON line; rc=1 on fail)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("SKEW_N", 4_000_000))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
THRESHOLD = 4.0
BASE_MS = 1_700_000_000_000
DAY_S = 86_400


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from timbala_spark import Engine, prepare_samples

    evdir = tempfile.mkdtemp(prefix="skew_evlog_")
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("skew-stress")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", evdir)
        .config("spark.eventLog.compress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10_000_000).selectExpr("sum(id * 2)").collect()

    # 50% of all samples in ONE series ("hot"), the rest over 10k series.
    # v = t/1000: a perfectly linear counter, so rate() does real work.
    half = N // 2
    src = spark.range(N).select(
        F.create_map(
            F.lit("__name__"),
            F.lit("m"),
            F.lit("instance"),
            F.when(F.col("id") < half, F.lit("hot")).otherwise(
                F.concat(F.lit("i"), (F.col("id") % 10_000).cast("string"))
            ),
        ).alias("labels"),
        (F.lit(BASE_MS) + (F.col("id") % DAY_S) * 1000).alias("t"),
        ((F.col("id") % DAY_S).cast("double")).alias("v"),
    )
    samples = prepare_samples(src).persist()
    n_actual = samples.count()  # materialize so query timing excludes synth
    eng = Engine(spark, samples)

    t0, t1 = BASE_MS / 1000 + 3600, BASE_MS / 1000 + DAY_S - 3600
    timings = {}
    for name, q in [
        ("rate_sum", "sum(rate(m[30m]))"),
        ("sum_by_instance", "sum by (instance) (m)"),
        ("rate_by_instance", "sum by (instance) (rate(m[30m]))"),
    ]:
        w0 = time.monotonic()
        n = eng.query_range(q, t0, t1, 600).count()
        timings[name] = {"wall_s": round(time.monotonic() - w0, 2), "rows": n}
        print(f"skew: {name}: {timings[name]}", file=sys.stderr)

    spark.stop()  # flushes the event log

    # parse per-task Executor Run Time per stage
    stages: dict[int, list[float]] = {}
    logs = []
    for root, _dirs, files in os.walk(evdir):  # v2 logs are directories
        logs.extend(
            os.path.join(root, f)
            for f in files
            if f.startswith("events_")
        )
    for path in sorted(logs, key=os.path.getmtime):
        with open(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") != "SparkListenerTaskEnd":
                    continue
                m = ev.get("Task Metrics") or {}
                rt = m.get("Executor Run Time")
                if rt is None:
                    continue
                stages.setdefault(ev["Stage ID"], []).append(float(rt))

    worst = {"ratio": 0.0}
    audited = 0
    for sid, ts in sorted(stages.items()):
        if len(ts) < 8 or max(ts) < 200:  # trivial/tiny stages: noise
            continue
        med = statistics.median(ts) or 1.0
        ratio = max(ts) / max(med, 1.0)
        audited += 1
        if ratio > worst["ratio"]:
            worst = {
                "ratio": round(ratio, 2),
                "stage": sid,
                "tasks": len(ts),
                "max_ms": round(max(ts)),
                "median_ms": round(med),
            }
        print(
            f"skew: stage {sid}: tasks={len(ts)} max={max(ts):.0f}ms "
            f"median={med:.0f}ms ratio={max(ts) / max(med, 1.0):.2f}",
            file=sys.stderr,
        )

    ok = worst["ratio"] < THRESHOLD
    print(
        json.dumps(
            {
                "metric": "hot_series_skew",
                "n_samples": n_actual,
                "hot_share": 0.5,
                "threshold": THRESHOLD,
                "worst": worst,
                "stages_audited": audited,
                "queries": timings,
                "pass": ok,
            }
        )
    )
    import shutil

    shutil.rmtree(evdir, ignore_errors=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
