"""Minimal repro for PERF §20c finding 1: are shuffle files from
completed one-off actions EVER reclaimed in-process on this Spark
build?

The 20M curation composition accumulated ~80 GB of shuffle scratch
monotonically across four instrumented hours — periodic JVM GC,
periodic Python GC, localCheckpoint lineage truncation, and dropping
every Python reference all failed to delete a single ``shuffle_*``
file.  That was measured INSIDE the composition; this probe isolates
the mechanism with the smallest possible workload so the pin (if any)
can be bisected:

phase A  ``K`` independent shuffle actions, references dropped
         immediately, Python+JVM GC forced, then a settle wait —
         does the blockmgr dir shrink?
phase B  same, but every frame is retained in a list (the _TRACKED /
         plan-cache shape) — expected: no reclaim (control).
phase C  one action per frame THROUGH a localCheckpoint boundary —
         after dropping the pre-checkpoint frame, are the upstream
         shuffles reclaimed while the checkpointed child stays live?

Each phase prints ``blockmgr_bytes`` before/after the GC+settle so
the outcome is a number, not an impression.

Usage: python tools/shuffle_reclaim_probe.py
"""

from __future__ import annotations

import gc
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("PROBE_ROWS", "20000000"))
K = int(os.environ.get("PROBE_ACTIONS", "5"))
SETTLE = int(os.environ.get("PROBE_SETTLE_S", "30"))


def du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    before = set(glob.glob("/tmp/blockmgr-*"))
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("shuffle-reclaim-probe")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.cleaner.periodicGC.interval", "15s")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    bm = [d for d in glob.glob("/tmp/blockmgr-*") if d not in before]
    assert len(bm) == 1, bm
    bm = bm[0]
    print(f"blockmgr: {bm}", flush=True)

    def shuffle_action(i: int) -> int:
        # ~20M rows x ~120 B of high-entropy string through one
        # exchange: a few GB of shuffle write per action
        df = (
            spark.range(N)
            .withColumn("k", F.pmod(F.xxhash64("id", F.lit(i)), F.lit(1_000_000)))
            .withColumn(
                "payload",
                F.concat(*[F.hex(F.xxhash64("id", F.lit(i * 10 + j))) for j in range(7)]),
            )
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("c"), F.max("payload").alias("m"))
        )
        n = df.count()
        return n

    def force_gc() -> None:
        gc.collect()
        spark._jvm.System.gc()

    def settle_and_report(label: str, peak: int) -> int:
        force_gc()
        time.sleep(SETTLE)
        force_gc()
        time.sleep(SETTLE)
        after = du(bm)
        pct = 100.0 * after / peak if peak else 0.0
        print(
            f"{label}: peak={peak/1e9:.2f}GB after_gc_settle={after/1e9:.2f}GB"
            f" ({pct:.0f}% retained)",
            flush=True,
        )
        return after

    # ---- phase A: drop refs immediately
    for i in range(K):
        shuffle_action(i)
        print(f"A{i}: blockmgr={du(bm)/1e9:.2f}GB", flush=True)
    settle_and_report("phase A (refs dropped)", du(bm))

    # ---- phase B: retain every frame (control: should NOT reclaim)
    held = []
    base_b = du(bm)
    for i in range(K):
        df = (
            spark.range(N)
            .withColumn("k", F.pmod(F.xxhash64("id", F.lit(100 + i)), F.lit(1_000_000)))
            .withColumn(
                "payload",
                F.concat(*[F.hex(F.xxhash64("id", F.lit(1000 + i * 10 + j))) for j in range(7)]),
            )
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("c"), F.max("payload").alias("m"))
        )
        df.count()
        held.append(df)
        print(f"B{i}: blockmgr={du(bm)/1e9:.2f}GB", flush=True)
    peak_b = du(bm)
    settle_and_report("phase B (refs HELD)", peak_b)
    held.clear()
    settle_and_report("phase B after clearing refs", peak_b)

    # ---- phase C: localCheckpoint boundary; child stays live
    base_c = du(bm)
    children = []
    for i in range(2):
        df = (
            spark.range(N)
            .withColumn("k", F.pmod(F.xxhash64("id", F.lit(200 + i)), F.lit(1_000_000)))
            .withColumn(
                "payload",
                F.concat(*[F.hex(F.xxhash64("id", F.lit(2000 + i * 10 + j))) for j in range(7)]),
            )
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        child = df.select("k", "c").localCheckpoint(eager=True)
        del df
        children.append(child)
        print(f"C{i}: blockmgr={du(bm)/1e9:.2f}GB", flush=True)
    settle_and_report("phase C (checkpointed children live)", du(bm))
    print("done", flush=True)


if __name__ == "__main__":
    main()
