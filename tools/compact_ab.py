"""Interleaved A/B: incremental vs full compaction after a small
append (PERF §18). Builds a DAYS-day store once, then alternates
passes — A: incremental (settled listing present), B: full (listing
deleted first) — appending one small batch to ONE day before each
pass, in one Spark session (PERF §10 discipline).

Run:  python tools/compact_ab.py
Env:  STRESS_N (default 10M), STRESS_DAYS (30), AB_REPS (3),
      SPARK_GRAFT_CPUS (32)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("STRESS_N", 10_000_000))
DAYS = int(os.environ.get("STRESS_DAYS", 30))
REPS = int(os.environ.get("AB_REPS", 3))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
DAY_MS = 86_400_000
BASE_MS = (1_700_000_000_000 // DAY_MS) * DAY_MS
INTERVAL_S = 259
W = 3_600_000


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from timbala_spark import prepare_samples
    from timbala_spark.streaming.compact import compact_store
    from timbala_spark.streaming.ingest import write_samples_batch
    from timbala_spark.streaming.store import (
        SETTLED_NAME,
        resolve_store,
    )

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("compact-ab")
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
    n_rows = n_series * samples_per_series
    store = tempfile.mkdtemp(prefix="compact_ab_")
    print(f"ab: building {n_rows} samples / {n_series} series -> {store}",
          file=sys.stderr)
    sid = F.col("id") % n_series
    k = (F.col("id") / n_series).cast("long")
    t_ms = F.lit(BASE_MS) + (k * INTERVAL_S + (sid % INTERVAL_S)) * 1000
    raw = spark.range(n_rows).select(
        F.map_from_arrays(
            F.array(F.lit("__name__"), F.lit("instance")),
            F.array(F.lit("m"), F.concat(F.lit("i"), sid.cast("string"))),
        ).alias("labels"),
        t_ms.cast("long").alias("t"),
        (t_ms % 97_000 / 97.0).cast("double").alias("v"),
    )
    write_samples_batch(prepare_samples(raw), store)
    compact_store(spark, store, rollup_ms=(W,))

    def append_one_day(j: int) -> None:
        t0 = BASE_MS + (j % DAYS) * DAY_MS + 12 * 3_600_000
        rows = [
            ({"__name__": "m", "instance": "i0"}, t0 + i * 1000 + j, 1.0)
            for i in range(1000)
        ]
        write_samples_batch(
            prepare_samples(
                spark.createDataFrame(
                    rows, "labels map<string,string>, t long, v double"
                )
            ),
            store,
        )

    inc, full = [], []
    for r in range(REPS):
        # A: incremental
        append_one_day(2 * r)
        t0 = time.monotonic()
        compact_store(spark, store, rollup_ms=(W,))
        inc.append(round(time.monotonic() - t0, 2))
        # B: full (delete the listing first)
        append_one_day(2 * r + 1)
        gdir = os.path.dirname(resolve_store(store).samples)
        os.unlink(os.path.join(gdir, SETTLED_NAME))
        t0 = time.monotonic()
        compact_store(spark, store, rollup_ms=(W,))
        full.append(round(time.monotonic() - t0, 2))
        print(f"ab: rep {r}: incremental {inc[-1]}s | full {full[-1]}s",
              file=sys.stderr)
    out = {
        "n_samples": n_rows,
        "days": DAYS,
        "reps": REPS,
        "cpus": int(CPUS),
        "incremental_s": inc,
        "full_s": full,
        "incremental_min": min(inc),
        "full_min": min(full),
    }
    print(json.dumps(out))
    shutil.rmtree(store, ignore_errors=True)


if __name__ == "__main__":
    main()
