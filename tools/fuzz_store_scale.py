"""Physical-source invariance at scale: the store-roundtrip fuzz
(tests/test_metamorphic_store.py) on a 1M-sample / 42-day corpus.

The CI gate's fixture is a few hundred rows in one day partition; at
that size day pruning, multi-file scans, and AQE never engage. This
tool builds the same logical corpus shape (gauges m{i,j} with NaN
stripes, counters c{i} with periodic resets, histogram h_bucket,
gappy sparse) as native Spark expressions — 1M rows, minute-spaced
over ~42 day partitions — once in memory and once through
write → compact(+rollup) → read, then runs the shared random
expression generator at random timestamps across the whole span.
Every expression must answer identically from both engines; a
pruning bug (wrong day filter, lost straggler, rollup/raw frame
skew) shows up as missing or extra rows.

Run: python tools/fuzz_store_scale.py [n_seeds]
"""

from __future__ import annotations

import os
import random
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"),
)

N_MIN = int(os.environ.get("FUZZ_MIN", 1_440 * 42))  # minutes of data
# (default 42 days ≈ 1M rows; FUZZ_MIN=604800 → 420 days ≈ 10M rows,
# which also stresses the day-partition count)
T0 = 1_700_000_000_000 - (1_700_000_000_000 % 86_400_000)


def build_df(spark):
    """~1.05M rows: (6 m-series + 2 c-series + 8 h-series + sparse) ×
    minute grid, all values deterministic closed-form expressions."""
    from pyspark.sql import functions as F

    mins = spark.range(N_MIN).select(
        (F.lit(T0) + F.col("id") * 60_000).alias("t"), F.col("id").alias("k")
    )

    def lbl(**kv):
        args = []
        for a, b in kv.items():
            args += [F.lit(a), b if not isinstance(b, str) else F.lit(b)]
        return F.map_from_arrays(
            F.array(*args[0::2]), F.array(*[c.cast("string") for c in args[1::2]])
        )

    frames = []
    for i_idx, i in enumerate(["a", "b", "c"]):
        for j_idx, j in enumerate(["x", "y"]):
            v = (F.col("k") % 200 - 100) * (i_idx + 1) * 1.5 - j_idx * 7.25
            if i == "b" and j == "y":
                v = F.when(F.col("k") % 11 == 3, float("nan")).otherwise(v)
            frames.append(
                mins.select(
                    lbl(__name__="m", i=i, j=j).alias("labels"),
                    "t",
                    v.cast("double").alias("v"),
                )
            )
    for i_idx, i in enumerate(["a", "b"]):
        # counter with a reset every 977 minutes: closed-form cumsum
        slope = 3.0 + i_idx * 2.0
        v = (F.col("k") % 977) * slope + (F.col("k") % 5)
        frames.append(
            mins.select(
                lbl(__name__="c", i=i).alias("labels"),
                "t",
                v.cast("double").alias("v"),
            )
        )
    for i_idx, i in enumerate(["a", "b"]):
        base = F.col("k") % 13 + i_idx
        for le, expr in [
            ("0.1", base),
            ("1", base * 2 + 3),
            ("10", base * 3 + 5),
            ("+Inf", base * 3 + 7),
        ]:
            frames.append(
                mins.select(
                    lbl(__name__="h_bucket", le=le, i=i).alias("labels"),
                    "t",
                    expr.cast("double").alias("v"),
                )
            )
    frames.append(
        mins.filter(F.col("k") % 37 < 3).select(
            lbl(__name__="sparse").alias("labels"),
            "t",
            (F.col("k") * 1.25).cast("double").alias("v"),
        )
    )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def main(n_seeds: int) -> int:
    from pyspark.sql import SparkSession

    import test_metamorphic as tm
    from timbala_spark import Engine, prepare_samples
    from timbala_spark.streaming.compact import compact_store
    from timbala_spark.streaming.ingest import (
        read_rollup_tables,
        read_samples_table,
        write_samples_batch,
    )

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("fuzz-store-scale")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import time

    df = prepare_samples(build_df(spark)).persist()
    print(f"corpus rows: {df.count()}", flush=True)
    tmp = tempfile.mkdtemp(prefix="timbala_scale_fuzz_")
    fails = 0
    try:
        t0 = time.monotonic()
        write_samples_batch(df, tmp)
        compact_store(spark, tmp, rollup_ms=(3_600_000,))
        print(f"write+compact(+1h rollup): {time.monotonic() - t0:.1f}s", flush=True)
        stored = Engine(
            spark,
            read_samples_table(spark, tmp),
            rollups=read_rollup_tables(spark, tmp) or None,
        )
        memory = Engine(spark, df)
        for seed in range(n_seeds):
            expr, _clock = tm.gen_expr(seed)
            rng = random.Random(seed * 52361 + 9)
            day = rng.randrange(1, max(2, N_MIN // 1_440 - 1))
            t = T0 / 1000 + day * 86_400 + rng.randrange(3_600, 80_000)

            def run(eng):
                try:
                    return tm.canon(eng.query(expr, t).collect()), None
                except Exception as e:
                    return None, str(e)

            m, em = run(memory)
            s, es = run(stored)
            try:
                assert (em is None) == (es is None), (em, es)
                if em is None:
                    tm.assert_rows_match(m, s, (expr, t))
                else:
                    assert em == es, (em, es)
            except AssertionError as e:
                print(f"FAIL seed={seed}: {expr!r} t={t}: {str(e)[:200]}")
                fails += 1
            if (seed + 1) % 10 == 0:
                print(f"...{seed + 1}/{n_seeds}, {fails} fails", flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(f"done: {n_seeds} seeds, {fails} failures")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 40))
