"""Isolate union overhead from weather for the r7 dual-branch bench
entries (VERDICT r8 #3: promql_avg_over_time +31%, promql_rate_range
+10% vs their r6 single-branch selves).

Times, interleaved in ONE session (PERF §10): the full tagged-union
entry, its raw branch alone, and its rollup branch alone. If
union ≈ raw + rollup (within noise) the r7 growth is union-by-design
(the entry now computes BOTH paths); if union ≫ raw + rollup there is
real overhead to chase.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/ab_union_branches.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("ab-union-branches")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as em
    from timbala_spark.model import label_get

    HOUR = em.HOUR
    ROLLUP_MS = em.ROLLUP_MS

    def sel(df, nd=6):
        return df.select(
            label_get(F.col("labels"), "user").alias("user"),
            F.col("t"),
            F.round("v", nd).alias("v"),
        )

    def avg_raw():
        eng, t = em._engine(spark, sf)
        return sel(
            eng.query_range(
                "avg_over_time(purchase[6h])",
                (t - 24 * HOUR) / 1000,
                t / 1000,
                21600,
            )
        )

    def avg_rollup():
        eng, t = em._engine(spark, sf)
        reng, _ = em._rollup_engine(spark, sf)
        t_al = t - (t % ROLLUP_MS)
        return sel(
            reng.query_range(
                "avg_over_time(purchase[2h])",
                (t_al - 24 * HOUR) / 1000,
                t_al / 1000,
                2 * 3600,
            )
        )

    def rate_raw():
        eng, t = em._engine(spark, sf)
        return sel(
            eng.query_range(
                "sum by (user) (rate(click[4h]))",
                (t - 24 * HOUR) / 1000,
                t / 1000,
                7200,
            )
        )

    def rate_rollup():
        reng, _ = em._rollup_engine(spark, sf)
        _, t = em._engine(spark, sf)
        t_al = t - (t % ROLLUP_MS)
        return sel(
            reng.query_range(
                "sum by (user) (rate(click[4h]))",
                (t_al - 24 * HOUR) / 1000,
                t_al / 1000,
                7200,
            )
        )

    qs = em.queries()
    variants = {
        "avg_union": lambda: qs["promql_avg_over_time"](spark, sf),
        "avg_raw_branch": avg_raw,
        "avg_rollup_branch": avg_rollup,
        "rate_union": lambda: qs["promql_rate_range"](spark, sf),
        "rate_raw_branch": rate_raw,
        "rate_rollup_branch": rate_rollup,
    }
    # warm caches (pivot + rollup materialization) once
    for fn in variants.values():
        fn().count()
    walls = {k: [] for k in variants}
    for rep in range(4):
        for name, fn in variants.items():
            t0 = time.monotonic()
            fn().count()
            walls[name].append(round(time.monotonic() - t0, 3))
    for name, w in walls.items():
        print(f"ab-union {name}: min {min(w)}s of {w}", flush=True)
    for fam in ("avg", "rate"):
        u = min(walls[f"{fam}_union"])
        r = min(walls[f"{fam}_raw_branch"])
        ro = min(walls[f"{fam}_rollup_branch"])
        print(
            f"ab-union {fam}: union {u}s vs raw+rollup {r + ro:.3f}s "
            f"(raw {r}s, rollup {ro}s) -> overhead "
            f"{u - r - ro:+.3f}s"
        )
    spark.stop()


if __name__ == "__main__":
    main()
