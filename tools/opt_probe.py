"""Optimization-round probe harness (guide §1): per-query isolation.

For each named contract query, on the SAME session shape as bench.py:
 * times N reps with the bench's count() action (bench parity) and the
   noop sink (computation-only, guide §1.4),
 * captures .explain("formatted") to plans/<tag>/<name>_<suffix>.txt,
 * labels jobs via setJobDescription so event logs stay readable.

Usage:
  python tools/opt_probe.py [--plans-only] [--tag r11] [--suffix before]
                            [--runs 4] query [query ...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as bench.py).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    args = [a for a in sys.argv[1:]]
    plans_only = "--plans-only" in args
    if plans_only:
        args.remove("--plans-only")
    tag, suffix, runs = "r11", "before", 4
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        del args[i : i + 2]
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i : i + 2]
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    names = args

    import bench
    import __spark_entry__ as entrymod

    spark = bench._build_session("timbala-opt-probe")
    spark.range(10_000_000).selectExpr("sum(id * 2)").collect()

    def _noop(it):
        for pdf in it:
            yield pdf

    spark.range(100_000).repartition(int(CPUS)).mapInPandas(_noop, "id long").count()
    entrymod._engine(spark, SF_DIR)

    qs = entrymod.queries()
    overrides = bench._production_overrides()
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(plans_dir, exist_ok=True)

    for name in names:
        fn = overrides.get(name, qs[name])
        sc = spark.sparkContext
        sc.setJobDescription(f"probe:{name}:plan")
        df = fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        pf = os.path.join(plans_dir, f"{name}_{suffix}.txt")
        with open(pf, "w") as fh:
            fh.write(plan)
        n_exch = plan.count("Exchange")
        joins = [
            k
            for k in (
                "BroadcastHashJoin",
                "SortMergeJoin",
                "ShuffledHashJoin",
                "BroadcastNestedLoopJoin",
                "CartesianProduct",
            )
            if k in plan
        ]
        pyn = [
            k
            for k in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas")
            if k in plan
        ]
        print(
            f"plan {name}: {n_exch} Exchange, joins={joins or ['-']}, "
            f"python={pyn or ['-']} -> {pf}",
            flush=True,
        )
        if plans_only:
            continue
        cnt_runs, noop_runs = [], []
        for r in range(runs):
            sc.setJobDescription(f"probe:{name}:count:{r}")
            t0 = time.monotonic()
            n = fn(spark, SF_DIR).count()
            cnt_runs.append(time.monotonic() - t0)
            sc.setJobDescription(f"probe:{name}:noop:{r}")
            t0 = time.monotonic()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            noop_runs.append(time.monotonic() - t0)
        sc.setJobDescription(None)
        print(
            f"probe {name}: count min {min(cnt_runs):.3f}s "
            f"{[round(x, 3) for x in cnt_runs]} | noop min "
            f"{min(noop_runs):.3f}s {[round(x, 3) for x in noop_runs]} "
            f"({n} rows)",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
