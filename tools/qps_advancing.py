"""Advancing-`now()` dashboard throughput: the honest q/s number.

The engine plan cache keys on absolute timestamps, so the bench's
repeat-shape q/s overstates production throughput (VERDICT r5 finding
#2). This harness measures the pattern a real dashboard produces —
the SAME query shapes re-issued with start/end advancing by one step
per refresh, every request at a UNIQUE timestamp — three ways:

  direct    PromAPI with the range-results cache disabled
            (per-request: full plan build + Catalyst + execute)
  frontend  PromAPI with the widened-window results cache on
            (timbala_spark.frontend; misses only at quantum
            boundaries)
  check     every frontend response compared to its direct twin
            (exact envelope equality — correctness while timing)

r10: each arm runs QPS_PASSES (default 3) INTERLEAVED passes — each
pass in its OWN 3 h time region (fresh cache keys, identical
hit/miss structure; every request unique) — and
reports the best pass (min wall).  A single serial pass is
indistinguishable from box weather on this multi-tenant machine
(VERDICT r9: the round trend 7.14 → 11.15 → 10.63 → 5.56 q/s with no
code change), the same reason the headline bench is min-of-4.

Usage: python tools/qps_advancing.py [sf_dir] [n_requests]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)
N = int(sys.argv[2]) if len(sys.argv) > 2 else 32
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "8")

SHAPES = [
    ("sum by (user) (rate(click[4h]))", 6 * 3600, 60),
    ("topk(3, sum by (user) (click))", 3 * 3600, 60),
    ("avg_over_time(click[30m])", 3600, 30),
    ("count(click) by (user)", 2 * 3600, 120),
]


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as em
    from timbala_spark.api import PromAPI

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    eng, t_max = em._engine(spark, SF_DIR)
    direct = PromAPI(eng, timeout_s=600, range_cache_rows=0)
    frontend = PromAPI(eng, timeout_s=600)
    now0 = t_max / 1000 - 12 * 3600

    #: per-pass time-region jump: the frontend quantum is <=1 h with
    #: <=2 h forward prefetch, so 3 h gives every pass FRESH cache
    #: keys — each pass repeats the same structure (untimed region
    #: load, timed advancing refreshes mixing boundary misses with
    #: prefetch hits); without it, later passes replay the previous
    #: pass's widened windows and the min measures pure cache hits
    REGION_S = 3 * 3600

    def req(api, shape_i: int, refresh_i: int, base: float) -> dict:
        expr, extent, step = SHAPES[shape_i % len(SHAPES)]
        # step-aligned advancing window, one step per refresh
        end = base + refresh_i * step
        return api.query_range(expr, end - extent, end, step)

    # warm codegen/JIT on both paths
    req(direct, 0, 0, now0), req(frontend, 0, 0, now0)

    passes = int(os.environ.get("QPS_PASSES", "3"))

    def run(api, p: int) -> tuple[float, list]:
        base = now0 + p * REGION_S
        for s in range(len(SHAPES)):  # untimed region load
            req(api, s, 0, base)
        t0 = time.monotonic()
        out = [
            req(api, i, 1 + i // len(SHAPES), base) for i in range(N)
        ]
        return time.monotonic() - t0, out

    dts_direct, dts_front, mismatches = [], [], 0
    for p in range(passes):  # interleaved: a slow window hits both arms
        dt_d, res_d = run(direct, p)
        dt_f, res_f = run(frontend, p)
        dts_direct.append(dt_d)
        dts_front.append(dt_f)
        mismatches += sum(1 for a, b in zip(res_d, res_f) if a != b)
    dt_direct, dt_front = min(dts_direct), min(dts_front)
    rc = frontend._range_cache

    def _fmt(ws):
        return "[" + ", ".join(f"{w:.2f}" for w in ws) + "]"

    print(
        f"direct:   {N / dt_direct:6.2f} q/s  ({dt_direct / N * 1000:.0f} ms/q)"
        f"  best of {passes} walls {_fmt(dts_direct)}"
    )
    print(
        f"frontend: {N / dt_front:6.2f} q/s  ({dt_front / N * 1000:.0f} ms/q)"
        f"  best of {passes} walls {_fmt(dts_front)}"
        f"  hits={rc.hits} misses={rc.misses}"
    )
    print(f"speedup:  {dt_direct / dt_front:.2f}x   mismatches={mismatches}")
    assert mismatches == 0, "frontend responses diverged from direct"

    # instant flavor: unique advancing whole-second times through the
    # 1 s-grid widened-window extension (PERF §11b).  Base sits 1 h
    # past now0 so the last region (base + 5000 s direct offset +
    # (passes-1)·REGION_S) stays inside the data's 12 h-to-t_max span
    i_exprs = [s[0] for s in SHAPES[:3]]
    base = int(now0) + 3600

    def run_i(api, offset: int) -> tuple[float, list]:
        for e in i_exprs:  # warm codegen for the instant shapes
            api.query(e, base + offset - 7)
        t0 = time.monotonic()
        out = [
            api.query(i_exprs[i % len(i_exprs)], base + offset + i)
            for i in range(N)
        ]
        return time.monotonic() - t0, out

    h0, m0 = rc.hits, rc.misses
    dts_fi, dts_di = [], []
    for p in range(passes):  # interleaved, one fresh region per pass
        dt_f, _ = run_i(frontend, p * REGION_S)
        dt_d, res_di = run_i(direct, 5000 + p * REGION_S)
        dts_fi.append(dt_f)
        dts_di.append(dt_d)
    dt_fi, dt_di = min(dts_fi), min(dts_di)
    # exactness check at SHARED times (the last direct pass's keys)
    last_off = 5000 + (passes - 1) * REGION_S
    mism = sum(
        1
        for i in range(N)
        if frontend.query(i_exprs[i % len(i_exprs)], base + last_off + i)
        != res_di[i]
    )
    print(
        f"instant direct:   {N / dt_di:6.2f} q/s  "
        f"({dt_di / N * 1000:.0f} ms/q)"
    )
    print(
        f"instant frontend: {N / dt_fi:6.2f} q/s  "
        f"({dt_fi / N * 1000:.0f} ms/q)  hits={rc.hits - h0} "
        f"misses={rc.misses - m0}"
    )
    print(f"instant speedup:  {dt_di / dt_fi:.2f}x   mismatches={mism}")
    assert mism == 0, "instant cached responses diverged from direct"
    spark.stop()


if __name__ == "__main__":
    main()
