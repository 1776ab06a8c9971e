"""Per-JOB wall/stage attribution for one warm contract-entry run
(optimization guide §1: find the fixed-job floor before cutting it).

Runs the named entries on the bench session shape with the event log
on, times one warm invocation (cache/session costs paid by a prior
untimed run), then prints every Spark job of that invocation: wall,
stage count, task count, shuffle bytes, and the first line of the
job's call site.  Job boundaries come from the event log, so pure
driver gaps (plan construction, py4j) show up as the difference
between the invocation wall and the sum of job walls.

Usage:
  python tools/job_audit.py [--runs 2] entry [entry ...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (bench.py contract).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    args = sys.argv[1:]
    runs = 2
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    names = args

    evdir = tempfile.mkdtemp(prefix="job_audit_ev_")

    import bench
    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("timbala-job-audit")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", evdir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10_000_000).selectExpr("sum(id * 2)").collect()

    def _noop(it):
        for pdf in it:
            yield pdf

    spark.range(100_000).repartition(int(CPUS)).mapInPandas(_noop, "id long").count()
    entrymod._engine(spark, SF_DIR)
    qs = entrymod.queries()
    overrides = bench._production_overrides()

    for name in names:
        fn = overrides.get(name, qs[name])
        sc = spark.sparkContext
        for r in range(runs - 1):  # untimed: session/cache warmup
            sc.setJobDescription(f"audit:{name}:warm{r}")
            fn(spark, SF_DIR).count()
        sc.setJobDescription(f"audit:{name}:TIMED")
        t0 = time.monotonic()
        n = fn(spark, SF_DIR).count()
        wall = time.monotonic() - t0
        sc.setJobDescription(None)
        print(f"\n=== {name}: warm wall {wall:.3f}s ({n} rows) ===", flush=True)

    spark.stop()

    # parse the event log: group stages/tasks under jobs, keep only
    # jobs whose description is audit:<name>:TIMED
    cand = []
    for root, _dirs, files in os.walk(evdir):
        for f in files:
            if f.startswith("events_") or f.startswith("local-"):
                cand.append(os.path.join(root, f))
    cand = [p for p in cand if not p.endswith(".zstd")] or cand
    jobs: dict[int, dict] = {}
    stage_job: dict[int, int] = {}
    stage_meta: dict[int, dict] = {}
    lines = []
    for p in sorted(cand):
        with open(p) as fh:
            lines.extend(fh.readlines())
    if True:
        for line in lines:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            t = ev.get("Event")
            if t == "SparkListenerJobStart":
                jid = ev["Job ID"]
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                )
                jobs[jid] = {
                    "desc": desc,
                    "t0": ev["Submission Time"],
                    "t1": None,
                    "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                    "site": (ev["Stage Infos"][-1].get("Stage Name", "") if ev["Stage Infos"] else ""),
                }
                for s in ev["Stage Infos"]:
                    stage_job[s["Stage ID"]] = jid
            elif t == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
            elif t == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                d = stage_meta.setdefault(
                    sid, {"tasks": 0, "sw": 0, "sr": 0, "spill": 0}
                )
                d["tasks"] += 1
                d["sw"] += (m.get("Shuffle Write Metrics") or {}).get(
                    "Shuffle Bytes Written", 0
                )
                sr = m.get("Shuffle Read Metrics") or {}
                d["sr"] += sr.get("Remote Bytes Read", 0) + sr.get(
                    "Local Bytes Read", 0
                )
                d["spill"] += m.get("Disk Bytes Spilled", 0)

    by_entry: dict[str, list] = {}
    for jid, j in sorted(jobs.items()):
        if ":TIMED" not in j["desc"]:
            continue
        name = j["desc"].split(":")[1]
        by_entry.setdefault(name, []).append((jid, j))
    for name, js in by_entry.items():
        tot = 0.0
        print(f"\n--- {name}: {len(js)} jobs in the timed run ---")
        for jid, j in js:
            w = ((j["t1"] or j["t0"]) - j["t0"]) / 1000.0
            tot += w
            tasks = sum(
                stage_meta.get(s, {}).get("tasks", 0) for s in j["stages"]
            )
            sw = sum(stage_meta.get(s, {}).get("sw", 0) for s in j["stages"])
            spill = sum(
                stage_meta.get(s, {}).get("spill", 0) for s in j["stages"]
            )
            print(
                f"job {jid:4d} {w:7.3f}s  stages={len(j['stages']):2d} "
                f"tasks={tasks:4d} shufW={sw/1e6:8.2f}MB spill={spill/1e6:6.1f}MB  "
                f"{j['site'][:90]}"
            )
        print(f"sum of job walls: {tot:.3f}s (gap to wall = driver time)")


if __name__ == "__main__":
    main()
