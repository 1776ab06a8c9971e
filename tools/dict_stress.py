"""Series-dictionary scale stress (VERDICT r5 task 6; PERF §12).

The reference's stated bar is 40M ACTIVE series (BASELINE.md /
docs/assumptions.md) — a series-dominated regime where the split
store's dictionary (one row per series) is the object under load, not
the samples table. This harness builds a store with SERIES distinct
series (default 5M) at a few samples each and measures:

* the per-batch dict write (dropDuplicates(series_id) partial-agg
  path, ingest.write_samples_batch);
* the compaction dict collapse (compact_store);
* the samples⋈dict join strategy on the read path — at this
  cardinality the dict is far past the broadcast threshold, so the
  plan must degrade to a SHUFFLED join on the 8-byte key (never a
  driver-side collect, never a forced broadcast that would OOM
  executors at 40M);
* warmed query shapes that stress the dict side: a name-selector
  (pushdown into the dict scan), a high-cardinality aggregation over
  every series, and label_values (dict-side distinct).

Run:  STRESS_SERIES=5000000 python tools/dict_stress.py
Env:  STRESS_SERIES (default 5M), STRESS_SAMPLES_PER (3),
      SPARK_GRAFT_CPUS (32), STRESS_KEEP
Prints one JSON line.
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

SERIES = int(os.environ.get("STRESS_SERIES", 5_000_000))
SAMPLES_PER = int(os.environ.get("STRESS_SAMPLES_PER", 3))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
METRICS = 50
BASE_MS = 1_700_000_000_000
INTERVAL_MS = 60_000


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from timbala_spark import Engine, prepare_samples
    from timbala_spark.streaming.compact import compact_store
    from timbala_spark.streaming.ingest import (
        read_samples_table,
        write_samples_batch,
    )

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("dict-stress")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    n_rows = SERIES * SAMPLES_PER
    store = tempfile.mkdtemp(prefix="dict_stress_")
    print(
        f"dict-stress: {SERIES} series x {SAMPLES_PER} samples "
        f"({n_rows} rows) -> {store}",
        file=sys.stderr,
    )

    sid = F.col("id") % SERIES
    k = (F.col("id") / SERIES).cast("long")
    metric = F.concat(F.lit("m_"), (sid % METRICS).cast("string"))
    inst = F.concat(F.lit("i"), (sid / METRICS).cast("long").cast("string"))
    raw = spark.range(n_rows).select(
        F.map_from_arrays(
            F.array(F.lit("__name__"), F.lit("instance"), F.lit("job")),
            F.array(metric, inst, F.lit("stress")),
        ).alias("labels"),
        (F.lit(BASE_MS) + k * INTERVAL_MS).cast("long").alias("t"),
        (sid % 97).cast("double").alias("v"),
    )
    t0 = time.monotonic()
    write_samples_batch(prepare_samples(raw), store)
    write_s = round(time.monotonic() - t0, 1)
    # interleaved A/B (same session — §10 noise discipline): the
    # series-dominated batch is the regime where persisting the
    # prepared batch should beat recomputing it per branch
    write_persist_s = None
    if os.environ.get("STRESS_PERSIST_AB", "1") != "0":
        store_p = tempfile.mkdtemp(prefix="dict_stress_p_")
        t0 = time.monotonic()
        write_samples_batch(prepare_samples(raw), store_p, persist=True)
        write_persist_s = round(time.monotonic() - t0, 1)
        shutil.rmtree(store_p, ignore_errors=True)
        print(
            f"dict-stress: write recompute={write_s}s persist={write_persist_s}s",
            file=sys.stderr,
        )
    t0 = time.monotonic()
    compact_store(spark, store)
    compact_s = round(time.monotonic() - t0, 1)

    table = read_samples_table(spark, store)
    eng = Engine(spark, table)
    eng.plan_cache_size = 0
    end_s = (BASE_MS + (SAMPLES_PER - 1) * INTERVAL_MS) / 1000.0

    # --- join-strategy audit on the FULL-WIDTH read (every series
    # joins the dict): past broadcast size the plan must degrade to a
    # shuffled join on the 8-byte key — never a forced broadcast (OOMs
    # executors at 40M series), never a driver-side merge. The
    # name-selector slice may still legitimately broadcast (pushdown
    # shrinks the dict side first); that is the desired adaptivity.
    def join_kinds(df) -> list[str]:
        plan = df._jdf.queryExecution().executedPlan().toString()
        return [
            kind
            for ln in plan.splitlines()
            for kind in (
                "BroadcastHashJoin",
                "SortMergeJoin",
                "ShuffledHashJoin",
            )
            if kind in ln
        ]

    full_kinds = join_kinds(
        eng.query('count({__name__=~"m_.*"}) by (__name__)', end_s)
    )
    slice_kinds = join_kinds(eng.query("m_0", end_s))
    broadcast_join = "BroadcastHashJoin" in full_kinds
    shuffled_join = bool(
        {"SortMergeJoin", "ShuffledHashJoin"} & set(full_kinds)
    )

    def timed(fn):
        runs = []
        for _ in range(4):
            t1 = time.monotonic()
            fn().collect()
            runs.append(round(time.monotonic() - t1, 2))
        return statistics.median(runs[1:]), runs  # runs[0] is cold

    shapes = {
        # name selector: pushes EqualTo(name) into the dict scan and
        # joins only the matched slice of 5M series
        "selector_one_metric": lambda: eng.query("m_0", end_s),
        # every series alive at once: the full-width dict join + a
        # 5M-group aggregation collapsed to METRICS groups
        "count_all_by_name": lambda: eng.query(
            'count({__name__=~"m_.*"}) by (__name__)', end_s
        ),
        "sum_one_metric": lambda: eng.query("sum(m_0)", end_s),
    }
    results = {}
    for name, fn in shapes.items():
        med, runs = timed(fn)
        results[name] = med
        print(f"dict-stress: {name}: median {med}s of {runs}", file=sys.stderr)

    # --- runtime-filter A/B (r8, VERDICT #4): the 40M selector wall.
    # The name-selector plan prunes the DICT scan but still scans +
    # shuffles every in-range sample for the SMJ; Spark's runtime
    # Bloom filter would push might_contain(series_id) into the
    # samples side BEFORE its exchange — it just never fires with the
    # default thresholds (creation side must estimate < 10MB and the
    # dict has no CBO stats, application side must estimate > 10GB).
    # Interleaved on/off in ONE session per §10.
    rf_ab = {}
    if os.environ.get("STRESS_RF_AB", "1") != "0":
        import statistics as _st

        RF = {
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "4GB",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "32MB",
        }
        defaults = {k: spark.conf.get(k) for k in RF}

        def set_rf(on: bool):
            for k, v in (RF if on else defaults).items():
                spark.conf.set(k, v)

        def plan_has_bloom(df) -> bool:
            p = df._jdf.queryExecution().executedPlan().toString()
            return "bloom" in p.lower() or "might_contain" in p.lower()

        for shape_name, fn in (
            ("selector_one_metric", lambda: eng.query("m_0", end_s)),
            ("sum_one_metric", lambda: eng.query("sum(m_0)", end_s)),
        ):
            walls = {True: [], False: []}
            for rep in range(3):
                for on in (True, False):
                    set_rf(on)
                    t1 = time.monotonic()
                    fn().collect()
                    walls[on].append(round(time.monotonic() - t1, 2))
            set_rf(True)
            fired = plan_has_bloom(fn())
            set_rf(False)
            rf_ab[shape_name] = {
                "rf_on_median": _st.median(walls[True]),
                "rf_off_median": _st.median(walls[False]),
                "rf_on_runs": walls[True],
                "rf_off_runs": walls[False],
                "bloom_in_plan": fired,
            }
            print(f"dict-stress rf-ab {shape_name}: {rf_ab[shape_name]}", file=sys.stderr)

    # --- routed-selector A/B (r8, VERDICT #5 at the 40M bar): the
    # instant selector is the dashboard class; with a 5m rollup whose
    # windows tile the lookback the engine serves it from the rollup
    # table (compiler._rollup_selector). At 3 samples/series the
    # rollup is only ~2-3x smaller than raw, so this measures the
    # ROUTING floor, not the W x win a real scrape interval gives.
    routed_ab = {}
    if os.environ.get("STRESS_ROUTED_AB", "1") != "0":
        import statistics as _st

        from timbala_spark.rollup import SELECTOR, build_rollup, pick_rollup

        W_RU = 300_000
        t0 = time.monotonic()
        ru = build_rollup(table, W_RU)
        # materialize like a store would (compaction writes it out)
        ru_path = os.path.join(store, "rollup_ab")
        ru.write.mode("overwrite").parquet(ru_path)
        ru = spark.read.parquet(ru_path)
        build_s = round(time.monotonic() - t0, 1)
        reng = Engine(spark, table, rollups={W_RU: ru})
        reng.plan_cache_size = 0
        # query time: first 5m boundary covering the last samples
        t_last = BASE_MS + (SAMPLES_PER - 1) * INTERVAL_MS
        t_q = ((t_last + W_RU - 1) // W_RU) * W_RU
        assert (
            pick_rollup({W_RU: ru}, 300_000, 0, t_q, 0, 1, SELECTOR) == W_RU
        )
        walls = {"routed": [], "raw": []}
        got = {}
        for rep in range(3):
            for name, e in (("routed", reng), ("raw", eng)):
                t1 = time.monotonic()
                rows = e.query("m_0", t_q / 1000).collect()
                walls[name].append(round(time.monotonic() - t1, 2))
                got[name] = sorted(
                    (tuple(sorted(r["labels"].items())), r["v"])
                    for r in rows
                )
        assert got["routed"] == got["raw"] and got["raw"], (
            "routed selector must answer exactly the raw result"
        )
        routed_ab = {
            "rollup_build_s": build_s,
            "routed_median": _st.median(walls["routed"]),
            "raw_median": _st.median(walls["raw"]),
            "routed_runs": walls["routed"],
            "raw_runs": walls["raw"],
        }
        print(f"dict-stress routed-ab: {routed_ab}", file=sys.stderr)

    # label_values runs on the engine's samples frame (dict-side
    # distinct over 100k instance values of metric m_0's slice)
    from timbala_spark.api import PromAPI

    api = PromAPI(eng, timeout_s=600)
    t0 = time.monotonic()
    n_jobs = len(api.label_values("job")["data"])
    label_values_s = round(time.monotonic() - t0, 1)

    out = {
        "n_series": SERIES,
        "n_samples": n_rows,
        "cpus": int(CPUS),
        "write_s": write_s,
        "write_persist_s": write_persist_s,
        "compact_s": compact_s,
        "dict_join_broadcast": broadcast_join,
        "dict_join_shuffled": shuffled_join,
        "dict_join_kinds_full": full_kinds,
        "dict_join_kinds_name_slice": slice_kinds,
        "shapes": results,
        "runtime_filter_ab": rf_ab,
        "routed_selector_ab": routed_ab,
        "label_values_s": label_values_s,
        "label_values_job_cardinality": n_jobs,
    }
    print(json.dumps(out))
    spark.stop()
    if not os.environ.get("STRESS_KEEP"):
        shutil.rmtree(store, ignore_errors=True)


if __name__ == "__main__":
    main()
