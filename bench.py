"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {...}, "sf": ...}.

Each query is materialized with a count() (no driver-side collect of
payloads). Wall time includes planning + execution, which is what a
user of the engine experiences.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

#: headline queries (subset of __spark_entry__.queries() spanning the
#: engine surface: scan+lookback, step-grid rate, joins, aggregation,
#: windows, dedup, similarity, text)
HEADLINE = [
    "promql_selector",
    "promql_sum_by",
    "promql_rate_range",
    "promql_avg_over_time",
    "promql_topk",
    "promql_histogram_quantile",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "events_sessions",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_embedding",
    "sim_cosine_topk",
    "multimodal_decode",
    "text_quality",
]


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("timbala-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.monotonic()
        try:
            n = fn(spark, SF_DIR).count()
        except Exception as e:  # keep the bench robust: report, continue
            print(f"bench: {name} failed: {e}", file=sys.stderr)
            timings[name] = -1.0
            continue
        dt = time.monotonic() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"bench: {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
