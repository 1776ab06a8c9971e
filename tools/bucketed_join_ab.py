"""Bucketed-layout prototype A/B for the samples⋈dict join (PERF §12:
the dict-side SMJ exchange is the 40M-series selector's floor once
runtime filters are ruled out).

Spark bucketing co-locates both sides of an equi-join at WRITE time:
``bucketBy(N, "series_id").sortBy("series_id")`` on both tables makes
the SMJ exchange-free (and with matching sort order, sort-free) — the
classic 100 TB lever for a join that repeats every query against the
same keys. The split store writes path-based parquet (no catalog), so
this is a measured DESIGN OPTION for the compaction rewrite, not a
store change: compaction could publish bucketed generations once a
catalog is part of the deployment.

Measures, interleaved in one session (PERF §10):
  A  path-parquet join (the store's current shape) — both sides
     exchange on series_id;
  B  bucketed-table join — plan must contain NO Exchange above either
     scan (asserted), only the join's sort/merge.

Usage: AB_SERIES=5000000 python tools/bucketed_join_ab.py
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SERIES = int(os.environ.get("AB_SERIES", "5000000"))
SAMPLES_PER = 3
BUCKETS = 64


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    wh = tempfile.mkdtemp(prefix="bucketed_ab_wh_")
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("bucketed-join-ab")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.warehouse.dir", wh)
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # AQE coalescing can re-introduce a shuffle on the path side;
        # leave it on (production shape) — the bucketed side must be
        # exchange-free regardless
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    dict_df = spark.range(SERIES).select(
        F.col("id").alias("series_id"),
        F.concat(F.lit("m_"), F.pmod("id", F.lit(50))).alias("name"),
        F.map_from_arrays(
            F.array(F.lit("__name__"), F.lit("instance")),
            F.array(
                F.concat(F.lit("m_"), F.pmod("id", F.lit(50))),
                F.concat(F.lit("inst-"), F.pmod("id", F.lit(100000))),
            ),
        ).alias("labels"),
    )
    samples = (
        spark.range(SERIES * SAMPLES_PER)
        .select(
            (F.col("id") % SERIES).alias("series_id"),
            (F.lit(1_700_000_000_000) + (F.col("id") / SERIES).cast("long") * 60_000).alias("t"),
            F.rand(7).alias("v"),
        )
    )

    base = tempfile.mkdtemp(prefix="bucketed_ab_")
    p_dict, p_samp = os.path.join(base, "dict"), os.path.join(base, "samples")
    dict_df.write.mode("overwrite").parquet(p_dict)
    samples.write.mode("overwrite").parquet(p_samp)
    for tbl in ("b_dict", "b_samples"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    dict_df.write.bucketBy(BUCKETS, "series_id").sortBy("series_id").mode(
        "overwrite"
    ).saveAsTable("b_dict")
    samples.write.bucketBy(BUCKETS, "series_id").sortBy("series_id").mode(
        "overwrite"
    ).saveAsTable("b_samples")

    def path_join():
        s = spark.read.parquet(p_samp)
        d = spark.read.parquet(p_dict).filter(F.col("name") == "m_0")
        return s.join(d, "series_id").groupBy("name").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
        )

    def bucketed_join():
        s = spark.table("b_samples")
        d = spark.table("b_dict").filter(F.col("name") == "m_0")
        return s.join(d, "series_id").groupBy("name").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
        )

    # plan gate: the bucketed join must not exchange either join side.
    # Count Exchanges BELOW the SMJ (the final 1-group aggregate's own
    # exchange is expected in both shapes).
    def exchanges_below_join(df) -> int:
        plan = df._jdf.queryExecution().executedPlan().toString()
        join_at = plan.lower().find("sortmergejoin")
        if join_at < 0:
            # AQE may pick broadcast for the filtered dict — fine, but
            # then the comparison is not the one under test; force SMJ
            # by the caller if this triggers
            return -1
        return plan[join_at:].count("Exchange")

    eb = exchanges_below_join(bucketed_join())
    ep = exchanges_below_join(path_join())
    print(f"exchanges below join: path={ep} bucketed={eb}", flush=True)
    assert eb == 0, "bucketed join must be exchange-free below the SMJ"

    walls = {"path": [], "bucketed": []}
    for rep in range(3):
        for name, fn in (("path", path_join), ("bucketed", bucketed_join)):
            t0 = time.monotonic()
            fn().collect()
            walls[name].append(round(time.monotonic() - t0, 2))
    for name, w in walls.items():
        print(f"bucketed-ab {name}: median {statistics.median(w)}s of {w}", flush=True)
    spark.stop()
    shutil.rmtree(base, ignore_errors=True)
    shutil.rmtree(wh, ignore_errors=True)


if __name__ == "__main__":
    main()
