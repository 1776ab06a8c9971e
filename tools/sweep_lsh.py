"""One-off sweep: dedup_embedding LSH (n_planes, n_tables) cost/recall
at $SPARK_GRAFT_SF_DIR (VERDICT r3 item 3). Recall baseline = blocked
mode (exact pair set). Run: python tools/sweep_lsh.py"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from timbala_spark.pipeline import embedding_near_dup_pairs
from timbala_spark.sources.events import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = (
    SparkSession.builder.master("local[32]")
    .appName("lsh-sweep")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.driver.memory", "24g")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spark.range(10_000_000).selectExpr("sum(id * 2)").collect()

emb = load_table(spark, SF_DIR, "embeddings")
surv = emb.groupBy("embedding").agg(F.min("vec_id").alias("vec_id"))
print(f"corpus rows: {emb.count()}, survivors: {surv.count()}", file=sys.stderr)

exact = (
    embedding_near_dup_pairs(surv, threshold=0.4, mode="blocked")
    .select("id_a", "id_b")
    .collect()
)
exact_set = {(r["id_a"], r["id_b"]) for r in exact}
print(f"exact pairs (blocked): {len(exact_set)}", file=sys.stderr)

for n_planes, n_tables in [(4, 16), (8, 8), (6, 12), (5, 10), (4, 8)]:
    times = []
    got = None
    for _ in range(3):
        t0 = time.monotonic()
        out = embedding_near_dup_pairs(
            surv, threshold=0.4, mode="lsh", n_planes=n_planes, n_tables=n_tables
        ).select("id_a", "id_b")
        got = {(r["id_a"], r["id_b"]) for r in out.collect()}
        times.append(time.monotonic() - t0)
    recall = len(got & exact_set) / max(len(exact_set), 1)
    print(
        f"planes={n_planes} tables={n_tables}: median "
        f"{sorted(times)[1]:.2f}s runs={[round(t,2) for t in times]} "
        f"pairs={len(got)} recall={recall:.4f}"
    )

spark.stop()
