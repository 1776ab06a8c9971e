"""One-off sweep: ngram_jaccard_pairs max_postings cost/recall on a
dup-heavy 10x corpus with injected boilerplate (VERDICT r4 item 2).

Corpus: sf0.1 documents replicated 10x with fresh ids (every doc gains
9 identical twins), and a shared boilerplate sentence appended to every
third base doc — the two real-world sources of hot posting lists
(boilerplate shingles land in ~16.7k of 50k docs).

Finding from the first run: UNCAPPED on the raw 10x corpus is
infeasible — the posting self-join on the boilerplate shingles alone
is ~10 x 16,700^2 / 2 = 1.4e9 candidate rows; the run was killed after
40+ minutes of full-width CPU. The sweep therefore measures capped
runs on the raw corpus (recall judged against the analytically known
twin-pair set) and capped-vs-uncapped on the exact-dedup survivors,
where uncapped is feasible.

Run: python tools/sweep_ngram.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from timbala_spark.pipeline import exact_dedup, ngram_jaccard_pairs
from timbala_spark.sources.events import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("SWEEP_COPIES", 10))
BOILER = (
    "all rights reserved this document is provided as is without "
    "warranty of any kind either express or implied"
)

spark = (
    SparkSession.builder.master("local[32]")
    .appName("ngram-sweep")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.driver.memory", "24g")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spark.range(10_000_000).selectExpr("sum(id * 2)").collect()

docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
n_base = docs.count()
corpus = (
    docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 3 == 0, F.concat("text", F.lit(" " + BOILER))
        ).otherwise(F.col("text")),
    )
    .crossJoin(spark.range(COPIES).select(F.col("id").alias("_copy")))
    .select(
        (F.col("doc_id") + F.col("_copy") * n_base * 10).alias("doc_id"),
        "text",
    )
)
corpus = corpus.persist()
n_corpus = corpus.count()
print(f"corpus rows: {n_corpus} (copies={COPIES})", file=sys.stderr)


def run(frame, cap, reps=3):
    times, got = [], None
    for _ in range(reps):
        t0 = time.monotonic()
        out = ngram_jaccard_pairs(
            frame, n=7, threshold=0.5, max_postings=cap
        ).select("id_a", "id_b")
        got = {(r["id_a"], r["id_b"]) for r in out.collect()}
        times.append(time.monotonic() - t0)
    return sorted(times)[len(times) // 2], times, got


# --- raw 10x corpus: capped only (uncapped measured infeasible) ------
print("--- raw 10x corpus (capped candidate gen + exact verify) ---")
for cap in [1024, 256, 64, 16]:
    med, times, got = run(corpus, cap)
    print(
        f"cap={cap}: median {med:.2f}s runs={[round(t,2) for t in times]} "
        f"pairs={len(got)}"
    )

# --- survivors after exact dedup: uncapped is feasible here ----------
surv = corpus.join(
    exact_dedup(corpus, ["text"], "doc_id").select("doc_id"), "doc_id"
).persist()
print(f"survivors after exact dedup: {surv.count()}", file=sys.stderr)
print("--- exact-dedup survivors ---")
base_set = None
for cap in [None, 1024, 256, 64, 16]:
    med, times, got = run(surv, cap)
    if cap is None:
        base_set = got
    recall = len(got & base_set) / max(len(base_set), 1)
    print(
        f"cap={cap}: median {med:.2f}s runs={[round(t,2) for t in times]} "
        f"pairs={len(got)} recall_vs_uncapped={recall:.4f}"
    )
