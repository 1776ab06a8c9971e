"""A/B: incremental near-dup probe vs full rebuild (r9).

The claim under test (VERDICT r8 "next round" #1): with a persisted
posting index, the recurring cost of a curation pass over a
continuously-fed lake scales with the BATCH, not the corpus — the
full-rebuild operator re-shingles and re-shuffles O(corpus) every
invocation.

Protocol (one session, interleaved per PERF §10; never time two Spark
jobs concurrently):

  for corpus_size in CORPUS_SIZES:
      land corpus parquet; build index once (timed, amortized cost)
      batch = BATCH_DOCS fresh docs (2% near-dup vs corpus)
      A: full rebuild  = ngram_jaccard_pairs(corpus ∪ batch) wall
      B: probe+append  = ngram_index_probe(batch) + append(batch) wall
      repeat REPS times alternating A/B, report minima

Usage:
  AB_CORPUS_SIZES=1000000,4000000 AB_BATCH=100000 \
      python tools/incremental_dedup_ab.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def synth(spark, n_docs, start_id=0):
    """Distinct 20-token hash-derived docs; 2% of rows duplicate a
    neighbor (same recipe as tools/curation_stress.py so the corpus
    shape matches the proven 20M/50M runs)."""
    from pyspark.sql import functions as F

    df = spark.range(start_id, start_id + n_docs).withColumnRenamed(
        "id", "doc_id"
    )
    base = F.when(
        F.pmod("doc_id", F.lit(50)) == 0, F.col("doc_id") - 1
    ).otherwise(F.col("doc_id"))
    text = F.concat_ws(
        " ",
        *[
            F.concat(F.lit("w"), F.hex(F.xxhash64(base, F.lit(i))))
            for i in range(20)
        ],
    )
    return df.withColumn("text", text)


def main() -> None:
    from pyspark.sql import SparkSession

    from timbala_spark.pipeline import (
        ngram_index_append,
        ngram_index_build,
        ngram_index_probe,
        ngram_jaccard_pairs,
    )

    sizes = [
        int(x)
        for x in os.environ.get("AB_CORPUS_SIZES", "1000000,4000000").split(",")
    ]
    batch_n = int(os.environ.get("AB_BATCH", "100000"))
    reps = int(os.environ.get("AB_REPS", "3"))

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("incremental-dedup-ab")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="incr_ab_")
    try:
        for n in sizes:
            cdir = os.path.join(root, f"corpus_{n}")
            synth(spark, n).write.mode("overwrite").parquet(cdir)
            corpus = spark.read.parquet(cdir)
            bdir = os.path.join(root, f"batch_{n}")
            # fresh ids; ~2% of batch docs duplicate a CORPUS doc so the
            # probe's cross join has real work
            from pyspark.sql import functions as F

            fresh = synth(spark, batch_n, start_id=n)
            dup_src = corpus.limit(batch_n // 50).select(
                (F.col("doc_id") + n + batch_n).alias("doc_id"), "text"
            )
            fresh.unionByName(dup_src).write.mode("overwrite").parquet(bdir)
            batch = spark.read.parquet(bdir)
            both = corpus.unionByName(batch)

            idx = os.path.join(root, f"idx_{n}")
            t0 = time.time()
            ngram_index_build(corpus, idx, n=7)
            t_build = time.time() - t0

            t_full, t_probe = [], []
            n_pairs_full = n_pairs_probe = None
            for r in range(reps):
                t0 = time.time()
                n_pairs_full = ngram_jaccard_pairs(
                    both, n=7, threshold=0.5
                ).count()
                t_full.append(time.time() - t0)
                t0 = time.time()
                n_pairs_probe = ngram_index_probe(
                    batch, idx, corpus=both, threshold=0.5
                ).count()
                t_probe.append(time.time() - t0)
            t0 = time.time()
            ngram_index_append(batch, idx)
            t_append = time.time() - t0
            print(
                json.dumps(
                    {
                        "corpus": n,
                        "batch": batch_n + batch_n // 50,
                        "build_s": round(t_build, 2),
                        "full_rebuild_s": round(min(t_full), 2),
                        "probe_s": round(min(t_probe), 2),
                        "append_s": round(t_append, 2),
                        "full_walls": [round(x, 2) for x in t_full],
                        "probe_walls": [round(x, 2) for x in t_probe],
                        "pairs_full": n_pairs_full,
                        "pairs_probe": n_pairs_probe,
                    }
                ),
                flush=True,
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
