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
  AB_KIND=embedding AB_CORPUS_SIZES=1000000,4000000 \
      python tools/incremental_dedup_ab.py   # r10: vector modality —
      # full = embedding_near_dup_pairs(mode=lsh) re-signing O(corpus);
      # probe = persisted (vec_id, table, bucket) index
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


def synth_vecs(spark, n_rows, dim=32, start_id=0):
    """Distinct pseudo-random vectors in [-1, 1]^dim derived from
    xxhash64; 2% of rows duplicate a neighbor (exact near-dups the
    LSH probe must find)."""
    from pyspark.sql import functions as F

    df = spark.range(start_id, start_id + n_rows).withColumnRenamed(
        "id", "vec_id"
    )
    base = F.when(
        F.pmod("vec_id", F.lit(50)) == 0, F.col("vec_id") - 1
    ).otherwise(F.col("vec_id"))
    vec = F.array(
        *[
            (
                F.pmod(F.xxhash64(base, F.lit(i)), F.lit(1_000_000)).cast(
                    "double"
                )
                / 500_000.0
                - 1.0
            )
            for i in range(dim)
        ]
    )
    return df.withColumn("embedding", vec)


def main() -> None:
    from pyspark.sql import SparkSession

    from timbala_spark.pipeline import (
        embedding_index_append,
        embedding_index_build,
        embedding_index_probe,
        embedding_near_dup_pairs,
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

    kind = os.environ.get("AB_KIND", "ngram")
    root = tempfile.mkdtemp(prefix="incr_ab_")
    try:
        for n in sizes:
            from pyspark.sql import functions as F

            cdir = os.path.join(root, f"corpus_{n}")
            bdir = os.path.join(root, f"batch_{n}")
            if kind == "embedding":
                # Plane depth follows the corpus on the log2 ladder
                # (AB_PLANES may be a comma list, one per corpus size):
                # random pairs collide at T/2^planes per table, so a
                # FIXED depth makes batch×corpus candidate volume — and
                # probe cost — grow linearly with the corpus, while
                # planes ∝ log2(corpus) pins it constant.  This mirrors
                # lsh_params_for's auto shape and reconcile()'s
                # re-parameterization path; the full-rebuild arm uses
                # the same shape per size, so each size's comparison is
                # apples-to-apples.
                dim = int(os.environ.get("AB_DIM", "32"))
                planes_list = [
                    int(x)
                    for x in os.environ.get("AB_PLANES", "20").split(",")
                ]
                n_planes = planes_list[
                    min(sizes.index(n), len(planes_list) - 1)
                ]
                n_tables = int(os.environ.get("AB_TABLES", "4"))
                synth_vecs(spark, n, dim).write.mode("overwrite").parquet(
                    cdir
                )
                corpus = spark.read.parquet(cdir)
                fresh = synth_vecs(spark, batch_n, dim, start_id=n)
                dup_src = corpus.limit(batch_n // 50).select(
                    (F.col("vec_id") + n + batch_n).alias("vec_id"),
                    "embedding",
                )
                fresh.unionByName(dup_src).write.mode("overwrite").parquet(
                    bdir
                )
            else:
                synth(spark, n).write.mode("overwrite").parquet(cdir)
                corpus = spark.read.parquet(cdir)
                # fresh ids; ~2% of batch docs duplicate a CORPUS doc so
                # the probe's cross join has real work
                fresh = synth(spark, batch_n, start_id=n)
                dup_src = corpus.limit(batch_n // 50).select(
                    (F.col("doc_id") + n + batch_n).alias("doc_id"), "text"
                )
                fresh.unionByName(dup_src).write.mode("overwrite").parquet(
                    bdir
                )
            batch = spark.read.parquet(bdir)
            both = corpus.unionByName(batch)

            idx = os.path.join(root, f"idx_{n}")
            t0 = time.time()
            if kind == "embedding":
                embedding_index_build(
                    corpus, idx, dim=dim, n_planes=n_planes, n_tables=n_tables
                )
            else:
                ngram_index_build(corpus, idx, n=7)
            t_build = time.time() - t0

            t_full, t_probe = [], []
            n_pairs_full = n_pairs_probe = None
            for r in range(reps):
                t0 = time.time()
                if kind == "embedding":
                    n_pairs_full = embedding_near_dup_pairs(
                        both,
                        threshold=0.9,
                        mode="lsh",
                        dim=dim,
                        n_planes=n_planes,
                        n_tables=n_tables,
                    ).count()
                else:
                    n_pairs_full = ngram_jaccard_pairs(
                        both, n=7, threshold=0.5
                    ).count()
                t_full.append(time.time() - t0)
                t0 = time.time()
                if kind == "embedding":
                    n_pairs_probe = embedding_index_probe(
                        batch, idx, corpus=both, threshold=0.9
                    ).count()
                else:
                    n_pairs_probe = ngram_index_probe(
                        batch, idx, corpus=both, threshold=0.5
                    ).count()
                t_probe.append(time.time() - t0)
            t0 = time.time()
            if kind == "embedding":
                embedding_index_append(batch, idx)
            else:
                ngram_index_append(batch, idx)
            t_append = time.time() - t0
            print(
                json.dumps(
                    {
                        "kind": kind,
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
