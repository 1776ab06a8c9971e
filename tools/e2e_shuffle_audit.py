"""Per-job shuffle audit of the curate_corpus composition.

The reclamation probe (tools/shuffle_reclaim_probe.py) showed Spark
DOES reclaim shuffle files in-process once their dependencies are
JVM-unreachable — dropped refs, held unexecuted frames, and live
localCheckpoint children all go to 0% retained after GC.  So the 20M
composition's monotone ~66 GB scratch growth (PERF §20c takes 2-6)
must be either (a) the live set of individual giant ACTIONS — nothing
can reclaim mid-action — or (b) lineage pinned by persists held
across stages.

This audit runs the composition at a green scale and prints, per
Spark job: description, shuffle WRITE bytes, and the blockmgr dir
size after the job — making the accumulation curve attributable to
specific actions instead of a monotone mystery.

Usage: AUDIT_DOCS=5000000 python tools/e2e_shuffle_audit.py
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("AUDIT_DOCS", "5000000"))


def _eventlog_dir() -> str:
    d = "/tmp/spark-events"
    os.makedirs(d, exist_ok=True)
    return d


def du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    before = set(glob.glob("/tmp/blockmgr-*"))
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("e2e-shuffle-audit")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.cleaner.periodicGC.interval", "30s")
        .config("spark.io.compression.codec", "zstd")
        # AUDIT_EVENTLOG=1: per-stage shuffle attribution post-mortem
        # via tools/parse_eventlog.py
        .config(
            "spark.eventLog.enabled",
            "true" if os.environ.get("AUDIT_EVENTLOG") == "1" else "false",
        )
        .config("spark.eventLog.dir", _eventlog_dir())
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    bm = [d for d in glob.glob("/tmp/blockmgr-*") if d not in before][0]
    print(f"blockmgr: {bm}", flush=True)

    # Py4J job listener: record per-job shuffle write via the status
    # tracker after each job completes.  Simpler and robust: poll the
    # AppStatusStore through the REST-less statusTracker — per-stage
    # shuffle bytes are not exposed there, so instead snapshot the
    # blockmgr growth per top-level ACTION (what we actually need to
    # attribute the curve) and per-action Spark job count.
    sc = spark.sparkContext

    t0 = time.time()

    def mark(label: str) -> None:
        print(
            f"[{time.time()-t0:7.1f}s] {label:<55} blockmgr={du(bm)/1e9:6.2f}GB",
            flush=True,
        )

    # same corpus generator as tools/curation_stress.py e2e stage
    df = (
        spark.range(N_DOCS)
        .withColumn("r", F.pmod(F.xxhash64("id"), F.lit(1_000_000)) / 1_000_000.0)
        .withColumn(
            "source",
            F.concat(F.lit("dom"), F.floor(F.pow(F.lit(20000.0), F.col("r"))).cast("long")),
        )
        .withColumn(
            "lang",
            F.element_at(
                F.array(*[F.lit(x) for x in ("en", "de", "fr", "es", "zh")]),
                (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(5)) + 1).cast("int"),
            ),
        )
        .select(F.col("id").alias("doc_id"), "lang", "source")
        .withColumn("n_tokens", F.lit(20))
    )
    base = F.when(F.pmod("doc_id", F.lit(50)) == 0, F.col("doc_id") - 1).otherwise(
        F.col("doc_id")
    )
    uniq_text = F.concat_ws(
        " ", *[F.concat(F.lit("w"), F.hex(F.xxhash64(base, F.lit(i)))) for i in range(20)]
    )
    corpus = df.withColumn("text", uniq_text).persist()
    corpus.count()
    mark("corpus persisted")

    from timbala_spark.pipeline.curate import near_dup_pipeline
    from timbala_spark.pipeline.dedup import _resolve_persist_shingles
    from timbala_spark.pipeline.sample import cap_per_group, pack_greedy, stratified_sample
    from timbala_spark.pipeline.text import scrub_pii, tokens_expr

    big = not _resolve_persist_shingles(corpus, "text", 7)
    mark(f"big-corpus estimate -> {big}")

    if os.environ.get("AUDIT_FINE") == "1":
        # replicate near_dup_pipeline's internals with a mark (and an
        # explicit materializing action) between every stage, so a
        # scratch explosion is attributable to ONE exchange
        from timbala_spark.pipeline.dedup import (
            connected_components,
            ngram_jaccard_pairs,
        )
        from timbala_spark.pipeline.util import tracked_persist

        dig = corpus.select(
            F.col("doc_id").alias("_id"), F.col("text").alias("_text")
        ).withColumn("_digest", F.sha2(F.col("_text"), 256))
        ids = tracked_persist(dig.select("_id", "_digest"))
        reps = tracked_persist(
            ids.groupBy("_digest").agg(F.min("_id").alias("_rep")),
            release_previous=False,
        )
        mark(f"reps pinned: {reps.count():,}")
        survivors = (
            dig.join(reps, "_digest")
            .filter(F.col("_id") == F.col("_rep"))
            .select(F.col("_id").alias("doc_id"), F.col("_text").alias("text"))
        )
        pairs = ngram_jaccard_pairs(survivors, _release_previous=False)
        mark(f"pairs built (src+posting pins + verify): {pairs.count():,}")
        comp = connected_components(
            reps.select(F.col("_rep").alias("doc_id")), pairs, node_col="doc_id"
        )
        mark(f"components: {comp.count():,}")
        mapping = ids.join(reps, "_digest").select("_id", "_rep")
        cur = (
            mapping.join(comp, mapping["_rep"] == comp["doc_id"])
            .select(
                F.col("_id").alias("doc_id"),
                F.col("component").alias("canonical_id"),
                (F.col("_id") == F.col("component")).cast("long").alias("is_canonical"),
            )
        )
    else:
        cur = near_dup_pipeline(corpus)
    cur = cur.localCheckpoint(eager=True)
    mark("near-dup canonical map checkpointed (THE dedup action)")

    out = corpus.join(cur, "doc_id").filter(F.col("is_canonical") == 1).drop("is_canonical")
    out = scrub_pii(out, text_col="text").drop("text")
    out = out.withColumn("n_tokens", F.size(tokens_expr(F.col("text_scrubbed")))).filter(
        (F.col("n_tokens") >= 5)
        & (F.length("text_scrubbed") / F.col("n_tokens") <= 40.0)
    )
    out = stratified_sample(out, 0.5, "doc_id", seed=0)
    out = cap_per_group(out, "source", 2000, "doc_id")

    scratch = tempfile.mkdtemp(prefix="audit_stage_")
    p = os.path.join(scratch, "curated_stage")
    out.write.mode("overwrite").parquet(p)
    mark("curated stage landed (join+scrub+gate+sample+cap+write)")

    out2 = spark.read.parquet(p)
    from timbala_spark.pipeline.util import tracked_persist

    out2 = tracked_persist(out2, release_previous=False)
    packed = pack_greedy(out2, 4096, "n_tokens", "doc_id")
    row = packed.agg(
        F.max("shard_id"), F.count(F.lit(1)),
        F.sum(
            F.xxhash64("doc_id", "text_scrubbed", "n_tokens", "shard_id", "token_offset").cast(
                "decimal(38,0)"
            )
        ),
    ).collect()[0]
    mark(f"packed + aggregated: {tuple(row)}")

    # settle: what is RECLAIMABLE once the run's refs go dead?
    import gc

    spark.catalog.clearCache()
    del corpus, cur, out, out2, packed
    gc.collect()
    spark._jvm.System.gc()
    time.sleep(35)
    gc.collect()
    spark._jvm.System.gc()
    time.sleep(35)
    mark("after clearCache + GC settle")
    print("done", flush=True)


if __name__ == "__main__":
    main()
