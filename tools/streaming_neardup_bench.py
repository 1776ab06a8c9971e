"""Streaming near-dup throughput on record (r10, VERDICT r9 task 6).

r9 proved the online near-dup stage functionally (batch ≡ stream
parity, replay idempotence) and priced the BATCH probe API (PERF §22:
probe flat in corpus size); what had no recorded number was the
foreachBatch path itself — per-batch survivors listing, the
localCheckpoints inside ``near_dup_batch_stage``, checkpointing, and
(r10) the settled-generation survivor compaction.  This harness drives
a real Structured Streaming query, one micro-batch per trigger,
against a PRE-SEEDED index + survivors corpus and reports per-batch
walls straight from the engine's own progress events.

Seeding pattern: the corpus lands as ``batch=-1`` and is folded by
``compact_survivors`` into the settled generation BEFORE the stream
starts (stream batch ids start at 0 > settled_through=-1, so the
reader rule keeps every stream batch live until its own fold); the
index is built over the same corpus, preserving the invariant that
the survivors tree covers every indexed id.

Usage:
  SNB_CORPUS=4000000 SNB_BATCHES=20 SNB_BATCH=100000 \
      SNB_COMPACT_EVERY=5 python tools/streaming_neardup_bench.py
  SNB_KIND=embedding SNB_CORPUS=1000000 SNB_PLANES=22 \
      python tools/streaming_neardup_bench.py   # vector modality
  SNB_KIND=embedding SNB_PLANES=auto \
      python tools/streaming_neardup_bench.py   # r11 auto ladder —
      # the seed index takes the rung depth for SNB_CORPUS and the
      # stream reconciles itself on rung crossings; the summary
      # reports the final meta shape so the climb is visible

Knobs: SNB_DUP_PER_BATCH (rows per batch duplicating a corpus doc;
default batch/50 — 0 streams all-fresh batches, exercising the
no-pair fast path) and SNB_LADDER_TARGET (auto mode's
target_collisions rung parameter, default 0.25 — the probe-economics
rung, NOT the batch self-join's bucket target).

Prints one JSON line per micro-batch ({"batch": i, "wall_s": ...})
and a summary line (including the final survivor count, so two arms
of an A/B can assert identical survivor sets); the claim under test
is that per-batch wall is FLAT across the run (bounded listing via
compaction; bounded candidates via the plane ladder) instead of
growing with accumulated batches.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.incremental_dedup_ab import synth, synth_vecs  # noqa: E402


def main() -> None:
    from pyspark.sql import SparkSession

    from timbala_spark.pipeline.incremental import (
        embedding_index_build,
        ngram_index_build,
    )
    from timbala_spark.pipeline.streaming import (
        compact_survivors,
        streaming_near_dup,
    )

    kind = os.environ.get("SNB_KIND", "ngram")
    n_corpus = int(os.environ.get("SNB_CORPUS", "4000000"))
    n_batches = int(os.environ.get("SNB_BATCHES", "20"))
    batch_n = int(os.environ.get("SNB_BATCH", "100000"))
    compact_every = int(os.environ.get("SNB_COMPACT_EVERY", "5")) or None
    dim = int(os.environ.get("SNB_DIM", "16"))
    planes_env = os.environ.get("SNB_PLANES", "22")
    auto_ladder = planes_env == "auto"
    ladder_target = float(os.environ.get("SNB_LADDER_TARGET", "0.25"))
    n_tables = int(os.environ.get("SNB_TABLES", "4"))
    dup_per_batch = int(
        os.environ.get("SNB_DUP_PER_BATCH", str(batch_n // 50))
    )
    threshold_emb = 0.95
    if auto_ladder:
        from timbala_spark.pipeline.incremental import embedding_params_for

        n_planes = embedding_params_for(n_corpus, ladder_target)
    else:
        n_planes = int(planes_env)

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("streaming-neardup-bench")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="snb_")
    idx = os.path.join(root, "idx")
    surv = os.path.join(root, "surv")
    src = os.path.join(root, "src")
    ckpt = os.path.join(root, "ckpt")
    if kind == "embedding":
        schema = f"vec_id long, embedding array<double>"
        id_col, content_col = "vec_id", "embedding"
        mk = lambda n, start=0: synth_vecs(spark, n, dim, start_id=start)
    else:
        schema = "doc_id long, text string"
        id_col, content_col = "doc_id", "text"
        mk = lambda n, start=0: synth(spark, n, start_id=start)
    try:
        # seed: corpus -> settled survivors + index
        corpus = mk(n_corpus)
        corpus.write.parquet(os.path.join(surv, "batch=-1"))
        compact_survivors(spark, surv, schema)
        settled = spark.read.schema(schema).parquet(
            os.path.join(surv, "settled-0")
        )
        if kind == "embedding":
            embedding_index_build(
                settled, idx, dim=dim, n_planes=n_planes, n_tables=n_tables
            )
        else:
            ngram_index_build(settled, idx, n=7)

        # land the stream's input files, one per micro-batch; ~2% of
        # each batch duplicates a corpus doc so probes do real work
        os.makedirs(src)
        from pyspark.sql import functions as F

        for k in range(n_batches):
            start = n_corpus + k * batch_n
            fresh = mk(batch_n - dup_per_batch, start=start)
            batch_frame = fresh
            if dup_per_batch:
                dup = corpus.limit(dup_per_batch).select(
                    (F.col(id_col) + start + batch_n).alias(id_col),
                    content_col,
                )
                batch_frame = fresh.unionByName(dup)
            stage = os.path.join(root, f"stage{k}")
            batch_frame.coalesce(1).write.mode(
                "overwrite"
            ).parquet(stage)
            part = [
                f for f in os.listdir(stage) if f.endswith(".parquet")
            ][0]
            dst = os.path.join(src, f"{k:05d}.parquet")
            os.rename(os.path.join(stage, part), dst)
            os.utime(dst, (1_000_000 + k, 1_000_000 + k))
            shutil.rmtree(stage, ignore_errors=True)

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        if kind == "embedding":
            # ladder kwargs only in auto mode, so the pinned-shape
            # config also runs on pre-r11 checkouts (worktree A/B arms)
            ladder_kw = (
                {
                    "n_planes": "auto",
                    "ladder_target_collisions": ladder_target,
                }
                if auto_ladder
                else {"n_planes": n_planes}
            )
            q = streaming_near_dup(
                stream,
                idx,
                surv,
                ckpt,
                id_col=id_col,
                text_col=content_col,
                threshold=threshold_emb,
                kind="embedding",
                dim=dim,
                n_tables=n_tables,
                compact_every=compact_every,
                **ladder_kw,
            )
        else:
            q = streaming_near_dup(
                stream,
                idx,
                surv,
                ckpt,
                threshold=0.5,
                n=7,
                compact_every=compact_every,
            )
        q.awaitTermination()
        walls = []
        for p in q.recentProgress:
            if p is None or p.get("numInputRows", 0) == 0:
                continue
            w = p["durationMs"].get("triggerExecution", 0) / 1000.0
            walls.append((p["batchId"], w))
            print(
                json.dumps({"batch": p["batchId"], "wall_s": round(w, 2)}),
                flush=True,
            )
        du = subprocess.run(
            ["du", "-sb", root], capture_output=True, text=True
        ).stdout.split()[0]
        ws = [w for _, w in walls]
        half = max(1, len(ws) // 2)
        from timbala_spark.pipeline.incremental import _read_meta
        from timbala_spark.pipeline.streaming import read_survivors

        meta = _read_meta(idx)
        n_survivors = read_survivors(spark, surv, schema).count()
        print(
            json.dumps(
                {
                    "kind": kind,
                    "corpus": n_corpus,
                    "batches": len(ws),
                    "batch_rows": batch_n,
                    "compact_every": compact_every,
                    "survivors": n_survivors,
                    "final_shape": {
                        k: meta[k]
                        for k in ("n_planes", "n_tables", "indexed_vecs")
                        if k in meta
                    }
                    if kind == "embedding"
                    else None,
                    "wall_first_half_avg_s": round(sum(ws[:half]) / half, 2),
                    "wall_second_half_avg_s": round(
                        sum(ws[half:]) / max(1, len(ws) - half), 2
                    ),
                    "wall_min_s": round(min(ws), 2),
                    "wall_max_s": round(max(ws), 2),
                    "scratch_bytes": int(du),
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
