"""Streaming curation stages (pipeline/streaming.py): online exact
dedup + quality gate under Structured Streaming, checked against the
batch operators' semantics on the same rows."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F


DOC_SCHEMA = "doc_id long, text string, ts timestamp"


def _write_batch(src_dir: str, name: str, rows: list[dict]) -> None:
    with open(os.path.join(src_dir, name), "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))


def _run_stream(spark, tmp, transform, batches):
    """File-source stream -> transform -> append parquet sink; feed
    ``batches`` one file at a time with processAllAvailable between
    (distinct micro-batches, so dedup state genuinely crosses them)."""
    src = os.path.join(tmp, "src")
    out = os.path.join(tmp, "out")
    ckpt = os.path.join(tmp, "ckpt")
    os.makedirs(src)
    _write_batch(src, "b0.json", batches[0])
    stream = (
        spark.readStream.schema(DOC_SCHEMA).json(src)
    )
    q = (
        transform(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        for i, rows in enumerate(batches[1:], 1):
            _write_batch(src, f"b{i}.json", rows)
            q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.schema(DOC_SCHEMA).parquet(out)


class TestStreamingExactDedup:
    def test_first_seen_wins_across_microbatches(self, spark):
        from timbala_spark.pipeline import streaming_exact_dedup

        tmp = tempfile.mkdtemp(prefix="stream_dedup_")
        try:
            b0 = [
                {"doc_id": 1, "text": "alpha beta gamma delta epsilon"},
                {"doc_id": 2, "text": "one two three four five six"},
                {"doc_id": 3, "text": "alpha beta gamma delta epsilon"},
            ]
            # batch 2 re-sends batch-1 content with new ids + one new doc
            b1 = [
                {"doc_id": 10, "text": "alpha beta gamma delta epsilon"},
                {"doc_id": 11, "text": "one two three four five six"},
                {"doc_id": 12, "text": "seven eight nine ten eleven twelve"},
            ]
            got = _run_stream(
                spark,
                tmp,
                lambda s: streaming_exact_dedup(s, ["text"]),
                [b0, b1],
            )
            rows = got.orderBy("doc_id").collect()
            texts = [r["text"] for r in rows]
            # exactly one row per distinct text, duplicates from BOTH
            # the same batch (doc 3) and the later batch (10, 11) dropped
            assert sorted(texts) == sorted(
                [
                    "alpha beta gamma delta epsilon",
                    "one two three four five six",
                    "seven eight nine ten eleven twelve",
                ]
            )
            # first-seen ids survived
            assert {r["doc_id"] for r in rows} == {1, 2, 12}
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    def test_state_survives_restart(self, spark):
        """The digest state is checkpointed: a NEW query over the same
        checkpoint must still drop duplicates of pre-restart content."""
        from timbala_spark.pipeline import streaming_exact_dedup

        tmp = tempfile.mkdtemp(prefix="stream_dedup_restart_")
        try:
            src = os.path.join(tmp, "src")
            out = os.path.join(tmp, "out")
            ckpt = os.path.join(tmp, "ckpt")
            os.makedirs(src)

            def start():
                stream = spark.readStream.schema(DOC_SCHEMA).json(src)
                return (
                    streaming_exact_dedup(stream, ["text"])
                    .writeStream.format("parquet")
                    .option("path", out)
                    .option("checkpointLocation", ckpt)
                    .start()
                )

            _write_batch(src, "b0.json", [
                {"doc_id": 1, "text": "the quick brown fox jumps"},
            ])
            q = start()
            q.processAllAvailable()
            q.stop()

            _write_batch(src, "b1.json", [
                {"doc_id": 2, "text": "the quick brown fox jumps"},
                {"doc_id": 3, "text": "a genuinely new document body"},
            ])
            q = start()
            q.processAllAvailable()
            q.stop()

            rows = spark.read.schema(DOC_SCHEMA).parquet(out).collect()
            assert {r["doc_id"] for r in rows} == {1, 3}
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    def test_batch_frame_parity(self, spark):
        """On a plain batch frame the operator degrades to one row per
        digest — same distinct-content set as batch exact_dedup."""
        from timbala_spark.pipeline import exact_dedup, streaming_exact_dedup

        df = spark.createDataFrame(
            [
                (1, "same text here"),
                (2, "same text here"),
                (3, "different text there"),
            ],
            "doc_id long, text string",
        )
        got = streaming_exact_dedup(df, ["text"])
        assert got.count() == 2
        assert sorted(r["text"] for r in got.collect()) == [
            "different text there",
            "same text here",
        ]
        # batch exact_dedup sees the same number of distinct documents
        assert exact_dedup(df, ["text"], "doc_id").count() == 2


class TestStreamingDedupProperty:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_random_batching_invariance(self, spark, seed):
        """Metamorphic: however the same rows are split into
        micro-batches, the streamed survivors' distinct-text set must
        equal the batch distinct-text set (first-seen-wins only
        changes WHICH id survives, never the content set)."""
        import random

        from timbala_spark.pipeline import streaming_exact_dedup

        rng = random.Random(seed)
        vocab = ["w%d" % i for i in range(30)]
        docs = []
        for i in range(60):
            # ~50% duplicates by construction
            if docs and rng.random() < 0.5:
                text = rng.choice(docs)[1]
            else:
                text = " ".join(rng.choice(vocab) for _ in range(8))
            docs.append((i, text))
        # random batch split points
        k = rng.randint(1, 4)
        cuts = sorted(rng.sample(range(1, len(docs)), k))
        batches, lo = [], 0
        for c in cuts + [len(docs)]:
            batches.append(
                [{"doc_id": i, "text": t} for i, t in docs[lo:c]]
            )
            lo = c
        tmp = tempfile.mkdtemp(prefix=f"stream_prop_{seed}_")
        try:
            got = _run_stream(
                spark,
                tmp,
                lambda s: streaming_exact_dedup(s, ["text"]),
                batches,
            )
            out = got.collect()
            expect_texts = {t for _, t in docs}
            assert {r["text"] for r in out} == expect_texts
            assert len(out) == len(expect_texts)  # exactly one each
            # every survivor id is the FIRST id that carried its text.
            # (Within one micro-batch Spark keeps an arbitrary row per
            # key; each batch here is one tiny file = one partition
            # processed in file order, so first-by-id is deterministic
            # for THIS harness — the cross-batch guarantee is the
            # operator contract.)
            first = {}
            for i, t in docs:
                first.setdefault(t, i)
            assert {r["doc_id"] for r in out} == set(first.values())
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


class TestStreamingQualityGate:
    def test_matches_batch_gate(self, spark):
        """The streaming gate keeps exactly the rows curate_corpus's
        batch gate keeps, and n_tokens agrees."""
        from timbala_spark.pipeline import streaming_quality_gate
        from timbala_spark.pipeline.text import tokens_expr

        rows = [
            (1, "a solid document with plenty of ordinary words"),
            (2, "tiny"),  # under min_tokens
            (3, "x" * 500 + " yyy zzz aaa bbb"),  # huge mean token len
            (4, "five words is just enough"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = streaming_quality_gate(df, min_tokens=5)
        ids = {r["doc_id"] for r in got.collect()}
        assert ids == {1, 4}
        batch = df.withColumn(
            "n_tokens", F.size(tokens_expr(F.col("text")))
        ).filter(
            (F.col("n_tokens") >= 5)
            & (F.length("text") / F.col("n_tokens") <= 40.0)
        )
        assert {r["doc_id"] for r in batch.collect()} == ids

    def test_streaming_end_to_end(self, spark):
        """Gate composed after dedup on a real stream."""
        from timbala_spark.pipeline import (
            streaming_exact_dedup,
            streaming_quality_gate,
        )

        tmp = tempfile.mkdtemp(prefix="stream_gate_")
        try:
            b0 = [
                {"doc_id": 1, "text": "a solid document with plenty of ordinary words"},
                {"doc_id": 2, "text": "tiny"},
                {"doc_id": 3, "text": "a solid document with plenty of ordinary words"},
            ]
            got = _run_stream(
                spark,
                tmp,
                lambda s: streaming_quality_gate(
                    streaming_exact_dedup(s, ["text"]), min_tokens=5
                ).drop("n_tokens"),
                [b0],
            )
            assert {r["doc_id"] for r in got.collect()} == {1}
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


class TestStreamingNearDup:
    """r9: online near-dup at ingest via the persisted posting index
    (pipeline/incremental.py) — closes the r8 streaming-tier split
    (near-dup needed corpus-wide visibility; the index provides it
    priced per batch)."""

    def _rows(self):
        # three id-banded batches; planted near-dups:
        #   1 dups 0 (within batch 0)          -> 1 dropped
        #   15 dups 0 (cross batch, later)     -> 15 dropped
        #   22 dups 21 (within batch 2)        -> 22 dropped
        #   27 dups 15 (15 was DROPPED; its canonical 0 is indexed,
        #               so 27 matches 0 and drops too)
        import random

        rng = random.Random(3)
        uniq = lambda i: " ".join(
            f"w{i}_{rng.randrange(1000)}" for _ in range(12)
        )
        texts = {}
        for i in list(range(10)) + list(range(10, 20)) + list(range(20, 30)):
            texts[i] = uniq(i)
        texts[1] = texts[0]
        texts[15] = texts[0]
        texts[22] = texts[21]
        texts[27] = texts[15]
        b0 = [(i, texts[i]) for i in range(10)]
        b1 = [(i, texts[i]) for i in range(10, 20)]
        b2 = [(i, texts[i]) for i in range(20, 30)]
        return b0, b1, b2

    def test_matches_sequential_protocol_and_expectation(
        self, spark, tmp_path
    ):
        import os
        import time as _time

        from timbala_spark.pipeline.incremental import ngram_index_build
        from timbala_spark.pipeline.streaming import (
            near_dup_batch_stage,
            streaming_near_dup,
        )

        batches = self._rows()
        src = str(tmp_path / "src")
        os.makedirs(src)
        for k, rows in enumerate(batches):
            df = spark.createDataFrame(rows, "doc_id long, text string")
            tmp = str(tmp_path / f"stage{k}")
            df.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
            dst = os.path.join(src, f"{k}.parquet")
            os.rename(os.path.join(tmp, part), dst)
            # file-source batch order follows modification time
            os.utime(dst, (1_000_000 + k, 1_000_000 + k))

        idx = str(tmp_path / "idx")
        surv = str(tmp_path / "surv")
        ckpt = str(tmp_path / "ckpt")
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = streaming_near_dup(
            stream, idx, surv, ckpt, threshold=0.5, n=3
        )
        q.awaitTermination()
        got = {
            r["doc_id"]
            for r in spark.read.schema("doc_id long, text string")
            .parquet(surv)
            .select("doc_id")
            .collect()
        }
        expected = set(range(30)) - {1, 15, 22, 27}
        assert got == expected

        # sequential batch protocol over the same batches == streaming
        idx2 = str(tmp_path / "idx2")
        first = spark.createDataFrame(batches[0], "doc_id long, text string")
        ngram_index_build(first.limit(0), idx2, n=3)
        acc = None
        for rows in batches:
            df = spark.createDataFrame(rows, "doc_id long, text string")
            s = near_dup_batch_stage(
                df,
                idx2,
                acc if acc is not None else df.limit(0),
                threshold=0.5,
            )
            acc = s if acc is None else acc.unionByName(s)
            acc = acc.localCheckpoint(eager=True)
        seq = {r["doc_id"] for r in acc.collect()}
        assert seq == got

        # replay idempotence: a second availableNow run over the same
        # checkpoint sees no new files and changes nothing
        q2 = streaming_near_dup(
            stream, idx, surv, ckpt, threshold=0.5, n=3
        )
        q2.awaitTermination()
        got2 = {
            r["doc_id"]
            for r in spark.read.schema("doc_id long, text string")
            .parquet(surv)
            .select("doc_id")
            .collect()
        }
        assert got2 == got


class TestSurvivorCompaction:
    """r10: settled-generation folding of the per-batch survivors tree
    (VERDICT r9 missing #3 — per-batch dirs accumulated one per
    micro-batch and the corpus listing grew with stream lifetime)."""

    def test_compacted_stream_matches_uncompacted(self, spark, tmp_path):
        import os

        from timbala_spark.pipeline.streaming import (
            read_survivors,
            streaming_near_dup,
        )

        batches = TestStreamingNearDup()._rows()
        src = str(tmp_path / "src")
        os.makedirs(src)
        for k, rows in enumerate(batches):
            df = spark.createDataFrame(rows, "doc_id long, text string")
            tmp = str(tmp_path / f"stage{k}")
            df.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
            dst = os.path.join(src, f"{k}.parquet")
            os.rename(os.path.join(tmp, part), dst)
            os.utime(dst, (1_000_000 + k, 1_000_000 + k))

        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        surv = str(tmp_path / "surv")
        q = streaming_near_dup(
            stream,
            str(tmp_path / "idx"),
            surv,
            str(tmp_path / "ckpt"),
            threshold=0.5,
            n=3,
            compact_every=2,
        )
        q.awaitTermination()
        got = {
            r["doc_id"]
            for r in read_survivors(spark, surv, "doc_id long, text string")
            .select("doc_id")
            .collect()
        }
        assert got == set(range(30)) - {1, 15, 22, 27}
        # dirs bounded: one settled generation, at most compact_every-1
        # live batch dirs (3 batches, folded at batch 1)
        entries = sorted(os.listdir(surv))
        batch_dirs = [e for e in entries if e.startswith("batch=")]
        settled = [e for e in entries if e.startswith("settled-")]
        assert len(settled) == 1
        assert len(batch_dirs) <= 1, entries

    def test_reader_rule_ignores_folded_dirs(self, spark, tmp_path):
        """A folded batch dir whose sweep a crash skipped (or that a
        replayed batch rewrote) must be invisible to readers — no
        double-count — and the next compaction sweeps it."""
        import os

        from timbala_spark.pipeline.streaming import (
            compact_survivors,
            read_survivors,
            survivor_paths,
        )

        surv = str(tmp_path / "surv")
        schema = "doc_id long, text string"
        for bid, rows in ((0, [(0, "a"), (1, "b")]), (1, [(2, "c")])):
            spark.createDataFrame(rows, schema).write.parquet(
                os.path.join(surv, f"batch={bid}")
            )
        assert compact_survivors(spark, surv, schema) == 2
        want = {(0, "a"), (1, "b"), (2, "c")}
        got = {
            (r["doc_id"], r["text"])
            for r in read_survivors(spark, surv, schema).collect()
        }
        assert got == want
        # a stale rewrite of a folded dir: invisible to the reader rule
        spark.createDataFrame([(2, "STALE")], schema).write.parquet(
            os.path.join(surv, "batch=1")
        )
        got2 = {
            (r["doc_id"], r["text"])
            for r in read_survivors(spark, surv, schema).collect()
        }
        assert got2 == want
        # ...and swept by the next compaction even with nothing to fold
        assert compact_survivors(spark, surv, schema) == 0
        assert not any(
            e.startswith("batch=") for e in os.listdir(surv)
        )
        # new live batches keep composing after the fold
        spark.createDataFrame([(9, "z")], schema).write.parquet(
            os.path.join(surv, "batch=7")
        )
        paths = survivor_paths(surv)
        assert len(paths) == 2  # settled + one live dir
        got3 = {
            (r["doc_id"], r["text"])
            for r in read_survivors(spark, surv, schema).collect()
        }
        assert got3 == want | {(9, "z")}

    def test_fold_is_batch_priced_and_merge_consolidates(
        self, spark, tmp_path
    ):
        """Folds rewrite ONLY live batch dirs (settled generations
        accumulate); merge consolidates to one, value-identically."""
        import os

        from timbala_spark.pipeline.streaming import (
            _read_surv_meta,
            compact_survivors,
            read_survivors,
        )

        surv = str(tmp_path / "surv")
        schema = "doc_id long, text string"
        want = set()
        for bid in range(6):
            rows = [(bid * 10 + j, f"t{bid}_{j}") for j in range(3)]
            want |= set(rows)
            spark.createDataFrame(rows, schema).write.parquet(
                os.path.join(surv, f"batch={bid}")
            )
            # fold each batch separately: one generation per fold
            assert compact_survivors(spark, surv, schema) == 1
        meta, _ = _read_surv_meta(surv)
        assert len(meta["gens"]) == 6  # folds never rewrote settled data
        got = {
            (r["doc_id"], r["text"])
            for r in read_survivors(spark, surv, schema).collect()
        }
        assert got == want
        compact_survivors(spark, surv, schema, mode="merge")
        meta, _ = _read_surv_meta(surv)
        assert len(meta["gens"]) == 1
        settled_dirs = [
            e for e in os.listdir(surv) if e.startswith("settled-")
        ]
        assert settled_dirs == [meta["gens"][0]]
        got2 = {
            (r["doc_id"], r["text"])
            for r in read_survivors(spark, surv, schema).collect()
        }
        assert got2 == want


class TestEmbeddingAutoLadder:
    """r11 (VERDICT r10 task 1): n_planes="auto" climbs the
    plane-depth ladder from inside foreachBatch — the index meta owns
    the bucket shape, rung crossings trigger an automatic reconcile,
    and the stream stays green across the climb."""

    def test_params_for_is_a_monotone_ladder(self):
        from timbala_spark.pipeline.incremental import embedding_params_for

        prev_p = 0
        for n in (0, 100, 1_000, 10_000, 100_000, 1_000_000, 4_000_000):
            p = embedding_params_for(n)
            assert p >= prev_p and p >= 2
            prev_p = p
        # the rung function grows log2: 1M → 4M at the default target
        # is exactly two planes deeper — and the default rung matches
        # the PERF §22 recorded ladder points (22 @ 1M, 24 @ 4M)
        assert embedding_params_for(1_000_000) == 22
        assert embedding_params_for(4_000_000) == 24

    def _rows(self):
        # 60 vectors in three batches of 20; planted near-dups:
        #   1 dups 0 (within batch 0)      -> 1 dropped
        #   25 dups 0 (cross batch)        -> 25 dropped
        #   42 dups 41 (within batch 2)    -> 42 dropped
        #   47 dups 25 (25 dropped; canonical 0 indexed -> 47 drops)
        import random

        rng = random.Random(23)
        vecs = {}
        for i in range(60):
            vecs[i] = [rng.uniform(-1.0, 1.0) for _ in range(8)]
        jig = lambda v: [x + rng.uniform(-0.002, 0.002) for x in v]
        vecs[1] = jig(vecs[0])
        vecs[25] = jig(vecs[0])
        vecs[42] = jig(vecs[41])
        vecs[47] = jig(vecs[25])
        return (
            [(i, vecs[i]) for i in range(20)],
            [(i, vecs[i]) for i in range(20, 40)],
            [(i, vecs[i]) for i in range(40, 60)],
        )

    def test_stream_climbs_rung_and_stays_green(self, spark, tmp_path):
        import os

        from timbala_spark.pipeline.incremental import (
            _read_meta,
            embedding_index_build,
            embedding_index_probe,
            embedding_params_for,
        )
        from timbala_spark.pipeline.streaming import (
            read_survivors,
            streaming_near_dup,
        )

        schema = "vec_id long, embedding array<double>"
        batches = self._rows()
        src = str(tmp_path / "src")
        os.makedirs(src)
        for k, rows in enumerate(batches):
            df = spark.createDataFrame(rows, schema)
            tmp = str(tmp_path / f"stage{k}")
            df.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
            dst = os.path.join(src, f"{k}.parquet")
            os.rename(os.path.join(tmp, part), dst)
            os.utime(dst, (1_000_000 + k, 1_000_000 + k))

        idx = str(tmp_path / "idx")
        surv = str(tmp_path / "surv")
        ckpt = str(tmp_path / "ckpt")
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        # ladder_target_collisions=8: the first batch (20 vecs) sizes
        # the index at 2 planes; after batch 1 (~38 survivors) the
        # rung function wants 3 — a mid-stream crossing
        run = lambda: streaming_near_dup(
            stream,
            idx,
            surv,
            ckpt,
            id_col="vec_id",
            text_col="embedding",
            threshold=0.99,
            kind="embedding",
            dim=8,
            n_planes="auto",
            ladder_target_collisions=8,
        )
        run().awaitTermination()
        expected = set(range(60)) - {1, 25, 42, 47}
        got = {
            r["vec_id"]
            for r in read_survivors(spark, surv, schema)
            .select("vec_id")
            .collect()
        }
        assert got == expected
        meta = _read_meta(idx)
        assert meta["n_planes"] == 3  # climbed from the initial 2
        assert meta["indexed_vecs"] == len(expected)
        assert meta["n_planes"] == embedding_params_for(len(expected), 8)
        # tables are the caller's recall knob — never laddered
        assert meta["n_tables"] == 8

        # incremental == rebuild ACROSS the crossing: probing a new
        # batch against the climbed index equals probing a fresh
        # control index built over the same corpus at the same shape
        nb = spark.createDataFrame(
            [(100, batches[0][0][1]), (101, [9.0] * 8)], schema
        )
        corpus = read_survivors(spark, surv, schema)
        live = embedding_index_probe(
            nb, idx, corpus=corpus, threshold=0.99, max_bucket_rows=None
        )
        ctl_dir = str(tmp_path / "ctl")
        embedding_index_build(
            corpus, ctl_dir, dim=8,
            n_planes=meta["n_planes"], n_tables=meta["n_tables"],
        )
        ctl = embedding_index_probe(
            nb, ctl_dir, corpus=corpus, threshold=0.99, max_bucket_rows=None
        )
        pairs = lambda df: {
            (r["id_a"], r["id_b"], round(r["cos"], 9)) for r in df.collect()
        }
        assert pairs(live) == pairs(ctl)
        assert (0, 100) in {(a, b) for a, b, _ in pairs(live)}

        # a replayed availableNow run adopts the climbed shape and
        # changes nothing
        run().awaitTermination()
        assert _read_meta(idx)["n_planes"] == meta["n_planes"]
        got2 = {
            r["vec_id"]
            for r in read_survivors(spark, surv, schema)
            .select("vec_id")
            .collect()
        }
        assert got2 == expected

    def test_auto_rejected_for_text_kinds(self, spark, tmp_path):
        from timbala_spark.pipeline.streaming import streaming_near_dup

        src = str(tmp_path / "src")
        spark.createDataFrame([], "doc_id long, text string").write.parquet(
            src
        )
        stream = spark.readStream.schema("doc_id long, text string").parquet(
            src
        )
        with pytest.raises(ValueError, match="auto"):
            streaming_near_dup(
                stream,
                str(tmp_path / "idx"),
                str(tmp_path / "surv"),
                str(tmp_path / "ckpt"),
                kind="ngram",
                n_planes="auto",
            )


class TestStreamingNearDupMinhash:
    """r11 (VERDICT r10 missing #3): the online near-dup stage over the
    banded-MinHash index — kind="minhash" probes per micro-batch with
    the same survivor rules as the n-gram and embedding stages."""

    def test_matches_sequential_protocol_and_expectation(
        self, spark, tmp_path
    ):
        import os

        from timbala_spark.pipeline.incremental import minhash_index_build
        from timbala_spark.pipeline.streaming import (
            near_dup_batch_stage,
            read_survivors,
            streaming_near_dup,
        )

        batches = TestStreamingNearDup()._rows()
        src = str(tmp_path / "src")
        os.makedirs(src)
        for k, rows in enumerate(batches):
            df = spark.createDataFrame(rows, "doc_id long, text string")
            tmp = str(tmp_path / f"stage{k}")
            df.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
            dst = os.path.join(src, f"{k}.parquet")
            os.rename(os.path.join(tmp, part), dst)
            os.utime(dst, (1_000_000 + k, 1_000_000 + k))

        idx = str(tmp_path / "idx")
        surv = str(tmp_path / "surv")
        ckpt = str(tmp_path / "ckpt")
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = streaming_near_dup(
            stream,
            idx,
            surv,
            ckpt,
            threshold=0.5,
            n=3,
            kind="minhash",
            compact_every=2,
        )
        q.awaitTermination()
        got = {
            r["doc_id"]
            for r in read_survivors(spark, surv, "doc_id long, text string")
            .select("doc_id")
            .collect()
        }
        # planted dups are EXACT copies, so banded signatures collide
        # with certainty — same survivor set as the n-gram stage
        assert got == set(range(30)) - {1, 15, 22, 27}

        # sequential batch protocol over the same batches == streaming
        idx2 = str(tmp_path / "idx2")
        first = spark.createDataFrame(batches[0], "doc_id long, text string")
        minhash_index_build(first.limit(0), idx2, n=3)
        acc = None
        for rows in batches:
            df = spark.createDataFrame(rows, "doc_id long, text string")
            s = near_dup_batch_stage(
                df,
                idx2,
                acc if acc is not None else df.limit(0),
                threshold=0.5,
                kind="minhash",
            )
            acc = s if acc is None else acc.unionByName(s)
            acc = acc.localCheckpoint(eager=True)
        seq = {r["doc_id"] for r in acc.collect()}
        assert seq == got

        # replay idempotence: a second availableNow run over the same
        # checkpoint sees no new files and changes nothing
        q2 = streaming_near_dup(
            stream, idx, surv, ckpt, threshold=0.5, n=3, kind="minhash"
        )
        q2.awaitTermination()
        got2 = {
            r["doc_id"]
            for r in read_survivors(spark, surv, "doc_id long, text string")
            .select("doc_id")
            .collect()
        }
        assert got2 == got

    def test_explicit_cap_rejected(self, spark, tmp_path):
        from timbala_spark.pipeline.streaming import streaming_near_dup

        src = str(tmp_path / "src")
        spark.createDataFrame([], "doc_id long, text string").write.parquet(
            src
        )
        stream = spark.readStream.schema("doc_id long, text string").parquet(
            src
        )
        with pytest.raises(ValueError, match="no candidate cap"):
            streaming_near_dup(
                stream,
                str(tmp_path / "idx"),
                str(tmp_path / "surv"),
                str(tmp_path / "ckpt"),
                kind="minhash",
                max_postings=256,
            )


class TestPerKindCapDefaults:
    """r11 (VERDICT r10 #2): the streaming stage's default cap resolves
    to the KIND's own batch backstop instead of reusing the n-gram 256
    for every modality."""

    def test_resolution_table(self):
        from timbala_spark.pipeline.dedup import (
            _DEFAULT_MAX_BUCKET_ROWS,
            _DEFAULT_MAX_POSTINGS,
        )
        from timbala_spark.pipeline.streaming import PER_KIND_CAP, _resolve_cap

        assert _resolve_cap(PER_KIND_CAP, "ngram") == _DEFAULT_MAX_POSTINGS
        assert (
            _resolve_cap(PER_KIND_CAP, "embedding") == _DEFAULT_MAX_BUCKET_ROWS
        )
        assert _resolve_cap(PER_KIND_CAP, "minhash") is None
        # explicit values pass through verbatim; None stays uncapped
        assert _resolve_cap(None, "embedding") is None
        assert _resolve_cap(64, "ngram") == 64
        with pytest.raises(ValueError):
            _resolve_cap(64, "minhash")

    def test_embedding_hot_cell_not_censored_at_defaults(
        self, spark, tmp_path
    ):
        """300 exact-duplicate vectors put ~300 rows in every
        (table, bucket) cell — over the old inherited 256 default
        (which silently censored the cell and let every duplicate
        survive) but under the batch operator's 2048 backstop.  At
        defaults the streaming stage must now censor exactly like the
        batch operator: one canonical survivor."""
        from timbala_spark.pipeline.incremental import embedding_index_build
        from timbala_spark.pipeline.streaming import near_dup_batch_stage

        schema = "vec_id long, embedding array<double>"
        base = [0.3, -0.7, 0.2, 0.9, -0.1, 0.5, -0.4, 0.6]
        batch = spark.createDataFrame(
            [(i, base) for i in range(300)], schema
        )
        idx = str(tmp_path / "idx")
        embedding_index_build(
            batch.limit(0), idx, id_col="vec_id", vec_col="embedding",
            dim=8, n_planes=4, n_tables=8,
        )
        surv = near_dup_batch_stage(
            batch,
            idx,
            batch.limit(0),
            id_col="vec_id",
            text_col="embedding",
            threshold=0.99,
            kind="embedding",
        )
        assert {r["vec_id"] for r in surv.collect()} == {0}


class TestStreamingNearDupEmbedding:
    """r10: the online near-dup stage over the VECTOR modality —
    kind="embedding" probes the hyperplane-bucket index per
    micro-batch with the same survivor rules as the text stage."""

    def _rows(self):
        # three batches of 8-d vectors; planted near-dups mirror the
        # text test's structure:
        #   1 dups 0 (within batch 0)       -> 1 dropped
        #   15 dups 0 (cross batch, later)  -> 15 dropped
        #   22 dups 21 (within batch 2)     -> 22 dropped
        #   27 dups 15 (15 dropped; its canonical 0 is indexed,
        #               so 27 matches 0 and drops too)
        import random

        rng = random.Random(11)
        vecs = {}
        for i in range(30):
            vecs[i] = [rng.uniform(-1.0, 1.0) for _ in range(8)]
        jig = lambda v: [x + rng.uniform(-0.002, 0.002) for x in v]
        vecs[1] = jig(vecs[0])
        vecs[15] = jig(vecs[0])
        vecs[22] = jig(vecs[21])
        vecs[27] = jig(vecs[15])
        b0 = [(i, vecs[i]) for i in range(10)]
        b1 = [(i, vecs[i]) for i in range(10, 20)]
        b2 = [(i, vecs[i]) for i in range(20, 30)]
        return b0, b1, b2

    def test_matches_sequential_protocol_and_expectation(
        self, spark, tmp_path
    ):
        import os

        from timbala_spark.pipeline.incremental import embedding_index_build
        from timbala_spark.pipeline.streaming import (
            near_dup_batch_stage,
            read_survivors,
            streaming_near_dup,
        )

        schema = "vec_id long, embedding array<double>"
        batches = self._rows()
        src = str(tmp_path / "src")
        os.makedirs(src)
        for k, rows in enumerate(batches):
            df = spark.createDataFrame(rows, schema)
            tmp = str(tmp_path / f"stage{k}")
            df.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
            dst = os.path.join(src, f"{k}.parquet")
            os.rename(os.path.join(tmp, part), dst)
            os.utime(dst, (1_000_000 + k, 1_000_000 + k))

        emb_kw = dict(dim=8, n_planes=4, n_tables=8, seed=42)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        surv = str(tmp_path / "surv")
        q = streaming_near_dup(
            stream,
            str(tmp_path / "idx"),
            surv,
            str(tmp_path / "ckpt"),
            id_col="vec_id",
            text_col="embedding",
            threshold=0.99,
            kind="embedding",
            compact_every=2,
            **emb_kw,
        )
        q.awaitTermination()
        got = {
            r["vec_id"]
            for r in read_survivors(spark, surv, schema)
            .select("vec_id")
            .collect()
        }
        assert got == set(range(30)) - {1, 15, 22, 27}

        # sequential batch protocol over the same batches == streaming
        idx2 = str(tmp_path / "idx2")
        first = spark.createDataFrame(batches[0], schema)
        embedding_index_build(
            first.limit(0), idx2, id_col="vec_id", vec_col="embedding",
            **emb_kw,
        )
        acc = None
        for rows in batches:
            df = spark.createDataFrame(rows, schema)
            s = near_dup_batch_stage(
                df,
                idx2,
                acc if acc is not None else df.limit(0),
                id_col="vec_id",
                text_col="embedding",
                threshold=0.99,
                kind="embedding",
            )
            acc = s if acc is None else acc.unionByName(s)
            acc = acc.localCheckpoint(eager=True)
        seq = {r["vec_id"] for r in acc.collect()}
        assert seq == got
