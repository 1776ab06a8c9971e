"""Incremental-compaction fuzz: P5 — interleaving invariance.

test_incremental_compact.py pins hand-built append/compact sequences;
this file randomizes them. Per seed: random batches (random day spans,
random series, deliberate within- and cross-batch ``(series_id, t)``
duplicates carrying IDENTICAL values, so the replica-collapse rule has
a unique answer) are interleaved with random maintenance passes, some
incremental (the settled listing exists), some forced-full (listing
deleted first). Whatever the interleaving, the store must serve
exactly what a from-scratch store fed ALL the batches then compacted
once serves — the incremental compactor's day-local-dedup ≡
global-rewrite claim, under sequences no hand-written test tried.
A rollup resolution rides every pass so the touched-day rebuild /
untouched-day link logic is exercised on each random shape.
"""

from __future__ import annotations

import os
import random
import shutil
import tempfile

import pytest

from timbala_spark.engine import Engine
from timbala_spark.model import prepare_samples
from timbala_spark.streaming.compact import compact_store
from timbala_spark.streaming.ingest import (
    read_rollup_tables,
    read_samples_table,
    write_samples_batch,
)
from timbala_spark.streaming.store import SETTLED_NAME, resolve_store

DAY = 86_400_000
W = 3_600_000  # 1h rollup: day-divisible, so it rides the day diff
D0 = (1_700_000_000_000 // DAY) * DAY


def _mk(spark, rows):
    return prepare_samples(
        spark.createDataFrame(
            rows, "labels map<string,string>, t long, v double"
        )
    )


def _gen_batches(seed: int):
    """Batches with duplicates whose values are a FUNCTION of
    (series, t) — cross-batch replicas are bit-identical, so the
    collapsed store has one well-defined answer."""
    r = random.Random(seed)
    batches = []
    for _ in range(r.randrange(3, 6)):
        day0 = r.randrange(0, 3)
        span = r.randrange(1, 3)
        rows = []
        for _ in range(r.randrange(30, 90)):
            s = r.randrange(4)
            t = D0 + day0 * DAY + r.randrange(0, span * DAY)
            t -= t % 60_000  # minute grid -> collisions are common
            v = float((t // 60_000) % 97) + s * 1000.0
            rows.append(({"__name__": "m", "i": str(s)}, int(t), v))
        # re-send a slice of an EARLIER batch (cross-batch replicas)
        if batches and r.random() < 0.7:
            prev = batches[r.randrange(len(batches))]
            rows.extend(prev[: r.randrange(1, min(20, len(prev)))])
        batches.append(rows)
    return batches


def _canon(df):
    return sorted(
        (tuple(sorted(r["labels"].items())), r["t"], r["v"])
        for r in df.collect()
    )


SEEDS = list(range(6))


class TestCompactInterleavingFuzz:
    @pytest.mark.parametrize("seed", SEEDS)
    def test_any_interleaving_equals_from_scratch(self, spark, seed):
        r = random.Random(seed * 613 + 7)
        batches = _gen_batches(seed)
        inc = tempfile.mkdtemp(prefix="timbala_cfuzz_inc_")
        ful = tempfile.mkdtemp(prefix="timbala_cfuzz_ful_")
        try:
            n_compacts = 0
            for rows in batches:
                write_samples_batch(_mk(spark, rows), inc)
                if r.random() < 0.6:
                    if n_compacts and r.random() < 0.3:
                        # force a FULL rewrite mid-sequence: drop the
                        # settled listing (legacy-store shape)
                        st = resolve_store(inc)
                        listing = os.path.join(
                            os.path.dirname(st.samples), SETTLED_NAME
                        )
                        if os.path.exists(listing):
                            os.remove(listing)
                    compact_store(spark, inc, rollup_ms=(W,))
                    n_compacts += 1
            # always finish with a pass so every seed exercises the
            # compactor (mid-sequence passes remain probabilistic)
            compact_store(spark, inc, rollup_ms=(W,))
            n_compacts += 1
            # reference store: all batches, ONE from-scratch compact
            for rows in batches:
                write_samples_batch(_mk(spark, rows), ful)
            compact_store(spark, ful, rollup_ms=(W,))
            got = _canon(read_samples_table(spark, inc))
            want = _canon(read_samples_table(spark, ful))
            assert got == want, (seed, len(got), len(want))
            assert got, "empty store would prove nothing"
            # rollups from both stores answer the same routed query
            eng_i = Engine(
                spark,
                read_samples_table(spark, inc),
                rollups=read_rollup_tables(spark, inc) or None,
            )
            eng_f = Engine(
                spark,
                read_samples_table(spark, ful),
                rollups=read_rollup_tables(spark, ful) or None,
            )
            t0 = D0 + 2 * DAY
            q = "sum by (i) (sum_over_time(m[2h]))"
            a = _canon(eng_i.query_range(q, t0 / 1000, (t0 + 6 * W) / 1000, W / 1000))
            b = _canon(eng_f.query_range(q, t0 / 1000, (t0 + 6 * W) / 1000, W / 1000))
            assert a == b, seed
        finally:
            shutil.rmtree(inc, ignore_errors=True)
            shutil.rmtree(ful, ignore_errors=True)
