"""Store-roundtrip metamorphic fuzz: P3 — physical source invariance.

The stored read path is the scale-critical surface (narrow samples ⊕
series-dictionary join, day-partition pruning, replica collapse while
dirty), and until now only fixed contract shapes compared it against
the in-memory frame (`promql_selector_stored`, `promql_rate_stored`).
This file runs the SAME random expression generator as
test_metamorphic.py over three engines fed identical logical data:

* memory — `prepare_samples` straight from rows;
* stored — written via `write_samples_batch`, compacted (clean
  generation, exchange-free read);
* dirty — the same store after a full duplicate RE-SEND of every
  batch (cross-batch replicas; `read_samples_table(dedup="auto")`
  must collapse them, `streaming/ingest.py`).

Every generated expression must answer identically from all three
(labels and timestamps exact; values to 1e-9 relative — aggregation
sums re-associate across physical plans, see test_metamorphic.py).
Errors must reproduce identically too: the three engines share one
compiler, so an expression that fails must fail with the same message
regardless of the physical source.
"""

from __future__ import annotations

import random
import shutil
import tempfile

import pytest

from test_metamorphic import (
    assert_rows_match,
    canon,
    fixture_rows,
    gen_expr,
)
from timbala_spark import Engine, prepare_samples
from timbala_spark.streaming import read_samples_table
from timbala_spark.streaming.compact import compact_store
from timbala_spark.streaming.ingest import write_samples_batch


@pytest.fixture(scope="module")
def engines(spark):
    rows = fixture_rows()
    df = prepare_samples(
        spark.createDataFrame(rows, "labels map<string,string>, t long, v double")
    )
    tmp = tempfile.mkdtemp(prefix="timbala_meta_store_")
    try:
        # two batches (split mid-corpus), then compact to a clean gen
        half = len(rows) // 2
        for part in (rows[:half], rows[half:]):
            write_samples_batch(
                prepare_samples(
                    spark.createDataFrame(
                        part, "labels map<string,string>, t long, v double"
                    )
                ),
                tmp,
            )
        compact_store(spark, tmp)
        stored = Engine(spark, read_samples_table(spark, tmp))
        # full duplicate re-send -> dirty store with cross-batch
        # replicas; the auto read path must collapse them
        write_samples_batch(
            prepare_samples(
                spark.createDataFrame(
                    rows, "labels map<string,string>, t long, v double"
                )
            ),
            tmp,
        )
        dirty = Engine(spark, read_samples_table(spark, tmp))
        yield Engine(spark, df), stored, dirty
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


SEEDS = list(range(16))


class TestStoreRoundtrip:
    @pytest.mark.parametrize("seed", SEEDS)
    def test_same_answer_from_all_physical_sources(self, engines, seed):
        memory, stored, dirty = engines
        expr, _clock = gen_expr(seed)
        rng = random.Random(seed * 31337 + 5)
        t = rng.randrange(900, 2100)
        step = rng.choice([30, 60, 75])
        a, b = t - 2 * step, t + 2 * step

        def run(eng):
            try:
                return canon(eng.query(expr, t).collect()), None
            except Exception as e:
                return None, str(e)

        m, em = run(memory)
        s, es = run(stored)
        d, ed = run(dirty)
        assert (em is None) == (es is None) == (ed is None), (expr, em, es, ed)
        if em is not None:
            assert em == es == ed, (expr, em, es, ed)
            return
        assert_rows_match(m, s, (expr, t, "stored"))
        assert_rows_match(m, d, (expr, t, "dirty"))
        # one range query per seed over the stored path too
        try:
            gm = canon(memory.query_range(expr, a, b, step).collect())
        except Exception:
            return
        gs = canon(stored.query_range(expr, a, b, step).collect())
        assert_rows_match(gm, gs, (expr, a, b, step, "range/stored"))
