"""Store-integrated rollups (r7): compact_store materializes exact
multi-aggregate rollups into the committed generation; the read path
serves them only while the generation is clean, so a rollup can never
describe samples the engine doesn't serve (and vice versa)."""

import math
import tempfile

import pytest

from timbala_spark.engine import Engine
from timbala_spark.model import prepare_samples
from timbala_spark.rollup import build_rollup
from timbala_spark.streaming.compact import apply_retention, compact_store
from timbala_spark.streaming.ingest import (
    read_rollup_tables,
    read_samples_table,
    write_samples_batch,
)

W = 300_000
T0 = 1_700_000_100_000 - (1_700_000_100_000 % W)


def _mk(spark, rows):
    return prepare_samples(
        spark.createDataFrame(
            rows, "labels map<string,string>, t long, v double"
        )
    )


def _counter_rows(n=200, step_ms=75_000):
    rows, v, t = [], 0.0, T0
    for i in range(n):
        v = 0.0 if i % 41 == 0 and i else v + (i % 5) + 0.5
        rows.append(({"__name__": "c", "i": str(i % 3)}, int(t), float(v)))
        t += step_ms
    return rows


def _canon(res):
    return {
        (tuple(sorted(r["labels"].items())), r["t"]): r["v"]
        for r in res.collect()
    }


def _close(a, b):
    assert set(a) == set(b)
    for k in a:
        x, y = a[k], b[k]
        if math.isnan(x) or math.isnan(y):
            assert math.isnan(x) and math.isnan(y)
        else:
            assert x == y or abs(x - y) <= 1e-9 * max(1.0, abs(x))


@pytest.fixture()
def store(spark, tmp_path):
    tmp = str(tmp_path / "store")
    write_samples_batch(_mk(spark, _counter_rows()), tmp)
    return tmp


class TestStoreRollups:
    def test_compact_materializes_and_queries_route(self, spark, store):
        compact_store(spark, store, rollup_ms=(W,))
        rollups = read_rollup_tables(spark, store)
        assert list(rollups) == [W]
        samples = read_samples_table(spark, store)
        raw = Engine(spark, samples)
        routed = Engine(spark, samples, rollups=rollups)
        start, end = T0 + 3_600_000, T0 + 3 * 3_600_000
        for q in (
            "avg_over_time(c[30m])",
            "rate(c[30m])",
            "resets(c[1h])",
            "sum by (i) (increase(c[1h]))",
        ):
            a = _canon(raw.query_range(q, start / 1000, end / 1000, 600))
            b = _canon(routed.query_range(q, start / 1000, end / 1000, 600))
            assert a, q
            _close(a, b)

    def test_narrow_plus_dict_equals_canonical_build(self, spark, store):
        """The stored narrow rollup joined with the series dict must be
        ROW-IDENTICAL to build_rollup over the canonical read — the
        split layout changes storage, not content."""
        compact_store(spark, store, rollup_ms=(W,))
        stored = read_rollup_tables(spark, store)[W]
        direct = build_rollup(read_samples_table(spark, store), W)
        # labels (map, not hashable) and day (partition read-back
        # infers INT where the builder emits the string form — same
        # asymmetry the samples store has; `t` determines it) excluded
        cols = sorted(
            set(stored.columns) & set(direct.columns) - {"labels", "day"}
        )
        a = {tuple(r) for r in stored.select(*cols).collect()}
        b = {tuple(r) for r in direct.select(*cols).collect()}
        assert a == b and a

    def test_append_after_compact_disables_rollups(self, spark, store):
        compact_store(spark, store, rollup_ms=(W,))
        assert read_rollup_tables(spark, store)
        late = [({"__name__": "c", "i": "0"}, T0 + 9 * 3_600_000, 1.0)]
        write_samples_batch(_mk(spark, late), store)
        # dirty generation: rollups no longer describe the content
        assert read_rollup_tables(spark, store) == {}
        # the next pass rebuilds them, including the late row
        compact_store(spark, store, rollup_ms=(W,))
        ru = read_rollup_tables(spark, store)
        assert ru and ru[W].filter(f"t = {T0 + 9 * 3_600_000}").count() == 1

    def test_straggler_dirty_generation_has_no_servable_rollups(
        self, spark, store
    ):
        """A batch landing mid-compaction is carried over and marks the
        new generation dirty — its rollups (built before the straggler
        existed) must not be served."""
        late = _mk(
            spark, [({"__name__": "c", "i": "1"}, T0 + 10 * 3_600_000, 2.0)]
        )

        def mid_rewrite(src):
            write_samples_batch(late, store)

        compact_store(spark, store, rollup_ms=(W,), _after_rewrite=mid_rewrite)
        assert read_rollup_tables(spark, store) == {}

    def test_retention_carries_rollups_and_drops_expired_days(
        self, spark, store
    ):
        """W divides a day, so retention carries the surviving rollup
        day partitions instead of discarding the whole table (r7 tier
        machinery, default policy: rollup cutoff == raw cutoff) — the
        store keeps serving rollups immediately after the pass, with
        no pre-cutoff rows left. tests/test_retention_tiers.py covers
        the rollup_min_t_ms < min_t_ms archive case."""
        compact_store(spark, store, rollup_ms=(W,))
        assert read_rollup_tables(spark, store)
        # cutoff far in the future drops nothing -> no new generation,
        # rollups survive in full
        day_ms = 86_400_000
        assert apply_retention(store, T0 - day_ms) == []
        assert read_rollup_tables(spark, store)
        rows2 = [
            ({"__name__": "c", "i": "0"}, T0 + 3 * day_ms + i * 60_000, float(i))
            for i in range(5)
        ]
        write_samples_batch(_mk(spark, rows2), store)
        compact_store(spark, store, rollup_ms=(W,))
        dropped = apply_retention(store, T0 + 2 * day_ms)
        assert dropped
        ru = read_rollup_tables(spark, store)
        assert ru and ru[W].filter(f"t < {T0 + 2 * day_ms}").count() == 0
        assert ru[W].count() > 0
        compact_store(spark, store, rollup_ms=(W,))
        ru = read_rollup_tables(spark, store)
        assert ru and ru[W].filter(f"t < {T0 + 2 * day_ms}").count() == 0


class TestFrontendComposition:
    def test_results_cache_over_routed_engine_stays_exact(self, spark, store):
        """The query-frontend results cache composes over a
        rollup-routed engine: repeated and extended aligned range
        queries through PromAPI return exactly what a cache-less raw
        engine returns (the cache stores final envelope rows, routing
        changes only how they were computed)."""
        from timbala_spark.api import PromAPI

        compact_store(spark, store, rollup_ms=(W,))
        samples = read_samples_table(spark, store)
        rollups = read_rollup_tables(spark, store)
        routed_api = PromAPI(Engine(spark, samples, rollups=rollups))
        raw_api = PromAPI(Engine(spark, samples))
        # delta/resets are BIT-identical routed (rate's corr term may
        # re-associate float addition, which could flip a last digit in
        # the envelope's formatted strings)
        start = (T0 + 3_600_000) / 1000
        for q in ("delta(c[30m])", "resets(c[1h])"):
            for end in (T0 + 2 * 3_600_000, T0 + 2 * 3_600_000 + 1_200_000):
                a = raw_api.query_range(q, start, end / 1000, 600)
                b = routed_api.query_range(q, start, end / 1000, 600)  # fill
                c = routed_api.query_range(q, start, end / 1000, 600)  # hit
                assert a == b == c
                assert a["status"] == "success"
                assert a["data"]["result"], "empty result would prove nothing"


class TestServerRollups:
    def test_server_engine_picks_up_rollups(self, spark, store):
        from timbala_spark.server import TimbalaServer

        srv = TimbalaServer(spark, store, rollup_resolutions_ms=(W,))
        srv.start()  # stop() blocks on the HTTP loop unless started
        try:
            assert srv._engine_api().engine.rollups is None  # dirty store
            srv.compact()
            eng = srv._engine_api().engine
            assert eng.rollups and W in eng.rollups
            start, end = T0 + 3_600_000, T0 + 3 * 3_600_000
            raw = Engine(spark, read_samples_table(spark, store))
            a = _canon(raw.query_range("rate(c[30m])", start / 1000, end / 1000, 600))
            b = _canon(eng.query_range("rate(c[30m])", start / 1000, end / 1000, 600))
            assert a
            _close(a, b)
        finally:
            srv.stop()

    def test_maintenance_loop_materializes_missing_rollups(self, spark, store):
        """Enabling rollups on an EXISTING clean store must not wait
        for the next write: the maintenance loop compacts when the
        generation lacks a configured resolution."""
        import time

        from timbala_spark.server import TimbalaServer
        from timbala_spark.streaming.ingest import store_missing_rollups

        compact_store(spark, store)  # clean generation, NO rollups
        assert store_missing_rollups(store, (W,))
        assert read_rollup_tables(spark, store) == {}
        srv = TimbalaServer(
            spark,
            store,
            rollup_resolutions_ms=(W,),
            maintenance_interval_s=0.2,
        )
        srv.start()
        try:
            deadline = time.time() + 60
            while time.time() < deadline and store_missing_rollups(store, (W,)):
                time.sleep(0.5)
            assert not store_missing_rollups(store, (W,))
            assert read_rollup_tables(spark, store)
        finally:
            srv.stop()
