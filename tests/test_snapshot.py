"""Store snapshots — the ``DB.Snapshot`` analog
(``vendor/github.com/prometheus/tsdb/db.go:607-630`` hardlinks every
block into the target under the compaction mutex; here
``streaming.store.snapshot_store`` hardlinks the resolved generation
under the maintenance lock)."""

import os
import shutil
import tempfile

import pytest

from timbala_spark import prepare_samples
from timbala_spark.streaming import read_samples_table
from timbala_spark.streaming.compact import compact_store
from timbala_spark.streaming.ingest import read_rollup_tables, write_samples_batch
from timbala_spark.streaming.store import (
    MaintenanceLockHeldError,
    maintenance_lock,
    snapshot_store,
)

T0 = 1_700_000_000_000
W = 300_000


def _mk(spark, rows):
    return prepare_samples(
        spark.createDataFrame(rows, "labels map<string,string>, t long, v double")
    )


def _rows(n=40, tag="a"):
    return [
        ({"__name__": "m", "i": str(i % 4), "t": tag}, T0 + i * 60_000, float(i))
        for i in range(n)
    ]


def _canon(df):
    return sorted(
        (tuple(sorted(r["labels"].items())), r["t"], r["v"]) for r in df.collect()
    )


class TestSnapshot:
    def test_snapshot_equals_source_and_is_independent(self, spark):
        src = tempfile.mkdtemp(prefix="timbala_snap_src_")
        dst = os.path.join(tempfile.mkdtemp(prefix="timbala_snap_dst_"), "s1")
        try:
            write_samples_batch(_mk(spark, _rows()), src)
            compact_store(spark, src)
            # an appended (dirty) tail must be part of the snapshot
            write_samples_batch(_mk(spark, _rows(10, tag="b")), src)
            before = _canon(read_samples_table(spark, src))
            n = snapshot_store(src, dst)
            assert n > 0
            got = _canon(read_samples_table(spark, dst))
            assert got == before
            # dirty semantics travel: the marker is carried (inside
            # the snapshot's committed generation, same as the source)
            from timbala_spark.streaming.store import resolve_store

            assert os.path.exists(resolve_store(dst).dirty_marker)
            # independence: deleting the SOURCE store leaves the
            # snapshot fully readable (hardlinked inodes survive)
            shutil.rmtree(src)
            assert _canon(read_samples_table(spark, dst)) == before
            # and the snapshot is itself compactable (legacy layout)
            compact_store(spark, dst)
            assert _canon(read_samples_table(spark, dst)) == before
        finally:
            shutil.rmtree(src, ignore_errors=True)
            shutil.rmtree(os.path.dirname(dst), ignore_errors=True)

    def test_snapshot_carries_rollups_and_horizon(self, spark):
        src = tempfile.mkdtemp(prefix="timbala_snap_ru_")
        dst = os.path.join(tempfile.mkdtemp(prefix="timbala_snap_ru_d_"), "s")
        try:
            write_samples_batch(_mk(spark, _rows(60)), src)
            compact_store(spark, src, rollup_ms=(W,))
            assert read_rollup_tables(spark, src)  # clean: servable
            snapshot_store(src, dst)
            ru = read_rollup_tables(spark, dst)
            assert set(ru) == {W}
            assert ru[W].count() > 0
        finally:
            shutil.rmtree(src, ignore_errors=True)
            shutil.rmtree(os.path.dirname(dst), ignore_errors=True)

    def test_snapshot_refuses_bad_targets_and_held_lock(self, spark):
        src = tempfile.mkdtemp(prefix="timbala_snap_bad_")
        try:
            write_samples_batch(_mk(spark, _rows(8)), src)
            with pytest.raises(ValueError, match="own directory"):
                snapshot_store(src, os.path.join(src, "inner"))
            full = tempfile.mkdtemp(prefix="timbala_snap_full_")
            try:
                with open(os.path.join(full, "data"), "w") as f:
                    f.write("x")
                with pytest.raises(ValueError, match="not empty"):
                    snapshot_store(src, full)
            finally:
                shutil.rmtree(full, ignore_errors=True)
            # the compactor's lock excludes the snapshot (db.cmtx
            # discipline): a held maintenance lock times out cleanly
            dst = os.path.join(tempfile.mkdtemp(prefix="timbala_snap_l_"), "s")
            try:
                with maintenance_lock(src):
                    with pytest.raises(MaintenanceLockHeldError):
                        snapshot_store(src, dst, lock_timeout_s=0.05)
            finally:
                shutil.rmtree(os.path.dirname(dst), ignore_errors=True)
        finally:
            shutil.rmtree(src, ignore_errors=True)

    def test_server_snapshot_method(self, spark):
        from timbala_spark.server import TimbalaServer

        store = tempfile.mkdtemp(prefix="timbala_snap_srv_")
        dst = os.path.join(tempfile.mkdtemp(prefix="timbala_snap_srv_d_"), "s")
        try:
            write_samples_batch(_mk(spark, _rows(12)), store)
            srv = TimbalaServer(spark, store)
            n = srv.snapshot(dst)
            assert n > 0
            assert read_samples_table(spark, dst).count() == 12
        finally:
            shutil.rmtree(store, ignore_errors=True)
            shutil.rmtree(os.path.dirname(dst), ignore_errors=True)
