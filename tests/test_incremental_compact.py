"""Incremental compaction (r7): a maintenance pass rewrites ONLY the
day partitions appends touched and hardlinks every settled file of
every untouched day — O(appends' days), not O(store).

Why it is exact: a ``(series_id, t)`` duplicate pair always shares its
day (equal t ⇒ equal day), so day-local dedup over the touched days
plus verbatim carry of the untouched (already deduped, already sorted)
days equals the full global rewrite. The reference's compactor plans
the same way (``tsdb/compact.go:128-167`` merges head/small blocks and
never rewrites settled old blocks).

Pinned here:
* physical: untouched days' files in the new generation are HARDLINKS
  (same inode) of the old generation's files; touched days are new;
* logical: the incrementally-compacted store serves exactly what a
  full-rewrite store built from the same batches serves;
* rollups ride the same plan: untouched rollup days link, touched
  days rebuild, and the result equals a from-scratch build;
* stragglers stay outside the settled listing, so the NEXT pass
  rewrites their days;
* retention carries the listing (minus dropped days), so compaction
  stays incremental across retention generations.
"""

import os

from timbala_spark.engine import Engine
from timbala_spark.model import prepare_samples
from timbala_spark.streaming.compact import apply_retention, compact_store
from timbala_spark.streaming.ingest import (
    read_rollup_tables,
    read_samples_table,
    write_samples_batch,
)
from timbala_spark.streaming.store import (
    list_data_files,
    read_settled,
    resolve_store,
)

DAY = 86_400_000
W = 3_600_000
D0 = (1_700_000_000_000 // DAY) * DAY


def _mk(spark, rows):
    return prepare_samples(
        spark.createDataFrame(
            rows, "labels map<string,string>, t long, v double"
        )
    )


def _base_rows(days=4, step_ms=900_000):
    rows, v, t, i = [], 0.0, D0, 0
    while t < D0 + days * DAY:
        v = 0.0 if i and i % 53 == 0 else v + (i % 5) + 0.25
        rows.append(({"__name__": "m", "i": str(i % 3)}, int(t), float(v)))
        i += 1
        t += step_ms
    return rows


def _late_rows(day=2, n=5):
    # rows inside one existing day, incl. a replica re-send duplicate
    rows = [
        ({"__name__": "m", "i": "1"}, D0 + day * DAY + k * 600_000 + 111_000,
         float(100 + k))
        for k in range(n)
    ]
    rows.append(rows[0])  # exact replica dup, must collapse
    return rows


def _file_id(path):
    """Carry-identity of a data file: inode on the POSIX backend
    (hardlink carry), size on a copy backend (object store — the rel
    NAME surviving into the new generation already proves the carry,
    since a Spark rewrite always emits fresh part-file names; size
    pins the bytes)."""
    from timbala_spark.streaming.backend import get_backend

    st = os.stat(path)
    return st.st_ino if get_backend().links_are_free else st.st_size


def _inode_map(samples_dir):
    return {
        rel: _file_id(os.path.join(samples_dir, rel))
        for rel in list_data_files(samples_dir)
    }


def _canon(df):
    return sorted(
        (r["series_id"], r["t"], r["v"])
        for r in df.select("series_id", "t", "v").collect()
    )


class TestIncrementalCompact:
    def test_untouched_days_hardlink_touched_days_rewrite(
        self, spark, tmp_path
    ):
        store = str(tmp_path / "s")
        write_samples_batch(_mk(spark, _base_rows()), store)
        compact_store(spark, store)  # full rewrite, starts the listing
        src = resolve_store(store)
        assert read_settled(os.path.dirname(src.samples)) == list_data_files(
            src.samples
        )
        old_inodes = _inode_map(src.samples)
        write_samples_batch(_mk(spark, _late_rows(day=2)), store)
        compact_store(spark, store)
        new = resolve_store(store)
        assert new.gen == src.gen + 1
        new_inodes = _inode_map(new.samples)
        import datetime

        dstr = datetime.datetime.fromtimestamp(
            (D0 + 2 * DAY) / 1000, tz=datetime.timezone.utc
        ).strftime("%Y%m%d")
        for rel, ino in new_inodes.items():
            day = rel.split(os.sep, 1)[0]
            if day == f"day={dstr}":
                assert rel not in old_inodes, rel  # rewritten fresh
            else:
                assert old_inodes.get(rel) == ino, rel  # hardlinked
        # the new generation is clean and fully settled
        assert not os.path.exists(new.dirty_marker)
        assert read_settled(os.path.dirname(new.samples)) == set(new_inodes)

    def test_incremental_equals_full_rewrite(self, spark, tmp_path):
        inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
        for p in (inc, full):
            write_samples_batch(_mk(spark, _base_rows()), p)
        compact_store(spark, inc)  # inc: compact between batches
        for p in (inc, full):
            write_samples_batch(_mk(spark, _late_rows(day=1)), p)
            write_samples_batch(_mk(spark, _late_rows(day=3, n=2)), p)
        compact_store(spark, inc)  # incremental (days 1 and 3 touched)
        compact_store(spark, full)  # full (first compact of this store)
        a = _canon(spark.read.parquet(resolve_store(inc).samples))
        b = _canon(spark.read.parquet(resolve_store(full).samples))
        assert a == b and a  # replica dup collapsed identically
        got = Engine(spark, read_samples_table(spark, inc)).query_range(
            "sum(increase(m[2h]))", (D0 + DAY) / 1000, (D0 + 3 * DAY) / 1000,
            7200,
        )
        want = Engine(spark, read_samples_table(spark, full)).query_range(
            "sum(increase(m[2h]))", (D0 + DAY) / 1000, (D0 + 3 * DAY) / 1000,
            7200,
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )

    def test_rollups_link_untouched_rebuild_touched(self, spark, tmp_path):
        store = str(tmp_path / "s")
        write_samples_batch(_mk(spark, _base_rows()), store)
        compact_store(spark, store, rollup_ms=(W,))
        src = resolve_store(store)
        rdir = os.path.join(os.path.dirname(src.samples), f"rollup-{W}")
        old = {
            rel: _file_id(os.path.join(rdir, rel))
            for rel in list_data_files(rdir)
        }
        write_samples_batch(_mk(spark, _late_rows(day=0)), store)
        compact_store(spark, store, rollup_ms=(W,))
        new = resolve_store(store)
        rdir2 = os.path.join(os.path.dirname(new.samples), f"rollup-{W}")
        import datetime

        d0str = datetime.datetime.fromtimestamp(
            D0 / 1000, tz=datetime.timezone.utc
        ).strftime("%Y%m%d")
        for rel in list_data_files(rdir2):
            ino = _file_id(os.path.join(rdir2, rel))
            if rel.split(os.sep, 1)[0] == f"day={d0str}":
                assert rel not in old, rel
            else:
                assert old.get(rel) == ino, rel
        # and the incrementally-maintained rollup equals a fresh build
        ru = read_rollup_tables(spark, store)[W]
        from timbala_spark.rollup import PAYLOAD_COLUMNS, build_rollup_narrow

        fresh = build_rollup_narrow(
            spark.read.parquet(new.samples).select("series_id", "t", "v"), W
        )

        def canon(df):
            return sorted(
                tuple(r[c] for c in ("series_id", "t", *PAYLOAD_COLUMNS))
                for r in df.collect()
            )

        assert canon(ru.select("series_id", "t", *PAYLOAD_COLUMNS)) == canon(
            fresh
        )

    def test_straggler_days_rewrite_on_next_pass(self, spark, tmp_path):
        store = str(tmp_path / "s")
        write_samples_batch(_mk(spark, _base_rows()), store)
        compact_store(spark, store)

        def mid(src):  # straggler batch lands during the pass
            write_samples_batch(_mk(spark, _late_rows(day=2)), store)

        compact_store(spark, store, _after_rewrite=mid)
        st = resolve_store(store)
        assert os.path.exists(st.dirty_marker)  # straggler kept it dirty
        settled = read_settled(os.path.dirname(st.samples))
        extras = list_data_files(st.samples) - settled
        assert extras  # the straggler is outside the listing
        compact_store(spark, store)  # next pass settles it
        st2 = resolve_store(store)
        assert not os.path.exists(st2.dirty_marker)
        assert read_settled(os.path.dirname(st2.samples)) == list_data_files(
            st2.samples
        )
        # the straggler's duplicate rows collapsed exactly once
        df = spark.read.parquet(st2.samples)
        assert (
            df.groupBy("series_id", "t").count().filter("count > 1").count()
            == 0
        )

    def test_retention_carries_listing(self, spark, tmp_path):
        store = str(tmp_path / "s")
        write_samples_batch(_mk(spark, _base_rows()), store)
        compact_store(spark, store)
        apply_retention(store, D0 + DAY)
        st = resolve_store(store)
        settled = read_settled(os.path.dirname(st.samples))
        assert settled == list_data_files(st.samples)
        # and the pass after retention is still incremental
        old_inodes = _inode_map(st.samples)
        write_samples_batch(_mk(spark, _late_rows(day=3)), store)
        compact_store(spark, store)
        new = resolve_store(store)
        linked = [
            rel
            for rel, ino in _inode_map(new.samples).items()
            if old_inodes.get(rel) == ino
        ]
        assert linked  # untouched days carried by hardlink
