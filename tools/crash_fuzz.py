"""Crash-point fuzz for the object-store maintenance protocol (r9,
VERDICT r8 "next round" #5).

The r8 suites prove the happy path and the lease steal; what they do
not prove is a maintenance writer killed at an ARBITRARY point mid-
pass — after the conditional PUT, before the settled marks, mid
key-copy carry, mid GC — with a second writer then acquiring the
EXPIRED lease.  This harness injects a crash at the N-th backend
operation (every protocol step routes through the
:class:`~timbala_spark.streaming.backend.StorageBackend` seam, so N
enumerates exactly the protocol's crash points; Spark's own parquet
task commits are covered by the pre-existing "crashed uncommitted
attempt: discard" rule), leaves the lease UNRELEASED exactly like a
dead process would, and asserts the invariant that matters:

    after lease expiry, a fresh writer's maintenance pass always
    converges — it acquires the lease, discards any uncommitted
    build, commits a generation, and a read of the store returns
    exactly the rows of every batch that landed (deduped), no more,
    no fewer.

Seed layout: seed → (kill-point N, before/after-op, crash-in
compact|retention, whether a batch lands between crash and recovery).
Run directly (``python tools/crash_fuzz.py [lo hi]``) or as the
``objcrash`` family of ``tools/fuzz_all.py``.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class InjectedCrash(BaseException):
    """Raised by the crashing backend; deliberately NOT Exception so
    no library code can accidentally swallow it (a killed process is
    not catchable either)."""


def _make_crashing_backend(kill_at: int, after_op: bool):
    """A FakeObjectStoreBackend subclass instance that raises
    :class:`InjectedCrash` at the ``kill_at``-th mutating operation
    (before or after performing it), then fails EVERY later call —
    including the reads its own lease-release ``finally`` needs, so
    the lease stays held exactly as a dead process would leave it.

    Built as a subclass (not a wrapper): the lease release inside
    ``FakeObjectStoreBackend.lock`` calls ``self.read_small`` /
    ``self.put_small_cas``, which a wrapper would not intercept."""
    from timbala_spark.streaming.backend import FakeObjectStoreBackend

    class CrashingBackend(FakeObjectStoreBackend):
        def __init__(self):
            super().__init__()
            self._ops = 0
            self._crashed = False

        def _pre(self, what):
            if self._crashed:
                raise InjectedCrash(f"dead writer called {what}")
            self._ops += 1
            if self._ops == kill_at and not after_op:
                self._crashed = True
                raise InjectedCrash(f"before {what} #{self._ops}")

        def _post(self, what):
            if self._ops == kill_at and after_op:
                self._crashed = True
                raise InjectedCrash(f"after {what} #{self._ops}")

        def put_small(self, path, data):
            self._pre("put_small")
            super().put_small(path, data)
            self._post("put_small")

        def put_small_cas(self, path, data, expect):
            self._pre("put_small_cas")
            super().put_small_cas(path, data, expect)
            self._post("put_small_cas")

        def share_file(self, src, dst):
            self._pre("share_file")
            super().share_file(src, dst)
            self._post("share_file")

        def delete(self, path):
            self._pre("delete")
            super().delete(path)
            self._post("delete")

        def delete_tree(self, path):
            self._pre("delete_tree")
            super().delete_tree(path)
            self._post("delete_tree")

        def read_small(self, path):
            if self._crashed:
                raise InjectedCrash("dead writer called read_small")
            return super().read_small(path)

    return CrashingBackend()


def _mk_batch(spark, n, t0, v_of=lambda sid: float(sid)):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.concat(F.lit("m_"), F.pmod("id", F.lit(4))).alias("name"),
        F.map_from_arrays(
            F.array(F.lit("__name__"), F.lit("i")),
            F.array(
                F.concat(F.lit("m_"), F.pmod("id", F.lit(4))),
                F.col("id").cast("string"),
            ),
        ).alias("labels"),
        F.col("id").alias("series_id"),
        (F.lit(t0) + F.pmod("id", F.lit(3)) * 60_000).alias("t"),
        (F.col("id") * 1.0).alias("v"),
    )


def run_seed(spark, seed: int) -> str | None:
    """One crash scenario; returns an error string or None."""
    import random

    from timbala_spark.streaming import backend as backend_mod
    from timbala_spark.streaming.compact import apply_retention, compact_store
    from timbala_spark.streaming.ingest import (
        read_samples_table,
        write_samples_batch,
    )
    from timbala_spark.streaming.store import resolve_store

    rng = random.Random(seed)
    root = tempfile.mkdtemp(prefix="crashfuzz_")
    store = os.path.join(root, "store")
    try:
        # landed batches BEFORE the doomed pass; duplicate (series_id,
        # t) across batches share v, so the expected post-dedup set is
        # deterministic
        write_samples_batch(_mk_batch(spark, 200, 1_700_000_000_000), store)
        write_samples_batch(_mk_batch(spark, 200, 1_700_090_000_000), store)
        expected = {
            (r["series_id"], r["t"], r["v"])
            for r in read_samples_table(spark, store, dedup=True)
            .select("series_id", "t", "v")
            .collect()
        }

        # observed op counts: ~7 (plain compact) to ~22 (bucketed /
        # retention passes) — the range keeps most seeds INSIDE the
        # pass (instrumented: 18/24 crash mid-pass) while the tail
        # still exercises crash-free convergence
        crashing = _make_crashing_backend(
            kill_at=rng.randrange(1, 20), after_op=rng.random() < 0.5
        )
        crashing.lease_s = 0.5
        backend_mod.set_backend(crashing)
        in_retention = rng.random() < 0.3
        buckets = rng.choice([None, 4])
        # r9 late: rollup materialization adds its own backend ops
        # (bucketed build shares, archive links) — cover those kill
        # points too
        rollups = rng.choice([(), (3_600_000,)])
        crashed = False
        try:
            if in_retention:
                compact_store(
                    spark, store, bucket_by_series=buckets, rollup_ms=rollups
                )
                apply_retention(store, 1_700_080_000_000)
            else:
                compact_store(
                    spark, store, bucket_by_series=buckets, rollup_ms=rollups
                )
        except InjectedCrash:
            crashed = True
        if in_retention:
            # the retention variant may drop day 0 BEFORE the crash
            # point (its deletes are backend ops too); recompute the
            # survivors from what a pinned reader of the COMMITTED
            # state sees
            backend_mod.set_backend(None)
            expected = {
                (r["series_id"], r["t"], r["v"])
                for r in read_samples_table(spark, store, dedup=True)
                .select("series_id", "t", "v")
                .collect()
            }

        # a batch may land while the crashed writer's lease is still
        # un-expired (writers don't take the maintenance lease)
        landed_late = rng.random() < 0.5
        backend_mod.set_backend(backend_mod.FakeObjectStoreBackend())
        if landed_late:
            write_samples_batch(
                _mk_batch(spark, 50, 1_700_180_000_000), store
            )
            expected |= {
                (sid, 1_700_180_000_000 + (sid % 3) * 60_000, float(sid))
                for sid in range(50)
            }

        time.sleep(0.6)  # lease expiry
        recovery = backend_mod.FakeObjectStoreBackend()
        recovery.lease_s = 30.0
        backend_mod.set_backend(recovery)
        # convergence: the fresh writer must steal the expired lease
        # and commit, regardless of where the first died
        compact_store(spark, store, lock_timeout_s=10.0)
        st = resolve_store(store)
        if os.path.exists(st.dirty_marker):
            return f"seed {seed}: store still dirty after recovery pass"
        got = {
            (r["series_id"], r["t"], r["v"])
            for r in read_samples_table(spark, store)
            .select("series_id", "t", "v")
            .collect()
        }
        if got != expected:
            return (
                f"seed {seed}: content diverged after crash "
                f"(crashed={crashed}, retention={in_retention}, "
                f"late={landed_late}): +{len(got - expected)} "
                f"-{len(expected - got)}"
            )
        # and one more ordinary pass must be a no-op-equivalent
        compact_store(spark, store, lock_timeout_s=10.0)
        got2 = {
            (r["series_id"], r["t"], r["v"])
            for r in read_samples_table(spark, store)
            .select("series_id", "t", "v")
            .collect()
        }
        if got2 != expected:
            return f"seed {seed}: second recovery pass changed content"
        return None
    finally:
        from timbala_spark.streaming import backend as backend_mod

        backend_mod.set_backend(None)
        shutil.rmtree(root, ignore_errors=True)


def sweep(spark, lo: int, hi: int) -> int:
    fails = 0
    for seed in range(lo, hi):
        err = run_seed(spark, seed)
        if err:
            print(f"FAIL {err}", flush=True)
            fails += 1
    return fails


def main(argv) -> int:
    lo, hi = (int(argv[0]), int(argv[1])) if len(argv) == 2 else (0, 24)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    n = sweep(spark, lo, hi)
    print(f"objcrash: {n} failures over seeds [{lo}, {hi})")
    spark.stop()
    return 1 if n else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
