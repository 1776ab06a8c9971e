"""Crash-point fuzz for the curation-index generation protocol (r10,
VERDICT r9 task 2).

r9 gave the near-dup indexes (``pipeline/incremental.py``) their
build/append/probe/reconcile protocol with raw ``os`` calls and a
stated single-writer assumption; r10 routed every index mutation
through the :class:`~timbala_spark.streaming.backend.StorageBackend`
seam (lease mutex, conditional-PUT meta pointer, backend prefix
deletes).  This harness proves the claim the same way
``tools/crash_fuzz.py`` proves it for the sample store: kill the
writer at the N-th backend operation — mid-append, post-append/
pre-meta-CAS, mid-reconcile (before or after the pointer CAS), mid
generation sweep — leave the lease held exactly like a dead process
would, and assert:

  * while the dead writer's lease is un-expired, a second writer's
    append fails fast with LockHeldError (never corrupts);
  * after expiry, a fresh writer steals the lease and its reconcile
    converges: the meta points at exactly one complete generation,
    no stray ``gen-*`` dirs remain, and a probe of a test batch
    returns EXACTLY the pair set of a probe against a control index
    built fresh over the same corpus.

Seed layout: seed → (index kind ∈ {ngram, minhash, embedding},
doomed op ∈ {append, reconcile}, kill-point N, before/after-op,
whether a blocked-then-retried append lands before recovery).
Run directly (``python tools/idx_crash_fuzz.py [lo hi]``) or as the
``idxcrash`` family of ``tools/fuzz_all.py``.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.crash_fuzz import InjectedCrash, _make_crashing_backend  # noqa: E402


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _mk_vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _doc_rows(rng, n, start_id=0):
    rows = []
    for i in range(start_id, start_id + n):
        if i % 4 == 1 and rows:
            toks = rows[-1][1].split()
            toks[rng.randrange(len(toks))] = f"w{rng.randrange(30)}"
            rows.append((i, " ".join(toks)))
        else:
            rows.append(
                (i, " ".join(f"w{rng.randrange(30)}" for _ in range(10)))
            )
    return rows


def _vec_rows(rng, n, start_id=0):
    rows = []
    for i in range(start_id, start_id + n):
        if i % 4 == 1 and rows:
            v = [x + rng.uniform(-0.01, 0.01) for x in rows[-1][1]]
        else:
            v = [rng.uniform(-1.0, 1.0) for _ in range(8)]
        rows.append((i, v))
    return rows


_KINDS = {
    # kind: (build kwargs, probe kwargs, mk frame, row gen)
    "ngram": (dict(n=3), dict(threshold=0.2), _mk_docs, _doc_rows),
    "minhash": (
        dict(n=3, num_hashes=32, bands=16),
        dict(threshold=0.2),
        _mk_docs,
        _doc_rows,
    ),
    "embedding": (
        dict(dim=8, n_planes=4, n_tables=8),
        dict(threshold=0.8),
        _mk_vecs,
        _vec_rows,
    ),
}


def run_seed(spark, seed: int) -> str | None:
    """One crash scenario; returns an error string or None."""
    import random

    from timbala_spark.pipeline import incremental as inc
    from timbala_spark.streaming import backend as backend_mod
    from timbala_spark.streaming.backend import LockHeldError

    rng = random.Random(seed)
    kind = rng.choice(sorted(_KINDS))
    build_kw, probe_kw, mk, gen_rows = _KINDS[kind]
    build = getattr(inc, f"{kind}_index_build")
    append = getattr(inc, f"{kind}_index_append")
    probe = getattr(inc, f"{kind}_index_probe")
    reconcile = getattr(inc, f"{kind}_index_reconcile")

    root = tempfile.mkdtemp(prefix="idxcrash_")
    idx = os.path.join(root, "idx")
    ctl = os.path.join(root, "ctl")
    try:
        base_rows = gen_rows(rng, 30)
        batch2_rows = gen_rows(rng, 10, start_id=100)
        probe_rows = gen_rows(rng, 8, start_id=200)
        base = mk(spark, base_rows)
        batch2 = mk(spark, batch2_rows)
        probe_batch = mk(spark, probe_rows)

        backend_mod.set_backend(backend_mod.FakeObjectStoreBackend())
        build(base, idx, **build_kw)
        # one reconcile first for some seeds, so the doomed pass can
        # also kill mid generation-sweep of a gen>0 index
        if rng.random() < 0.5:
            reconcile(base, idx)

        doomed_op = rng.choice(["append", "reconcile", "compact"])
        crashing = _make_crashing_backend(
            kill_at=rng.randrange(1, 8), after_op=rng.random() < 0.5
        )
        crashing.lease_s = 0.5
        backend_mod.set_backend(crashing)
        crashed = False
        try:
            if doomed_op == "append":
                append(batch2, idx, batch_tag="b2")
            elif doomed_op == "compact":
                # fold a tagged append first (clean), then kill the
                # pure-rewrite compaction mid-protocol
                backend_mod.set_backend(backend_mod.FakeObjectStoreBackend())
                append(batch2, idx, batch_tag="b2")
                backend_mod.set_backend(crashing)
                inc.index_compact(spark, idx)
            else:
                reconcile(base.unionByName(batch2), idx)
        except InjectedCrash:
            crashed = True

        # while the dead writer's lease is live, a second writer must
        # fail FAST and corrupt nothing.  Only applicable when the
        # kill actually landed between lease acquisition and release —
        # a kill at/before the lease-create CAS leaves the mutex free,
        # and then the second writer's success IS the correct outcome.
        backend_mod.set_backend(backend_mod.FakeObjectStoreBackend())
        lease_live = False
        try:
            import json as _json

            with open(os.path.join(idx, ".maintenance.lease"), "rb") as f:
                lease_live = _json.load(f).get("expires", 0) > time.time()
        except (FileNotFoundError, ValueError):
            pass
        if crashed and lease_live:
            try:
                append(batch2, idx, batch_tag="b2", lock_timeout_s=0.0)
                return f"seed {seed}: append succeeded under a live lease"
            except LockHeldError:
                pass
            except FileNotFoundError:
                # doomed BUILD-path kill before any meta existed is
                # impossible here (build ran clean); append finding no
                # meta means the pointer vanished — that IS corruption
                return f"seed {seed}: meta pointer lost after crash"

        time.sleep(0.6)  # lease expiry
        recovery = backend_mod.FakeObjectStoreBackend()
        recovery.lease_s = 30.0
        backend_mod.set_backend(recovery)

        # optionally land the interrupted batch first (the streaming
        # runner's at-least-once retry, stealing the expired lease)
        landed_late = rng.random() < 0.5
        if landed_late:
            append(batch2, idx, batch_tag="b2", lock_timeout_s=10.0)

        # convergence: reconcile over the full corpus must steal the
        # lease, commit one complete generation and sweep strays
        full = base.unionByName(batch2)
        reconcile(full, idx, lock_timeout_s=10.0)
        meta = inc._read_meta(idx)
        gens = sorted(
            e for e in os.listdir(idx) if e.startswith("gen-")
        )
        if gens != [f"gen-{meta['generation']}"]:
            return (
                f"seed {seed}: stray generations after recovery: "
                f"{gens} vs meta gen {meta['generation']}"
            )

        # probe equivalence vs a control index built fresh
        build(full, ctl, **build_kw)
        got = {
            tuple(r) for r in probe(
                probe_batch, idx, corpus=full, **probe_kw
            ).collect()
        }
        want = {
            tuple(r) for r in probe(
                probe_batch, ctl, corpus=full, **probe_kw
            ).collect()
        }
        if got != want:
            return (
                f"seed {seed}: probe diverged after recovery "
                f"(kind={kind}, op={doomed_op}, crashed={crashed}, "
                f"late={landed_late}): +{len(got - want)} "
                f"-{len(want - got)}"
            )
        return None
    finally:
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
    print(f"idxcrash: {n} failures over seeds [{lo}, {hi})")
    spark.stop()
    return 1 if n else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
