"""Versioned store layout: manifest-pinned generations.

The reference never lets a reader observe a half-compacted store: block
swaps happen under the DB lock and readers hold references to the
blocks they opened (``vendor/github.com/prometheus/tsdb/db.go:292-330``
reload after ``compact.go:308`` Compact), so old blocks stay readable
until every pinned reader is gone. A plain rmtree+rename swap has no
such property — a racing scan fails on missing files, and on an object
store (the 100 TB target) a directory rename is not atomic at all.

Spark-first equivalent — a tiny table-format commit (the same shape as
Delta/Iceberg's log, reduced to one pointer because the store only has
two tables and whole-generation rewrites):

* data lives in **generation directories** ``<store>/gen-NNNNNN/
  {samples,series}``; a maintenance pass writes a complete new
  generation, then commits by atomically replacing the single
  ``<store>/MANIFEST`` object (``os.rename`` of a same-directory temp
  file on a filesystem; a single-key PUT on an object store — both
  atomic);
* **readers pin the generation they resolved**: ``read_samples_table``
  resolves the manifest once and builds DataFrames over the pinned
  paths, so an in-flight query keeps scanning its generation while a
  commit flips the pointer underneath it;
* retired generations are **garbage-collected lazily** (``gc_store``),
  keeping the most recent ``keep`` retired sets so pinned readers
  outlive the commit — AND never deleting a generation that has been
  retired for less than a grace period (default ``GC_GRACE_S``, sized
  above the server's 120 s query timeout). The reference refcounts
  open blocks and only unmaps them once every reader is done
  (``vendor/github.com/prometheus/tsdb/db.go:292-330``); a lease
  (time-based pin) is the object-store-friendly equivalent — a reader
  bounded by the query timeout can never outlive the grace, so its
  pinned generation can never be deleted under it, even if several
  commits land while it runs. Within-generation *appends* (ingest
  batches) are always safe — a reader's file listing is a snapshot,
  and files only ever get added.

Concurrent committers are excluded two ways (the reference's db.mtx
discipline, ``tsdb/db.go``): ``maintenance_lock`` is a cross-process
mutex serializing whole maintenance passes (so two servers or
a server plus an ops script pointed at one store cannot both build
``gen-N+1`` and clobber each other's work), and ``commit_manifest``
optionally does a compare-and-set (refuse to commit over a generation
the committer never saw).

**Storage backends** (:mod:`timbala_spark.streaming.backend`): every
POSIX-only primitive the protocol uses — the flock behind
``maintenance_lock``, the hardlinks behind ``link_files``, the
same-directory renames behind ``commit_manifest``/``write_settled``/
``write_min_t`` — is routed through the active
:class:`~timbala_spark.streaming.backend.StorageBackend`. The default
:class:`PosixBackend` keeps the r7 behavior byte-for-byte; the
object-store backend implements the same protocol with the
primitives an object store actually offers: the commit CAS is a
conditional PUT (``If-Match`` on the manifest ETag — the same
primitive Delta's S3 commit service / Iceberg's catalog swap rely
on), the maintenance mutex is an expiring lease object acquired by
conditional-create, and generation file sharing is a server-side key
copy. ``TIMBALA_STORE_BACKEND=objectstore`` runs the whole
maintenance suite against that contract
(:class:`FakeObjectStoreBackend`).

A store that has only ever been written (never compacted) stays in the
flat legacy layout ``<store>/{samples,series}`` — generation 0 — so the
manifest machinery costs nothing until the first maintenance pass.

The uncompacted-tail ``_dirty`` marker lives INSIDE the generation it
describes (legacy gen 0: at the store root). That makes the
marker-vs-commit ordering race-free: a writer that appended to the old
generation dirties the old generation (retired with it), a writer that
resolved the new generation dirties the new one (never clobbered by
the commit that created it).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from dataclasses import dataclass

from . import backend as backend_mod

MANIFEST_NAME = "MANIFEST"
MAINTENANCE_LOCK_NAME = ".maintenance.lock"
RETIRED_STAMP = "_retired"
#: store-root retention-horizon marker — see :func:`read_min_t`
MIN_T_MARKER = "_min_t"

#: Minimum seconds a generation must have been retired before GC may
#: delete it. Sized above the server's default per-query timeout
#: (``TimbalaServer(timeout_s=120.0)``): a reader pins its generation
#: for at most one query's lifetime, so a grace longer than the
#: timeout guarantees no pinned reader loses its files — even one that
#: spans several maintenance commits.
GC_GRACE_S = 150.0


class ConcurrentCommitError(RuntimeError):
    """``commit_manifest`` CAS failed: another committer advanced the
    manifest past the generation this committer resolved."""


# MaintenanceLockHeldError is the backend's LockHeldError: raised by
# the flock path and the lease path alike, so callers catch one type.
MaintenanceLockHeldError = backend_mod.LockHeldError


@contextlib.contextmanager
def maintenance_lock(path: str, timeout_s: float = 0.0):
    """Cross-process mutex serializing maintenance passes.

    The reference serializes compaction/retention under ``db.mtx``
    (one process); with a shared store, two *processes* can race.
    POSIX backend: an ``flock`` on ``<store>/.maintenance.lock`` held
    for the whole pass — advisory, crash-safe (the kernel drops the
    lock with the process). Object-store backend: an expiring lease
    object acquired by conditional-create — crash recovery is lease
    expiry. Both raise :class:`MaintenanceLockHeldError` if another
    holder persists past ``timeout_s``. On stores where the mutex is
    unreliable (some NFS; a crashed lease holder until expiry), the
    CAS inside ``commit_manifest`` is the backstop: the race then
    costs a wasted rewrite, never a lost commit."""
    with backend_mod.get_backend().lock(path, timeout_s=timeout_s):
        yield


@dataclass(frozen=True)
class StorePaths:
    """One resolved (pinned) view of a store: absolute paths valid until
    the generation is garbage-collected."""

    root: str
    gen: int
    samples: str
    series: str
    dirty_marker: str


def gen_dirname(gen: int) -> str:
    return f"gen-{gen:06d}"


def resolve_store(path: str) -> StorePaths:
    """Resolve the store's current generation via the manifest.

    No manifest → legacy flat layout (generation 0). The returned paths
    are a consistent snapshot: a commit that lands after this call does
    not affect them (the old generation survives until GC)."""
    mpath = os.path.join(path, MANIFEST_NAME)
    try:
        with open(mpath) as f:
            doc = json.load(f)
        gdir = os.path.join(path, doc["dir"])
        return StorePaths(
            root=path,
            gen=int(doc["gen"]),
            samples=os.path.join(gdir, "samples"),
            series=os.path.join(gdir, "series"),
            dirty_marker=os.path.join(gdir, "_dirty"),
        )
    except FileNotFoundError:
        return StorePaths(
            root=path,
            gen=0,
            samples=os.path.join(path, "samples"),
            series=os.path.join(path, "series"),
            dirty_marker=os.path.join(path, "_dirty"),
        )


def _manifest_bytes(gen: int) -> bytes:
    """Canonical manifest content for a generation — deterministic, so
    it doubles as the conditional PUT's expected-content (ETag
    stand-in)."""
    return json.dumps({"gen": gen, "dir": gen_dirname(gen)}).encode()


def commit_manifest(path: str, gen: int, expect_gen: int | None = None) -> None:
    """Atomically point the store at generation ``gen``.

    POSIX backend: same-directory ``os.rename`` (atomic). Object-store
    backend: a single-key PUT of the manifest object — the one
    primitive every store offers atomically (this is exactly the
    Delta/Iceberg commit shape, minus the log compaction they need for
    concurrent committers).

    ``expect_gen`` makes the commit a compare-and-set and is refused
    (:class:`ConcurrentCommitError`) if the store is no longer at that
    generation — i.e. another committer won. On the object-store
    backend the CAS is a real conditional PUT (``If-Match`` on the
    previous manifest content; ``If-None-Match`` when committing over
    a legacy gen-0 store) and is therefore EXACT with or without the
    maintenance lease. On POSIX it is read-compare-rename: exact for
    callers holding ``maintenance_lock`` (every maintenance pass);
    without the lock it narrows last-writer-wins to a vanishing
    window."""
    be = backend_mod.get_backend()
    mpath = os.path.join(path, MANIFEST_NAME)
    if expect_gen is not None:
        cur = resolve_store(path).gen
        if cur != expect_gen:
            raise ConcurrentCommitError(
                f"store {path!r} is at generation {cur}, committer expected "
                f"{expect_gen}; refusing to overwrite a commit it never saw"
            )
        # gen 0 = legacy flat layout: no manifest object exists yet,
        # so the conditional PUT is a conditional CREATE
        expect = _manifest_bytes(expect_gen) if expect_gen > 0 else None
        try:
            be.put_small_cas(mpath, _manifest_bytes(gen), expect)
        except backend_mod.CASConflictError as e:
            raise ConcurrentCommitError(
                f"store {path!r}: conditional manifest PUT failed "
                f"(committer expected generation {expect_gen}): {e}"
            ) from None
    else:
        be.put_small(mpath, _manifest_bytes(gen))


def list_data_files(root: str) -> set[str]:
    """Relative paths of all parquet data files under ``root`` (commit
    markers / checksum side-files excluded — they are per-write
    artifacts, not data)."""
    out: set[str] = set()
    if not os.path.isdir(root):
        return out
    for dirpath, dirs, files in os.walk(root):
        # never descend into in-flight commit dirs (_temporary) — the
        # same hidden-path rule Spark's own file listing applies
        dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
        rel = os.path.relpath(dirpath, root)
        for f in files:
            if f.endswith(".parquet") and not f.startswith((".", "_")):
                out.add(f if rel == "." else os.path.join(rel, f))
    return out


def link_files(src_root: str, rel_files, dst_root: str) -> int:
    """Bring ``rel_files`` from one generation into another without
    rewriting them through Spark: hardlinks on a POSIX filesystem (the
    linked inodes survive GC of the source directory entries),
    server-side key copies on an object store (``backend.share_file``
    — metadata-priced on most stores, and the cost model becomes
    O(carried files) per maintenance pass instead of O(1) links; a
    richer manifest that lists old keys in place would remove even
    that, at the price of cross-generation GC refcounting)."""
    be = backend_mod.get_backend()
    n = 0
    for rel in sorted(rel_files):
        dst = os.path.join(dst_root, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        be.share_file(os.path.join(src_root, rel), dst)
        n += 1
    return n


def retired_generations(path: str) -> list[str]:
    """Directories holding generations older than the current one,
    oldest first (the flat legacy layout counts as generation 0)."""
    cur = resolve_store(path)
    out: list[str] = []
    if cur.gen > 0 and os.path.isdir(os.path.join(path, "samples")):
        out.append("samples")  # legacy gen 0 (plus its series/_dirty)
    for entry in sorted(os.listdir(path)):
        if entry.startswith("gen-") and entry != gen_dirname(cur.gen):
            try:
                g = int(entry.split("-", 1)[1])
            except ValueError:
                continue
            if g < cur.gen:
                out.append(entry)
    return out


def _stamp_path(path: str, entry: str) -> str:
    # legacy gen 0 lives at the store root; its stamp does too
    return (
        os.path.join(path, RETIRED_STAMP)
        if entry == "samples"
        else os.path.join(path, entry, RETIRED_STAMP)
    )


def gc_store(
    path: str, keep: int = 1, grace_s: float | None = None
) -> list[str]:
    """Delete retired generations, keeping the ``keep`` most recent so
    readers pinned just before the last commit(s) stay valid, and never
    deleting a generation retired less than ``grace_s`` seconds ago
    (default :data:`GC_GRACE_S`). Returns the deleted directory names.

    Retirement age is tracked by a ``_retired`` stamp file written the
    first time a GC pass observes the generation as retired — so a
    generation is deleted at the earliest on the *second* pass after
    the commit that retired it, once the stamp is older than the
    grace. A reader is bounded by the query timeout; grace > timeout
    means no reader that pinned the generation while it was current
    can still be running when it is deleted, no matter how many
    commits land in between (the residual window the per-commit
    ``keep`` count could not close). ``keep=0, grace_s=0`` reclaims
    everything retired — only safe once no reader can hold a
    pre-commit resolution."""
    if grace_s is None:
        grace_s = GC_GRACE_S
    be = backend_mod.get_backend()
    retired = retired_generations(path)
    now = time.time()
    aged: list[str] = []
    for entry in retired:
        stamp = _stamp_path(path, entry)
        try:
            age = now - be.mtime(stamp)
        except FileNotFoundError:
            be.touch_stamp(stamp)  # first observation: start the clock
            age = 0.0
        if age >= grace_s:
            aged.append(entry)
    doomed = set(retired[: max(0, len(retired) - keep)]) & set(aged)
    deleted: list[str] = []
    for entry in (e for e in retired if e in doomed):
        if entry == "samples":  # legacy gen 0 lives at the store root
            for legacy in ("samples", "series"):
                be.delete_tree(os.path.join(path, legacy))
            for marker in ("_dirty", RETIRED_STAMP):
                be.delete(os.path.join(path, marker))
            deleted.append("samples")
        else:
            be.delete_tree(os.path.join(path, entry))
            deleted.append(entry)
    return deleted


#: per-generation settled-files listing — see :func:`read_settled`
SETTLED_NAME = "_settled"


def read_settled(gdir: str) -> set[str] | None:
    """The generation's SETTLED samples files (paths relative to its
    ``samples/`` dir), or ``None`` when the generation has no listing
    (legacy / never-compacted store → the next compaction falls back
    to a full rewrite and starts the listing).

    Invariant: within any one day partition, the settled files jointly
    hold no ``(series_id, t)`` duplicates and are ``(series_id, t)``-
    sorted — they are the product of a compaction rewrite of WHOLE
    days, and every append since lands as a file *outside* the listing.
    ``compact_store`` uses the complement (current files − settled) to
    rewrite only the day partitions appends actually touched — the
    incremental-compaction analog of the reference's head-block flush
    (``tsdb/compact.go:128-167`` plans over changed blocks only; it
    never rewrites settled old blocks either)."""
    try:
        with open(os.path.join(gdir, SETTLED_NAME)) as f:
            return {line.rstrip("\n") for line in f if line.strip()}
    except FileNotFoundError:
        return None


def write_settled(gdir: str, files) -> None:
    """Atomically publish the generation's settled listing (small-
    object publish, like the manifest)."""
    data = "".join(rel + "\n" for rel in sorted(files)).encode()
    backend_mod.get_backend().put_small(
        os.path.join(gdir, SETTLED_NAME), data
    )


def snapshot_store(path: str, dst: str, lock_timeout_s: float = 0.0) -> int:
    """Hardlink a consistent, self-contained copy of the store's
    current generation into ``dst`` — the analog of the reference's
    ``DB.Snapshot`` (``vendor/github.com/prometheus/tsdb/db.go:607-630``
    hardlinks every block's files into the target under the compaction
    mutex; ``block.go:464`` per-block). Returns the number of files
    linked.

    Like the reference (which holds ``db.cmtx`` for the whole pass),
    the snapshot holds :func:`maintenance_lock`, so no compaction/
    retention/GC can retire or delete the generation mid-copy;
    concurrent *appends* are safe without the lock by the same
    argument queries rely on (a file listing is a snapshot and files
    are only ever added), the lock just pins WHICH side of an ongoing
    batch the snapshot lands on less arbitrarily. Hardlinks are
    metadata-only — snapshotting a 100 TB store costs O(files), not
    O(bytes), and the linked inodes survive GC of the source (the
    object-store translation is a manifest copy listing the same
    immutable keys).

    ``dst`` becomes a store of the SAME layout as the source — a
    manifest-committed source yields a manifest-committed snapshot
    (same generation number; rollup servability requires a committed
    generation, ``ingest.read_rollup_tables``), a never-compacted
    legacy source yields a flat legacy snapshot. Either way the
    snapshot is immediately readable via ``read_samples_table``,
    compactable, and fully independent. Carried alongside the data:

    * the ``_dirty`` marker — a snapshot of a dirty store stays
      marked, so its reads keep the replica-collapse until ITS first
      compaction (semantics travel with the data);
    * the ``_settled`` listing — the snapshot's first compaction stays
      incremental;
    * ``rollup-*`` tables and the ``_min_t`` write horizon — archived
      rollup tiers below the horizon remain servable and immutable.
    """
    real_dst = os.path.realpath(dst)
    real_src = os.path.realpath(path)
    if real_dst == real_src or real_dst.startswith(real_src + os.sep):
        raise ValueError("cannot snapshot into the store's own directory")
    if os.path.isdir(real_dst) and any(
        not e.startswith(".") for e in os.listdir(real_dst)
    ):
        raise ValueError(f"snapshot target {dst!r} is not empty")
    n = 0
    with maintenance_lock(path, lock_timeout_s):
        st = resolve_store(path)
        gdir = os.path.dirname(st.samples)  # generation dir (or root)
        dst_gdir = (
            real_dst
            if st.gen == 0
            else os.path.join(real_dst, gen_dirname(st.gen))
        )
        os.makedirs(dst_gdir, exist_ok=True)
        for entry in sorted(os.listdir(gdir)):
            full = os.path.join(gdir, entry)
            if os.path.isdir(full) and (
                entry in ("samples", "series") or entry.startswith("rollup-")
            ):
                rel = list_data_files(full)
                n += link_files(full, rel, os.path.join(dst_gdir, entry))
            elif entry in ("_dirty", SETTLED_NAME) and os.path.isfile(full):
                backend_mod.get_backend().put_small(
                    os.path.join(dst_gdir, entry),
                    backend_mod.get_backend().read_small(full),
                )
        if st.gen > 0:
            commit_manifest(real_dst, st.gen)
        horizon = read_min_t(path)
        if horizon is not None:
            write_min_t(real_dst, horizon)
    return n


def read_min_t(path: str) -> int | None:
    """The store's retention horizon (ms), or None if retention never
    dropped anything. Samples strictly below it have been deleted;
    writes below it are rejected (``ingest.write_samples_batch`` —
    the reference likewise refuses appends before the head's minimum
    valid time, ``tsdb/head.go:1151-1169`` ErrOutOfOrderSample /
    out-of-bounds). The guard is what makes ARCHIVED rollup day
    partitions (``compact.apply_retention`` ``rollup_min_t_ms``)
    immutable: no write can ever land under an archived day again,
    so the archive stays exact forever without re-validation."""
    try:
        with open(os.path.join(path, MIN_T_MARKER)) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        return None


def write_min_t(path: str, min_t_ms: int) -> None:
    """Advance the retention horizon (monotonic — never lowered; a
    lower horizon would re-open archived days to writes). Atomic
    same-directory rename, like the manifest."""
    cur = read_min_t(path)
    if cur is not None and cur >= min_t_ms:
        return
    backend_mod.get_backend().put_small(
        os.path.join(path, MIN_T_MARKER), str(int(min_t_ms)).encode()
    )


__all__ = [
    "StorePaths",
    "ConcurrentCommitError",
    "MaintenanceLockHeldError",
    "GC_GRACE_S",
    "maintenance_lock",
    "resolve_store",
    "commit_manifest",
    "gen_dirname",
    "list_data_files",
    "read_min_t",
    "write_min_t",
    "read_settled",
    "write_settled",
    "link_files",
    "retired_generations",
    "gc_store",
    "snapshot_store",
]
