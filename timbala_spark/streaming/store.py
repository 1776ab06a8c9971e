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
  outlive the commit. Within-generation *appends* (ingest batches) are
  always safe — a reader's file listing is a snapshot, and files only
  ever get added.

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

import json
import os
import shutil
from dataclasses import dataclass

MANIFEST_NAME = "MANIFEST"


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


def commit_manifest(path: str, gen: int) -> None:
    """Atomically point the store at generation ``gen``.

    Same-directory ``os.rename`` is atomic on POSIX; the object-store
    translation is a single-key PUT of the manifest object — the one
    primitive every store offers atomically (this is exactly the
    Delta/Iceberg commit shape, minus the log compaction they need for
    concurrent committers)."""
    doc = {"gen": gen, "dir": gen_dirname(gen)}
    tmp = os.path.join(path, f".{MANIFEST_NAME}.tmp.{gen}")
    with open(tmp, "w") as f:
        json.dump(doc, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, os.path.join(path, MANIFEST_NAME))


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
    copying bytes: hardlinks on a filesystem (the linked inodes survive
    GC of the source directory entries), server-side copy fallback.
    On an object store this whole step is metadata-only — the new
    manifest would just list the old keys."""
    n = 0
    for rel in sorted(rel_files):
        dst = os.path.join(dst_root, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        src = os.path.join(src_root, rel)
        try:
            os.link(src, dst)
        except OSError:  # cross-device / FS without hardlinks
            shutil.copy2(src, dst)
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


def gc_store(path: str, keep: int = 1) -> list[str]:
    """Delete retired generations, keeping the ``keep`` most recent so
    readers pinned just before the last commit(s) stay valid. Returns
    the deleted directory names. ``keep=0`` reclaims everything retired
    — only safe once no reader can hold a pre-commit resolution."""
    retired = retired_generations(path)
    doomed = retired[: max(0, len(retired) - keep)]
    deleted: list[str] = []
    for entry in doomed:
        if entry == "samples":  # legacy gen 0 lives at the store root
            for legacy in ("samples", "series"):
                shutil.rmtree(os.path.join(path, legacy), ignore_errors=True)
            try:
                os.remove(os.path.join(path, "_dirty"))
            except FileNotFoundError:
                pass
            deleted.append("samples")
        else:
            shutil.rmtree(os.path.join(path, entry), ignore_errors=True)
            deleted.append(entry)
    return deleted


__all__ = [
    "StorePaths",
    "resolve_store",
    "commit_manifest",
    "gen_dirname",
    "list_data_files",
    "link_files",
    "retired_generations",
    "gc_store",
]
