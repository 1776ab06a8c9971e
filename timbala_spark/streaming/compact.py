"""Store maintenance: compaction and retention for the split layout.

The reference runs a leveled compactor that merges head/small blocks
into larger time-range blocks (``tsdb/compact.go:128-167`` plan,
``:308`` Compact; timbala uses 2h/10h/50h ranges,
``cmd/timbala/main.go:153``) and enforces retention by deleting whole
expired blocks (``tsdb/db.go:47-49``; timbala sets it to infinite,
``cmd/timbala/main.go:152``). Both swaps happen under the DB lock with
readers holding block references (``tsdb/db.go:292-330`` reload), so a
query never observes a half-state.

Spark-first equivalents over the split parquet store written by
``timbala_spark.streaming.ingest``, committed through the versioned
manifest in :mod:`timbala_spark.streaming.store` (write a complete new
generation → atomically flip one manifest object → GC retired
generations lazily). That gives the same reader guarantee as the
reference without a lock: an in-flight query keeps scanning the
generation it resolved, and the rename-isn't-atomic problem on object
stores disappears (the commit is a single-key PUT).

* ``compact_store`` — streaming micro-batches append one small file
  set per batch; compaction rewrites each day partition as few large
  files, re-sorted by ``(series_id, t)`` (restoring RLE/delta
  encoding efficiency), merge-dedups samples that were re-sent across
  batches, and collapses the series dictionary to one row per series.
  On a production lakehouse this job is Delta/Iceberg ``OPTIMIZE``;
  the manifest commit here is the plain-parquet version of their log.
* ``apply_retention`` — drops whole expired day partitions, a
  metadata-only delete exactly like the reference dropping expired
  blocks (the surviving files are carried into the new generation by
  hardlink, no data bytes move). Tombstone-style row deletes are NOT
  implemented by design: the reference's delete-series API is
  disabled (panics, ``internal/api/v1/api.go:279-371``).

Concurrency contract (mirrors the reference's db.mtx discipline):
**readers are always safe** (generation pinning above); **one
maintenance pass at a time**, and writers should be coordinated with
maintenance — a batch that finishes its append during the compacted
rewrite is carried into the new generation by the straggler re-list
below, but a batch that lands in the old generation *after* the
final re-list and *before* its writer re-resolves the manifest would
be stranded, so the server serializes writes against maintenance
(``TimbalaServer._store_lock``). Library callers doing their own
ingest should do the same.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession, functions as F

from ..model import utc_day_expr
from .store import (
    commit_manifest,
    gc_store,
    gen_dirname,
    link_files,
    list_data_files,
    resolve_store,
)


def compact_store(
    spark: SparkSession,
    path: str,
    gc_keep: int = 1,
    _after_rewrite=None,
) -> None:
    """Rewrite the store as a new generation with large sorted files
    and a deduped series dictionary, then commit atomically. Safe under
    concurrent readers (they stay pinned to the old generation until
    ``gc_keep`` more commits land).

    Scale notes: ``repartitionByRange(day, series_id)`` keeps each
    output task inside one day (so ``partitionBy`` emits one file per
    task) while splitting big days across many tasks by series range —
    no single-task-per-day skew. Samples duplicated by cross-batch
    re-sends collapse via the same ``(series_id, t)`` rule as ingest
    replica dedup.

    Batches appended while the rewrite runs are *carried over*: the
    source listing is snapshotted before the read, re-listed after the
    rewrite, and any straggler files hardlink into the new generation
    (which then stays marked dirty, since stragglers may duplicate
    compacted rows — the normal read path collapses them).
    ``_after_rewrite(src)`` is a test/ops hook invoked between the
    rewrite and the straggler re-list."""
    src = resolve_store(path)
    if not os.path.isdir(src.samples):
        return  # nothing written yet
    new_gen = src.gen + 1
    gdir = os.path.join(path, gen_dirname(new_gen))
    if os.path.exists(gdir):  # crashed uncommitted attempt: discard
        shutil.rmtree(gdir)
    new_s, new_d = os.path.join(gdir, "samples"), os.path.join(gdir, "series")
    snap_s = list_data_files(src.samples)
    snap_d = list_data_files(src.series)
    (
        spark.read.parquet(src.samples)
        .dropDuplicates(["series_id", "t"])
        .withColumn("day", utc_day_expr(F.col("t")))
        .repartitionByRange(F.col("day"), F.col("series_id"))
        .sortWithinPartitions("series_id", "t")
        .write.mode("overwrite")
        .option("parquet.writer.version", "v2")
        .partitionBy("day")
        .parquet(new_s)
    )
    (
        spark.read.parquet(src.series)
        .dropDuplicates(["series_id"])
        .write.mode("overwrite")
        .parquet(new_d)
    )
    if _after_rewrite is not None:
        _after_rewrite(src)
    # straggler carry-over: appends that landed after the snapshot are
    # not in the compacted output — link them in verbatim and keep the
    # new generation dirty so reads replica-collapse them
    extras_s = list_data_files(src.samples) - snap_s
    extras_d = list_data_files(src.series) - snap_d
    link_files(src.samples, extras_s, new_s)
    link_files(src.series, extras_d, new_d)
    if extras_s or extras_d:
        with open(os.path.join(gdir, "_dirty"), "w"):
            pass
    # commit; the compacted collapse removed every cross-batch
    # duplicate, so (absent stragglers) reads of the new generation
    # skip the replica-dedup exchange — its _dirty marker was simply
    # never created
    commit_manifest(path, new_gen)
    gc_store(path, keep=gc_keep)


def apply_retention(path: str, min_t_ms: int, gc_keep: int = 1) -> list[str]:
    """Drop day partitions strictly older than ``min_t_ms``.

    Whole-partition deletes only — a day straddling the cutoff is
    kept in full (the reference likewise deletes whole expired blocks,
    ``tsdb/db.go``). Returns the dropped partition names. Commits a
    new generation whose surviving files are hardlinks of the old
    ones (metadata-only, no data bytes move — on an object store the
    new manifest just lists the surviving keys), so concurrent readers
    stay pinned and never see a half-pruned store. The series
    dictionary is carried as-is; a following ``compact_store`` plus an
    anti-join against live series_ids could shrink it, but a stale
    dict entry is harmless (never matched by the samples join).
    """
    # day partition format is yyyyMMdd in UTC
    import datetime

    cutoff = datetime.datetime.fromtimestamp(
        min_t_ms / 1000, tz=datetime.timezone.utc
    ).strftime("%Y%m%d")
    src = resolve_store(path)
    if not os.path.isdir(src.samples):
        return []
    dropped = [
        entry
        for entry in sorted(os.listdir(src.samples))
        if entry.startswith("day=") and entry.split("=", 1)[1] < cutoff
    ]
    if not dropped:
        return []
    new_gen = src.gen + 1
    gdir = os.path.join(path, gen_dirname(new_gen))
    if os.path.exists(gdir):  # crashed uncommitted attempt: discard
        shutil.rmtree(gdir)
    doomed = set(dropped)
    keep_rel = [
        rel
        for rel in list_data_files(src.samples)
        if rel.split(os.sep, 1)[0] not in doomed
    ]
    link_files(src.samples, keep_rel, os.path.join(gdir, "samples"))
    link_files(
        src.series, list_data_files(src.series), os.path.join(gdir, "series")
    )
    os.makedirs(os.path.join(gdir, "samples"), exist_ok=True)
    os.makedirs(os.path.join(gdir, "series"), exist_ok=True)
    if os.path.exists(src.dirty_marker):  # uncompacted tail survives
        with open(os.path.join(gdir, "_dirty"), "w"):
            pass
    commit_manifest(path, new_gen)
    gc_store(path, keep=gc_keep)
    return dropped
