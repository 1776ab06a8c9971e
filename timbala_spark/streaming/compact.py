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
**readers are always safe** (generation pinning above, plus the
time-based GC grace in ``store.gc_store`` so a reader spanning
several commits never loses its generation); **one maintenance pass
at a time** — enforced here by the cross-process ``maintenance_lock``
flock held for the whole pass, with a manifest CAS at commit time as
the backstop (a second committer racing on a lock-less store raises
``ConcurrentCommitError`` and discards its build instead of silently
dropping the winner's straggler links); and writers should be
coordinated with maintenance — a batch that finishes its append
during the compacted rewrite is carried into the new generation by
the straggler re-list below, but a batch that lands in the old
generation *after* the final re-list and *before* its writer
re-resolves the manifest would be stranded, so the server serializes
writes against maintenance (``TimbalaServer._store_lock``). Library
callers doing their own ingest should do the same.
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
    maintenance_lock,
    resolve_store,
)


def compact_store(
    spark: SparkSession,
    path: str,
    gc_keep: int = 1,
    gc_grace_s: float | None = None,
    lock_timeout_s: float = 0.0,
    rollup_ms: tuple[int, ...] = (),
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
    rewrite and the straggler re-list.

    The whole pass runs under the store's cross-process
    ``maintenance_lock`` (raises ``MaintenanceLockHeldError`` if
    another maintenance pass holds it past ``lock_timeout_s``), and
    the commit is a CAS against the resolved generation — two
    committers can never both claim ``gen-N+1``.

    ``rollup_ms``: resolutions (ms) of multi-aggregate downsampled
    rollups (:mod:`timbala_spark.rollup`) to materialize as part of
    the new generation — the Thanos-compactor-downsampling analog,
    except EXACT by construction: each ``rollup-<W>/`` table is built
    from the generation's own compacted, deduped samples, so it
    describes precisely the rows the generation serves, and the read
    path (``ingest.read_rollup_tables``) refuses rollups whenever the
    generation is dirty (straggler carry-over or later appends) —
    staleness is therefore impossible, queries just fall back to raw
    until the next pass. Narrow layout (no name/labels; the dict joins
    at read), day-partitioned for the same pruning as samples."""
    with maintenance_lock(path, timeout_s=lock_timeout_s):
        _compact_locked(
            spark, path, gc_keep, gc_grace_s, rollup_ms, _after_rewrite
        )


def _compact_locked(spark, path, gc_keep, gc_grace_s, rollup_ms, _after_rewrite):
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
    for w in rollup_ms:
        # built from the generation's OWN compacted output (already
        # (series_id, t)-deduped above), so rollup content == served
        # content by construction; sorted like the samples for the
        # same row-group pruning
        from ..rollup import build_rollup_narrow

        (
            build_rollup_narrow(
                spark.read.parquet(new_s).select("series_id", "t", "v"),
                int(w),
            )
            .repartitionByRange(F.col("day"), F.col("series_id"))
            .sortWithinPartitions("series_id", "t")
            .write.mode("overwrite")
            .option("parquet.writer.version", "v2")
            .partitionBy("day")
            .parquet(os.path.join(gdir, f"rollup-{int(w)}"))
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
    # never created. CAS on the generation we resolved: under the
    # maintenance lock this cannot fire; on a lock-less store it turns
    # a silent lost-commit into a loud abort.
    try:
        commit_manifest(path, new_gen, expect_gen=src.gen)
    except Exception:
        shutil.rmtree(gdir, ignore_errors=True)  # discard loser's build
        raise
    gc_store(path, keep=gc_keep, grace_s=gc_grace_s)


def apply_retention(
    path: str,
    min_t_ms: int,
    gc_keep: int = 1,
    gc_grace_s: float | None = None,
    lock_timeout_s: float = 0.0,
) -> list[str]:
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
    Rollup tables are deliberately NOT carried into the new
    generation: a rollup window whose resolution doesn't divide a day
    can straddle the retention cutoff, leaving it inconsistent with
    the surviving samples — queries fall back to raw (exact) until
    the next ``compact_store`` rebuilds rollups from the pruned data.
    Runs under the cross-process ``maintenance_lock`` with a CAS
    commit, exactly like ``compact_store``.
    """
    with maintenance_lock(path, timeout_s=lock_timeout_s):
        return _retention_locked(path, min_t_ms, gc_keep, gc_grace_s)


def _retention_locked(path, min_t_ms, gc_keep, gc_grace_s):
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
    try:
        commit_manifest(path, new_gen, expect_gen=src.gen)
    except Exception:
        shutil.rmtree(gdir, ignore_errors=True)
        raise
    gc_store(path, keep=gc_keep, grace_s=gc_grace_s)
    return dropped
