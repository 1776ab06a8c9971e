"""Store maintenance: compaction and retention for the split layout.

The reference runs a leveled compactor that merges head/small blocks
into larger time-range blocks (``tsdb/compact.go:128-167`` plan,
``:308`` Compact; timbala uses 2h/10h/50h ranges,
``cmd/timbala/main.go:153``) and enforces retention by deleting whole
expired blocks (``tsdb/db.go:47-49``; timbala sets it to infinite,
``cmd/timbala/main.go:152``).

Spark-first equivalents over the split parquet store written by
``timbala_spark.streaming.ingest``:

* ``compact_store`` — streaming micro-batches append one small file
  set per batch; compaction rewrites each day partition as few large
  files, re-sorted by ``(series_id, t)`` (restoring RLE/delta
  encoding efficiency), merge-dedups samples that were re-sent across
  batches, and collapses the series dictionary to one row per series.
  On a production lakehouse this job is Delta/Iceberg ``OPTIMIZE``;
  the logic here is the plain-parquet version with a write-new-then-
  swap directory commit.
* ``apply_retention`` — drops whole expired day partitions, a
  metadata-only delete exactly like the reference dropping expired
  blocks (no row-level rewrite). Tombstone-style row deletes are NOT
  implemented by design: the reference's delete-series API is
  disabled (panics, ``internal/api/v1/api.go:279-371``).

Both operate on local/DBFS-style paths via ``os``/``shutil``; on an
object store the swap step becomes a manifest/table-format commit.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession, functions as F

from ..model import utc_day_expr


def compact_store(spark: SparkSession, path: str) -> None:
    """Rewrite the split store with large sorted files and a deduped
    series dictionary. Safe to run between (not during) ingest batches.

    Scale notes: ``repartitionByRange(day, series_id)`` keeps each
    output task inside one day (so ``partitionBy`` emits one file per
    task) while splitting big days across many tasks by series range —
    no single-task-per-day skew. Samples duplicated by cross-batch
    re-sends collapse via the same ``(series_id, t)`` rule as ingest
    replica dedup.
    """
    sp, dp = f"{path}/samples", f"{path}/series"
    tmp_s, tmp_d = f"{path}/.compact_samples", f"{path}/.compact_series"
    (
        spark.read.parquet(sp)
        .dropDuplicates(["series_id", "t"])
        .withColumn("day", utc_day_expr(F.col("t")))
        .repartitionByRange(F.col("day"), F.col("series_id"))
        .sortWithinPartitions("series_id", "t")
        .write.mode("overwrite")
        .option("parquet.writer.version", "v2")
        .partitionBy("day")
        .parquet(tmp_s)
    )
    (
        spark.read.parquet(dp)
        .dropDuplicates(["series_id"])
        .write.mode("overwrite")
        .parquet(tmp_d)
    )
    shutil.rmtree(sp)
    os.rename(tmp_s, sp)
    shutil.rmtree(dp)
    os.rename(tmp_d, dp)
    # the collapse above removed every cross-batch duplicate — reads
    # may skip the replica-dedup exchange until the next write
    try:
        os.remove(os.path.join(path, "_dirty"))
    except FileNotFoundError:
        pass


def apply_retention(path: str, min_t_ms: int) -> list[str]:
    """Drop day partitions strictly older than ``min_t_ms``.

    Whole-partition deletes only — a day straddling the cutoff is
    kept in full (the reference likewise deletes whole expired blocks,
    ``tsdb/db.go``). Returns the dropped partition names. The series
    dictionary is left as-is; a following ``compact_store`` plus an
    anti-join against live series_ids could shrink it, but a stale
    dict entry is harmless (never matched by the samples join).
    """
    # day partition format is yyyyMMdd in UTC
    import datetime

    cutoff = datetime.datetime.fromtimestamp(
        min_t_ms / 1000, tz=datetime.timezone.utc
    ).strftime("%Y%m%d")
    dropped = []
    sp = f"{path}/samples"
    for entry in sorted(os.listdir(sp)):
        if not entry.startswith("day="):
            continue
        if entry.split("=", 1)[1] < cutoff:
            shutil.rmtree(os.path.join(sp, entry))
            dropped.append(entry)
    return dropped
