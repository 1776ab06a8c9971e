"""Remote-write-shaped ingest (batch half).

The reference accepts Prometheus remote-write: snappy protobuf
``WriteRequest{[]TimeSeries{labels, samples}}`` at ``POST /write``
(``internal/write/write.go:53-170``).  We accept the same *shape* as
plain Python/JSON rows — ``{"labels": {...}, "samples": [[t_ms, v],
...]}`` — and land it in the canonical samples layout.  The streaming
half (micro-batch appends) lives in ``timbala_spark.streaming``.

Sharding/replication parity: the reference jump-hashes each sample to
RF=3 nodes (``internal/cluster/cluster.go:67-106``).  On Spark, storage
replication is delegated to the filesystem; load-spreading is
``repartition(series_id)``, which serves the same role as the jump hash
(SURVEY.md §1.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..model import dedup_replicas, prepare_samples, utc_day_expr


def remote_write_batch_to_samples(
    spark: SparkSession, series: list[dict]
) -> DataFrame:
    """``series``: [{"labels": {name: value}, "samples": [[t_ms, v], ...]}]
    → canonical samples DataFrame (deduped on (series_id, t))."""
    rows = []
    for s in series:
        labels = dict(s["labels"])
        for t, v in s["samples"]:
            rows.append((labels, int(t), float(v)))
    df = spark.createDataFrame(
        rows, "labels map<string,string>, t long, v double"
    )
    return dedup_replicas(prepare_samples(df))


def append_to_table(samples: DataFrame, path: str, partition_by_day: bool = True):
    """Append samples to a parquet table partitioned by day.

    Day partitioning mirrors the reference's partition key
    ``xxhash(day) + xxhash(labels)`` (``cluster.go:103-106``) and gives
    time-range queries partition pruning for free.
    """
    from pyspark.sql import functions as F

    out = samples.withColumn("day", utc_day_expr(F.col("t")))
    writer = out.write.mode("append")
    if partition_by_day:
        writer = writer.partitionBy("day")
    writer.parquet(path)
