"""Structured Streaming ingest: the remote-write path as micro-batches.

Reference flow (``internal/write/write.go:53-170``): POST /write →
decode → shard/replicate → WAL → head.  Spark-first equivalent
(SURVEY.md §2.8): a streaming source of remote-write-shaped rows →
``foreachBatch`` → dedup on (series_id, t) → append to a day-partitioned
parquet/Delta table.  Durability & replication are the storage layer's
job (checkpointing gives exactly-once per micro-batch); day partitions
mirror the reference's ``xxhash(day)+xxhash(labels)`` partition key
(``internal/cluster/cluster.go:103-106``) and give readers partition
pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..model import dedup_replicas, prepare_samples

#: JSON shape accepted on the wire — one row per (series, sample):
#: {"labels": {...}, "t": epoch_ms, "v": value}
WIRE_SCHEMA = "labels map<string,string>, t long, v double"


def parse_wire_batch(df: DataFrame) -> DataFrame:
    """Raw JSON strings (column `value`) → canonical samples."""
    parsed = df.select(
        F.from_json(F.col("value").cast("string"), WIRE_SCHEMA).alias("r")
    ).select("r.labels", "r.t", "r.v")
    return prepare_samples(parsed)


def start_ingest(
    source: DataFrame,
    path: str,
    checkpoint: str,
    parse: bool = True,
):
    """Start a streaming ingest job writing day-partitioned parquet.

    ``source`` is any streaming DataFrame: either raw JSON lines (with a
    `value` column, parse=True) or already-shaped (labels, t, v) rows.
    Returns the StreamingQuery.
    """

    def write_batch(batch: DataFrame, epoch_id: int) -> None:
        samples = parse_wire_batch(batch) if parse else prepare_samples(batch)
        out = dedup_replicas(samples).withColumn(
            "day", F.date_format(F.timestamp_millis(F.col("t")), "yyyyMMdd")
        )
        out.write.mode("append").partitionBy("day").parquet(path)

    return (
        source.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def read_samples_table(spark: SparkSession, path: str) -> DataFrame:
    """Read an ingested table back in canonical shape (partition column
    dropped; day pruning still applies to `t` filters via parquet
    row-group stats on t)."""
    return spark.read.parquet(path).select("name", "labels", "series_id", "t", "v")


def synthetic_rate_source(spark: SparkSession, rows_per_second: int = 100):
    """A demo streaming source shaped like remote-write: the built-in
    rate source mapped to (labels, t, v) rows."""
    rate = spark.readStream.format("rate").option(
        "rowsPerSecond", rows_per_second
    ).load()
    return rate.select(
        F.create_map(
            F.lit("__name__"),
            F.lit("synthetic_metric"),
            F.lit("shard"),
            (F.col("value") % 8).cast("string"),
        ).alias("labels"),
        F.expr("unix_micros(timestamp) div 1000").alias("t"),
        F.col("value").cast("double").alias("v"),
    )
