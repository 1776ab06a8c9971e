"""Shared pipeline utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Repartition up to the cluster's default parallelism when the
    input arrives in fewer partitions.

    Small dimension tables often come as a single parquet file → a
    single partition → CPU-heavy per-row stages (shingling, minhash,
    simhash, vector math) run serially no matter how many cores exist.
    One cheap round-robin shuffle before the heavy map stage fixes
    that; inputs that already have enough splits are left untouched
    (no-op at 100 TB where scans produce thousands of splits).
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
