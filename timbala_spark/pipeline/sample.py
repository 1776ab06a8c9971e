"""Corpus-curation operators: deterministic sampling, per-group caps,
and token-budget shard packing.

These are the selection/layout stages of a large-scale training-data
pipeline (the reference engine stops at query semantics; a 100 TB
corpus additionally needs reproducible subsetting before training):

* :func:`stratified_sample` — hash-gate sampling.  No RNG state, no
  shuffle: a row's fate is a pure function of ``(key, seed)``, so the
  sample is reproducible across runs, resumable mid-job, and stable
  under repartitioning — the properties `sample()`'s per-partition RNG
  does not give you.  Map-only at any scale.
* :func:`cap_per_group` — keep at most N rows per group (per-domain
  caps in web-corpus curation).  Small groups (the vast majority under
  a Zipfian domain distribution) bypass the sort entirely via a
  broadcast counts join; only heavy hitters pay the per-group
  row_number window.
* :func:`pack_greedy` — assign documents to fixed token-budget shards
  in a deterministic global order.  Implemented as a distributed
  prefix sum (range partition → partition-local window → O(partitions)
  offset join), NOT a single global window, so it scales past one task.

All operators are pure DataFrame expressions (no Python UDFs).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame, Window, functions as F

from .util import hash64_expr

#: Sampling-gate denominator: fractions resolve to an integer number of
#: hash buckets out of this many, so Spark and any SQL oracle compare
#: the same integers (no float-threshold edge cases).
SAMPLE_DENOM = 1_000_000


def sample_gate_expr(key, seed: int = 0, hash_algo: str = "xxhash64"):
    """The sampling gate: uniform bucket in ``[0, SAMPLE_DENOM)`` from a
    hash of ``key`` salted with ``seed``.  A row is kept when its gate
    is below ``fraction * SAMPLE_DENOM``; different seeds give
    independent samples of the same corpus.

    The ``md5`` variant gates on the top 32 hex-derived bits only —
    always non-negative, so a SQL oracle replays it without signed /
    unsigned 64-bit modulo mismatches (DuckDB:
    ``CAST('0x' || substr(md5(k), 1, 8) AS BIGINT) % SAMPLE_DENOM``).
    """
    salted = F.concat(key.cast("string"), F.lit(f"#s{seed}"))
    if hash_algo == "md5":
        bucket = F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("long")
    else:
        bucket = hash64_expr(salted, hash_algo)
    return F.pmod(bucket, F.lit(SAMPLE_DENOM))


def stratified_sample(
    df: DataFrame,
    fraction,
    key_col: str,
    strata_col: str | None = None,
    seed: int = 0,
    hash_algo: str = "xxhash64",
) -> DataFrame:
    """Deterministic (stratified) sample.

    ``fraction`` is either a float applied uniformly, or — with
    ``strata_col`` — a mapping ``{stratum: fraction}``; strata missing
    from the mapping are dropped (explicit is better than a silent
    default when deciding what enters a training mix).

    Scale: a single map-only filter; the gate is one hash per row and
    pushes through whole-stage codegen.  Because membership depends
    only on ``(key, seed)``, re-running over a grown corpus keeps every
    previously-sampled row (monotone sampling), which is what
    incremental corpus refreshes need.
    """
    gate = sample_gate_expr(F.col(key_col), seed, hash_algo)
    if isinstance(fraction, Mapping):
        if strata_col is None:
            raise ValueError("per-stratum fractions require strata_col")
        expr = F.lit(None).cast("long")
        for stratum, frac in sorted(fraction.items()):
            expr = F.when(
                F.col(strata_col) == stratum, F.lit(int(round(frac * SAMPLE_DENOM)))
            ).otherwise(expr)
        return df.filter(gate < expr)
    thr = int(round(float(fraction) * SAMPLE_DENOM))
    return df.filter(gate < F.lit(thr))


def cap_per_group(
    df: DataFrame,
    group_col: str,
    max_rows: int,
    order_col: str,
    optimize_small_groups: bool = True,
) -> DataFrame:
    """Keep at most ``max_rows`` rows per group, chosen by ascending
    ``order_col`` (deterministic — ties are impossible when order_col
    is a key; pass a key).

    Scale: the naive plan is one row_number window = a full shuffle +
    per-group sort of the corpus.  Under a Zipfian group distribution
    (web domains) almost every group is already under the cap, so with
    ``optimize_small_groups`` the operator first aggregates counts,
    broadcast-joins the over-cap group list, and runs the window ONLY
    over the over-cap slice; under-cap groups pass through scan→filter
    with no sort.  The counts aggregate is map-side-combined and tiny
    next to the data.  Results are identical either way (asserted in
    tests).
    """
    if max_rows < 1:
        raise ValueError("max_rows must be >= 1")
    w = Window.partitionBy(group_col).orderBy(F.col(order_col).asc())
    if not optimize_small_groups:
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= max_rows)
            .drop("__rn")
        )
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    over = counts.filter(F.col("__n") > max_rows).select(group_col)
    # Broadcast the over-cap list both ways: heavy hitters are few by
    # construction (each holds > max_rows rows of the corpus).
    big = df.join(F.broadcast(over), group_col, "left_semi")
    small = df.join(F.broadcast(over), group_col, "left_anti")
    capped = (
        big.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_rows)
        .drop("__rn")
    )
    return small.unionByName(capped)


def pack_greedy(
    df: DataFrame,
    budget: int,
    token_col: str,
    order_col: str,
    n_partitions: int | None = None,
) -> DataFrame:
    """Assign rows to fixed token-budget shards in ascending
    ``order_col`` order: shard ``i`` covers token offsets
    ``[i*budget, (i+1)*budget)``, each row is placed at its exclusive
    running-token offset.  A row may straddle a boundary (standard
    block packing for sequence-training shards: exact, deterministic,
    single pass).

    Adds ``shard_id`` (bigint) and ``token_offset`` (bigint, exclusive
    prefix sum of ``token_col``).

    Scale: a global ``ORDER BY`` window would serialize into ONE task.
    Instead: range-partition by ``order_col``, take each partition's
    token subtotal (one tiny O(partitions) aggregate), turn subtotals
    into per-partition offsets on the driver (bounded: one row per
    partition), broadcast-join the offsets back, and finish with a
    partition-LOCAL cumulative window.  Every stage is parallel; the
    only serial data is the O(partitions) offset table.
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    spark = df.sparkSession
    if n_partitions is None:
        n_partitions = spark.sparkContext.defaultParallelism
    from .util import tracked_persist

    # Persist the partition assignment: the subtotal aggregate and the
    # final pass must see the SAME row→partition mapping (range
    # boundaries come from a sampling pass; pinning the shuffled frame
    # guarantees both jobs read one materialization).  tracked_persist
    # bounds the block-manager lifetime to the live query (util.py).
    ranged = tracked_persist(
        df.repartitionByRange(n_partitions, F.col(order_col)).withColumn(
            "__pid", F.spark_partition_id()
        )
    )
    subtotals = (
        ranged.groupBy("__pid")
        .agg(F.sum(F.col(token_col).cast("long")).alias("__sub"))
        .orderBy("__pid")
        .collect()  # bounded: one row per partition
    )
    offsets, acc = [], 0
    for r in subtotals:
        offsets.append((r["__pid"], acc))
        acc += r["__sub"] or 0
    off_df = spark.createDataFrame(
        offsets or [(0, 0)], "__pid int, __off long"
    )
    local = Window.partitionBy("__pid").orderBy(F.col(order_col).asc())
    cum_excl = F.coalesce(
        F.sum(F.col(token_col).cast("long")).over(
            local.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    return (
        ranged.withColumn("__local_off", cum_excl)
        .join(F.broadcast(off_df), "__pid")
        .withColumn(
            "token_offset", (F.col("__off") + F.col("__local_off")).cast("long")
        )
        .withColumn(
            "shard_id", F.floor(F.col("token_offset") / F.lit(int(budget)))
        )
        .drop("__pid", "__local_off", "__off")
    )
