"""End-to-end near-duplicate curation: the composition a training-data
pipeline actually runs.

PERF.md §6d measured why the ORDER is mandatory at scale: identical
copies collide in every LSH bucket, so sketch-based near-dup cost
grows quadratically in duplicate-cluster size. Removing exact
duplicates first (constant-size digest shuffle) caps every
downstream posting list / bucket at the distinct-document level.

Stages (all existing operators, one lineage):

1. exact dedup — sha256 digest groupBy, representative = min id;
2. near-dup pairs among the distinct survivors (n-gram Jaccard by
   default — any ``*_pairs`` operator fits);
3. connected components over the pair graph (min-label propagation);
4. canonical assignment for EVERY input row: ``canonical_id`` =
   component of the row's exact-representative; ``is_canonical`` = 1
   for exactly one row per final cluster.

A downstream keep-one-per-cluster filter is then
``filter(is_canonical = 1)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import connected_components, ngram_jaccard_pairs


def near_dup_pipeline(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    n: int = 7,
) -> DataFrame:
    """Returns one row per input row: (``id_col``, canonical_id,
    is_canonical ∈ {0,1})."""
    dig = docs.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_text")
    ).withColumn("_digest", F.sha2(F.col("_text"), 256))
    reps = dig.groupBy("_digest").agg(F.min("_id").alias("_rep"))
    # doc → exact representative (digest join: 32-byte key, never text)
    mapping = dig.join(reps, "_digest").select("_id", "_rep")
    survivors = (
        dig.join(reps, "_digest")
        .filter(F.col("_id") == F.col("_rep"))
        .select(F.col("_id").alias(id_col), F.col("_text").alias(text_col))
    )
    pairs = ngram_jaccard_pairs(
        survivors, id_col=id_col, text_col=text_col, threshold=threshold, n=n
    )
    comp = connected_components(
        survivors.select(id_col), pairs, node_col=id_col
    )
    return (
        mapping.join(comp, mapping["_rep"] == comp[id_col])
        .select(
            F.col("_id").alias(id_col),
            F.col("component").alias("canonical_id"),
            (F.col("_id") == F.col("component")).cast("long").alias("is_canonical"),
        )
    )
