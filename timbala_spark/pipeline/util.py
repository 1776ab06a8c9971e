"""Shared pipeline utilities."""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

#: Logical-plan nodes that imply the frame is shuffle-derived and so
#: already arrives with shuffle-partition parallelism (analyzed-plan
#: node names; Deduplicate = dropDuplicates, RepartitionByExpression =
#: repartition(cols)/hint; the FlatMap*InPandas group-map nodes are
#: applyInPandas / cogroup-apply / applyInPandasWithState — all keyed,
#: so shuffle-derived; plain mapInPandas is narrow and excluded).
#: Two narrow lookalikes are excluded on their flags:
#: `Repartition n, false` is coalesce and `Sort [...], false` is
#: sortWithinPartitions — both can leave a frame at 1 partition, so
#: only their shuffling (true) forms count.  Every alternative is
#: anchored to the NODE position — line start after tree-drawing
#: chars (`+- `, `:- `, indentation) — so attribute/alias names
#: cannot collide (a column aliased `Join` or `Window` appears inside
#: a node's bracketed argument list mid-line, never at a node slot;
#: r9 ADVICE).
_WIDE_NODE = re.compile(
    r"^[\s:+-]*(?:"
    r"(?:Join|Aggregate|Window|Distinct|Deduplicate|"
    r"RepartitionByExpression|Intersect|Except|"
    r"FlatMapGroupsInPandas(?:WithState)?|FlatMapCoGroupsInPandas)\b"
    r"|Repartition \d+, true"
    r"|Sort \[[^\n]*\], true"
    r")",
    re.M,
)


def hash64_expr(c: Column, algo: str = "xxhash64") -> Column:
    """64-bit string hash used by the sketch operators (minhash,
    simhash, winnowing fingerprint).

    * ``"xxhash64"`` — the production default: one JVM intrinsic per
      value, the fastest 64-bit mix Spark ships.
    * ``"md5"`` — the top 64 bits of md5's hex digest, assembled from
      two 32-bit halves (conv → shiftleft|or, so no 64-bit parse
      overflow). ~5× slower than xxhash64 but md5 is bit-identical in
      DuckDB, which makes every sketch operator replayable by the
      driver's SQL oracle; the contract entries use this variant.

    Both are uniform 64-bit mixes, so sketch quality is identical.
    """
    if algo == "xxhash64":
        return F.xxhash64(c)
    if algo == "md5":
        hi = F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")
        lo = F.conv(F.substring(F.md5(c), 9, 8), 16, 10).cast("long")
        return F.shiftleft(hi, 32).bitwiseOR(lo)
    raise ValueError(f"unknown hash64 algo {algo!r}")

#: DataFrames persisted by pipeline operators, kept so a long session
#: running many pipeline queries does not leak block-manager memory.
_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame, release_previous: bool = True) -> DataFrame:
    """``persist()`` with lifecycle tracking.

    Sketch/signature stages feed several plan branches and must be
    persisted (PERF.md §7), but each contract query is consumed once —
    holding every query's blocks for the whole session piles up
    executor memory and GC pressure (measured: a warmed 1 s query
    degrading to 11 s after a dozen persist-leaking queries).
    ``tracked_persist`` releases the *previous* operators' blocks
    before pinning the new stage, bounding resident persisted data to
    the live query. Results already returned to callers stay correct —
    re-consuming one simply recomputes its lineage.

    ``release_previous=False`` chains a second persist within the SAME
    query (e.g. the normalized-vector frame AND the LSH signature frame
    both feed multiple branches); the pair is released together when the
    next query's first tracked_persist runs.
    """
    if release_previous:
        release_tracked()
    out = df.persist()
    _TRACKED.append(out)
    return out


def release_tracked() -> None:
    """Unpersist every tracked stage (non-blocking)."""
    while _TRACKED:
        try:
            _TRACKED.pop().unpersist(blocking=False)
        except Exception:
            pass  # session already stopped


#: Shared small-corpus gate threshold (see :func:`small_corpus`).
#: 64 MB of parquet is ~150-200 MB of raw text (~100-200k typical
#: documents) or ~100M+ 64-d vectors' worth of fixed costs dominating.
SMALL_CORPUS_INPUT_BYTES = 64 << 20


def estimated_input_bytes(df: DataFrame) -> int | None:
    """Metadata-only size estimate: the byte sum of the frame's leaf
    scan files.  No Spark job runs — ``inputFiles()`` is catalog
    metadata and local ``file:`` sizes come from ``os.stat``.  Returns
    ``None`` (= "unknown, assume big") for in-memory frames, remote
    filesystems (at 100 TB the scratch machinery should stay on, and a
    driver-side remote listing is not worth the RPCs), or any error.
    Join/agg-derived frames report their LEAF files — an upper bound
    on the derived frame's bytes, which is the conservative direction
    for a small-corpus gate."""
    import os
    from urllib.parse import unquote, urlparse

    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for f in files:
        u = urlparse(f)
        if u.scheme not in ("file", ""):
            return None
        try:
            total += os.path.getsize(unquote(u.path))
        except OSError:
            return None
    return total


def small_corpus(df: DataFrame) -> bool:
    """The small-corpus gate shared by the pipeline operators (n-gram
    stop-shingles, embedding stop-buckets, MinHash signature arm,
    pack_greedy fast path, similarity kernels): ``True`` when the
    frame's leaf-scan bytes fit under :data:`SMALL_CORPUS_INPUT_BYTES`.
    Env override ``TIMBALA_SMALL_CORPUS_BYTES`` (r12; the historical
    ``TIMBALA_NGRAM_SMALL_CORPUS_BYTES`` name is honored as a
    fallback); 0 disables, i.e. never small.  Metadata-only (no job),
    fails CLOSED: unknown size ⇒ big ⇒ full machinery.  Gates
    PURE-ACTION work (fired-cap REPORT counts) and result-identical
    PLAN-SHAPE choices — never anything that changes results."""
    import os

    raw = os.environ.get("TIMBALA_SMALL_CORPUS_BYTES")
    if raw is None:
        raw = os.environ.get(
            "TIMBALA_NGRAM_SMALL_CORPUS_BYTES", SMALL_CORPUS_INPUT_BYTES
        )
    cut = int(raw)
    if cut <= 0:
        return False
    est = estimated_input_bytes(df)
    return est is not None and est <= cut


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
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * min_factor
    # Partition count WITHOUT Dataset.rdd on shuffle-derived frames:
    # under AQE, Dataset.rdd finalizes the adaptive plan, which
    # EXECUTES every upstream exchange eagerly — measured as a full
    # extra text-wide shuffle per operator call in the 20M composition
    # (PERF §20c take 8). Three metadata-safe cases:
    #
    # 1. A plan with a wide node (join/agg/window/repartition/sort):
    #    AQE may coalesce its output to a few partitions when small,
    #    so the repartition is still needed — gated on the LEAF file
    #    count as a metadata-only scale proxy (see branch below).
    # 2. A narrow plan over a file relation: inputFiles() is the split
    #    count, metadata-only.
    # 3. A narrow plan over an in-memory relation (createDataFrame /
    #    range): inputFiles() is [] — but with no exchange anywhere in
    #    the plan, rdd.getNumPartitions() plans without executing
    #    anything, so the partition count itself is safe to read.
    try:
        tree = df._jdf.queryExecution().analyzed().treeString()
    except Exception:
        return df
    if _WIDE_NODE.search(tree):
        # Shuffle-derived frames do NOT reliably arrive with
        # shuffle-partition parallelism: AQE coalesces a small
        # shuffle output down to a handful of partitions, so a
        # CPU-heavy map stage on top (shingling survivors after the
        # digest join) serializes anyway — measured as dedup_pipeline
        # 4.1 → 9.2 s at sf0.1 when r9 briefly removed this branch on
        # the assumption the repartition was unneeded.  The LEAF file
        # count is the metadata-only scale proxy that keeps this
        # scale-safe: few leaf files ⇒ small frame ⇒ the restoring
        # shuffle is cheap; a scan-scale frame has many leaf files and
        # skips it (the 20M-doc composition never pays a text-wide
        # repartition here).
        try:
            n_files = len(df.inputFiles())
        except Exception:
            return df
        if 0 < n_files < target:
            return df.repartition(target)
        return df
    try:
        n_files = len(df.inputFiles())
        n = n_files if n_files > 0 else df.rdd.getNumPartitions()
    except Exception:
        return df
    if 0 < n < target:
        return df.repartition(target)
    return df
