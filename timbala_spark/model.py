"""Canonical data model for the PySpark-native time-series engine.

The single data abstraction mirrored from the reference is the labeled
time series: a sorted set of string label pairs identifying a stream of
``(timestamp int64-ms, value float64)`` samples (reference:
``docs/glossary.md:11-23``, ``vendor/.../promql/value.go:92-96``).

Canonical long-format schema (see FIXTURES.md §0)::

    samples(
        name      string               -- metric name (== labels['__name__'])
        labels    map<string,string>   -- full label set INCLUDING __name__
        series_id long                 -- xxhash64 of the canonical label string
        t         long                 -- sample time, Unix epoch milliseconds
        v         double               -- sample value; NaN/±Inf legal
    )

The metric name is not special-cased: it is the reserved label
``__name__`` (reference ``pkg/labels/labels.go:19-29``).  Series
identity is a hash of the sorted label set (``labels.go:85-97``); we use
Spark's built-in ``xxhash64`` over a canonical serialization so the id
is computable JVM-side with no Python round-trip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

METRIC_NAME_LABEL = "__name__"
BUCKET_LABEL = "le"

# Field/record separators for canonical label serialization. These bytes
# cannot appear in valid label names and are vanishingly unlikely in
# values (the reference hashes name/value byte streams with a 0xff
# separator for the same reason, labels.go:85-97).
SEP_KV = "\x1f"
SEP_PAIR = "\x1e"

SAMPLES_SCHEMA = StructType(
    [
        StructField("name", StringType()),
        StructField("labels", MapType(StringType(), StringType())),
        StructField("series_id", LongType()),
        StructField("t", LongType()),
        StructField("v", DoubleType()),
    ]
)

#: Default staleness lookback, ms (reference ``promql/engine.go:1469-1471``).
DEFAULT_LOOKBACK_MS = 5 * 60 * 1000


def label_get(labels: Column, key: str | Column) -> Column:
    """Null-safe label lookup (ANSI-mode `map[key]` raises on a missing
    key; PromQL treats a missing label as the empty string upstream)."""
    k = F.lit(key) if isinstance(key, str) else key
    return F.try_element_at(labels, k)


def canonical_labels_expr(labels: Column) -> Column:
    """Deterministic string serialization of a label map.

    Entries sorted by key; ``k<US>v`` joined with ``<RS>``. Used both for
    ``series_id`` hashing and for join/grouping signatures.
    """
    # sort_array (native SortArray, codegen) over the entry structs —
    # identical ordering to array_sort's default comparator for unique
    # keys, without the interpreted lambda comparator (measured ~20%
    # faster on 5M 2-label rows)
    entries = F.sort_array(F.map_entries(labels))
    return F.array_join(
        F.transform(entries, lambda e: F.concat(e.key, F.lit(SEP_KV), e.value)),
        SEP_PAIR,
    )


#: label names embeddable in SQL text without quoting games — the
#: PromQL grammar's identifier shape (anything else falls back to the
#: Column builders)
_SQL_SAFE_LABEL = __import__("re").compile(r"^[a-zA-Z_][a-zA-Z0-9_]*$")


def restrict_labels_sql(
    labels_sql: str,
    keep: list[str] | None = None,
    drop: list[str] | tuple[str, ...] = (),
    drop_name: bool = False,
) -> str | None:
    """SQL-text twin of :func:`restrict_labels_expr` (same ``map_filter``
    over an ``IN`` check), for batched ``selectExpr`` plan construction
    — driver-side planning is py4j-round-trip-bound (PERF §13).
    Returns ``None`` when a label name is not a plain identifier (the
    caller then uses the Column builder, which needs no quoting)."""
    if keep is not None:
        keep_list = sorted(set(keep))
        if not keep_list:
            return "map()"
        if not all(_SQL_SAFE_LABEL.match(k) for k in keep_list):
            return None
        ks = ", ".join(f"'{k}'" for k in keep_list)
        return f"map_filter({labels_sql}, (k, v) -> k IN ({ks}))"
    excl = set(drop)
    if drop_name:
        excl.add(METRIC_NAME_LABEL)
    if not excl:
        return labels_sql
    excl_list = sorted(excl)
    if not all(_SQL_SAFE_LABEL.match(k) for k in excl_list):
        return None
    ks = ", ".join(f"'{k}'" for k in excl_list)
    return f"map_filter({labels_sql}, (k, v) -> NOT (k IN ({ks})))"


def signature_sql(
    labels_sql: str,
    on: list[str] | None = None,
    ignoring: list[str] | tuple[str, ...] = (),
    drop_name: bool = True,
) -> str | None:
    """SQL-text twin of :func:`signature_expr` (PERF §13). Returns
    ``None`` when a label name is not a plain identifier."""
    if on is not None:
        if not on:
            return "''"
        keys = sorted(set(on))
        if not all(_SQL_SAFE_LABEL.match(k) for k in keys):
            return None
        parts = [
            f"concat('{k}\\u001F', "
            f"coalesce(try_element_at({labels_sql}, '{k}'), ''))"
            for k in keys
        ]
        return "concat_ws('\\u001E', " + ", ".join(parts) + ")"
    filtered = restrict_labels_sql(
        labels_sql, drop=list(ignoring), drop_name=drop_name
    )
    if filtered is None:
        return None
    return canonical_labels_sql(filtered)


def canonical_labels_sql(map_sql: str) -> str:
    """SQL-text twin of :func:`canonical_labels_expr` (identical tree:
    sort_array over map_entries, ``k<US>v`` joined with ``<RS>``)."""
    return (
        f"array_join(transform(sort_array(map_entries({map_sql})), "
        "e -> concat(e.key, '\\u001F', e.value)), '\\u001E')"
    )


def series_id_expr(labels: Column) -> Column:
    """64-bit series identity: xxhash64 of the canonical label string.

    Mirrors the role of ``labels.Hash()`` (``pkg/labels/labels.go:85-97``)
    without promising the same bit values (identity is internal). Like
    the reference's 64-bit hash, collisions are accepted rather than
    chased with full-label compares: at its 40M-active-series target
    the birthday bound is ~4e-5 expected collisions; a collision would
    merge two series under one id, same as there.
    """
    return F.xxhash64(canonical_labels_expr(labels))


def signature_expr(
    labels: Column,
    on: list[str] | None = None,
    ignoring: list[str] | tuple[str, ...] = (),
    drop_name: bool = True,
) -> Column:
    """Grouping/join signature over a subset of a label map.

    * ``on`` given: signature over exactly those labels; a missing label
      is equivalent to the empty string (PromQL semantics).
    * otherwise: signature over all labels minus ``ignoring`` (and minus
      ``__name__`` when ``drop_name``), mirroring ``signatureFunc``
      (reference ``promql/engine.go:1084-1094``).
    """
    if on is not None:
        if not on:
            return F.lit("")
        parts = [
            F.concat(F.lit(k + SEP_KV), F.coalesce(label_get(labels, k), F.lit("")))
            for k in sorted(set(on))
        ]
        return F.concat_ws(SEP_PAIR, *parts)
    excl = set(ignoring)
    if drop_name:
        excl.add(METRIC_NAME_LABEL)
    filtered = labels
    if excl:
        excl_list = sorted(excl)
        filtered = F.map_filter(labels, lambda k, _v: ~k.isin(excl_list))
    return canonical_labels_expr(filtered)


def restrict_labels_expr(
    labels: Column,
    keep: list[str] | None = None,
    drop: list[str] | tuple[str, ...] = (),
    drop_name: bool = False,
) -> Column:
    """Project a label map: keep only ``keep`` (if given) else drop
    ``drop`` (+ ``__name__`` when ``drop_name``)."""
    if keep is not None:
        keep_list = sorted(set(keep))
        if not keep_list:
            return F.create_map()
        return F.map_filter(labels, lambda k, _v: k.isin(keep_list))
    excl = set(drop)
    if drop_name:
        excl.add(METRIC_NAME_LABEL)
    if not excl:
        return labels
    excl_list = sorted(excl)
    return F.map_filter(labels, lambda k, _v: ~k.isin(excl_list))


def prepare_samples(df: DataFrame) -> DataFrame:
    """Normalize a raw DataFrame into the canonical samples schema.

    Accepts any df with at least (labels, t, v); computes ``name`` and
    ``series_id`` if missing. ``t`` may be a timestamp (converted to
    epoch ms) or integral epoch-ms.
    """
    cols = dict(df.dtypes)
    if cols.get("t", "").startswith("timestamp_ntz"):
        # naive timestamps are UTC by convention; pure wall-clock
        # arithmetic against an NTZ epoch literal — a cast to TIMESTAMP
        # would re-interpret the naive value in the session timezone
        # and shift non-UTC sessions by the tz offset
        df = df.withColumn(
            "t",
            F.expr(
                "timestampdiff(MICROSECOND,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00', t) div 1000"
            ),
        )
    elif cols.get("t", "").startswith("timestamp"):
        df = df.withColumn("t", F.expr("unix_micros(t) div 1000"))
    else:
        df = df.withColumn("t", F.col("t").cast("long"))
    if "name" not in cols:
        df = df.withColumn("name", label_get(F.col("labels"), METRIC_NAME_LABEL))
    if "series_id" not in cols:
        df = df.withColumn("series_id", series_id_expr(F.col("labels")))
    return df.select(
        "name", "labels", "series_id", "t", F.col("v").cast("double").alias("v")
    )


def utc_day_expr(t_col: Column) -> Column:
    """``yyyyMMdd`` UTC day of an epoch-ms column, timezone-independent.

    Pure integer epoch-day arithmetic (``floor(t / 86400000)`` formatted
    through DateType, which carries no timezone): written ``day``
    partitions always agree with the UTC-based pruning in
    ``compiler._base_scan`` and ``streaming.compact.apply_retention``
    regardless of ``spark.sql.session.timeZone``.  Mirrors the
    reference's day component of the partition key
    (``internal/cluster/cluster.go:103-106``).
    """
    epoch_day = F.floor(t_col.cast("long") / F.lit(86400000)).cast("int")
    return F.date_format(
        F.date_add(F.to_date(F.lit("1970-01-01")), epoch_day), "yyyyMMdd"
    )


def dedup_replicas(df: DataFrame) -> DataFrame:
    """Collapse replicated samples: keep one row per ``(series_id, t)``.

    The reference merges replicas with a k-way heap and leaves duplicate
    timestamps uncollapsed (TODO at ``internal/fanout/fanout.go:428``);
    we do collapse them, which is the documented intent.
    """
    return df.dropDuplicates(["series_id", "t"])
