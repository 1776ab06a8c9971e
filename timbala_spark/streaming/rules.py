"""Recording rules: periodically evaluate PromQL and append the result
as new series.

The reference defines the AST statement types (``promql/ast.go:54-84``)
but never wires a rule engine (SURVEY.md §2.8); this is the natural
Spark extension: each evaluation interval, run the rule's expression at
the current watermark and append ``record``-named samples back to the
store. Batch-incremental by design — every run is one bounded engine
evaluation, so it scales exactly like any other query.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..engine import Engine
from ..model import METRIC_NAME_LABEL, prepare_samples


@dataclass
class RecordingRule:
    """`record: <name>  expr: <promql>` with optional extra labels
    (the shape of the reference's RecordStmt, promql/ast.go:74-84)."""

    record: str
    expr: str
    labels: dict[str, str] = field(default_factory=dict)


def evaluate_rule(
    engine: Engine, rule: RecordingRule, ts: float
) -> DataFrame:
    """One rule evaluation at `ts` → canonical samples rows named
    `rule.record` (metric name replaced, extra labels applied)."""
    out = engine.query(rule.expr, ts)
    labels = F.map_filter(
        F.col("labels"), lambda k, _v: k != METRIC_NAME_LABEL
    )

    def drop_key(key):
        # closure factory: a default-arg lambda would have 3 params and
        # be misread as a (key, value, index) HOF lambda
        return lambda kk, _v: kk != key

    pairs = [F.lit(METRIC_NAME_LABEL), F.lit(rule.record)]
    for k, v in sorted(rule.labels.items()):
        labels = F.map_filter(labels, drop_key(k))
        pairs.extend([F.lit(k), F.lit(v)])
    labels = F.map_concat(labels, F.create_map(*pairs))
    return prepare_samples(
        out.select(labels.alias("labels"), F.col("t"), F.col("v"))
    )


def run_rules_once(
    engine: Engine, rules: list[RecordingRule], ts: float
) -> DataFrame:
    """Evaluate a rule group at one timestamp → unioned samples frame
    (the per-interval body of a rule-evaluation loop)."""
    parts = [evaluate_rule(engine, r, ts) for r in rules]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def append_rule_results(
    engine: Engine,
    rules: list[RecordingRule],
    ts: float,
    path: str,
) -> None:
    """Evaluate and append to a day-partitioned samples table —
    composes with streaming ingest's layout."""
    out = run_rules_once(engine, rules, ts).withColumn(
        "day", F.date_format(F.timestamp_millis(F.col("t")), "yyyyMMdd")
    )
    out.write.mode("append").partitionBy("day").parquet(path)
