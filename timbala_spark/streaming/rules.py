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


#: active-since persistence series: value = ActiveAt in epoch seconds,
#: one sample per active alert set per evaluation — the upstream
#: Prometheus convention for restoring FOR clocks across restarts
FOR_STATE_METRIC = "ALERTS_FOR_STATE"


def _for_state_frame(
    spark: SparkSession, alert_states: dict[str, dict], ts_ms: int
) -> DataFrame | None:
    """Serialize the live active-since maps as ALERTS_FOR_STATE
    samples at ``ts_ms`` (None when no alert is active)."""
    rows = []
    for st in alert_states.values():
        for key, since in st.items():
            labels = {k: v for k, v in key}
            labels[METRIC_NAME_LABEL] = FOR_STATE_METRIC
            rows.append((labels, ts_ms, since / 1000.0))
    if not rows:
        return None
    return prepare_samples(
        spark.createDataFrame(
            rows, "labels map<string,string>, t long, v double"
        )
    )


def restore_alert_states(
    spark: SparkSession,
    store_path: str,
    rules: list,
    as_of: float | None = None,
    outage_tolerance_s: float = 3600.0,
) -> dict[str, dict]:
    """Rebuild per-rule active-since maps from the store's latest
    ALERTS_FOR_STATE samples, so FOR clocks survive a runner restart
    (upstream's for-outage-tolerance restore: state older than the
    tolerance is considered a real outage and starts fresh). Bounded
    collect: one row per persisted active alert set."""
    import os
    import time as _time

    from .store import resolve_store

    st = resolve_store(store_path)
    if not (os.path.isdir(st.samples) or os.path.isdir(store_path)):
        return {}
    from .ingest import read_samples_table

    try:
        df = read_samples_table(spark, store_path)
    except Exception:  # empty/uninitialized store: nothing to restore
        return {}
    rows = (
        df.filter(F.col("name") == FOR_STATE_METRIC)
        .groupBy("series_id")
        .agg(F.max_by(F.struct("t", "v", "labels"), "t").alias("s"))
        .select("s.t", "s.v", "s.labels")
        .collect()
    )
    as_of = _time.time() if as_of is None else as_of
    names = {r.name for r in rules if isinstance(r, AlertingRule)}
    states: dict[str, dict] = {}
    for r in rows:
        if r["t"] < (as_of - outage_tolerance_s) * 1000:
            continue  # outage longer than tolerated: start fresh
        labels = dict(r["labels"])
        rule_name = labels.get("alertname")
        if rule_name not in names:
            continue
        labels[METRIC_NAME_LABEL] = "ALERTS"
        key = tuple(sorted(labels.items()))
        states.setdefault(rule_name, {})[key] = int(round(r["v"] * 1000))
    return states


def run_rules_once(
    engine: Engine,
    rules: list,
    ts: float,
    alert_states: dict[str, dict] | None = None,
) -> DataFrame:
    """Evaluate a rule group (recording AND alerting rules) at one
    timestamp → unioned samples frame (the per-interval body of a
    rule-evaluation loop). ``alert_states`` maps rule name → that
    rule's active-since map; the stream runner owns it so FOR clocks
    survive across ticks."""
    parts = []
    for r in rules:
        if isinstance(r, AlertingRule):
            st = (
                alert_states.setdefault(r.name, {})
                if alert_states is not None
                else None
            )
            parts.append(evaluate_alert(engine, r, ts, active_at=st))
        else:
            parts.append(evaluate_rule(engine, r, ts))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def append_rule_results(
    engine: Engine,
    rules: list,
    ts: float,
    path: str,
    alert_states: dict[str, dict] | None = None,
    layout: str = "row",
) -> None:
    """Evaluate and append to the store. ``layout="row"`` appends a
    day-partitioned samples table; ``layout="split"`` routes through
    ``ingest.write_samples_batch`` so rule results land in the SPLIT
    store's current generation exactly like remote writes (the
    server's store). When ``alert_states`` is carried (the stream
    runner / server loop), the live active-since maps are also
    persisted as ALERTS_FOR_STATE samples so FOR clocks survive a
    runner restart (see :func:`restore_alert_states`)."""
    out = run_rules_once(engine, rules, ts, alert_states)
    if alert_states:
        fs = _for_state_frame(
            engine.spark, alert_states, int(round(ts * 1000))
        )
        if fs is not None:
            out = out.unionByName(fs)
    if layout == "split":
        from .ingest import write_samples_batch

        write_samples_batch(out, path)
        return
    out = out.withColumn(
        "day", F.date_format(F.timestamp_millis(F.col("t")), "yyyyMMdd")
    )
    out.write.mode("append").partitionBy("day").parquet(path)


def start_rule_stream(
    ticks: DataFrame,
    engine: Engine,
    rules: list,
    store_path: str,
    checkpoint: str,
    restore: bool = False,
):
    """Continuous rule evaluation as a Structured Streaming query.

    ``ticks`` is a streaming frame with a ``ts`` column (epoch ms) —
    the rule group's evaluation clock. In production that's a rate
    source at the group interval; in tests a file source feeds
    deterministic tick timestamps. Each micro-batch evaluates the
    group once per distinct tick and appends the recorded series to
    the day-partitioned store, so recording rules run with the same
    exactly-once-per-micro-batch semantics as ingest. The per-batch
    collect() is bounded by the tick count (a handful per trigger —
    the clock, not the data).

    ``restore=True`` seeds the alerting FOR clocks from the store's
    latest ALERTS_FOR_STATE samples (within the default outage
    tolerance), so a restarted runner does not re-run every FOR
    duration from zero."""

    # FOR clocks live across ticks (and restarts, when restored)
    alert_states: dict[str, dict] = (
        restore_alert_states(engine.spark, store_path, rules)
        if restore
        else {}
    )

    def _batch(df: DataFrame, _epoch: int) -> None:
        # ticks evaluate in ascending order so the pending→firing
        # state machine sees time move forward within a batch
        for row in sorted(
            df.select("ts").distinct().collect(), key=lambda r: r["ts"]
        ):
            append_rule_results(
                engine, rules, row["ts"] / 1000.0, store_path, alert_states
            )

    return (
        ticks.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )


@dataclass
class AlertingRule:
    """``ALERT name IF expr [FOR d] [LABELS {..}] [ANNOTATIONS {..}]``
    (the reference's AlertStmt, promql/ast.go:54-66). Evaluation emits
    the Prometheus ``ALERTS{alertname=...}``-shaped series: one sample
    per firing label set, value 1."""

    name: str
    expr: str
    duration_ms: int = 0
    labels: dict[str, str] = field(default_factory=dict)
    annotations: dict[str, str] = field(default_factory=dict)


def parse_rule_file(src: str) -> list[RecordingRule | AlertingRule]:
    """Parse the reference's rule-file grammar (``parse.go:354-439``)
    into evaluatable rule objects. Expressions are round-tripped
    through the printer so a rule's `expr` is always a plain PromQL
    string."""
    from ..promql.ast import AlertStmt, RecordStmt
    from ..promql.parser import parse_rules
    from ..promql.printer import to_promql

    out: list[RecordingRule | AlertingRule] = []
    for s in parse_rules(src):
        if isinstance(s, RecordStmt):
            out.append(
                RecordingRule(
                    record=s.name, expr=to_promql(s.expr), labels=s.labels
                )
            )
        else:
            assert isinstance(s, AlertStmt)
            out.append(
                AlertingRule(
                    name=s.name,
                    expr=to_promql(s.expr),
                    duration_ms=s.duration_ms,
                    labels=s.labels,
                    annotations=s.annotations,
                )
            )
    return out


def evaluate_alert(
    engine: Engine,
    rule: AlertingRule,
    ts: float,
    active_at: dict | None = None,
) -> DataFrame:
    """One alert evaluation at ``ts`` with the upstream pending →
    firing state machine. Label sets where the expression returns
    samples are ACTIVE; an active set is ``firing`` once it has been
    continuously active for the rule's FOR duration (immediately when
    FOR is absent) and ``pending`` before that. Emits the Prometheus
    ``ALERTS{alertname=..., alertstate=...}`` convention: one sample
    per active set, value 1.

    ``active_at`` is the caller-owned active-since map, keyed by the
    alert's output label set — the in-memory ActiveAt bookkeeping of
    the upstream Prometheus rule engine (the vendored reference only
    defines AlertStmt, ``promql/ast.go:54-66``, and ships no
    evaluator; SURVEY §2.8). The stream runner threads one map per
    rule across ticks; a set that stops being active resets. Passing
    None evaluates statelessly: every active set counts as first-seen,
    so FOR>0 rules emit ``pending``.

    The active sets ARE collected — bounded by active-alert
    cardinality, the exact set the upstream engine also holds in
    memory per rule."""
    rows = engine.query(rule.expr, ts).collect()
    if active_at is None:
        active_at = {}
    ts_ms = int(round(ts * 1000))
    results = []
    seen: set[tuple] = set()
    for r in rows:
        base = {
            k: v
            for k, v in dict(r["labels"]).items()
            if k
            not in (METRIC_NAME_LABEL, "alertname", "alertstate")
            and k not in rule.labels
        }
        base[METRIC_NAME_LABEL] = "ALERTS"
        base["alertname"] = rule.name
        base.update(rule.labels)
        key = tuple(sorted(base.items()))
        seen.add(key)
        since = active_at.setdefault(key, ts_ms)
        base["alertstate"] = (
            "firing" if ts_ms - since >= rule.duration_ms else "pending"
        )
        results.append((base, ts_ms, 1.0))
    for k in list(active_at):  # inactive sets reset their FOR clock
        if k not in seen:
            del active_at[k]
    df = engine.spark.createDataFrame(
        results, "labels map<string,string>, t long, v double"
    )
    return prepare_samples(df)
