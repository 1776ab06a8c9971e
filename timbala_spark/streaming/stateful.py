"""Custom stateful streaming operator: per-user running sessionization.

The reference has no streaming operators (SURVEY.md §2.8) — this is
part of the training-data-pipeline extension surface. For a pure
gap-based session *aggregation*, Spark's built-in
``F.session_window(ts, gap)`` is the right tool (stays in Tungsten);
``applyInPandasWithState`` is for genuinely custom state machines —
here, per-user RUNNING counters (sessions so far, events so far) that
must survive across micro-batches and emit an updated row per batch.

Scale notes: state is one tiny struct per user key, hash-partitioned by
Spark's state store; each micro-batch ships only that batch's rows
(Arrow) plus the per-key state. Rows within a batch are sorted per key
in Python (cheap, bounded by batch size); cross-batch order is the
source's responsibility (ingest time) — true event-time sessions over
late data would add a watermark upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

#: 30-minute session gap, matching the batch sessionizer
#: (__spark_entry__.q_events_sessions).
SESSION_GAP_MS = 30 * 60 * 1000

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_sessions", LongType()),
        StructField("n_events", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("last_ts", LongType()),
        StructField("n_sessions", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _update_sessions(key, pdfs, state: GroupState):
    import pandas as pd

    (user_id,) = key
    if state.exists:
        last_ts, n_sessions, n_events = state.get
    else:
        last_ts, n_sessions, n_events = None, 0, 0
    for pdf in pdfs:
        for tms in sorted(pdf["tms"]):
            tms = int(tms)
            if last_ts is None or tms - last_ts > SESSION_GAP_MS:
                n_sessions += 1
            n_events += 1
            last_ts = tms
    state.update((last_ts, n_sessions, n_events))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_sessions": [n_sessions],
            "n_events": [n_events],
        }
    )


def streaming_sessionize(events: DataFrame) -> DataFrame:
    """(user_id, tms) streaming rows → one updated
    (user_id, n_sessions, n_events) row per user per micro-batch.

    Use with ``outputMode("update")``.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_sessions,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
