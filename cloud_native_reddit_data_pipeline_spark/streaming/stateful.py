"""Custom stateful streaming operator via applyInPandasWithState —
the arbitrary-state surface the built-in streaming aggregations don't
cover (the reference's only cross-invocation state is its Redis seen-id
set, SURVEY.md O38; this is the general form of that pattern).

Per-key state lives in Spark's state store (HDFS/RocksDB backed at
scale), partitioned by the grouping key: each micro-batch shuffles only
that batch's rows to their key's partition, state never moves.  Arrow
batches in/out — no row-at-a-time Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, batch_rows long"
)
RUNNING_TOTALS_STATE_SCHEMA = "n long, total double"


def _running_totals_fn(key, pdf_iter, state: GroupState):
    """Accumulate per-user event count + value sum across micro-batches.
    Emits the UPDATED running totals once per batch the key appears in
    (update output mode)."""
    import pandas as pd

    n, total = state.get if state.exists else (0, 0.0)
    batch_rows = 0
    for pdf in pdf_iter:
        batch_rows += len(pdf)
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, round(total, 6)))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 6)],
            "batch_rows": [batch_rows],
        }
    )


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Streaming per-user running totals with explicit state — a custom
    stateful operator the relational API can't express (the state
    carries across micro-batches and is emitted incrementally).

    NoTimeout keeps state forever (faithful to the reference's
    unbounded Redis set); swap GroupStateTimeout.EventTimeTimeout plus
    a watermark to bound it at scale."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _running_totals_fn,
        RUNNING_TOTALS_OUTPUT_SCHEMA,
        RUNNING_TOTALS_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
