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


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 typed-state API) — the successor
# surface to applyInPandasWithState: named, typed state variables
# (Value/List/Map) on the RocksDB state store, explicit timers, state
# schema evolution.  Same scale shape (state partitioned by key, only
# batch rows shuffle), richer state model.
# ---------------------------------------------------------------------------

USER_PROFILE_OUTPUT_SCHEMA = (
    "user_id long, total_events long, n_types long, "
    "top_type string, top_type_n long"
)


def _make_user_profile_processor():
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    class UserProfileProcessor(StatefulProcessor):
        """Per-user event-type histogram in a typed MapState: each
        micro-batch folds its counts into the map and emits the updated
        profile (total events, distinct types, modal type with a
        lexicographic tie-break — deterministic under any batch
        order)."""

        def init(self, handle) -> None:
            self._counts = handle.getMapState(
                "type_counts",
                StructType([StructField("event_type", StringType())]),
                StructType([StructField("n", LongType())]),
            )

        def handleInputRows(self, key, rows, timerValues):
            for pdf in rows:
                for et, n in pdf.groupby("event_type").size().items():
                    k = (et,)
                    prev = (
                        self._counts.getValue(k)[0]
                        if self._counts.containsKey(k)
                        else 0
                    )
                    self._counts.updateValue(k, (prev + int(n),))
            counts = sorted(
                (k[0], v[0]) for k, v in self._counts.iterator()
            )
            total = sum(n for _, n in counts)
            # deterministic modal type: max count, lexicographically
            # smallest type on ties
            top_type, top_n = sorted(counts, key=lambda kv: (-kv[1], kv[0]))[0]
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "total_events": [total],
                    "n_types": [len(counts)],
                    "top_type": [top_type],
                    "top_type_n": [top_n],
                }
            )

        def close(self) -> None:
            pass

    return UserProfileProcessor()


def user_event_profiles(events_stream: DataFrame) -> DataFrame:
    """Streaming per-user event-type profiles via
    ``transformWithStateInPandas`` — requires the RocksDB state store
    provider (spark.sql.streaming.stateStore.providerClass) AND a
    working ``google.protobuf`` (the TWS state protocol is protobuf-
    framed; this build container ships a broken protobuf, so the test
    for this operator skips there — `applyInPandasWithState` above is
    the fully-exercised stateful path).  Raises ImportError eagerly
    when protobuf is unusable rather than crashing the stream's driver
    worker mid-query."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas needs google.protobuf "
            "(state protocol); unavailable in this environment"
        ) from e
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_user_profile_processor(),
        outputStructType=USER_PROFILE_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
