"""Event-time window aggregations over the `events` stream table
(additive — the reference has no event-time story at all, SURVEY.md O38
note: no watermarks, no late-data policy).

Batch forms here share exact SQL oracles; the streaming forms (with
watermarks) live in `streaming/` and reuse the same expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_agg(
    events: DataFrame, ts_col: str = "ts", width: str = "1 hour"
) -> DataFrame:
    """Tumbling-window count/sum per (window, event_type).  Uses the
    native `window()` expression — in streaming the same plan is
    incremental with watermark-bounded state."""
    return (
        events.groupBy(F.window(F.col(ts_col), width).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_agg(
    events: DataFrame, ts_col: str = "ts", width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding-window counts: each event contributes to width/slide
    overlapping windows (window() explodes them natively)."""
    return (
        events.groupBy(F.window(F.col(ts_col), width, slide).alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("win_start"), "n_events")
    )


def session_windows_gaps(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Batch sessionization via gaps-and-islands (lag + cumulative sum):
    a new session starts when the gap to the previous event of the same
    user exceeds `gap_minutes`.  One shuffle on user_id; the window sort
    is per-user.  The streaming analogue is `session_window()` (see
    streaming/ingest.py) — this batch form is exactly SQL-checkable."""
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    gap_us = gap_minutes * 60 * 1_000_000  # integer microseconds: exact
    flagged = events.withColumn(
        "_new",
        F.when(
            F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(F.col(ts_col)).over(w))
            > gap_us,
            1,
        )
        .otherwise(0)
        .cast("long"),
    ).withColumn("session_seq", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        flagged.groupBy(user_col, "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
    )
