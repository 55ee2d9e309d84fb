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


def interpolate_daily(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    round_to: int = 4,
) -> DataFrame:
    """Gap-filled daily series with linear interpolation: per group,
    densify to the full calendar spine, then fill missing days by linear
    interpolation between the nearest observed days (flat fill at the
    edges) — the standard feature-engineering resample for irregular
    event streams.

    Daily means are decimal-summed (order-insensitive, engine-exact);
    interpolation weights are day distances (exact integers), so the
    result is oracle-reproducible.

    Scale shape: the day spine is tiny and broadcasts; the observed
    aggregate is one partial-agg shuffle on (group, day); both fill
    windows share one (group, day-order) sort.  State per group is one
    row per calendar day — bounded by the time range, not the data."""
    day = F.date_trunc("day", F.col(ts_col))
    daily = df.groupBy(F.col(group_col).alias("g"), day.alias("day")).agg(
        (
            F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("v"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    bounds = df.select(
        F.date_trunc("day", F.min(ts_col)).alias("lo"),
        F.date_trunc("day", F.max(ts_col)).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    groups = df.select(F.col(group_col).alias("g")).distinct()
    dense = F.broadcast(spine.crossJoin(groups)).join(daily, ["g", "day"], "left")

    w_back = (
        Window.partitionBy("g")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("g")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    prev_day = F.last(obs_day, ignorenulls=True).over(w_back)
    prev_v = F.last(F.col("v"), ignorenulls=True).over(w_back)
    next_day = F.first(obs_day, ignorenulls=True).over(w_fwd)
    next_v = F.first(F.col("v"), ignorenulls=True).over(w_fwd)
    frac = F.datediff(F.col("day"), prev_day).cast("double") / F.datediff(
        next_day, prev_day
    ).cast("double")
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .otherwise(prev_v + (next_v - prev_v) * frac)
    )
    return dense.select(
        F.col("g").alias(group_col),
        "day",
        F.round(filled + F.lit(1e-9), round_to).alias("value"),
        F.col("v").isNotNull().alias("observed"),
        F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
    )


def rolling_distinct_users(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    window_days: int = 7,
) -> DataFrame:
    """Rolling N-day distinct-user count per calendar day (the "7-day
    active users" metric).  COUNT(DISTINCT) over a sliding range is not
    an incremental window aggregate — each day needs its own distinct
    set — so the exact formulation is a spine-to-activity range join:
    one row per (day, active user-day) pair, then a per-day distinct
    count.

    Scale shape: the day spine is tiny and broadcasts; the range join
    fans each (user, day) activity row out to at most `window_days`
    spine days (bounded, narrow), and the final aggregate is a
    count-distinct partial-agg on the day key.  The daily-activity
    pre-aggregate (user, day) collapses the event stream first, so the
    fan-out multiplies days-distinct rows, not raw events."""
    day = F.date_trunc("day", F.col(ts_col))
    activity = df.select(F.col(user_col).alias("u"), day.alias("d")).distinct()
    bounds = df.select(
        F.date_trunc("day", F.min(ts_col)).alias("lo"),
        F.date_trunc("day", F.max(ts_col)).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    joined = F.broadcast(spine).join(
        activity,
        (F.col("d") <= F.col("day"))
        & (F.col("d") > F.col("day") - F.expr(f"INTERVAL {window_days} DAYS")),
    )
    return joined.groupBy("day").agg(
        F.countDistinct("u").alias(f"active_{window_days}d")
    )


def cohort_retention(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    max_offset_days: int = 14,
) -> DataFrame:
    """Cohort retention matrix: users grouped by their first active day
    (the cohort), counted on each later day-offset they return —
    the standard product-analytics triangle.

    Scale shape: first-day per user is one partial-agg shuffle on the
    user key; activity joins back on the same key (co-partitioned);
    the output is (cohort_day, offset) cells — calendar-bounded, tiny."""
    day = F.date_trunc("day", F.col(ts_col))
    activity = df.select(F.col(user_col).alias("u"), day.alias("d")).distinct()
    first = activity.groupBy("u").agg(F.min("d").alias("cohort_day"))
    return (
        activity.join(first, "u")
        .withColumn("day_offset", F.datediff(F.col("d"), F.col("cohort_day")))
        .filter(F.col("day_offset") <= max_offset_days)
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("u").alias("n_users"))
    )


def interval_overlap_degree(
    intervals: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
    bucket: str = "hour",
) -> DataFrame:
    """Interval-overlap degree: for each interval, how many intervals
    with a DIFFERENT first key overlap it in time (concurrency
    analysis: simultaneous sessions, overlapping incidents).

    Scale shape: a direct inequality self-join is a cartesian band —
    instead each interval explodes to the time buckets it spans
    (bounded by its duration), candidates come from bucket equality,
    and the true overlap predicate (a.start <= b.end AND b.start <=
    a.end, inclusive) verifies after distinct-ing multi-bucket pairs.
    One shuffle on the bucket key; fan-out proportional to interval
    length over bucket size — pick the bucket near the typical
    duration."""
    a_keys = [F.col(f"a.{k}").alias(k) for k in key_cols]
    buckets = F.explode(
        F.sequence(
            F.date_trunc(bucket, F.col(start_col)),
            F.date_trunc(bucket, F.col(end_col)),
            F.expr(f"INTERVAL 1 {bucket.upper()}"),
        )
    ).alias("_bk")
    exploded = intervals.select(
        *key_cols, F.col(start_col).alias("_s"), F.col(end_col).alias("_e"), buckets
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a._bk") == F.col("b._bk"))
            & (F.col(f"a.{key_cols[0]}") != F.col(f"b.{key_cols[0]}"))
            & (F.col("a._s") <= F.col("b._e"))
            & (F.col("b._s") <= F.col("a._e")),
        )
        .select(*a_keys, *[F.col(f"b.{k}").alias(f"_b_{k}") for k in key_cols])
        .distinct()
    )
    return cand.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_overlapping")
    )
