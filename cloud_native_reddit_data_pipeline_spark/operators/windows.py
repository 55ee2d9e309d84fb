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
    # hint the NON-preserved side: a left-outer join can only broadcast
    # its right/build side (hinting the preserved spine was silently
    # dropped with a HintErrorLogger warning); `daily` is equally
    # calendar-bounded (one row per observed (group, day))
    dense = spine.crossJoin(groups).join(
        F.broadcast(daily), ["g", "day"], "left"
    )

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
    with a DIFFERENT first key overlap it in time, inclusive bounds
    (concurrency analysis: simultaneous sessions, overlapping
    incidents).  Rows must be unique per key tuple.

    Scale shape — counting sweep, NO self-join (round 3's hour-bucket
    pairwise join was quadratic inside a hot bucket; VERDICT r3):

        n_overlap(a) = #{starts <= a.end} - #{ends < a.start}
                       - (same first-key term, computed identically
                          within the first key's partition)

    One event stream carries interval endpoints (markers) and per-
    interval query rows; cumulative marker sums ordered by (t, tag)
    read off each count — tags order same-instant events so that
    'starts <= end' is inclusive and 'ends < start' is strict.  The
    global terms partition by time bucket with a broadcast calendar-
    sized bucket-prefix table; the same-key terms partition by the
    first key.  Everything is computed as FOUR WINDOW COLUMNS ON THE
    SAME FRAME (two sorts), then one groupBy per key — joining
    separately-built sweep frames mis-resolves window columns under
    Spark's common-lineage dedup (observed: the right side's cumsum
    silently rebound to the left plan), so no same-lineage join
    appears anywhere.  A bucket with n concurrent intervals costs
    O(n log n), not O(n^2)."""
    gk = key_cols[0]
    base = intervals.select(
        *key_cols, F.col(start_col).alias("_s"), F.col(end_col).alias("_e")
    )
    # tags: start(0) < q_start(1) < q_end(2) < end(3).  q_end reads the
    # start-cumsum (starts sort first at a tie -> inclusive <=); q_start
    # reads the end-cumsum (ends sort last at a tie -> strict <).
    mk = lambda c: F.lit(c).cast("long")  # noqa: E731
    ev = (
        base.select(
            F.col("_s").alias("t"), mk(0).alias("_tag"),
            mk(1).alias("_ms"), mk(0).alias("_me"), F.col(gk),
        )
        .unionByName(
            base.select(
                F.col("_s").alias("t"), mk(1).alias("_tag"),
                mk(0).alias("_ms"), mk(0).alias("_me"), *key_cols,
            ),
            allowMissingColumns=True,
        )
        .unionByName(
            base.select(
                F.col("_e").alias("t"), mk(2).alias("_tag"),
                mk(0).alias("_ms"), mk(0).alias("_me"), *key_cols,
            ),
            allowMissingColumns=True,
        )
        .unionByName(
            base.select(
                F.col("_e").alias("t"), mk(3).alias("_tag"),
                mk(0).alias("_ms"), mk(1).alias("_me"), F.col(gk),
            ),
            allowMissingColumns=True,
        )
        .withColumn("_bk", F.date_trunc(bucket, F.col("t")))
    )
    wg = (
        Window.partitionBy("_bk")
        .orderBy("t", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wu = (
        Window.partitionBy(gk)
        .orderBy("t", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = ev.select(
        "*",
        F.sum("_ms").over(wg).alias("_cgs"),
        F.sum("_me").over(wg).alias("_cge"),
        F.sum("_ms").over(wu).alias("_cus"),
        F.sum("_me").over(wu).alias("_cue"),
    )
    # per-bucket start/end totals -> prefix of all EARLIER buckets; the
    # bucket table is calendar-sized, so its single-partition ordering
    # window is a constant-cost op, broadcast back onto the query rows
    totals = ev.groupBy("_bk").agg(
        F.sum("_ms").alias("_ns"), F.sum("_me").alias("_ne")
    )
    wb = Window.orderBy("_bk").rowsBetween(Window.unboundedPreceding, -1)
    pref = totals.select(
        "_bk",
        F.coalesce(F.sum("_ns").over(wb), F.lit(0)).alias("_ps"),
        F.coalesce(F.sum("_ne").over(wb), F.lit(0)).alias("_pe"),
    )
    q = cum.filter(F.col("_tag").isin(1, 2)).join(F.broadcast(pref), "_bk")
    per_key = q.groupBy(*key_cols).agg(
        F.max(F.when(F.col("_tag") == 2, F.col("_cgs") + F.col("_ps"))).alias("_g_le"),
        F.max(F.when(F.col("_tag") == 1, F.col("_cge") + F.col("_pe"))).alias("_g_lt"),
        F.max(F.when(F.col("_tag") == 2, F.col("_cus"))).alias("_u_le"),
        F.max(F.when(F.col("_tag") == 1, F.col("_cue"))).alias("_u_lt"),
    )
    return per_key.select(
        *key_cols,
        (
            (F.col("_g_le") - F.col("_g_lt")) - (F.col("_u_le") - F.col("_u_lt"))
        ).alias("n_overlapping"),
    ).filter(F.col("n_overlapping") > 0)


def event_transition_matrix(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    tiebreak_col: str,
    round_to: int = 6,
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next_type | type) with counts — the path-analysis /
    next-action model behind funnels and session QA.

    Scale shape: one window (partition by user, order by time) builds
    the adjacent pairs, then a partial-agg shuffle on the tiny
    (from, to) key space; per-from normalization is a window over the
    aggregated matrix (|types|^2 rows, negligible)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    pairs = df.select(
        F.col(type_col).alias("from_type"),
        F.lead(type_col).over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    cnt = pairs.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    wt = Window.partitionBy("from_type")
    return cnt.select(
        "from_type",
        "to_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(wt) + F.lit(1e-9), round_to
        ).alias("p"),
    )


def rfm_segments(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    n_tiles: int = 4,
) -> DataFrame:
    """RFM (recency / frequency / monetary) quantile segmentation over
    a purchase stream: per-user stats, ntile quartiles on each axis
    (deterministic tie-break on the user key), and the combined
    "r-f-m" segment string — the standard customer-value grid.

    Scale shape: the event stream collapses to one row per user first
    (partial-agg shuffle); each axis is then ranked with
    `relational.with_global_row_numbers` (range-partitioned sort +
    per-partition offsets — no single-partition WindowExec at ANY user
    count) and the ntile is DERIVED from the global row number with
    SQL ntile's exact fill rule: with N rows and t tiles the first
    N mod t tiles take ceil(N/t) rows, the rest floor(N/t) — pure
    integer arithmetic on the rank, bit-identical to the engines'
    built-in ntile over the same total order.

    The monetary sum accumulates in DECIMAL (order-independent exact)
    but is EMITTED as `monetary_e4` — the exact sum × 10^4 as BIGINT —
    because DECIMAL payloads hash engine-specifically (same convention
    as `incremental_agg_merge`)."""
    from .relational import ntile_from_rank, with_global_row_numbers

    per_user = df.groupBy(F.col(user_col).alias("user_id")).agg(
        F.max(F.date_trunc("day", F.col(ts_col))).alias("_last_day"),
        F.count(F.lit(1)).alias("frequency"),
        (F.sum(F.col(value_col).cast("decimal(18,4)")) * F.lit(10000))
        .cast("long")
        .alias("monetary_e4"),
    )
    ref = df.agg(F.max(F.date_trunc("day", F.col(ts_col))).alias("_ref_day"))
    base = per_user.crossJoin(F.broadcast(ref)).withColumn(
        "recency_days", F.datediff(F.col("_ref_day"), F.col("_last_day"))
    )
    base = base.persist()
    pins: list = []
    try:
        # one-row count, broadcast into each rank pass: the tile
        # arithmetic rides inside the single materialization instead of
        # paying a separate count action (column form of ntile_from_rank)
        n_users_df = F.broadcast(base.agg(F.count(F.lit(1)).alias("_n_users")))
        axes = {
            "r": ("recency_days", [F.asc("recency_days"), F.asc("user_id")]),
            "f": ("frequency", [F.desc("frequency"), F.asc("user_id")]),
            "m": ("monetary_e4", [F.desc("monetary_e4"), F.asc("user_id")]),
        }
        out = base
        # each rank pass runs on a NARROW (key, axis) projection — the
        # range shuffle moves two columns, not the widening full frame
        # (round 7: previously the three passes chained on the full
        # frame with a localCheckpoint each, so pass 3 re-materialized
        # everything pass 1 and 2 had added).  checkpoint=False keeps
        # the three rank plans lazy so they fuse into the ONE
        # materialization below; each pass's sampled range shuffle is
        # pinned via `pins` (two narrow columns per axis) because the
        # offsets and numbering subplans both read it and consistency
        # across two physical instantiations is NOT guaranteed — the
        # RangePartitioner sample seed hashes the rdd id, so safety
        # must not rest on the ReuseExchange rule deduping the
        # subtrees (r7 ADVICE)
        for tile, (axis_col, order) in axes.items():
            ranked = with_global_row_numbers(
                base.select("user_id", axis_col),
                order,
                col_name="_rn",
                checkpoint=False,
                pins=pins,
            )
            tiles = ranked.crossJoin(n_users_df).select(
                "user_id",
                ntile_from_rank(
                    F.col("_rn"), F.col("_n_users"), n_tiles
                ).alias(tile),
            )
            out = out.join(tiles, "user_id")
        # materialize while base and the range shuffles are still
        # pinned (the lazy rank plans read them), then hand the caller
        # a lineage-free result
        out = out.localCheckpoint(eager=True)
    finally:
        base.unpersist()
        for p in pins:
            p.unpersist()
    return (
        out
        .select(
            "user_id",
            "recency_days",
            "frequency",
            "monetary_e4",
            "r",
            "f",
            "m",
            F.concat_ws("-", "r", "f", "m").alias("segment"),
        )
    )


def funnel_stages(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    tiebreak: str,
) -> DataFrame:
    """Ordered-funnel conversion (view -> click -> purchase …): for each
    user, the EARLIEST event of step 1, then the earliest step-2 event
    strictly after it, and so on — the standard product-analytics funnel
    with strict event ordering.  Returns one row per user who reached
    step 1: (user, stages_completed, ts_step1..ts_stepK).

    Spark-first shape: ONE shuffle (groupBy user) collecting each
    user's events as a sorted array of (ts, tiebreak, type) structs,
    then a codegen'd `aggregate` fold advances the stage counter in a
    single left-to-right pass — no per-stage join-back, no repeated
    scans (the 3-level conditional-min formulation the SQL oracle uses
    costs one aggregate + one join per stage; the fold is equivalent
    because the first qualifying event in time order IS the conditional
    minimum).  Determinism: events sort by (ts, tiebreak); a same-
    timestamp next-step event only counts if its tiebreak is larger,
    matching the oracle's tuple comparison."""
    k = len(steps)
    ev = df.select(
        F.col(user_col).alias("user_id"),
        F.struct(
            F.col(ts_col).alias("ts"),
            F.col(tiebreak).alias("tb"),
            F.col(type_col).alias("et"),
        ).alias("e"),
    ).filter(F.col(f"e.et").isin(steps))
    per_user = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_list("e")).alias("evs")
    )
    step_arr = F.array(*[F.lit(s) for s in steps])
    init = F.named_struct(
        F.lit("n"), F.lit(0),
        F.lit("hits"),
        F.array().cast(
            "array<struct<ts:timestamp,tb:bigint>>"
        ),
    )
    fold = F.aggregate(
        F.col("evs"),
        init,
        lambda acc, e: F.when(
            (acc["n"] < F.lit(k))
            & (e["et"] == F.element_at(step_arr, acc["n"] + 1))
            & (
                (acc["n"] == 0)
                | (e["ts"] > F.element_at(acc["hits"], -1)["ts"])
                | (
                    (e["ts"] == F.element_at(acc["hits"], -1)["ts"])
                    & (e["tb"] > F.element_at(acc["hits"], -1)["tb"])
                )
            ),
            F.struct(
                (acc["n"] + 1).alias("n"),
                F.concat(
                    acc["hits"],
                    F.array(F.struct(e["ts"].alias("ts"), e["tb"].alias("tb"))),
                ).alias("hits"),
            ),
        ).otherwise(acc),
    )
    out = per_user.select("user_id", fold.alias("_f")).filter(
        F.col("_f.n") >= 1
    )
    return out.select(
        "user_id",
        F.col("_f.n").alias("stages_completed"),
        *[
            # try_element_at: users stuck before step i have fewer than
            # i hits, and ANSI element_at throws out-of-bounds there —
            # NULL is the contract (matches the oracle's left joins)
            F.try_element_at(F.col("_f.hits"), F.lit(i + 1))["ts"].alias(
                f"ts_step{i + 1}"
            )
            for i in range(k)
        ],
    )


def ohlc_bars(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Daily OHLC (open/high/low/close) bars per key — the timeseries
    downsampling operator (candlestick rollup): per (day, key), the
    first and last value in strict (ts, event_id) order plus min/max/
    count and an exact decimal VWAP-style mean.

    One shuffle on (day, key): the open/close argmin/argmax ride the
    same per-partition window sort, and high/low/volume are partial
    aggregates.  In streaming the identical groupBy(window(...)) plan
    maintains the bars incrementally."""
    base = events.select(
        F.to_date(F.col(ts_col)).alias("bar_date"),
        F.col(key_col).alias("key"),
        F.col(value_col).alias("v"),
        F.col(ts_col).alias("_ts"),
        "event_id",
    )
    w_asc = Window.partitionBy("bar_date", "key").orderBy(
        F.col("_ts").asc(), F.col("event_id").asc()
    )
    w_desc = Window.partitionBy("bar_date", "key").orderBy(
        F.col("_ts").desc(), F.col("event_id").desc()
    )
    marked = base.select(
        "bar_date",
        "key",
        "v",
        F.row_number().over(w_asc).alias("_ra"),
        F.row_number().over(w_desc).alias("_rd"),
    )
    return marked.groupBy("bar_date", "key").agg(
        F.round(F.max(F.when(F.col("_ra") == 1, F.col("v"))), 4).alias("open"),
        F.round(F.max("v"), 4).alias("high"),
        F.round(F.min("v"), 4).alias("low"),
        F.round(F.max(F.when(F.col("_rd") == 1, F.col("v"))), 4).alias("close"),
        F.count(F.lit(1)).alias("volume"),
        F.round(
            F.sum(F.col("v").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
            + F.lit(1e-9),
            4,
        ).alias("mean_value"),
    )


def daily_trend(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    origin: str = "2024-01-01",
) -> DataFrame:
    """Per-key ordinary-least-squares trend of DAILY value totals:
    collapse to (key, day_index, daily_sum) first, then the closed-form
    OLS slope/intercept over the per-day points —

        slope     = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)
        intercept = (Sy*Sxx - Sx*Sxy) / (n*Sxx - Sx^2)

    computed over EXACT integers (day index as int, daily sums as
    value*100 BIGINTs), so both engines derive bit-identical rationals
    and the only float op is the final division (rounded).  The
    trend-of-aggregates formulation is deliberate: the regression state
    per key is 5 numbers over ~30 points, not a pass over raw events —
    the scalable shape for drift/growth monitoring.

    Returns (key, n_days, slope_per_day, intercept) with the slope in
    value units per day."""
    day_x = F.datediff(F.to_date(F.col(ts_col)), F.lit(origin)).alias("_x")
    daily = (
        events.select(
            F.col(key_col).alias("key"),
            day_x,
            F.col(value_col).cast("decimal(18,2)").alias("_v"),
        )
        .groupBy("key", "_x")
        .agg((F.sum("_v") * 100).cast("long").alias("_y"))
    )
    stats = daily.groupBy("key").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_x").cast("long").alias("_sx"),
        F.sum("_y").cast("long").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).cast("long").alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).cast("long").alias("_sxx"),
    )
    den = F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    slope_num = F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    icpt_num = F.col("_sy") * F.col("_sxx") - F.col("_sx") * F.col("_sxy")
    return stats.select(
        "key",
        F.col("_n").cast("long").alias("n_days"),
        F.round(
            slope_num.cast("double") / den.cast("double") / 100.0, 6
        ).alias("slope_per_day"),
        F.round(
            icpt_num.cast("double") / den.cast("double") / 100.0, 6
        ).alias("intercept"),
    )


def frequent_event_paths(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    tiebreak_col: str,
    min_support: int = 2,
    top_n: int = 30,
) -> DataFrame:
    """Frequent sequential patterns of length 3: consecutive event-type
    trigrams over each user's time-ordered stream, ranked by SUPPORT
    (distinct users exhibiting the path) — the sequential-pattern-mining
    companion of `event_transition_matrix` (first-order pairs there,
    order-3 paths here; the contiguous-window restriction is what keeps
    the candidate space linear instead of PrefixSpan's lattice).

    Scale shape: one per-user window sort emits every trigram in place
    (two leads, no join), a distinct bounds each user's contribution to
    one per pattern, and the support aggregate runs on the tiny
    |types|^3 key space.  Returns (path, support, n_occurrences)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    tri = (
        df.select(
            F.col(user_col).alias("_u"),
            F.col(type_col).alias("_t1"),
            F.lead(type_col, 1).over(w).alias("_t2"),
            F.lead(type_col, 2).over(w).alias("_t3"),
        )
        .filter(F.col("_t3").isNotNull())
        .select(
            "_u",
            F.concat_ws(">", "_t1", "_t2", "_t3").alias("path"),
        )
    )
    occ = tri.groupBy("path").agg(F.count(F.lit(1)).alias("n_occurrences"))
    sup = (
        tri.distinct()
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    return (
        sup.join(occ, "path")
        .filter(F.col("support") >= min_support)
        .select("path", "support", "n_occurrences")
        .orderBy(F.desc("support"), F.desc("n_occurrences"), "path")
        .limit(top_n)
    )


def seasonal_anomaly_days(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    z_threshold: float = 2.0,
) -> DataFrame:
    """Seasonal anomaly detection on daily totals: each day's total is
    z-scored against its DAY-OF-WEEK baseline (mean/stddev over all
    same-weekday days), flagging days whose rounded z exceeds the
    threshold — the weekly-seasonality drift monitor for ingest volume.

    All moments come from exact integers (daily totals at cents scale;
    population variance via (n*Syy - Sy^2)): the only float ops are one
    sqrt + one division, identically ordered on both engines, and the
    anomaly flag compares the ROUNDED z-score so the cut is
    deterministic cross-engine.  Two tiny aggregates (days, then 7
    weekday rows broadcast back) — nothing scales with raw events."""
    daily = (
        events.select(
            F.to_date(F.col(ts_col)).alias("day"),
            F.col(value_col).cast("decimal(18,2)").alias("_v"),
        )
        .groupBy("day")
        .agg((F.sum("_v") * 100).cast("long").alias("_y"))
        .withColumn("dow", F.dayofweek("day"))
    )
    base = daily.groupBy("dow").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
    )
    var_num = F.col("_n") * F.col("_syy") - F.col("_sy") * F.col("_sy")
    joined = daily.join(F.broadcast(base), "dow")
    mean = F.col("_sy").cast("double") / F.col("_n")
    std = F.sqrt(var_num.cast("double")) / F.col("_n")
    z = F.when(
        var_num > 0,
        F.round(F.abs(F.col("_y") - mean) / std + F.lit(1e-9), 4),
    )
    return joined.select(
        "day",
        F.col("dow").cast("int").alias("dow"),
        F.round(F.col("_y") / 100.0, 2).alias("daily_total"),
        F.round(mean / 100.0 + F.lit(1e-9), 4).alias("dow_mean"),
        z.alias("z_score"),
        F.coalesce(z > F.lit(z_threshold), F.lit(False)).alias("is_anomaly"),
    )


def cusum_changepoint(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """CUSUM change-point detection per key over DAILY totals: the day
    where the cumulative deviation from the series mean peaks (Page
    1954's offline argmax-|S_d| form) — "when did this stream's level
    shift", the companion of `seasonal_anomaly_days`' "which days are
    off".

    Exactness: with daily totals y at cents scale, S_d = sum_{i<=d}
    (y_i - mean) is scaled by n to stay integral —
    n*S_d = n*cumsum_d - d_idx*total — so the argmax (and its
    deterministic earliest-day tie-break) is exact-integer on both
    engines; only the reported magnitude divides back to value units.

    Scale shape: one (key, day) partial agg collapses the stream, one
    per-key window cumsum, one per-key argmax — state is days-per-key,
    never raw events."""
    daily = (
        events.select(
            F.col(key_col).alias("key"),
            F.to_date(F.col(ts_col)).alias("day"),
            F.col(value_col).cast("decimal(18,2)").alias("_v"),
        )
        .groupBy("key", "day")
        .agg((F.sum("_v") * 100).cast("long").alias("_y"))
    )
    wk = Window.partitionBy("key")
    wcum = wk.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    widx = wk.orderBy("day")
    cum = daily.select(
        "key",
        "day",
        F.sum("_y").over(wcum).alias("_cum"),
        F.row_number().over(widx).alias("_i"),
        F.sum("_y").over(wk).alias("_tot"),
        F.count(F.lit(1)).over(wk).alias("_n"),
    )
    dev = cum.withColumn(
        "_ns", F.col("_n") * F.col("_cum") - F.col("_i") * F.col("_tot")
    )
    best = Window.partitionBy("key").orderBy(
        F.abs(F.col("_ns")).desc(), F.col("day").asc()
    )
    return (
        dev.withColumn("_rk", F.row_number().over(best))
        .filter(F.col("_rk") == 1)
        .select(
            "key",
            F.col("day").alias("changepoint_day"),
            F.col("_n").cast("long").alias("n_days"),
            F.round(
                F.abs(F.col("_ns")).cast("double")
                / F.col("_n")
                / 100.0
                + F.lit(1e-9),
                4,
            ).alias("max_cusum_dev"),
        )
    )


def bollinger_bands(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window_days: int = 7,
    n_sigma: float = 2.0,
) -> DataFrame:
    """Rolling mean +/- n-sigma bands over daily totals per key
    (Bollinger 1980s; the streaming-monitoring rolling-z companion of
    the calendar-seasonal `seasonal_anomaly_days`): each day is scored
    against the trailing `window_days` days' mean/stddev, and breakout
    days (|rounded z| > n_sigma) are flagged.

    Exactness: rolling sum and sum-of-squares accumulate the cents-
    scaled BIGINT daily totals inside a rowsBetween window — exact
    integers — so mean/std derive from identical rationals on both
    engines; the breakout flag compares the ROUNDED z.  Warm-up rows
    (fewer than `window_days` trailing days) emit NULL z and never
    flag.

    One (key, day) partial agg + one per-key window sort; state is
    days-per-key."""
    daily = (
        events.select(
            F.col(key_col).alias("key"),
            F.to_date(F.col(ts_col)).alias("day"),
            F.col(value_col).cast("decimal(18,2)").alias("_v"),
        )
        .groupBy("key", "day")
        .agg((F.sum("_v") * 100).cast("long").alias("_y"))
    )
    w = (
        Window.partitionBy("key")
        .orderBy("day")
        .rowsBetween(-window_days, -1)
    )
    n = F.count(F.lit(1)).over(w)
    sy = F.sum("_y").over(w)
    syy = F.sum(F.col("_y") * F.col("_y")).over(w)
    var_num = n * syy - sy * sy
    mean = sy.cast("double") / n
    std = F.sqrt(var_num.cast("double")) / n
    z = F.when(
        (n == window_days) & (var_num > 0),
        F.round((F.col("_y") - mean) / std + F.lit(1e-9), 4),
    )
    return daily.select(
        "key",
        "day",
        F.round(F.col("_y") / 100.0, 2).alias("daily_total"),
        F.when(n == window_days, F.round(mean / 100.0 + F.lit(1e-9), 4)).alias(
            "rolling_mean"
        ),
        z.alias("z_score"),
        F.coalesce(F.abs(z) > F.lit(n_sigma), F.lit(False)).alias("is_breakout"),
    )


def touch_attribution(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    id_col: str,
    touch_type: str = "click",
    conversion_type: str = "purchase",
    lookback_days: int = 7,
) -> DataFrame:
    """First-touch / last-touch marketing attribution: for each
    conversion event, find the earliest and latest `touch_type` event
    by the same user inside a strict lookback window (touch before the
    conversion, at most `lookback_days` earlier) — the classic
    attribution model pair, computed exactly.

    Determinism: the arg-min/arg-max ride a (epoch_seconds, event_id)
    STRUCT ordering — lexicographic in both engines — so simultaneous
    touches tie-break on the id instead of partition order.

    Scale shape: a banded range equi-join (user key + time band, the
    `range_band_join` pattern — each conversion meets only its own
    user's touches inside the band, never a cross of the streams) into
    one partial-agg groupBy on the conversion id.  No window over the
    raw stream, no global sort."""
    sec = lambda c: F.unix_timestamp(F.col(c))  # noqa: E731
    touches = df.filter(F.col(type_col) == touch_type).select(
        F.col(user_col).alias("_u"),
        sec(ts_col).alias("_tsec"),
        F.col(id_col).alias("_tid"),
    )
    convs = df.filter(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("user_id"),
        sec(ts_col).alias("_csec"),
        F.col(id_col).alias("conversion_id"),
    )
    lb = lookback_days * 86400
    j = convs.join(
        touches,
        (F.col("_u") == F.col("user_id"))
        & (F.col("_tsec") < F.col("_csec"))
        & (F.col("_tsec") >= F.col("_csec") - F.lit(lb)),
        "left",
    )
    key = F.struct(F.col("_tsec").alias("s"), F.col("_tid").alias("e"))
    return (
        j.groupBy("conversion_id", "user_id")
        .agg(
            F.min(key).getField("e").alias("first_touch_id"),
            F.max(key).getField("e").alias("last_touch_id"),
            F.count(F.col("_tid")).alias("n_touches"),
        )
        .select(
            "conversion_id",
            "user_id",
            "first_touch_id",
            "last_touch_id",
            F.col("n_touches").cast("long").alias("n_touches"),
        )
    )


def linear_touch_attribution(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    id_col: str,
    value_col: str,
    touch_type: str = "click",
    conversion_type: str = "purchase",
    lookback_days: int = 7,
) -> DataFrame:
    """Linear (equal-weight) multi-touch attribution: each conversion's
    value splits evenly across every touch in its strict lookback
    window, then rolls up per touch event — the budget-allocation
    companion of `touch_attribution`'s first/last model.

    Exactness: the per-(conversion, touch) share is rounded ONCE to a
    1e-6-scaled integer (deterministic per pair), and per-touch rollup
    is an exact integer sum — no float addition order anywhere
    (SCALE.md exact-sum convention).

    Scale shape: the same banded range equi-join as `touch_attribution`
    plus one per-conversion count window (bounded by a conversion's own
    touches) and one partial-agg groupBy on the touch id."""
    sec = lambda c: F.unix_timestamp(F.col(c))  # noqa: E731
    touches = df.filter(F.col(type_col) == touch_type).select(
        F.col(user_col).alias("_u"),
        sec(ts_col).alias("_tsec"),
        F.col(id_col).alias("touch_id"),
    )
    convs = df.filter(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("user_id"),
        sec(ts_col).alias("_csec"),
        F.col(id_col).alias("_cid"),
        F.col(value_col).alias("_v"),
    )
    lb = lookback_days * 86400
    j = convs.join(
        touches,
        (F.col("_u") == F.col("user_id"))
        & (F.col("_tsec") < F.col("_csec"))
        & (F.col("_tsec") >= F.col("_csec") - F.lit(lb)),
    )
    w = Window.partitionBy("_cid")
    shared = j.select(
        "touch_id",
        "user_id",
        "_cid",
        F.round(F.col("_v") * F.lit(1e6) / F.count(F.lit(1)).over(w))
        .cast("long")
        .alias("_share_e6"),
    )
    return (
        shared.groupBy("touch_id", "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.round(F.sum("_share_e6") / F.lit(1e6) + F.lit(1e-9), 4).alias(
                "attributed_value"
            ),
        )
        .select(
            "touch_id",
            "user_id",
            F.col("n_conversions").cast("long").alias("n_conversions"),
            "attributed_value",
        )
    )


def event_sequence_examples(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    context: int = 3,
) -> DataFrame:
    """Next-event-prediction training examples from the event log: per
    user, each event becomes a (context -> target) example where the
    context is the '>' -joined previous `context` event types in time
    order — the sequence-example construction step for behavioral /
    session LMs (the "sequential recommendation" data format).

    Ordering is the total order (ts, event_id), so examples are
    deterministic under timestamp ties.  Only full-context examples
    are emitted (the first `context` events per user are warm-up).

    Scale shape: ONE user-partitioned window with `context` lags — no
    self-join, no explode, no global sort; per-user skew is the only
    hazard, identical to sessionization."""
    w = Window.partitionBy(user_col).orderBy(F.asc(ts_col), F.asc(id_col))
    lags = [
        F.lag(type_col, i).over(w) for i in range(context, 0, -1)
    ]
    return (
        events.select(
            F.col(user_col),
            F.col(id_col),
            F.concat_ws(">", *lags).alias("context"),
            lags[0].alias("_oldest"),
            F.col(type_col).alias("target"),
        )
        .filter(F.col("_oldest").isNotNull())
        .drop("_oldest")
    )


def shapley_attribution(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    conversion_type: str,
    channels: list[str],
) -> DataFrame:
    """Game-theoretic channel attribution: the Shapley value of each
    marketing channel for conversion — the data-driven successor to
    the positional rules (`touch_attribution` last-touch,
    `linear_touch_attribution` equal-split), which credit whatever
    happened to be adjacent rather than what changed the outcome.

    Journey model: per user, the SET of channels seen strictly before
    the first conversion event (non-converters contribute their whole
    channel set); the coalition value v(S) is the conversion rate of
    journeys whose channel set is CONTAINED in S (the zeta-transform /
    "exposed only to S" form).  Then

        phi_i = sum_{S not containing i} w(|S|) * (v(S u {i}) - v(S)),
        w(s) = s! * (k - s - 1)! / k!

    Exactness discipline: journeys collapse to <= 2^k mask rows
    (integer counts); v() values are single integer divisions; each
    weighted marginal is e9-quantized to an integer before the final
    sum, so the per-channel total is order-free (the repo's share_e6
    tactic from linear attribution).  Everything after the one
    journey-collapsing groupBy runs on <= 2^k-row frames — the
    subset-sum join, the marginal self-join, and the k-row output are
    all broadcast-sized at ANY event volume.  k above ~16 channels
    needs the sampled-permutation estimator instead; this is the exact
    form for the small channel vocabularies real funnels have."""
    k = len(channels)
    bit_expr = None
    for i, ch in enumerate(channels):
        branch = F.when(F.col(type_col) == ch, F.lit(1 << i))
        bit_expr = branch if bit_expr is None else bit_expr.when(
            F.col(type_col) == ch, F.lit(1 << i)
        )
    conv = (
        events.filter(F.col(type_col) == conversion_type)
        .groupBy(F.col(user_col).alias("_u"))
        .agg(F.min(ts_col).alias("_cts"))
    )
    users = events.select(F.col(user_col).alias("_u")).distinct()
    ch_events = (
        events.filter(F.col(type_col).isin(channels))
        .select(F.col(user_col).alias("_u"), F.col(ts_col).alias("_ts"), bit_expr.alias("_b"))
        .join(conv, "_u", "left")
        .filter(F.col("_cts").isNull() | (F.col("_ts") < F.col("_cts")))
        .groupBy("_u")
        .agg(F.expr("bit_or(_b)").alias("_mask"))
    )
    jm = (
        users.join(ch_events, "_u", "left")
        .join(conv.select("_u").withColumn("_conv", F.lit(1)), "_u", "left")
        .select(
            F.coalesce(F.col("_mask"), F.lit(0)).cast("long").alias("_mask"),
            F.coalesce(F.col("_conv"), F.lit(0)).alias("_conv"),
        )
    )
    mc = jm.groupBy("_mask").agg(
        F.count(F.lit(1)).alias("_nj"), F.sum("_conv").cast("long").alias("_nc")
    )
    spark = events.sparkSession
    smasks = spark.range(1 << k).select(F.col("id").alias("_s"))
    ss = (
        smasks.join(
            F.broadcast(mc),
            (F.col("_mask").bitwiseAND(F.col("_s")) == F.col("_mask")),
            "left",
        )
        .groupBy("_s")
        .agg(
            F.coalesce(F.sum("_nj"), F.lit(0)).cast("long").alias("_n"),
            F.coalesce(F.sum("_nc"), F.lit(0)).cast("long").alias("_c"),
        )
    )
    v = ss.select(
        "_s",
        F.when(
            F.col("_n") > 0, F.col("_c").cast("double") / F.col("_n").cast("double")
        )
        .otherwise(F.lit(0.0))
        .alias("_v"),
    ).localCheckpoint(eager=True)
    names = spark.createDataFrame(
        [(i, ch) for i, ch in enumerate(channels)], "i int, channel string"
    )
    # w(s) literals for the k at hand, as exact-literal doubles both
    # engines parse identically
    import math

    w_expr = None
    for s in range(k):
        wval = math.factorial(s) * math.factorial(k - s - 1) / math.factorial(k)
        branch = F.when(F.expr("bit_count(_s0)") == s, F.lit(wval))
        w_expr = branch if w_expr is None else w_expr.when(
            F.expr("bit_count(_s0)") == s, F.lit(wval)
        )
    v0 = v.select(F.col("_s").alias("_s0"), F.col("_v").alias("_v0"))
    v1 = v.select(F.col("_s").alias("_s1"), F.col("_v").alias("_v1"))
    marg = (
        names.crossJoin(F.broadcast(v0))
        .filter(F.col("_s0").bitwiseAND(F.expr("shiftleft(1, i)")) == 0)
        .withColumn("_s1", F.col("_s0") + F.expr("shiftleft(1, i)"))
        .join(F.broadcast(v1), "_s1")
        .select(
            "channel",
            F.round(
                (F.col("_v1") - F.col("_v0")) * w_expr * F.lit(1e9) + F.lit(1e-9)
            )
            .cast("long")
            .alias("_m_e9"),
        )
    )
    return marg.groupBy("channel").agg(
        F.round(F.sum("_m_e9") / F.lit(1e9) + F.lit(1e-9), 6).alias("shapley")
    )


_MARKOV_E = 10**12
_MARKOV_SQUARINGS = 11  # T^(2^11) = T^2048; transient mass 0.99^2048 ~ 1e-9


def _markov_absorption_e12(
    counts: dict[tuple[int, int], int], k: int
) -> dict[int, int]:
    """Exact-integer absorbing-chain solve shared by the operator and
    (by construction) the SQL oracle: states 0=start, 1..k=channels,
    k+1=conv, k+2=null.  For the full chain (variant 0) and each
    removed-channel variant r (transitions INTO r redirected to null),
    build the row-floored e12 transition matrix and square it
    `_MARKOV_SQUARINGS` times — every entry is (sum of products) // E,
    so the arithmetic is order-free integer math a HUGEINT SQL replay
    reproduces bit-for-bit.  Returns {variant: P(start->conv) * E}."""
    E = _MARKOV_E
    conv_s, null_s = k + 1, k + 2
    out: dict[int, int] = {}
    for var in range(k + 1):  # 0 = full, r = channel state removed
        cnt: dict[tuple[int, int], int] = {}
        for (s, d), c in counts.items():
            dd = null_s if (var > 0 and d == var) else d
            cnt[(s, dd)] = cnt.get((s, dd), 0) + c
        row_tot: dict[int, int] = {}
        for (s, _d), c in cnt.items():
            row_tot[s] = row_tot.get(s, 0) + c
        t = {(s, d): c * E // row_tot[s] for (s, d), c in cnt.items()}
        t[(conv_s, conv_s)] = E
        t[(null_s, null_s)] = E
        for _ in range(_MARKOV_SQUARINGS):
            nxt: dict[tuple[int, int], int] = {}
            by_src: dict[int, list[tuple[int, int]]] = {}
            for (s, d), p in t.items():
                by_src.setdefault(s, []).append((d, p))
            for (s, m), p1 in t.items():
                for d, p2 in by_src.get(m, []):
                    nxt[(s, d)] = nxt.get((s, d), 0) + p1 * p2
            t = {sd: p // E for sd, p in nxt.items() if p // E > 0}
            t[(conv_s, conv_s)] = E
            t[(null_s, null_s)] = E
        out[var] = t.get((0, conv_s), 0)
    return out


def markov_removal_attribution(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    id_col: str,
    conversion_type: str,
    channels: list[str],
) -> DataFrame:
    """Markov-chain (removal-effect) channel attribution — the
    sequence-aware member of the attribution trio (positional:
    `touch_attribution`/`linear_touch_attribution`; set-based:
    `shapley_attribution`): fit a first-order chain over per-user
    channel sequences ending in conversion or null, then credit each
    channel by how much the start->conversion absorption probability
    drops when that channel is removed (its inbound transitions
    redirected to null) — Anderl et al. 2016's standard model.

    Exactness discipline: transition probabilities are row-floored
    e12 integers and absorption comes from 11 integer matrix
    squarings (T^2048), so the whole solve is order-free integer
    arithmetic; removal effects and shares divide e12 integers (all
    below 2^53, doubles are exact).  Scale shape: the ONLY event-scale
    stages are the journey window (lead over (user, ts, id)) and the
    (src,dst) count groupBy; the chain itself is <= (k+3)^2 rows,
    collected driver-side like the BPE merge table, solved in exact
    Python ints, and returned as a k-row frame."""
    k = len(channels)
    st_expr = None
    for i, ch in enumerate(channels):
        branch = F.when(F.col(type_col) == ch, F.lit(i + 1))
        st_expr = branch if st_expr is None else st_expr.when(
            F.col(type_col) == ch, F.lit(i + 1)
        )
    conv = (
        events.filter(F.col(type_col) == conversion_type)
        .groupBy(F.col(user_col).alias("_u"))
        .agg(F.min(ts_col).alias("_cts"))
    )
    che = (
        events.filter(F.col(type_col).isin(channels))
        .select(
            F.col(user_col).alias("_u"),
            F.col(ts_col).alias("_ts"),
            F.col(id_col).alias("_id"),
            st_expr.alias("_st"),
        )
        .join(conv, "_u", "left")
        .filter(F.col("_cts").isNull() | (F.col("_ts") < F.col("_cts")))
    )
    w = Window.partitionBy("_u").orderBy("_ts", "_id")
    seq = che.select(
        "_u",
        "_st",
        F.row_number().over(w).alias("_rn"),
        F.lead("_st").over(w).alias("_nxt"),
    )
    users = events.select(F.col(user_col).alias("_u")).distinct()
    ustat = users.join(conv, "_u", "left").select(
        "_u",
        F.when(F.col("_cts").isNull(), F.lit(k + 2))
        .otherwise(F.lit(k + 1))
        .alias("_endst"),
    )
    tr = (
        seq.filter(F.col("_rn") == 1)
        .select(F.lit(0).alias("src"), F.col("_st").alias("dst"))
        .unionByName(
            seq.filter(F.col("_nxt").isNotNull()).select(
                F.col("_st").alias("src"), F.col("_nxt").alias("dst")
            )
        )
        .unionByName(
            seq.filter(F.col("_nxt").isNull())
            .join(ustat, "_u")
            .select(F.col("_st").alias("src"), F.col("_endst").alias("dst"))
        )
        .unionByName(
            ustat.join(
                che.select("_u").distinct(), "_u", "left_anti"
            ).select(F.lit(0).alias("src"), F.col("_endst").alias("dst"))
        )
    )
    counts = {
        (r["src"], r["dst"]): r["c"]
        for r in tr.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    p = _markov_absorption_e12(counts, k)
    pf = p[0]
    re_num = {r: pf - p[r] for r in range(1, k + 1)}
    tot = sum(re_num.values())
    rows = []
    for i, ch in enumerate(channels):
        num = re_num[i + 1]
        rows.append(
            (
                ch,
                round(pf / _MARKOV_E + 1e-9, 6),
                round(num / pf + 1e-9, 6) if pf > 0 else 0.0,
                round(num / tot + 1e-9, 6) if tot > 0 else 0.0,
            )
        )
    return events.sparkSession.createDataFrame(
        rows, "channel string, p_conv double, removal_effect double, share double"
    )


def kaplan_meier_retention(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    event_type_col: str,
    target_type: str,
) -> DataFrame:
    """Kaplan-Meier time-to-event curve with right-censoring — here
    time from a user's first activity to their first `target_type`
    event; users who never reach it are CENSORED at the observation
    end (the statistically honest conversion-latency curve: the naive
    "days to purchase among purchasers" histogram silently drops the
    users still on their way).  Output one row per duration with >= 1
    target event: (duration_days, at_risk, converted, survival).

        S(t) = prod_{u <= t} (1 - d_u / n_u)

    computed as exp of the ORDERED cumulative sum of ln(1 - d/n) — a
    window running sum accumulates sequentially in frame order on both
    engines, so the float result is deterministic (unlike an unordered
    aggregate sum).  Scale shape: one per-user groupBy (event scale),
    then everything lives on distinct DURATION values — bounded by the
    observation window in days, so the single-partition window over
    them is a no-op at any user count (the zipf_token_stats k-row
    pattern)."""
    span = events.agg(F.max(ts_col).alias("_obs_end"))
    per_user = (
        events.groupBy(F.col(user_col).alias("_u"))
        .agg(
            F.min(ts_col).alias("_first"),
            F.min(
                F.when(F.col(event_type_col) == target_type, F.col(ts_col))
            ).alias("_hit"),
        )
        .crossJoin(F.broadcast(span))
        .select(
            F.floor(
                (
                    F.coalesce(
                        F.unix_timestamp("_hit"), F.unix_timestamp("_obs_end")
                    )
                    - F.unix_timestamp("_first")
                )
                / F.lit(86400)
            )
            .cast("long")
            .alias("dur"),
            F.col("_hit").isNotNull().cast("int").alias("_ev"),
        )
    )
    per_dur = per_user.groupBy("dur").agg(
        F.count(F.lit(1)).alias("_n_all"), F.sum("_ev").alias("converted")
    )
    w_ord = Window.orderBy("dur")
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    tot = per_dur.agg(F.sum("_n_all").alias("_n"))
    curve = per_dur.crossJoin(F.broadcast(tot)).withColumn(
        "at_risk", F.col("_n") - F.coalesce(F.sum("_n_all").over(w_prev), F.lit(0))
    ).withColumn(
        "survival",
        F.round(
            F.exp(
                F.sum(
                    # greatest(., 1e-300): the curve legitimately hits 0
                    # when the last at-risk group all converts; ln(0)
                    # errors in DuckDB and nulls in Spark, while
                    # exp(-690.77) rounds to 0.0 identically on both
                    F.log(
                        F.greatest(
                            F.lit(1.0)
                            - F.col("converted").cast("double")
                            / F.col("at_risk").cast("double"),
                            F.lit(1e-300),
                        )
                    )
                ).over(w_ord)
            )
            + F.lit(1e-9),
            6,
        ),
    )
    return curve.filter(F.col("converted") > 0).select(
        F.col("dur").alias("duration_days"), "at_risk", "converted", "survival"
    )


def kaplan_meier_by_group(
    events: DataFrame,
    group_expr: Column,
    user_col: str,
    ts_col: str,
    event_type_col: str,
    target_type: str,
) -> DataFrame:
    """Per-GROUP Kaplan-Meier time-to-event curves — the survival A/B
    readout: one right-censored conversion-latency curve per
    experiment arm (or cohort/segment), directly comparable because
    censoring is handled identically in every group.  Same estimator
    as `kaplan_meier_retention` with every window PARTITIONED by the
    group, so arms parallelize natively and the per-group duration
    domain stays bounded by the observation window in days."""
    span = events.agg(F.max(ts_col).alias("_obs_end"))
    per_user = (
        events.groupBy(F.col(user_col).alias("_u"))
        .agg(
            F.first(group_expr).alias("_g"),
            F.min(ts_col).alias("_first"),
            F.min(
                F.when(F.col(event_type_col) == target_type, F.col(ts_col))
            ).alias("_hit"),
        )
        .crossJoin(F.broadcast(span))
        .select(
            "_g",
            F.floor(
                (
                    F.coalesce(
                        F.unix_timestamp("_hit"), F.unix_timestamp("_obs_end")
                    )
                    - F.unix_timestamp("_first")
                )
                / F.lit(86400)
            )
            .cast("long")
            .alias("dur"),
            F.col("_hit").isNotNull().cast("int").alias("_ev"),
        )
    )
    per_dur = per_user.groupBy("_g", "dur").agg(
        F.count(F.lit(1)).alias("_n_all"), F.sum("_ev").alias("converted")
    )
    w_ord = Window.partitionBy("_g").orderBy("dur")
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    tot = per_dur.groupBy("_g").agg(F.sum("_n_all").alias("_n"))
    curve = per_dur.join(F.broadcast(tot), "_g").withColumn(
        "at_risk", F.col("_n") - F.coalesce(F.sum("_n_all").over(w_prev), F.lit(0))
    ).withColumn(
        "survival",
        F.round(
            F.exp(
                F.sum(
                    F.log(
                        F.greatest(
                            F.lit(1.0)
                            - F.col("converted").cast("double")
                            / F.col("at_risk").cast("double"),
                            F.lit(1e-300),
                        )
                    )
                ).over(w_ord)
            )
            + F.lit(1e-9),
            6,
        ),
    )
    return curve.filter(F.col("converted") > 0).select(
        F.col("_g").alias("grp"),
        F.col("dur").alias("duration_days"),
        "at_risk",
        "converted",
        "survival",
    )
