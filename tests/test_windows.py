from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from cloud_native_reddit_data_pipeline_spark.operators import windows


def _events(spark):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # user 1: two sessions separated by a 2h gap
        (0, base, 1, "click", 1.0),
        (1, base + dt.timedelta(minutes=10), 1, "view", 2.0),
        (2, base + dt.timedelta(hours=3), 1, "click", 3.0),
        # user 2: one session
        (3, base + dt.timedelta(minutes=5), 2, "click", 4.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_session_windows_gap_splits(spark):
    out = windows.session_windows_gaps(_events(spark), gap_minutes=30)
    per_user = {}
    for r in out.collect():
        per_user.setdefault(r["user_id"], []).append(r["n_events"])
    assert sorted(per_user[1]) == [1, 2]
    assert per_user[2] == [1]


def test_tumbling_counts(spark):
    out = windows.tumbling_agg(_events(spark), width="1 hour")
    counts = {(r["win_start"].hour, r["event_type"]): r["n_events"] for r in out.collect()}
    assert counts[(0, "click")] == 2  # user1 + user2 clicks in hour 0
    assert counts[(3, "click")] == 1


def test_sliding_double_counts(spark):
    out = windows.sliding_agg(_events(spark), width="1 hour", slide="30 minutes")
    # every event lands in exactly 2 sliding windows
    assert sum(r["n_events"] for r in out.collect()) == 2 * 4


def test_interpolate_daily_fills_gaps(spark):
    from pyspark.sql import functions as F

    from cloud_native_reddit_data_pipeline_spark.operators.windows import (
        interpolate_daily,
    )
    from cloud_native_reddit_data_pipeline_spark.sources.tables import load

    ev = load(spark, "/root/testdata/sf0.001", "events").filter(F.col("value") > 180)
    out = interpolate_daily(ev, "event_type", "ts", "value")
    rows = out.collect()
    assert rows and all(r.value is not None for r in rows)
    # spine completeness: every group covers the identical full day range
    by_g = {}
    for r in rows:
        by_g.setdefault(r.event_type, []).append(r)
    spans = {g: (min(x.day for x in v), max(x.day for x in v), len(v)) for g, v in by_g.items()}
    assert len(set(spans.values())) == 1
    # interpolated values lie within [min, max] of the observed neighbors
    for g, v in by_g.items():
        v.sort(key=lambda r: r.day)
        obs = [r.value for r in v if r.observed]
        lo, hi = min(obs), max(obs)
        for r in v:
            if not r.observed:
                assert lo - 1e-6 <= r.value <= hi + 1e-6
    # at least one gap actually exercised the interpolation path
    assert any(not r.observed for r in rows)


def test_rolling_and_cohort_invariants(spark):
    from pyspark.sql import functions as F

    from cloud_native_reddit_data_pipeline_spark.operators.windows import (
        cohort_retention,
        rolling_distinct_users,
    )
    from cloud_native_reddit_data_pipeline_spark.sources.tables import load

    ev = load(spark, "/root/testdata/sf0.001", "events")
    n_users = ev.select("user_id").distinct().count()
    roll = rolling_distinct_users(ev, "ts", "user_id", window_days=7).collect()
    assert roll and all(0 < r.active_7d <= n_users for r in roll)
    # widening the window can only grow the count
    wide = {
        r.day: r.active_30d
        for r in rolling_distinct_users(ev, "ts", "user_id", window_days=30).collect()
    }
    for r in roll:
        assert wide[r.day] >= r.active_7d

    coh = cohort_retention(ev, "ts", "user_id", max_offset_days=14).collect()
    day0 = {r.cohort_day: r.n_users for r in coh if r.day_offset == 0}
    assert sum(day0.values()) == n_users  # every user in exactly one cohort
    for r in coh:
        assert 0 <= r.day_offset <= 14
        assert r.n_users <= day0[r.cohort_day]  # retention never exceeds cohort size


def test_interval_overlap_sweep_matches_bruteforce_on_hot_bucket(spark):
    """Skewed concurrency: many sessions piled into the same hour.  The
    sweep must (a) agree with an O(n^2) brute force, (b) contain no
    self-join in the physical plan (round 3's bucket-pairwise form was
    quadratic inside a hot bucket)."""
    from pyspark.sql import functions as F

    from cloud_native_reddit_data_pipeline_spark.operators.windows import (
        interval_overlap_degree,
    )

    rows = [
        (i % 7, i, f"2024-01-01 10:{i % 50:02d}:00", f"2024-01-01 10:{(i % 50) + 9:02d}:30")
        for i in range(60)
    ] + [(99, 1000, "2024-01-02 08:00:00", "2024-01-02 08:00:00")]  # zero-length, isolated
    df = spark.createDataFrame(
        rows, "user_id long, session_seq long, s string, e string"
    ).select(
        "user_id", "session_seq",
        F.to_timestamp("s").alias("s"), F.to_timestamp("e").alias("e"),
    )
    out = interval_overlap_degree(df, ["user_id", "session_seq"], "s", "e")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan  # only the broadcast bucket-prefix join
    got = {(r.user_id, r.session_seq): r.n_overlapping for r in out.collect()}
    py = [(u, q, s, e) for u, q, s, e in ((r[0], r[1], r[2], r[3]) for r in df.collect())]
    want = {}
    for u, q, s, e in py:
        n = sum(1 for u2, q2, s2, e2 in py if u2 != u and s <= e2 and s2 <= e)
        if n > 0:
            want[(u, q)] = n
    assert got == want


def test_funnel_stages_strict_ordering_and_ties(spark):
    """Funnel semantics: steps must advance strictly forward in
    (ts, event_id) order — a click BEFORE the first view does not
    count, a same-timestamp next step counts only with a larger
    event id."""
    from datetime import datetime as DT

    from cloud_native_reddit_data_pipeline_spark.operators.windows import (
        funnel_stages,
    )

    t = lambda m: DT(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # u1: full funnel in order
        (1, t(0), 1, "view"), (2, t(1), 1, "click"), (3, t(2), 1, "purchase"),
        # u2: click precedes the first view -> stuck at stage 1
        (4, t(0), 2, "click"), (5, t(1), 2, "view"),
        # u3: same-ts click with larger event id counts (tuple compare)
        (6, t(0), 3, "view"), (7, t(0), 3, "click"),
        # u4: same-ts click with SMALLER event id does not count
        (9, t(0), 4, "view"), (8, t(0), 4, "click"),
        # u5: no view at all -> absent from output
        (10, t(0), 5, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {
        r["user_id"]: r["stages_completed"]
        for r in funnel_stages(
            df, "user_id", "ts", "event_type",
            ["view", "click", "purchase"], "event_id",
        ).collect()
    }
    assert out == {1: 3, 2: 1, 3: 2, 4: 1}


def test_touch_attribution_first_last_and_lookback(spark):
    """First/last touch resolve deterministically (struct tie-break on
    event id), the lookback bound is strict, and conversions with no
    touches keep a row with nulls."""
    from cloud_native_reddit_data_pipeline_spark.operators.windows import (
        touch_attribution,
    )

    rows = [
        # user 1: clicks at t=10, 20, 20 (tie), purchase at t=100
        (1, 1, "2024-01-01 00:00:10", "click"),
        (2, 1, "2024-01-01 00:00:20", "click"),
        (3, 1, "2024-01-01 00:00:20", "click"),
        (4, 1, "2024-01-01 00:01:40", "purchase"),
        # user 2: click 8 days before purchase -> outside 7d lookback
        (5, 2, "2024-01-01 00:00:00", "click"),
        (6, 2, "2024-01-09 00:00:01", "purchase"),
        # user 3: click exactly AT the purchase second -> excluded (strict <)
        (7, 3, "2024-01-01 00:00:30", "click"),
        (8, 3, "2024-01-01 00:00:30", "purchase"),
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        r["conversion_id"]: r
        for r in touch_attribution(
            df, "user_id", "ts", "event_type", "event_id"
        ).collect()
    }
    assert out[4]["first_touch_id"] == 1
    assert out[4]["last_touch_id"] == 3  # tie at t=20 -> larger id wins max
    assert out[4]["n_touches"] == 3
    assert out[6]["first_touch_id"] is None and out[6]["n_touches"] == 0
    assert out[8]["first_touch_id"] is None and out[8]["n_touches"] == 0


def test_linear_attribution_shares_sum_to_value(spark):
    """Each conversion's value splits evenly over its window touches;
    per-touch rollups are exact scaled-integer sums."""
    from pyspark.sql import functions as F

    from cloud_native_reddit_data_pipeline_spark.operators.windows import (
        linear_touch_attribution,
    )

    rows = [
        (1, 1, "2024-01-01 00:00:10", "click", 0.0),
        (2, 1, "2024-01-01 00:00:20", "click", 0.0),
        (3, 1, "2024-01-01 00:01:00", "purchase", 10.0),
        (4, 1, "2024-01-01 00:02:00", "purchase", 4.0),  # both clicks in window
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        r["touch_id"]: r
        for r in linear_touch_attribution(
            df, "user_id", "ts", "event_type", "event_id", "value"
        ).collect()
    }
    # each click gets 10/2 + 4/2 = 7.0 across the two conversions
    assert out[1]["attributed_value"] == 7.0 and out[1]["n_conversions"] == 2
    assert out[2]["attributed_value"] == 7.0


def test_event_sequence_examples_context_and_warmup(spark):
    import datetime as dt

    from cloud_native_reddit_data_pipeline_spark.operators.windows import (
        event_sequence_examples,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), 1, f"e{i}", 0.0, "{}")
        for i in range(1, 6)
    ] + [(10, t0, 2, "solo", 0.0, "{}")]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    out = {r.event_id: r for r in event_sequence_examples(df).collect()}
    # user 1 has 5 events -> first 3 are warm-up, 2 examples; user 2 none
    assert set(out) == {4, 5}
    assert out[4].context == "e1>e2>e3" and out[4].target == "e4"
    assert out[5].context == "e2>e3>e4" and out[5].target == "e5"


def test_shapley_attribution_single_driver_channel(spark):
    from cloud_native_reddit_data_pipeline_spark.operators.windows import (
        shapley_attribution,
    )

    # 10 users: the 5 who saw 'a' convert, the 5 who saw only 'b' don't.
    # All conversion signal sits on 'a'; 'b' must get ~0.
    rows = []
    t0 = "2024-01-01 00:00:0"
    for u in range(5):
        rows += [(u, "a", f"{t0}1"), (u, "b", f"{t0}2"), (u, "buy", f"{t0}3")]
    for u in range(5, 10):
        rows += [(u, "b", f"{t0}1")]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r.channel: r.shapley
        for r in shapley_attribution(
            df, "user_id", "event_type", "ts", "buy", ["a", "b"]
        ).collect()
    }
    # efficiency: shapley sums to v(full) - v(empty) = 0.5 - 0.0
    assert abs(sum(got.values()) - 0.5) < 1e-6
    # hand-check: v({}) = 0 (no zero-mask journeys... masks are {a,b}
    # and {b}), v({a}) = 0 (no subset journeys), v({b}) = 0/5,
    # v({a,b}) = 5/10.  phi_a = 0.5*(v(ab)-v(b)) + 0.5*(v(a)-v({}))
    # = 0.25; phi_b = 0.5*(v(ab)-v(a)) + 0.5*(v(b)-v({})) = 0.25.
    # (With set-containment semantics both channels share credit for
    # the joint coalition; 'b' alone still shows zero lift: v(b)=0.)
    assert abs(got["a"] - 0.25) < 1e-6 and abs(got["b"] - 0.25) < 1e-6


def test_shapley_efficiency_on_mixed_journeys(spark):
    from cloud_native_reddit_data_pipeline_spark.operators.windows import (
        shapley_attribution,
    )

    rows = []
    t0 = "2024-01-01 00:00:0"
    # mask {a}: 4 journeys, 2 convert; mask {b}: 4 journeys, 1 converts;
    # mask {a,b}: 2 journeys, 2 convert
    u = 0
    for conv in (True, True, False, False):
        rows += [(u, "a", f"{t0}1")] + ([(u, "buy", f"{t0}5")] if conv else [])
        u += 1
    for conv in (True, False, False, False):
        rows += [(u, "b", f"{t0}1")] + ([(u, "buy", f"{t0}5")] if conv else [])
        u += 1
    for conv in (True, True):
        rows += [(u, "a", f"{t0}1"), (u, "b", f"{t0}2")] + (
            [(u, "buy", f"{t0}5")] if conv else []
        )
        u += 1
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r.channel: r.shapley
        for r in shapley_attribution(
            df, "user_id", "event_type", "ts", "buy", ["a", "b"]
        ).collect()
    }
    # v(full) = 5/10, v(empty) = 0 -> efficiency
    assert abs(sum(got.values()) - 0.5) < 1e-6
    # 'a' converts at 2/4 alone vs 'b' 1/4 alone -> phi_a > phi_b
    assert got["a"] > got["b"]


def test_markov_attribution_single_driver_channel(spark):
    from cloud_native_reddit_data_pipeline_spark.operators.windows import (
        markov_removal_attribution,
    )

    # Converters always pass through 'a'; 'b' appears only in
    # non-converting journeys -> removing 'a' kills all conversion
    # (removal_effect 1, share 1), removing 'b' changes nothing.
    rows = []
    t0 = "2024-01-01 00:00:0"
    for u in range(4):
        rows += [(u, 1, "a", f"{t0}1"), (u, 2, "buy", f"{t0}2")]
    for u in range(4, 8):
        rows += [(u, 1, "b", f"{t0}1")]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r.channel: r
        for r in markov_removal_attribution(
            df, "user_id", "event_type", "ts", "event_id", "buy", ["a", "b"]
        ).collect()
    }
    assert abs(got["a"].p_conv - 0.5) < 1e-6
    assert abs(got["a"].removal_effect - 1.0) < 1e-6
    assert abs(got["a"].share - 1.0) < 1e-6
    assert abs(got["b"].removal_effect) < 1e-6


def test_markov_absorption_hand_chain(spark):
    from cloud_native_reddit_data_pipeline_spark.operators.windows import (
        _MARKOV_E,
        _markov_absorption_e12,
    )

    # start -> a (always); a -> conv 1/2, a -> null 1/2
    counts = {(0, 1): 2, (1, 2): 1, (1, 3): 1}
    p = _markov_absorption_e12(counts, k=1)
    assert abs(p[0] / _MARKOV_E - 0.5) < 1e-9
    # removing 'a' redirects start's mass to null: P -> 0
    assert p[1] == 0


def test_kaplan_meier_hand_computed_with_censoring(spark):
    from cloud_native_reddit_data_pipeline_spark.operators.windows import (
        kaplan_meier_retention,
    )

    # All four users start 01-01.  u1 buys day 1; u3, u4 buy day 3
    # (which is also the observation end); u2 never buys -> censored
    # with duration 3.  KM: t=1: S=(1-1/4)=0.75;
    # t=3: at_risk = 3 (u1 gone), d=2 -> S = 0.75*(1-2/3) = 0.25.
    rows = [
        (1, "start", "2024-01-01 00:00:00"), (1, "buy", "2024-01-02 00:00:01"),
        (2, "start", "2024-01-01 00:00:00"),
        (3, "start", "2024-01-01 00:00:00"), (3, "buy", "2024-01-04 00:00:00"),
        (4, "start", "2024-01-01 00:00:00"), (4, "buy", "2024-01-04 00:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r.duration_days: (r.at_risk, r.converted, r.survival)
        for r in kaplan_meier_retention(
            df, "user_id", "ts", "event_type", "buy"
        ).collect()
    }
    assert got == {1: (4, 1, 0.75), 3: (3, 2, 0.25)}
    # censored user contributes to at_risk but never emits a row
    assert 2 not in got


def test_km_by_group_matches_single_arm_form(spark):
    from cloud_native_reddit_data_pipeline_spark.operators.windows import (
        kaplan_meier_by_group,
        kaplan_meier_retention,
    )

    rows = [
        (1, "start", "2024-01-01 00:00:00"), (1, "buy", "2024-01-02 00:00:01"),
        (2, "start", "2024-01-01 00:00:00"),
        (3, "start", "2024-01-01 00:00:00"), (3, "buy", "2024-01-04 00:00:00"),
        (4, "start", "2024-01-01 00:00:00"), (4, "buy", "2024-01-04 00:00:00"),
        (11, "start", "2024-01-01 00:00:00"), (11, "buy", "2024-01-03 00:00:00"),
        (12, "start", "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    grp = F.when(F.col("user_id") < 10, F.lit("x")).otherwise(F.lit("y"))
    by_group = {
        (r.grp, r.duration_days): (r.at_risk, r.converted, r.survival)
        for r in kaplan_meier_by_group(
            df, grp, "user_id", "ts", "event_type", "buy"
        ).collect()
    }
    for g, pred in (("x", F.col("user_id") < 10), ("y", F.col("user_id") >= 10)):
        single = {
            r.duration_days: (r.at_risk, r.converted, r.survival)
            for r in kaplan_meier_retention(
                df.filter(pred), "user_id", "ts", "event_type", "buy"
            ).collect()
        }
        got = {d: v for (gg, d), v in by_group.items() if gg == g}
        assert got == single, g
