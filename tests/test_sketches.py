"""Deterministic sketches (KMV, bloom semi-join) and the round-5
relational additions (skyline, snapshot diff, SSSP, token-label chi2,
inverted index): semantic unit tests on constructed fixtures, where
the expected answer is known independently of the oracle."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cloud_native_reddit_data_pipeline_spark.operators import (
    graph,
    relational,
    sketches,
    textstats,
)


def test_kmv_exact_below_capacity(spark):
    """A group with fewer than k distinct keys reports the exact count
    as its estimate (KMV is exact below capacity)."""
    df = spark.createDataFrame(
        [("g", i % 10) for i in range(100)], "grp_in string, k int"
    )
    out = sketches.kmv_distinct(df, "grp_in", "k", k=64).collect()
    assert len(out) == 1
    assert out[0]["n_exact"] == 10
    assert out[0]["kmv_estimate"] == 10.0


def test_kmv_estimate_near_truth(spark):
    """Above capacity the estimate lands within the standard KMV error
    envelope (~1/sqrt(k-2) relative) of the true cardinality."""
    n = 5000
    df = spark.createDataFrame([(i,) for i in range(n)], "k long").select(
        F.lit("g").alias("grp_in"), "k"
    )
    row = sketches.kmv_distinct(df, "grp_in", "k", k=64).collect()[0]
    assert row["n_exact"] == n
    assert abs(row["kmv_estimate"] - n) / n < 0.5  # 4-sigma envelope


def test_bloom_semi_join_no_false_negatives(spark):
    """Every true match must be a bloom candidate (no false negatives
    ever); false positives are bounded by the m/n regime."""
    fact = spark.createDataFrame([(i % 200,) for i in range(1000)], "fk long")
    dim = spark.createDataFrame([(i,) for i in range(50)], "dk long")
    row = sketches.bloom_semi_join(
        fact, dim, "fk", "dk", m_bits=4096, j_hashes=3
    ).collect()[0]
    assert row["n_probe"] == 1000
    assert row["n_candidates"] >= row["n_true"]  # no false negatives
    assert row["n_true"] == 250  # keys 0..49 appear 5x each
    assert row["n_false_pos"] == row["n_candidates"] - row["n_true"]


def test_pareto_skyline_known_frontier(spark):
    """Hand-checked 2-D skyline: minimize x, maximize y; duplicates of
    a frontier point survive, dominated rows do not."""
    rows = [
        (1, 1.0, 5),  # frontier
        (2, 2.0, 5),  # dominated by 1 (more expensive, same y)
        (3, 2.0, 7),  # frontier
        (4, 3.0, 7),  # dominated by 3
        (5, 3.0, 9),  # frontier
        (6, 1.0, 5),  # duplicate of 1 -> survives
        (7, 0.5, 1),  # frontier (cheapest overall)
    ]
    df = spark.createDataFrame(rows, "id int, x double, y int")
    got = sorted(
        r["id"] for r in relational.pareto_skyline_2d(df, "x", "y").collect()
    )
    assert got == [1, 3, 5, 6, 7]


def test_snapshot_diff_statuses(spark):
    """added/changed/unchanged/removed all classified correctly against
    a constructed event log."""
    rows = [
        # user 1: A at t<=t1, B later -> changed
        (1, 1, "A", "2024-01-10 00:00:00"),
        (2, 1, "B", "2024-01-20 00:00:00"),
        # user 2: only after t1 -> added
        (3, 2, "C", "2024-01-18 00:00:00"),
        # user 3: same value both snapshots -> unchanged
        (4, 3, "D", "2024-01-05 00:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        r["key"]: r["status"]
        for r in relational.snapshot_diff(
            df,
            "user_id",
            "event_type",
            "ts",
            ["ts", "event_id"],
            "2024-01-15 00:00:00",
            "2024-01-25 00:00:00",
        ).collect()
    }
    assert out == {1: "changed", 2: "added", 3: "unchanged"}


def test_sssp_exact_small_graph(spark):
    """Bellman-Ford on a hand-built weighted graph: the 2-edge cheap
    path must beat the 1-edge expensive path once rounds allow it."""
    edges = spark.createDataFrame(
        [(1, 2, 9), (1, 3, 1), (3, 2, 1), (2, 4, 1)],
        "src long, dst long, w int",
    )
    got = {
        r["node"]: r["dist"]
        for r in graph.sssp_bellman_ford(edges, source=1, rounds=3).collect()
    }
    assert got == {1: 0, 3: 1, 2: 2, 4: 3}


def test_sssp_round_bound_semantics(spark):
    """With rounds=1 only direct edges are relaxed — the R-bounded
    contract the oracle replays."""
    edges = spark.createDataFrame(
        [(1, 2, 9), (1, 3, 1), (3, 2, 1)], "src long, dst long, w int"
    )
    got = {
        r["node"]: r["dist"]
        for r in graph.sssp_bellman_ford(edges, source=1, rounds=1).collect()
    }
    assert got == {1: 0, 2: 9, 3: 1}


def test_token_label_chi2_detects_leak(spark):
    """A token perfectly correlated with one label scores far above an
    evenly spread token."""
    rows = []
    for i in range(40):
        label = "a" if i < 20 else "b"
        leak = "leakword" if label == "a" else "otherword"
        rows.append((i, label, f"{leak} common{i % 4} filler"))
    df = spark.createDataFrame(rows, "doc_id long, src string, text string")
    out = {
        r["token"]: r["chi2"]
        for r in textstats.token_label_chi2(
            df, "src", "text", min_df=5, top_n=10
        ).collect()
    }
    assert out["leakword"] == max(out.values())
    assert out["leakword"] > 30.0  # perfect 20/0 split on 40 docs
    assert out["common0"] < 1.0  # evenly spread across labels


def test_inverted_index_postings_sorted_and_complete(spark):
    df = spark.createDataFrame(
        [(3, "x y"), (1, "x z"), (2, "x y z")], "doc_id long, text string"
    )
    out = {
        r["term"]: r
        for r in textstats.inverted_index(df, "doc_id", "text", min_df=2, top_n=10).collect()
    }
    assert out["x"]["postings"] == [1, 2, 3]
    assert out["x"]["doc_freq"] == 3 and out["x"]["coll_freq"] == 3
    assert out["y"]["postings"] == [2, 3]
    assert "z" in out and out["z"]["postings"] == [1, 2]


def test_ohlc_bars_known_values(spark):
    from cloud_native_reddit_data_pipeline_spark.operators import windows as W

    rows = [
        (1, "a", 10.0, "2024-01-01 01:00:00"),
        (2, "a", 30.0, "2024-01-01 02:00:00"),
        (3, "a", 5.0, "2024-01-01 03:00:00"),
        (4, "a", 20.0, "2024-01-01 04:00:00"),
        (5, "a", 7.0, "2024-01-02 01:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, value double, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {str(r["bar_date"]): r for r in W.ohlc_bars(df).collect()}
    d1 = out["2024-01-01"]
    assert (d1["open"], d1["high"], d1["low"], d1["close"]) == (10.0, 30.0, 5.0, 20.0)
    assert d1["volume"] == 4 and d1["mean_value"] == 16.25
    assert out["2024-01-02"]["open"] == out["2024-01-02"]["close"] == 7.0


def test_ohlc_same_timestamp_tiebreak(spark):
    """Equal timestamps: event_id breaks the open/close tie
    deterministically."""
    from cloud_native_reddit_data_pipeline_spark.operators import windows as W

    rows = [
        (2, "a", 99.0, "2024-01-01 01:00:00"),
        (1, "a", 11.0, "2024-01-01 01:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, value double, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    r = W.ohlc_bars(df).collect()[0]
    assert r["open"] == 11.0 and r["close"] == 99.0


def test_daily_trend_exact_line(spark):
    """Points on an exact line y = 2x + 3 (daily totals) recover slope
    2 and intercept 3 exactly."""
    from cloud_native_reddit_data_pipeline_spark.operators import windows as W

    rows = []
    eid = 0
    for day in range(5):
        total = 2 * day + 3
        rows.append((eid, "t", float(total), f"2024-01-{day + 1:02d} 12:00:00"))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, value double, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    r = W.daily_trend(df).collect()[0]
    assert r["n_days"] == 5
    assert r["slope_per_day"] == 2.0
    assert r["intercept"] == 3.0


def test_truncation_recall_full_dims_is_one(spark):
    """Truncating to the full dimensionality must reproduce the ground
    truth exactly: recall 1.0 for every query."""
    from cloud_native_reddit_data_pipeline_spark.operators import similarity as S
    from cloud_native_reddit_data_pipeline_spark.sources.tables import load as L

    emb = L(spark, "/root/testdata/sf0.001", "embeddings")
    dims = len(emb.select("embedding").first()[0])
    out = S.truncation_recall(emb, [0, 1], dims=dims, k=5).collect()
    assert len(out) == 2
    assert all(r["recall_at_k"] == 1.0 for r in out)


def test_frequent_event_paths_support_vs_occurrences(spark):
    """Support counts distinct users; occurrences count repeats — a
    user looping A>B>C twice adds 2 occurrences, 1 support."""
    from cloud_native_reddit_data_pipeline_spark.operators import windows as W

    rows = []
    eid = 0
    # user 1 loops A B C A B C -> A>B>C twice (and B>C>A, C>A>B once)
    for i, t in enumerate(["A", "B", "C", "A", "B", "C"]):
        rows.append((eid, 1, t, f"2024-01-01 0{i+1}:00:00")); eid += 1
    # user 2 does A B C once
    for i, t in enumerate(["A", "B", "C"]):
        rows.append((eid, 2, t, f"2024-01-01 0{i+1}:00:00")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        r["path"]: r
        for r in W.frequent_event_paths(
            df, "user_id", "ts", "event_type", "event_id",
            min_support=1, top_n=10,
        ).collect()
    }
    assert out["A>B>C"]["support"] == 2
    assert out["A>B>C"]["n_occurrences"] == 3
    assert out["B>C>A"]["support"] == 1


def test_seasonal_anomaly_flags_planted_spike(spark):
    """Four calm same-weekday days plus one 10x spike: only the spike
    is flagged."""
    from cloud_native_reddit_data_pipeline_spark.operators import windows as W

    rows = []
    eid = 0
    # Mondays: Jan 1, 8, 15, 22, 29 in 2024
    for d, v in [(1, 10.0), (8, 11.0), (15, 9.0), (22, 10.0), (29, 100.0)]:
        rows.append((eid, 1, "x", v, f"2024-01-{d:02d} 12:00:00")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    # with n samples a single outlier's z is capped at sqrt(n-1) = 2.0,
    # so test the cut at 1.5: spike z ~= 2.0, calm days z ~= 0.5
    out = {
        str(r["day"]): r
        for r in W.seasonal_anomaly_days(df, z_threshold=1.5).collect()
    }
    assert out["2024-01-29"]["is_anomaly"] is True
    assert sum(1 for r in out.values() if r["is_anomaly"]) == 1


def test_clustering_coefficient_triangle_plus_tail(spark):
    """Triangle 1-2-3 with a tail 3-4: nodes 1,2 fully connected
    neighborhoods (1.0); node 3 has degree 3 with one closed pair
    (1/3); node 4 degree 1 is excluded."""
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "src long, dst long"
    )
    out = {r["node"]: r for r in graph.clustering_coefficient(edges).collect()}
    assert out[1]["coefficient"] == 1.0 and out[2]["coefficient"] == 1.0
    assert out[3]["degree"] == 3 and abs(out[3]["coefficient"] - 0.333333) < 1e-6
    assert 4 not in out


def test_cusum_finds_planted_level_shift(spark):
    """A series that jumps from level 10 to level 50 on day 6 peaks its
    cumulative deviation exactly at the last low day (day 5)."""
    from cloud_native_reddit_data_pipeline_spark.operators import windows as W

    rows = []
    eid = 0
    for d in range(1, 11):
        v = 10.0 if d <= 5 else 50.0
        rows.append((eid, 1, "x", v, f"2024-01-{d:02d} 12:00:00")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    r = W.cusum_changepoint(df).collect()[0]
    assert str(r["changepoint_day"]) == "2024-01-05"
    assert r["n_days"] == 10
    # |S_5| = 5*(10-30) = 100
    assert r["max_cusum_dev"] == 100.0


def test_benford_uniform_magnitudes_pass(spark):
    """Values spanning several magnitudes from a log-uniform-ish grid
    produce digit-1 dominance close to 30%; observed counts sum to the
    input size and chi2 contributions are finite."""
    from cloud_native_reddit_data_pipeline_spark.operators import relational as R

    # Leading digits of 2^i are a classic Benford sequence (equi-
    # distribution of i*log10(2) mod 1): digit 1 ~30%, digit 9 ~4.6%.
    vals = [float(2 ** i) for i in range(1, 63)]  # stays within BIGINT
    df = spark.createDataFrame([(v,) for v in vals], "amount double")
    out = {r["digit"]: r for r in R.benford_digit_audit(df, "amount").collect()}
    assert set(out) == set(range(1, 10))
    assert sum(r["n_obs"] for r in out.values()) == len(vals)
    assert out[1]["n_obs"] > 2 * out[9]["n_obs"]
    # a Benford-conforming stream keeps every cell's chi2 small
    assert all(0 <= r["chi2_contrib"] < 5 for r in out.values())


def test_copurchase_recommendations_excludes_owned(spark):
    """Recommendations never include parts the seed already bought, and
    the most-shared neighbor's exclusive part ranks first."""
    from cloud_native_reddit_data_pipeline_spark.operators import recommend as R

    # orders: one order per (cust); baskets via lineitem
    li_rows, o_rows = [], []
    baskets = {
        1: [10, 11, 12],        # seed
        2: [10, 11, 12, 13],    # near-identical neighbor -> recommends 13
        3: [10, 20],            # weak neighbor -> recommends 20
        4: [30, 31],            # no overlap -> not a neighbor
    }
    ok = 0
    for cust, parts in baskets.items():
        ok += 1
        o_rows.append((ok, cust))
        for p in parts:
            li_rows.append((ok, p))
    li = spark.createDataFrame(li_rows, "l_orderkey long, l_partkey long")
    orders = spark.createDataFrame(o_rows, "o_orderkey long, o_custkey long")
    out = R.copurchase_recommendations(li, orders, [1], k_neighbors=5, top_n=5)
    rows = sorted(out.collect(), key=lambda r: r["rec_rank"])
    recommended = [r["recommended_partkey"] for r in rows]
    assert set(recommended).isdisjoint({10, 11, 12})  # owned excluded
    assert recommended[0] == 13  # strongest neighbor's exclusive item
    assert 20 in recommended
    assert 30 not in recommended and 31 not in recommended


def test_split_leakage_detects_planted_duplicate(spark):
    from cloud_native_reddit_data_pipeline_spark import queries as registry
    import tempfile, os, shutil

    # Build a tiny sf dir with a planted cross-split duplicate: find two
    # doc_ids landing in different splits, give them identical text.
    tmp = tempfile.mkdtemp(prefix="leak-")
    try:
        import pyspark.sql.functions as FF
        split = lambda i: int(
            __import__("hashlib").md5(str(i).encode()).hexdigest()[:8], 16
        ) % 10 < 8
        train_id = next(i for i in range(100) if split(i))
        test_id = next(i for i in range(100) if not split(i))
        rows = [
            (train_id, "identical leaked text", "en", "s", 21),
            (test_id, "identical leaked text", "en", "s", 21),
            (max(train_id, test_id) + 1, "unique text", "en", "s", 11),
        ]
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
        out = registry.queries()["split_leakage_check"](spark, tmp).collect()[0]
        assert out["n_leaked_pairs"] == 1
        assert out["n_leaked_test_docs"] == 1
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_readability_hand_computed(spark):
    """'The cat sat. It ran!' -> 5 words, 2 sentences, 5 syllables:
    ease = 206.835 - 1.015*2.5 - 84.6*1.0 = 119.6975."""
    from cloud_native_reddit_data_pipeline_spark.operators import textstats as T

    df = spark.createDataFrame(
        [(1, "The cat sat. It ran!")], "doc_id long, text string"
    )
    r = T.readability_scores(df, "doc_id", "text").collect()[0]
    assert r["n_words"] == 5 and r["n_sentences"] == 2
    assert r["n_syllables"] == 5
    assert abs(r["flesch_ease"] - 119.6975) < 1e-6
    assert abs(r["fk_grade"] - (0.39 * 2.5 + 11.8 - 15.59)) < 1e-6


def test_winsorize_clips_tails(spark):
    """100 values 1..100 per group: p5=5.95, p95=95.05 (percentile_cont
    interpolation); 5 values clipped each side; means hand-checkable."""
    from cloud_native_reddit_data_pipeline_spark.operators import relational as R

    df = spark.createDataFrame(
        [("g", float(i)) for i in range(1, 101)], "event_type string, value double"
    )
    r = R.winsorize_stats(df, "event_type", "value").collect()[0]
    assert r["n_rows"] == 100
    assert abs(r["p_lo"] - 5.95) < 1e-6 and abs(r["p_hi"] - 95.05) < 1e-6
    assert r["n_clipped_lo"] == 5 and r["n_clipped_hi"] == 5
    assert r["mean_raw"] == 50.5
    # clipped mean: replace 1..5 with 5.95 and 96..100 with 95.05
    expected = (50.5 * 100 - sum(range(1, 6)) - sum(range(96, 101))
                + 5 * 5.95 + 5 * 95.05) / 100
    assert abs(r["mean_winsorized"] - round(expected, 4)) < 1e-6


def test_ecdf_normalize_rank_semantics(spark):
    """ECDF of [10, 20, 20, 30]: 10 -> .25, 20 -> .75, 30 -> 1.0."""
    from cloud_native_reddit_data_pipeline_spark.operators import relational as R

    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 20), (4, 30)], "doc_id long, n_chars long"
    )
    out = {r["doc_id"]: r["ecdf"] for r in R.ecdf_normalize(df, "doc_id", "n_chars").collect()}
    assert out == {1: 0.25, 2: 0.75, 3: 0.75, 4: 1.0}


def test_bollinger_flags_breakout_after_warmup(spark):
    """7 calm days then a spike: the spike z is large and flagged; all
    warm-up rows emit NULL z and never flag."""
    from cloud_native_reddit_data_pipeline_spark.operators import windows as W

    rows, eid = [], 0
    vals = [10.0, 11.0, 9.0, 10.0, 11.0, 9.0, 10.0, 60.0]
    for d, v in enumerate(vals, start=1):
        rows.append((eid, 1, "x", v, f"2024-01-{d:02d} 12:00:00")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {str(r["day"]): r for r in W.bollinger_bands(df).collect()}
    assert out["2024-01-08"]["is_breakout"] is True
    assert out["2024-01-08"]["z_score"] > 10
    for d in range(1, 8):
        r = out[f"2024-01-0{d}"]
        assert r["z_score"] is None and r["is_breakout"] is False


def test_gini_known_distributions(spark):
    """Equal values -> gini 0; extreme concentration -> gini near 1;
    top-decile share consistent."""
    from cloud_native_reddit_data_pipeline_spark.operators import relational as R

    eq = spark.createDataFrame(
        [(i, 10.0) for i in range(20)], "k long, v double"
    )
    r = R.concentration_report(eq, "k", "v").collect()[0]
    assert r["n_keys"] == 20 and abs(r["gini"]) < 1e-6
    assert abs(r["top_decile_share"] - 0.1) < 1e-6  # 2 of 20 equal keys

    skew = spark.createDataFrame(
        [(i, 1.0) for i in range(19)] + [(99, 1000.0)], "k long, v double"
    )
    r2 = R.concentration_report(skew, "k", "v").collect()[0]
    assert r2["gini"] > 0.85
    assert r2["top_decile_share"] > 0.98


def test_histogram_quantiles_error_bounded_by_bucket_width(spark):
    """Uniform 0..999: every quantile estimate lands within one bucket
    width of the exact percentile, and the error column agrees."""
    df = spark.createDataFrame([(float(i),) for i in range(1000)], "value double")
    out = {
        r["q"]: r
        for r in sketches.histogram_quantiles(
            df, "value", [0.5, 0.95, 0.99], n_buckets=100
        ).collect()
    }
    width = 999.0 / 100
    for q, r in out.items():
        assert r["abs_error"] <= width + 1e-6
        assert abs(abs(r["estimate"] - r["exact"]) - r["abs_error"]) < 1e-6


def test_hll_distinct_estimates_within_sketch_error(spark):
    from cloud_native_reddit_data_pipeline_spark.operators.sketches import (
        hll_distinct,
    )

    n = 5000
    df = spark.range(n).select((F.col("id") % 2000).alias("k"))
    row = hll_distinct(df, "k").collect()[0]
    assert row.m == 64 and row.true_distinct == 2000
    # standard error ~ 1.04/sqrt(64) = 13%; allow 3 sigma
    assert abs(row.hll_estimate - 2000) / 2000 < 0.4
    assert row.err_ppm == abs(round(row.hll_estimate) - 2000) * 1_000_000 // 2000
    # registers bound the denominator: s_55 <= 64 * 2^55
    assert 0 < row.s_55 <= 64 * (1 << 55)


def test_hll_distinct_rejects_other_m(spark):
    import pytest

    from cloud_native_reddit_data_pipeline_spark.operators.sketches import (
        hll_distinct,
    )

    with pytest.raises(ValueError):
        hll_distinct(spark.range(5), "id", m=128)


def test_hll_distinct_by_groups_and_rolls_up(spark):
    from cloud_native_reddit_data_pipeline_spark.operators.sketches import (
        hll_distinct,
        hll_distinct_by,
    )

    df = spark.range(4000).select(
        (F.col("id") % 2).alias("g"), (F.col("id") % 1000).alias("k")
    )
    rows = {r.g: r for r in hll_distinct_by(df, "k", ["g"]).collect()}
    assert set(rows) == {0, 1}
    for r in rows.values():
        assert r.true_distinct == 500
        assert abs(r.hll_estimate - 500) / 500 < 0.4  # 3 sigma at m=64
    # mergeability: the two groups' registers MAX-combine to the global
    # sketch — check via the global s_55 from hll_distinct
    glob = hll_distinct(df, "k").collect()[0]
    assert glob.true_distinct == 1000
    # a merged register can only increase, so s_55 can only shrink
    assert glob.s_55 <= min(r.s_55 for r in rows.values())


def test_kmv_set_overlap_accuracy_and_capacity(spark):
    """Sketch-algebra contract: estimates land within the KMV error
    envelope of the exact values on the gate data, and below capacity
    (n_union < k) the sketch is EXACT."""
    from cloud_native_reddit_data_pipeline_spark.operators.sketches import (
        kmv_set_overlap,
    )
    from cloud_native_reddit_data_pipeline_spark.sources.tables import load

    orders = load(spark, "/root/testdata/sf0.001", "orders")
    customer = load(spark, "/root/testdata/sf0.001", "customer")
    r = kmv_set_overlap(orders, customer, "o_custkey", "c_custkey", k=64).first()
    # ~1/sqrt(k-1) relative error envelope, generous 3x margin
    assert abs(r["union_est"] - r["n_union_exact"]) / r["n_union_exact"] < 0.4
    assert r["n_inter_exact"] <= r["n_union_exact"]
    if r["n_union_exact"] >= 64:
        true_j = r["n_inter_exact"] / r["n_union_exact"]
        assert abs(r["jaccard_est"] - true_j) < 0.4
    # below capacity: exact passthrough
    small_a = orders.limit(20)
    small = kmv_set_overlap(small_a, small_a, "o_custkey", "o_custkey", k=64).first()
    assert small["union_est"] == float(small["n_union_exact"])
    assert small["jaccard_est"] == 1.0
    assert small["inter_est"] == float(small["n_inter_exact"])
