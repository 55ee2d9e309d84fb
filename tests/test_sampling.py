"""Sampling + history operators: determinism, exact-k, interval chaining.

These are pure functions of the row keys (no RNG), so the tests assert
bit-stable re-runs and partitioning invariance — the properties that make
the operators safe to re-run incrementally at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cloud_native_reddit_data_pipeline_spark.operators.relational import scd2_history
from cloud_native_reddit_data_pipeline_spark.operators.sampling import (
    priority_sample_per_group,
    temperature_mixture_sample,
)
from cloud_native_reddit_data_pipeline_spark.operators.textstats import (
    unigram_divergence,
)
from cloud_native_reddit_data_pipeline_spark.sources.tables import load

SF_SMOKE = "/root/testdata/sf0.001"


def _docs(spark):
    return load(spark, SF_SMOKE, "documents")


def test_mixture_sample_deterministic_and_capped(spark):
    docs = _docs(spark)
    a = temperature_mixture_sample(docs, "source", "doc_id", alpha=0.5, budget=100)
    b = temperature_mixture_sample(
        docs.repartition(7), "source", "doc_id", alpha=0.5, budget=100
    )
    ra = sorted(r.doc_id for r in a.collect())
    rb = sorted(r.doc_id for r in b.collect())
    assert ra == rb and len(ra) > 0
    # keep rate is a probability
    assert a.filter((F.col("keep_rate") < 0) | (F.col("keep_rate") > 1.0 + 1e-9)).count() == 0


def test_mixture_alpha_flattens(spark):
    """alpha=0 gives every source the same target mass -> small sources are
    kept at higher rates than under natural (alpha=1) sampling."""
    docs = _docs(spark)
    flat = temperature_mixture_sample(docs, "source", "doc_id", alpha=0.0, budget=200)
    nat = temperature_mixture_sample(docs, "source", "doc_id", alpha=1.0, budget=200)
    # natural sampling keeps every source at the same rate (budget/N)
    nat_rates = {r.source: r.keep_rate for r in nat.select("source", "keep_rate").distinct().collect()}
    assert len(set(nat_rates.values())) == 1
    flat_rates = {r.source: r.keep_rate for r in flat.select("source", "keep_rate").distinct().collect()}
    counts = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    smallest = min(counts, key=counts.get)
    biggest = max(counts, key=counts.get)
    if counts[smallest] < counts[biggest] and smallest in flat_rates and biggest in flat_rates:
        assert flat_rates[smallest] >= flat_rates[biggest]


def test_priority_sample_exact_k(spark):
    docs = _docs(spark)
    k = 5
    out = priority_sample_per_group(docs, "source", "doc_id", k=k)
    per_group = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    sizes = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for g, n in per_group.items():
        assert n == min(k, sizes[g])
    # deterministic under repartition
    again = priority_sample_per_group(docs.repartition(11), "source", "doc_id", k=k)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_scd2_intervals_chain(spark):
    ev = load(spark, SF_SMOKE, "events")
    hist = scd2_history(ev, "user_id", "ts", "event_type", "event_id").collect()
    by_user: dict[int, list] = {}
    for r in hist:
        by_user.setdefault(r.user_id, []).append(r)
    for user, rows in by_user.items():
        rows.sort(key=lambda r: r.version)
        # exactly one open (current) interval per user, and it is the last
        assert [r.is_current for r in rows].count(True) == 1
        assert rows[-1].is_current and rows[-1].valid_to is None
        for prev, nxt in zip(rows, rows[1:]):
            assert prev.valid_to == nxt.valid_from  # gapless chain
            assert prev.event_type != nxt.event_type  # real change points
            assert nxt.version == prev.version + 1


def test_unigram_divergence_bounds(spark):
    docs = _docs(spark)
    out = unigram_divergence(docs, "source", "text").collect()
    assert len(out) > 0
    for r in out:
        assert r.kl_to_corpus >= -1e-6  # KL >= 0 (tiny float slack)
        assert -1e-6 <= r.tv_to_corpus <= 1.0 + 1e-6
        assert r.n_tokens > 0 and r.vocab_size > 0


def test_weighted_sample_matches_python_formula(spark):
    import hashlib
    import math
    from decimal import Decimal

    from cloud_native_reddit_data_pipeline_spark.operators.sampling import (
        weighted_priority_sample,
    )
    from cloud_native_reddit_data_pipeline_spark.sources.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    rows = {r.doc_id: r.n_chars for r in docs.select("doc_id", "n_chars").collect()}

    def es_key(doc_id, w):
        v = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
        u = (v + 0.5) / 16**8
        return Decimal(-math.log(u) / w).quantize(Decimal("1e-12"))

    want = sorted(rows, key=lambda d: (es_key(d, rows[d]), d))[:20]
    got = [
        r.doc_id
        for r in weighted_priority_sample(docs, "doc_id", "n_chars", k=20)
        .orderBy("sample_rank")
        .collect()
    ]
    assert got == want


def test_stratified_split_exact_proportions(spark):
    """Every stratum hits the per-mille cuts exactly (ceil semantics),
    including tiny strata, and the split is order-independent."""
    import math

    from cloud_native_reddit_data_pipeline_spark.operators.sampling import (
        stratified_split,
    )

    rows = [(i, f"s{i % 7}") for i in range(203)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = stratified_split(df, "source", "doc_id").collect()
    from collections import Counter

    per = {}
    for r in out:
        per.setdefault(r["source"], Counter())[r["split"]] += 1
    for src, c in per.items():
        n = sum(c.values())
        assert c["train"] == math.ceil(n * 0.8), (src, c)
        assert c["train"] + c["val"] == math.ceil(n * 0.9), (src, c)
    # shuffled input -> identical assignment (md5 rank is content-based)
    out2 = stratified_split(
        df.orderBy(F.desc("doc_id")).repartition(7), "source", "doc_id"
    ).collect()
    assert {(r["doc_id"], r["split"]) for r in out} == {
        (r["doc_id"], r["split"]) for r in out2
    }


def test_zipf_spectrum_partitions_vocabulary(spark):
    """Buckets partition the distinct vocab and carry the full corpus
    mass; bucket bounds respect the power-of-two bands."""
    from cloud_native_reddit_data_pipeline_spark.functions.text import tokens
    from cloud_native_reddit_data_pipeline_spark.operators.textstats import (
        zipf_token_spectrum,
    )

    docs = spark.createDataFrame(
        [(1, "a a a a b b c"), (2, "a b c d e f g"), (3, "a a b")],
        "doc_id long, text string",
    )
    out = zipf_token_spectrum(docs, "text").collect()
    toks = docs.select(F.explode(tokens("text")).alias("t"))
    assert sum(r["n_terms"] for r in out) == toks.select("t").distinct().count()
    assert sum(r["total_occurrences"] for r in out) == toks.count()
    for r in out:
        lo, hi = 2 ** r["log2_freq_bucket"], 2 ** (r["log2_freq_bucket"] + 1)
        assert lo <= r["min_freq"] <= r["max_freq"] < hi


def test_unicode_script_profile_counts(spark):
    from cloud_native_reddit_data_pipeline_spark.operators.textstats import (
        unicode_script_profile,
    )

    docs = spark.createDataFrame(
        [(1, "hello 世界世"), (2, "abc"), (3, "жж")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in unicode_script_profile(docs, "doc_id", "text").collect()}
    assert out[1]["n_cjk"] == 3 and out[1]["n_latin"] == 5
    assert out[1]["nonlatin_flag"] is True
    assert out[2]["n_latin"] == 3 and out[2]["latin_ratio"] == 1.0
    assert out[2]["nonlatin_flag"] is False
    assert out[3]["n_cyrillic"] == 2 and out[3]["n_latin"] == 0
    for r in out.values():
        assert (
            r["n_latin"] + r["n_cjk"] + r["n_cyrillic"] + r["n_arabic"] + r["n_other"]
            == r["n_chars"]
        )


def test_dsir_importance_resample_discriminates(spark):
    """Docs written in the target's vocabulary must out-weigh docs from
    a disjoint vocabulary, and the accept test must be the exact
    integer comparison (no float in the accept path)."""
    from cloud_native_reddit_data_pipeline_spark.operators.sampling import (
        dsir_importance_resample,
    )

    target = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon") for i in range(10)],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [(100 + i, "alpha beta gamma delta epsilon") for i in range(20)]
        + [(200 + i, "zeta eta theta iota kappa") for i in range(20)]
        + [(300, "")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dsir_importance_resample(
        corpus, target, "doc_id", "text", n_buckets=64
    ).collect()}
    assert len(out) == 41
    on_target = [out[100 + i] for i in range(20)]
    off_target = [out[200 + i] for i in range(20)]
    assert all(r.w_e6 == on_target[0].w_e6 for r in on_target)  # same text
    assert on_target[0].w_e6 > off_target[0].w_e6  # ratio discriminates
    assert on_target[0].logw_e6 > off_target[0].logw_e6
    # empty doc: zero tokens, weight exp(0) = 1.0 exactly, accepted
    empty = out[300]
    assert (empty.n_tokens, empty.logw_e6, empty.w_e6) == (0, 0, 1000000)
    assert empty.accepted
    # determinism: second run bit-identical
    again = {r.doc_id: r for r in dsir_importance_resample(
        corpus, target, "doc_id", "text", n_buckets=64
    ).collect()}
    assert all(tuple(out[k]) == tuple(again[k]) for k in out)


def test_token_budget_select_greedy_prefix(spark):
    from cloud_native_reddit_data_pipeline_spark.operators.sampling import (
        token_budget_select,
    )

    df = spark.createDataFrame(
        [
            (1, "a b c d"),          # 4 tokens, diversity 1.0
            (2, "a a a a a a"),      # 6 tokens, diversity 1/6
            (3, "x y z"),            # 3 tokens, diversity 1.0
            (4, "p p q q"),          # 4 tokens, diversity 0.5
            (5, ""),                 # empty: diversity 0, never selected
        ],
        "doc_id long, text string",
    )
    # ranking: doc1 (div 1.0, 4 tok), doc3 (div 1.0, 3 tok), doc4
    # (0.5, 4 tok), doc2 (1/6, 6 tok), doc5 (0, 0 tok)
    out = {r.doc_id: r for r in
           token_budget_select(df, "doc_id", "text", budget_tokens=10).collect()}
    assert set(out) == {1, 3}  # cum 4, 7; doc4 would hit 11 > 10
    assert out[1].cum_tokens == 4 and out[3].cum_tokens == 7
    # budget exactly at the boundary INCLUDES the boundary doc
    out11 = {r.doc_id for r in
             token_budget_select(df, "doc_id", "text", budget_tokens=11).collect()}
    assert out11 == {1, 3, 4}
    # zero-token doc rides along at the very end only if budget allows
    out_all = {r.doc_id: r for r in
               token_budget_select(df, "doc_id", "text", budget_tokens=999).collect()}
    assert set(out_all) == {1, 2, 3, 4, 5}
    assert out_all[5].n_tokens == 0 and out_all[5].cum_tokens == 17


def test_unimax_allocation_matches_greedy_waterfill(spark):
    from cloud_native_reddit_data_pipeline_spark.operators.sampling import (
        unimax_allocation,
    )

    # sources sized 10, 40, 100, 400 docs; epoch_cap=1 so caps = sizes;
    # budget 300 -> greedy waterfill gives 10, 40, 100, 150
    rows = [(f"s{i}", j) for i, n in enumerate([10, 40, 100, 400])
            for j in range(n)]
    df = spark.createDataFrame(rows, "source string, x long")
    out = {r.source: r for r in
           unimax_allocation(df, "source", budget_docs=300, epoch_cap=1).collect()}
    assert out["s0"].allocated == 10.0 and out["s0"].epochs == 1.0
    assert out["s1"].allocated == 40.0
    assert out["s2"].allocated == 100.0
    assert out["s3"].allocated == 150.0
    assert abs(out["s3"].epochs - 0.375) < 1e-9
    # epoch cap binds: epoch_cap=2 with a huge budget caps every source
    out2 = {r.source: r for r in
            unimax_allocation(df, "source", budget_docs=10**6, epoch_cap=2).collect()}
    assert all(out2[s].allocated == out2[s].cap_docs for s in out2)
    assert all(out2[s].epochs == 2.0 for s in out2)


def test_negative_sampling_exact_inverse_cdf(spark):
    from cloud_native_reddit_data_pipeline_spark.operators.sampling import (
        negative_sampling,
    )

    # vocabulary: 'a' x 81, 'b' x 16, 'c' x 1 -> weights 81^.75=27,
    # 16^.75=8, 1 -> intervals of exactly 27/8/1 millionths' widths
    text = " ".join(["a"] * 81 + ["b"] * 16 + ["c"])
    df = spark.createDataFrame([(text,)], "text string")
    out = negative_sampling(df, "text", n_draws=500).collect()
    assert len(out) == 500  # every draw hits exactly one interval
    from collections import Counter

    freq = Counter(r.token for r in out)
    # expected shares 27/36, 8/36, 1/36 — loose bounds on 500 draws
    assert freq["a"] > 300 and freq["b"] > 60 and freq.get("c", 0) < 40
    # deterministic: second run identical
    again = negative_sampling(df, "text", n_draws=500).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_preference_pairs_max_margin_and_tie_safety(spark):
    from cloud_native_reddit_data_pipeline_spark.operators.sampling import (
        preference_pairs,
    )

    rows = [
        # group A: scores 10, 7, 5, 2 -> pairs (10,2), (7,5)
        (1, "A", 10), (2, "A", 7), (3, "A", 5), (4, "A", 2),
        # group B: all-tied scores -> margins 0, dropped at min_margin=1
        (5, "B", 3), (6, "B", 3), (7, "B", 3),
        # group C: single doc -> no pair
        (8, "C", 9),
    ]
    df = spark.createDataFrame(rows, "doc_id long, grp string, score long")
    out = preference_pairs(df, "doc_id", "score", ["grp"], min_margin=1)
    got = {(r.grp, r.pair_idx): r for r in out.collect()}
    assert set(got) == {("A", 1), ("A", 2)}
    assert (got[("A", 1)].chosen_id, got[("A", 1)].rejected_id) == (1, 4)
    assert (got[("A", 2)].chosen_id, got[("A", 2)].rejected_id) == (2, 3)
    assert got[("A", 1)].margin_e3 == 8 and got[("A", 2)].margin_e3 == 2
    # with min_margin=0 the tied group emits pairs but NEVER a self-pair
    out0 = preference_pairs(df, "doc_id", "score", ["grp"], min_margin=0)
    for r in out0.collect():
        assert r.chosen_id != r.rejected_id


def test_poisson_bootstrap_ci_brackets_mean(spark):
    from cloud_native_reddit_data_pipeline_spark.operators.sampling import (
        poisson_bootstrap_ci,
    )

    df = spark.createDataFrame(
        [(i, float(100 + (i * 37) % 50)) for i in range(400)], "k long, v double"
    )
    row = poisson_bootstrap_ci(df, "k", "v", b_reps=60).collect()[0]
    assert row.n_rows == 400 and row.b_reps == 60
    assert row.ci_lo < row.mean < row.ci_hi
    # v spans [100, 150): a 95% CI for the mean of 400 draws is tight
    assert row.ci_hi - row.ci_lo < 10
    # deterministic: second run bit-identical
    row2 = poisson_bootstrap_ci(df, "k", "v", b_reps=60).collect()[0]
    assert row == row2


def test_poisson_weights_mean_near_one(spark):
    # Internal invariant: the average Poisson(1) weight over many
    # (row, replicate) draws must be ~1 (resample size ~ n).
    from pyspark.sql import functions as F

    from cloud_native_reddit_data_pipeline_spark.operators.sampling import (
        _POISSON1_CDF,
    )

    u = (
        F.conv(F.substring(F.md5(F.col("s")), 1, 8), 16, 10)
        .cast("long")
        .cast("double")
        / F.lit(4294967296.0)
    )
    w = F.lit(len(_POISSON1_CDF))
    for k in range(len(_POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(_POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    df = spark.range(20000).select(F.concat(F.lit("t|"), F.col("id")).alias("s"))
    m = df.select(F.avg(w).alias("m")).collect()[0].m
    assert 0.97 < m < 1.03


def test_poisson_bootstrap_lift_detects_real_gap(spark):
    from pyspark.sql import functions as F

    from cloud_native_reddit_data_pipeline_spark.operators.sampling import (
        poisson_bootstrap_lift,
    )

    # arm a converts at 60%, arm b at 20% over 400 rows each: the CI
    # must exclude 0 and bracket the true lift of 0.4
    rows = [(i, "a", 1 if i % 5 < 3 else 0) for i in range(400)] + [
        (400 + i, "b", 1 if i % 5 < 1 else 0) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "k long, arm string, s int")
    row = poisson_bootstrap_lift(
        df, "k", F.col("arm") == "a", F.col("s") == 1, b_reps=80
    ).collect()[0]
    assert (row.n_a, row.n_b) == (400, 400)
    assert abs(row.lift - 0.4) < 1e-9
    assert row.ci_lo < 0.4 < row.ci_hi
    assert row.ci_hi - row.ci_lo < 0.2
    assert row.significant


def test_poisson_bootstrap_lift_null_effect_not_significant(spark):
    from pyspark.sql import functions as F

    from cloud_native_reddit_data_pipeline_spark.operators.sampling import (
        poisson_bootstrap_lift,
    )

    # identical 30% rates in both arms: CI must cover 0
    rows = [(i, "a" if i % 2 == 0 else "b", 1 if (i // 2) % 10 < 3 else 0)
            for i in range(800)]
    df = spark.createDataFrame(rows, "k long, arm string, s int")
    row = poisson_bootstrap_lift(
        df, "k", F.col("arm") == "a", F.col("s") == 1, b_reps=80
    ).collect()[0]
    assert row.lift == 0.0
    assert row.ci_lo <= 0 <= row.ci_hi
    assert not row.significant


def test_grouped_bootstrap_ci_brackets_per_group_mean(spark):
    from cloud_native_reddit_data_pipeline_spark.operators.sampling import (
        poisson_bootstrap_ci_grouped,
    )

    rows = [(i, "lo", float(10 + i % 5)) for i in range(300)] + [
        (1000 + i, "hi", float(100 + i % 5)) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "k long, g string, v double")
    got = {
        r.g: r
        for r in poisson_bootstrap_ci_grouped(
            df, "g", "k", "v", b_reps=60
        ).collect()
    }
    for g, center in (("lo", 12.0), ("hi", 102.0)):
        r = got[g]
        assert r.n_rows == 300 and r.b_reps == 60
        assert r.ci_lo < r.mean < r.ci_hi
        assert abs(r.mean - center) < 0.01
        assert r.ci_hi - r.ci_lo < 2.0
    # the two groups' CIs must not overlap (they are 90 apart)
    assert got["lo"].ci_hi < got["hi"].ci_lo
