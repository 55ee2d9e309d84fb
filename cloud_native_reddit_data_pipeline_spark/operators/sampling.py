"""Corpus sampling operators for training-data curation.

The reference has no sampling at all (it processes every harvested
document, redditProcessor.py:79-123); these are additive north-star
operators: every serious LLM data pipeline re-weights its sources
(temperature / alpha sampling a la multilingual LM training) and draws
deterministic fixed-size per-group samples for eval sets.

Both operators are RNG-free: membership is a pure function of the row
key (md5 fraction), so results are identical across runs, engines,
partitionings, and incremental re-ingests — the same invariant as
relational.hash_split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_fraction(key: Column | str) -> Column:
    """Deterministic uniform-ish u(key) in [0, 1): first 8 hex digits of
    md5 as an integer over 16^8.  Matches the SQL oracle exactly
    (both engines compute the same md5 and the same integer division)."""
    c = F.col(key) if isinstance(key, str) else key
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(float(16**8))


def temperature_mixture_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    alpha: float = 0.5,
    budget: int = 1000,
) -> DataFrame:
    """Temperature (alpha) mixture sampling: re-weight groups (sources /
    languages / domains) by count^alpha, renormalize to shares, and keep
    each group's rows at rate min(1, share*budget/count).  alpha<1 flattens
    the mixture (up-samples small sources), alpha=1 keeps natural
    proportions — the standard knob for multilingual/multi-domain
    training mixes.

    Returns the kept rows with their group, the group's rounded keep
    rate, and the deterministic u(key) draw.

    Scale shape: the per-group count is a tiny aggregate (#groups rows)
    broadcast back onto the fact; membership is then a narrow filter —
    the fact table itself never shuffles.  Weight summation is decimal
    so group-iteration order cannot perturb shares, and the keep rate is
    quantized to DECIMAL(18,9) before the membership compare (pow is NOT
    correctly rounded in either engine; the raw double can differ in the
    last ulp)."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    # sum of count^alpha over groups, order-insensitively (decimal sum)
    w = F.pow(F.col("_n").cast("double"), F.lit(alpha))
    weighted = counts.withColumn("_w", w)
    tot = weighted.agg(
        F.sum(F.col("_w").cast("decimal(38,12)")).cast("double").alias("_tw")
    )
    rates = (
        weighted.crossJoin(F.broadcast(tot))
        .withColumn(
            "_rate",
            # quantize to DECIMAL(18,9) before the membership compare:
            # JVM and libm pow are not correctly rounded, so a raw
            # double rate can differ in the last ulp between engines and
            # flip u < rate for a boundary draw (ADVICE r3).  A decimal
            # cast from double rounds half-up identically in both
            # engines, making membership a function of exactly-
            # reproducible values.
            F.least(
                F.lit(1.0),
                (F.col("_w") / F.col("_tw")) * F.lit(float(budget)) / F.col("_n"),
            ).cast("decimal(18,9)"),
        )
        .select(group_col, "_rate")
    )
    u = hash_fraction(key_col)
    return (
        df.join(F.broadcast(rates), group_col)
        .withColumn("_u", u)
        .filter(F.col("_u") < F.col("_rate"))
        .select(
            key_col,
            group_col,
            F.round(F.col("_rate") + F.lit(1e-9), 6).alias("keep_rate"),
            F.round(F.col("_u") + F.lit(1e-9), 6).alias("draw"),
        )
    )


def priority_sample_per_group(
    df: DataFrame, group_col: str, key_col: str, k: int = 10
) -> DataFrame:
    """Deterministic exact-k sample per group: rank rows inside each
    group by their md5 draw (ties broken by key) and keep the k lowest —
    a distributed, re-runnable replacement for per-group reservoir
    sampling (eval-set carving, per-domain spot-check samples).

    Scale shape: one shuffle on the group key; the window ranks within
    each group partition, and rows beyond k are dropped before any
    further stage.  A pathologically hot group degrades one reducer
    only; for k << group size a pre-filter on u(key) < k*c/n would
    bound reducer input, omitted here for exactness."""
    u = hash_fraction(key_col)
    w = Window.partitionBy(group_col).orderBy(
        F.col("_u").asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("_u", u)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select(
            key_col,
            group_col,
            F.col("_rk").alias("sample_rank"),
            F.round(F.col("_u") + F.lit(1e-9), 6).alias("draw"),
        )
    )


def weighted_priority_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int = 100,
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis
    A-ExpJ key formulation): each row draws the deterministic md5
    fraction u(key) and competes on the exponential key -ln(u)/w — the
    k SMALLEST keys form an exact weight-proportional sample.  The
    standard one-pass distributed scheme for importance-weighted corpus
    carving (sample long documents more, rare sources more, etc.).

    Determinism contract: u is shifted to (v + 0.5)/2^32 so ln(0) is
    impossible, and the E-S key is quantized to DECIMAL(28,12) before
    ranking (ln is not correctly rounded in either engine — the same
    last-ulp guard as temperature_mixture_sample), with the row key as
    tie-break.

    Scale shape: a narrow map computes the key, then orderBy+limit
    compiles to TakeOrdered (per-partition top-k + driver merge of k
    rows) — no global sort, no shuffle of the corpus.  The final rank
    window runs on the k collected survivors only."""
    v = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
    ).cast("double")
    u = (v + F.lit(0.5)) / F.lit(float(16**8))
    es_key = (-F.log(u) / F.col(weight_col).cast("double")).cast("decimal(28,12)")
    topk = (
        df.select(
            F.col(key_col),
            F.col(weight_col).alias("weight"),
            es_key.alias("_k"),
        )
        .orderBy(F.col("_k").asc(), F.col(key_col).asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("_k").asc(), F.col(key_col).asc())
    return topk.withColumn("sample_rank", F.row_number().over(w)).select(
        key_col, "weight", F.col("_k").cast("double").alias("es_key"), "sample_rank"
    )


def stratified_split(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    fractions: dict[str, float] | None = None,
) -> DataFrame:
    """Deterministic stratified train/val/test split with EXACT
    per-stratum proportions: rows are ranked inside each stratum by
    md5(id) (a stable pseudo-random order both engines compute
    identically) and the first ceil(f_train * n) go to train, the next
    ceil((f_train + f_val) * n) - train to val, the rest to test —
    so every source keeps the target mix even when strata are tiny or
    skewed (plain hash-threshold splitting drifts on small strata and
    under adversarial id distributions).

    Scale shape: one window partitioned BY STRATUM (each stratum sorts
    in parallel across the cluster; no global order anywhere) plus a
    broadcast per-stratum count.  The md5 rank is reproducible across
    engines, runs, and row order — the property a training pipeline
    needs to re-derive the same split forever."""
    fractions = fractions or {"train": 0.8, "val": 0.1}
    # Per-mille integer cuts: rn <= ceil(n * m/1000) is evaluated as the
    # PURE-INTEGER comparison (rn-1)*1000 < n*m — float ceil(n * 0.9)
    # can land on either side of an exact multiple depending on the
    # engine's double rounding (0.8 + 0.1 is not 0.9 in binary).
    m_train = round(fractions["train"] * 1000)
    m_val = m_train + round(fractions.get("val", 0.0) * 1000)
    w = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    n = Window.partitionBy(stratum_col)
    rn = F.row_number().over(w).cast("long")
    cnt = F.count(F.lit(1)).over(n)
    return df.select(
        F.col(id_col),
        F.col(stratum_col),
        F.when((rn - 1) * 1000 < cnt * m_train, F.lit("train"))
        .when((rn - 1) * 1000 < cnt * m_val, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def dsir_importance_resample(
    corpus: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 256,
    logw_cap: float = 5.0,
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every corpus
    document by the likelihood ratio of a hashed-unigram model of the
    TARGET domain vs one of the raw corpus, then importance-resample
    with a deterministic accept test — the published recipe for
    filtering a 100-TB crawl toward a small high-quality target domain
    without training a classifier.

    Determinism/exactness contract (what makes this value-hash
    gateable): per-BUCKET log-ratios are computed once from integer
    counts and rounded to 1e-6 (two transcendental evaluations per
    bucket, error ~1e-16 — negligible against the rounding grid), then
    every per-document quantity is EXACT integer arithmetic: the doc
    log-weight is an order-free sum of bucket integers, and the accept
    test `u32 * 10^6 < w_e6 * 2^32` compares exact int64 products
    (never a float), with u32 a per-doc md5 draw — the same RNG-free
    membership invariant as every sampler in this module.  The
    per-token average (length normalization) plus `logw_cap` bounds
    exp() so w_e6 stays far inside int64.

    Scale shape: one narrow token map per side; bucket counting is two
    groupBys onto <= n_buckets rows (map-side partial agg collapses to
    the bucket count per task); the bucket->ratio table broadcasts
    (n_buckets rows); the per-doc sum is the corpus's ONE data shuffle
    (by doc id).  Nothing is quadratic, nothing collects.

    Returns the FULL population (one row per corpus doc) with its
    weight and accept flag — auditable selection, not a silent filter."""
    from ..functions.text import tokens

    B = n_buckets

    def bucketize(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.explode_outer(tokens(F.lower(F.col(text_col)))).alias("_w"),
        ).select(
            id_col,
            F.when(
                F.col("_w").isNotNull(),
                F.pmod(
                    F.conv(F.substring(F.md5("_w"), 1, 8), 16, 10).cast("long"),
                    F.lit(B),
                ),
            ).alias("bucket"),
        )

    ct = (
        bucketize(target)
        .filter(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    corpus_toks = bucketize(corpus)
    cc = (
        corpus_toks.filter(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cc"))
    )
    counts = ct.join(cc, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("ct", F.lit(0)).alias("ct"),
        F.coalesce("cc", F.lit(0)).alias("cc"),
    )
    totals = counts.agg(
        F.sum("ct").alias("nt"), F.sum("cc").alias("nc")
    )
    lr = F.broadcast(
        counts.crossJoin(F.broadcast(totals)).select(
            "bucket",
            F.round(
                (
                    F.log(F.col("ct") + 1)
                    - F.log(F.col("nt") + B)
                    - F.log(F.col("cc") + 1)
                    + F.log(F.col("nc") + B)
                )
                * F.lit(1000000.0)
            )
            .cast("long")
            .alias("lr_e6"),
        )
    )
    per_doc = (
        corpus_toks.filter(F.col("bucket").isNotNull())
        .join(lr, "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("lr_e6").alias("logw_e6"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )
    full = corpus.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("logw_e6", F.lit(0)).cast("long").alias("logw_e6"),
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
    )
    logw_avg = F.when(
        F.col("n_tokens") > 0,
        (F.col("logw_e6") / F.col("n_tokens")) / F.lit(1000000.0),
    ).otherwise(F.lit(0.0))
    w_e6 = (
        F.round(F.lit(1000000.0) * F.exp(F.least(logw_avg, F.lit(logw_cap))))
        .cast("long")
    )
    u32 = F.conv(
        F.substring(F.md5(F.concat(F.lit("dsir|"), F.col(id_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    return full.select(
        id_col,
        "n_tokens",
        "logw_e6",
        w_e6.alias("w_e6"),
        (u32 * F.lit(1000000) < w_e6 * F.lit(4294967296)).alias("accepted"),
    )


def token_budget_select(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget_tokens: int,
) -> DataFrame:
    """Budget-constrained corpus selection: rank documents globally by
    lexical diversity (distinct-token ratio, ties to lowest id) and
    keep the prefix of that ranking whose cumulative token count stays
    within `budget_tokens` — the greedy "best data first, stop at the
    token budget" step every fixed-compute training run ends with
    (choose 1T tokens out of 10T; Chinchilla-style budgets make the
    cut, not the corpus size).

    Returns the kept rows with (id, n_tokens, diversity, cum_tokens);
    the boundary document that would cross the budget is excluded
    (cum_tokens <= budget is the membership rule, so the output is a
    pure function of the ranking).

    Scale shape: per-doc stats are a narrow map; the global ranking
    and running total ride `relational.with_global_cumsum` — a
    range-partitioned prefix sum with per-partition offsets, never a
    single-partition window, so the cut scales to any corpus size.
    Diversity is an exact IEEE int/int division (identical in both
    engines); the order is total via the id tie-break."""
    from ..functions.text import tokens
    from .relational import with_global_cumsum

    toks = tokens(text_col)
    base = df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
    ).withColumn(
        "diversity",
        F.when(
            F.col("n_tokens") > 0, F.col("n_distinct") / F.col("n_tokens")
        ).otherwise(F.lit(0.0)),
    )
    ranked = with_global_cumsum(
        base,
        [F.desc("diversity"), F.asc(id_col)],
        "n_tokens",
        "cum_tokens",
    )
    return ranked.filter(F.col("cum_tokens") <= budget_tokens).select(
        id_col,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.col("diversity") + F.lit(1e-9), 6).alias("diversity"),
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
    )


def unimax_allocation(
    df: DataFrame,
    group_col: str,
    budget_docs: int,
    epoch_cap: int = 4,
) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023): split a total
    document budget across sources (languages / domains) as evenly as
    possible, capping each source at `epoch_cap` epochs of its own
    size — the mixture rule that replaced temperature sampling for
    multilingual pretraining (no source is oversampled past its cap;
    leftover budget waterfalls to the larger sources).

    Closed-form waterfill: with sources ascending by capacity, source i
    is CAPPED iff cap_i * (sources remaining at i) <= budget remaining
    at i — an exact integer comparison; every uncapped source gets the
    equal share of what the capped prefix left.  Returns one row per
    source: (group, n_docs, cap_docs, allocated, epochs).

    Scale shape: the corpus collapses to one row per source first
    (partial-agg shuffle); the waterfill window runs over #sources
    rows — bounded metadata, not data — so the single-partition window
    here is the correct plan, not an anti-pattern."""
    counts = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    caps = counts.withColumn(
        "cap_docs", F.col("n_docs") * F.lit(int(epoch_cap))
    )
    w = Window.orderBy(F.asc("cap_docs"), F.asc("grp"))
    wall = Window.partitionBy()
    marked = (
        caps.withColumn("_i", F.row_number().over(w))
        .withColumn(
            "_before",
            F.coalesce(
                F.sum("cap_docs").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn("_n", F.count(F.lit(1)).over(wall))
        .withColumn(
            "_capped",
            F.col("cap_docs") * (F.col("_n") - F.col("_i") + 1)
            <= F.lit(int(budget_docs)) - F.col("_before"),
        )
    )
    tot = marked.agg(
        F.coalesce(
            F.sum(F.when(F.col("_capped"), F.col("cap_docs"))), F.lit(0)
        ).alias("_s"),
        F.coalesce(
            F.sum(F.when(~F.col("_capped"), F.lit(1))), F.lit(0)
        ).alias("_k"),
    )
    alloc = F.when(F.col("_capped"), F.col("cap_docs").cast("double")).otherwise(
        (F.lit(int(budget_docs)) - F.col("_s")) / F.col("_k")
    )
    return (
        marked.crossJoin(F.broadcast(tot))
        .select(
            F.col("grp").alias(group_col),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("cap_docs").cast("long").alias("cap_docs"),
            F.round(alloc + F.lit(1e-9), 4).alias("allocated"),
            F.round(alloc / F.col("n_docs") + F.lit(1e-9), 4).alias("epochs"),
        )
    )


def negative_sampling(
    df: DataFrame,
    text_col: str,
    n_draws: int = 200,
    power: float = 0.75,
) -> DataFrame:
    """word2vec-style negative sampling: draw noise tokens from the
    unigram distribution raised to `power` (0.75 — the Mikolov et al.
    2013 smoothing that up-weights rare words), deterministically.

    Exactness: the smoothed weight pow(c, 0.75) is quantized to
    DECIMAL(18,6) and scaled to integer micro-units BEFORE anything
    else (libm pow is not correctly rounded — the mixture_sample
    lesson), so the cumulative intervals and the interval membership
    test are exact integer arithmetic; the only float step is
    u(draw) * total, identical IEEE doubles in both engines, floored
    to an integer target.

    Scale shape: the vocabulary's cumulative bounds ride
    `relational.with_global_cumsum` (range-partitioned prefix sum —
    a 10M-type vocab never sees a single-partition window); the draw
    table is tiny and BROADCAST against the interval table, so the
    lookup is a constant-work nested-loop per vocab partition — the
    range_band_join shape.  Returns (draw_id, token, target_e6)."""
    from ..functions.text import tokens
    from .relational import with_global_cumsum

    vocab = (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w_e6 = (
        F.pow(F.col("c").cast("double"), F.lit(float(power)))
        .cast("decimal(18,6)")
        * F.lit(1000000)
    ).cast("long")
    weighted = vocab.select("w", w_e6.alias("w_e6")).filter(F.col("w_e6") > 0)
    cum = with_global_cumsum(
        weighted, [F.asc("w")], "w_e6", "cum_hi"
    ).withColumn("cum_lo", F.col("cum_hi") - F.col("w_e6"))
    tot = cum.agg(F.max("cum_hi").alias("t_e6"))
    draws = (
        df.sparkSession.range(n_draws)
        .select(F.col("id").alias("draw_id"))
        .withColumn("u", hash_fraction("draw_id"))
    )
    dt = (
        draws.crossJoin(F.broadcast(tot))
        .select(
            "draw_id",
            F.floor(F.col("u") * F.col("t_e6")).cast("long").alias("target_e6"),
        )
    )
    return (
        cum.join(
            F.broadcast(dt),
            (F.col("cum_lo") <= F.col("target_e6"))
            & (F.col("target_e6") < F.col("cum_hi")),
        )
        .select(
            "draw_id",
            F.col("w").alias("token"),
            "target_e6",
        )
    )


def preference_pairs(
    scored: DataFrame,
    id_col: str,
    score_col: str,
    group_cols: list[str],
    min_margin: int = 0,
) -> DataFrame:
    """RLHF/DPO preference-pair construction from scored candidates:
    within each group (the "same prompt" key), pair the i-th best
    candidate with the i-th worst and keep pairs whose score margin
    clears `min_margin` — the chosen/rejected extraction step between
    reward scoring and preference-tuning data (Ouyang et al. 2022;
    Rafailov et al. 2023 take exactly such max-margin pairs).

    Pairing rides ONE total order per group: the bottom rank is the
    exact REVERSE of the top rank (score desc, id asc vs score asc,
    id desc), so top-i and bottom-i are positions i and n+1-i of the
    same permutation — provably distinct rows whenever 2*i <= n, with
    no same-doc pair even under full score ties.

    Scale shape: two ranks + a count over the SAME group partitioning
    (one shuffle, window sorts reuse the exchange) and an equi-join on
    (group, rank) — no cross join, no global window; group skew is the
    only hazard and each group contributes at most n/2 output rows."""
    wt = Window.partitionBy(*group_cols).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    wb = Window.partitionBy(*group_cols).orderBy(
        F.asc(score_col), F.desc(id_col)
    )
    wn = Window.partitionBy(*group_cols)
    top = scored.select(
        *group_cols,
        F.col(id_col).alias("chosen_id"),
        F.col(score_col).alias("chosen_score"),
        F.row_number().over(wt).alias("pair_idx"),
        F.count(F.lit(1)).over(wn).alias("_n"),
    )
    bot = scored.select(
        *group_cols,
        F.col(id_col).alias("rejected_id"),
        F.col(score_col).alias("rejected_score"),
        F.row_number().over(wb).alias("pair_idx"),
    )
    return (
        top.join(bot, [*group_cols, "pair_idx"])
        .filter((2 * F.col("pair_idx") <= F.col("_n")))
        .filter(
            F.col("chosen_score") - F.col("rejected_score") >= min_margin
        )
        .select(
            *group_cols,
            F.col("pair_idx").cast("long").alias("pair_idx"),
            "chosen_id",
            "rejected_id",
            F.col("chosen_score").cast("long").alias("chosen_score_e3"),
            F.col("rejected_score").cast("long").alias("rejected_score_e3"),
            (F.col("chosen_score") - F.col("rejected_score"))
            .cast("long")
            .alias("margin_e3"),
        )
    )


# Cumulative Poisson(1) CDF, P(X <= k) for k = 0..9; draws above the
# table are clamped to 10 (P ~ 1 - 1e-8 — unreachable with a 32-bit
# uniform at realistic replicate counts).
_POISSON1_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
    0.9999897508076003,
    0.9999988747974512,
    0.9999998885745217,
]


def poisson_bootstrap_ci(
    df: DataFrame,
    key_col: str,
    value_col: str,
    b_reps: int = 100,
    lo: float = 0.025,
    hi: float = 0.975,
    scale: int = 2,
) -> DataFrame:
    """Bootstrap confidence interval for the MEAN of `value_col` by the
    Poisson bootstrap — the only bootstrap that works on data too large
    to index: instead of resampling n rows with replacement (which
    needs global coordination), each row independently receives a
    Poisson(1) weight per replicate, which converges to multinomial
    resampling as n grows (Chamandy et al., "Estimating Uncertainty
    for Massive Data Streams", Google 2012).

    Deterministic and engine-portable: the per-(row, replicate) weight
    is the Poisson(1) inverse CDF applied to a 32-bit md5 fraction of
    "boot|key|b" — no RNG state, identical in SQL.  Replicate sums use
    per-row DECIMAL casts (exact, order-free); the only floats are the
    B replicate means and the final interpolated percentiles (Spark
    `percentile` == DuckDB quantile_cont).

    Scale shape: the B-fold explode never leaves its stage — rows fan
    out to n*B and immediately partial-aggregate to B groups map-side,
    so the shuffle carries ~B rows per task regardless of n.  One row
    out: n_rows, b_reps, mean, ci_lo, ci_hi."""
    from ..sources.tables import fan_out

    # the n x B explode inherits the INPUT's split count — a small
    # single-file table would run the whole exploded hot path on one
    # core (guide §2.5 input skew); fan_out round-robins it to the
    # available parallelism and is a no-op at scale
    df = fan_out(df)
    w_expr = F.lit(len(_POISSON1_CDF))
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("boot|"),
                        F.col("_k"),
                        F.lit("|"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .cast("double")
        / F.lit(4294967296.0)
    )
    for k in range(len(_POISSON1_CDF) - 1, -1, -1):
        w_expr = F.when(u < F.lit(_POISSON1_CDF[k]), F.lit(k)).otherwise(w_expr)
    t = df.select(
        F.col(key_col).cast("string").alias("_k"),
        F.col(value_col).cast(f"decimal(18,{scale})").alias("_x"),
    ).select(
        "_k",
        "_x",
        F.explode(F.sequence(F.lit(0), F.lit(b_reps - 1))).alias("b"),
    )
    reps = (
        t.withColumn("_w", w_expr.cast("decimal(10,0)"))
        .groupBy("b")
        .agg(
            (
                F.sum(F.col("_w") * F.col("_x")).cast("double")
                / F.sum(F.col("_w")).cast("double")
            ).alias("_m")
        )
    )
    ci = reps.agg(
        F.round(F.expr(f"percentile(_m, {lo})") + F.lit(1e-9), 4).alias("ci_lo"),
        F.round(F.expr(f"percentile(_m, {hi})") + F.lit(1e-9), 4).alias("ci_hi"),
    )
    point = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(
            F.sum(F.col(value_col).cast(f"decimal(18,{scale})")).cast("double")
            / F.count(F.lit(1))
            + F.lit(1e-9),
            4,
        ).alias("mean"),
    )
    return point.crossJoin(F.broadcast(ci)).select(
        "n_rows", F.lit(b_reps).alias("b_reps"), "mean", "ci_lo", "ci_hi"
    )


def poisson_bootstrap_lift(
    df: DataFrame,
    key_col: str,
    is_a: "F.Column",
    is_success: "F.Column",
    b_reps: int = 100,
    lo: float = 0.025,
    hi: float = 0.975,
) -> DataFrame:
    """Poisson-bootstrap CI for the LIFT (rate_a - rate_b) between two
    arms — the uncertainty statement the point z-test
    (relational.two_proportion_ztest) doesn't give, and the bootstrap
    form that needs no normality at the tails.  Same machinery as
    `poisson_bootstrap_ci`: deterministic md5 Poisson(1) weights per
    (row, replicate); per (replicate, arm) the weighted successes and
    trials are exact integers, so each replicate's rate difference is
    two integer divisions.  The CI uses NEAREST-RANK percentiles over
    the B replicate diffs (rank ceil(q*B), tie-broken by replicate id)
    — exact selection, immune to the cross-engine interpolation-ulp
    problem.  One row out: n_a, n_b, rate_a, rate_b, lift, ci_lo,
    ci_hi, significant (CI excludes 0).

    Scale shape: the n x B explode partial-aggregates map-side to
    2B rows per task; everything after lives on the B-row replicate
    frame."""
    from ..sources.tables import fan_out

    # the n x B explode inherits the INPUT's split count — a small
    # single-file table would run the whole exploded hot path on one
    # core (guide §2.5 input skew); fan_out round-robins it to the
    # available parallelism and is a no-op at scale
    df = fan_out(df)
    # one md5 yields 128 bits = FOUR 32-bit draws: hash per (row,
    # ceil(B/4)) and slice by b % 4 — 4x fewer md5 evaluations on the
    # n x B hot path, same md5-quality stream, identical in SQL
    h = F.md5(
        F.concat(
            F.lit("lift|"),
            F.col("_k"),
            F.lit("|"),
            F.expr("CAST(b DIV 4 AS STRING)"),
        )
    )
    u = (
        F.conv(
            F.expr(f"substring({'_h'}, 1 + 8 * (b % 4), 8)"),
            16,
            10,
        )
        .cast("long")
        .cast("double")
        / F.lit(4294967296.0)
    )
    w_expr = F.lit(len(_POISSON1_CDF))
    for k in range(len(_POISSON1_CDF) - 1, -1, -1):
        w_expr = F.when(u < F.lit(_POISSON1_CDF[k]), F.lit(k)).otherwise(w_expr)
    t = df.select(
        F.col(key_col).cast("string").alias("_k"),
        is_a.cast("int").alias("_a"),
        is_success.cast("int").alias("_s"),
    ).select(
        "_k",
        "_a",
        "_s",
        F.explode(F.sequence(F.lit(0), F.lit(b_reps - 1))).alias("b"),
    )
    reps = (
        t.withColumn("_h", h)
        .withColumn("_w", w_expr.cast("long"))
        .groupBy("b")
        .agg(
            F.sum(F.col("_w") * F.col("_a") * F.col("_s")).alias("_ca"),
            F.sum(F.col("_w") * F.col("_a")).alias("_na"),
            F.sum(F.col("_w") * (1 - F.col("_a")) * F.col("_s")).alias("_cb"),
            F.sum(F.col("_w") * (1 - F.col("_a"))).alias("_nb"),
        )
        .select(
            "b",
            (
                F.col("_ca").cast("double") / F.col("_na").cast("double")
                - F.col("_cb").cast("double") / F.col("_nb").cast("double")
            ).alias("_diff"),
        )
    )
    from pyspark.sql import Window

    w_ord = Window.orderBy("_diff", "b")
    ranked = reps.withColumn("_rn", F.row_number().over(w_ord))
    # rank = ceil(q * B), computed in exact Python (q, B are params)
    import math

    r_lo, r_hi = math.ceil(lo * b_reps), math.ceil(hi * b_reps)
    ci_lo = ranked.filter(F.col("_rn") == r_lo).select(
        F.round(F.col("_diff") + F.lit(1e-9), 6).alias("ci_lo")
    )
    ci_hi = ranked.filter(F.col("_rn") == r_hi).select(
        F.round(F.col("_diff") + F.lit(1e-9), 6).alias("ci_hi")
    )
    point = df.agg(
        F.sum(is_a.cast("long")).alias("n_a"),
        F.sum((~is_a).cast("long")).alias("n_b"),
        F.sum((is_a & is_success).cast("long")).alias("_sa"),
        F.sum(((~is_a) & is_success).cast("long")).alias("_sb"),
    ).select(
        "n_a",
        "n_b",
        F.round(F.col("_sa").cast("double") / F.col("n_a") + F.lit(1e-9), 6).alias(
            "rate_a"
        ),
        F.round(F.col("_sb").cast("double") / F.col("n_b") + F.lit(1e-9), 6).alias(
            "rate_b"
        ),
        F.round(
            F.col("_sa").cast("double") / F.col("n_a")
            - F.col("_sb").cast("double") / F.col("n_b")
            + F.lit(1e-9),
            6,
        ).alias("lift"),
    )
    return (
        point.crossJoin(F.broadcast(ci_lo))
        .crossJoin(F.broadcast(ci_hi))
        .withColumn(
            "significant",
            (F.col("ci_lo") > 0) | (F.col("ci_hi") < 0),
        )
    )


def poisson_bootstrap_ci_grouped(
    df: DataFrame,
    group_col: str,
    key_col: str,
    value_col: str,
    b_reps: int = 100,
    lo: float = 0.025,
    hi: float = 0.975,
    scale: int = 2,
) -> DataFrame:
    """Per-GROUP Poisson-bootstrap mean CIs — one uncertainty band per
    source/domain/segment in a single pass (the grouped form of
    `poisson_bootstrap_ci`): the per-source quality dashboards a
    curation pipeline publishes need error bars, not just means.

    Same deterministic md5 Poisson(1) weights; replicate sums are
    decimal-exact per (group, replicate); the CI picks NEAREST-RANK
    replicate means (rank = ceil(q*B) within each group, tie-broken by
    replicate id) — exact selection, no cross-engine interpolation.
    Scale shape: the n x B explode partial-aggregates map-side to
    (groups x B) rows; every window partitions by group over exactly B
    rows."""
    import math

    from ..sources.tables import fan_out

    # see poisson_bootstrap_ci: spread the n x B explode across the
    # cluster when the input arrives as one split (no-op at scale)
    df = fan_out(df)
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("boot|"),
                        F.col("_k"),
                        F.lit("|"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .cast("double")
        / F.lit(4294967296.0)
    )
    w_expr = F.lit(len(_POISSON1_CDF))
    for k in range(len(_POISSON1_CDF) - 1, -1, -1):
        w_expr = F.when(u < F.lit(_POISSON1_CDF[k]), F.lit(k)).otherwise(w_expr)
    t = df.select(
        F.col(group_col).alias("_g"),
        F.col(key_col).cast("string").alias("_k"),
        F.col(value_col).cast(f"decimal(18,{scale})").alias("_x"),
    ).select(
        "_g",
        "_k",
        "_x",
        F.explode(F.sequence(F.lit(0), F.lit(b_reps - 1))).alias("b"),
    )
    reps = (
        t.withColumn("_w", w_expr.cast("decimal(10,0)"))
        .groupBy("_g", "b")
        .agg(
            (
                F.sum(F.col("_w") * F.col("_x")).cast("double")
                / F.sum(F.col("_w")).cast("double")
            ).alias("_m")
        )
    )
    w_ord = Window.partitionBy("_g").orderBy("_m", "b")
    ranked = reps.withColumn("_rn", F.row_number().over(w_ord))
    r_lo, r_hi = math.ceil(lo * b_reps), math.ceil(hi * b_reps)
    ci_lo = ranked.filter(F.col("_rn") == r_lo).select(
        "_g", F.round(F.col("_m") + F.lit(1e-9), 4).alias("ci_lo")
    )
    ci_hi = ranked.filter(F.col("_rn") == r_hi).select(
        "_g", F.round(F.col("_m") + F.lit(1e-9), 4).alias("ci_hi")
    )
    point = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(
            F.sum(F.col(value_col).cast(f"decimal(18,{scale})")).cast("double")
            / F.count(F.lit(1))
            + F.lit(1e-9),
            4,
        ).alias("mean"),
    )
    return (
        point.join(ci_lo, "_g")
        .join(ci_hi, "_g")
        .select(
            F.col("_g").alias(group_col),
            "n_rows",
            F.lit(b_reps).alias("b_reps"),
            "mean",
            "ci_lo",
            "ci_hi",
        )
    )
