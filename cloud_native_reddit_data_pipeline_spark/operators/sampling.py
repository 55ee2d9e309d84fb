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
