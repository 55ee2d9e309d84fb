"""Deterministic, exactly-oracle-checkable sketches (north-star
extension; the reference pipeline has no sketch story, but cardinality
and membership sketches are core OLAP-at-scale machinery).

Spark's built-in sketches (``approx_count_distinct`` HLL++,
``BloomFilterAggregate``) are approximate-by-construction with opaque
binary buffers, so they can only ever be rows-only-checked.  These
operators instead build the sketches from md5-slice hashes — the same
bit-reproducible hashing convention as ``textstats.cms_point_estimates``
— so DuckDB can replay the identical construction and the driver's
value-hash gate proves the estimator END TO END, not just its shape:

- ``kmv_distinct``      k-minimum-values distinct-count estimator
                        (Bar-Yossef et al. 2002): per group, keep the k
                        smallest hash values; estimate = (k-1) / h_(k).
- ``bloom_semi_join``   classic bloom-filtered semi-join with exact
                        false-positive accounting: build an m-bit /
                        j-hash filter over the dim keys, probe the fact
                        side, and report candidate / true / false-
                        positive counts.

Hash fraction convention: the first 13 hex chars of md5 are 52 bits —
exactly a double's mantissa — parsed with ``conv(_, 16, 10)`` on Spark
and ``CAST('0x'||_ AS BIGINT)`` on DuckDB, so both engines see the same
integer in [0, 16^13).

Scale shape: KMV is one distinct + one per-group top-k window (the
sketch state per group is k values — this is the mergeable-sketch
pattern: partial k-mins union then re-min); the bloom bit table is
O(m) rows and broadcast to the probe side, which is exactly how
Spark's own runtime row-level filters ship build-side bloom bits to
the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HEX13 = 16**13  # 2^52: hash-fraction denominator, exact in a double


def _h52(col) -> F.Column:
    """52-bit uniform hash of a column: first 13 hex chars of md5 of
    the value's canonical string form, as BIGINT in [0, 2^52)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 13), 16, 10).cast(
        "long"
    )


def kmv_distinct(
    df: DataFrame, group_col: str, key_col: str, k: int = 64
) -> DataFrame:
    """K-minimum-values distinct estimate per group, next to the exact
    count: hash every key to a 52-bit fraction, keep the k smallest
    DISTINCT hashes per group, estimate |D| = (k-1) * M / h_(k) where
    h_(k) is the k-th minimum and M = 16^13.  Groups with fewer than k
    distinct keys report the exact count (the sketch is exact below
    capacity — standard KMV semantics).

    The estimate column is ROUND(est, 4) DOUBLE computed from exact
    BIGINTs with one division, so DuckDB replays it bit-for-bit.

    Scale: one distinct shuffle on (group, hash) then a per-group
    top-k window — per-group state is k longs, mergeable by union +
    re-min, which is how the partial sketches would combine across
    100 TB of partitions."""
    h = (
        df.select(F.col(group_col).alias("grp"), _h52(F.col(key_col)).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("grp").orderBy("h")
    ranked = h.select(
        "grp",
        "h",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("grp")).alias("nd"),
    )
    return (
        ranked.filter((F.col("rn") == k) | ((F.col("nd") < k) & (F.col("rn") == 1)))
        .select(
            "grp",
            F.col("nd").cast("long").alias("n_exact"),
            F.when(
                F.col("nd") >= k,
                F.round(
                    F.lit(float(k - 1)) * F.lit(float(_HEX13)) / F.col("h"), 4
                ),
            )
            .otherwise(F.col("nd").cast("double"))
            .alias("kmv_estimate"),
        )
    )


def kmv_oracle_sql(
    table: str, group_expr: str, key_expr: str, k: int = 64
) -> str:
    """DuckDB twin of `kmv_distinct` — identical md5-slice hashing and
    (k-1)*M/h_k arithmetic."""
    return f"""
    WITH h AS (
      SELECT DISTINCT {group_expr} AS grp,
             CAST(concat('0x', substring(md5(CAST({key_expr} AS VARCHAR)), 1, 13))
                  AS BIGINT) AS h
      FROM {table}
    ),
    r AS (
      SELECT grp, h,
             row_number() OVER (PARTITION BY grp ORDER BY h) AS rn,
             COUNT(*) OVER (PARTITION BY grp) AS nd
      FROM h
    )
    SELECT grp,
           CAST(nd AS BIGINT) AS n_exact,
           CASE WHEN nd >= {k}
                THEN ROUND(CAST({k - 1} AS DOUBLE) * CAST({_HEX13} AS DOUBLE) / h, 4)
                ELSE CAST(nd AS DOUBLE) END AS kmv_estimate
    FROM r
    WHERE rn = {k} OR (nd < {k} AND rn = 1)
    """


def bloom_semi_join(
    fact: DataFrame,
    dim_keys: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 8192,
    j_hashes: int = 3,
) -> DataFrame:
    """Bloom-filtered semi-join with exact false-positive accounting —
    the runtime-filter pattern (build-side bloom shipped to the probe
    scan) made visible and exactly checkable.

    Build: each distinct dim key sets j bit positions
    ``md5(i || '|' || key)[0:8] % m``.  Probe: a fact row is a bloom
    CANDIDATE iff all j of its positions are set.  Output is one row:
    probe count, candidate count, true-match count (exact semi-join),
    false positives, and the measured fp rate among true negatives.

    Scale: the bit table is at most m rows (here 8 KiB worth) —
    broadcast to the probe side, so the fact table is scanned once
    with no shuffle; the exact semi-join for accounting broadcasts
    the dim keys the same way.  In production the accounting columns
    are dropped and the candidate filter IS the pushed-down runtime
    filter."""
    dk = dim_keys.select(F.col(dim_key).cast("string").alias("_k")).distinct()
    hash_idx = F.explode(
        F.array(*[F.lit(i) for i in range(j_hashes)])
    ).alias("i")
    bits = (
        dk.select("_k", hash_idx)
        .select(
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("|", F.col("i"), F.col("_k"))), 1, 8
                    ),
                    16,
                    10,
                ).cast("long")
                % m_bits
            ).alias("bit")
        )
        .distinct()
    )
    probe = fact.select(F.col(fact_key).cast("string").alias("_k"))
    probe_bits = probe.withColumn("_rid", F.monotonically_increasing_id()).select(
        "_rid",
        "_k",
        hash_idx,
    ).select(
        "_rid",
        "_k",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", F.col("i"), F.col("_k"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % m_bits
        ).alias("bit"),
    )
    hits_per_row = (
        probe_bits.join(F.broadcast(bits), "bit", "left_semi")
        .groupBy("_rid", "_k")
        .agg(F.count(F.lit(1)).alias("_nbits"))
    )
    candidates = hits_per_row.filter(F.col("_nbits") == j_hashes).select(
        "_rid", "_k"
    )
    true_rows = probe.join(F.broadcast(dk), "_k", "left_semi")
    n_probe = probe.agg(F.count(F.lit(1)).alias("c"))
    n_cand = candidates.agg(F.count(F.lit(1)).alias("c"))
    n_true = true_rows.agg(F.count(F.lit(1)).alias("c"))
    return (
        n_probe.select(F.col("c").alias("n_probe"))
        .crossJoin(n_cand.select(F.col("c").alias("n_candidates")))
        .crossJoin(n_true.select(F.col("c").alias("n_true")))
        .select(
            "n_probe",
            "n_candidates",
            "n_true",
            (F.col("n_candidates") - F.col("n_true")).alias("n_false_pos"),
            F.round(
                (F.col("n_candidates") - F.col("n_true"))
                / F.greatest(F.col("n_probe") - F.col("n_true"), F.lit(1)),
                6,
            ).alias("fp_rate"),
        )
    )


def bloom_oracle_sql(
    fact_table: str,
    fact_key: str,
    dim_sql: str,
    m_bits: int = 8192,
    j_hashes: int = 3,
) -> str:
    """DuckDB twin of `bloom_semi_join`; `dim_sql` selects one column
    of dim keys."""
    idx = ", ".join(str(i) for i in range(j_hashes))
    return f"""
    WITH dk AS (SELECT DISTINCT CAST(k AS VARCHAR) AS k FROM ({dim_sql})),
    bits AS (
      SELECT DISTINCT
             CAST(concat('0x', substring(md5(i || '|' || k), 1, 8)) AS BIGINT)
             % {m_bits} AS bit
      FROM dk CROSS JOIN (SELECT unnest([{idx}]) AS i)
    ),
    probe AS (
      SELECT row_number() OVER () AS rid, CAST({fact_key} AS VARCHAR) AS k
      FROM {fact_table}
    ),
    pb AS (
      SELECT p.rid, p.k,
             CAST(concat('0x', substring(md5(i || '|' || p.k), 1, 8)) AS BIGINT)
             % {m_bits} AS bit
      FROM probe p CROSS JOIN (SELECT unnest([{idx}]) AS i)
    ),
    cand AS (
      SELECT rid FROM pb
      WHERE bit IN (SELECT bit FROM bits)
      GROUP BY rid, k HAVING COUNT(*) = {j_hashes}
    ),
    stats AS (
      SELECT (SELECT COUNT(*) FROM probe) AS n_probe,
             (SELECT COUNT(*) FROM cand) AS n_candidates,
             (SELECT COUNT(*) FROM probe WHERE k IN (SELECT k FROM dk)) AS n_true
    )
    SELECT CAST(n_probe AS BIGINT) AS n_probe,
           CAST(n_candidates AS BIGINT) AS n_candidates,
           CAST(n_true AS BIGINT) AS n_true,
           CAST(n_candidates - n_true AS BIGINT) AS n_false_pos,
           ROUND((n_candidates - n_true) * 1.0
                 / GREATEST(n_probe - n_true, 1), 6) AS fp_rate
    FROM stats
    """


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    quantiles: list[float],
    n_buckets: int = 256,
) -> DataFrame:
    """Mergeable fixed-grid histogram quantile sketch, with its error
    measured against the exact percentile in the same pass — the
    deterministic, oracle-checkable counterpart of the opaque KLL/
    GK sketches behind `approx_percentile` (which can only ever be
    rows-only-checked).

    Build: bucket = floor((x - min) / width) over an equi-width grid
    sized from the exact min/max (one lightweight agg), counts per
    bucket (the mergeable state: two histograms merge by summing
    buckets).  Query: quantile q reads the first bucket whose
    cumulative count reaches ceil(q * n) and reports the bucket's
    upper edge — a one-sided estimate whose error is bounded by the
    bucket width.  Output per quantile: estimate, exact value
    (percentile_cont), and |error|.

    Scale: the histogram is one partial-agg shuffle bounded by
    n_buckets rows regardless of input size; the exact percentile is
    computed here only to REPORT the sketch's error (drop it in
    production and the whole operator is sketch-state only)."""
    bounds = df.agg(
        F.min(value_col).alias("_lo"), F.max(value_col).alias("_hi"),
        F.count(F.lit(1)).alias("_n"),
    )
    with_b = df.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.lit(n_buckets - 1),
            F.floor(
                (F.col(value_col) - F.col("_lo"))
                / ((F.col("_hi") - F.col("_lo")) / n_buckets)
            ),
        ).cast("int").alias("bucket")
    )
    hist = with_b.groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select("bucket", F.sum("c").over(w).alias("cumc")).crossJoin(
        F.broadcast(bounds)
    )
    qs = F.explode(
        F.array(*[F.lit(float(q)) for q in quantiles])
    ).alias("q")
    targets = bounds.select(qs, F.ceil(F.col("_n") * F.col("q")).alias("_target"))
    est = (
        cum.join(F.broadcast(targets), F.col("cumc") >= F.col("_target"))
        .groupBy("q")
        .agg(
            F.min("bucket").alias("_b"),
            F.first("_lo").alias("_lo2"),
            F.first("_hi").alias("_hi2"),
        )
        .select(
            "q",
            F.round(
                F.col("_lo2")
                + (F.col("_b") + 1)
                * ((F.col("_hi2") - F.col("_lo2")) / n_buckets)
                + F.lit(1e-9),
                4,
            ).alias("estimate"),
        )
    )
    exact = df.agg(
        *[
            F.expr(f"percentile({value_col}, {float(q)})").alias(f"_e{i}")
            for i, q in enumerate(quantiles)
        ]
    ).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(float(q)).alias("q"),
                        F.round(F.col(f"_e{i}") + F.lit(1e-9), 4).alias("exact"),
                    )
                    for i, q in enumerate(quantiles)
                ]
            )
        ).alias("s")
    ).select("s.q", "s.exact")
    return (
        est.join(F.broadcast(exact), "q")
        .select(
            "q",
            "estimate",
            "exact",
            F.round(F.abs(F.col("estimate") - F.col("exact")) + F.lit(1e-9), 4).alias(
                "abs_error"
            ),
        )
    )


def histogram_quantiles_oracle_sql(
    table: str, value_expr: str, quantiles: list[float], n_buckets: int = 256
) -> str:
    """DuckDB twin of `histogram_quantiles`."""
    qlist = ", ".join(str(float(q)) for q in quantiles)
    exact_cols = " UNION ALL ".join(
        f"SELECT {float(q)} AS q, ROUND(quantile_cont({value_expr}, {float(q)}) + 1e-9, 4) AS exact_v FROM {table}"
        for q in quantiles
    )
    return f"""
    WITH bounds AS (
      SELECT MIN({value_expr}) AS lo, MAX({value_expr}) AS hi, COUNT(*) AS n
      FROM {table}
    ),
    b AS (
      SELECT LEAST({n_buckets - 1},
                   CAST(FLOOR(({value_expr} - bounds.lo)
                        / ((bounds.hi - bounds.lo) / {n_buckets})) AS INT))
               AS bucket
      FROM {table} CROSS JOIN bounds
    ),
    hist AS (SELECT bucket, COUNT(*) AS c FROM b GROUP BY bucket),
    cum AS (
      SELECT bucket, SUM(c) OVER (ORDER BY bucket) AS cumc FROM hist
    ),
    targets AS (
      SELECT CAST(q AS DOUBLE) AS q, CEIL(bounds.n * q) AS target
      FROM (SELECT unnest([{qlist}]) AS q) CROSS JOIN bounds
    ),
    est AS (
      SELECT t.q,
             ROUND(bounds.lo + (MIN(cum.bucket) + 1)
                   * ((bounds.hi - bounds.lo) / {n_buckets}) + 1e-9, 4)
               AS estimate
      FROM targets t
      JOIN cum ON cum.cumc >= t.target
      CROSS JOIN bounds
      GROUP BY t.q, bounds.lo, bounds.hi
    ),
    exact AS ({exact_cols})
    SELECT est.q, est.estimate, exact.exact_v AS exact,
           ROUND(ABS(est.estimate - exact.exact_v) + 1e-9, 4) AS abs_error
    FROM est JOIN exact ON exact.q = est.q
    """


def hll_distinct(
    df: DataFrame,
    key_col: str,
    m: int = 64,
) -> DataFrame:
    """From-scratch HyperLogLog (Flajolet et al. 2007) with fully
    value-hash-checkable internals, completing the sketch family
    (KMV / bloom / CMS / quantile histogram): a 60-bit md5-slice hash
    splits into a bucket (low 6 bits, m=64 registers) and a 54-bit
    suffix whose leading-zero rank feeds the register max.

    Everything up to the final estimate is EXACT integer arithmetic —
    registers are MAX aggregates, and the harmonic denominator is the
    scaled integer S = sum_j 2^(55 - M_j) (M_j <= 55, 64 terms <= 2^55
    each: no overflow, no float accumulation, ORDER-FREE).  The
    estimate alpha*m^2*2^55/S is one double expression both engines
    evaluate identically (parse-identical literals, exact powers, one
    division).  Empty buckets carry M_j = 0, exactly as the paper's
    registers initialize.

    Scale shape: one narrow hash map + a 64-key partial-agg MAX (the
    mergeable-sketch pattern: per-partition registers combine by MAX),
    then a single 64-row reduce.  The true count (for the shipped
    error column) is the only full distinct — drop it in production
    and the sketch costs one scan at any corpus size."""
    if m != 64:
        raise ValueError(
            "hll_distinct is pinned to m=64 (p=6): the alpha*m^2 "
            "literal (0.709*4096) and the 6-bit bucket split are baked "
            "into the engine AND oracle expressions"
        )
    spark = df.sparkSession
    hashed = df.select(
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("_h")
    ).select(
        F.pmod("_h", F.lit(m)).alias("bucket"),
        F.expr(f"_h div {m}").alias("_w"),
    )
    ranks = hashed.select(
        "bucket",
        F.when(F.col("_w") == 0, F.lit(55))
        .otherwise(F.lit(55) - F.length(F.bin("_w")))
        .alias("_rank"),
    )
    regs = (
        spark.range(m)
        .select(F.col("id").alias("bucket"))
        .join(ranks.groupBy("bucket").agg(F.max("_rank").alias("_mj")), "bucket", "left")
        .select("bucket", F.coalesce("_mj", F.lit(0)).alias("_mj"))
    )
    summary = regs.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(F.when(F.col("_mj") == 0, 1).otherwise(0)).alias("n_zero_buckets"),
        F.sum(F.expr("shiftleft(1L, 55 - _mj)")).alias("s_55"),
    )
    truth = F.broadcast(
        df.agg(F.count_distinct(F.col(key_col)).alias("true_distinct"))
    )
    return summary.crossJoin(truth).select(
        F.col("m").cast("long").alias("m"),
        F.col("n_zero_buckets").cast("long").alias("n_zero_buckets"),
        F.col("s_55").cast("long").alias("s_55"),
        F.round(
            F.expr("0.709 * 4096.0 * pow(2.0, 55) / s_55"), 2
        ).alias("hll_estimate"),
        F.col("true_distinct").cast("long").alias("true_distinct"),
        F.expr(
            "(1000000 * abs(CAST(ROUND(0.709 * 4096.0 * pow(2.0, 55) / s_55, 0)"
            " AS BIGINT) - true_distinct)) div true_distinct"
        )
        .cast("long")
        .alias("err_ppm"),
    )


def hll_distinct_by(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    m: int = 64,
) -> DataFrame:
    """Grouped HyperLogLog: one row of registers->estimate per group —
    the partitioned form of `hll_distinct` (same 60-bit hash, same
    integer registers and scaled harmonic denominator), demonstrating
    the sketch's mergeability axis: per-group registers are a MAX
    aggregate, so per-partition partial registers combine exactly and
    a per-day table rolls up to per-week by another MAX.

    Empty buckets per group are supplied by a group x bucket frame
    (groups are the query's grouping cardinality — e.g. days — times
    64 rows; tiny).  The true count column ships for the error audit,
    one exact distinct per group."""
    if m != 64:
        raise ValueError("hll_distinct_by is pinned to m=64 like hll_distinct")
    spark = df.sparkSession
    hashed = df.select(
        *group_cols,
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("_h"),
    ).select(
        *group_cols,
        F.pmod("_h", F.lit(m)).alias("bucket"),
        F.expr(f"_h div {m}").alias("_w"),
    )
    ranks = hashed.select(
        *group_cols,
        "bucket",
        F.when(F.col("_w") == 0, F.lit(55))
        .otherwise(F.lit(55) - F.length(F.bin("_w")))
        .alias("_rank"),
    )
    groups = df.select(*group_cols).distinct()
    frame = groups.crossJoin(
        spark.range(m).select(F.col("id").alias("bucket"))
    )
    regs = frame.join(
        ranks.groupBy(*group_cols, "bucket").agg(F.max("_rank").alias("_mj")),
        [*group_cols, "bucket"],
        "left",
    ).select(*group_cols, "bucket", F.coalesce("_mj", F.lit(0)).alias("_mj"))
    summary = regs.groupBy(*group_cols).agg(
        F.sum(F.when(F.col("_mj") == 0, 1).otherwise(0)).alias("n_zero_buckets"),
        F.sum(F.expr("shiftleft(1L, 55 - _mj)")).alias("s_55"),
    )
    truth = df.groupBy(*group_cols).agg(
        F.count_distinct(F.col(key_col)).alias("true_distinct")
    )
    return summary.join(truth, group_cols).select(
        *group_cols,
        F.col("n_zero_buckets").cast("long").alias("n_zero_buckets"),
        F.col("s_55").cast("long").alias("s_55"),
        F.round(
            F.expr("0.709 * 4096.0 * pow(2.0, 55) / s_55"), 2
        ).alias("hll_estimate"),
        F.col("true_distinct").cast("long").alias("true_distinct"),
    )


def kmv_set_overlap(
    a: DataFrame, b: DataFrame, key_col_a: str, key_col_b: str, k: int = 64
) -> DataFrame:
    """KMV sketch ALGEBRA: union-size, intersection-size and Jaccard
    estimates for two key sets from one merged k-minimum-values sketch
    (Beyer et al. 2007) — the set-operation layer on top of
    `kmv_distinct`.  K(A∪B) = the k smallest distinct hashes of the
    merged stream; |A∪B| ≈ (k-1)·M/h_(k); J ≈ |{h ∈ K(A∪B): h ∈ A ∧
    h ∈ B}| / k; |A∩B| ≈ J·|A∪B|.  Exact counts ride along so the
    output row itself exhibits the sketch error.

    Everything is md5-deterministic (no RNG), so the DuckDB oracle
    replays the estimates bit-for-bit: the only doubles are one
    division each, identically ordered.  Scale: per-set distinct
    shuffles, then a k-row TakeOrdered — the sketches merge by
    union+re-min across partitions exactly like kmv_distinct."""
    ha = a.select(_h52(F.col(key_col_a)).alias("h")).distinct()
    hb = b.select(_h52(F.col(key_col_b)).alias("h")).distinct()
    merged = (
        ha.withColumn("in_a", F.lit(1))
        .join(hb.withColumn("in_b", F.lit(1)), "h", "full_outer")
        .select(
            "h",
            F.coalesce("in_a", F.lit(0)).alias("in_a"),
            F.coalesce("in_b", F.lit(0)).alias("in_b"),
        )
    )
    topk = merged.orderBy("h").limit(k)
    agg = topk.agg(
        F.count(F.lit(1)).alias("kk"),
        F.max("h").alias("hk"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("c"),
    )
    exact = merged.agg(
        F.count(F.lit(1)).alias("n_union"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_inter"),
    )
    m = float(_HEX13)
    return (
        agg.crossJoin(exact)
        .select(
            F.lit(k).alias("k"),
            F.col("n_union").cast("long").alias("n_union_exact"),
            F.when(
                F.col("n_union") >= k,
                F.round(F.lit(float(k - 1)) * F.lit(m) / F.col("hk"), 4),
            )
            .otherwise(F.col("n_union").cast("double"))
            .alias("union_est"),
            F.col("n_inter").cast("long").alias("n_inter_exact"),
            F.round(F.col("c").cast("double") / F.col("kk"), 6).alias("jaccard_est"),
            F.when(
                F.col("n_union") >= k,
                F.round(
                    F.col("c")
                    * (F.lit(float(k - 1)) * F.lit(m) / F.col("hk"))
                    / F.col("kk"),
                    4,
                ),
            )
            .otherwise(F.col("n_inter").cast("double"))
            .alias("inter_est"),
        )
    )
