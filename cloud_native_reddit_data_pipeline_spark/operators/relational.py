"""Relational operators (SURVEY.md O11-O15, O25-O30, O33 + additive
joins/rollup/pivot the reference lacks).

Every function is a thin, composable DataFrame transformation: Catalyst
sees the whole declarative plan (pruning/pushdown/reordering stay
available), nothing is materialized early.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def project_rename(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Projection + rename (O11-O14: ES `_source` lists, defensive
    re-projection addReddit.py:51-61, pandas rename redditProcessor.py:86).
    Catalyst pushes the column pruning into the parquet scan."""
    return df.select(*[F.col(src).alias(dst) for src, dst in mapping.items()])


def contains_filter(df: DataFrame, cols: list[str], keyword: str) -> DataFrame:
    """Full-text OR predicate over N columns (O15: ES multi_match
    'coffee' over [title, selftext], redditProcessor.py:67-75).
    `contains` on a lowered column is sargable enough for parquet
    row-group stats to stay out of the way; no Python involved."""
    pred = None
    for c in cols:
        p = F.lower(F.col(c)).contains(keyword.lower())
        pred = p if pred is None else (pred | p)
    return df.filter(pred)


def schema_aligned_union(a: DataFrame, b: DataFrame, cols: list[str]) -> DataFrame:
    """Bag union after projecting both sides to a common schema
    (O28: pd.concat of posts+comments, redditProcessor.py:88-94).
    unionByName keeps it order-insensitive on columns; no dedup —
    faithful bag semantics."""
    return a.select(*cols).unionByName(b.select(*cols))


def sort_limit(df: DataFrame, order: list[Column], n: int | None = None) -> DataFrame:
    """Global sort (O25) with optional limit (O26).  With a limit, Spark
    runs TakeOrderedAndProject — no full global sort is materialized, which
    is the scale-correct plan for top-N."""
    out = df.orderBy(*order)
    return out.limit(n) if n is not None else out


def fk_join(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    how: str = "left",
) -> DataFrame:
    """Parent-child FK join (O30: comments.p_id -> posts.id; the
    reference only denormalizes at ingest, reddit_harvester_sydney.py:74).
    Shuffle-hash/sort-merge on the key; AQE handles skew at runtime."""
    return child.join(parent, child[child_key] == parent[parent_key], how)


def broadcast_dim_join(fact: DataFrame, dims: list[tuple[DataFrame, str]]) -> DataFrame:
    """Star-schema join with explicit broadcast of small dimension tables
    — at 100 TB the fact side never shuffles for these joins."""
    out = fact
    for dim, key in dims:
        out = out.join(F.broadcast(dim), key)
    return out


def topk_per_group(
    df: DataFrame, partition_by: list[str], order: list[Column], k: int
) -> DataFrame:
    """Per-group top-k via rank window (O33: top-10 words per topic,
    redditProcessor.py:113-121, generalized).  One shuffle on the group
    key; the window sort is per-partition."""
    w = Window.partitionBy(*partition_by).orderBy(*order)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def with_global_row_numbers(
    df: DataFrame,
    order: list[Column],
    col_name: str = "_rn",
    checkpoint: bool = True,
    pins: list[DataFrame] | None = None,
) -> DataFrame:
    """Contiguous 1-based global row numbers in `order`, WITHOUT a
    single-partition sort: range-repartition on the order (parallel sort
    shuffle), number rows within each partition, then add per-partition
    offsets — the DataFrame form of RDD zipWithIndex's two-pass scheme.

    The offsets come from a window over the PER-PARTITION counts (at
    most one row per range partition — bounded at any data size),
    broadcast back, so the whole thing is ONE lazy plan with no driver
    collect (round 7: the same driverless scheme `with_global_cumsum`
    uses; previously this did a per-call `.collect()` of partition
    counts — one extra job per call).

    The range-partitioned intermediate is pinned with persist() while
    materializing (range boundaries come from sampling, so an unpinned
    recompute between the count pass and the numbering pass could shift
    rows across partitions and corrupt the numbering); the caller
    receives a localCheckpoint()ed result and the pin is released
    before returning.  `order` must be a TOTAL order for the numbering
    to be deterministic.

    ``checkpoint=False`` returns the LAZY plan (for audits, or so a
    caller can fuse several rank passes into one materialization).  The
    offsets and numbering subplans BOTH read the sampled range shuffle,
    and two physical instantiations of it can sample different
    boundaries (RangePartitioner's seed hashes the rdd id) — safe only
    if the ReuseExchange rule dedups the subtrees, which is an
    optimizer behavior, not a contract.  So the lazy form requires a
    `pins` list: the range-shuffled frame is persist()ed and appended
    to it, and the CALLER unpersists after materializing (persisting
    here without that release handle would leak the pin for the
    session lifetime — the reason checkpoint=False without `pins` is
    refused rather than left silently reuse-dependent)."""
    if not checkpoint and pins is None:
        raise ValueError(
            "with_global_row_numbers(checkpoint=False) needs a `pins` "
            "list: the lazy plan reads the sampled range shuffle from "
            "two subplans, so it must be pinned until the caller "
            "materializes (then unpersist the pinned frames)"
        )
    srt = (
        df.repartitionByRange(*order)
        .sortWithinPartitions(*order)
        .withColumn("_pid", F.spark_partition_id())
    ).persist()
    if not checkpoint:
        pins.append(srt)
    try:
        pcnt = srt.groupBy("_pid").agg(F.count(F.lit(1)).alias("_pt"))
        w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
        offs = pcnt.select(
            "_pid",
            F.coalesce(F.sum("_pt").over(w_off), F.lit(0)).alias("_off"),
        )
        w = Window.partitionBy("_pid").orderBy(*order)
        out = (
            srt.join(F.broadcast(offs), "_pid")
            .withColumn(col_name, F.row_number().over(w) + F.col("_off"))
            .drop("_pid", "_off")
        )
        # materialize before releasing the pin: the result must never
        # re-execute the sampled range shuffle with fresh boundaries
        # (checkpoint=False hands back the lazy plan — the pinned srt
        # is in `pins`, released by the caller after materializing)
        return out.localCheckpoint(eager=True) if checkpoint else out
    finally:
        if checkpoint:
            srt.unpersist()


def with_global_cumsum(
    df: DataFrame,
    order: list[Column | str],
    sum_col: str,
    out_col: str,
    checkpoint: bool = True,
    pins: list[DataFrame] | None = None,
) -> DataFrame:
    """Inclusive cumulative sum of `sum_col` over a global `order`,
    WITHOUT a single-partition sort — the prefix-sum sibling of
    `with_global_row_numbers`: range-repartition on the order, local
    window cumsum within each partition, then add per-partition prefix
    offsets.  The offsets come from a window over the PER-PARTITION
    totals (at most one row per range partition — bounded at any data
    size), broadcast back, so the whole thing is one lazy plan with no
    driver collect.  `sum_col` must be integral (exact, order-free
    addition); `order` must be a total order over the rows.

    This is the 100x form of the "distinct-domain window" used by
    ECDF/Gini: a continuous value domain makes the distinct set ~n and
    an unpartitioned cumulative window single-task, while the range
    shuffle here spreads the sort across the cluster at any domain
    cardinality.  Same pinning contract as `with_global_row_numbers`:
    the sampled range shuffle is persisted while materializing so
    offsets and local sums never see different boundaries; the lazy
    form (checkpoint=False) requires a `pins` list the caller
    unpersists after materializing."""
    if not checkpoint and pins is None:
        raise ValueError(
            "with_global_cumsum(checkpoint=False) needs a `pins` list: "
            "the lazy plan reads the sampled range shuffle from two "
            "subplans, so it must be pinned until the caller "
            "materializes (then unpersist the pinned frames)"
        )
    srt = (
        df.repartitionByRange(*order)
        .sortWithinPartitions(*order)
        .withColumn("_pid", F.spark_partition_id())
    ).persist()
    if not checkpoint:
        pins.append(srt)
    try:
        ptot = srt.groupBy("_pid").agg(F.sum(sum_col).alias("_pt"))
        w_off = (
            Window.orderBy("_pid")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offs = ptot.select(
            "_pid", F.coalesce(F.sum("_pt").over(w_off), F.lit(0)).alias("_off")
        )
        w_local = (
            Window.partitionBy("_pid")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        out = (
            srt.join(F.broadcast(offs), "_pid")
            .withColumn(out_col, F.sum(sum_col).over(w_local) + F.col("_off"))
            .drop("_pid", "_off")
        )
        return out.localCheckpoint(eager=True) if checkpoint else out
    finally:
        if checkpoint:
            srt.unpersist()


def ntile_from_rank(
    rn_col: Column, n_rows: int | Column, n_tiles: int
) -> Column:
    """SQL ntile derived from a global 1-based row number with pure
    integer arithmetic: with N rows and t tiles the first N mod t tiles
    take ceil(N/t) rows, the rest floor(N/t) — bit-identical to the
    engines' built-in ntile over the same total order, but computable
    on top of `with_global_row_numbers` so no single-partition
    WindowExec is ever needed.

    ``n_rows`` may be a COLUMN (e.g. a broadcast one-row COUNT joined
    in), letting the tile assignment ride inside one lazy plan with no
    separate count action (round 7); the int form keeps the constant-
    folded fast path.

    The double divisions truncate exactly for any rn < 2^53 (both
    operands are exactly representable and the true quotient is either
    an exactly-representable integer or at least quotient*2^-53 away
    from one), i.e. correct to ~9e15 rows."""
    rn = rn_col.cast("long")
    if isinstance(n_rows, int):
        q, r = divmod(n_rows, n_tiles)
        if q == 0:
            return rn_col.cast("int")
        boundary = r * (q + 1)
        return (
            F.when(rn <= boundary, (rn - 1).cast("long") / F.lit(q + 1))
            .otherwise(F.lit(r) + (rn - 1 - boundary) / F.lit(q))
            .cast("int")
            + F.lit(1)
        ).cast("int")
    n = n_rows.cast("long")
    t = F.lit(n_tiles).cast("long")
    q = F.floor(n / t).cast("long")
    r = F.pmod(n, t)
    boundary = r * (q + 1)
    return (
        F.when(q == 0, rn - 1)
        .when(rn <= boundary, F.floor((rn - 1) / (q + 1)))
        .otherwise(r + F.floor((rn - 1 - boundary) / q))
        .cast("int")
        + F.lit(1)
    ).cast("int")


def positional_zip_join(a: DataFrame, b: DataFrame, order_a: list[Column], order_b: list[Column]) -> DataFrame:
    """Literal equivalent of the reference's positional pandas index join
    (O29, redditProcessor.py:123): number both sides over an explicit
    total order, then equi-join on the row number.  Numbering uses
    `with_global_row_numbers` (range partition + partition offsets), so
    no single-partition Window sort appears at any size; the join on
    `_rn` is an ordinary hash shuffle.  Kept for parity; the engine's
    analytics plan avoids positional semantics by carrying the natural
    key through the pipeline (SURVEY.md section 7 hard-part 3)."""
    an = with_global_row_numbers(a, order_a)
    bn = with_global_row_numbers(b, order_b)
    return an.join(bn, "_rn").drop("_rn")


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    payload: dict[str, str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, attach the payload of the
    latest right row with right_ts <= left_ts and equal keys.

    Implemented as the union-merge formulation (tag sides -> one window
    partitioned by key ordered by (ts, side) -> last non-null payload):
    a SINGLE shuffle on the key, no per-row range probe — the plan that
    survives 100 TB, unlike an inequality join (O(n*m) nested loop) or
    per-left-row subqueries.  Right rows sort before left rows at equal
    timestamps, so same-instant matches are included.

    `payload` maps right-side column -> output alias.

    WARNING — determinism: with ``tiebreak=None`` the window order is
    only (ts, side), so when SEVERAL right rows share (keys, right_ts)
    the attached payload is whichever the sort saw last — it can vary
    run to run.  Pass `tiebreak` (a column present on both sides,
    unique per (keys, ts) on the right — an event id / version) whenever
    right-side timestamp duplicates are possible; every registered query
    does."""
    pay_struct = F.struct(*[F.col(c).alias(a) for c, a in payload.items()])
    pay_type = right.select(pay_struct.alias("_pay")).schema["_pay"].dataType

    rt = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        *([F.col(tiebreak).alias("_tb")] if tiebreak else []),
        pay_struct.alias("_pay"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("_l")).schema["_l"].dataType
        ).alias("_lrow"),
    )
    lt = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        *([F.col(tiebreak).alias("_tb")] if tiebreak else []),
        F.lit(None).cast(pay_type).alias("_pay"),
        F.struct(*left.columns).alias("_lrow"),
    )
    order = [F.col("_ats"), F.col("_side")] + ([F.col("_tb")] if tiebreak else [])
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = rt.unionByName(lt).withColumn(
        "_m", F.last("_pay", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("_side") == 1).select(
        "_lrow.*",
        *[F.col("_m").getField(a).alias(a) for a in payload.values()],
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    payload: dict[str, str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Forward as-of join: for each left row, attach the payload of the
    EARLIEST right row with right_ts >= left_ts and equal keys — the
    mirror of `asof_join_backward` (next-fill / "what happened next"
    semantics: next purchase after a click, next reading after an
    alarm).

    Same union-merge single-shuffle plan, scanned in DESCENDING time
    order: right rows sort before left rows at equal timestamps, so
    same-instant matches are included; `last(ignorenulls)` over the
    unbounded-preceding frame then holds the nearest following right
    row at each left row.

    WARNING — determinism: same caveat as `asof_join_backward` — with
    ``tiebreak=None``, multiple right rows sharing (keys, right_ts)
    attach a run-to-run nondeterministic payload.  Pass `tiebreak`
    whenever right-side timestamp duplicates are possible (the SMALLEST
    tiebreak at the winning instant is attached)."""
    pay_struct = F.struct(*[F.col(c).alias(a) for c, a in payload.items()])
    pay_type = right.select(pay_struct.alias("_pay")).schema["_pay"].dataType

    rt = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        *([F.col(tiebreak).alias("_tb")] if tiebreak else []),
        pay_struct.alias("_pay"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("_l")).schema["_l"].dataType
        ).alias("_lrow"),
    )
    lt = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        *([F.col(tiebreak).alias("_tb")] if tiebreak else []),
        F.lit(None).cast(pay_type).alias("_pay"),
        F.struct(*left.columns).alias("_lrow"),
    )
    order = [F.col("_ats").desc(), F.col("_side").asc()] + (
        [F.col("_tb").desc()] if tiebreak else []
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = rt.unionByName(lt).withColumn(
        "_m", F.last("_pay", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("_side") == 1).select(
        "_lrow.*",
        *[F.col("_m").getField(a).alias(a) for a in payload.values()],
    )


def range_band_join(
    fact: DataFrame, bands: DataFrame, value_col: str, lo_col: str = "lo", hi_col: str = "hi"
) -> DataFrame:
    """Theta/range join of a fact value against a tiny literal band table
    (lo <= v < hi).  The band side is broadcast, so the 'nested loop' is
    a constant-width scan per row — fine at any fact scale."""
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return fact.join(F.broadcast(bands), cond)


def running_aggregates(
    df: DataFrame,
    part_col: str,
    order_cols: list[str],
    value_col: str,
    moving_n: int = 3,
) -> DataFrame:
    """Analytic-window family over one partitioned, totally-ordered
    frame: running sum, previous value (lag), next value (lead), and a
    trailing `moving_n`-row sum.  One window spec = ONE shuffle +
    per-partition sort serves all four measures.

    Sums run over decimal (then surface as double) so aggregation order
    cannot perturb low bits — FP sums are order-dependent and Spark's
    partial-aggregate order is nondeterministic."""
    w = Window.partitionBy(part_col).orderBy(*order_cols)
    dec = F.col(value_col).cast("decimal(18,2)")
    return df.select(
        F.col(part_col),
        *[F.col(c) for c in order_cols],
        F.col(value_col),
        F.sum(dec)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double")
        .alias("running_total"),
        F.lag(F.col(value_col)).over(w).alias("prev_value"),
        F.lead(F.col(value_col)).over(w).alias("next_value"),
        F.sum(dec)
        .over(w.rowsBetween(-(moving_n - 1), 0))
        .cast("double")
        .alias(f"moving_sum{moving_n}"),
    )


def salted_join_agg(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    group_cols: list[str],
    measures: dict[str, Column],
    n_salts: int = 8,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Skew-resistant equi-join + aggregation: the fact side appends a
    salt in [0, n_salts) derived from a unique column hash, the dim side
    is exploded n_salts times, and the join key becomes (key, salt) — a
    hot key's rows now spread over n_salts reducers instead of one.

    The aggregate result is salt-invariant, so correctness is identical
    to the unsalted join (the oracle runs the plain join).  This is the
    manual fallback when AQE skew-join can't kick in (e.g. the skewed
    side is the output of an aggregation, or the runtime stats miss the
    skew).

    `salt_cols` limits the hash input to a few well-distributed columns
    (hashing every column of a wide fact row is wasted work — any value
    distribution works, only spread matters)."""
    cols = salt_cols or fact.columns
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts))
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = salted_fact.join(salted_dim, [key, "_salt"])
    aggs = [expr.alias(name) for name, expr in measures.items()]
    return joined.groupBy(*group_cols).agg(*aggs)


def hash_split(
    df: DataFrame, key_col: str, test_frac_hex: str = "1a", splits=("train", "test")
) -> DataFrame:
    """Deterministic train/test split by content hash — the
    training-data-pipeline sampling primitive: membership depends only
    on the key, so it is stable across runs, engines, partitionings, and
    incremental re-ingests (no RNG, no seed drift).  `test_frac_hex` is
    a 2-hex-digit threshold: '1a' keeps ~26/256 ~= 10% as test."""
    bucket = F.substring(F.md5(F.col(key_col).cast("string")), 1, 2)
    return df.withColumn(
        "split", F.when(bucket < test_frac_hex, F.lit(splits[1])).otherwise(F.lit(splits[0]))
    )


def rollup_counts(df: DataFrame, keys: list[str], measures: dict[str, Column]) -> DataFrame:
    """ROLLUP aggregation (additive: not in the reference, SURVEY.md
    "not present" list)."""
    aggs = [expr.alias(name) for name, expr in measures.items()]
    return df.rollup(*keys).agg(*aggs)


def pivot_counts(df: DataFrame, key: str, pivot_col: str, values: list[str]) -> DataFrame:
    """Pivot with an explicit value list — explicit values avoid the
    extra distinct-scan Spark needs to discover them (scale win)."""
    return df.groupBy(key).pivot(pivot_col, values).count()


def scd2_history(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Slowly-changing-dimension (type 2) history build from an event
    log: per key, collapse consecutive identical attribute values to one
    versioned row with [valid_from, valid_to) and an is_current flag —
    the standard change-data-capture materialization (the reference only
    last-writer-wins upserts, addReddit.py:63-64; this keeps history).

    Scale shape: one shuffle on the key; both windows (change detection,
    interval close) share the same partitioning so Catalyst plans a
    single Exchange + sort; output is one row per value-change, which is
    << input for slowly-changing attributes."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    changes = (
        df.select(key_col, ts_col, attr_col, tiebreak_col)
        .withColumn("_prev", F.lag(attr_col).over(w))
        .filter(
            F.col("_prev").isNull() | (F.col(attr_col) != F.col("_prev"))
        )
    )
    w2 = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    return changes.select(
        key_col,
        F.col(attr_col),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )


def key_skew_profile(df: DataFrame, key_col: str) -> DataFrame:
    """Join-key skew diagnostics — the profile you run BEFORE picking a
    join strategy (broadcast / salt / AQE skew hints): per-key counts
    reduced to one row of distribution measures (max/mean ratio, top-1
    share, exact interpolated p50/p99, Shannon entropy in nats).

    Scale shape: one partial-agg shuffle on the key (the same shuffle
    the join itself would do), then a single-row aggregate; entropy and
    share terms are decimal-summed so the result is engine-exact."""
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt"))
    return (
        counts.select("cnt")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("cnt").alias("n_rows"),
            F.max("cnt").alias("max_cnt"),
            F.round(
                F.max("cnt") / (F.sum("cnt") / F.count(F.lit(1))) + F.lit(1e-9), 4
            ).alias("max_over_mean"),
            F.round(
                F.max("cnt").cast("double") / F.sum("cnt") + F.lit(1e-9), 6
            ).alias("top1_share"),
            F.expr("percentile(cnt, 0.5)").alias("p50_cnt"),
            F.expr("percentile(cnt, 0.99)").alias("p99_cnt"),
            F.round(
                (
                    F.log(F.sum("cnt"))
                    - F.sum(
                        (F.col("cnt") * F.log("cnt")).cast("decimal(38,12)")
                    ).cast("double")
                    / F.sum("cnt")
                )
                + F.lit(1e-9),
                6,
            ).alias("entropy_nats"),
        )
    )


def cdc_apply(
    changelog: DataFrame,
    key_col: str,
    op_col: str,
    seq_cols: list[str],
    payload_cols: list[str],
    delete_op: str = "D",
) -> DataFrame:
    """Change-data-capture apply: collapse an ordered changelog of
    upserts and deletes to the final table state — last operation per
    key wins; a trailing delete removes the key entirely (the batch twin
    of the streaming keyed upsert, extended with delete semantics the
    reference's ES upserts never had).

    Scale shape: one shuffle on the key, one row_number window, then a
    narrow filter — output is at most one row per live key."""
    w = Window.partitionBy(key_col).orderBy(
        *[F.col(c).desc() for c in seq_cols]
    )
    return (
        changelog.select(key_col, op_col, *seq_cols, *payload_cols)
        .withColumn("_rk", F.row_number().over(w))
        .filter((F.col("_rk") == 1) & (F.col(op_col) != delete_op))
        .select(key_col, *payload_cols)
    )


def dq_report(checks: list[tuple[str, DataFrame]]) -> DataFrame:
    """Data-quality report: each entry is (check_name, violations_df);
    emits one row per check with its violation count — the pre-ingest
    gate a production pipeline runs before promoting a batch
    (the engine-side generalization of the reference's defensive
    .get() re-projection, addReddit.py:51-61).

    Scale shape: each check is an independent aggregate/anti-join whose
    plan Catalyst optimizes separately; the report union is #checks
    single-row frames.  Violation DataFrames are COUNTED, not collected
    — a failing check at 100 TB costs one aggregate, not a transfer."""
    frames = []
    for name, df in checks:
        frames.append(df.agg(F.count(F.lit(1)).alias("n_violations")).select(
            F.lit(name).alias("check_name"), "n_violations"
        ))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def incremental_agg_merge(
    df: DataFrame,
    batch_col: Column,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Two-level mergeable aggregation — the incremental-view-
    maintenance pattern: per-(batch, group) PARTIAL states (count, sum,
    min, max) first, then a pure state MERGE per group.  At scale the
    partial level is what each micro-batch/partition persists; the
    merge level is the always-fresh rollup — no raw-row rescan.  The
    merged result must equal a direct one-level aggregation (the SQL
    oracle computes exactly that, so the hash match proves merge
    associativity end-to-end).  Partial sums accumulate in DECIMAL so
    merge order cannot perturb them, but the OUTPUT is the exact sum
    scaled by 10^4 as BIGINT (`sum_value_e4`) — final schemas never
    carry DECIMAL columns, whose engine-specific payloads are a hash
    hazard across engines (same convention as PageRank's e12 ranks)."""
    partial = df.groupBy(batch_col.alias("_batch"), F.col(group_col)).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col(value_col).cast("decimal(28,4)")).alias("_s"),
        F.min(value_col).alias("_mn"),
        F.max(value_col).alias("_mx"),
    )
    return partial.groupBy(group_col).agg(
        F.sum("_n").alias("n_rows"),
        (F.sum("_s") * F.lit(10000)).cast("long").alias("sum_value_e4"),
        F.min("_mn").alias("min_value"),
        F.max("_mx").alias("max_value"),
        F.count(F.lit(1)).alias("n_batches"),
    )


def with_observed_quality(df: DataFrame, observation, value_col: str) -> DataFrame:
    """Piggyback data-quality counters on an EXISTING pass via
    `Dataset.observe`: row count, null count, and min/max of
    `value_col` accumulate while whatever action consumes `df` runs —
    zero extra scans, vs `dq_report`'s one aggregate per check.  At
    100 TB this is how per-batch quality metrics ship with a write
    instead of doubling it.  Pass a `pyspark.sql.Observation`; read
    `observation.get` after the action completes."""
    return df.observe(
        observation,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(value_col).isNull().cast("long")).alias("n_null"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    )


def pareto_skyline_2d(
    df: DataFrame, minimize_col: str, maximize_col: str
) -> DataFrame:
    """Two-dimensional skyline (Borzsony et al. 2001): rows not
    dominated by any other row, where `a` dominates `b` iff
    a.minimize <= b.minimize AND a.maximize >= b.maximize with at
    least one strict.  Ties on both dimensions are mutually
    non-dominating, so duplicates of a skyline point all survive.

    Distributed shape (the standard partition-then-merge skyline):

    1. per-(minimize)-value max of the maximize column — any row below
       its own group max is dominated at equal cost;
    2. LOCAL sweep per shuffle partition: sort candidates by
       (minimize asc, maximize desc) within each partition and drop
       rows whose maximize does not exceed the running max of all
       strictly-cheaper predecessors — locally dominated implies
       globally dominated, so this prunes safely in parallel;
    3. GLOBAL sweep over the (small) local-skyline survivors with the
       same running-max window on a single ordered partition;
    4. join the skyline (minimize, maximize) points back to the input
       to recover full rows including ties.

    The global step sees only per-partition skylines (typically a few
    points each), so the single-partition window is a few-KB sort, not
    a global shuffle of the input."""
    mn, mx = "_sk_min", "_sk_max"
    cand = (
        df.select(F.col(minimize_col).alias(mn), F.col(maximize_col).alias(mx))
        .groupBy(mn)
        .agg(F.max(mx).alias(mx))
    )

    def _sweep(frame: DataFrame, part_cols: list) -> DataFrame:
        w = (
            Window.partitionBy(*part_cols)
            .orderBy(F.col(mn).asc(), F.col(mx).desc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return (
            frame.withColumn("_prev", F.max(mx).over(w))
            .filter(F.col("_prev").isNull() | (F.col(mx) > F.col("_prev")))
            .drop("_prev")
        )

    local = _sweep(
        cand.withColumn("_pid", F.spark_partition_id()), ["_pid"]
    ).drop("_pid")
    skyline_points = _sweep(local, [])
    return df.join(
        F.broadcast(skyline_points),
        (F.col(minimize_col) == F.col(mn)) & (F.col(maximize_col) == F.col(mx)),
        "left_semi",
    )


def snapshot_diff(
    events: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    order_cols: list,
    t1: str,
    t2: str,
) -> DataFrame:
    """Differential snapshot comparison (Labio & Garcia-Molina 1996,
    the warehouse table-diff problem): materialize the per-key LATEST
    value of `attr_col` as of two cutoff instants and emit one row per
    key with its change status — 'added' (absent at t1), 'removed'
    (absent at t2), 'changed', or 'unchanged' — plus both values.

    Each snapshot is one window argmax per key (deterministic via
    `order_cols` tie-break); the diff is a single full outer join on
    the key.  At scale both snapshots partition on the same key, so
    AQE plans the outer join shuffle-free after the windows; nothing
    ever leaves the cluster."""
    def snap(cutoff: str, out: str) -> DataFrame:
        w = Window.partitionBy(key_col).orderBy(
            *[F.col(c).desc() for c in order_cols]
        )
        return (
            events.filter(F.col(ts_col) <= F.lit(cutoff).cast("timestamp"))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(F.col(key_col).alias("key"), F.col(attr_col).alias(out))
        )

    a = snap(t1, "val_t1")
    b = snap(t2, "val_t2")
    return a.join(b, "key", "full_outer").select(
        "key",
        "val_t1",
        "val_t2",
        F.when(F.col("val_t1").isNull(), F.lit("added"))
        .when(F.col("val_t2").isNull(), F.lit("removed"))
        .when(F.col("val_t1") == F.col("val_t2"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )


def k_anonymity_audit(
    df: DataFrame,
    qi_cols: list,
    sensitive_col: Column,
    k: int = 5,
    l_div: int = 2,
) -> DataFrame:
    """k-anonymity / l-diversity audit over a quasi-identifier
    combination (Sweeney 2002; Machanavasjhala et al. 2006) — the
    privacy gate that runs next to `scrub_pii` before a table is
    released: every QI equivalence class with fewer than `k` members is
    re-identifiable, and a class whose sensitive attribute shows fewer
    than `l_div` distinct values leaks it even when k holds.

    One groupBy on the QI key (map-side partial count + distinct-
    sensitive agg); output is one row per equivalence class — bounded
    by the QI domain, not the table.  At 100 TB this is a single
    aggregate pass; the violating classes are the suppression /
    generalization worklist."""
    return (
        df.groupBy(*[F.col(c) for c in qi_cols])
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            F.countDistinct(sensitive_col).alias("n_sensitive_distinct"),
        )
        .select(
            *qi_cols,
            F.col("class_size").cast("long").alias("class_size"),
            F.col("n_sensitive_distinct").cast("long").alias(
                "n_sensitive_distinct"
            ),
            (F.col("class_size") < k).alias("k_violation"),
            (F.col("n_sensitive_distinct") < l_div).alias("l_violation"),
        )
    )


def l_diversity_t_closeness_audit(
    df: DataFrame,
    qi_cols: list,
    sensitive_col: Column,
    l_div: int = 2,
    t_e6: int = 400_000,
) -> DataFrame:
    """Entropy l-diversity + t-closeness audit — the two stronger
    release gates above `k_anonymity_audit`'s distinct-count check
    (Machanavasjhala et al. 2006; Li et al. 2007):

    - **entropy l-diversity**: a class passes when
      -Σ p_s ln p_s >= ln(l).  Computed order-free exact:
      entropy_e6 = ln_e6(n) - (Σ n_s * ln_e6(n_s)) div n, where
      ln_e6(x) = round(ln(x)*1e6) is quantized PER TERM (the
      shapley/chi2 integer-sum discipline — an unordered float sum of
      ln terms would be engine-unstable) and the final division is
      integer `div` on both engines.
    - **t-closeness**: the total-variation distance between the
      class's sensitive distribution and the GLOBAL one, as an exact
      rational: TVD = Σ_s |N*n_s - n*g_s| / (2*n*N) over the global
      sensitive domain (absent-in-class values contribute n*g_s), then
      one rounded e6 integer.  A class passes when tvd_e6 <= `t_e6`.

    Scale shape: one (QI, sensitive) aggregate + one sensitive-domain
    aggregate (both vocabulary-sized), a broadcast of the global
    distribution onto the class x domain grid (|classes| x |domain| —
    bounded by the attribute domains, never by the table), and one
    final class rollup with map-side combine."""
    _ln_e6 = lambda c: F.round(F.log(c.cast("double")) * 1_000_000, 0).cast("long")  # noqa: E731

    cs = df.groupBy(*[F.col(c) for c in qi_cols], sensitive_col.alias("_s")).agg(
        F.count(F.lit(1)).alias("_ns")
    )
    glob = cs.groupBy("_s").agg(F.sum("_ns").alias("_gs"))
    n_total = df.count()
    classes = cs.groupBy(*qi_cols).agg(F.sum("_ns").alias("_n"))

    grid = classes.crossJoin(F.broadcast(glob)).join(
        cs, [*qi_cols, "_s"], "left"
    ).select(
        *qi_cols,
        "_n",
        "_gs",
        F.coalesce(F.col("_ns"), F.lit(0)).alias("_ns"),
    )
    per_class = grid.groupBy(*qi_cols).agg(
        F.first("_n").alias("_n"),
        F.sum(
            F.when(F.col("_ns") > 0, F.col("_ns") * _ln_e6(F.col("_ns"))).otherwise(
                F.lit(0)
            )
        ).alias("_sum_nlnn"),
        F.sum(
            F.abs(F.lit(n_total) * F.col("_ns") - F.col("_n") * F.col("_gs"))
        ).alias("_tvd_num"),
    )
    import math

    ln_l_e6 = int(round(math.log(l_div) * 1_000_000))
    return per_class.select(
        *qi_cols,
        F.col("_n").cast("long").alias("class_size"),
        (_ln_e6(F.col("_n")) - F.expr("_sum_nlnn div _n")).alias("entropy_e6"),
        (
            (_ln_e6(F.col("_n")) - F.expr("_sum_nlnn div _n")) >= ln_l_e6
        ).alias("entropy_l_ok"),
        F.round(
            F.col("_tvd_num").cast("double")
            * 1_000_000
            / (2.0 * F.col("_n") * n_total),
            0,
        )
        .cast("long")
        .alias("tvd_e6"),
        (
            F.round(
                F.col("_tvd_num").cast("double")
                * 1_000_000
                / (2.0 * F.col("_n") * n_total),
                0,
            ).cast("long")
            <= t_e6
        ).alias("t_close_ok"),
    )


# Benford first-digit probabilities log10(1 + 1/d), inlined as shared
# constants so both engines compare against bit-identical expectations
# (library log10 implementations may differ in the last ulp).
BENFORD_P = {
    1: 0.30102999566398114, 2: 0.17609125905568124, 3: 0.12493873660829985,
    4: 0.09691001300805638, 5: 0.07918124604762478, 6: 0.06694678963061318,
    7: 0.05799194697768673, 8: 0.05115252244738133, 9: 0.04575749056067514,
}


def benford_digit_audit(df: DataFrame, value_col: str) -> DataFrame:
    """Benford's-law first-significant-digit audit of a positive
    numeric column — the classic fraud / synthetic-data / unit-mixup
    detector: natural multi-magnitude amounts follow P(d) =
    log10(1 + 1/d); a flat or spiked digit histogram flags fabricated
    or truncated values.  Emits one row per digit with observed count,
    expected count, and the chi-square contribution (sum them for the
    test statistic).

    One narrow projection (first char of the integer part) + one
    9-group aggregate; the expectation constants are shared literals,
    so the audit is engine-exact.  Note: bounded-range columns (like
    TPC-H retail prices, ~900-1000) legitimately FAIL Benford — the
    audit reports the divergence either way; interpretation is the
    caller's."""
    digit = F.substring(
        F.floor(F.col(value_col)).cast("long").cast("string"), 1, 1
    ).cast("int")
    counts = (
        df.filter(F.col(value_col) > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    total = counts.agg(F.sum("n_obs").alias("_n"))
    p_expr = F.element_at(
        F.create_map(
            *[x for d, p in sorted(BENFORD_P.items()) for x in (F.lit(d), F.lit(p))]
        ),
        F.col("digit"),
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.col("n_obs").cast("long").alias("n_obs"),
            F.round(F.col("_n") * p_expr + F.lit(1e-9), 4).alias("n_expected"),
            F.round(
                (F.col("n_obs") - F.col("_n") * p_expr)
                * (F.col("n_obs") - F.col("_n") * p_expr)
                / (F.col("_n") * p_expr)
                + F.lit(1e-9),
                4,
            ).alias("chi2_contrib"),
        )
    )


def winsorize_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Winsorization report per group: exact lo/hi percentile bounds
    (linear-interpolated, the SQL percentile_cont semantics both
    engines share), clip counts, and the mean before/after clipping —
    the robust-statistics companion of `grouped_outliers` (flagging
    there; the actual heavy-tail treatment here, as a training
    pipeline applies it to feature columns before normalization).

    Two aggregates: per-group percentile (one shuffle; sort-based
    aggregate over each group's values) and one pass computing clip
    counts + decimal-exact means against the broadcast bounds."""
    bounds = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.expr(f"percentile({value_col}, {lo})").alias("_lo"),
        F.expr(f"percentile({value_col}, {hi})").alias("_hi"),
    )
    joined = df.join(
        F.broadcast(bounds), df[group_col] == F.col("_g")
    )
    v = F.col(value_col)
    clipped = F.least(F.greatest(v, F.col("_lo")), F.col("_hi"))
    return (
        joined.groupBy(F.col(group_col))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.first("_lo") + F.lit(1e-9), 4).alias("p_lo"),
            F.round(F.first("_hi") + F.lit(1e-9), 4).alias("p_hi"),
            F.sum((v < F.col("_lo")).cast("long")).alias("n_clipped_lo"),
            F.sum((v > F.col("_hi")).cast("long")).alias("n_clipped_hi"),
            F.round(
                F.sum(v.cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
                + F.lit(1e-9),
                4,
            ).alias("mean_raw"),
            F.round(
                F.sum(clipped.cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
                + F.lit(1e-9),
                4,
            ).alias("mean_winsorized"),
        )
    )


def ecdf_normalize(
    df: DataFrame, id_col: str, value_col: str, round_to: int = 4
) -> DataFrame:
    """Empirical-CDF normalization: map each row's value to
    P(X <= x) over the whole column — rank-based feature scaling
    (quantile normalization) that is robust to arbitrary skew.

    Distributed shape (NO global window over the raw rows): collapse
    to per-VALUE counts first, cumulative-sum over the distinct-value
    domain via `with_global_cumsum` (range-partitioned prefix sum — no
    single-task sort even when the domain is continuous and distinct
    ~ n), then map the value->cdf back onto the rows.  The raw table
    is touched by one aggregate and one join; the map-back is hinted
    broadcast because graded value domains (lengths, scores, cents
    grids) stay far below the corpus — for a truly continuous column
    drop the hint and let AQE pick the join side."""
    counts = df.groupBy(F.col(value_col).alias("_v")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    cum = with_global_cumsum(counts, ["_v"], "_c", "_cum")
    total = counts.agg(F.sum("_c").alias("_n"))
    cum = cum.crossJoin(F.broadcast(total))
    return df.join(
        F.broadcast(cum), df[value_col] == F.col("_v")
    ).select(
        F.col(id_col),
        F.col(value_col),
        F.round(F.col("_cum") / F.col("_n") + F.lit(1e-9), round_to).alias(
            "ecdf"
        ),
    )


def concentration_report(
    df: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Revenue/volume concentration: exact Gini coefficient and
    top-decile share over per-key totals — "how unequal is the
    distribution" (customer spend, source contribution to a training
    mix).  One row out: n_keys, total, gini, top_decile_share.

    Distributed shape (the `ecdf_normalize` trick, not a global row
    sort): per-key totals collapse to CENTS-scaled integers, identical
    totals collapse to (value, count) pairs, and the rank-sum Gini

        G = 2 * sum_i(rank_i * x_i) / (n * sum_x) - (n + 1) / n

    is computed over the DISTINCT-total domain with counts (each
    distinct value contributes its average rank times its mass —
    exactly the tied-rank form).  The cumulative count rides
    `with_global_cumsum` (range-partitioned two-level prefix sum), so
    even a CONTINUOUS value domain — where distinct ~ n — never hits a
    single-task sort; the global (n, sum) pair is a one-row aggregate
    broadcast back.  All sums are exact integers; the two divisions
    happen once at the end.  Top-decile share uses ceil(n/10) largest
    keys via the same cumulative counts."""
    totals = df.groupBy(F.col(key_col).alias("_k")).agg(
        F.sum(F.col(value_col).cast("decimal(18,2)")).alias("_t")
    )
    vals = totals.select((F.col("_t") * 100).cast("long").alias("_v")).groupBy(
        "_v"
    ).agg(F.count(F.lit(1)).alias("_c"))
    glob = vals.agg(
        F.sum("_c").alias("_n"),
        F.sum(F.col("_v") * F.col("_c")).alias("_sum"),
    )
    cum = with_global_cumsum(vals, ["_v"], "_c", "_cumc").crossJoin(
        F.broadcast(glob)
    )
    # tied-rank sum for this value block: average rank = cumc - (c-1)/2,
    # mass = v * c  ->  contribution 2*avg_rank*v*c kept integral as
    # v*c*(2*cumc - c + 1)
    contrib = F.col("_v") * F.col("_c") * (
        F.lit(2) * F.col("_cumc") - F.col("_c") + F.lit(1)
    )
    # top decile: keys with rank > n - ceil(n/10); a value block
    # overlapping the cutoff contributes only its in-decile part
    k_top = F.ceil(F.col("_n") / F.lit(10.0)).cast("long")
    cutoff = F.col("_n") - k_top  # ranks strictly above cutoff count
    in_top = F.greatest(
        F.lit(0),
        F.least(F.col("_c"), F.col("_cumc") - cutoff),
    )
    agg = cum.agg(
        F.first("_n").alias("_n"),
        F.first("_sum").alias("_sum"),
        F.sum(contrib).alias("_ranksum2"),
        F.sum(F.col("_v") * in_top).alias("_topsum"),
    )
    return agg.select(
        F.col("_n").cast("long").alias("n_keys"),
        F.round(F.col("_sum") / 100.0, 2).alias("total_value"),
        F.round(
            F.col("_ranksum2").cast("double")
            / (F.col("_n").cast("double") * F.col("_sum"))
            - (F.col("_n") + F.lit(1)).cast("double") / F.col("_n")
            + F.lit(1e-9),
            6,
        ).alias("gini"),
        F.round(
            F.col("_topsum").cast("double") / F.col("_sum") + F.lit(1e-9), 6
        ).alias("top_decile_share"),
    )


def time_embargo_split(
    df: DataFrame,
    ts_col: str,
    train_end: str,
    test_start: str,
) -> DataFrame:
    """Purged/embargoed temporal split (the time-series leakage rule,
    a la de Prado's purged K-fold): train strictly BEFORE `train_end`,
    test at/after `test_start`, and the rows in between assigned to an
    `embargo` bucket that is DROPPED from both sides — the gap absorbs
    label/feature windows that straddle the boundary, so a model
    cannot see information that leaks across it.  The time-series
    complement of `hash_split` (iid) and `component_aware_split`
    (near-dup graphs).

    Pure narrow map — the split is one comparison per row and pushes
    down to the scan (partition pruning on a date-partitioned lake
    layout makes each side a partition subset, no shuffle at all)."""
    ts = F.col(ts_col)
    return df.withColumn(
        "split",
        F.when(ts < F.lit(train_end).cast("timestamp"), F.lit("train"))
        .when(ts >= F.lit(test_start).cast("timestamp"), F.lit("test"))
        .otherwise(F.lit("embargo")),
    )


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    is_a: Column,
    alpha_coeff: float = 1.358,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test between the rows where
    `is_a` holds (sample A) and the rest (sample B) — the
    distribution-free companion of the binned PSI monitor
    (streaming/drift.py): no bucketing choices, sensitive to any shape
    change, the standard gate for "did this feature move between
    snapshots".  One row out: n_a, n_b, ks_stat, ks_crit (asymptotic
    critical value at the supplied alpha coefficient; 1.358 = 5%),
    drifted.

    Exact-integer distributed shape: KS = sup_x |F_a(x) - F_b(x)|
    evaluated at pooled sample points.  Per distinct value compute
    (cnt_a, cnt_b), then the single integer column

        d = cnt_a * n_b - cnt_b * n_a

    has running sum  cum(d) = n_a * n_b * (F_a - F_b)  — so ONE
    range-partitioned prefix sum (`with_global_cumsum`, no
    single-task global window even for a continuous value domain)
    followed by max(|cum|) / (n_a * n_b) yields the statistic with
    integer-exact arithmetic until a single final division.  cum is
    bounded by n_a * n_b, safely inside int64 up to ~3e9-row samples;
    beyond that, scale counts to per-million before the products."""
    tagged = df.select(
        F.col(value_col).alias("_v"), is_a.cast("int").alias("_a")
    )
    counts = tagged.groupBy("_v").agg(
        F.sum("_a").alias("_ca"),
        F.sum(F.lit(1) - F.col("_a")).alias("_cb"),
    )
    totals = counts.agg(
        F.sum("_ca").alias("_na"), F.sum("_cb").alias("_nb")
    )
    d = counts.crossJoin(F.broadcast(totals)).select(
        "_v",
        "_na",
        "_nb",
        (F.col("_ca") * F.col("_nb") - F.col("_cb") * F.col("_na")).alias("_d"),
    )
    cum = with_global_cumsum(d, ["_v"], "_d", "_cum")
    na, nb = F.first("_na"), F.first("_nb")
    prod = na.cast("double") * nb.cast("double")
    return cum.agg(
        na.alias("n_a"),
        nb.alias("n_b"),
        F.round(
            F.max(F.abs(F.col("_cum"))).cast("double") / prod + F.lit(1e-12), 6
        ).alias("ks_stat"),
        F.round(
            F.lit(alpha_coeff) * F.sqrt((na + nb).cast("double") / prod)
            + F.lit(1e-12),
            6,
        ).alias("ks_crit"),
        (
            F.max(F.abs(F.col("_cum"))).cast("double") / prod
            > F.lit(alpha_coeff) * F.sqrt((na + nb).cast("double") / prod)
        ).alias("drifted"),
    )


def two_proportion_ztest(
    df: DataFrame,
    is_a: Column,
    is_success: Column,
    z_crit: float = 1.96,
) -> DataFrame:
    """Two-proportion z-test between arm A (`is_a`) and arm B (the
    rest): the A/B experimentation gate for conversion-style metrics,
    the binomial sibling of `ks_two_sample` (which handles continuous
    metrics).  One row out: per-arm trials/successes/rates, the pooled
    z statistic, and significance at `z_crit` (1.96 = two-sided 5%).

        z = (p_a - p_b) / sqrt(p*(1-p) * (1/n_a + 1/n_b)),  p pooled

    One aggregate over the tagged rows (map-side combine to four
    integers), float math only in the final one-row projection —
    nothing here gets harder at any data size."""
    agg = df.agg(
        F.sum(is_a.cast("long")).alias("_na"),
        F.sum((~is_a).cast("long")).alias("_nb"),
        F.sum((is_a & is_success).cast("long")).alias("_ca"),
        F.sum(((~is_a) & is_success).cast("long")).alias("_cb"),
    )
    na, nb = F.col("_na").cast("double"), F.col("_nb").cast("double")
    ca, cb = F.col("_ca").cast("double"), F.col("_cb").cast("double")
    pa, pb = ca / na, cb / nb
    pool = (ca + cb) / (na + nb)
    z = (pa - pb) / F.sqrt(
        pool * (F.lit(1.0) - pool) * (F.lit(1.0) / na + F.lit(1.0) / nb)
    )
    return agg.select(
        F.col("_na").alias("n_a"),
        F.col("_nb").alias("n_b"),
        F.col("_ca").alias("conv_a"),
        F.col("_cb").alias("conv_b"),
        F.round(pa + F.lit(1e-9), 6).alias("rate_a"),
        F.round(pb + F.lit(1e-9), 6).alias("rate_b"),
        F.round(z + F.lit(1e-9), 4).alias("z_stat"),
        (F.abs(z) > F.lit(z_crit)).alias("significant"),
    )


def cuped_adjustment(
    df: DataFrame,
    unit_col: str,
    value_col: str,
    is_pre: Column,
    scale: int = 2,
) -> DataFrame:
    """CUPED (Controlled-experiment Using Pre-Experiment Data, Deng et
    al. 2013): how much experiment variance a pre-period covariate
    removes.  Per unit, x = pre-period metric sum and y = in-period
    metric sum (units missing a period contribute 0 — the standard
    all-units form); then

        theta = cov(x, y) / var(x)
        corr2 = cov(x, y)^2 / (var(x) * var(y))   (= variance removed)

    and the adjusted metric is y - theta * (x - mean(x)).

    Exactness discipline: the five moment sums (Sx, Sy, Sxy, Sxx, Syy)
    are DECIMAL — per-unit sums are decimal(18,scale) and cross
    products widen to decimal(38,2*scale), so every aggregate is exact
    and order-free; the only float math is the final one-row
    theta/corr arithmetic on the (n*Sxy - Sx*Sy) moment forms.  Scale
    shape: one per-unit groupBy, one 5-sum aggregate to a single row —
    two shuffles total, both keyed/partial-aggregated."""
    per_unit = df.groupBy(F.col(unit_col).alias("_u")).agg(
        F.coalesce(
            F.sum(
                F.when(is_pre, F.col(value_col)).cast(f"decimal(18,{scale})")
            ),
            F.lit(0).cast(f"decimal(18,{scale})"),
        ).alias("_x"),
        F.coalesce(
            F.sum(
                F.when(~is_pre, F.col(value_col)).cast(f"decimal(18,{scale})")
            ),
            F.lit(0).cast(f"decimal(18,{scale})"),
        ).alias("_y"),
    )
    mom = per_unit.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
    )
    n = F.col("_n").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sxx, syy = F.col("_sxx").cast("double"), F.col("_syy").cast("double")
    cov_n = n * sxy - sx * sy  # n^2 * cov
    varx_n = n * sxx - sx * sx
    vary_n = n * syy - sy * sy
    return mom.select(
        F.col("_n").alias("n_units"),
        F.round(cov_n / varx_n + F.lit(1e-9), 6).alias("theta"),
        F.round(cov_n * cov_n / (varx_n * vary_n) + F.lit(1e-9), 6).alias(
            "corr2"
        ),
        F.round(
            F.lit(100.0) * (cov_n * cov_n / (varx_n * vary_n)) + F.lit(1e-9),
            2,
        ).alias("var_reduction_pct"),
    )


def srm_check(
    df: DataFrame,
    unit_col: str,
    is_a: Column,
    chi_crit: float = 3.841,
) -> DataFrame:
    """Sample-ratio-mismatch gate for a 50/50 split: chi-square
    goodness-of-fit with 1 df over DISTINCT unit assignment counts,
    which for two arms collapses to chi2 = (n_a - n_b)^2 / n.  SRM is
    the first thing to check before reading any experiment metric — a
    mismatched split means the assignment itself is broken and every
    downstream stat is suspect.  chi_crit 3.841 = 5%.  Exact integers
    until one final division."""
    arms = df.select(F.col(unit_col).alias("_u"), is_a.alias("_a")).distinct()
    agg = arms.agg(
        F.sum(F.col("_a").cast("long")).alias("_na"),
        F.sum((~F.col("_a")).cast("long")).alias("_nb"),
    )
    na, nb = F.col("_na"), F.col("_nb")
    d = (na - nb).cast("double")
    chi = d * d / (na + nb).cast("double")
    return agg.select(
        na.alias("n_a"),
        nb.alias("n_b"),
        F.round(chi + F.lit(1e-9), 4).alias("chi2"),
        (chi > F.lit(chi_crit)).alias("srm"),
    )


def ks_two_sample_grouped(
    df: DataFrame,
    group_col: str,
    value_col: str,
    is_a: Column,
    alpha_coeff: float = 1.358,
) -> DataFrame:
    """Per-GROUP two-sample KS — the drift sheet: `ks_two_sample` run
    for every segment at once (is the price distribution drifting in
    segment X but not Y?).  Same exact-integer trick per group:
    cum(ca*nb_g - cb*na_g) over the group's value domain equals
    na_g*nb_g*(F_a - F_b); here the cumsum window is PARTITIONED by
    group, so it parallelizes across segments natively and no global
    prefix-sum machinery is needed.  One row per group: n_a, n_b,
    ks_stat, ks_crit, drifted."""
    tagged = df.select(
        F.col(group_col).alias("_g"),
        F.col(value_col).alias("_v"),
        is_a.cast("int").alias("_a"),
    )
    counts = tagged.groupBy("_g", "_v").agg(
        F.sum("_a").alias("_ca"),
        F.sum(F.lit(1) - F.col("_a")).alias("_cb"),
    )
    totals = counts.groupBy("_g").agg(
        F.sum("_ca").alias("_na"), F.sum("_cb").alias("_nb")
    )
    d = counts.join(F.broadcast(totals), "_g").select(
        "_g",
        "_v",
        "_na",
        "_nb",
        (F.col("_ca") * F.col("_nb") - F.col("_cb") * F.col("_na")).alias("_d"),
    )
    w = (
        Window.partitionBy("_g")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = d.withColumn("_cum", F.sum("_d").over(w))
    na, nb = F.first("_na"), F.first("_nb")
    prod = na.cast("double") * nb.cast("double")
    crit = F.lit(alpha_coeff) * F.sqrt((na + nb).cast("double") / prod)
    stat = F.max(F.abs(F.col("_cum"))).cast("double") / prod
    return (
        cum.groupBy("_g")
        .agg(
            na.alias("n_a"),
            nb.alias("n_b"),
            F.round(stat + F.lit(1e-12), 6).alias("ks_stat"),
            F.round(crit + F.lit(1e-12), 6).alias("ks_crit"),
            (stat > crit).alias("drifted"),
        )
        .withColumnRenamed("_g", group_col)
    )


def chi2_independence(
    df: DataFrame,
    row_col: Column,
    col_col: Column,
    chi_crit: float,
) -> DataFrame:
    """Chi-square test of independence over an r x c contingency table
    plus Cramér's V effect size — the categorical sibling of
    `ks_two_sample` (numeric) and `two_proportion_ztest` (2x2): is the
    event mix independent of the experiment arm / segment?

        chi2 = sum_cells (o - e)^2 / e,   e = row_tot * col_tot / n
        V = sqrt(chi2 / (n * (min(r, c) - 1)))

    The per-cell term is computed once per contingency CELL (bounded
    by the category vocabulary, not the rows), and the cell sum is
    e6-quantized to integers so the total is order-free.  `chi_crit`
    must be the critical value for (r-1)(c-1) df at the caller's
    alpha.  One row out: n, dof, chi2, cramers_v, dependent."""
    cells = df.groupBy(row_col.alias("_r"), col_col.alias("_c")).agg(
        F.count(F.lit(1)).alias("_o")
    )
    rt = cells.groupBy("_r").agg(F.sum("_o").alias("_rt"))
    ct = cells.groupBy("_c").agg(F.sum("_o").alias("_ct"))
    tot = cells.agg(
        F.sum("_o").alias("_n"),
        F.countDistinct("_r").alias("_nr"),
        F.countDistinct("_c").alias("_nc"),
    )
    e = F.col("_rt").cast("double") * F.col("_ct").cast("double") / F.col("_n").cast(
        "double"
    )
    term = (F.col("_o").cast("double") - e) * (F.col("_o").cast("double") - e) / e
    terms = (
        cells.join(F.broadcast(rt), "_r")
        .join(F.broadcast(ct), "_c")
        .crossJoin(F.broadcast(tot))
        .select(
            "_n",
            "_nr",
            "_nc",
            F.round(term * F.lit(1e6) + F.lit(1e-9)).cast("long").alias("_t_e6"),
        )
    )
    chi = F.sum("_t_e6").cast("double") / F.lit(1e6)
    n = F.first("_n")
    nr, nc = F.first("_nr"), F.first("_nc")
    dof = (nr - 1) * (nc - 1)
    v = F.sqrt(
        chi / (n.cast("double") * (F.least(nr, nc) - 1).cast("double"))
    )
    return terms.agg(
        n.alias("n"),
        dof.cast("long").alias("dof"),
        F.round(chi + F.lit(1e-9), 4).alias("chi2"),
        F.round(v + F.lit(1e-9), 6).alias("cramers_v"),
        (chi > F.lit(chi_crit)).alias("dependent"),
    )
