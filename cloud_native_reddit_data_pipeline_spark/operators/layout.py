"""Data-layout operators: Z-order (Morton) clustering for
multi-dimensional pruning.

At 100 TB the scan IS the query cost, and single-column partitioning
only prunes one predicate dimension.  Z-ordering interleaves the bits of
two (or more) quantized keys so rows close in BOTH dimensions land in
the same file/bucket — a rectangle predicate then touches O(perimeter)
buckets instead of all of them.  This is the layout trick behind Delta
OPTIMIZE ZORDER BY; here it is a plain column expression + partitioned
write, and the pruning win is asserted by a test, not assumed.

Everything is exact integer arithmetic (min/max quantization then bit
interleave), so the bucket assignment is engine-exact and
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def quantize(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map a numeric column into [0, 2^bits): rank-free fixed-range
    quantization ((x - lo) * (2^bits - 1)) div (hi - lo) — pure integer
    arithmetic given integer inputs, no data-dependent sampling (unlike
    range partitioning), so the same row always lands in the same cell."""
    span = F.greatest(hi - lo, F.lit(1))
    q = ((col - lo) * F.lit((1 << bits) - 1)) / span
    return F.floor(q).cast("long")


def interleave_bits(x: Column, y: Column, bits: int) -> Column:
    """Morton code: bit i of x -> bit 2i, bit i of y -> bit 2i+1."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zorder_assignment(
    df: DataFrame,
    col_x: str,
    col_y: str,
    bits: int = 5,
    bucket_bits: int = 6,
) -> DataFrame:
    """Assign each row its Morton code and Z-bucket over two integer
    dimensions.  The global min/max of each dimension come from one tiny
    aggregate (broadcast as a 1-row cross join); everything after is a
    narrow projection — assignment costs one scan, no shuffle.  Writing
    `partitionBy(zbucket)` then physically clusters both dimensions;
    tests/test_layout.py asserts a rectangle predicate touches a small
    fraction of buckets (the pruning win single-column layouts cannot
    give)."""
    bounds = df.agg(
        F.min(col_x).cast("long").alias("_xlo"),
        F.max(col_x).cast("long").alias("_xhi"),
        F.min(col_y).cast("long").alias("_ylo"),
        F.max(col_y).cast("long").alias("_yhi"),
    )
    qx = quantize(
        F.col(col_x).cast("long"), F.col("_xlo"), F.col("_xhi"), bits
    )
    qy = quantize(
        F.col(col_y).cast("long"), F.col("_ylo"), F.col("_yhi"), bits
    )
    z = interleave_bits(qx, qy, bits)
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("zvalue", z)
        .withColumn(
            "zbucket", F.shiftright(F.col("zvalue"), 2 * bits - bucket_bits)
        )
        .drop("_xlo", "_xhi", "_ylo", "_yhi")
    )


def training_shard_assignment(
    df: DataFrame, key_col: str, n_shards: int = 8
) -> DataFrame:
    """Deterministic training-shard export assignment — the LAST step
    of a data pipeline before the trainer reads: every row gets a
    shard in [0, n_shards) by key hash (balanced in expectation,
    reproducible across reruns and engines) and a within-shard
    position by hash order (the "global shuffle" trainers need,
    WITHOUT a global sort: ordering is per shard, so each shard sorts
    independently and in parallel).

    Hash = first 8 md5 hex digits of the key as an integer — the same
    primitive as `sampling.hash_fraction`, so shard membership,
    ordering, and any downstream split/sample draws all derive from
    one engine-exact function.

    Scale shape: one narrow hash projection, one shuffle on shard id,
    one per-shard sort (row_number window) — writing with
    partitionBy(shard) then streams each shard to its own directory.
    A global orderBy(rand()) — the naive shuffle — would be one
    all-data range sort with a sampled boundary pass; this is the
    standard sharded equivalent trainers actually consume."""
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    w = Window.partitionBy("shard").orderBy("h", key_col)
    return (
        df.select(
            F.col(key_col),
            h.alias("h"),
            (h % n_shards).cast("int").alias("shard"),
        )
        .withColumn("pos", F.row_number().over(w))
        .select(key_col, "shard", "pos")
    )


def _hilbert_quadrant(rx: Column, ry: Column) -> Column:
    """(3*rx) XOR ry as a portable CASE (DuckDB's ^ is exponent, so the
    oracle can't spell bitwise xor the same way Spark does):
    (0,0)->0, (0,1)->1, (1,1)->2, (1,0)->3 — the Hilbert quadrant
    visit order."""
    return (
        F.when((rx == 0) & (ry == 0), F.lit(0))
        .when(rx == 0, F.lit(1))
        .when(ry == 0, F.lit(3))
        .otherwise(F.lit(2))
    )


def hilbert_index(x: Column, y: Column, bits: int) -> Column:
    """Hilbert curve index of a (x, y) cell in a 2^bits x 2^bits grid —
    the standard xy2d bit descent (rotate/reflect per level) as ONE
    `F.aggregate` fold over the per-level cell sizes.  Z-order's
    diagonal jumps make adjacent codes occasionally far apart in
    space; the Hilbert walk moves ONE cell per step, so equal-size
    code ranges are tighter rectangles — measurably fewer buckets per
    predicate rectangle at the same bucket count (tests/test_layout.py
    pins the comparison).

    Why a fold and not a per-level Python loop of column rewrites: the
    descent rebuilds BOTH coordinates from both previous coordinates
    each level, so an unrolled expression tree grows ~3x per level
    (≈3^bits nodes — at bits=5 the Catalyst analyze/codegen pass on
    that tree dominated the whole query's wall time).  The fold's
    lambda is one level's logic regardless of `bits`; values are
    bit-identical to the unrolled form (pinned against the pure-Python
    reference in tests)."""
    init = F.struct(
        x.cast("long").alias("x"),
        y.cast("long").alias("y"),
        F.lit(0).cast("long").alias("d"),
    )

    def _step(acc, s):
        rx = F.when(acc["x"].bitwiseAND(s) > 0, F.lit(1)).otherwise(F.lit(0))
        ry = F.when(acc["y"].bitwiseAND(s) > 0, F.lit(1)).otherwise(F.lit(0))
        nd = acc["d"] + s * s * _hilbert_quadrant(rx, ry)
        # rotate/reflect the lower bits, then swap axes (ry == 0 arm)
        nx = F.when(ry == 1, acc["x"]).otherwise(
            F.when(rx == 1, s - 1 - acc["y"]).otherwise(acc["y"])
        )
        ny = F.when(ry == 1, acc["y"]).otherwise(
            F.when(rx == 1, s - 1 - acc["x"]).otherwise(acc["x"])
        )
        return F.struct(
            nx.cast("long").alias("x"),
            ny.cast("long").alias("y"),
            nd.cast("long").alias("d"),
        )

    sizes = F.array(
        *[F.lit(1 << lvl).cast("long") for lvl in range(bits - 1, -1, -1)]
    )
    return F.aggregate(sizes, init, _step, lambda acc: acc["d"])


def hilbert_assignment(
    df: DataFrame,
    col_x: str,
    col_y: str,
    bits: int = 5,
    bucket_bits: int = 6,
) -> DataFrame:
    """Hilbert-curve sibling of `zorder_assignment`: same fixed-range
    quantization and broadcast bounds, Hilbert index instead of Morton
    code.  Same cost shape — one tiny bounds aggregate, then a narrow
    zero-shuffle projection."""
    bounds = df.agg(
        F.min(col_x).cast("long").alias("_xlo"),
        F.max(col_x).cast("long").alias("_xhi"),
        F.min(col_y).cast("long").alias("_ylo"),
        F.max(col_y).cast("long").alias("_yhi"),
    )
    qx = quantize(F.col(col_x).cast("long"), F.col("_xlo"), F.col("_xhi"), bits)
    qy = quantize(F.col(col_y).cast("long"), F.col("_ylo"), F.col("_yhi"), bits)
    h = hilbert_index(qx, qy, bits)
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("hvalue", h)
        .withColumn(
            "hbucket", F.shiftright(F.col("hvalue"), 2 * bits - bucket_bits)
        )
        .drop("_xlo", "_xhi", "_ylo", "_yhi")
    )
