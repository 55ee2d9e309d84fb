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

from pyspark.sql import Column, DataFrame
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
