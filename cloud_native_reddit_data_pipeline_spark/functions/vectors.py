"""Vector math over array<float|double> columns — pure higher-order
column functions (zip_with / aggregate), no UDFs, so the hot path stays
in the JVM and whole-stage codegen.

Used by similarity search and embedding near-dup (north-star extensions
per SURVEY.md §2 "not present" list; the reference has no vector
operations).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(arr: Column | str) -> Column:
    c = F.col(arr) if isinstance(arr, str) else arr
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; inputs cast to double element-wise so the fold
    matches double-precision oracles exactly."""
    ad, bd = as_double(a), as_double(b)
    return dot(ad, bd) / (norm(ad) * norm(bd))


def hyperplane_bits(arr: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH signature: for each literal plane h_j,
    bit_j = 1 if dot(v, h_j) >= 0.  Returns a compact bucket-id string.

    The planes are literals baked into the expression, so the same
    signature is SQL-expressible for oracle checks and needs no model
    state — at scale this is a narrow map over the scan."""
    ad = as_double(arr)
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(ad, F.array(*[F.lit(x) for x in plane]), lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for plane in planes
    ]
    return F.concat(*bits)


def make_planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (pure python LCG so the
    exact same literals can be embedded in oracle SQL)."""
    state = seed
    planes: list[list[float]] = []
    for _ in range(n_planes):
        plane = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            plane.append(round(((state >> 11) / float(1 << 53)) * 2.0 - 1.0, 6))
        planes.append(plane)
    return planes
