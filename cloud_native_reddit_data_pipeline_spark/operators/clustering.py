"""Embedding clustering (north-star extension — the reference has no
vector pipeline; SURVEY.md section 4 names clustering as the IVF
building block the engine should own end-to-end).

``kmeans_lloyd`` is Lloyd's k-means expressed the way a 1000-executor
cluster wants it:

- **Centroids are driver metadata, the corpus never shuffles by pair.**
  Each iteration broadcasts the k x d centroid table as literals into a
  narrow per-row map (distance + argmin via array expressions), then
  recomputes centroids with ONE partial-aggregated shuffle of at most
  k x d x partitions rows (map-side combine reduces each partition to
  k x d partial sums).  This is the Spark MLlib KMeans dataflow,
  re-expressed with DataFrame-native decimal arithmetic.
- **The quantized corpus is cached once** across iterations (released
  before return via `caching.materialize_and_release` semantics — the
  returned assignment is small relative to the pinned input).
- **Exact cross-engine determinism.**  Floating-point k-means diverges
  between engines because FP addition is order-sensitive (and engine
  ROUND-on-double implementations disagree near half-way points —
  observed empirically: Java's exact-binary-expansion HALF_UP vs
  DuckDB's multiply-based round flip the 6th decimal in opposite
  directions).  So the loop contains NO doubles at all: every value is
  quantized to DECIMAL(9,6) on ingest, distances are exact decimal
  sums (order-insensitive), and the centroid mean is re-quantized each
  round by exact INTEGER half-up division of the sum's unscaled value:
  mean6 = (2*U + n) div (2*n) for U >= 0 (sign-reflected otherwise),
  where U = sum * 10^6.  The DuckDB oracle (``kmeans_oracle_sql``)
  replays the identical algorithm in unrolled CTEs and hash-matches
  assignments AND distances.
- **Ties break deterministically** on the lower cluster id (exact
  decimal equality, `array_position` of the array minimum).
- **Empty clusters keep their previous centroid** (driver-side fill
  here, LEFT JOIN + COALESCE in the oracle — same semantics).

Iteration count is fixed (no convergence test) so the plan is a known,
finite DAG — the norm for production training-data pipelines where a
bounded job beats an unbounded-until-converged one.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal, localcontext

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SIX = Decimal("0.000001")


def _mean_quant(s: Decimal, n: int) -> Decimal:
    """Half-up mean at 6 decimal places, computed exactly (prec=50
    covers any unscaled sum this engine can produce before quantize)."""
    with localcontext() as ctx:
        ctx.prec = 50
        return (s / n).quantize(_SIX, ROUND_HALF_UP)

QUANT = "decimal(9,6)"
# Accumulator for the distance fold.  Addition of (30,12)+(21,12) stays
# within Spark's 38-digit cap at scale 12 (no scale-reduction rounding),
# and the cast back to (30,12) is exact because a squared-L2 distance of
# 6-decimal values over <=10^4 dims is far below 10^18.
_DIST = "decimal(30,12)"


def _quantize(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return emb.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda v: v.cast(QUANT)).alias("xd"),
    )


def _dec_lit(v: Decimal) -> str:
    return f"CAST('{format(v, 'f')}' AS {QUANT})"


def dist_sql(centroid: list[Decimal], vec_sql: str = "xd") -> str:
    """SQL text for the exact squared L2 distance from a quantized array
    column to one broadcast centroid: zip_with diff-square, decimal-sum
    aggregate.  Emitted as a string and parsed JVM-side in ONE F.expr
    call: building k x d literal Columns through the py4j bridge costs
    ~1 ms per call and dominated wall-clock (measured 2.7 s of a 5 s
    encode) before this rewrite."""
    cents = ",".join(_dec_lit(c) for c in centroid)
    return (
        f"aggregate(zip_with({vec_sql}, array({cents}), (a,b) -> (a-b)*(a-b)), "
        f"CAST(0 AS {_DIST}), (acc,x) -> CAST(acc + x AS {_DIST}))"
    )


def dist_expr(vec_sql: str, cent_sql: str) -> str:
    """Exact squared L2 distance between two decimal array expressions —
    the literal-free form of `dist_sql`: the centroid comes from a
    COLUMN (broadcast codebook frame), so the expression tree stays a
    few nodes regardless of k x d.  Whole-stage codegen compiles one
    small lambda instead of a k x d-literal tree — round 3 measured the
    literal form's parse+codegen as the dominant FIXED cost of the PQ
    path (8.2 s wall at sf0.1, data-independent)."""
    return (
        f"aggregate(zip_with({vec_sql}, {cent_sql}, (a,b) -> (a-b)*(a-b)), "
        f"CAST(0 AS {_DIST}), (acc,x) -> CAST(acc + x AS {_DIST}))"
    )


def centroid_frame(spark, centroids: list[list[Decimal]]) -> DataFrame:
    """The k x d centroid matrix as a ONE-ROW DataFrame (column `cents`:
    array<array<decimal>>), broadcast-cross-joined onto the corpus.  A
    single-row broadcast nested-loop join is free, keeps the assignment
    a narrow map (no shuffle), and carries the centroids as DATA instead
    of literal expression nodes."""
    return spark.createDataFrame([(centroids,)], f"cents array<array<{QUANT}>>")


def _assign(quant: DataFrame, centroids: list[list[Decimal]]) -> DataFrame:
    cents = centroid_frame(quant.sparkSession, centroids)
    dists = f"transform(cents, c -> {dist_expr('xd', 'c')})"
    return (
        quant.crossJoin(F.broadcast(cents))
        .select("*", F.expr(dists).alias("_dists"))
        .select(
            "*",
            F.expr(
                "CAST(array_position(_dists, array_min(_dists)) - 1 AS INT)"
            ).alias("cluster"),
            F.expr("array_min(_dists)").alias("d"),
        )
        .drop("_dists", "cents")
    )


def kmeans_lloyd(
    emb: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run `iters` Lloyd update rounds from deterministic seeds (the k
    lowest-id vectors), then return the final assignment:
    (id_col, cluster, dist2) where dist2 is the squared L2 distance to
    the winning centroid, rounded to 6 places."""
    quant = _quantize(emb, id_col, vec_col).persist()
    try:
        seed_rows = quant.orderBy(id_col).limit(k).collect()
        centroids = [list(r["xd"]) for r in seed_rows]

        for _ in range(iters):
            assigned = _assign(quant, centroids)
            sums = (
                assigned.select("cluster", F.posexplode("xd").alias("dim", "val"))
                .groupBy("cluster", "dim")
                .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
                .collect()
            )
            new = {
                (r["cluster"], r["dim"]): _mean_quant(r["s"], r["n"]) for r in sums
            }
            centroids = [
                [new.get((j, d), centroids[j][d]) for d in range(len(centroids[j]))]
                for j in range(k)
            ]

        # Round the EXACT decimal distance to 6 places (decimal->decimal
        # cast rounds half-up in both Spark and DuckDB) before the double
        # conversion: squared sums of 6-decimal values land on true
        # half-way points at scale 12, where double-rounding paths
        # diverge between engines.
        out = _assign(quant, centroids).select(
            id_col,
            "cluster",
            F.col("d").cast("decimal(20,6)").cast("double").alias("dist2"),
        )
        out = out.localCheckpoint(eager=True)
    finally:
        quant.unpersist()
    return out


def kmeans_oracle_sql(
    table: str = "embeddings",
    k: int | str = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB replay of `kmeans_lloyd` as unrolled CTEs: long-form
    quantized vectors, per-round exact-decimal assignment + re-quantized
    centroid means, LEFT JOIN/COALESCE for empty clusters.

    `k` may be a SQL expression string (e.g. a scalar subquery deriving
    k from the corpus count — DuckDB allows subqueries in LIMIT), so the
    oracle can replay corpus-sized clustering without baking a count."""
    parts = [
        f"""
    long AS (
      SELECT {id_col} AS vid,
             generate_subscripts({vec_col}, 1) AS dim,
             -- via DOUBLE: DuckDB's direct FLOAT->DECIMAL cast works in
             -- single precision and can land 1 ulp away from Spark's
             -- (exact float->double widening, then half-up) path.
             CAST(CAST(unnest({vec_col}) AS DOUBLE) AS DECIMAL(9,6)) AS val
      FROM {table}
    ),
    init_ids AS (
      SELECT vid, row_number() OVER (ORDER BY vid) - 1 AS cluster
      FROM (SELECT {id_col} AS vid FROM {table} ORDER BY {id_col} LIMIT {k})
    ),
    cent0 AS (
      SELECT i.cluster, l.dim, l.val FROM long l JOIN init_ids i USING (vid)
    )"""
    ]
    for i in range(1, iters + 2):
        parts.append(f"""
    dist{i} AS (
      SELECT l.vid, c.cluster,
             SUM((l.val - c.val) * (l.val - c.val)) AS d
      FROM long l JOIN cent{i - 1} c ON l.dim = c.dim
      GROUP BY 1, 2
    ),
    asg{i} AS (
      SELECT vid, cluster, d FROM (
        SELECT *, row_number() OVER (PARTITION BY vid ORDER BY d, cluster) AS rn
        FROM dist{i}
      ) WHERE rn = 1
    )""")
        if i <= iters:
            parts.append(f"""
    usum{i} AS (
      -- U = sum * 10^6 (exact integer); half-up mean at 6 places via
      -- integer division: (2U + n) // (2n), sign-reflected for U < 0.
      SELECT a.cluster, l.dim,
             CAST(SUM(l.val) * 1000000 AS BIGINT) AS u,
             COUNT(*) AS n
      FROM long l JOIN asg{i} a USING (vid)
      GROUP BY 1, 2
    ),
    sums{i} AS (
      SELECT cluster, dim,
             CAST(CAST(CASE WHEN u >= 0 THEN (2 * u + n) // (2 * n)
                            ELSE -((-2 * u + n) // (2 * n)) END
                       AS DECIMAL(16,0)) * CAST(0.000001 AS DECIMAL(7,6))
                  AS DECIMAL(9,6)) AS val
      FROM usum{i}
    ),
    cent{i} AS (
      SELECT c.cluster, c.dim, COALESCE(s.val, c.val) AS val
      FROM cent{i - 1} c LEFT JOIN sums{i} s
        ON s.cluster = c.cluster AND s.dim = c.dim
    )""")
    final = iters + 1
    return (
        "WITH "
        + ",".join(parts)
        + f"""
    SELECT vid AS {id_col}, CAST(cluster AS INT) AS cluster,
           CAST(ROUND(d, 6) AS DOUBLE) AS dist2
    FROM asg{final}
    """
    )
