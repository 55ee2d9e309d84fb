"""Neighborhood collaborative filtering over co-purchase behavior
(north-star extension: recommender primitives on the relational star
schema — user-user cosine neighborhoods and top-N item recommendation,
the classic Sarwar et al. 2001 / GroupLens family).

Scale shape: the similarity join fans out ONLY through the seed users'
baskets (candidate pairs come from sharing an item with a seed — never
an all-users cross join), so cost is |seed baskets| x item popularity.
At 100 TB the one extra lever is a hot-item df-cap (drop items in more
than N baskets from the PAIRING stage only), the same guard as
`dedup.jaccard_pairs` — popularity-capped candidate generation is the
standard production recommender shape.  Ranking math uses rounded
cosines + the repo's boundary-nudge so both engines rank identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def copurchase_recommendations(
    lineitem: DataFrame,
    orders: DataFrame,
    seed_custkeys: list[int],
    k_neighbors: int = 10,
    top_n: int = 5,
) -> DataFrame:
    """Top-N part recommendations for each seed customer: find the
    `k_neighbors` most similar customers by cosine over distinct
    purchased-part sets (n_shared / sqrt(n_a * n_b)), then rank the
    neighbors' parts the seed has NOT bought by summed neighbor
    similarity.

    Returns (seed_custkey, recommended_partkey, score, n_neighbors,
    rec_rank)."""
    cp = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part")
        )
        .distinct()
    )
    sizes = cp.groupBy("cust").agg(F.count(F.lit(1)).alias("n_parts"))
    seeds = [int(s) for s in seed_custkeys]
    seed_cp = cp.filter(F.col("cust").isin(seeds)).select(
        F.col("cust").alias("seed"), "part"
    )
    shared = (
        seed_cp.join(cp, "part")
        .filter(F.col("cust") != F.col("seed"))
        .groupBy("seed", F.col("cust").alias("nbr"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    cos = (
        shared.join(
            F.broadcast(
                sizes.filter(F.col("cust").isin(seeds)).select(
                    F.col("cust").alias("seed"), F.col("n_parts").alias("n_seed")
                )
            ),
            "seed",
        )
        .join(
            sizes.select(F.col("cust").alias("nbr"), F.col("n_parts").alias("n_nbr")),
            "nbr",
        )
        .select(
            "seed",
            "nbr",
            F.round(
                F.col("n_shared")
                / F.sqrt(F.col("n_seed").cast("double") * F.col("n_nbr")),
                4,
            ).alias("cos"),
        )
    )
    wk = Window.partitionBy("seed").orderBy(F.desc("cos"), F.asc("nbr"))
    neighbors = cos.withColumn("_rk", F.row_number().over(wk)).filter(
        F.col("_rk") <= k_neighbors
    )
    candidate = (
        neighbors.join(cp, neighbors["nbr"] == cp["cust"])
        .select("seed", "part", "cos")
        .join(
            seed_cp.withColumnRenamed("seed", "s2").withColumnRenamed(
                "part", "p2"
            ),
            (F.col("seed") == F.col("s2")) & (F.col("part") == F.col("p2")),
            "left_anti",
        )
    )
    # cos is pre-rounded to 4 places, so the 1e4-scaled long is exact;
    # the integer sum is order-insensitive across partitions/retries
    # (double addition order is not), matching the repo's exact-sum
    # convention (SCALE.md)
    scored = candidate.groupBy("seed", "part").agg(
        F.round(
            F.sum(F.round(F.col("cos") * 10000).cast("long")) / F.lit(10000.0)
            + F.lit(1e-9),
            4,
        ).alias("score"),
        F.count(F.lit(1)).alias("n_neighbors"),
    )
    wr = Window.partitionBy("seed").orderBy(
        F.desc("score"), F.desc("n_neighbors"), F.asc("part")
    )
    return (
        scored.withColumn("rec_rank", F.row_number().over(wr))
        .filter(F.col("rec_rank") <= top_n)
        .select(
            F.col("seed").alias("seed_custkey"),
            F.col("part").alias("recommended_partkey"),
            "score",
            F.col("n_neighbors").cast("long").alias("n_neighbors"),
            "rec_rank",
        )
    )


def recommend_oracle_sql(
    seed_custkeys: list[int], k_neighbors: int = 10, top_n: int = 5
) -> str:
    """DuckDB twin of `copurchase_recommendations`."""
    seeds = ", ".join(str(int(s)) for s in seed_custkeys)
    return f"""
    WITH cp AS (
      SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    sizes AS (SELECT cust, COUNT(*) AS n_parts FROM cp GROUP BY cust),
    seed_cp AS (
      SELECT cust AS seed, part FROM cp WHERE cust IN ({seeds})
    ),
    shared AS (
      SELECT s.seed, c.cust AS nbr, COUNT(*) AS n_shared
      FROM seed_cp s JOIN cp c ON s.part = c.part AND c.cust <> s.seed
      GROUP BY 1, 2
    ),
    cos AS (
      SELECT sh.seed, sh.nbr,
             ROUND(sh.n_shared
                   / SQRT(CAST(a.n_parts AS DOUBLE) * b.n_parts), 4) AS cos
      FROM shared sh
      JOIN sizes a ON a.cust = sh.seed
      JOIN sizes b ON b.cust = sh.nbr
    ),
    neighbors AS (
      SELECT seed, nbr, cos FROM (
        SELECT *, row_number() OVER (PARTITION BY seed
                                     ORDER BY cos DESC, nbr ASC) AS rk
        FROM cos
      ) WHERE rk <= {k_neighbors}
    ),
    candidate AS (
      SELECT n.seed, c.part, n.cos
      FROM neighbors n JOIN cp c ON c.cust = n.nbr
      WHERE NOT EXISTS (
        SELECT 1 FROM seed_cp s
        WHERE s.seed = n.seed AND s.part = c.part
      )
    ),
    scored AS (
      SELECT seed, part,
             ROUND(SUM(CAST(ROUND(cos * 10000) AS BIGINT)) / 10000.0
                   + 1e-9, 4) AS score,
             COUNT(*) AS n_neighbors
      FROM candidate GROUP BY seed, part
    )
    SELECT seed AS seed_custkey, part AS recommended_partkey, score,
           CAST(n_neighbors AS BIGINT) AS n_neighbors, rec_rank
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY seed
        ORDER BY score DESC, n_neighbors DESC, part ASC) AS rec_rank
      FROM scored
    ) WHERE rec_rank <= {top_n}
    """
