"""Graph analytics over relationship edges derived from the relational
tables (north-star extension: the reference has no graph story, but a
training-data pipeline needs link analysis for source weighting and
spam/boilerplate domain scoring; SURVEY.md section 4).

``pagerank`` is the Pregel dataflow in pure DataFrame ops:

- **Ranks never leave the cluster.**  Each round is one equi-join of
  the rank table with the (cached) edge table plus one partial-agg
  shuffle keyed by destination — the same dataflow GraphX/Pregel runs,
  with AQE free to handle hub skew.  The driver never collects ranks;
  iteration count is fixed, so the whole job is a known finite DAG.
- **Exact integer arithmetic, no floats anywhere.**  Ranks are BIGINT
  unscaled values at scale 12 (rank 1.0 == 10^12).  The two divisions
  of the textbook update  r' = 0.15 + 0.85 * sum(r_u / deg_u)  are
  half-up integer divisions:  contrib = (2u + deg) div (2 deg)  and
  0.85x = (170 x + 100) div 200.  Every engine computes identical
  BIGINTs, so the DuckDB oracle hash-matches the raw rank_e12 column
  with no float rounding contract at all.  (Bounds: with total rank
  mass n * 10^12, the 170x intermediate needs x < 5.4e16 — any graph
  whose hottest node gathers less than ~54,000 units of rank mass is
  exact; beyond that, swap BIGINT for DECIMAL(38,0) unchanged.)
- **Dangling nodes cannot occur** by construction here: edges are
  symmetrized (u->v and v->u), so every node has out-degree >= 1.
  Empty inflow is still COALESCEd to 0 identically on both paths.

The default graph is the customer-supplier co-purchase bipartite graph
(distinct (o_custkey, l_suppkey) pairs via the order key), node-id
namespaced as 2*custkey / 2*suppkey+1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_ONE = 1_000_000_000_000  # rank 1.0 at scale 12
_BASE = 150_000_000_000  # 0.15 at scale 12


def bipartite_copurchase_edges(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Symmetrized customer<->supplier edges: distinct co-purchase pairs
    with integer-namespaced node ids (even = customer, odd = supplier)."""
    pairs = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("cnode"),
            (F.col("l_suppkey") * 2 + 1).alias("snode"),
        )
        .distinct()
    )
    fwd = pairs.select(F.col("cnode").alias("src"), F.col("snode").alias("dst"))
    rev = pairs.select(F.col("snode").alias("src"), F.col("cnode").alias("dst"))
    return fwd.unionByName(rev)


def pagerank(edges: DataFrame, iters: int = 3) -> DataFrame:
    """Fixed-iteration PageRank (d=0.85) over symmetric `edges`
    (src BIGINT, dst BIGINT).  Returns (node, rank_e12) with rank_e12
    the exact BIGINT rank at scale 12."""
    # Pay the src-shuffle once: every iteration joins edges on src, so
    # hash-partition + persist up front and the per-round sort-merge join
    # reuses the cached partitioning (no edge re-shuffle per iteration) —
    # the same pay-once bucketing argument as repeated key joins.
    edges = edges.repartition("src").persist()
    try:
        deg = edges.groupBy(F.col("src").alias("node")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        ranks = deg.select("node", "deg", F.lit(_ONE).cast("long").alias("u"))
        for _ in range(iters):
            contribs = ranks.select(
                "node",
                F.expr("(2 * u + deg) div (2 * deg)").alias("contrib"),
            )
            inflow = (
                edges.join(contribs, edges["src"] == contribs["node"])
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum("contrib").alias("inflow"))
            )
            ranks = deg.join(inflow, "node", "left").select(
                "node",
                "deg",
                F.expr(
                    f"cast({_BASE} + (170 * coalesce(inflow, 0) + 100) div 200"
                    " as long)"
                ).alias("u"),
            )
        out = ranks.select("node", F.col("u").alias("rank_e12"))
        out = out.localCheckpoint(eager=True)
    finally:
        edges.unpersist()
    return out


def pagerank_oracle_sql(iters: int = 3) -> str:
    """DuckDB replay of `pagerank` over the co-purchase graph: identical
    integer half-up arithmetic, unrolled one CTE pair per round."""
    parts = [
        """
    pairs AS (
      SELECT DISTINCT o.o_custkey * 2 AS cnode, l.l_suppkey * 2 + 1 AS snode
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (
      SELECT cnode AS src, snode AS dst FROM pairs
      UNION ALL
      SELECT snode AS src, cnode AS dst FROM pairs
    ),
    deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY 1),
    r0 AS (SELECT node, deg, CAST(1000000000000 AS BIGINT) AS u FROM deg)"""
    ]
    for i in range(1, iters + 1):
        parts.append(f"""
    c{i} AS (
      SELECT node, (2 * u + deg) // (2 * deg) AS contrib FROM r{i - 1}
    ),
    in{i} AS (
      SELECT e.dst AS node, SUM(c.contrib) AS inflow
      FROM edges e JOIN c{i} c ON e.src = c.node
      GROUP BY 1
    ),
    r{i} AS (
      SELECT d.node, d.deg,
             CAST(150000000000 + (170 * COALESCE(i.inflow, 0) + 100) // 200
                  AS BIGINT) AS u
      FROM deg d LEFT JOIN in{i} i ON d.node = i.node
    )""")
    return (
        "WITH "
        + ",".join(parts)
        + f"""
    SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
           node // 2 AS node_key, u AS rank_e12
    FROM r{iters}
    """
    )


def cosupply_edges(lineitem: DataFrame, min_orders: int = 3) -> DataFrame:
    """Undirected supplier-supplier edges (src < dst): pairs co-occurring
    in at least `min_orders` distinct orders.

    Pair generation collapses each order to its sorted distinct
    supplier array first (ONE shuffle on the order key), then expands
    C(n,2) ordered pairs as a narrow array expression — versus the
    naive same-key self-join, this halves the shuffles and never
    materializes the (order, supplier) table twice.  TPC-H orders hold
    <= 7 lineitems, so the per-order expansion is bounded; the count
    filter is one more partial-agg shuffle on the pair key."""
    per_order = lineitem.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_suppkey")).alias("ss")
    )
    pairs = per_order.select(
        F.explode(
            F.expr(
                "flatten(transform(ss, (x, i) -> "
                "transform(slice(ss, i + 2, size(ss)), "
                "y -> struct(x AS src, y AS dst))))"
            )
        ).alias("p")
    ).select("p.src", "p.dst")
    return (
        pairs.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= min_orders)
        .select("src", "dst")
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation via degree orientation — the
    standard scalable formulation: orient every undirected edge from its
    lower-degree endpoint (ties to the lower id), so each wedge apex has
    out-degree <= O(sqrt(|E|)) and the wedge self-join cannot blow up on
    hubs; each triangle is generated exactly once.  Input edges must be
    canonical (src < dst); returns (node, n_triangles) for nodes in at
    least one triangle."""
    edges = edges.select("src", "dst").distinct().persist()
    try:
        sym = edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        deg = sym.groupBy(F.col("src").alias("node")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        d1 = deg.select(F.col("node").alias("src"), F.col("deg").alias("deg_src"))
        d2 = deg.select(F.col("node").alias("dst"), F.col("deg").alias("deg_dst"))
        oriented = (
            edges.join(d1, "src")
            .join(d2, "dst")
            .select(
                F.when(
                    (F.col("deg_src") < F.col("deg_dst"))
                    | (
                        (F.col("deg_src") == F.col("deg_dst"))
                        & (F.col("src") < F.col("dst"))
                    ),
                    F.struct(F.col("src").alias("lo"), F.col("dst").alias("hi")),
                )
                .otherwise(
                    F.struct(F.col("dst").alias("lo"), F.col("src").alias("hi"))
                )
                .alias("e")
            )
            .select(F.col("e.lo").alias("src"), F.col("e.hi").alias("dst"))
        )
        e1, e2 = oriented.alias("e1"), oriented.alias("e2")
        wedges = e1.join(
            e2,
            (F.col("e1.src") == F.col("e2.src"))
            & (F.col("e1.dst") < F.col("e2.dst")),
        ).select(
            F.col("e1.src").alias("apex"),
            F.col("e1.dst").alias("b"),
            F.col("e2.dst").alias("c"),
        )
        tris = wedges.join(
            edges.select(
                F.least("src", "dst").alias("b_"), F.greatest("src", "dst").alias("c_")
            ).distinct(),
            (F.col("b") == F.col("b_")) & (F.col("c") == F.col("c_")),
        ).select("apex", "b", "c")
        members = (
            tris.select(F.col("apex").alias("node"))
            .unionByName(tris.select(F.col("b").alias("node")))
            .unionByName(tris.select(F.col("c").alias("node")))
        )
        out = members.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))
        out = out.localCheckpoint(eager=True)
    finally:
        edges.unpersist()
    return out


def triangle_oracle_sql(min_orders: int = 3) -> str:
    """DuckDB replay of cosupply_edges + triangle_counts (identical
    orientation and wedge-closure logic)."""
    return f"""
    WITH os_pairs AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    ),
    edges AS (
      SELECT a.l_suppkey AS src, b.l_suppkey AS dst
      FROM os_pairs a JOIN os_pairs b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= {min_orders}
    ),
    sym AS (
      SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges
    ),
    deg AS (SELECT src AS node, COUNT(*) AS deg FROM sym GROUP BY 1),
    oriented AS (
      SELECT CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND e.src < e.dst)
                  THEN e.src ELSE e.dst END AS src,
             CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND e.src < e.dst)
                  THEN e.dst ELSE e.src END AS dst
      FROM edges e
      JOIN deg d1 ON e.src = d1.node
      JOIN deg d2 ON e.dst = d2.node
    ),
    wedges AS (
      SELECT e1.src AS apex, e1.dst AS b, e2.dst AS c
      FROM oriented e1 JOIN oriented e2
        ON e1.src = e2.src AND e1.dst < e2.dst
    ),
    tris AS (
      SELECT w.apex, w.b, w.c
      FROM wedges w JOIN edges e
        ON LEAST(w.b, w.c) = e.src AND GREATEST(w.b, w.c) = e.dst
    ),
    members AS (
      SELECT apex AS node FROM tris
      UNION ALL SELECT b FROM tris
      UNION ALL SELECT c FROM tris
    )
    SELECT node, COUNT(*) AS n_triangles FROM members GROUP BY node
    """


def label_propagation(edges: DataFrame, iters: int = 3) -> DataFrame:
    """Fixed-iteration synchronous label propagation (Raghavan et al.
    2007) over symmetric `edges` (src BIGINT, dst BIGINT): every node
    starts as its own label; each round it adopts the most frequent
    label among its neighbors, ties broken by SMALLEST label — the
    deterministic variant (random tie-breaks don't survive an oracle,
    and min-ties are the standard reproducible choice).  Fixed `iters`
    keeps the DAG finite and makes the unrolled SQL oracle possible,
    exactly like `pagerank`; synchronous LPA can oscillate on bipartite
    structures, which a bounded round count also sidesteps.

    Returns (node, label) — nodes sharing a label after `iters` rounds
    form a community (source clustering / spam-domain grouping over the
    same graphs PageRank weighs).

    Scale shape mirrors pagerank: edges hash-partition on src ONCE
    (persist) and every round reuses that partitioning for the
    label⋈edge join; the per-round frequency vote is a groupBy
    (dst, label) partial aggregate plus one max_by-style window pick —
    all shuffles keyed on node id; localCheckpoint at the end releases
    the loop lineage."""
    edges = edges.repartition("src").persist()
    try:
        labels = edges.select(F.col("src").alias("node")).distinct().select(
            "node", F.col("node").alias("label")
        )
        for _ in range(iters):
            votes = (
                edges.join(labels, edges["src"] == labels["node"])
                .groupBy(F.col("dst").alias("node"), "label")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            w = Window.partitionBy("node").orderBy(
                F.desc("n"), F.asc("label")
            )
            labels = (
                votes.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .select("node", "label")
            )
        out = labels.localCheckpoint(eager=True)
    finally:
        edges.unpersist()
    return out


def label_propagation_oracle_sql(edges_cte: str, iters: int = 3) -> str:
    """Unrolled-CTE DuckDB oracle replaying `label_propagation` exactly:
    `edges_cte` must define a CTE named `edges(src, dst)` (symmetric).
    Same min-tie frequency vote per round, same fixed iteration count."""
    rounds = ["l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges)"]
    prev = "l0"
    for i in range(iters):
        rounds.append(
            f"""v{i} AS (
              SELECT e.dst AS node, l.label, COUNT(*) AS n
              FROM edges e JOIN {prev} l ON e.src = l.node
              GROUP BY e.dst, l.label
            ), l{i + 1} AS (
              SELECT node, label FROM (
                SELECT node, label,
                       row_number() OVER (PARTITION BY node
                                          ORDER BY n DESC, label ASC) AS rn
                FROM v{i}
              ) WHERE rn = 1
            )"""
        )
        prev = f"l{i + 1}"
    return f"WITH {edges_cte}, " + ", ".join(rounds) + f" SELECT node, label FROM {prev}"


def khop_reachability(edges: DataFrame, seeds: list[int], k: int = 3) -> DataFrame:
    """Minimum-hop BFS distance labeling from a seed set, bounded at
    `k` hops — the recursive-CTE query class (reachability, blast
    radius, neighborhood expansion) that Spark SQL cannot express with
    WITH RECURSIVE, done as the standard iterative frontier dataflow.

    Each round is ONE equi-join of the current frontier against the
    src-partitioned cached edge table plus a distinct and an anti-join
    against the visited set — the frontier never exceeds the node set,
    rounds are bounded by k, and lineage is truncated per round
    (localCheckpoint), so the job is a known finite DAG.  Returns
    (node, dist) with dist the MINIMUM distance <= k; seeds are dist 0.

    Oracle: `khop_oracle_sql` replays it as a DuckDB WITH RECURSIVE
    (UNION-distinct recursion on (node, dist) keeps the walk count
    linear) + min(dist) — exact integer parity."""
    spark = edges.sparkSession
    edges = edges.select("src", "dst").repartition("src").persist()
    try:
        visited = spark.createDataFrame(
            [(int(s), 0) for s in seeds], "node long, dist int"
        )
        frontier = visited.select("node")
        for d in range(1, k + 1):
            nxt = (
                edges.join(
                    frontier.withColumnRenamed("node", "src"), "src", "semi"
                )
                .select(F.col("dst").alias("node"))
                .distinct()
                .join(visited.select("node"), "node", "left_anti")
                .withColumn("dist", F.lit(d))
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                break
            # no checkpoint on the union: each nxt is already a
            # checkpointed LogicalRDD, so the accumulated visited plan
            # is a flat k-way union of materialized frames — re-copying
            # it per round was one O(|visited|) job per hop for nothing
            visited = visited.unionByName(nxt)
            frontier = nxt.select("node")
    finally:
        edges.unpersist()
    return visited


def khop_oracle_sql(edges_cte: str, seeds: list[int], k: int = 3) -> str:
    """DuckDB WITH RECURSIVE twin of `khop_reachability` over the same
    edge CTE.  UNION (distinct) recursion bounds the state at
    |nodes| x k rows; min(dist) collapses multiple discovery depths."""
    seed_rows = ", ".join(f"({s})" for s in seeds)
    return f"""
    WITH RECURSIVE {edges_cte},
    bfs(node, dist) AS (
      SELECT * FROM (VALUES {seed_rows}) s(node), (SELECT 0) d(dist)
      UNION
      SELECT e.dst AS node, b.dist + 1 AS dist
      FROM bfs b JOIN edges e ON e.src = b.node
      WHERE b.dist < {k}
    )
    SELECT CAST(node AS BIGINT) AS node, CAST(MIN(dist) AS INT) AS dist
    FROM bfs GROUP BY node
    """


_E6 = 1_000_000  # HITS fixed point: score 1.0 at scale 6


def hits(edges: DataFrame, iters: int = 2) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg 1999) over DIRECTED edges
    (src = hub side, dst = authority side): a_t = normalize(A^T h_{t-1}),
    h_t = normalize(A a_t), sum-normalized to the e6 fixed point with
    integer half-up division — every value every round is an exact
    BIGINT, so the iterative result hash-matches the unrolled-CTE
    oracle (the same no-float contract as `pagerank`'s e12 ranks).

    Returns (node, kind 'hub'|'authority', score_e6).

    Scale shape: edges are hash-partitioned once and persisted; each
    half-round is one join + one partial-agg shuffle, plus a one-row
    broadcast for the normalizing sum.  Overflow headroom: raw scores
    are <= max_degree * 1e6 and the normalizing multiply stays under
    2e17 for edge counts into the billions; beyond that drop the fixed
    point to e3 or shard the sum."""
    edges = edges.repartition("src").persist()
    try:
        hubs = (
            edges.select("src")
            .distinct()
            .select(F.col("src").alias("node"), F.lit(_E6).cast("long").alias("s"))
        )
        auth = None
        for _ in range(iters):
            araw = (
                edges.join(hubs, edges["src"] == hubs["node"])
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum("s").alias("raw"))
            )
            sa = araw.agg(F.sum("raw").alias("_t"))
            auth = araw.crossJoin(F.broadcast(sa)).select(
                "node",
                F.expr(f"cast((2 * raw * {_E6} + _t) div (2 * _t) as long)").alias(
                    "s"
                ),
            )
            hraw = (
                edges.join(auth, edges["dst"] == auth["node"])
                .groupBy(F.col("src").alias("node"))
                .agg(F.sum("s").alias("raw"))
            )
            sh = hraw.agg(F.sum("raw").alias("_t"))
            hubs = hraw.crossJoin(F.broadcast(sh)).select(
                "node",
                F.expr(f"cast((2 * raw * {_E6} + _t) div (2 * _t) as long)").alias(
                    "s"
                ),
            )
        out = hubs.select(
            "node", F.lit("hub").alias("kind"), F.col("s").alias("score_e6")
        ).unionByName(
            auth.select(
                "node",
                F.lit("authority").alias("kind"),
                F.col("s").alias("score_e6"),
            )
        )
        out = out.localCheckpoint(eager=True)
    finally:
        edges.unpersist()
    return out


def hits_oracle_sql(iters: int = 2) -> str:
    """DuckDB replay of `hits` over the directed customer->supplier
    co-purchase graph: identical integer half-up arithmetic, one CTE
    quadruple per round (raw/sum per side).  DuckDB SUM(BIGINT) is
    HUGEINT; every score casts back to BIGINT at the round boundary."""
    parts = [
        f"""
    dedges AS (
      SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    h0 AS (SELECT DISTINCT src AS node, CAST({_E6} AS BIGINT) AS s FROM dedges)"""
    ]
    for i in range(1, iters + 1):
        parts.append(f"""
    ar{i} AS (
      SELECT e.dst AS node, CAST(SUM(h.s) AS BIGINT) AS raw
      FROM dedges e JOIN h{i - 1} h ON e.src = h.node GROUP BY 1
    ),
    asum{i} AS (SELECT CAST(SUM(raw) AS BIGINT) AS t FROM ar{i}),
    a{i} AS (
      SELECT node,
             CAST((2 * raw * {_E6} + t) // (2 * t) AS BIGINT) AS s
      FROM ar{i} CROSS JOIN asum{i}
    ),
    hr{i} AS (
      SELECT e.src AS node, CAST(SUM(a.s) AS BIGINT) AS raw
      FROM dedges e JOIN a{i} a ON e.dst = a.node GROUP BY 1
    ),
    hsum{i} AS (SELECT CAST(SUM(raw) AS BIGINT) AS t FROM hr{i}),
    h{i} AS (
      SELECT node,
             CAST((2 * raw * {_E6} + t) // (2 * t) AS BIGINT) AS s
      FROM hr{i} CROSS JOIN hsum{i}
    )""")
    return (
        "WITH "
        + ",".join(parts)
        + f"""
    SELECT node, 'hub' AS kind, s AS score_e6 FROM h{iters}
    UNION ALL
    SELECT node, 'authority' AS kind, s AS score_e6 FROM a{iters}
    """
    )


def cosupply_weighted_edges(lineitem: DataFrame, min_orders: int = 2) -> DataFrame:
    """Directed weighted edges over the supplier co-supply graph:
    both orientations of each undirected co-supply pair, with integer
    cost ``w = 10 - LEAST(9, n_shared_orders)`` (more co-occurrence =
    cheaper hop, w in [1, 9]).  Integer weights keep every downstream
    shortest-path value an exact BIGINT — the same no-float contract as
    `pagerank`/`hits`."""
    per_order = lineitem.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_suppkey")).alias("ss")
    )
    pairs = (
        per_order.select(
            F.explode(
                F.expr(
                    "flatten(transform(ss, (x, i) -> "
                    "transform(slice(ss, i + 2, size(ss)), "
                    "y -> struct(x AS s1, y AS s2))))"
                )
            ).alias("p")
        )
        .select("p.s1", "p.s2")
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= min_orders)
        .withColumn("w", F.lit(10) - F.least(F.lit(9), F.col("n_orders")))
    )
    return pairs.select(
        F.col("s1").alias("src"), F.col("s2").alias("dst"), "w"
    ).unionByName(
        pairs.select(F.col("s2").alias("src"), F.col("s1").alias("dst"), "w")
    )


def sssp_bellman_ford(
    edges: DataFrame, source: int, rounds: int = 4
) -> DataFrame:
    """Bounded single-source shortest paths by synchronous Bellman-Ford
    relaxation: after R rounds, dist(v) is the exact minimum-cost path
    from `source` using <= R edges (the R-bounded SSSP semantics —
    deterministic whether or not the graph has converged, which is what
    makes a fixed-round oracle replay possible).

    Scale shape (the same iterative dataflow as `pagerank`/`khop`):
    edges are hash-partitioned on src and persisted once; each round is
    ONE equi-join of the current distance table against edges plus one
    min-combine shuffle, with lineage truncated per round
    (localCheckpoint) so the plan never grows.  Distances are exact
    BIGINTs (integer edge weights), so the unrolled-CTE oracle
    hash-matches with no float contract.

    Returns (node, dist) for every node reached within `rounds` hops.
    """
    edges = edges.select("src", "dst", "w").repartition("src").persist()
    try:
        dist = edges.sparkSession.createDataFrame(
            [(int(source), 0)], "node long, dist long"
        )
        for _ in range(rounds):
            relaxed = (
                edges.join(dist.withColumnRenamed("node", "src"), "src")
                .select(
                    F.col("dst").alias("node"),
                    (F.col("dist") + F.col("w")).cast("long").alias("dist"),
                )
                .unionByName(dist)
                .groupBy("node")
                .agg(F.min("dist").alias("dist"))
                # LAZY checkpoint: still truncates the per-round plan
                # (physical planning happens at checkpoint creation) but
                # defers materialization, so the whole R-round relaxation
                # runs as ONE Spark job at the eager pin below instead of
                # one blocking job per round — each round's blocks still
                # persist on first compute, so the two consumers per
                # round (join + union) share one evaluation
                .localCheckpoint(eager=False)
            )
            dist = relaxed
        # materialize while the edge cache pin is still held (a lazy
        # return would recompute every round's join against UNCACHED
        # edges when the caller finally acts on it)
        dist = dist.localCheckpoint(eager=True)
    finally:
        edges.unpersist()
    return dist


def sssp_oracle_sql(
    source: int, rounds: int = 4, min_orders: int = 2
) -> str:
    """DuckDB replay of `sssp_bellman_ford` over the weighted co-supply
    graph: one min-combine CTE per relaxation round, identical integer
    arithmetic (exact BIGINT parity, like the other graph oracles)."""
    edges_cte = f"""
    os AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    wpairs AS (
      SELECT a.l_suppkey AS s1, b.l_suppkey AS s2,
             10 - LEAST(9, COUNT(*)) AS w
      FROM os a JOIN os b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      GROUP BY 1, 2 HAVING COUNT(*) >= {min_orders}
    ),
    wedges AS (
      SELECT s1 AS src, s2 AS dst, w FROM wpairs
      UNION ALL
      SELECT s2 AS src, s1 AS dst, w FROM wpairs
    ),
    d0 AS (SELECT CAST({source} AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist)"""
    parts = [edges_cte]
    for i in range(1, rounds + 1):
        parts.append(f"""
    d{i} AS (
      SELECT node, MIN(dist) AS dist FROM (
        SELECT node, dist FROM d{i - 1}
        UNION ALL
        SELECT e.dst AS node, d.dist + e.w AS dist
        FROM d{i - 1} d JOIN wedges e ON e.src = d.node
      ) GROUP BY node
    )""")
    return (
        "WITH "
        + ",".join(parts)
        + f"""
    SELECT CAST(node AS BIGINT) AS node, CAST(dist AS BIGINT) AS dist
    FROM d{rounds}
    """
    )


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """Per-node local clustering coefficient 2T / (d(d-1)) over
    canonical undirected edges — "how interconnected is each node's
    neighborhood", the standard community-density diagnostic on top of
    the degree-oriented triangle count (same no-hub-blowup wedge
    generation; see `triangle_counts`).

    Returns (node, degree, n_triangles, coefficient) for nodes with
    degree >= 2; the coefficient is exact-integer-derived, rounded to 6
    (both engines do one double division on identical BIGINTs)."""
    edges = edges.select("src", "dst").distinct().persist()
    try:
        tri = triangle_counts(edges)
        sym = edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        deg = sym.groupBy(F.col("src").alias("node")).agg(
            F.count(F.lit(1)).alias("degree")
        )
        out = (
            deg.filter(F.col("degree") >= 2)
            .join(tri, "node", "left")
            .select(
                "node",
                F.col("degree").cast("long").alias("degree"),
                F.coalesce("n_triangles", F.lit(0)).cast("long").alias(
                    "n_triangles"
                ),
                F.round(
                    F.lit(2.0)
                    * F.coalesce("n_triangles", F.lit(0))
                    / (F.col("degree") * (F.col("degree") - 1))
                    + F.lit(1e-9),
                    6,
                ).alias("coefficient"),
            )
        )
        out = out.localCheckpoint(eager=True)
    finally:
        edges.unpersist()
    return out


def clustering_coefficient_oracle_sql(min_orders: int = 3) -> str:
    """DuckDB twin: wraps the triangle replay and joins degrees from
    the same canonical co-supply edge set."""
    tri_sql = triangle_oracle_sql(min_orders)
    return f"""
    WITH tri AS ({tri_sql}),
    os_pairs2 AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    edges2 AS (
      SELECT a.l_suppkey AS src, b.l_suppkey AS dst
      FROM os_pairs2 a JOIN os_pairs2 b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= {min_orders}
    ),
    sym2 AS (SELECT src, dst FROM edges2 UNION ALL SELECT dst, src FROM edges2),
    deg2 AS (SELECT src AS node, COUNT(*) AS degree FROM sym2 GROUP BY 1)
    SELECT d.node,
           CAST(d.degree AS BIGINT) AS degree,
           CAST(COALESCE(t.n_triangles, 0) AS BIGINT) AS n_triangles,
           ROUND(2.0 * COALESCE(t.n_triangles, 0)
                 / (d.degree * (d.degree - 1)) + 1e-9, 6) AS coefficient
    FROM deg2 d LEFT JOIN tri t ON t.node = d.node
    WHERE d.degree >= 2
    """


def personalized_pagerank(
    edges: DataFrame, seeds: list[int], iters: int = 3
) -> DataFrame:
    """Personalized PageRank (restart vector concentrated on `seeds`)
    over symmetric `edges` — the related-item / related-document
    retrieval primitive: stationary-ish mass concentrates in the seed
    set's graph neighborhood instead of on global hubs.  Same exact
    BIGINT x10^12 arithmetic contract as `pagerank` (half-up integer
    division per step, no float anywhere) so the iterative ranks
    hash-match the unrolled DuckDB oracle; the restart mass (1-d =
    0.15) is split equally over the seeds by integer division.

    Scale shape inherits `pagerank`: edges hash-partitioned on src and
    persisted once, one equi-join + one partial-agg shuffle per round;
    rank state never collects to the driver.  Returns only nodes with
    nonzero mass — the k-hop neighborhood of the seeds after `iters`
    rounds, which is the bounded output a retrieval consumer wants."""
    edges = edges.repartition("src").persist()
    try:
        deg = edges.groupBy(F.col("src").alias("node")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        seed_mass = _ONE // len(seeds)
        restart = (150 * _ONE // 100 // 10) // len(seeds)  # 0.15e12 / |seeds|
        is_seed = F.col("node").isin([int(s) for s in seeds])
        ranks = deg.select(
            "node",
            "deg",
            F.when(is_seed, F.lit(seed_mass)).otherwise(F.lit(0)).cast("long").alias("u"),
        )
        for _ in range(iters):
            contribs = ranks.select(
                "node",
                F.expr("(2 * u + deg) div (2 * deg)").alias("contrib"),
            )
            inflow = (
                edges.join(contribs, edges["src"] == contribs["node"])
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum("contrib").alias("inflow"))
            )
            ranks = deg.join(inflow, "node", "left").select(
                "node",
                "deg",
                (
                    F.when(is_seed, F.lit(restart)).otherwise(F.lit(0))
                    + F.expr("(170 * coalesce(inflow, 0) + 100) div 200")
                ).cast("long").alias("u"),
            )
        out = ranks.filter(F.col("u") > 0).select(
            "node", F.col("u").alias("ppr_e12")
        )
        out = out.localCheckpoint(eager=True)
    finally:
        edges.unpersist()
    return out


def personalized_pagerank_oracle_sql(seeds: list[int], iters: int = 3) -> str:
    """DuckDB replay of `personalized_pagerank` over the co-purchase
    graph: identical integer arithmetic, unrolled one CTE pair per
    round, restart mass only on the seed rows."""
    seed_list = ", ".join(str(int(s)) for s in seeds)
    seed_mass = _ONE // len(seeds)
    restart = (150 * _ONE // 100 // 10) // len(seeds)
    parts = [
        f"""
    pairs AS (
      SELECT DISTINCT o.o_custkey * 2 AS cnode, l.l_suppkey * 2 + 1 AS snode
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (
      SELECT cnode AS src, snode AS dst FROM pairs
      UNION ALL
      SELECT snode AS src, cnode AS dst FROM pairs
    ),
    deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY 1),
    r0 AS (
      SELECT node, deg,
             CAST(CASE WHEN node IN ({seed_list}) THEN {seed_mass}
                       ELSE 0 END AS BIGINT) AS u
      FROM deg
    )"""
    ]
    for i in range(1, iters + 1):
        parts.append(f"""
    c{i} AS (
      SELECT node, (2 * u + deg) // (2 * deg) AS contrib FROM r{i - 1}
    ),
    in{i} AS (
      SELECT e.dst AS node, SUM(c.contrib) AS inflow
      FROM edges e JOIN c{i} c ON e.src = c.node
      GROUP BY 1
    ),
    r{i} AS (
      SELECT d.node, d.deg,
             CAST(CASE WHEN d.node IN ({seed_list}) THEN {restart}
                       ELSE 0 END
                  + (170 * COALESCE(i.inflow, 0) + 100) // 200
                  AS BIGINT) AS u
      FROM deg d LEFT JOIN in{i} i ON d.node = i.node
    )"""
        )
    return (
        "WITH "
        + ",".join(parts)
        + f"""
    SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
             AS node_type,
           node // 2 AS node_key, u AS ppr_e12
    FROM r{iters} WHERE u > 0
    """
    )


def kcore_membership(
    edges: DataFrame, k: int, rounds: int = 8
) -> DataFrame:
    """Fixed-round k-core peeling (Seidman 1983; the Batagelj-Zaversnik
    iterated form): repeatedly drop nodes whose degree among SURVIVORS
    is below k; after `rounds` rounds, return the surviving nodes with
    their within-core degree.  With enough rounds this is the exact
    k-core (peeling is monotone — the removed set only grows); the
    fixed unroll keeps the oracle expressible, and the convergence
    test pins that `rounds` suffices on the bench graph (one more
    round is a fixpoint no-op there).

    Scale shape: the same pay-once contract as pagerank — edges are
    src-partitioned and persisted once; each round is one semi-join
    prune (both endpoints alive) + one src-keyed partial-agg count,
    with localCheckpoint per round to keep lineage flat.  No all-pairs
    anything; cost is O(rounds * |E|)."""
    edges = edges.repartition("src").persist()
    alive = edges.select(F.col("src").alias("node")).distinct()
    try:
        for _ in range(rounds):
            a_src = alive.select(F.col("node").alias("src"))
            a_dst = alive.select(F.col("node").alias("dst"))
            deg = (
                edges.join(a_src, "src")
                .join(a_dst, "dst")
                .groupBy("src")
                .agg(F.count(F.lit(1)).alias("deg"))
            )
            alive = (
                deg.filter(F.col("deg") >= k)
                .select(F.col("src").alias("node"))
                # LAZY: plan still truncated per round; the final eager
                # checkpoint below materializes the whole peel as ONE
                # job (was one blocking job per round), with each
                # round's blocks persisted on first compute so the two
                # consumers (a_src, a_dst) share one evaluation
                .localCheckpoint(eager=False)
            )
        # final within-core degree over the surviving induced subgraph
        a_src = alive.select(F.col("node").alias("src"))
        a_dst = alive.select(F.col("node").alias("dst"))
        out = (
            edges.join(a_src, "src")
            .join(a_dst, "dst")
            .groupBy("src")
            .agg(F.count(F.lit(1)).cast("long").alias("core_deg"))
            .select(F.col("src").cast("long").alias("node"), "core_deg")
        )
        return out.localCheckpoint(eager=True)
    finally:
        edges.unpersist()


def kcore_oracle_sql(k: int, rounds: int = 8) -> str:
    """DuckDB replay of `kcore_membership` as unrolled CTEs over the
    same co-purchase edge construction."""
    parts = [
        """
    pairs AS (
      SELECT DISTINCT o_custkey * 2 AS cnode, l_suppkey * 2 + 1 AS snode
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (
      SELECT cnode AS src, snode AS dst FROM pairs
      UNION ALL SELECT snode, cnode FROM pairs
    ),
    alive0 AS (SELECT DISTINCT src AS node FROM edges)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(f"""
    deg{r} AS (
      SELECT e.src, COUNT(*) AS deg FROM edges e
      JOIN alive{r - 1} a ON a.node = e.src
      JOIN alive{r - 1} b ON b.node = e.dst
      GROUP BY e.src
    ),
    alive{r} AS (SELECT src AS node FROM deg{r} WHERE deg >= {k})""")
    parts.append(f"""
    final AS (
      SELECT e.src AS node, COUNT(*) AS core_deg FROM edges e
      JOIN alive{rounds} a ON a.node = e.src
      JOIN alive{rounds} b ON b.node = e.dst
      GROUP BY e.src
    )
    SELECT CAST(node AS BIGINT) AS node, CAST(core_deg AS BIGINT) AS core_deg
    FROM final""")
    return "WITH " + ",".join(parts)
