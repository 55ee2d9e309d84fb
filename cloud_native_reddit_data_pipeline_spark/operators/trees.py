"""Bounded-depth tree / hierarchy flattening.

Spark SQL has no ``WITH RECURSIVE``, so hierarchy queries — comment-tree
flattening, thread reconstruction, org charts, BOM explosions — are done
as a fixed-round frontier descent: one equi-join per level against a
parent-partitioned child table, lineage truncated per round
(localCheckpoint), exactly the shape of graph.khop_reachability but
carrying the root-to-node PATH instead of a distance.

Reference parity: the reference pipeline ingests Reddit comment FORESTS
(reddit_harvester harvests a submission plus its comment tree via PRAW
and flattens them with a parent-id foreign key for indexing — SURVEY §2
O2).  The reference stops at flattening; this module adds the
training-data asks on top of the same tree shape:

* ``tree_paths``       — root-to-node path materialization (the recursive
                         CTE the reference's ES consumers would need to
                         reconstruct a thread),
* leaf paths → multi-turn conversation examples (assembled in
  queries.thread_conversations: each root-to-leaf path is a candidate
  chat-training example with depth-alternating roles),
* ``subtree_rollup``   — per-node descendant counts / metric sums (thread
                         engagement rollups) via path explode, no
                         iterative upward pass.

Scale notes (100 TB):
* Rounds are bounded by ``max_depth`` (real comment trees are shallow —
  Reddit caps render depth ~10); each round is ONE shuffle keyed on
  parent id against a persisted, parent-partitioned child table.
* The frontier never exceeds one tree level; path strings grow O(depth)
  per row, the same payload a recursive CTE would carry.
* ``subtree_rollup`` explodes each node's ancestor list (O(n · depth)
  rows) and aggregates by ancestor — a single groupBy, no per-level
  barrier, and the explode is Catalyst-native (no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def tree_paths(
    nodes: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent_id",
    max_depth: int = 16,
) -> DataFrame:
    """Materialize the root-to-node path for every node of a forest.

    ``nodes`` is one row per node with ``parent_col`` NULL for roots.
    Returns (node_id, root_id, depth, path) where ``path`` is the
    '/'-joined id sequence from the root down to the node (inclusive)
    and ``depth`` is 0 for roots.  Nodes deeper than ``max_depth`` (or
    on a parent cycle) are dropped — the bound is what makes the job a
    known finite DAG.

    Oracle shape (DuckDB)::

        WITH RECURSIVE p AS (
          SELECT id AS node_id, id AS root_id, 0 AS depth,
                 CAST(id AS VARCHAR) AS path
          FROM nodes WHERE parent_id IS NULL
          UNION ALL
          SELECT n.id, p.root_id, p.depth + 1,
                 p.path || '/' || CAST(n.id AS VARCHAR)
          FROM nodes n JOIN p ON n.parent_id = p.node_id
          WHERE p.depth < max_depth
        ) SELECT * FROM p
    """
    children = (
        nodes.filter(F.col(parent_col).isNotNull())
        .select(
            F.col(id_col).cast("long").alias("_child"),
            F.col(parent_col).cast("long").alias("_parent"),
        )
        .repartition("_parent")
        .persist()
    )
    try:
        out = (
            nodes.filter(F.col(parent_col).isNull())
            .select(
                F.col(id_col).cast("long").alias("node_id"),
                F.col(id_col).cast("long").alias("root_id"),
                F.lit(0).alias("depth"),
                F.col(id_col).cast("string").alias("path"),
            )
            .localCheckpoint(eager=True)
        )
        frontier = out
        for d in range(1, max_depth + 1):
            nxt = (
                children.join(
                    frontier.select(
                        F.col("node_id").alias("_parent"),
                        "root_id",
                        "path",
                    ),
                    "_parent",
                )
                .select(
                    F.col("_child").alias("node_id"),
                    "root_id",
                    F.lit(d).alias("depth"),
                    F.concat_ws("/", "path", F.col("_child").cast("string")).alias(
                        "path"
                    ),
                )
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                break
            out = out.unionByName(nxt).localCheckpoint(eager=True)
            frontier = nxt
    finally:
        children.unpersist()
    return out


def mark_leaves(
    paths: DataFrame, nodes: DataFrame, id_col: str = "id", parent_col: str = "parent_id"
) -> DataFrame:
    """Append ``is_leaf`` to a ``tree_paths`` result: a node is a leaf
    iff its id never appears as anyone's parent.  One anti-joinable
    distinct over the (small relative to nodes) parent column."""
    parents = (
        nodes.filter(F.col(parent_col).isNotNull())
        .select(F.col(parent_col).cast("long").alias("node_id"))
        .distinct()
        .withColumn("_has_kids", F.lit(True))
    )
    return paths.join(parents, "node_id", "left").withColumn(
        "is_leaf", F.coalesce(F.col("_has_kids"), F.lit(False)) == F.lit(False)
    ).drop("_has_kids")


def subtree_rollup(
    paths: DataFrame,
    metrics: DataFrame,
    metric_col: str,
    id_col: str = "node_id",
) -> DataFrame:
    """Per-node SUBTREE aggregates — descendant count and metric sum
    over every node under (and including) each node — without an
    iterative upward pass: each node's path already names all its
    ancestors, so exploding the path yields (ancestor, node) coverage
    pairs and ONE groupBy finishes the rollup.

    ``metrics`` is (id_col, metric_col) per node.  Returns
    (node_id, subtree_nodes, subtree_<metric_col>).  O(n · depth)
    exploded rows, a single shuffle keyed on ancestor id.
    """
    per_node = paths.join(
        metrics.select(
            F.col(id_col).cast("long").alias("node_id"),
            F.col(metric_col).alias("_m"),
        ),
        "node_id",
    )
    pairs = per_node.select(
        F.explode(
            F.transform(F.split("path", "/"), lambda s: s.cast("long"))
        ).alias("anc"),
        F.col("_m"),
    )
    return pairs.groupBy(F.col("anc").alias("node_id")).agg(
        F.count("*").alias("subtree_nodes"),
        F.sum("_m").alias(f"subtree_{metric_col}"),
    )
