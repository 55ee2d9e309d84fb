"""Incremental comment-thread path maintenance AS A STREAM (north-star
extension; the batch form is `operators/trees.tree_paths`).

Reference parity: the reference harvests a submission's comment tree in
one PRAW pass and flattens it (SURVEY §2 O2) — it never has to attach a
LATE comment to an existing thread.  A streaming ingest does: every
micro-batch carries new comments whose parents were indexed minutes or
days ago.  This module keeps a persistent (node_id, root_id, depth,
path) store and extends it per batch without ever re-walking old trees.

Per-batch protocol:

- Batch roots (parent IS NULL) start fresh paths at depth 0.
- Non-root arrivals attach by ONE equi-join against the store (their
  parent's path is already materialized — the whole point of storing
  paths instead of edges), then a bounded in-batch descent attaches
  chains that arrived together (child and grandchild in one batch):
  round k joins the still-pending rows against round k-1's attachments
  only, so each round is one shuffle over the shrinking pending set.
- Arrivals whose parent is unknown (not in the store, not attached this
  batch) are emitted as ORPHANS (null root/depth/path) and NOT added to
  the store — at-ingest threading semantics: a late parent does not
  retroactively adopt; re-threading is an offline `tree_paths` run.
  The contract is pytest-pinned.
- Exactly-once via idempotent batch-keyed writes: outputs and the path
  store write `batch=<id>` directories with overwrite, and store reads
  exclude the replaying batch's own partition (the same contract as
  streaming/lines.py / streaming/incremental.py).

Scale shape: the store is one narrow row per threaded comment,
partitionable by root_id; a batch touches only its own parents (semi
shape), rounds are bounded by the in-batch chain depth, and nothing
ever re-reads more of the store than the parent-key join needs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PATH_SCHEMA = "node_id LONG, root_id LONG, depth INT, path STRING"


def _read_store(
    spark: SparkSession, store_dir: str, before_batch_id: int | None = None
) -> DataFrame | None:
    if not os.path.isdir(store_dir) or not any(
        e.startswith("batch=") for e in os.listdir(store_dir)
    ):
        return None
    store = spark.read.parquet(store_dir)
    if before_batch_id is not None:
        store = store.filter(F.col("batch") < F.lit(int(before_batch_id)))
    return store


def thread_paths_batch_against_store(
    batch: DataFrame,
    store: DataFrame | None,
    max_batch_depth: int = 16,
) -> DataFrame:
    """Core batch step, usable standalone.  `batch` is (id, parent_id);
    `store` is prior path rows or None.  Returns one row per batch node:
    (node_id, root_id, depth, path, attached) — attached=false rows are
    orphans with null root/depth/path."""
    batch = batch.dropDuplicates(["id"])
    roots = batch.filter(F.col("parent_id").isNull()).select(
        F.col("id").cast("long").alias("node_id"),
        F.col("id").cast("long").alias("root_id"),
        F.lit(0).alias("depth"),
        F.col("id").cast("string").alias("path"),
    )
    pending = (
        batch.filter(F.col("parent_id").isNotNull())
        .select(
            F.col("id").cast("long").alias("node_id"),
            F.col("parent_id").cast("long").alias("_parent"),
        )
        .localCheckpoint(eager=True)
    )
    known = roots
    if store is not None:
        known = known.unionByName(
            store.select("node_id", "root_id", "depth", "path")
        )
    attached = roots.localCheckpoint(eager=True)
    # round 1 may attach to anything known (store + batch roots);
    # later rounds only to the previous round's attachments.
    frontier = known
    for _ in range(max_batch_depth):
        if pending.isEmpty():
            break
        hit = (
            pending.join(
                frontier.select(
                    F.col("node_id").alias("_parent"),
                    F.col("root_id"),
                    F.col("depth").alias("_pd"),
                    F.col("path").alias("_pp"),
                ),
                "_parent",
            )
            .select(
                "node_id",
                "root_id",
                (F.col("_pd") + 1).alias("depth"),
                F.concat_ws("/", "_pp", F.col("node_id").cast("string")).alias(
                    "path"
                ),
            )
            .localCheckpoint(eager=True)
        )
        if hit.isEmpty():
            break
        attached = attached.unionByName(hit).localCheckpoint(eager=True)
        pending = pending.join(
            hit.select("node_id"), "node_id", "left_anti"
        ).localCheckpoint(eager=True)
        frontier = hit
    orphans = pending.select(
        "node_id",
        F.lit(None).cast("long").alias("root_id"),
        F.lit(None).cast("int").alias("depth"),
        F.lit(None).cast("string").alias("path"),
    )
    return attached.withColumn("attached", F.lit(True)).unionByName(
        orphans.withColumn("attached", F.lit(False))
    )


def start_thread_paths_stream(
    stream: DataFrame,
    out_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    max_batch_depth: int = 16,
):
    """foreachBatch driver: per micro-batch of (id, parent_id) rows,
    thread against the path store, write the per-node outcome and the
    new ATTACHED rows into batch-keyed partitions (idempotent replay)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        store = _read_store(spark, store_dir, before_batch_id=batch_id)
        out = thread_paths_batch_against_store(
            batch_df, store, max_batch_depth=max_batch_depth
        ).localCheckpoint(eager=True)
        (
            out.withColumn("batch", F.lit(int(batch_id)))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{out_dir}/batch={int(batch_id)}")
        )
        (
            out.filter("attached")
            .select("node_id", "root_id", "depth", "path")
            .withColumn("batch", F.lit(int(batch_id)))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{store_dir}/batch={int(batch_id)}")
        )

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
