"""Streaming reservoir sample (north-star extension; the batch form is
`operators/sampling.priority_sample_per_group`'s rule, corpus-wide).

Keep a uniform-without-replacement sample of k rows over an unbounded
stream: every row draws the deterministic priority md5(id) and the
reservoir is the k smallest (priority, id) pairs seen so far.  Because
"k smallest" is a commutative, associative monoid, the reservoir after
any batch split equals the BATCH top-k over everything seen — which is
exactly what the oracle asserts (the strongest gate a sampling stream
can have: not "plausible sample" but bit-equal to the batch twin).

Per-batch protocol: candidates = arriving rows ∪ the previous
reservoir snapshot; keep the k smallest; write the full k-row snapshot
to a `batch=<id>` partition (idempotent overwrite, reads exclude the
replaying batch's own partition — the standard replay contract of
streaming/lines.py).  Snapshots are k rows, so state is O(k) forever;
the arriving batch is touched by one TakeOrdered, never a global sort.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _read_latest_snapshot(
    spark: SparkSession, store_dir: str, before_batch_id: int
) -> DataFrame | None:
    if not os.path.isdir(store_dir) or not any(
        e.startswith("batch=") for e in os.listdir(store_dir)
    ):
        return None
    store = spark.read.parquet(store_dir).filter(
        F.col("batch") < F.lit(int(before_batch_id))
    )
    latest = store.agg(F.max("batch").alias("_mx")).collect()[0]["_mx"]
    if latest is None:
        return None
    return store.filter(F.col("batch") == F.lit(int(latest))).drop("batch")


def reservoir_batch_step(
    batch: DataFrame, prev: DataFrame | None, id_col: str, k: int
) -> DataFrame:
    """One monoid step: k smallest (md5(id), id) over batch ∪ prev.
    Returns (id_col, priority)."""
    cand = batch.select(
        F.col(id_col),
        F.md5(F.col(id_col).cast("string")).alias("priority"),
    )
    if prev is not None:
        cand = cand.unionByName(prev.select(id_col, "priority"))
    return (
        cand.dropDuplicates([id_col])
        .orderBy("priority", id_col)
        .limit(k)
    )


def start_reservoir_stream(
    stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    id_col: str,
    k: int,
):
    """foreachBatch driver: fold each micro-batch into the k-row
    reservoir snapshot chain."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prev = _read_latest_snapshot(spark, store_dir, batch_id)
        res = reservoir_batch_step(batch_df, prev, id_col, k)
        (
            res.withColumn("batch", F.lit(int(batch_id)))
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


def final_reservoir(spark: SparkSession, store_dir: str) -> DataFrame:
    """The reservoir after the last processed batch."""
    store = spark.read.parquet(store_dir)
    latest = store.agg(F.max("batch").alias("_mx")).collect()[0]["_mx"]
    return store.filter(F.col("batch") == F.lit(int(latest))).drop("batch")
