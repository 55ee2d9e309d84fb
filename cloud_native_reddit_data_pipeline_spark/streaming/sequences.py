"""Incremental next-event sequence-example generation for a
continuously-ingesting event stream (north-star extension; the batch
form is `operators/windows.event_sequence_examples`).  Each arriving
event becomes a (context -> target) training example whose context is
the user's previous `context` event types — WITHOUT re-scanning the
event history: the only state is a bounded per-user TAIL of the last
`context` events.

Design (mirrors streaming/lines.py's store protocol; this is the
operator `applyInPandasWithState` would express natively — the
container's protobuf gap is documented in streaming/stateful.py, so
the state lives in a parquet tail store with the same exactly-once
contract):

- **State is a bounded per-user tail, not the stream.**  After each
  batch, the store's `batch=<id>` partition holds, for every user SEEN
  in that batch, their latest `context` events (ts, event_id, type).
  A user's current tail is their row-set from the LATEST partition
  they appear in — older partitions are superseded, and the periodic
  compaction folds them away.
- **Batch step**: union(tail, batch) per user, total-ordered by
  (ts, event_id); lag-`context` over that order; emit examples ONLY
  for the batch's own events (tail rows are context, never output).
- **Exactly-once via idempotent batch-keyed writes** — examples and
  tail partitions are `batch=<id>` overwrites, and the tail read
  excludes the replaying batch's own partition (streaming/spans.py
  contract; reference parity: fixed ES `_id`s, SURVEY.md O8/O37).

Equivalence: when micro-batches arrive in (ts, event_id) order (the
normal append-only log case), the streamed examples are EXACTLY the
batch operator's output over the full log — the property the oracle
replays and tests pin.

Scale shape: one user-partitioned window per batch over
(tail + batch) — state per user is `context` rows, so the union is
barely larger than the batch; no join against history, no global
sort.  Store growth is O(active users), not O(events).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TAIL_SCHEMA = "user_id LONG, ts TIMESTAMP, event_id LONG, event_type STRING"


def _read_tail(
    spark: SparkSession, store_dir: str, before_batch_id: int | None = None
) -> DataFrame | None:
    """Current per-user tail: each user's rows from the LATEST store
    partition they appear in, excluding partitions at or after
    `before_batch_id` (crash-replay guard — a replayed batch must not
    read the tail it wrote)."""
    if not os.path.isdir(store_dir) or not any(
        e.startswith("batch=") for e in os.listdir(store_dir)
    ):
        return None
    store = spark.read.parquet(store_dir)
    if before_batch_id is not None:
        store = store.filter(F.col("batch") < F.lit(int(before_batch_id)))
    latest = store.groupBy("user_id").agg(F.max("batch").alias("_mb"))
    # rename the derived side's key: both frames share the store's
    # lineage, and Spark's ambiguous-self-join check rejects the
    # qualified-column form
    latest = latest.select(
        F.col("user_id").alias("_lu"), F.col("_mb")
    )
    return (
        store.join(
            latest,
            (store["user_id"] == F.col("_lu"))
            & (store["batch"] == F.col("_mb")),
        )
        .select("user_id", "ts", "event_id", "event_type")
    )


def sequence_examples_batch_against_store(
    batch: DataFrame,
    tail: DataFrame | None,
    context: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Core batch step, usable standalone: returns (examples for the
    batch's own events, new per-user tail rows for users in the
    batch).  Ordering inside the union is the total order
    (ts, event_id), so results are deterministic under ts ties."""
    batch = batch.dropDuplicates(["event_id"]).select(
        "user_id", "ts", "event_id", "event_type"
    )
    cur = batch.withColumn("_cur", F.lit(True))
    if tail is not None:
        # redelivery defense: a tail row whose event is ALSO in the
        # current batch would duplicate that event in the lag order
        # (the checkpointed file source is exactly-once, so this only
        # triggers on at-least-once sources or operator misuse — but
        # the step should be safe standalone)
        bids = batch.select(F.col("event_id").alias("_bid")).distinct()
        tail = (
            tail.join(bids, tail["event_id"] == F.col("_bid"), "left_anti")
        )
        both = tail.withColumn("_cur", F.lit(False)).unionByName(cur)
    else:
        both = cur
    both = both.persist()
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    lags = [F.lag("event_type", i).over(w) for i in range(context, 0, -1)]
    examples = (
        both.select(
            "user_id",
            "event_id",
            F.concat_ws(">", *lags).alias("context"),
            lags[0].alias("_oldest"),
            F.col("event_type").alias("target"),
            "_cur",
        )
        .filter(F.col("_cur") & F.col("_oldest").isNotNull())
        .drop("_oldest", "_cur")
    )
    # new tail: last `context` events per user over the SAME union (a
    # user's tail may still include pre-batch events if the batch
    # brought fewer than `context` new ones)
    wd = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    seen = batch.select(F.col("user_id").alias("_su")).distinct()
    new_tail = (
        both.join(seen, F.col("user_id") == F.col("_su"))
        .drop("_su")
        .withColumn("_rk", F.row_number().over(wd))
        .filter(F.col("_rk") <= context)
        .select("user_id", "ts", "event_id", "event_type")
    )
    examples = examples.localCheckpoint(eager=True)
    new_tail = new_tail.localCheckpoint(eager=True)
    both.unpersist()
    return examples, new_tail


def compact_tail_store(
    spark: SparkSession, store_dir: str, before_batch_id: int
) -> bool:
    """Tail-specific compaction: fold partitions < `before_batch_id`
    into one, keeping ONLY each user's rows from their max folded
    batch (latest-wins — NOT `store.compact_store`'s key-dedup, which
    would resurrect superseded tail rows from older batches).  Keeps
    `_read_tail`'s latest-partition-per-user rule exact: after the
    fold the surviving rows ARE every folded user's latest tail."""
    from .store import _swap_dir, list_store_batches

    fold = [b for b in list_store_batches(store_dir) if b < before_batch_id]
    if len(fold) < 2:
        return False
    target = max(fold)
    dirs = [os.path.join(store_dir, f"batch={b}") for b in fold]
    df = spark.read.option("basePath", store_dir).parquet(*dirs)
    latest = (
        df.groupBy("user_id")
        .agg(F.max("batch").alias("_mb"))
        .select(F.col("user_id").alias("_lu"), "_mb")
    )
    compacted = (
        df.join(
            latest,
            (df["user_id"] == F.col("_lu")) & (df["batch"] == F.col("_mb")),
        )
        .select("user_id", "ts", "event_id", "event_type")
    )
    tmp = os.path.join(store_dir, "_tmp_compact")
    compacted.write.mode("overwrite").parquet(tmp)
    _swap_dir(tmp, os.path.join(store_dir, f"batch={target}"))
    import shutil

    for b in fold:
        if b != target:
            shutil.rmtree(
                os.path.join(store_dir, f"batch={b}"), ignore_errors=True
            )
    return True


def process_sequence_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    corpus_dir: str,
    store_dir: str,
    context: int = 3,
    compact_every: int | None = 16,
) -> None:
    """One foreachBatch step, module-level so crash-replay is directly
    testable: same batch_id twice must produce the same example files
    (the tail read excludes this batch's own partition)."""
    if batch_df.isEmpty():
        return
    if compact_every and batch_id > 0 and batch_id % compact_every == 0:
        compact_tail_store(spark, store_dir, batch_id)
    tail = _read_tail(spark, store_dir, before_batch_id=batch_id)
    examples, new_tail = sequence_examples_batch_against_store(
        batch_df, tail, context=context
    )
    examples.write.mode("overwrite").parquet(
        os.path.join(corpus_dir, f"batch={batch_id}")
    )
    new_tail.write.mode("overwrite").parquet(
        os.path.join(store_dir, f"batch={batch_id}")
    )


def start_sequence_examples_stream(
    stream: DataFrame,
    corpus_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    context: int = 3,
):
    """Wire the batch step into a Structured Streaming foreachBatch
    query (availableNow, so harnesses can await completion)."""
    spark = stream.sparkSession

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_sequence_batch(
            spark, batch_df, batch_id, corpus_dir, store_dir, context=context
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
