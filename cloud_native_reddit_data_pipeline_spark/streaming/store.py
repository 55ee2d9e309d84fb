"""Batch-partitioned state-store compaction for the streaming dedup
operators (`streaming/neardup.py` band-key store, `streaming/spans.py`
gram store).

Both stores append one `batch=<id>` parquet directory per micro-batch,
so a long-lived stream reads a linearly-growing list of partitions
every batch — correct, but the store-scan cost grows with stream AGE
rather than store SIZE.  Compaction folds all partitions strictly below
the current batch into ONE partition and dedups rows by the store's
lookup key (both stores are consumed with set semantics — semi joins /
distinct — so key-dedup shrinks the store to its distinct-key count
without changing any decision).

Replay-safety contract (the `before_batch_id` filter of both stores):
- Only partitions with id < `before_batch_id` (the batch being
  processed) are folded, so a crashed-and-replayed batch's own
  `batch=<id>` partition is never merged into an older label and the
  `batch < before_batch_id` prune still excludes it.
- The folded partition keeps the label `batch=<max folded id>`, so any
  future batch's filter sees exactly the same row set as before.
- The compacted partition is installed with an atomic directory swap
  FIRST; stale source partitions are deleted after.  A crash in
  between leaves duplicate rows across partitions — harmless under set
  semantics, and re-folded by the next compaction.

The reference has no streaming state story at all (its dedup is
per-queue exact-id, addReddit.py); this is the LSM/Kafka-compacted-
topic pattern the 100 TB design needs.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .ingest import _swap_dir


def list_store_batches(store_dir: str) -> list[int]:
    """Sorted batch ids currently present in a batch-partitioned store."""
    if not os.path.isdir(store_dir):
        return []
    out = []
    for e in os.listdir(store_dir):
        if e.startswith("batch="):
            try:
                out.append(int(e.split("=", 1)[1]))
            except ValueError:
                continue
    return sorted(out)


def compact_store(
    spark: SparkSession,
    store_dir: str,
    before_batch_id: int,
    dedup_keys: list[str],
) -> bool:
    """Fold every `batch=<id>` partition with id < `before_batch_id`
    into one partition labeled `batch=<max folded id>`, deduplicated to
    one row per `dedup_keys` (deterministically: min of every other
    column).  Returns True when a fold happened.

    Cost: one read of the folded partitions + one key-grouped shuffle
    of the store — amortized over the compaction cadence, it converts
    per-batch store reads from O(stream age) files back to O(1)
    partitions of O(distinct keys) rows."""
    fold = [b for b in list_store_batches(store_dir) if b < before_batch_id]
    if len(fold) < 2:
        return False
    target = max(fold)
    dirs = [os.path.join(store_dir, f"batch={b}") for b in fold]
    df = spark.read.option("basePath", store_dir).parquet(*dirs).drop("batch")
    others = [c for c in df.columns if c not in dedup_keys]
    if others:
        compacted = df.groupBy(*dedup_keys).agg(
            *[F.min(c).alias(c) for c in others]
        )
    else:
        compacted = df.distinct()
    compacted = compacted.select(*df.columns)
    tmp = os.path.join(store_dir, "_tmp_compact")
    compacted.write.mode("overwrite").parquet(tmp)
    _swap_dir(tmp, os.path.join(store_dir, f"batch={target}"))
    for b in fold:
        if b != target:
            shutil.rmtree(
                os.path.join(store_dir, f"batch={b}"), ignore_errors=True
            )
    return True
