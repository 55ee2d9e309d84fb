"""Incremental ExactSubstr span dedup for a continuously-ingesting
corpus (north-star extension; the batch form is
`operators/dedup.duplicate_spans` / `cut_duplicate_spans`).  New
documents must have passages already seen in the accepted corpus CUT
before acceptance — without re-scanning the corpus.

Design (mirrors streaming/neardup.py, which keeps MinHash band keys):

- **The accepted-corpus state is a gram-hash store, not the corpus.**
  Each accepted document persists the 60-bit hashes of its k-grams
  (8 bytes per gram — ~1/6th of the text bytes; a real deployment
  dedups the store by hash, shrinking it to the distinct-gram count).
  A new micro-batch joins its own gram positions against the store:
  any hit is a known passage and the covered span is cut.
- **Within-batch duplication counts too.**  A gram occurring >= 2
  times inside the incoming batch is duplicated evidence exactly as in
  the batch operator, so both in-batch copies are cut (the batch
  policy; the store's copy was clean when accepted and stays intact).
- **Exactly-once via idempotent batch-keyed writes.**  foreachBatch
  may replay after a crash; both sinks write `batch=<id>` directories
  with overwrite, so replays rewrite the same files (same contract as
  streaming/neardup.py and the reference's fixed ES `_id`s, SURVEY.md
  O8/O37).
- Cleaned text is whitespace-normalized token reconstruction — the
  same contract as the batch cut.

Scale shape: the batch pays one narrow gram map, one semi join against
the store on an 8-byte key, and the doc-keyed gap-merge window — the
store is never rewritten, only appended; no self-join anywhere.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    apply_span_cut,
    gram_position_rows,
    merge_gram_positions_to_spans,
)

GRAM_STORE_SCHEMA = "h LONG"


def _read_store(
    spark: SparkSession, store_dir: str, before_batch_id: int | None = None
) -> DataFrame | None:
    """Read the gram store, EXCLUDING partitions at or after
    `before_batch_id`.  A crash between the store write and the
    streaming commit makes foreachBatch replay the same batch_id with
    its own grams already in `batch=<id>`; without this filter every
    gram of the replayed batch matches the store and every document is
    fully cut.  Filtering on the partition column keeps the exclusion
    a partition-prune, not a scan."""
    if not os.path.isdir(store_dir) or not any(
        e.startswith("batch=") for e in os.listdir(store_dir)
    ):
        return None
    store = spark.read.parquet(store_dir)
    if before_batch_id is not None:
        store = store.filter(F.col("batch") < F.lit(int(before_batch_id)))
    return store


def span_cut_batch_against_store(
    batch: DataFrame,
    store: DataFrame | None,
    id_col: str,
    text_col: str,
    k: int = 5,
) -> tuple[DataFrame, DataFrame]:
    """Core batch step, usable standalone: returns (cleaned docs,
    new_gram_rows).  A k-gram is duplicated when it occurs >= 2 times
    in the batch OR at least once in the store; covered spans are cut
    from the batch's documents.  `new_gram_rows` are the batch's
    distinct (doc_id, h) rows for the store append — grams of the
    ORIGINAL text, so later copies of a passage that was cut here
    still match the store."""
    batch = batch.dropDuplicates([id_col])
    grams = gram_position_rows(batch, id_col, text_col, k).persist()

    in_batch_dup = (
        grams.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("h")
    )
    dup = (
        in_batch_dup
        if store is None
        else in_batch_dup.unionByName(store.select("h")).distinct()
    )
    hits = grams.join(dup, "h", "semi").select(id_col, "pos")
    spans = merge_gram_positions_to_spans(hits, id_col, k)
    cleaned = apply_span_cut(batch, spans, id_col, text_col)
    new_grams = grams.select(id_col, "h").distinct()
    # materialize both before releasing the shared gram table
    cleaned = cleaned.localCheckpoint(eager=True)
    new_grams = new_grams.localCheckpoint(eager=True)
    grams.unpersist()
    return cleaned, new_grams


def process_span_cut_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    corpus_dir: str,
    store_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    compact_every: int | None = 16,
) -> None:
    """One foreachBatch step, module-level so crash-replay is directly
    testable: calling it twice with the same batch_id must produce the
    same corpus files (the store read excludes this batch's own
    partition — see _read_store).

    Every `compact_every` batches the gram store's older partitions
    fold into one, deduplicated per gram hash — exactly the distinct-
    gram shrink the module docstring promises; lookups are semi joins,
    so cut decisions are unchanged (streaming/store.py)."""
    if batch_df.isEmpty():
        return
    if compact_every and batch_id > 0 and batch_id % compact_every == 0:
        from .store import compact_store

        compact_store(spark, store_dir, batch_id, dedup_keys=["h"])
    store = _read_store(spark, store_dir, before_batch_id=batch_id)
    cleaned, new_grams = span_cut_batch_against_store(
        batch_df, store, id_col, text_col, k
    )
    cleaned.write.mode("overwrite").parquet(
        os.path.join(corpus_dir, f"batch={batch_id}")
    )
    new_grams.write.mode("overwrite").parquet(
        os.path.join(store_dir, f"batch={batch_id}")
    )


def start_span_cut_stream(
    stream: DataFrame,
    corpus_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    compact_every: int | None = 16,
):
    """Streaming corpus cleaner: every document is accepted, but spans
    repeating the accepted corpus (or a batch-mate) arrive CUT; gram
    hashes of the original text append to `store_dir`.  Drained with
    trigger(availableNow) for deterministic tests."""
    spark = stream.sparkSession

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_span_cut_batch(
            spark,
            batch_df,
            batch_id,
            corpus_dir,
            store_dir,
            id_col,
            text_col,
            k,
            compact_every,
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
