"""Incremental CCNet/C4-style LINE dedup for a continuously-ingesting
corpus (north-star extension; the batch form is
`operators/dedup.line_dedup_corpus`).  A new document's lines that were
already accepted into the corpus are dropped before acceptance —
keep-one-copy semantics extended across micro-batches, without ever
re-scanning the corpus.

Design (mirrors streaming/spans.py, which keeps k-gram hashes):

- **The accepted-corpus state is a line-hash store, not the corpus.**
  Each accepted batch persists the 60-bit hashes of its documents'
  lines.  A new micro-batch semi-joins its line hashes against the
  store: a hit means the line's one kept copy already lives in the
  corpus, so THIS occurrence is dropped.
- **Within-batch duplication keeps the first copy.**  Among lines not
  in the store, a hash occurring >= 2 times inside the batch keeps
  only its smallest (id, line_no) occurrence — exactly the batch
  operator's keeper rule.
- **Exactly-once via idempotent batch-keyed writes** — both sinks
  write `batch=<id>` directories with overwrite, and the store read
  excludes the replaying batch's own partition (same contract as
  streaming/spans.py; reference parity: fixed ES `_id`s, SURVEY.md
  O8/O37).

Scale shape: one narrow line map, one semi join on an 8-byte hash,
one hash-keyed keeper aggregate, one doc-keyed regroup.  The store is
append-only with periodic per-hash compaction; no self-join anywhere.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import line_rows

LINE_STORE_SCHEMA = "h LONG"


def _read_store(
    spark: SparkSession, store_dir: str, before_batch_id: int | None = None
) -> DataFrame | None:
    """Read the line store, EXCLUDING partitions at or after
    `before_batch_id` (crash-replay guard: without it a replayed
    batch's own lines all match the store and every document empties).
    The exclusion is a partition prune, not a scan."""
    if not os.path.isdir(store_dir) or not any(
        e.startswith("batch=") for e in os.listdir(store_dir)
    ):
        return None
    store = spark.read.parquet(store_dir)
    if before_batch_id is not None:
        store = store.filter(F.col("batch") < F.lit(int(before_batch_id)))
    return store


def line_dedup_batch_against_store(
    batch: DataFrame,
    store: DataFrame | None,
    id_col: str,
    text_col: str,
    line_len: int = 10,
) -> tuple[DataFrame, DataFrame]:
    """Core batch step, usable standalone: returns (cleaned docs,
    new_line_hash_rows).

    Keep rule, in order: a line whose hash is IN THE STORE is dropped
    (its kept copy was accepted earlier); otherwise a within-batch
    repeated hash keeps only its smallest (id, line_no) occurrence.
    `new_line_hash_rows` are the batch's distinct original line hashes
    (original text, so later copies of a line that was dropped here
    still match the store)."""
    batch = batch.dropDuplicates([id_col])
    lines = line_rows(batch, id_col, text_col, line_len).persist()
    stats = lines.groupBy("h").agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.min(
            F.struct(F.col(id_col).alias("kid"), F.col("line_no").alias("kline"))
        ).alias("_keeper"),
    )
    joined = lines.join(stats, "h")
    if store is not None:
        hit = store.select("h").distinct().withColumn("_hit", F.lit(True))
        joined = joined.join(hit, "h", "left")
    else:
        joined = joined.withColumn("_hit", F.lit(None).cast("boolean"))
    keep = (~F.coalesce(F.col("_hit"), F.lit(False))) & (
        (F.col("_cnt") < 2)
        | (
            (F.col(id_col) == F.col("_keeper.kid"))
            & (F.col("line_no") == F.col("_keeper.kline"))
        )
    )
    agg = joined.withColumn("keep", keep).groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.count(F.when(F.col("keep"), F.lit(1))).alias("n_kept_lines"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("keep"), F.struct("line_no", "line"))
                    )
                ),
                lambda s: s["line"],
            ),
        ).alias("cleaned_text"),
    )
    cleaned = (
        batch.select(id_col)
        .join(agg, id_col, "left")  # empty docs emit no lines
        .select(
            id_col,
            F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
            F.coalesce("n_kept_lines", F.lit(0))
            .cast("long")
            .alias("n_kept_lines"),
            F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
        )
    )
    new_hashes = lines.select("h").distinct()
    cleaned = cleaned.localCheckpoint(eager=True)
    new_hashes = new_hashes.localCheckpoint(eager=True)
    lines.unpersist()
    return cleaned, new_hashes


def process_line_dedup_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    corpus_dir: str,
    store_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_len: int = 10,
    compact_every: int | None = 16,
) -> None:
    """One foreachBatch step, module-level so crash-replay is directly
    testable: calling it twice with the same batch_id must produce the
    same corpus files (the store read excludes this batch's own
    partition).  Every `compact_every` batches the store's older
    partitions fold into one, deduplicated per hash (streaming/
    store.py); lookups are semi joins, so decisions are unchanged."""
    if batch_df.isEmpty():
        return
    if compact_every and batch_id > 0 and batch_id % compact_every == 0:
        from .store import compact_store

        compact_store(spark, store_dir, batch_id, dedup_keys=["h"])
    store = _read_store(spark, store_dir, before_batch_id=batch_id)
    cleaned, new_hashes = line_dedup_batch_against_store(
        batch_df, store, id_col, text_col, line_len
    )
    cleaned.write.mode("overwrite").parquet(
        os.path.join(corpus_dir, f"batch={batch_id}")
    )
    new_hashes.write.mode("overwrite").parquet(
        os.path.join(store_dir, f"batch={batch_id}")
    )


def start_line_dedup_stream(
    stream: DataFrame,
    corpus_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_len: int = 10,
):
    """Wire the batch step into a Structured Streaming foreachBatch
    query (availableNow, so the driver harness can await completion)."""
    spark = stream.sparkSession

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_line_dedup_batch(
            spark,
            batch_df,
            batch_id,
            corpus_dir,
            store_dir,
            id_col=id_col,
            text_col=text_col,
            line_len=line_len,
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
