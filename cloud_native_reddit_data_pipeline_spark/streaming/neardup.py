"""Incremental near-duplicate dedup for a continuously-ingesting corpus
(north-star extension: batch MinHash-LSH dedup is `operators/dedup.py`;
a production training-data pipeline also needs the STREAMING form — new
documents must be checked against everything already accepted, without
re-scanning the corpus).

Design (the shape a 1000-executor cluster wants):

- **The accepted-corpus state is a band-key store, not the corpus.**
  Each accepted document persists its `bands` LSH keys (band, key) —
  32-byte md5s, ~1/1000th of document bytes.  A new micro-batch joins
  its own band keys against the store: collision = near-dup candidate
  = drop.  The corpus itself is never re-read.
- **Keep-first-by-id within a batch.**  A new document also drops if it
  collides with a smaller-id document of the same batch (greedy
  keep-first — deterministic under replay; transitively linked docs may
  over-drop, the standard greedy trade-off, documented here).
- **Exactly-once via idempotent batch-keyed writes.**  foreachBatch may
  replay a batch after a crash; both sinks write to `batch=<id>`
  subdirectories with overwrite, so a replay rewrites the same files
  instead of duplicating rows (same contract as the reference's fixed
  ES `_id`s, SURVEY.md O8/O37).
- Documents too short to shingle (< n words) have no MinHash signature;
  they are accepted verbatim (no evidence of duplication).

Reference parity: the reference dedups exact post ids in-queue
(addReddit.py); this extends the same at-least-once -> idempotent
pattern to CONTENT identity, which its ES pipeline cannot express.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import minhash_signatures

BAND_STORE_SCHEMA = "band INT, key STRING"


def band_key_rows(
    signatures: DataFrame, id_col: str, num_hashes: int = 8, bands: int = 4
) -> DataFrame:
    """(id, band, key) LSH band keys of a signature table — the rows the
    streaming store persists per accepted document."""
    rows_per_band = num_hashes // bands
    band_exprs = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_exprs.append(
            F.struct(
                F.lit(b).alias("band"), F.md5(F.concat_ws("|", *cols)).alias("key")
            )
        )
    return signatures.select(
        F.col(id_col), F.explode(F.array(*band_exprs)).alias("bk")
    ).select(F.col(id_col), F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def _read_store(
    spark: SparkSession,
    store_dir: str,
    id_col: str,
    before_batch_id: int | None = None,
) -> DataFrame | None:
    """Read the band-key store, EXCLUDING partitions at or after
    `before_batch_id`.  A crash between the store write and the
    streaming commit makes foreachBatch replay the same batch_id with
    its own keys already in `batch=<id>`; without this filter every
    replayed document collides with itself and the whole batch is
    dropped.  Partition-column filter == partition prune."""
    if not os.path.isdir(store_dir) or not any(
        e.startswith("batch=") for e in os.listdir(store_dir)
    ):
        return None
    store = spark.read.parquet(store_dir)
    if before_batch_id is not None:
        store = store.filter(F.col("batch") < F.lit(int(before_batch_id)))
    return store


def dedup_batch_against_store(
    batch: DataFrame,
    store: DataFrame | None,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Core batch step, usable standalone: returns (survivors,
    survivor_band_keys).  A row survives unless one of its band keys
    collides with the store or with a smaller-id row of the same batch."""
    batch = batch.dropDuplicates([id_col])
    sigs = minhash_signatures(
        batch, id_col, text_col, num_hashes=num_hashes, shingle_n=shingle_n
    )
    keys = band_key_rows(sigs, id_col, num_hashes, bands).persist()

    vs_store_ids = (
        keys.join(store.select("band", "key").distinct(), ["band", "key"])
        .select(id_col)
        .distinct()
        if store is not None
        else None
    )
    a, b = keys.alias("a"), keys.alias("b")
    vs_batch_ids = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"b.{id_col}") < F.col(f"a.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias(id_col))
        .distinct()
    )
    dropped = (
        vs_batch_ids if vs_store_ids is None else vs_batch_ids.unionByName(vs_store_ids)
    ).distinct()

    survivors = batch.join(dropped, id_col, "left_anti")
    new_keys = keys.join(dropped, id_col, "left_anti")
    # materialize both before unpersisting the shared band-key table
    survivors = survivors.localCheckpoint(eager=True)
    new_keys = new_keys.localCheckpoint(eager=True)
    keys.unpersist()
    return survivors, new_keys


def process_neardup_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    corpus_dir: str,
    store_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    compact_every: int | None = 16,
) -> None:
    """One foreachBatch step, module-level so crash-replay is directly
    testable: calling it twice with the same batch_id must yield the
    same survivor set (the store read excludes this batch's own
    partition — see _read_store).

    Every `compact_every` batches the band-key store's older partitions
    fold into one, deduplicated per (band, key) — the store is consumed
    with set semantics, so decisions are unchanged while per-batch
    store reads stop growing with stream age (streaming/store.py)."""
    if batch_df.isEmpty():
        return
    if compact_every and batch_id > 0 and batch_id % compact_every == 0:
        from .store import compact_store

        compact_store(spark, store_dir, batch_id, dedup_keys=["band", "key"])
    store = _read_store(spark, store_dir, id_col, before_batch_id=batch_id)
    survivors, new_keys = dedup_batch_against_store(
        batch_df, store, id_col, text_col, num_hashes, bands, shingle_n
    )
    survivors.write.mode("overwrite").parquet(
        os.path.join(corpus_dir, f"batch={batch_id}")
    )
    new_keys.write.mode("overwrite").parquet(
        os.path.join(store_dir, f"batch={batch_id}")
    )


def start_neardup_dedup_stream(
    stream: DataFrame,
    corpus_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    compact_every: int | None = 16,
):
    """Streaming corpus builder: accepted docs append to `corpus_dir`,
    their band keys to `store_dir`; near-dups of anything already
    accepted (or of a smaller-id batch-mate) are filtered out.  Drained
    with trigger(availableNow) for deterministic tests."""
    spark = stream.sparkSession

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_neardup_batch(
            spark,
            batch_df,
            batch_id,
            corpus_dir,
            store_dir,
            id_col,
            text_col,
            num_hashes,
            bands,
            shingle_n,
            compact_every,
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
