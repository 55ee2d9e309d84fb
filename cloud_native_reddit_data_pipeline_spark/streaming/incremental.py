"""Incremental snapshot-vs-corpus DEDUP as a stream (north-star
extension; the batch form is `operators/dedup.incremental_dedup_flags`).
Each arriving micro-batch of documents is flagged against the ACCEPTED
corpus — exact (normalization fingerprint) and near (MinHash-LSH band
bucket) — without ever re-scanning the corpus.

Design (mirrors streaming/lines.py and streaming/spans.py):

- **The accepted-corpus state is a pair of key stores, not the
  corpus**: a fingerprint store (`fp`) and a band-key store
  (`band, key`).  A new batch semi-joins both; a hit flags the doc.
- **Only KEPT docs index.**  A dropped duplicate's fingerprint is
  already in the store; indexing its band keys would grow the store
  with keys whose document was never accepted.
- **Within-batch rule: exact keeps the first copy** (min id per
  fingerprint group — the keeper rule every batch dedup here uses).
  Within-batch NEAR duplicates both survive by contract: the stream's
  job is the new-vs-ACCEPTED-corpus decision plus the cheap exact
  collapse; the quadratic-capable LSH self-join stays in the batch
  operator (`lsh_candidate_pairs`), run offline over accepted docs.
  Both survivors index, so either matches future arrivals.
- **Exactly-once via idempotent batch-keyed writes** — flags and both
  stores write `batch=<id>` directories with overwrite, and store
  reads exclude the replaying batch's own partition (same contract as
  streaming/lines.py; reference parity: the Redis `reddit_post_ids`
  id-set gate, reddit_harvester_sydney.py:41,80, is this protocol for
  key equality).

Scale shape: fingerprints and band keys are narrow maps; lookups are
semi joins against DISTINCT key sets (the precomputed dedup index);
the only aggregates are the per-fingerprint keeper and per-doc flag
regroup.  No self-join anywhere; store growth is bounded by accepted
docs and compacted per-key like the other stores.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import fingerprint
from ..operators.dedup import lsh_band_keys, minhash_signatures


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


def incremental_dedup_batch_against_store(
    batch: DataFrame,
    store_fp: DataFrame | None,
    store_bk: DataFrame | None,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    bands: int = 4,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Core batch step, usable standalone: returns (flags, new_fp_rows,
    new_bk_rows).  Flag rule, in order: `exact_dup` = fingerprint in
    the store OR a smaller-id batch mate shares it; `near_dup` = any
    band key in the store; `kept` = neither.  Only kept docs' keys are
    returned for indexing."""
    batch = batch.dropDuplicates([id_col])
    fp = batch.select(
        F.col(id_col), fingerprint(text_col).alias("fp")
    ).persist()
    grp = fp.groupBy("fp").agg(F.min(id_col).alias("_kid"))
    fpg = fp.join(grp, "fp")
    if store_fp is not None:
        hit = store_fp.select("fp").distinct().withColumn("_fhit", F.lit(True))
        fpg = fpg.join(hit, "fp", "left")
    else:
        fpg = fpg.withColumn("_fhit", F.lit(None).cast("boolean"))
    exact = fpg.select(
        F.col(id_col),
        "fp",
        (
            F.coalesce(F.col("_fhit"), F.lit(False))
            | (F.col(id_col) != F.col("_kid"))
        ).alias("exact_dup"),
    )
    sigs = minhash_signatures(batch, id_col, text_col, num_hashes)
    bk = lsh_band_keys(sigs, id_col, num_hashes, bands).persist()
    if store_bk is not None:
        bhit = store_bk.select("band", "key").distinct()
        near_ids = (
            bk.join(bhit, ["band", "key"], "semi")
            .select(id_col)
            .distinct()
            .withColumn("_nhit", F.lit(True))
        )
    else:
        near_ids = bk.select(id_col).limit(0).withColumn("_nhit", F.lit(True))
    flags = (
        exact.join(near_ids, id_col, "left")
        .select(
            F.col(id_col),
            "fp",
            "exact_dup",
            F.coalesce("_nhit", F.lit(False)).alias("near_dup"),
            (
                ~F.col("exact_dup") & ~F.coalesce("_nhit", F.lit(False))
            ).alias("kept"),
        )
    ).localCheckpoint(eager=True)
    kept_ids = flags.filter(F.col("kept")).select(id_col)
    new_fp = (
        flags.filter(F.col("kept")).select("fp").distinct()
    ).localCheckpoint(eager=True)
    new_bk = (
        bk.join(kept_ids, id_col, "semi").select("band", "key").distinct()
    ).localCheckpoint(eager=True)
    fp.unpersist()
    bk.unpersist()
    return flags.drop("fp"), new_fp, new_bk


def process_incremental_dedup_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    flags_dir: str,
    fp_store_dir: str,
    bk_store_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    compact_every: int | None = 16,
) -> None:
    """One foreachBatch step, module-level so crash-replay is directly
    testable: same batch_id twice must produce the same flag files
    (store reads exclude this batch's own partitions)."""
    if batch_df.isEmpty():
        return
    if compact_every and batch_id > 0 and batch_id % compact_every == 0:
        from .store import compact_store

        compact_store(spark, fp_store_dir, batch_id, dedup_keys=["fp"])
        compact_store(spark, bk_store_dir, batch_id, dedup_keys=["band", "key"])
    store_fp = _read_store(spark, fp_store_dir, before_batch_id=batch_id)
    store_bk = _read_store(spark, bk_store_dir, before_batch_id=batch_id)
    flags, new_fp, new_bk = incremental_dedup_batch_against_store(
        batch_df, store_fp, store_bk, id_col, text_col, num_hashes, bands
    )
    flags.write.mode("overwrite").parquet(
        os.path.join(flags_dir, f"batch={batch_id}")
    )
    new_fp.write.mode("overwrite").parquet(
        os.path.join(fp_store_dir, f"batch={batch_id}")
    )
    new_bk.write.mode("overwrite").parquet(
        os.path.join(bk_store_dir, f"batch={batch_id}")
    )


def start_incremental_dedup_stream(
    stream: DataFrame,
    flags_dir: str,
    fp_store_dir: str,
    bk_store_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
):
    """Wire the batch step into a Structured Streaming foreachBatch
    query (availableNow, so the harness can await completion)."""
    spark = stream.sparkSession

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_incremental_dedup_batch(
            spark,
            batch_df,
            batch_id,
            flags_dir,
            fp_store_dir,
            bk_store_dir,
            id_col=id_col,
            text_col=text_col,
            num_hashes=num_hashes,
            bands=bands,
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
