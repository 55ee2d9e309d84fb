"""Streaming PSI drift monitor (north-star extension; the batch form
is the `snapshot_drift_psi` query).  The FIRST micro-batch freezes the
reference length-bucket distribution; every later batch scores its own
distribution against that reference with add-one-smoothed PSI — the
"is today's crawl shaped like the corpus we validated?" alarm a
continuously-ingesting pipeline runs per batch, without re-scanning
anything.

Design (the store protocol of streaming/lines.py, with the simplest
possible state — one 10-row histogram):

- **State is the reference histogram only.**  Batch 0 writes its
  bucket counts to `store/batch=0` and emits nothing; batch N>0 reads
  the EARLIEST store partition (< N, crash-replay safe) and emits one
  PSI row per bucket of the union bucket set.
- **Same arithmetic contract as the batch query**: add-one smoothing
  over the union bucket count, libm ln, round-6 + 1e-9 — so the
  two-batch replay oracle hash-gates the streamed values exactly.
- **Exactly-once via idempotent batch-keyed overwrites** on both the
  monitor output and the reference store.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REF_SCHEMA = "bucket LONG, n LONG"


def length_buckets(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(bucket, n) histogram of token-length // 20, capped at 9 — the
    same bucketing as the batch snapshot_drift_psi query."""
    from ..functions.text import tokens

    return (
        df.select(
            F.least(
                F.floor(F.size(tokens(F.col(text_col))) / 20).cast("long"),
                F.lit(9),
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _read_ref(
    spark: SparkSession, store_dir: str, before_batch_id: int
) -> DataFrame | None:
    """The reference histogram: the EARLIEST store partition below
    `before_batch_id` (a replayed reference batch must not read its
    own write and score against itself)."""
    from .store import list_store_batches

    batches = [b for b in list_store_batches(store_dir) if b < before_batch_id]
    if not batches:
        return None
    return spark.read.parquet(
        os.path.join(store_dir, f"batch={min(batches)}")
    ).select("bucket", "n")


def psi_against_reference(cur: DataFrame, ref: DataFrame) -> DataFrame:
    """Per-bucket PSI contributions of `cur` vs `ref` histograms over
    the UNION bucket set, add-one smoothing, round-6 + 1e-9 — the
    batch query's exact arithmetic."""
    j = (
        ref.select(F.col("bucket"), F.col("n").alias("n_ref"))
        .join(
            cur.select(F.col("bucket"), F.col("n").alias("n_cur")),
            "bucket",
            "full_outer",
        )
        .select(
            "bucket",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    tot = j.agg(
        (F.sum("n_ref") + F.count(F.lit(1))).alias("ta"),
        (F.sum("n_cur") + F.count(F.lit(1))).alias("tb"),
    )
    pa = (F.col("n_ref") + 1) / F.col("ta")
    pb = (F.col("n_cur") + 1) / F.col("tb")
    return j.crossJoin(F.broadcast(tot)).select(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
        F.round(pa + F.lit(1e-9), 6).alias("p_ref"),
        F.round(pb + F.lit(1e-9), 6).alias("p_cur"),
        F.round((pa - pb) * F.log(pa / pb) + F.lit(1e-9), 6).alias(
            "psi_contrib"
        ),
    )


def process_drift_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    out_dir: str,
    store_dir: str,
    text_col: str = "text",
) -> None:
    """One foreachBatch step, module-level for direct crash-replay
    testing: the first batch (no earlier store partition) freezes the
    reference and emits nothing; later batches emit PSI rows."""
    if batch_df.isEmpty():
        return
    hist = length_buckets(batch_df, text_col).localCheckpoint(eager=True)
    ref = _read_ref(spark, store_dir, before_batch_id=batch_id)
    if ref is None:
        hist.write.mode("overwrite").parquet(
            os.path.join(store_dir, f"batch={batch_id}")
        )
        return
    out = psi_against_reference(hist, ref).localCheckpoint(eager=True)
    out.write.mode("overwrite").parquet(
        os.path.join(out_dir, f"batch={batch_id}")
    )


def start_drift_stream(
    stream: DataFrame,
    out_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
):
    """Wire the batch step into a foreachBatch query (availableNow)."""
    spark = stream.sparkSession

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_drift_batch(
            spark, batch_df, batch_id, out_dir, store_dir, text_col=text_col
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
