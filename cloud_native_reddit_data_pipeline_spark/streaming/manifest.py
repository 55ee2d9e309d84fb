"""Streaming incremental corpus manifest (the batch form is the
`corpus_manifest` query): every micro-batch writes its per-shard
manifest DELTA, and the current manifest is a pure merge across
deltas — because every manifest column is a commutative monoid
(COUNT/SUM add, MIN/MAX combine, the content digest is bit_xor, its
own inverse) the incremental manifest equals the batch manifest over
the union EXACTLY, with no corpus re-scan ever.

This is the corpus-versioning counterpart of the dedup stores: the
store holds one tiny `batch=<id>` partition of <= n_shards rows per
batch (idempotent overwrite — a replayed batch rewrites the same
delta), and reads are an aggregate over all partitions; periodic
folding is just the same merge written back (not implemented — at one
8-row delta per batch the read stays trivial for ~10^6 batches).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_SHARDS = 8


def shard_manifest_delta(batch: DataFrame) -> DataFrame:
    """Per-shard manifest rows for ONE batch of (doc_id, text) — the
    corpus_manifest aggregate, computed on the delta only."""
    from ..functions.text import tokens

    return batch.groupBy(
        F.pmod("doc_id", F.lit(N_SHARDS)).alias("shard")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(tokens("text"))).cast("long").alias("n_tokens"),
        F.min("doc_id").cast("long").alias("min_doc_id"),
        F.max("doc_id").cast("long").alias("max_doc_id"),
        F.expr(
            "bit_xor(cast(conv(substring(md5(concat(cast(doc_id as string),"
            " '|', text)), 1, 15), 16, 10) as bigint))"
        ).alias("content_digest"),
    )


def process_manifest_batch(
    spark: SparkSession, batch_df: DataFrame, batch_id: int, store_dir: str
) -> None:
    """One foreachBatch step: write this batch's delta partition
    (idempotent batch-keyed overwrite)."""
    if batch_df.isEmpty():
        return
    shard_manifest_delta(batch_df).write.mode("overwrite").parquet(
        os.path.join(store_dir, f"batch={batch_id}")
    )


def read_manifest(spark: SparkSession, store_dir: str) -> DataFrame:
    """The CURRENT manifest: merge all delta partitions — every column
    a monoid, so this equals the batch manifest over all ingested
    docs."""
    deltas = spark.read.parquet(store_dir)
    return deltas.groupBy("shard").agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.min("min_doc_id").cast("long").alias("min_doc_id"),
        F.max("max_doc_id").cast("long").alias("max_doc_id"),
        F.expr("bit_xor(content_digest)").alias("content_digest"),
    )


def start_manifest_stream(
    stream: DataFrame, store_dir: str, checkpoint_dir: str
):
    """Wire the delta step into a foreachBatch query (availableNow)."""
    spark = stream.sparkSession

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_manifest_batch(spark, batch_df, batch_id, store_dir)

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
