"""Streaming golden-record maintenance: CDC upserts into a keyed store
with SURVIVORSHIP kept current per micro-batch.

The reference upserts harvested documents by id into Elasticsearch
(addReddit.py:63-64 — `es.index(id=...)`, last-writer-wins) and serves
queries off the always-current store.  This module extends that O8
contract to LINKED entities: every upsert batch lands in the bucketed
CDC store (`upsert_parquet_by_key_bucketed` — only touched buckets
rewrite), then the maintenance loop re-derives entity components over
the CURRENT store and republishes the golden-record table
(`operators/dedup.golden_records` — keeper by score, modal values per
field), so survivorship never lags ingest by more than one micro-batch.

Scale shape per batch: the upsert is O(touched buckets); the
survivorship refresh is one blocked-edges pass + component-sized
aggregates over the store (the same shape as the batch operator — at a
real cadence this is the classic "compact then publish" maintenance
job, amortized exactly like index compaction).  The publish itself is
write-aside + swap, so readers of the golden table never see a
half-written refresh.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import connected_components, golden_records
from .ingest import (
    _swap_dir,
    read_bucketed_table,
    upsert_parquet_by_key_bucketed,
)


def refresh_golden_records(
    spark: SparkSession,
    store_dir: str,
    golden_dir: str,
    id_col: str,
    modal_cols: list[str],
    keeper_score_col: str,
    edges_fn: Callable[[DataFrame], DataFrame],
) -> None:
    """One survivorship refresh: read the CURRENT store, re-derive
    match edges (`edges_fn` injects the blocking/matching rule) and
    components, merge golden records, publish atomically (write-aside
    + swap — a crash mid-refresh leaves the previous golden table)."""
    records = read_bucketed_table(spark, store_dir)
    comp = connected_components(edges_fn(records))
    golden = golden_records(
        comp, records, id_col, modal_cols, keeper_score_col
    )
    tmp = golden_dir.rstrip("/") + "._tmp_write"
    golden.write.mode("overwrite").parquet(tmp)
    _swap_dir(tmp, golden_dir)


def start_golden_record_maintenance(
    spark: SparkSession,
    updates_dir: str,
    schema,
    store_dir: str,
    golden_dir: str,
    checkpoint_dir: str,
    id_col: str,
    modal_cols: list[str],
    keeper_score_col: str,
    edges_fn: Callable[[DataFrame], DataFrame],
    n_buckets: int = 16,
    available_now: bool = True,
    max_files_per_trigger: int = 1,
):
    """The maintenance stream: parquet update files -> bucketed keyed
    upsert (idempotent: redelivered rows re-assert the same key, so
    at-least-once delivery converges) -> golden-record refresh over the
    post-upsert store.  Returns the started StreamingQuery."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_parquet_by_key_bucketed(
            batch_df, store_dir, id_col, n_buckets=n_buckets
        )
        refresh_golden_records(
            spark, store_dir, golden_dir, id_col, modal_cols,
            keeper_score_col, edges_fn,
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(updates_dir)
    )
    writer = stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
