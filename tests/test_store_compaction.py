"""Streaming state-store compaction (streaming/store.py): folding the
band-key / gram stores must never change a dedup or cut decision, must
shrink the partition count, and must respect the crash-replay
`before_batch_id` exclusion."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cloud_native_reddit_data_pipeline_spark.streaming.neardup import (
    process_neardup_batch,
)
from cloud_native_reddit_data_pipeline_spark.streaming.spans import (
    process_span_cut_batch,
)
from cloud_native_reddit_data_pipeline_spark.streaming.store import (
    compact_store,
    list_store_batches,
)


def _doc(i: int, text: str):
    return (i, text)


BATCHES = [
    [
        _doc(1, "the quick brown fox jumps over the lazy dog again and again"),
        _doc(2, "completely different text about spark partitions and shuffles"),
    ],
    [
        _doc(3, "the quick brown fox jumps over the lazy dog again and again"),
        _doc(4, "novel content mentioning watermarks and stateful operators"),
    ],
    [
        _doc(5, "completely different text about spark partitions and shuffles"),
        _doc(6, "yet another unique document on bucketed upserts and sinks"),
    ],
    [
        _doc(7, "novel content mentioning watermarks and stateful operators"),
        _doc(8, "final fresh document with entirely original token content"),
    ],
]


def _run_neardup(spark, root, compact_every):
    corpus, store = os.path.join(root, "corpus"), os.path.join(root, "store")
    for bid, rows in enumerate(BATCHES):
        df = spark.createDataFrame(rows, "doc_id int, text string")
        process_neardup_batch(
            spark, df, bid, corpus, store, compact_every=compact_every
        )
    out = spark.read.parquet(corpus)
    return sorted(r["doc_id"] for r in out.select("doc_id").collect()), store


def test_neardup_compaction_preserves_decisions(spark, tmp_path):
    plain, _ = _run_neardup(spark, str(tmp_path / "plain"), compact_every=None)
    compacted, store = _run_neardup(spark, str(tmp_path / "cmp"), compact_every=2)
    assert compacted == plain
    # duplicates of accepted docs were actually dropped
    assert 3 not in compacted and 5 not in compacted and 7 not in compacted
    # batches 0..1 folded at batch 2: fewer partitions than batches
    assert len(list_store_batches(store)) < len(BATCHES)


def _run_spans(spark, root, compact_every):
    corpus, store = os.path.join(root, "corpus"), os.path.join(root, "store")
    for bid, rows in enumerate(BATCHES):
        df = spark.createDataFrame(rows, "doc_id int, text string")
        process_span_cut_batch(
            spark, df, bid, corpus, store, k=5, compact_every=compact_every
        )
    out = spark.read.parquet(corpus)
    return {
        r["doc_id"]: r["cleaned_text"]
        for r in out.select("doc_id", "cleaned_text").collect()
    }, store


def test_span_cut_compaction_preserves_decisions(spark, tmp_path):
    plain, _ = _run_spans(spark, str(tmp_path / "plain"), compact_every=None)
    compacted, store = _run_spans(spark, str(tmp_path / "cmp"), compact_every=2)
    assert compacted == plain
    # repeated passages were cut (doc 3 repeats doc 1 verbatim)
    assert compacted[3] != BATCHES[1][0][1]
    assert len(list_store_batches(store)) < len(BATCHES)


def test_compact_store_folds_and_dedups(spark, tmp_path):
    store = str(tmp_path / "store")
    for bid, keys in enumerate([[(0, "k1"), (1, "k2")], [(0, "k1"), (0, "k3")]]):
        df = spark.createDataFrame(
            [(100 + i, b, k) for i, (b, k) in enumerate(keys)],
            "doc_id int, band int, key string",
        )
        df.write.mode("overwrite").parquet(os.path.join(store, f"batch={bid}"))
    # before_batch_id=1 protects batch 1 (a possible replay target)
    assert compact_store(spark, store, 1, dedup_keys=["band", "key"]) is False
    assert list_store_batches(store) == [0, 1]
    # before_batch_id=2 folds both into batch=1, deduped per (band, key)
    assert compact_store(spark, store, 2, dedup_keys=["band", "key"]) is True
    assert list_store_batches(store) == [1]
    folded = spark.read.parquet(store)
    rows = {(r["band"], r["key"]) for r in folded.collect()}
    assert rows == {(0, "k1"), (1, "k2"), (0, "k3")}
    assert folded.count() == 3  # duplicate (0,'k1') collapsed
    # the replay prune still excludes the folded label for batch<=1
    assert folded.filter(F.col("batch") < 1).count() == 0
