"""Incremental MinHash dedup stream (`streaming/neardup.py`): the
accepted-corpus invariants — near-dups of earlier batches drop, batch
dups keep-first, short docs pass, replays stay idempotent."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from cloud_native_reddit_data_pipeline_spark.streaming.neardup import (
    band_key_rows,
    dedup_batch_against_store,
    start_neardup_dedup_stream,
)

LONG_A = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
LONG_B = "completely different content about spark structured streaming state stores and watermarks for late data"
LONG_A_NEAR = LONG_A + " extra"  # shares almost all shingles with LONG_A
SCHEMA = "doc_id LONG, text STRING"


def _write_batch(dirpath, rows):
    import os

    dirpath.mkdir(parents=True, exist_ok=True)
    seq = len(list(dirpath.iterdir()))
    f = dirpath / f"b{seq}.json"
    f.write_text("\n".join(json.dumps({"doc_id": i, "text": t}) for i, t in rows))
    # distinct mtimes pin the file-source processing order (ties are
    # otherwise broken arbitrarily and batches can swap)
    t = 1_700_000_000 + seq
    os.utime(f, (t, t))


def _run(spark, src, tmp_path):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = start_neardup_dedup_stream(
        stream,
        str(tmp_path / "corpus"),
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    return spark.read.parquet(str(tmp_path / "corpus"))


def test_cross_batch_neardup_dropped_and_store_grows(spark, tmp_path):
    src = tmp_path / "src"
    _write_batch(src, [(1, LONG_A)])
    _write_batch(src, [(2, LONG_A_NEAR), (3, LONG_B)])
    corpus = _run(spark, src, tmp_path)
    ids = {r["doc_id"] for r in corpus.collect()}
    assert ids == {1, 3}  # 2 is a near-dup of batch-1's doc 1
    store = spark.read.parquet(str(tmp_path / "store"))
    assert {r["doc_id"] for r in store.collect()} == {1, 3}


def test_within_batch_keeps_lowest_id(spark, tmp_path):
    src = tmp_path / "src"
    _write_batch(src, [(7, LONG_A), (5, LONG_A_NEAR), (9, LONG_B)])
    corpus = _run(spark, src, tmp_path)
    assert {r["doc_id"] for r in corpus.collect()} == {5, 9}


def test_short_docs_always_survive(spark, tmp_path):
    src = tmp_path / "src"
    _write_batch(src, [(1, "too short"), (2, "too short")])
    corpus = _run(spark, src, tmp_path)
    # < shingle_n words -> no signature -> no dup evidence -> both kept
    assert {r["doc_id"] for r in corpus.collect()} == {1, 2}


def test_restart_processes_only_new_batches(spark, tmp_path):
    src = tmp_path / "src"
    _write_batch(src, [(1, LONG_A)])
    c1 = _run(spark, src, tmp_path)
    assert {r["doc_id"] for r in c1.collect()} == {1}
    _write_batch(src, [(2, LONG_A_NEAR), (3, LONG_B)])
    c2 = _run(spark, src, tmp_path)  # same checkpoint: resumes, not replays
    assert {r["doc_id"] for r in c2.collect()} == {1, 3}


def test_batch_core_matches_streaming_outcome(spark):
    batch = spark.createDataFrame(
        [(1, LONG_A), (2, LONG_A_NEAR), (3, LONG_B)], SCHEMA
    )
    survivors, keys = dedup_batch_against_store(batch, None, "doc_id", "text")
    assert {r["doc_id"] for r in survivors.collect()} == {1, 3}
    kd = keys.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    assert all(r["n"] == 4 for r in kd)  # 4 bands per surviving doc
    from cloud_native_reddit_data_pipeline_spark.operators.dedup import (
        minhash_signatures,
    )

    sigs = minhash_signatures(batch, "doc_id", "text")
    assert band_key_rows(sigs, "doc_id").count() == 3 * 4


def test_crash_replay_does_not_poison_neardup(spark, tmp_path):
    """Replaying a batch_id after a crash-after-store-write must not
    drop the whole batch through self-collision: the store read
    excludes the current batch's own partition."""
    from cloud_native_reddit_data_pipeline_spark.streaming.neardup import (
        process_neardup_batch,
    )

    corpus = str(tmp_path / "corpus")
    store = str(tmp_path / "store")
    text = "the quick brown fox jumps over the lazy dog tonight again"
    df = spark.createDataFrame([(1, text)], "doc_id LONG, text STRING")
    process_neardup_batch(spark, df, 0, corpus, store)
    assert spark.read.parquet(corpus + "/batch=0").count() == 1
    # replay the SAME batch_id: survivor must persist, not self-collide
    process_neardup_batch(spark, df, 0, corpus, store)
    assert spark.read.parquet(corpus + "/batch=0").count() == 1
    # a LATER batch with the same content still drops (strict < filter)
    df2 = spark.createDataFrame([(2, text)], "doc_id LONG, text STRING")
    process_neardup_batch(spark, df2, 1, corpus, store)
    assert spark.read.parquet(corpus + "/batch=1").count() == 0
