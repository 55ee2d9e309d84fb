"""Incremental CCNet line-dedup stream (`streaming/lines.py`): lines
repeating earlier batches are dropped from later documents, the first
(accepted) copy stays intact, in-batch duplication keeps the first
occurrence, and crash-replay of a batch is idempotent."""

from __future__ import annotations

import json
import os

from cloud_native_reddit_data_pipeline_spark.streaming.lines import (
    line_dedup_batch_against_store,
    process_line_dedup_batch,
    start_line_dedup_stream,
)

BOILER = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"  # one 10-token line
SCHEMA = "doc_id LONG, text STRING"


def _write_batch(dirpath, rows):
    dirpath.mkdir(parents=True, exist_ok=True)
    seq = len(list(dirpath.iterdir()))
    f = dirpath / f"b{seq}.json"
    f.write_text("\n".join(json.dumps({"doc_id": i, "text": t}) for i, t in rows))
    t = 1_700_000_000 + seq
    os.utime(f, (t, t))


def _run(spark, src, tmp_path):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = start_line_dedup_stream(
        stream,
        str(tmp_path / "corpus"),
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    return {
        r["doc_id"]: r
        for r in spark.read.parquet(str(tmp_path / "corpus")).collect()
    }


def test_cross_batch_line_dropped_first_copy_intact(spark, tmp_path):
    fresh = "f1 f2 f3 f4 f5 f6 f7 f8 f9 f10"
    src = tmp_path / "src"
    _write_batch(src, [(1, BOILER)])
    _write_batch(src, [(2, f"{BOILER} {fresh}")])
    corpus = _run(spark, src, tmp_path)
    # accepted copy intact
    assert corpus[1].cleaned_text == BOILER
    assert (corpus[1].n_lines, corpus[1].n_kept_lines) == (1, 1)
    # batch-2 doc loses the accepted line, keeps its fresh one
    assert corpus[2].cleaned_text == fresh
    assert (corpus[2].n_lines, corpus[2].n_kept_lines) == (2, 1)


def test_within_batch_keeper_rule(spark, tmp_path):
    src = tmp_path / "src"
    _write_batch(src, [(1, BOILER), (2, BOILER)])
    corpus = _run(spark, src, tmp_path)
    # smallest (id, line_no) keeps the line; the other copy drops
    assert corpus[1].cleaned_text == BOILER
    assert corpus[2].cleaned_text == ""
    assert corpus[2].n_kept_lines == 0


def test_crash_replay_is_idempotent(spark, tmp_path):
    """Replaying a batch id must not let the batch's own store
    partition empty its documents."""
    corpus_dir = str(tmp_path / "corpus")
    store_dir = str(tmp_path / "store")
    b0 = spark.createDataFrame([(1, BOILER)], SCHEMA)
    process_line_dedup_batch(spark, b0, 0, corpus_dir, store_dir)
    first = spark.read.parquet(corpus_dir).collect()
    # replay the same batch id (post-crash foreachBatch contract)
    process_line_dedup_batch(spark, b0, 0, corpus_dir, store_dir)
    again = spark.read.parquet(corpus_dir).collect()
    assert first == again
    assert first[0].n_kept_lines == 1 and first[0].cleaned_text == BOILER


def test_standalone_batch_step_with_store(spark):
    store = spark.createDataFrame(
        [(int("0x" + __import__("hashlib").md5(BOILER.encode()).hexdigest()[:15], 16),)],
        "h LONG",
    )
    batch = spark.createDataFrame(
        [(7, f"{BOILER} x1 x2 x3")], SCHEMA
    )
    cleaned, new_hashes = line_dedup_batch_against_store(
        batch, store, "doc_id", "text"
    )
    row = cleaned.collect()[0]
    assert row.cleaned_text == "x1 x2 x3"
    assert (row.n_lines, row.n_kept_lines) == (2, 1)
    # the store append carries the ORIGINAL text's hashes (both lines)
    assert new_hashes.count() == 2
