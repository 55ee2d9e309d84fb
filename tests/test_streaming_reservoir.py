"""Streaming reservoir sample (`streaming/reservoir.py`): the keep-k-
smallest-md5 monoid makes the final reservoir independent of the batch
split (bit-equal to the batch top-k), state stays O(k), and replay is
idempotent."""

from __future__ import annotations

import hashlib
import json
import os
import shutil

from cloud_native_reddit_data_pipeline_spark.streaming.reservoir import (
    final_reservoir,
    start_reservoir_stream,
)


def _write_batch(dirpath, ids):
    dirpath.mkdir(parents=True, exist_ok=True)
    seq = len(list(dirpath.iterdir()))
    f = dirpath / f"b{seq}.json"
    f.write_text("\n".join(json.dumps({"doc_id": i}) for i in ids))
    t = 1_700_000_000 + seq
    os.utime(f, (t, t))


def _run(spark, src, tmp_path, k):
    stream = (
        spark.readStream.schema("doc_id LONG")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = start_reservoir_stream(
        stream, str(tmp_path / "store"), str(tmp_path / "ckpt"), "doc_id", k
    )
    q.awaitTermination(120)
    return sorted(
        r["doc_id"] for r in final_reservoir(spark, str(tmp_path / "store")).collect()
    )


def _batch_topk(ids, k):
    return sorted(
        sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:k]
    )


def test_stream_equals_batch_topk_regardless_of_split(spark, tmp_path):
    ids = list(range(200))
    src1 = tmp_path / "s1"
    _write_batch(src1, ids[:50])
    _write_batch(src1, ids[50:120])
    _write_batch(src1, ids[120:])
    got1 = _run(spark, src1, tmp_path / "r1", k=16)
    assert got1 == _batch_topk(ids, 16)
    # a different split converges to the same reservoir
    src2 = tmp_path / "s2"
    _write_batch(src2, ids[::2])
    _write_batch(src2, ids[1::2])
    got2 = _run(spark, src2, tmp_path / "r2", k=16)
    assert got2 == got1


def test_replay_idempotent_and_state_bounded(spark, tmp_path):
    ids = list(range(100))
    src = tmp_path / "src"
    _write_batch(src, ids[:60])
    _write_batch(src, ids[60:])
    got = _run(spark, src, tmp_path, k=8)
    assert got == _batch_topk(ids, 8)
    # every snapshot partition holds at most k rows (state is O(k))
    store = spark.read.parquet(str(tmp_path / "store"))
    sizes = {
        r.batch: r.n
        for r in store.groupBy("batch").count().withColumnRenamed("count", "n").collect()
    }
    assert all(n <= 8 for n in sizes.values()) and len(sizes) == 2
    # wipe the checkpoint, re-run same source: converges identically
    shutil.rmtree(tmp_path / "ckpt")
    got2 = _run(spark, src, tmp_path, k=8)
    assert got2 == got
