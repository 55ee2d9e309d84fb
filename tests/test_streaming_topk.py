"""Streaming exact top-k terms (`streaming/topk.py`): count-delta
monoid makes the merged top-k split-invariant and bit-equal to the
batch answer; replay overwrites its own delta instead of
double-counting."""

from __future__ import annotations

import json
import os
import shutil
from collections import Counter

from cloud_native_reddit_data_pipeline_spark.streaming.topk import (
    start_topk_terms_stream,
    topk_terms,
)


def _write_batch(dirpath, rows):
    dirpath.mkdir(parents=True, exist_ok=True)
    seq = len(list(dirpath.iterdir()))
    f = dirpath / f"b{seq}.json"
    f.write_text(
        "\n".join(json.dumps({"doc_id": i, "text": t}) for i, t in rows)
    )
    t = 1_700_000_000 + seq
    os.utime(f, (t, t))


def _run(spark, src, tmp_path, k):
    stream = (
        spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = start_topk_terms_stream(
        stream, str(tmp_path / "store"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    return [
        (r.term, r.n) for r in topk_terms(spark, str(tmp_path / "store"), k).collect()
    ]


def _batch_topk(texts, k):
    c = Counter(w.lower() for t in texts for w in t.split())
    return sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def test_stream_topk_equals_batch_and_split_invariant(spark, tmp_path):
    texts = [f"alpha beta gamma w{i % 17} alpha" for i in range(60)]
    src1 = tmp_path / "s1"
    _write_batch(src1, list(enumerate(texts[:20])))
    _write_batch(src1, list(enumerate(texts[20:45], start=20)))
    _write_batch(src1, list(enumerate(texts[45:], start=45)))
    got1 = _run(spark, src1, tmp_path / "r1", k=5)
    assert got1 == _batch_topk(texts, 5)
    assert got1[0] == ("alpha", 120)
    src2 = tmp_path / "s2"
    _write_batch(src2, list(enumerate(texts)))
    got2 = _run(spark, src2, tmp_path / "r2", k=5)
    assert got2 == got1


def test_replay_does_not_double_count(spark, tmp_path):
    texts = ["x y z"] * 10
    src = tmp_path / "src"
    _write_batch(src, list(enumerate(texts)))
    got = _run(spark, src, tmp_path, k=3)
    assert got == [("x", 10), ("y", 10), ("z", 10)]
    shutil.rmtree(tmp_path / "ckpt")
    got2 = _run(spark, src, tmp_path, k=3)
    assert got2 == got
