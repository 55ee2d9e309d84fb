"""Incremental thread-path stream (`streaming/threads.py`): late
comments attach to stored parent paths, in-batch chains resolve in
bounded rounds, parent-less arrivals stay orphans (a late parent does
NOT retroactively adopt), and crash-replay of a batch is idempotent."""

from __future__ import annotations

import json
import os

from cloud_native_reddit_data_pipeline_spark.streaming.threads import (
    start_thread_paths_stream,
    thread_paths_batch_against_store,
)

SCHEMA = "id LONG, parent_id LONG"


def _write_batch(dirpath, rows):
    dirpath.mkdir(parents=True, exist_ok=True)
    seq = len(list(dirpath.iterdir()))
    f = dirpath / f"b{seq}.json"
    f.write_text(
        "\n".join(
            json.dumps({"id": i, "parent_id": p}) for i, p in rows
        )
    )
    t = 1_700_000_000 + seq
    os.utime(f, (t, t))


def _run(spark, src, tmp_path):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = start_thread_paths_stream(
        stream,
        str(tmp_path / "out"),
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    return {
        r["node_id"]: r
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }


def test_cross_batch_attach_and_in_batch_chain(spark, tmp_path):
    src = tmp_path / "src"
    # batch 0: root 1 and child 2
    _write_batch(src, [(1, None), (2, 1)])
    # batch 1: grandchild 3 (parent in store) plus an in-batch chain
    # 4 -> 5 arriving together under node 2
    _write_batch(src, [(3, 2), (4, 2), (5, 4)])
    out = _run(spark, src, tmp_path)
    assert out[1].path == "1" and out[1].depth == 0
    assert out[2].path == "1/2" and out[2].root_id == 1
    assert out[3].path == "1/2/3" and out[3].depth == 2
    assert out[4].path == "1/2/4"
    assert out[5].path == "1/2/4/5" and out[5].depth == 3
    assert all(out[i].attached for i in (1, 2, 3, 4, 5))


def test_orphan_stays_orphan_after_late_parent(spark, tmp_path):
    src = tmp_path / "src"
    # batch 0: child 20 arrives before its parent 10
    _write_batch(src, [(1, None), (20, 10)])
    # batch 1: parent 10 arrives late under root 1
    _write_batch(src, [(10, 1)])
    out = _run(spark, src, tmp_path)
    assert not out[20].attached
    assert out[20].root_id is None and out[20].path is None
    # the late parent threads fine itself
    assert out[10].attached and out[10].path == "1/10"


def test_batch_step_standalone_with_store(spark):
    store = spark.createDataFrame(
        [(7, 7, 0, "7")], "node_id long, root_id long, depth int, path string"
    )
    batch = spark.createDataFrame(
        [(8, 7), (9, 8), (10, 99)], "id long, parent_id long"
    )
    rows = {
        r["node_id"]: r
        for r in thread_paths_batch_against_store(batch, store).collect()
    }
    assert rows[8].path == "7/8" and rows[8].depth == 1
    assert rows[9].path == "7/8/9" and rows[9].depth == 2
    assert not rows[10].attached


def test_replay_idempotent(spark, tmp_path):
    src = tmp_path / "src"
    _write_batch(src, [(1, None), (2, 1)])
    out1 = _run(spark, src, tmp_path)
    # wipe the checkpoint and re-run the same source: batch ids restart,
    # batch= overwrite + store self-exclusion must converge to the same
    # rows, not duplicates
    import shutil

    shutil.rmtree(tmp_path / "ckpt")
    out2 = _run(spark, src, tmp_path)
    assert {k: (v.path, v.attached) for k, v in out1.items()} == {
        k: (v.path, v.attached) for k, v in out2.items()
    }
