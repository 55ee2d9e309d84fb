"""Streaming late-arrival audit (`streaming/lateness.py`): rows below
the prior batches' event-time high-water mark are counted with their
worst lateness; the first batch can never be late; the mark is
monotone; replay is idempotent."""

from __future__ import annotations

import json
import os
import shutil

from cloud_native_reddit_data_pipeline_spark.streaming.lateness import (
    start_lateness_audit_stream,
)


def _write_batch(dirpath, rows):
    dirpath.mkdir(parents=True, exist_ok=True)
    seq = len(list(dirpath.iterdir()))
    f = dirpath / f"b{seq}.json"
    f.write_text(
        "\n".join(json.dumps({"event_id": i, "ts": t}) for i, t in rows)
    )
    t = 1_700_000_000 + seq
    os.utime(f, (t, t))


def _run(spark, src, tmp_path):
    stream = (
        spark.readStream.schema("event_id LONG, ts TIMESTAMP")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = start_lateness_audit_stream(
        stream, str(tmp_path / "out"), str(tmp_path / "marks"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    return {
        r.batch: r for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }


def test_lateness_counts_and_first_batch_null(spark, tmp_path):
    src = tmp_path / "src"
    # batch 0: mark becomes 10:00
    _write_batch(src, [(1, "2024-01-01 09:00:00"), (2, "2024-01-01 10:00:00")])
    # batch 1: one on-time (10:30), one 45 min late, one 2 h late
    _write_batch(
        src,
        [
            (3, "2024-01-01 10:30:00"),
            (4, "2024-01-01 09:15:00"),
            (5, "2024-01-01 08:00:00"),
        ],
    )
    out = _run(spark, src, tmp_path)
    b0, b1 = out[0], out[1]
    assert (b0.n_rows, b0.n_late, b0.max_late_sec) == (2, 0, None)
    assert (b1.n_rows, b1.n_late) == (3, 2)
    assert b1.max_late_sec == 2 * 3600


def test_mark_is_monotone_under_out_of_order_batches(spark, tmp_path):
    src = tmp_path / "src"
    _write_batch(src, [(1, "2024-01-01 12:00:00")])
    # batch 1 is ENTIRELY late: mark must stay 12:00, not regress
    _write_batch(src, [(2, "2024-01-01 09:00:00")])
    _write_batch(src, [(3, "2024-01-01 11:00:00")])
    out = _run(spark, src, tmp_path)
    assert out[1].n_late == 1 and out[1].max_late_sec == 3 * 3600
    # batch 2 is judged against 12:00 (not batch 1's 09:00)
    assert out[2].n_late == 1 and out[2].max_late_sec == 3600


def test_replay_idempotent(spark, tmp_path):
    src = tmp_path / "src"
    _write_batch(src, [(1, "2024-01-01 10:00:00")])
    _write_batch(src, [(2, "2024-01-01 09:00:00")])
    out1 = _run(spark, src, tmp_path)
    shutil.rmtree(tmp_path / "ckpt")
    out2 = _run(spark, src, tmp_path)
    assert {k: (v.n_rows, v.n_late, v.max_late_sec) for k, v in out1.items()} == {
        k: (v.n_rows, v.n_late, v.max_late_sec) for k, v in out2.items()
    }
