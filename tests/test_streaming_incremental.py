"""Incremental snapshot-vs-corpus dedup stream
(`streaming/incremental.py`): new docs matching the accepted corpus
are flagged exact/near, only kept docs index, within-batch exact
keeps the first copy, and crash-replay of a batch is idempotent."""

from __future__ import annotations

import json
import os

from cloud_native_reddit_data_pipeline_spark.streaming.incremental import (
    incremental_dedup_batch_against_store,
    process_incremental_dedup_batch,
    start_incremental_dedup_stream,
)

SCHEMA = "doc_id LONG, text STRING"
DOC = "the quick brown fox jumps over the lazy dog again today"
NEAR = "the quick brown fox jumps over the lazy cat again today"
NOVEL = "entirely different material mentioning nothing seen before anywhere"


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
    q = start_incremental_dedup_stream(
        stream,
        str(tmp_path / "flags"),
        str(tmp_path / "fps"),
        str(tmp_path / "bks"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    return {
        r["doc_id"]: r
        for r in spark.read.parquet(str(tmp_path / "flags")).collect()
    }


def test_cross_batch_exact_and_near_flags(spark, tmp_path):
    src = tmp_path / "src"
    _write_batch(src, [(1, DOC)])
    _write_batch(src, [(2, DOC), (3, NEAR), (4, NOVEL)])
    flags = _run(spark, src, tmp_path)
    assert flags[1].kept and not flags[1].exact_dup and not flags[1].near_dup
    # re-sent text: exact (and necessarily near — same shingles)
    assert flags[2].exact_dup and not flags[2].kept
    # one-word change: near but not exact
    assert flags[3].near_dup and not flags[3].exact_dup and not flags[3].kept
    assert flags[4].kept


def test_within_batch_exact_keeps_min_id(spark, tmp_path):
    src = tmp_path / "src"
    _write_batch(src, [(5, DOC), (3, DOC)])
    flags = _run(spark, src, tmp_path)
    assert flags[3].kept and not flags[3].exact_dup
    assert flags[5].exact_dup and not flags[5].kept


def test_dropped_docs_do_not_index(spark, tmp_path):
    """A near-dup that was DROPPED must not have indexed its own band
    keys: a later doc matching only the dropped doc's novel parts is
    kept."""
    flags_dir = str(tmp_path / "flags")
    fp_dir = str(tmp_path / "fps")
    bk_dir = str(tmp_path / "bks")
    b0 = spark.createDataFrame([(1, DOC)], SCHEMA)
    process_incremental_dedup_batch(spark, b0, 0, flags_dir, fp_dir, bk_dir)
    # batch 1: near-dup of DOC -> dropped, must not index
    b1 = spark.createDataFrame([(2, NEAR)], SCHEMA)
    process_incremental_dedup_batch(spark, b1, 1, flags_dir, fp_dir, bk_dir)
    flags = {r["doc_id"]: r for r in spark.read.parquet(flags_dir).collect()}
    assert flags[2].near_dup and not flags[2].kept
    # the store holds only doc 1's keys: one fp partition row total
    fps = spark.read.parquet(fp_dir).collect()
    assert len(fps) == 1


def test_crash_replay_is_idempotent(spark, tmp_path):
    flags_dir = str(tmp_path / "flags")
    fp_dir = str(tmp_path / "fps")
    bk_dir = str(tmp_path / "bks")
    b0 = spark.createDataFrame([(1, DOC), (2, NEAR)], SCHEMA)
    process_incremental_dedup_batch(spark, b0, 0, flags_dir, fp_dir, bk_dir)
    first = sorted(
        tuple(r) for r in spark.read.parquet(flags_dir).collect()
    )
    # replay the same batch id: the batch's own store partitions must
    # not flag its docs against themselves
    process_incremental_dedup_batch(spark, b0, 0, flags_dir, fp_dir, bk_dir)
    again = sorted(tuple(r) for r in spark.read.parquet(flags_dir).collect())
    assert first == again
    flags = {r["doc_id"]: r for r in spark.read.parquet(flags_dir).collect()}
    assert flags[1].kept  # not flagged against its own batch partition


def test_standalone_step_matches_batch_operator(spark):
    """With an empty store, the streaming step's flags equal the batch
    operator's on the same new/hist split (modulo the within-batch
    exact rule, absent here by construction: all texts distinct)."""
    from cloud_native_reddit_data_pipeline_spark.operators.dedup import (
        incremental_dedup_flags,
    )

    hist = spark.createDataFrame([(0, DOC)], SCHEMA)
    new = spark.createDataFrame([(1, NEAR), (3, NOVEL)], SCHEMA)
    batch_out = {
        r["doc_id"]: (r.exact_dup, r.near_dup, r.kept)
        for r in incremental_dedup_flags(new, hist, "doc_id", "text").collect()
    }
    # seed the store from hist via the streaming step, then flag `new`
    fp_store = None
    bk_store = None
    flags_h, new_fp, new_bk = incremental_dedup_batch_against_store(
        hist, fp_store, bk_store, "doc_id", "text"
    )
    flags_n, _, _ = incremental_dedup_batch_against_store(
        new, new_fp, new_bk, "doc_id", "text"
    )
    stream_out = {
        r["doc_id"]: (r.exact_dup, r.near_dup, r.kept)
        for r in flags_n.collect()
    }
    assert stream_out == batch_out
