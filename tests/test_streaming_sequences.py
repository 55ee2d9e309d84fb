"""Incremental sequence-example stream (`streaming/sequences.py`):
cross-batch contexts come from the bounded per-user tail store,
crash-replay of a batch is idempotent, and the latest-wins tail
compaction preserves every decision."""

from __future__ import annotations

import datetime as dt

from cloud_native_reddit_data_pipeline_spark.streaming.sequences import (
    _read_tail,
    compact_tail_store,
    process_sequence_batch,
    sequence_examples_batch_against_store,
)

T0 = dt.datetime(2024, 1, 1)
SCHEMA = (
    "user_id LONG, ts TIMESTAMP, event_id LONG, event_type STRING"
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, T0 + dt.timedelta(minutes=m), e, t) for u, m, e, t in rows],
        SCHEMA,
    )


def test_batch_step_uses_tail_for_context(spark):
    # batch 1: user 1 gets events a,b,c -> no full-context example yet
    b1 = _ev(spark, [(1, 1, 101, "a"), (1, 2, 102, "b"), (1, 3, 103, "c")])
    ex1, tail1 = sequence_examples_batch_against_store(b1, None, context=3)
    assert ex1.count() == 0
    assert tail1.count() == 3  # the whole history fits the tail
    # batch 2: one new event -> context comes entirely from the tail
    b2 = _ev(spark, [(1, 4, 104, "d")])
    ex2, tail2 = sequence_examples_batch_against_store(b2, tail1, context=3)
    rows = ex2.collect()
    assert len(rows) == 1
    assert rows[0]["context"] == "a>b>c" and rows[0]["target"] == "d"
    # new tail slides: b,c,d
    assert sorted(r["event_type"] for r in tail2.collect()) == ["b", "c", "d"]


def test_tail_rows_never_emit_examples(spark):
    b1 = _ev(spark, [(1, i, 100 + i, f"e{i}") for i in range(1, 5)])
    ex1, tail1 = sequence_examples_batch_against_store(b1, None)
    # the batch itself emits exactly one full-context example (event 4)
    assert {r["event_id"] for r in ex1.collect()} == {104}
    b2 = _ev(spark, [(1, 9, 109, "z")])
    ex2, _ = sequence_examples_batch_against_store(b2, tail1)
    # replaying tail rows as context must not re-emit event 4
    assert {r["event_id"] for r in ex2.collect()} == {109}


def test_crash_replay_is_idempotent(spark, tmp_path):
    corpus, store = str(tmp_path / "c"), str(tmp_path / "s")
    b1 = _ev(spark, [(1, i, 100 + i, f"e{i}") for i in range(1, 5)])
    b2 = _ev(spark, [(1, 9, 109, "z"), (2, 1, 201, "w")])
    process_sequence_batch(spark, b1, 0, corpus, store)
    process_sequence_batch(spark, b2, 1, corpus, store)
    first = sorted(
        (r["event_id"], r["context"])
        for r in spark.read.parquet(corpus).collect()
    )
    # TRUE crash replay: batch 1 re-runs with the SAME id and content.
    # Its own corpus and tail partitions exist, but the tail read must
    # exclude batch>=1, so decisions — and therefore files — repeat.
    process_sequence_batch(spark, b2, 1, corpus, store)
    again = sorted(
        (r["event_id"], r["context"])
        for r in spark.read.parquet(corpus).collect()
    )
    assert again == first
    # and batch 2's example really used the cross-batch tail context
    assert (109, "e2>e3>e4") in first


def test_redelivered_tail_event_not_duplicated(spark):
    # at-least-once defense: event 104 sits in the tail AND reappears
    # in the next batch — the lag order must see it exactly once
    b1 = _ev(spark, [(1, i, 100 + i, f"e{i}") for i in range(1, 5)])
    _, tail1 = sequence_examples_batch_against_store(b1, None)
    b2 = _ev(spark, [(1, 4, 104, "e4"), (1, 9, 109, "z")])
    ex2, _ = sequence_examples_batch_against_store(b2, tail1)
    rows = {r["event_id"]: r for r in ex2.collect()}
    # z's context is e2>e3>e4 — not polluted by a duplicate e4; the
    # redelivered 104 itself cannot re-emit (its full context left the
    # bounded tail — the inherent trade of O(context) state)
    assert rows[109]["context"] == "e2>e3>e4"
    assert 104 not in rows


def test_compaction_keeps_latest_tail_only(spark, tmp_path):
    corpus, store = str(tmp_path / "c"), str(tmp_path / "s")
    # user 1 active in batches 0 and 1; user 2 only in batch 0
    process_sequence_batch(
        spark, _ev(spark, [(1, 1, 101, "a"), (2, 1, 201, "x")]),
        0, corpus, store, compact_every=None,
    )
    process_sequence_batch(
        spark, _ev(spark, [(1, 2, 102, "b")]),
        1, corpus, store, compact_every=None,
    )
    before = {
        (r["user_id"], r["event_id"])
        for r in _read_tail(spark, store, before_batch_id=99).collect()
    }
    assert compact_tail_store(spark, store, before_batch_id=99)
    after = {
        (r["user_id"], r["event_id"])
        for r in _read_tail(spark, store, before_batch_id=99).collect()
    }
    assert after == before
    # user 1's tail is their batch-1 state (events 101+102 both within
    # the 3-tail), user 2's batch-0 row survives the fold
    assert (2, 201) in after and (1, 102) in after
