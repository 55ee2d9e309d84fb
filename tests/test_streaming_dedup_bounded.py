"""Watermark-bounded streaming dedup (dropDuplicatesWithinWatermark via
streaming/ingest.dedup_within_watermark): hand-computed three-batch
replay pinning all four row fates (emit, in-window dedup, late-drop,
evict-then-re-emit), plus the state-size assertion vs the unbounded
twin — the SURVEY O38 "recommended at scale" note as tested code.
"""

from __future__ import annotations

import os
import time as _time
import uuid
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from cloud_native_reddit_data_pipeline_spark.streaming.ingest import (
    dedup_within_watermark,
)

SCHEMA = "k string, ts timestamp, v long"


def _ts(hhmm: str) -> datetime:
    return datetime(2024, 1, 1, int(hhmm[:2]), int(hhmm[3:]))


# Hand-computed scenario, delay = 1 hour:
#   batch 1: A@10:00 B@10:30 C@16:00          -> all emitted; wm becomes 15:00
#   batch 2: A@10:00 (below wm -> LATE-dropped),
#            C@16:00 (above wm, state alive -> DEDUP-dropped)
#   batch 3 (fresh ts 17:00): A (expiry 11:00 <= wm 15:00 -> state was
#            EVICTED end of batch 2 -> RE-EMITTED),
#            C (expiry 17:00 > wm -> state alive -> dropped)
BATCH1 = [("A", _ts("10:00"), 1), ("B", _ts("10:30"), 2), ("C", _ts("16:00"), 3)]
BATCH2 = [("A", _ts("10:00"), 11), ("C", _ts("16:00"), 33)]
BATCH3 = [("A", _ts("17:00"), 111), ("C", _ts("17:00"), 333)]
EXPECTED = {
    ("A", _ts("10:00"), 1),
    ("B", _ts("10:30"), 2),
    ("C", _ts("16:00"), 3),
    ("A", _ts("17:00"), 111),  # the out-of-window redelivery re-emits
}


def _write_batches(spark, d):
    batches = [BATCH1, BATCH2, BATCH3]
    seen: set[str] = set()
    now = _time.time()
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(d)
        new = {n for n in os.listdir(d) if n.startswith("part-")} - seen
        for n in new:
            t = now - 60 * (len(batches) - i)
            os.utime(f"{d}/{n}", (t, t))
        seen |= new


def _run(spark, d, dedup_fn):
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(d)
    )
    qname = f"dwb_{uuid.uuid4().hex[:8]}"
    q = (
        dedup_fn(stream)
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {tuple(r) for r in spark.table(qname).collect()}
    state = None
    for p in q.recentProgress:
        ops = p.get("stateOperators") or []
        if ops:
            state = ops[0]["numRowsTotal"]
    return rows, state


def test_bounded_dedup_hand_computed_fates(spark, tmp_path):
    d = str(tmp_path / "s")
    _write_batches(spark, d)
    rows, _ = _run(
        spark, d, lambda s: dedup_within_watermark(s, ["k"], "ts", "1 hour")
    )
    assert rows == EXPECTED


def test_bounded_state_smaller_than_unbounded(spark, tmp_path):
    """The whole point of the bounded twin: after the same replay, the
    unbounded form holds every key ever seen; the bounded form holds
    only keys whose expiry is still ahead of the watermark."""
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    _write_batches(spark, d1)
    _write_batches(spark, d2)
    rows_b, state_b = _run(
        spark, d1, lambda s: dedup_within_watermark(s, ["k"], "ts", "1 hour")
    )
    rows_u, state_u = _run(spark, d2, lambda s: s.dropDuplicates(["k"]))
    # unbounded: 3 distinct keys, forever.  bounded after the final
    # cleanup (wm 15:00): C@16:00 (expiry 17:00) + the re-emitted
    # A@17:00 (expiry 18:00) = 2 rows.
    assert state_u == 3
    assert state_b == 2
    assert state_b < state_u
    # and the unbounded form can never re-emit the out-of-window key
    assert ("A", _ts("17:00"), 111) not in rows_u
    assert len(rows_u) == 3
