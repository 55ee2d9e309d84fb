"""Stream-stream watermarked interval join: result must equal the
equivalent batch interval join over the same rows."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from cloud_native_reddit_data_pipeline_spark.streaming.ingest import (
    streaming_interval_join,
    streaming_interval_join_outer,
)

_SCHEMA = "event_id long, ts timestamp, user_id long, value double"


def _rows(spark, rows):
    return spark.createDataFrame(
        [(i, datetime.fromisoformat(t), u, v) for i, t, u, v in rows], _SCHEMA
    )


def test_stream_interval_join_matches_batch(spark, tmp_path):
    clicks = _rows(
        spark,
        [
            (0, "2024-01-01 10:00:00", 1, 0.0),
            (1, "2024-01-01 11:00:00", 1, 0.0),
            (2, "2024-01-01 10:30:00", 2, 0.0),
        ],
    )
    purchases = _rows(
        spark,
        [
            (100, "2024-01-01 10:20:00", 1, 9.99),  # within 1h of click 0
            (101, "2024-01-01 11:50:00", 1, 5.00),  # within 1h of click 1 only
            (102, "2024-01-01 13:00:00", 2, 7.77),  # outside any window
        ],
    )
    cdir, pdir = str(tmp_path / "clicks"), str(tmp_path / "purchases")
    clicks.coalesce(1).write.parquet(cdir)
    purchases.coalesce(1).write.parquet(pdir)

    cs = spark.readStream.schema(clicks.schema).parquet(cdir)
    ps = spark.readStream.schema(purchases.schema).parquet(pdir)
    q = (
        streaming_interval_join(cs, ps, within="1 hour")
        .writeStream.format("memory")
        .queryName("sjoin_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["left_event_id"], r["right_event_id"])
        for r in spark.table("sjoin_test").collect()
    }
    # batch equivalent
    want = {
        (r["l_id"], r["r_id"])
        for r in clicks.alias("l")
        .join(
            purchases.alias("r"),
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("r.ts") >= F.col("l.ts"))
            & (F.col("r.ts") <= F.col("l.ts") + F.expr("INTERVAL 1 hour")),
        )
        .select(F.col("l.event_id").alias("l_id"), F.col("r.event_id").alias("r_id"))
        .collect()
    }
    assert got == want
    assert (0, 100) in got and (1, 101) in got
    assert not any(r == 102 for _, r in got)


_CLICKS = [
    (0, "2024-01-01 10:00:00", 1, 0.0),  # matched by 100
    (1, "2024-01-01 11:00:00", 1, 0.0),  # matched by 101
    (2, "2024-01-01 10:30:00", 2, 0.0),  # unmatched (102 outside window)
    (3, "2024-01-01 09:00:00", 3, 0.0),  # unmatched (user has no purchases)
]
_PURCHASES = [
    (100, "2024-01-01 10:20:00", 1, 9.99),
    (101, "2024-01-01 11:50:00", 1, 5.00),
    (102, "2024-01-01 13:00:00", 2, 7.77),
]


def _run_outer(spark, cdir, pdir, checkpoint, out_dir):
    """Run the outer join to a parquet sink (memory sink cannot recover
    from a checkpoint, and checkpointed restart is the point here).
    Returns the sink's cumulative contents."""
    schema = "event_id long, ts timestamp, user_id long, value double"
    cs = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(cdir)
    ps = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(pdir)
    q = (
        streaming_interval_join_outer(cs, ps, within="1 hour", watermark="2 hours")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(out_dir)


def _write_batch(df, d, mtime):
    import os

    df.coalesce(1).write.mode("append").parquet(d)
    for name in os.listdir(d):
        if name.startswith("part-") and os.path.getmtime(f"{d}/{name}") > mtime:
            os.utime(f"{d}/{name}", (mtime, mtime))


def test_outer_join_nulls_only_after_watermark(spark, tmp_path):
    """Without anything advancing the watermark past a left row's
    window end, its unmatched-null row must NOT be emitted (a match
    could still arrive); with a far-future sentinel batch on both
    sides, every unmatched left emits exactly one null row and the
    result equals the batch left join."""
    import time

    cdir, pdir = str(tmp_path / "clicks"), str(tmp_path / "purchases")
    base = time.time() - 120
    _write_batch(_rows(spark, _CLICKS), cdir, base)
    _write_batch(_rows(spark, _PURCHASES), pdir, base)

    # phase 1: no sentinel -> watermark stops at max(ts) - 2h =
    # 2024-01-01 11:00, before every window end -> zero null rows yet
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    early = _run_outer(spark, cdir, pdir, ckpt, out)
    assert early.filter("right_event_id IS NULL").count() == 0
    matched = {
        (r["left_event_id"], r["right_event_id"])
        for r in early.filter("right_event_id IS NOT NULL").collect()
    }
    assert matched == {(0, 100), (1, 101)}

    # phase 2: sentinel batch on BOTH sides (global watermark = min of
    # the per-source watermarks) -> state expires -> nulls emit
    _write_batch(_rows(spark, [(900, "2024-01-02 10:00:00", 900, 0.0)]), cdir, base + 60)
    _write_batch(_rows(spark, [(901, "2024-01-02 10:00:00", 901, 0.0)]), pdir, base + 60)
    late = _run_outer(spark, cdir, pdir, ckpt, out)
    nulls = {
        r["left_event_id"]
        for r in late.filter(
            "right_event_id IS NULL AND user_id < 900"
        ).collect()
    }
    assert nulls == {2, 3}


def test_outer_join_checkpoint_redelivery_no_duplicates(spark, tmp_path):
    """Restarting from the same checkpoint after completion must not
    re-emit anything: committed file batches are not re-read and join
    state does not replay matched or expired rows."""
    import time

    cdir, pdir = str(tmp_path / "clicks"), str(tmp_path / "purchases")
    ckpt = str(tmp_path / "ckpt")
    base = time.time() - 120
    _write_batch(_rows(spark, _CLICKS), cdir, base)
    _write_batch(_rows(spark, _PURCHASES), pdir, base)
    _write_batch(_rows(spark, [(900, "2024-01-02 10:00:00", 900, 0.0)]), cdir, base + 60)
    _write_batch(_rows(spark, [(901, "2024-01-02 10:00:00", 901, 0.0)]), pdir, base + 60)

    out = str(tmp_path / "out")
    first = _run_outer(spark, cdir, pdir, ckpt, out)
    rows1 = sorted(
        (r["left_event_id"], r["right_event_id"])
        for r in first.filter("user_id < 900").collect()
    )
    assert rows1 == [(0, 100), (1, 101), (2, None), (3, None)]
    n_first = first.count()

    # restart on the SAME checkpoint, no new files: committed batches
    # are not re-read, expired/matched state does not replay, so the
    # cumulative parquet sink must not grow
    second = _run_outer(spark, cdir, pdir, ckpt, out)
    assert second.count() == n_first


def test_outer_join_drops_late_arrivals_below_watermark(spark, tmp_path):
    """Once the sentinel batch advances the watermark past an event's
    timestamp, a later-arriving row with that old timestamp is LATE:
    Spark filters it from the join on both sides — it produces neither
    a match nor an unmatched-null row."""
    import time

    cdir, pdir = str(tmp_path / "clicks"), str(tmp_path / "purchases")
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    base = time.time() - 120
    _write_batch(_rows(spark, _CLICKS), cdir, base)
    _write_batch(_rows(spark, _PURCHASES), pdir, base)
    _write_batch(_rows(spark, [(900, "2024-01-02 10:00:00", 900, 0.0)]), cdir, base + 60)
    _write_batch(_rows(spark, [(901, "2024-01-02 10:00:00", 901, 0.0)]), pdir, base + 60)
    first = _run_outer(spark, cdir, pdir, ckpt, out)
    n_first = first.count()

    # batch 3: a click + matching purchase far below the advanced
    # watermark (2024-01-02 08:00) -> both dropped as late
    _write_batch(
        _rows(spark, [(50, "2024-01-01 10:05:00", 7, 0.0)]), cdir, base + 90
    )
    _write_batch(
        _rows(spark, [(150, "2024-01-01 10:10:00", 7, 1.23)]), pdir, base + 90
    )
    second = _run_outer(spark, cdir, pdir, ckpt, out)
    assert second.filter("left_event_id = 50 OR right_event_id = 150").count() == 0
    assert second.count() == n_first
