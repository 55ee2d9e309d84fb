from __future__ import annotations

import json

import pyspark.sql.functions as F

from cloud_native_reddit_data_pipeline_spark.streaming.ingest import (
    ingest_posts_stream,
    read_bucketed_table,
    start_upsert_stream,
    upsert_parquet_by_key,
    write_queue_batch,
)


def _post(i, score=0):
    return {
        "author": f"u{i}",
        "created_utc": "2024-01-01T00:00:00Z",
        "id": f"p{i}",
        "num_comments": 0,
        "score": score,
        "selftext": f"text {i}",
        "subreddit": "sydney",
        "title": f"t {i}",
        "url": None,
    }


def test_stream_dedup_and_quarantine(spark, tmp_path):
    queue = str(tmp_path / "q")
    target = str(tmp_path / "t")
    ckpt = str(tmp_path / "c")
    write_queue_batch(queue, "rharvest", [json.dumps([_post(i) for i in range(5)])])
    write_queue_batch(queue, "rharvest", [json.dumps([_post(i) for i in range(3, 8)])])
    write_queue_batch(queue, "rharvest", ["{broken json!"])
    stream = ingest_posts_stream(spark, queue)
    q = start_upsert_stream(stream, target, ckpt, key="id", available_now=True)
    q.awaitTermination(120)
    out = read_bucketed_table(spark, target)
    assert out.count() == 8  # p0..p7, overlap deduped, corrupt dropped
    assert out.select("id").distinct().count() == 8


def test_upsert_last_writer_wins(spark, tmp_path):
    target = str(tmp_path / "t2")
    first = spark.createDataFrame([("a", 1), ("b", 1)], "id string, v int")
    second = spark.createDataFrame([("b", 2), ("c", 2)], "id string, v int")
    upsert_parquet_by_key(first, target, "id")
    upsert_parquet_by_key(second, target, "id")
    got = {r["id"]: r["v"] for r in spark.read.parquet(target).collect()}
    assert got == {"a": 1, "b": 2, "c": 2}


def test_upsert_idempotent_on_redelivery(spark, tmp_path):
    target = str(tmp_path / "t3")
    batch = spark.createDataFrame([("a", 1)], "id string, v int")
    upsert_parquet_by_key(batch, target, "id")
    upsert_parquet_by_key(batch, target, "id")  # redelivery
    assert spark.read.parquet(target).count() == 1


def test_upsert_recovers_from_crash_between_swap_renames(spark, tmp_path):
    """A crash after the live table was renamed aside but before the new
    one was installed must NOT lose prior batches: the next upsert
    restores `._old` and merges against it (the exactly-once contract
    the ADVICE finding flagged against the old rmtree-then-replace)."""
    import os

    target = str(tmp_path / "t4")
    first = spark.createDataFrame([("a", 1), ("b", 1)], "id string, v int")
    upsert_parquet_by_key(first, target, "id")
    # simulate the crash window: table renamed aside, new one never landed
    os.replace(target, target + "._old")
    assert not os.path.exists(target)
    second = spark.createDataFrame([("c", 2)], "id string, v int")
    upsert_parquet_by_key(second, target, "id")
    got = {r["id"]: r["v"] for r in spark.read.parquet(target).collect()}
    assert got == {"a": 1, "b": 1, "c": 2}  # batch 1 survived the crash


def test_streaming_watermarked_window(spark, tmp_path):
    """Watermarked tumbling agg runs incrementally over a file stream."""
    import datetime as dt

    from cloud_native_reddit_data_pipeline_spark.streaming.ingest import (
        streaming_tumbling_counts,
    )

    src = tmp_path / "events"
    src.mkdir()
    base = dt.datetime(2024, 1, 1)
    rows = [
        {"ts": (base + dt.timedelta(minutes=m)).isoformat(), "event_type": "click"}
        for m in (0, 10, 70)
    ]
    (src / "part1.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = (
        spark.readStream.schema("ts timestamp, event_type string")
        .json(str(src))
    )
    agg = streaming_tumbling_counts(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["win_start"].hour, r["event_type"]): r["n_events"]
        for r in spark.sql("select * from win_counts").collect()
    }
    assert got[(0, "click")] == 2
    assert got[(1, "click")] == 1


def test_checkpoint_restart_processes_only_new_files(spark, tmp_path):
    """Exactly-once across restarts: a NEW query on the same checkpoint
    must skip files the first run committed and process only arrivals —
    the recovery contract the reference's peek/ack loop approximates
    with redelivery + idempotent ids."""
    queue = str(tmp_path / "q")
    target = str(tmp_path / "t")
    ckpt = str(tmp_path / "c")

    write_queue_batch(queue, "rharvest", [json.dumps([_post(i, score=1) for i in range(5)])])
    q1 = start_upsert_stream(
        ingest_posts_stream(spark, queue), target, ckpt, key="id", available_now=True
    )
    q1.awaitTermination(120)
    assert read_bucketed_table(spark, target).count() == 5

    # new arrivals: a re-send of p0 (score=9) + brand-new p100
    write_queue_batch(
        queue, "rharvest", [json.dumps([_post(0, score=9), _post(100, score=9)])]
    )
    q2 = start_upsert_stream(
        ingest_posts_stream(spark, queue), target, ckpt, key="id", available_now=True
    )
    q2.awaitTermination(120)

    out = read_bucketed_table(spark, target)
    got = {r["id"]: r["score"] for r in out.collect()}
    assert len(got) == 6  # 5 + 1 new, no duplicates from re-reading batch 1
    # dedup state SURVIVES the restart (checkpointed state store): the
    # re-sent p0 is dropped as already-seen — exactly the reference's
    # cross-invocation Redis seen-id set (SURVEY O16/O38)
    assert got["p0"] == 1
    assert got["p100"] == 9


def test_stream_metrics_counts_rows_and_state(spark, tmp_path):
    from cloud_native_reddit_data_pipeline_spark.streaming.ingest import stream_metrics

    queue = str(tmp_path / "qm")
    target = str(tmp_path / "tm")
    ckpt = str(tmp_path / "cm")
    write_queue_batch(queue, "rharvest", [json.dumps([_post(i) for i in range(7)])])
    q = start_upsert_stream(
        ingest_posts_stream(spark, queue), target, ckpt, key="id", available_now=True
    )
    q.awaitTermination(120)
    m = stream_metrics(q)
    assert m["num_batches"] >= 1
    assert m["total_input_rows"] >= 1  # message rows entered the pipeline
    assert m["max_state_rows"] == 7  # dropDuplicates state holds the 7 seen ids
