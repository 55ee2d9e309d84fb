from __future__ import annotations

import datetime as dt
import json

from cloud_native_reddit_data_pipeline_spark.streaming.ingest import (
    ingest_comments_stream,
    ingest_posts_stream_bounded,
    start_upsert_stream,
    streaming_session_counts,
    write_queue_batch,
)


def _comment(i):
    return {
        "created_utc": "2024-01-01T00:00:00Z",
        "p_id": f"p{i % 3}",
        "c_id": f"c{i}",
        "body": f"comment {i}",
        "subreddit": "sydney",
        "title": "parent",
        "score": i,
    }


def test_comment_stream_ingest(spark, tmp_path):
    queue = str(tmp_path / "q")
    target = str(tmp_path / "t")
    write_queue_batch(queue, "rharvestcomment", [json.dumps([_comment(i) for i in range(6)])])
    write_queue_batch(queue, "rharvestcomment", [json.dumps([_comment(i) for i in range(4, 9)])])
    stream = ingest_comments_stream(spark, queue)
    q = start_upsert_stream(stream, target, str(tmp_path / "c"), key="c_id", available_now=True)
    q.awaitTermination(120)
    out = spark.read.parquet(target)
    assert out.count() == 9
    assert out.filter("p_id = 'p0'").count() == 3


def test_bounded_dedup_stream(spark, tmp_path):
    queue = str(tmp_path / "q2")
    posts = [
        {
            "author": "u",
            "created_utc": "2024-01-01T00:00:00Z",
            "id": f"p{i % 4}",  # 8 docs, 4 distinct ids
            "num_comments": 0,
            "score": i,
            "selftext": "s",
            "subreddit": "sydney",
            "title": "t",
            "url": None,
        }
        for i in range(8)
    ]
    write_queue_batch(queue, "rharvest", [json.dumps(posts)])
    stream = ingest_posts_stream_bounded(spark, queue, watermark="24 hours")
    q = (
        stream.writeStream.format("memory")
        .queryName("bounded_dedup")
        .option("checkpointLocation", str(tmp_path / "c2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select id from bounded_dedup").collect()
    assert sorted(r["id"] for r in got) == ["p0", "p1", "p2", "p3"]


def test_streaming_session_window(spark, tmp_path):
    src = tmp_path / "ev"
    src.mkdir()
    base = dt.datetime(2024, 1, 1)
    rows = [
        {"ts": (base + dt.timedelta(minutes=m)).isoformat(), "user_id": 1}
        for m in (0, 10, 120)  # two sessions for user 1 (gap 30m)
    ] + [{"ts": base.isoformat(), "user_id": 2}]
    (src / "p.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = spark.readStream.schema("ts timestamp, user_id long").json(str(src))
    agg = streaming_session_counts(stream, gap="30 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {}
    for r in spark.sql("select * from sessions").collect():
        got.setdefault(r["user_id"], []).append(r["n_events"])
    assert sorted(got[1]) == [1, 2]
    assert got[2] == [1]
