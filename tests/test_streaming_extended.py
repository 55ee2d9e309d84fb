from __future__ import annotations

import datetime as dt
import json

from cloud_native_reddit_data_pipeline_spark.streaming.ingest import (
    ingest_comments_stream,
    ingest_posts_stream_bounded,
    read_bucketed_table,
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
    out = read_bucketed_table(spark, target)
    assert out.count() == 9
    assert out.filter("p_id = 'p0'").count() == 3


def test_comment_queue_redelivery_restart_dedup(spark, tmp_path):
    """At-least-once comment queue made exactly-once across restarts,
    keyed on c_id (the reference's comment loop, addReddit.py:85-136:
    peek -> fixed ES _id upsert -> ack).  A redelivered comment in a
    later batch must be dropped by the checkpointed dedup state, and a
    new query on the same checkpoint must not re-read committed files."""
    queue = str(tmp_path / "q")
    target = str(tmp_path / "t")
    ckpt = str(tmp_path / "c")

    write_queue_batch(
        queue, "rharvestcomment", [json.dumps([_comment(i) for i in range(5)])]
    )
    q1 = start_upsert_stream(
        ingest_comments_stream(spark, queue), target, ckpt, key="c_id", available_now=True
    )
    q1.awaitTermination(120)
    assert read_bucketed_table(spark, target).count() == 5

    # redelivery of c0 with mutated score + brand-new c100
    redelivered = dict(_comment(0), score=999)
    write_queue_batch(
        queue, "rharvestcomment", [json.dumps([redelivered, _comment(100)])]
    )
    q2 = start_upsert_stream(
        ingest_comments_stream(spark, queue), target, ckpt, key="c_id", available_now=True
    )
    q2.awaitTermination(120)

    out = read_bucketed_table(spark, target)
    got = {r["c_id"]: r["score"] for r in out.collect()}
    assert len(got) == 6  # 5 + 1 new; the re-sent c0 created no duplicate
    # dedup state survives the restart: the redelivered c0 is dropped
    # as already-seen, exactly the reference's Redis seen-id semantics
    assert got["c0"] == 0
    assert got["c100"] == 100


def test_comment_post_fk_path_end_to_end(spark, tmp_path):
    """Both queues ingested, then the comment->post FK join (the
    reference keeps the pair of ES indices linked by p_id): every
    comment's parent resolves and per-post comment counts match."""
    queue = str(tmp_path / "q")
    posts = [
        {
            "author": "u",
            "created_utc": "2024-01-01T00:00:00Z",
            "id": f"p{i}",
            "num_comments": 0,
            "score": i,
            "selftext": "s",
            "subreddit": "sydney",
            "title": f"post {i}",
            "url": None,
        }
        for i in range(3)
    ]
    write_queue_batch(queue, "rharvest", [json.dumps(posts)])
    write_queue_batch(
        queue, "rharvestcomment", [json.dumps([_comment(i) for i in range(9)])]
    )
    from cloud_native_reddit_data_pipeline_spark.streaming.ingest import (
        ingest_posts_stream,
    )

    qp = start_upsert_stream(
        ingest_posts_stream(spark, queue),
        str(tmp_path / "tp"),
        str(tmp_path / "cp"),
        key="id",
        available_now=True,
    )
    qc = start_upsert_stream(
        ingest_comments_stream(spark, queue),
        str(tmp_path / "tc"),
        str(tmp_path / "cc"),
        key="c_id",
        available_now=True,
    )
    qp.awaitTermination(120)
    qc.awaitTermination(120)

    posts_tbl = read_bucketed_table(spark, str(tmp_path / "tp"))
    comments_tbl = read_bucketed_table(spark, str(tmp_path / "tc"))
    joined = comments_tbl.join(
        posts_tbl.select("id", "title"),
        comments_tbl.p_id == posts_tbl.id,
        "inner",
    )
    assert joined.count() == 9  # no orphans: every p_id resolves
    per_post = {
        r["p_id"]: r["n"]
        for r in joined.groupBy("p_id").count().withColumnRenamed("count", "n").collect()
    }
    assert per_post == {"p0": 3, "p1": 3, "p2": 3}
    # orphan check the other way: anti-join is empty
    orphans = comments_tbl.join(
        posts_tbl.select("id"), comments_tbl.p_id == posts_tbl.id, "left_anti"
    )
    assert orphans.count() == 0


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


def test_bucketed_upsert_touches_only_affected_buckets(spark, tmp_path):
    import os

    from cloud_native_reddit_data_pipeline_spark.streaming.ingest import (
        read_bucketed_table,
        upsert_parquet_by_key_bucketed,
    )

    target = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(f"k{i}", i) for i in range(200)], "id string, v int"
    )
    upsert_parquet_by_key_bucketed(base, target, "id", n_buckets=8)
    all_buckets = sorted(os.listdir(target))
    assert all(b.startswith("bucket=") for b in all_buckets)
    mtimes_before = {
        b: os.path.getmtime(os.path.join(target, b)) for b in all_buckets
    }

    import time

    time.sleep(1.1)
    # update 2 keys (same content for k1? no - new v) + insert 1 new key
    upd = spark.createDataFrame(
        [("k1", 1001), ("k2", 1002), ("knew", 42)], "id string, v int"
    )
    upsert_parquet_by_key_bucketed(upd, target, "id", n_buckets=8)

    out = read_bucketed_table(spark, target)
    got = {r["id"]: r["v"] for r in out.collect()}
    assert len(got) == 201  # 200 + 1 new, no dup keys
    assert got["k1"] == 1001 and got["k2"] == 1002 and got["knew"] == 42
    assert got["k0"] == 0  # untouched rows intact

    # buckets not containing k1/k2/knew were not rewritten
    mtimes_after = {
        b: os.path.getmtime(os.path.join(target, b))
        for b in sorted(os.listdir(target))
    }
    untouched = [
        b for b in all_buckets if mtimes_after[b] == mtimes_before[b]
    ]
    assert len(untouched) >= 5  # 3 keys hit at most 3 of 8 buckets


def test_bucketed_read_ignores_and_repairs_crash_leftovers(spark, tmp_path):
    """A crash can leave `bucket=N._old` / `bucket=N._tmp_write` siblings
    next to live bucket dirs (or a bucket present ONLY as `._old`, if the
    swap died mid-rename).  Readers must never see those as data — a bare
    `bucket=*` glob would — and opening the table must repair ALL of
    them, not just buckets a later batch happens to touch."""
    import os
    import shutil

    from cloud_native_reddit_data_pipeline_spark.streaming.ingest import (
        upsert_parquet_by_key_bucketed,
    )

    target = str(tmp_path / "tbl")
    base = spark.createDataFrame([(f"k{i}", i) for i in range(200)], "id string, v int")
    upsert_parquet_by_key_bucketed(base, target, "id", n_buckets=8)
    buckets = sorted(os.listdir(target))
    assert len(buckets) == 8

    # crash type 1: swap completed but backup never dropped -> stale dup rows
    shutil.copytree(os.path.join(target, buckets[0]), os.path.join(target, buckets[0] + "._old"))
    # crash type 2: tmp write finished (or not) but swap never ran
    shutil.copytree(os.path.join(target, buckets[1]), os.path.join(target, buckets[1] + "._tmp_write"))
    # crash type 3: live dir renamed aside, new dir never installed
    os.replace(os.path.join(target, buckets[2]), os.path.join(target, buckets[2] + "._old"))

    out = read_bucketed_table(spark, target)
    got = {r["id"]: r["v"] for r in out.collect()}
    assert len(got) == 200  # no duplicates from ._old/._tmp_write, no lost bucket
    assert got["k0"] == 0

    # the sweep repaired the layout on disk, table-wide
    names = sorted(os.listdir(target))
    assert names == buckets  # ._old restored as live, leftovers removed


def test_daily_counts_materialized_view_incremental(spark, tmp_path):
    """The streaming aggregate table must equal the batch recomputation
    after each incremental update."""
    import datetime as dt
    import json as _json

    from cloud_native_reddit_data_pipeline_spark.streaming.ingest import (
        start_daily_counts_stream,
    )

    src = tmp_path / "ev"
    src.mkdir()
    target = str(tmp_path / "daily")
    ckpt = str(tmp_path / "ck")
    base = dt.datetime(2024, 3, 1)

    def _write(name, day_offsets):
        rows = [
            {"ts": (base + dt.timedelta(days=d, minutes=i)).isoformat()}
            for i, d in enumerate(day_offsets)
        ]
        (src / name).write_text("\n".join(_json.dumps(r) for r in rows))

    _write("b0.json", [0, 0, 1])
    stream = spark.readStream.schema("ts timestamp").json(str(src))
    q = start_daily_counts_stream(stream, target, ckpt, available_now=True)
    q.awaitTermination(120)
    got = {r["day"].day: r["n_events"] for r in spark.read.parquet(target).collect()}
    assert got == {1: 2, 2: 1}

    # second batch updates day 1 and adds day 3; only touched keys change
    _write("b1.json", [0, 2, 2])
    stream2 = spark.readStream.schema("ts timestamp").json(str(src))
    q2 = start_daily_counts_stream(stream2, target, ckpt, available_now=True)
    q2.awaitTermination(120)
    got = {r["day"].day: r["n_events"] for r in spark.read.parquet(target).collect()}
    assert got == {1: 3, 2: 1, 3: 2}


def test_streaming_session_window_append_emits_watermark_closed_sessions(
    spark, tmp_path
):
    """Append mode with two micro-batches: the second batch's watermark
    (max event time of batch 1, delay 0) must close and emit every
    batch-1 session, while the in-flight batch-2 sessions stay in state.
    This is the contract queries.streaming_session_windows relies on."""
    import os

    src = tmp_path / "ev2"
    src.mkdir()
    base = dt.datetime(2024, 1, 1)

    def _rows(specs):
        return "\n".join(
            json.dumps(
                {"ts": (base + dt.timedelta(minutes=m)).isoformat(), "user_id": u}
            )
            for m, u in specs
        )

    # batch 0: user1 session (0,10 -> ends 40min), user2 session (0 -> ends 30min)
    (src / "p0.json").write_text(_rows([(0, 1), (10, 1), (0, 2)]))
    # batch 1: user1 at 120min, user3 at 130min -> watermark 130min closes batch-0
    # sessions; these two stay in state (never emitted in append mode)
    (src / "p1.json").write_text(_rows([(120, 1), (130, 3)]))
    # file-stream order is mtime-based: force p0 strictly older
    t = os.path.getmtime(src / "p1.json")
    os.utime(src / "p0.json", (t - 10, t - 10))

    stream = (
        spark.readStream.schema("ts timestamp, user_id long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    agg = streaming_session_counts(stream, gap="30 minutes", watermark="0 seconds")
    q = (
        agg.writeStream.format("memory")
        .queryName("sessions_append")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"], r["session_end"]): r["n_events"]
        for r in spark.sql("select * from sessions_append").collect()
    }
    exp_end_u1 = base + dt.timedelta(minutes=40)
    exp_end_u2 = base + dt.timedelta(minutes=30)
    assert got == {
        (1, base, exp_end_u1): 2,
        (2, base, exp_end_u2): 1,
    }
