"""Structured Streaming ingest — EP1+EP2 of the reference collapsed
into one streaming query (SURVEY.md section 3): file-queue JSON batches ->
explicit-schema parse (O22) -> stateful dedup (O16/O38) -> idempotent
keyed upsert (O8/O37), on a processing-time trigger (O35).

The reference's delivery contract is at-least-once (Redis peek ->
process -> lrem-ack, addReddit.py:29-82) made idempotent by fixed ES
`_id`s.  Structured Streaming's checkpoint gives exactly-once *source*
tracking; the keyed-upsert sink (`upsert_parquet_by_key`) makes the
end-to-end pipeline exactly-once — strictly stronger.

The "queue" is a directory of JSON-lines files partitioned by topic
(`topic=rharvest/...`), mirroring the reference's topic-keyed Redis
lists (O7/O36: enqueue.py:32,45).  On a real deployment this is
Kafka/Kinesis; the plan shape is identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.reddit import COMMENT_SCHEMA, POST_SCHEMA, explode_batches

QUEUE_MESSAGE_SCHEMA = T.StructType([T.StructField("value", T.StringType(), True)])


def write_queue_batch(path: str, topic: str, messages: list[str]) -> None:
    """Producer side (O7: LPUSH json.dumps(batch)): append JSON-lines
    messages under the topic partition dir."""
    tdir = os.path.join(path, f"topic={topic}")
    os.makedirs(tdir, exist_ok=True)
    import uuid

    fname = os.path.join(tdir, f"batch-{uuid.uuid4().hex}.json")
    with open(fname, "w") as f:
        for m in messages:
            f.write(m.replace("\n", " ") + "\n")


def read_queue_stream(spark: SparkSession, path: str, topic: str) -> DataFrame:
    """Consumer side (O5: queue micro-batch read).  Topic routing (O36)
    becomes partition pruning on `topic=` — unselected topics are never
    read."""
    return (
        spark.readStream.format("text")
        .schema(QUEUE_MESSAGE_SCHEMA)
        .option("maxFilesPerTrigger", 32)  # rate cap, O26/O39 analogue
        .load(os.path.join(path, f"topic={topic}"))
    )


def ingest_posts_stream(spark: SparkSession, queue_path: str, topic: str = "rharvest") -> DataFrame:
    """Streaming post ingest: parse batches -> explode docs -> quarantine
    malformed -> stateful dropDuplicates on the key (the reference's
    Redis seen-id set, O16/O38 — unbounded state, faithful; swap to
    dropDuplicatesWithinWatermark to bound it at scale)."""
    raw = read_queue_stream(spark, queue_path, topic)
    docs = explode_batches(raw, "value", POST_SCHEMA)
    good = docs.filter(~F.col("_corrupt")).drop("_corrupt")
    return good.dropDuplicates(["id"])


def ingest_comments_stream(
    spark: SparkSession, queue_path: str, topic: str = "rharvestcomment"
) -> DataFrame:
    """Streaming comment ingest — the second queue list of the reference
    (addReddit.py:85-136), keyed on c_id."""
    raw = read_queue_stream(spark, queue_path, topic)
    docs = explode_batches(raw, "value", COMMENT_SCHEMA)
    return docs.filter(~F.col("_corrupt")).drop("_corrupt").dropDuplicates(["c_id"])


def ingest_posts_stream_bounded(
    spark: SparkSession,
    queue_path: str,
    topic: str = "rharvest",
    watermark: str = "24 hours",
) -> DataFrame:
    """The scale-correct variant of ingest_posts_stream: dedup state is
    bounded by an event-time watermark (dropDuplicatesWithinWatermark)
    instead of growing forever like the reference's Redis seen-id set
    (SURVEY.md O38: no TTL, no watermark)."""
    raw = read_queue_stream(spark, queue_path, topic)
    docs = explode_batches(raw, "value", POST_SCHEMA)
    good = docs.filter(~F.col("_corrupt")).drop("_corrupt")
    return good.withWatermark("created_utc", watermark).dropDuplicatesWithinWatermark(
        ["id"]
    )


def dedup_within_watermark(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    """Watermark-BOUNDED streaming dedup (the generic form of
    ingest_posts_stream_bounded): a redelivery is dropped only while the
    first occurrence's state lives, i.e. until the event-time watermark
    passes first_ts + delay; after eviction the same key is emitted
    again.  This is the state-bounded trade the unbounded
    dropDuplicates (the reference's Redis seen-id set, SURVEY O38)
    refuses to make — state is O(keys-within-delay), not O(all keys
    ever seen)."""
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)


def streaming_session_counts(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming sessionization with the native session_window operator —
    state closes `gap` after the last event once the watermark passes.
    The batch gaps-and-islands equivalent (oracle-checked) is
    operators.windows.session_windows_gaps."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.session_window(F.col("ts"), gap).alias("sess"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_interval_join(
    left_stream: DataFrame,
    right_stream: DataFrame,
    key: str = "user_id",
    within: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join: a right-side event
    matches a left-side event of the same key when it lands within
    [left.ts, left.ts + within].

    Both the equality key AND the time-range predicate are required at
    scale: the range bound + watermark lets Spark expire join state
    (without it, both sides buffer forever).  State is partitioned by
    the key — the only shuffle either stream pays per micro-batch.

    ``how="leftOuter"`` adds the unmatched-left story (clicks that
    never converted): a left row whose join window [ts, ts + within]
    closes under the watermark with no match is emitted once, with
    null right-side columns.  The null row CANNOT be emitted eagerly —
    a match may still arrive until the watermark passes the window end
    — so outer results trail the watermark by up to
    ``within + watermark``; that delayed state-expiry emit is exactly
    the machinery the inner form never touches."""
    lw = left_stream.withWatermark("ts", watermark).alias("l")
    rw = right_stream.withWatermark("ts", watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col("r.ts") >= F.col("l.ts"))
        & (F.col("r.ts") <= F.col("l.ts") + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond, how).select(
        F.col(f"l.{key}").alias(key),
        F.col("l.event_id").alias("left_event_id"),
        F.col("l.ts").alias("left_ts"),
        F.col("r.event_id").alias("right_event_id"),
        F.col("r.ts").alias("right_ts"),
        F.col("r.value").alias("right_value"),
    )


def streaming_interval_join_outer(
    left_stream: DataFrame,
    right_stream: DataFrame,
    key: str = "user_id",
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Left-outer form of :func:`streaming_interval_join` — see its
    docstring for the unmatched-left / watermark-expiry semantics."""
    return streaming_interval_join(
        left_stream, right_stream, key=key, within=within, watermark=watermark,
        how="leftOuter",
    )


def _recover_dir(target_dir: str) -> None:
    """Crash recovery for the swap below: if a previous swap renamed the
    live table aside (`._old`) and died before installing the new one,
    restore it, so no batch ever merges against an empty table.  Also
    drops a stale `._tmp_write` leftover — either the write died midway
    (dir is incomplete) or the swap never ran (dir is complete but its
    batch will be redelivered by the streaming checkpoint and the upsert
    is idempotent), so deleting is safe in both cases."""
    import shutil

    old = target_dir.rstrip("/") + "._old"
    tmp = target_dir.rstrip("/") + "._tmp_write"
    if os.path.exists(old):
        if not os.path.exists(target_dir):
            os.replace(old, target_dir)
        else:
            shutil.rmtree(old)  # swap completed; leftover backup
    if os.path.exists(tmp):
        shutil.rmtree(tmp)


def _sweep_bucketed_table(target_dir: str) -> None:
    """Crash-leftover sweep for a bucketed table: recover EVERY bucket
    with a `._old` backup or stale `._tmp_write`, not just buckets the
    current batch happens to touch.  Without this, a reader could keep
    seeing a crashed bucket's stale state indefinitely (nothing else
    would ever clean it if no later batch hashed into that bucket)."""
    if not os.path.isdir(target_dir):
        return
    bases = set()
    for name in os.listdir(target_dir):
        if name.endswith("._old"):
            bases.add(name[: -len("._old")])
        elif name.endswith("._tmp_write"):
            bases.add(name[: -len("._tmp_write")])
        elif name == "_tmp_batch":  # crashed single-job batch write
            import shutil

            shutil.rmtree(os.path.join(target_dir, name), ignore_errors=True)
    for b in bases:
        _recover_dir(os.path.join(target_dir, b))


def _swap_dir(tmp: str, target_dir: str) -> None:
    """Install `tmp` as `target_dir` without a lost-table crash window:
    rename the live table aside, install the new one, then drop the
    backup.  Each step is a single atomic rename; a crash between them
    leaves either the old table live or the old table at `._old`, which
    `_recover_dir` restores on the next batch — never an empty target.
    (On a real deployment this whole swap is Delta `MERGE INTO` /
    Iceberg commit; this is the filesystem equivalent of their
    metadata pointer flip.)"""
    import shutil

    old = target_dir.rstrip("/") + "._old"
    if os.path.exists(target_dir):
        os.replace(target_dir, old)
    os.replace(tmp, target_dir)
    if os.path.exists(old):
        shutil.rmtree(old)


def upsert_parquet_by_key(batch_df: DataFrame, target_dir: str, key: str) -> None:
    """Idempotent keyed upsert into a parquet table (O8: ES
    index(id=...) upsert; O37 ack semantics).

    New rows win over existing rows with the same key (last-writer-wins
    like ES re-index); implemented as read-existing -> anti-join -> keep +
    append via full rewrite + crash-safe directory swap (`_swap_dir`).
    Cost is O(table) per batch — `upsert_parquet_by_key_bucketed` (the
    `start_upsert_stream` default) rewrites only touched buckets."""
    spark = batch_df.sparkSession
    _recover_dir(target_dir)
    batch = batch_df.dropDuplicates([key])
    if os.path.exists(target_dir):
        existing = spark.read.parquet(target_dir)
        keep = existing.join(batch.select(key), key, "left_anti")
        merged = keep.unionByName(batch)
    else:
        merged = batch
    tmp = target_dir.rstrip("/") + "._tmp_write"
    merged.write.mode("overwrite").parquet(tmp)
    _swap_dir(tmp, target_dir)


def upsert_parquet_by_key_bucketed(
    batch_df: DataFrame, target_dir: str, key: str, n_buckets: int = 64
) -> None:
    """Scale path for the keyed upsert: the table is laid out as
    `bucket=N/` partitions (N = hash(key) mod n_buckets) and a batch
    rewrites ONLY the buckets its keys hash into — cost is
    O(touched_buckets / n_buckets * table), not O(table) like the plain
    `upsert_parquet_by_key` rewrite.  With n_buckets sized so a bucket
    fits an executor, per-batch upsert cost is flat no matter how big
    the table grows (the same contract Delta MERGE gets from file-level
    pruning on a clustered key).

    ALL touched buckets merge in ONE Spark job: existing rows of the
    touched buckets are read in a single partition-pruned scan,
    anti-joined against the batch keys (keys never cross buckets, so one
    corpus-wide anti-join is per-bucket-exact), and written to a single
    `_tmp_batch` tree partitioned by bucket; installation is then one
    atomic rename per bucket.  A per-bucket driver loop of
    read+join+write jobs would pay full job-scheduling latency times
    touched buckets — measured 60x slower at 64 buckets."""
    spark = batch_df.sparkSession
    bucket_of = F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")
    _sweep_bucketed_table(target_dir)  # recover ALL crashed buckets, not just touched
    # persist: the plan below consumes the batch twice (bucket discovery
    # + merge) — without it each action re-executes the whole upstream
    # streaming plan, including the stateful dedup operator
    batch = batch_df.dropDuplicates([key]).withColumn("bucket", bucket_of).persist()
    try:
        touched = [r["bucket"] for r in batch.select("bucket").distinct().collect()]
        existing_dirs = [
            os.path.join(target_dir, f"bucket={b}")
            for b in touched
            if os.path.exists(os.path.join(target_dir, f"bucket={b}"))
        ]
        if existing_dirs:
            existing = spark.read.option("basePath", target_dir).parquet(
                *existing_dirs
            )
            merged = existing.join(batch.select(key), key, "left_anti").unionByName(
                batch
            )
        else:
            merged = batch
        tmp_root = os.path.join(target_dir, "_tmp_batch")
        # repartition by bucket: exactly one task owns each bucket, so
        # each batch adds ONE file per touched bucket — without it every
        # write task sprays a file into every bucket dir (tasks x buckets
        # small files per batch, a compaction disaster at scale)
        merged.repartition(F.col("bucket")).write.partitionBy("bucket").mode(
            "overwrite"
        ).parquet(tmp_root)
        for b in touched:
            src = os.path.join(tmp_root, f"bucket={b}")
            _swap_dir(src, os.path.join(target_dir, f"bucket={b}"))
        import shutil

        shutil.rmtree(tmp_root, ignore_errors=True)
    finally:
        batch.unpersist()


def read_bucketed_table(spark: SparkSession, target_dir: str) -> DataFrame:
    """Read a bucketed upsert target back as one table (the `bucket=`
    partition column is pruned away).

    Reads ONLY directories named exactly `bucket=<digits>` — a bare
    `bucket=*` glob would also match crash leftovers (`bucket=N._old`,
    `bucket=N._tmp_write`) and silently show duplicate or stale rows.
    The sweep first repairs any such leftovers table-wide."""
    import re

    _sweep_bucketed_table(target_dir)
    bucket_dirs = [
        os.path.join(target_dir, name)
        for name in sorted(os.listdir(target_dir))
        if re.fullmatch(r"bucket=\d+", name)
    ]
    if not bucket_dirs:
        raise FileNotFoundError(f"no bucket=N directories under {target_dir}")
    return (
        spark.read.option("basePath", target_dir).parquet(*bucket_dirs).drop("bucket")
    )


def start_upsert_stream(
    stream_df: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    key: str = "id",
    trigger_seconds: int | None = 60,
    available_now: bool = False,
    n_buckets: int | None = 64,
):
    """Wire the ingest stream to the upsert sink via foreachBatch, with
    the reference's 60s cadence (O35: fission cron '@every 60s') as the
    processing-time trigger.  `available_now=True` drains the backlog
    and stops — used by tests.

    The sink defaults to the bucketed layout (`bucket=N/` partitions,
    per-batch cost O(touched buckets) — flat in table size, the only
    viable shape beyond toy scale; read it back with
    `read_bucketed_table`).  Pass `n_buckets=None` to opt out into the
    plain single-directory layout, whose per-batch rewrite is O(table)
    — acceptable only for small reference tables."""
    if n_buckets:
        sink = lambda bdf, _bid: upsert_parquet_by_key_bucketed(  # noqa: E731
            bdf, target_dir, key, n_buckets
        )
    else:
        sink = lambda bdf, _bid: upsert_parquet_by_key(bdf, target_dir, key)  # noqa: E731
    writer = stream_df.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def start_daily_counts_stream(
    events_stream: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
    available_now: bool = False,
):
    """Incrementally-maintained aggregate table (streaming materialized
    view): watermarked daily counts flow in UPDATE mode into a keyed
    upsert, so each micro-batch rewrites only the day keys it touched
    and the parquet table always equals the batch recomputation.  The
    pattern the reference's full-corpus reprocessing job approximates
    by refitting everything per run (redditProcessor.py:56-156)."""
    daily = (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("day"), "n_events")
    )
    writer = (
        daily.writeStream.outputMode("update")
        .foreachBatch(lambda bdf, _bid: upsert_parquet_by_key(bdf, target_dir, "day"))
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_metrics(query) -> dict:
    """Operational metrics from a (finished or running) streaming query:
    rows ingested, batches, per-batch rates, and stateful-operator
    memory — the observability surface the reference got from
    `fission fn log` + RedisInsight (README.md:76-87), here from
    Structured Streaming's progress events.  At scale these numbers
    drive alerting (watermark lag, state growth, batch duration)."""
    progresses = [p for p in query.recentProgress if p is not None]
    total_rows = sum(int(p.get("numInputRows", 0)) for p in progresses)
    state_rows = 0
    for p in progresses:
        for op in p.get("stateOperators", []) or []:
            state_rows = max(state_rows, int(op.get("numRowsTotal", 0)))
    return {
        "num_batches": len(progresses),
        "total_input_rows": total_rows,
        "max_state_rows": state_rows,
        "last_batch_duration_ms": (
            progresses[-1].get("batchDuration") if progresses else None
        ),
    }


def streaming_tumbling_counts(events_stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window aggregation — the late-data policy the
    reference lacks entirely (SURVEY.md O38 note)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n_events")
    )


def upsert_cdc_by_key_bucketed(
    batch_df: DataFrame,
    target_dir: str,
    key: str,
    op_col: str = "op",
    seq_cols: list[str] = (),
    n_buckets: int = 64,
) -> None:
    """CDC twin of `upsert_parquet_by_key_bucketed`: the batch is a
    changelog carrying an op column and a monotone sequence — upserts
    replace, deletes are TOMBSTONES (the semantics the reference's ES
    upserts lack; `operators/relational.cdc_apply` is the batch twin).

    Conflict resolution is SEQ-AUTHORITATIVE, not arrival-order: the
    union of stored rows and batch rows collapses to the max-seq row
    per key, and tombstones are PERSISTED in the table (filtered out by
    `read_cdc_table`).  That makes the sink correct under micro-batch
    reordering, redelivery, and late-arriving old ops — an old upsert
    can never resurrect a deleted key, because the tombstone (with its
    higher seq) is still there to win the merge.  This is the
    log-compaction contract (Kafka compacted topics / LSM tombstones);
    a compaction pass may drop tombstones older than the redelivery
    horizon (not needed at test scale, noted for 100 TB).

    Same scale shape as the plain bucketed upsert: one partition-pruned
    scan of touched buckets, one per-key window over (existing + batch)
    rows of those buckets only, one write tree, atomic installs."""
    from pyspark.sql import Window

    spark = batch_df.sparkSession
    if not seq_cols:
        # op-only ordering silently loses last-writer-wins (ADVICE r3)
        raise ValueError(
            "upsert_cdc_by_key_bucketed requires seq_cols: without a "
            "monotone sequence the merge cannot order conflicting ops"
        )
    _sweep_bucketed_table(target_dir)
    bucket_of = F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")
    batch = batch_df.withColumn("bucket", bucket_of).persist()
    try:
        touched = [r["bucket"] for r in batch.select("bucket").distinct().collect()]
        existing_dirs = [
            os.path.join(target_dir, f"bucket={b}")
            for b in touched
            if os.path.exists(os.path.join(target_dir, f"bucket={b}"))
        ]
        if existing_dirs:
            existing = spark.read.option("basePath", target_dir).parquet(
                *existing_dirs
            )
            unioned = existing.unionByName(batch)
        else:
            unioned = batch
        # final tie-break: a stable hash over an EXPLICIT column list —
        # key + seq + op first, then payload columns sorted by name —
        # so two distinct rows with equal (key, seq, op) but different
        # payloads resolve to a deterministic winner (ADVICE r3), and
        # the winner does not drift if the physical column order or the
        # column set evolves between the stored table and a batch
        # (ADVICE r4).  Map-typed payloads are unhashable and excluded.
        from pyspark.sql import types as T

        lead = [key, *seq_cols, op_col]
        by_name = {f.name: f.dataType for f in unioned.schema.fields}
        payload = sorted(
            c
            for c in unioned.columns
            if c not in {*lead, "bucket"}
            and not isinstance(by_name[c], T.MapType)
        )
        row_hash = F.xxhash64(*[F.col(c) for c in lead + payload])
        w = Window.partitionBy(key).orderBy(
            *[F.col(c).desc() for c in seq_cols],
            F.col(op_col).asc(),
            row_hash.asc(),
        )
        merged = (
            unioned.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .drop("_rk")
        )
        tmp_root = os.path.join(target_dir, "_tmp_batch")
        merged.repartition(F.col("bucket")).write.partitionBy("bucket").mode(
            "overwrite"
        ).parquet(tmp_root)
        for b in touched:
            src = os.path.join(tmp_root, f"bucket={b}")
            _swap_dir(src, os.path.join(target_dir, f"bucket={b}"))
        import shutil

        shutil.rmtree(tmp_root, ignore_errors=True)
    finally:
        batch.unpersist()


def read_cdc_table(
    spark: SparkSession,
    target_dir: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Live view of a CDC bucketed table: persisted tombstones filtered
    out, op column dropped."""
    return (
        read_bucketed_table(spark, target_dir)
        .filter(F.col(op_col) != delete_op)
        .drop(op_col)
    )


def start_cdc_upsert_stream(
    changelog_stream: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    key: str = "id",
    op_col: str = "op",
    seq_cols: list[str] = (),
    trigger_seconds: int | None = 60,
    available_now: bool = False,
    n_buckets: int = 64,
):
    """Wire a changelog stream (rows carrying an op column) to the CDC
    bucketed sink via checkpointed foreachBatch — exactly-once apply of
    upserts AND deletes; redelivered batches are idempotent (last-op-
    wins against identical content).

    `seq_cols` is REQUIRED and validated here, at stream construction —
    a misconfigured stream must fail at wiring time, not asynchronously
    inside foreachBatch on the first micro-batch (ADVICE r4)."""
    if not seq_cols:
        raise ValueError(
            "start_cdc_upsert_stream requires seq_cols: without a "
            "monotone sequence the merge cannot order conflicting ops"
        )
    sink = lambda bdf, _bid: upsert_cdc_by_key_bucketed(  # noqa: E731
        bdf, target_dir, key, op_col, seq_cols, n_buckets
    )
    writer = changelog_stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
