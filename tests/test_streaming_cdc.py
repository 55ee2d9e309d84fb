"""Streaming CDC apply: upserts AND delete tombstones through the
checkpointed bucketed sink — final state must equal the batch
`relational.cdc_apply` of the same changelog, survive restarts, and be
idempotent under full redelivery."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from cloud_native_reddit_data_pipeline_spark.operators.relational import cdc_apply
from cloud_native_reddit_data_pipeline_spark.streaming.ingest import (
    read_bucketed_table,
    read_cdc_table,
    start_cdc_upsert_stream,
    write_queue_batch,
)

CDC_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)


def _stream(spark, queue):
    raw = (
        spark.readStream.schema(
            T.StructType([T.StructField("value", T.StringType(), True)])
        )
        .option("maxFilesPerTrigger", 1)
        .text(f"{queue}/topic=cdc")
    )
    return raw.select(
        F.explode(F.from_json("value", T.ArrayType(CDC_SCHEMA))).alias("r")
    ).select("r.*")


def _apply(spark, queue, target, ckpt):
    q = start_cdc_upsert_stream(
        _stream(spark, queue),
        target,
        ckpt,
        key="k",
        op_col="op",
        seq_cols=["seq"],
        available_now=True,
        n_buckets=8,
    )
    q.awaitTermination(120)


def test_cdc_stream_matches_batch_apply(spark, tmp_path):
    queue, target, ckpt = (
        str(tmp_path / "q"),
        str(tmp_path / "t"),
        str(tmp_path / "c"),
    )
    log = [
        # batch 1: create 1..4
        [dict(k=k, op="U", seq=k * 10, v=f"v{k}") for k in (1, 2, 3, 4)],
        # batch 2: update 2, delete 3, create 5
        [
            dict(k=2, op="U", seq=100, v="v2b"),
            dict(k=3, op="D", seq=101, v=None),
            dict(k=5, op="U", seq=102, v="v5"),
        ],
        # batch 3: delete 5 then re-create it (in-batch LWW on seq),
        # delete 1
        [
            dict(k=5, op="D", seq=200, v=None),
            dict(k=5, op="U", seq=201, v="v5b"),
            dict(k=1, op="D", seq=202, v=None),
        ],
    ]
    for b in log:
        write_queue_batch(queue, "cdc", [json.dumps(b)])
    _apply(spark, queue, target, ckpt)
    got = {r.k: r.v for r in read_cdc_table(spark, target).collect()}
    assert got == {2: "v2b", 4: "v4", 5: "v5b"}

    # equivalence with the batch operator over the full flattened log
    flat = spark.createDataFrame(
        [r for b in log for r in b], "k long, op string, seq long, v string"
    )
    want = {
        r.k: r.v for r in cdc_apply(flat, "k", "op", ["seq"], ["v"]).collect()
    }
    assert got == want


def test_cdc_stream_restart_and_redelivery_idempotent(spark, tmp_path):
    queue, target, ckpt = (
        str(tmp_path / "q"),
        str(tmp_path / "t"),
        str(tmp_path / "c"),
    )
    write_queue_batch(
        queue, "cdc", [json.dumps([dict(k=1, op="U", seq=1, v="a"),
                                   dict(k=2, op="U", seq=2, v="b")])]
    )
    _apply(spark, queue, target, ckpt)
    # restart on the SAME checkpoint with a delete appended
    write_queue_batch(queue, "cdc", [json.dumps([dict(k=2, op="D", seq=3, v=None)])])
    _apply(spark, queue, target, ckpt)
    got = {r.k: r.v for r in read_cdc_table(spark, target).collect()}
    assert got == {1: "a"}

    # full redelivery on a FRESH checkpoint (at-least-once worst case):
    # replaying the entire log against the existing table converges to
    # the same state
    _apply(spark, queue, target, str(tmp_path / "c2"))
    got2 = {r.k: r.v for r in read_cdc_table(spark, target).collect()}
    assert got2 == {1: "a"}


def test_cdc_tombstone_blocks_resurrection(spark, tmp_path):
    """Seq-authoritative merge: replaying an OLD upsert after a newer
    delete must NOT resurrect the key (the tombstone, with higher seq,
    wins the merge) — the property arrival-order CDC sinks get wrong."""
    queue, target = str(tmp_path / "q"), str(tmp_path / "t")
    write_queue_batch(queue, "cdc", [json.dumps([dict(k=7, op="U", seq=1, v="x"),
                                                 dict(k=7, op="D", seq=2, v=None)])])
    _apply(spark, queue, target, str(tmp_path / "c1"))
    assert read_cdc_table(spark, target).count() == 0
    # late redelivery of ONLY the old upsert, fresh checkpoint
    write_queue_batch(queue, "cdc", [json.dumps([dict(k=7, op="U", seq=1, v="x")])])
    _apply(spark, queue, target, str(tmp_path / "c2"))
    assert read_cdc_table(spark, target).count() == 0
    # tombstone is still physically present until compaction
    assert read_bucketed_table(spark, target).filter("k = 7 AND op = 'D'").count() == 1


def test_cdc_equal_seq_tie_is_deterministic(spark, tmp_path):
    """Two rows with equal (key, seq, op) but different payloads must
    resolve to the same winner on every run (stable row-hash tie-break,
    not task arrival order), and empty seq_cols is a contract error."""
    import pytest

    from cloud_native_reddit_data_pipeline_spark.streaming.ingest import (
        upsert_cdc_by_key_bucketed,
    )

    batch = spark.createDataFrame(
        [(1, "U", 5, "payload-a"), (1, "U", 5, "payload-b"), (2, "U", 1, "x")],
        "k long, op string, seq long, v string",
    )
    winners = set()
    for i in range(3):
        target = str(tmp_path / f"t{i}")
        upsert_cdc_by_key_bucketed(
            batch.repartition(4), target, key="k", seq_cols=["seq"], n_buckets=4
        )
        rows = {r.k: r.v for r in read_cdc_table(spark, target).collect()}
        winners.add(rows[1])
        assert rows[2] == "x"
    assert len(winners) == 1  # same winner every run

    with pytest.raises(ValueError, match="seq_cols"):
        upsert_cdc_by_key_bucketed(
            batch, str(tmp_path / "err"), key="k", seq_cols=[]
        )


def test_cdc_stream_wiring_requires_seq_cols(spark, tmp_path):
    """Misconfiguration must fail at stream CONSTRUCTION, not
    asynchronously inside foreachBatch on the first micro-batch."""
    from cloud_native_reddit_data_pipeline_spark.streaming.ingest import (
        start_cdc_upsert_stream,
    )

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr("value AS id", "'U' AS op", "value AS seq")
    )
    with pytest.raises(ValueError, match="seq_cols"):
        start_cdc_upsert_stream(
            stream,
            str(tmp_path / "tbl"),
            str(tmp_path / "ckpt"),
            key="id",
        )


def test_cdc_tiebreak_hash_is_column_order_stable(spark, tmp_path):
    """The (key, seq, op)-tie winner must not depend on the PHYSICAL
    column order of the batch: two batches carrying the same rows with
    payload columns in different orders must resolve identically
    (schema-evolution-stable explicit hash list, ADVICE r4)."""
    from cloud_native_reddit_data_pipeline_spark.streaming.ingest import (
        read_cdc_table,
        upsert_cdc_by_key_bucketed,
    )

    rows = [(1, "U", 5, "x", 10), (1, "U", 5, "y", 20)]
    t1, t2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    b1 = spark.createDataFrame(rows, "k int, op string, seq int, a string, b int")
    upsert_cdc_by_key_bucketed(b1, t1, key="k", seq_cols=["seq"], n_buckets=2)
    b2 = b1.select("b", "a", "k", "seq", "op")  # same rows, shuffled columns
    upsert_cdc_by_key_bucketed(b2, t2, key="k", seq_cols=["seq"], n_buckets=2)
    r1 = {tuple(sorted(r.asDict().items())) for r in read_cdc_table(spark, t1).drop("bucket").collect()}
    r2 = {tuple(sorted(r.asDict().items())) for r in read_cdc_table(spark, t2).drop("bucket").collect()}
    assert r1 == r2 and len(r1) == 1
