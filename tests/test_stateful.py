"""applyInPandasWithState custom stateful operator: state must carry
across micro-batches and the final emission must equal the batch
aggregate."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from cloud_native_reddit_data_pipeline_spark.streaming.stateful import (
    running_user_totals,
)


def test_state_accumulates_across_microbatches(spark, tmp_path):
    rows = [
        # (event_id, ts, user_id, value)  — user 1 appears in both batches
        (0, "2024-01-01 00:00:00", 1, 10.0),
        (1, "2024-01-01 00:01:00", 1, 5.0),
        (2, "2024-01-01 00:02:00", 2, 7.0),
        (3, "2024-01-01 01:00:00", 1, 1.0),
        (4, "2024-01-01 01:01:00", 3, 2.0),
    ]
    df = spark.createDataFrame(
        [(i, datetime.fromisoformat(t), u, v) for i, t, u, v in rows],
        "event_id long, ts timestamp, user_id long, value double",
    )
    src = str(tmp_path / "src")
    df.filter(F.col("event_id") < 3).coalesce(1).write.parquet(f"{src}/b0")
    df.filter(F.col("event_id") >= 3).coalesce(1).write.parquet(f"{src}/b1")

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*")
    )
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("stateful_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    updates = spark.table("stateful_test").collect()

    # user 1: emitted twice (both batches), final total = 16.0 over 3 events
    u1 = sorted(
        [r for r in updates if r["user_id"] == 1], key=lambda r: r["n_events"]
    )
    assert len(u1) == 2
    assert (u1[0]["n_events"], u1[0]["total_value"]) == (2, 15.0)
    assert (u1[1]["n_events"], u1[1]["total_value"]) == (3, 16.0)
    assert u1[1]["batch_rows"] == 1  # only one NEW row in batch 2

    # users seen once: single emission matching their rows
    u2 = [r for r in updates if r["user_id"] == 2]
    u3 = [r for r in updates if r["user_id"] == 3]
    assert len(u2) == 1 and (u2[0]["n_events"], u2[0]["total_value"]) == (1, 7.0)
    assert len(u3) == 1 and (u3[0]["n_events"], u3[0]["total_value"]) == (1, 2.0)
