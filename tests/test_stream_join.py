"""Stream-stream watermarked interval join: result must equal the
equivalent batch interval join over the same rows."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from cloud_native_reddit_data_pipeline_spark.streaming.ingest import (
    streaming_interval_join,
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
