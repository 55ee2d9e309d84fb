"""Streaming late-arrival audit (north-star extension — the
observability half of the watermark story: `streaming/ingest.py`
consumes late data, this measures HOW late the stream actually runs,
which is what you need to CHOOSE a watermark delay).

Per micro-batch, against the running high-water mark of event time
seen in EARLIER batches: how many arriving rows are late (event time
below the mark), and by how much at worst.  State is ONE timestamp per
batch snapshot; the audit row per batch is (batch, n_rows, n_late,
max_late_sec).  A real deployment feeds these rows into the
watermark-delay decision (e.g. p99 lateness + margin).

Exactly-once: audit rows and the high-water-mark snapshots are
batch-keyed idempotent overwrites; the mark read excludes the
replaying batch's own partition (the standard replay contract).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _prior_mark(
    spark: SparkSession, store_dir: str, before_batch_id: int
):
    if not os.path.isdir(store_dir) or not any(
        e.startswith("batch=") for e in os.listdir(store_dir)
    ):
        return None
    rows = (
        spark.read.parquet(store_dir)
        .filter(F.col("batch") < F.lit(int(before_batch_id)))
        .agg(F.max("mark").alias("m"))
        .collect()
    )
    return rows[0]["m"]


def lateness_batch_audit(
    batch: DataFrame, mark, ts_col: str
) -> DataFrame:
    """One audit row for a batch against the prior high-water mark
    (None for the first batch: nothing can be late yet)."""
    late = (
        F.lit(False)
        if mark is None
        else (F.col(ts_col) < F.lit(mark))
    )
    late_sec = (
        F.lit(None).cast("long")
        if mark is None
        else F.when(
            F.col(ts_col) < F.lit(mark),
            F.unix_timestamp(F.lit(mark)) - F.unix_timestamp(F.col(ts_col)),
        )
    )
    return batch.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(late.cast("long")).alias("n_late"),
        F.max(late_sec).alias("max_late_sec"),
        F.max(ts_col).alias("_batch_max"),
    )


def start_lateness_audit_stream(
    stream: DataFrame,
    out_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
):
    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        mark = _prior_mark(spark, store_dir, batch_id)
        audit = lateness_batch_audit(batch_df, mark, ts_col).collect()[0]
        new_mark = audit["_batch_max"]
        if mark is not None and (new_mark is None or new_mark < mark):
            new_mark = mark
        (
            spark.createDataFrame(
                [
                    (
                        int(batch_id),
                        audit["n_rows"],
                        audit["n_late"],
                        audit["max_late_sec"],
                    )
                ],
                "batch LONG, n_rows LONG, n_late LONG, max_late_sec LONG",
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{out_dir}/batch={int(batch_id)}")
        )
        (
            spark.createDataFrame([(new_mark,)], "mark TIMESTAMP")
            .withColumn("batch", F.lit(int(batch_id)))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{store_dir}/batch={int(batch_id)}")
        )

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
