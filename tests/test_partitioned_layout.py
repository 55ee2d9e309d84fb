"""Partitioned table layout: writes partitioned by a filter column must
prune at read time (PartitionFilters), so a predicate on the partition
key skips whole directories — at 100 TB this is the difference between
scanning one topic and scanning the lake."""

from __future__ import annotations

import pyspark.sql.functions as F

from cloud_native_reddit_data_pipeline_spark.sources.tables import load

SF = "/root/testdata/sf0.001"


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    target = str(tmp_path / "events_by_type")
    load(spark, SF, "events").write.partitionBy("event_type").parquet(target)

    df = spark.read.parquet(target).filter(F.col("event_type") == "click")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan
    # the data filter list must be EMPTY: the partition predicate was
    # pruned at planning time, not evaluated per row
    import re

    m = re.search(r"DataFilters: \[(.*?)\]", plan)
    assert m is not None and m.group(1) == ""

    # round-trip correctness: the pruned read returns exactly the
    # partition's rows
    want = load(spark, SF, "events").filter(F.col("event_type") == "click").count()
    assert df.count() == want > 0
