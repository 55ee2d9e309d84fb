"""Bucketed-table co-located join: pre-bucketing both sides on the join
key removes BOTH exchanges from the join — the storage-layout lever for
repeated large-scale joins (at 100 TB, re-shuffling the fact table per
query is the dominant cost; bucketing pays it once at write time)."""

from __future__ import annotations

import pyspark.sql.functions as F

from cloud_native_reddit_data_pipeline_spark.sources.tables import load

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # tables land in the session's spark-warehouse dir (gitignored);
    # dropped in the finally block
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS ord_bkt")

    load(spark, SF, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    ).write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable(
        "li_bkt"
    )
    load(spark, SF, "orders").select(
        "o_orderkey", "o_orderpriority"
    ).write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable(
        "ord_bkt"
    )

    li = spark.table("li_bkt")
    o = spark.table("ord_bkt")
    # disable broadcast so the join would otherwise be a shuffle join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself reads bucketed scans directly: no shuffle on
        # either input (the only exchange allowed is the final group-by's)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS li_bkt")
        spark.sql("DROP TABLE IF EXISTS ord_bkt")
