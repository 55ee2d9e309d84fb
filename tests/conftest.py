from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from cloud_native_reddit_data_pipeline_spark.session import build_session

    spark = build_session("cnrdp-tests", cpus=4, shuffle_partitions=4)
    yield spark
    spark.stop()


def assert_cache_idle(spark, where: str = "") -> None:
    """Cache-discipline gate: after a store verb returns, NO persisted
    RDD may remain registered — a leaked pin survives the session and
    degrades every later query (bench.py measured 3x historically;
    caching.py documents the policy).  localCheckpoint results don't
    count: they are executor-local blocks the ContextCleaner reclaims
    once the DataFrame is garbage-collected, not CacheManager entries
    — but they DO appear in getPersistentRDDs until collected, so we
    force a GC-driven cleanup pass first."""
    import gc

    gc.collect()
    sc = spark.sparkContext
    sc._jvm.System.gc()
    # the Python ContextCleaner queue drains asynchronously; poll briefly
    import time

    for _ in range(40):
        n = sc._jsc.sc().getPersistentRDDs().size()
        if n == 0:
            return
        time.sleep(0.25)
        gc.collect()
        sc._jvm.System.gc()
    raise AssertionError(
        f"cache not idle{' after ' + where if where else ''}: "
        f"{sc._jsc.sc().getPersistentRDDs().size()} persistent RDD(s) pinned"
    )
