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
    """Cache-discipline gate: after a store verb returns, no PERSIST
    pin may remain registered — a leaked persist survives the session
    and degrades every later query (bench.py measured 3x historically;
    caching.py documents the policy).  localCheckpoint results are
    exempt BY DESIGN: they are ContextCleaner-managed blocks reclaimed
    asynchronously once the result frame is garbage-collected (the
    exact mechanism materialize_and_release relies on), so they are
    filtered out rather than raced."""
    import gc
    import time

    sc = spark.sparkContext

    def _pinned() -> list[str]:
        rdds = sc._jsc.sc().getPersistentRDDs()
        it = rdds.iterator()
        out = []
        while it.hasNext():
            rdd = it.next()._2()
            if not rdd.isLocallyCheckpointed():
                out.append(rdd.toString())
        return out

    # one GC pass gives in-flight unpersists a chance to land
    for _ in range(8):
        gc.collect()
        sc._jvm.System.gc()
        pins = _pinned()
        if not pins:
            return
        time.sleep(0.25)
    raise AssertionError(
        f"cache not idle{' after ' + where if where else ''}: "
        f"{len(pins)} persist pin(s): {pins[:3]}"
    )
