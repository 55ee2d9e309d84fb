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
