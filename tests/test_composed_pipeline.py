"""Composed EP0 -> EP1/EP2 -> EP3 pipeline (plans/composed.py): the
full harvest -> queue -> streaming upsert -> analytics chain, with
redelivered batches, must yield a duplicate-free complete store and a
consistent analytics output.  (The scale story is the
`composed_pipeline_e2e` smoke rows in BENCH_DETAIL.json.)
"""

from __future__ import annotations

from cloud_native_reddit_data_pipeline_spark.plans.composed import (
    run_composed_pipeline,
)


def test_composed_pipeline_end_to_end(spark, tmp_path):
    n = 120
    out = run_composed_pipeline(spark, str(tmp_path), n, k=3)
    # store contracts are asserted inside run_composed_pipeline
    # (duplicate-free + complete despite the redelivered tail);
    # here: the analytics slice is exactly the keyword carriers —
    # every even-numbered post (the 'coffee' half) contributes its
    # post row + 2 comments
    assert out["posts"] == n
    assert out["comments"] == 2 * n
    assert out["analysis_rows"] == (n // 2) * 3
    assert out["topic_rows"] == 3
