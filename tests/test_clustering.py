"""Structural invariants for the exact-decimal Lloyd's k-means
(`operators/clustering.py`).  Cross-engine value parity is the oracle's
job (queries.kmeans_embeddings); these tests pin the algorithmic
contracts the oracle can't see: determinism across runs, empty-cluster
centroid retention, and tie-breaking to the lowest cluster id.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cloud_native_reddit_data_pipeline_spark.operators.clustering import kmeans_lloyd
from cloud_native_reddit_data_pipeline_spark.sources.tables import load

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return load(spark, SF_SMOKE, "embeddings")


def test_every_vector_assigned_to_valid_cluster(spark, emb):
    out = kmeans_lloyd(emb, k=4, iters=1)
    n = emb.count()
    assert out.count() == n
    assert out.select("vec_id").distinct().count() == n
    bad = out.filter((F.col("cluster") < 0) | (F.col("cluster") >= 4)).count()
    assert bad == 0
    assert out.filter(F.col("dist2") < 0).count() == 0


def test_deterministic_across_runs(spark, emb):
    a = sorted(map(tuple, kmeans_lloyd(emb, k=3, iters=2).collect()))
    b = sorted(map(tuple, kmeans_lloyd(emb, k=3, iters=2).collect()))
    assert a == b


def test_identical_points_tie_break_to_cluster_zero_and_keep_empty_centroids(spark):
    # 5 identical vectors, k=3: all seeds coincide, every distance ties,
    # argmin must pick cluster 0; clusters 1 and 2 go empty and must
    # keep their previous centroids without erroring.
    rows = [(i, [0.25, -0.5, 0.125]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_lloyd(df, k=3, iters=2).collect()
    assert len(out) == 5
    assert {r["cluster"] for r in out} == {0}
    assert all(r["dist2"] == 0.0 for r in out)


def test_separated_groups_recover_clusters(spark):
    # two tight groups far apart; seeds = ids 0,1 (one in each group)
    rows = [(i, [float(10 * (i % 2)) + 0.01 * i, 1.0]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_lloyd(df, k=2, iters=3).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], set()).add(r["vec_id"] % 2)
    # each recovered cluster is pure: only even ids or only odd ids
    assert all(len(par) == 1 for par in by_cluster.values())
    assert len(by_cluster) == 2


def test_cluster_balanced_sample_equal_quota(spark):
    """Balanced-sample contract: every cluster contributes exactly the
    min-cluster-size number of rows, and selections are the md5-rank
    prefix within each cluster (RNG-free, deterministic)."""
    from collections import Counter

    from cloud_native_reddit_data_pipeline_spark.queries import _QUERIES

    rows = _QUERIES["cluster_balanced_sample"](spark, "/root/testdata/sf0.001").collect()
    per = Counter(r["cluster"] for r in rows)
    assert len(set(per.values())) == 1  # equal quota everywhere
    q = next(iter(per.values()))
    assert all(1 <= r["rk"] <= q for r in rows)
    # deterministic across reruns
    again = _QUERIES["cluster_balanced_sample"](spark, "/root/testdata/sf0.001").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
