from __future__ import annotations

import math

from cloud_native_reddit_data_pipeline_spark.operators import similarity


def _emb(spark):
    # vec 0 and 10 nearly parallel; others orthogonal-ish
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (10, [0.99, 0.01, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [0.5, 0.5, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_brute_force_topk_orders_by_cosine(spark):
    out = similarity.brute_force_topk(_emb(spark), [0], k=3)
    rows = sorted(out.collect(), key=lambda r: r["rk"])
    assert rows[0]["neighbor_id"] == 10  # nearly parallel
    assert rows[1]["neighbor_id"] == 4  # 45 degrees
    assert abs(rows[1]["cos"] - math.cos(math.pi / 4)) < 1e-3
    assert rows[0]["query_id"] == 0 and len(rows) == 3


def test_lsh_topk_candidates_subset_of_corpus(spark):
    out = similarity.lsh_topk(_emb(spark), [0], k=3, n_planes=4, bands=4)
    rows = out.collect()
    assert all(r["neighbor_id"] != 0 for r in rows)
    # with 4 bands of 1 bit each, the near-parallel vector must share a band
    assert any(r["neighbor_id"] == 10 for r in rows)


def test_ivf_topk_assigns_cells_and_ranks(spark):
    # centroids = vec_id < 2 -> cells around e_x (0) and e_y (2 maps to its own)
    out = similarity.ivf_topk(_emb(spark), [0], k=3, n_centroids=3, n_probe=1)
    rows = sorted(out.collect(), key=lambda r: r["rk"])
    # probe 1 cell: only vectors assigned to centroid 0's cell are candidates;
    # the near-parallel vector 10 must be in it and rank first
    assert rows and rows[0]["neighbor_id"] == 10
    assert all(r["query_id"] == 0 for r in rows)
    assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))


def test_ivf_recall_vs_exact(spark):
    from cloud_native_reddit_data_pipeline_spark.sources.tables import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(emb, [0, 1], k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ivf_topk(emb, [0, 1], k=5, n_centroids=8, n_probe=4).collect()
    }
    assert len(exact & approx) / len(exact) >= 0.3


def test_lsh_recall_at_scale_sample(spark):
    """LSH top-k should recover most of the exact top-k on real data."""
    from cloud_native_reddit_data_pipeline_spark.sources.tables import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(emb, [0, 1], k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.lsh_topk(emb, [0, 1], k=5, n_planes=8, bands=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3  # sanity floor: buckets genuinely prune
