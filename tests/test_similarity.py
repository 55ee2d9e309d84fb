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


def test_pq_codes_in_range_and_deterministic(spark):
    from cloud_native_reddit_data_pipeline_spark.sources.tables import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    a = similarity.pq_encode(emb, m=4, k=16).collect()
    assert len(a) == emb.count()
    for r in a:
        for s in range(4):
            assert 0 <= r[f"code{s}"] < 16
    b = similarity.pq_encode(emb, m=4, k=16).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pq_seed_vectors_encode_to_own_code(spark):
    """Each seed vector's subvector is distance-0 from its own codebook
    entry, so seeds must encode to their own seed index in every
    subspace (ties with duplicate seeds break to the lower code)."""
    rows = [(i, [float(i), float(i * 2), -float(i), 0.5 * i]) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in similarity.pq_encode(df, m=2, k=4).collect()}
    for i in range(4):  # the 4 seeds
        assert out[i]["code0"] == i and out[i]["code1"] == i


def test_pq_adc_recall_vs_exact_l2(spark):
    """ADC over 16 seed codes approximates squared-L2 ranking; on real
    embeddings the top-5 should overlap the exact cosine top-5 poorly or
    well, but every returned neighbor must be a real corpus row and each
    query gets exactly 5 ranked ascending."""
    from cloud_native_reddit_data_pipeline_spark.sources.tables import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    out = similarity.pq_adc_topk(emb, [0, 1], m=4, k=16, topk=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1}
    ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rows] == [1, 2, 3, 4, 5]
        assert all(r["adc_e12"] >= 0 for r in rows)
        dists = [r["adc_e12"] for r in rows]
        assert dists == sorted(dists)
        assert all(r["neighbor_id"] in ids and r["neighbor_id"] != q for r in rows)


def test_label_centroid_similarity_structure(spark):
    from cloud_native_reddit_data_pipeline_spark.operators.similarity import (
        label_centroid_similarity,
    )
    from cloud_native_reddit_data_pipeline_spark.sources.tables import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    n_labels = emb.select("label").distinct().count()
    out = label_centroid_similarity(emb).collect()
    assert len(out) == n_labels * (n_labels - 1) // 2  # upper triangle
    for r in out:
        assert r.l1 < r.l2
        assert -1.0 - 1e-6 <= r.centroid_cos <= 1.0 + 1e-6


def test_int8_quantize_bounds(spark):
    from cloud_native_reddit_data_pipeline_spark.operators.similarity import (
        int8_quantize,
    )
    from cloud_native_reddit_data_pipeline_spark.sources.tables import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    out = int8_quantize(emb).collect()
    assert out
    for r in out:
        assert all(-127 <= c <= 127 for c in r.q8)
        if r.max_abs > 0:
            # reconstruction error bound: half a quantization step
            assert r.max_recon_err <= 0.5 * r.max_abs / 127 + 1e-6


def test_ivf_pq_full_probe_equals_pq_adc(spark):
    """With n_probe = n_centroids every cell is probed, so the IVF
    prefilter admits the whole corpus and IVF-PQ must equal plain PQ
    ADC exactly — isolating the probe logic from the scoring."""
    import random

    from cloud_native_reddit_data_pipeline_spark.operators.similarity import (
        ivf_pq_topk,
        pq_adc_topk,
    )

    rng = random.Random(5)
    rows = [
        (i, [round(rng.gauss(0, 1), 4) for _ in range(16)]) for i in range(64)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qids = [40, 41]
    full = {
        (r["query_id"], r["rk"]): (r["neighbor_id"], r["adc_e12"])
        for r in ivf_pq_topk(
            df, qids, n_centroids=4, n_probe=4, m=4, k=8, topk=5
        ).collect()
    }
    plain = {
        (r["query_id"], r["rk"]): (r["neighbor_id"], r["adc_e12"])
        for r in pq_adc_topk(df, qids, m=4, k=8, topk=5).collect()
    }
    assert full == plain and len(full) == 10


def test_ivf_pq_partial_probe_subsets_candidates(spark):
    """With a single probed cell, every returned neighbor must belong to
    the query's nearest cell — the probe actually prunes."""
    import random

    from cloud_native_reddit_data_pipeline_spark.operators.similarity import (
        ivf_pq_topk,
    )

    rng = random.Random(9)
    rows = [
        (i, [round(rng.gauss(0, 1), 4) for _ in range(16)]) for i in range(64)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = ivf_pq_topk(df, [50], n_centroids=4, n_probe=1, m=4, k=8, topk=50)
    got = {r["neighbor_id"] for r in out.collect()}
    assert 0 < len(got) < 63  # pruned: strictly fewer than the corpus


def test_rrf_fuse_semantics(spark):
    """RRF arithmetic: shared docs get both reciprocal terms, leg-only
    docs one; ranking orders by fused score with id tie-break."""
    from cloud_native_reddit_data_pipeline_spark.operators.similarity import (
        rrf_fuse,
    )

    lex = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id int, rank int")
    vec = spark.createDataFrame([(2, 1), (4, 2), (1, 3)], "doc_id int, rank int")
    out = {
        r["doc_id"]: (r["rrf_score"], r["n_legs"], r["rank"])
        for r in rrf_fuse([lex, vec], k=10, c=60).collect()
    }
    assert out[2] == (round(1 / 62 + 1 / 61, 6), 2, 1)  # best fused
    assert out[1] == (round(1 / 61 + 1 / 63, 6), 2, 2)
    assert out[3][1] == 1 and out[4][1] == 1  # single-leg docs survive
    assert out[3][2] > out[1][2]


def test_margin_bitext_mine_hubness_and_determinism(spark):
    """A hub vector close to everything must be demoted by the margin
    normalization, and a genuine near-translation pair must surface
    with margin > 1; repeated runs are bit-identical."""
    import pyspark.sql.functions as F

    from cloud_native_reddit_data_pipeline_spark.operators.similarity import (
        margin_bitext_mine,
    )

    def v(*xs):
        return list(map(float, xs))

    # side A: a0 pairs cleanly with b0; a2 is generic
    a = spark.createDataFrame(
        [(0, v(10, 0, 0, 1)), (2, v(1, 1, 1, 1)), (4, v(0, 8, 0, 1))],
        "vec_id long, embedding array<double>",
    )
    # side B: b1 ~ a0's translation; b3 is a HUB (uniform, close to all)
    b = spark.createDataFrame(
        [(1, v(9.5, 0.4, 0, 1)), (3, v(1, 1, 1, 1.01)), (5, v(0.2, 7.5, 0.5, 1))],
        "vec_id long, embedding array<double>",
    )
    out = {r.id_a: r for r in margin_bitext_mine(
        a, b, k=2, margin_threshold=0.0
    ).collect()}
    assert out[0].id_b == 1 and out[0].margin > 1.0   # true pair wins
    assert out[4].id_b == 5 and out[4].margin > 1.0
    # the hub b3 is a2's raw-cosine favourite AND its mined partner,
    # but margin normalization caps its score near 1 (its neighborhood
    # average is as high as any single match)
    assert out[2].margin < out[0].margin
    again = {r.id_a: r for r in margin_bitext_mine(
        a, b, k=2, margin_threshold=0.0
    ).collect()}
    assert all(tuple(out[k]) == tuple(again[k]) for k in out)


def test_hard_negative_topk_excludes_same_label(spark):
    """Hard negatives are ranked by cosine among DIFFERENT-label rows
    only; the most similar same-label row never appears."""
    from cloud_native_reddit_data_pipeline_spark.operators.similarity import (
        hard_negative_topk,
    )

    rows = [
        (0, [1.0, 0.0], 0),   # query, label 0
        (1, [1.0, 0.01], 0),  # near-identical but SAME label -> excluded
        (2, [0.9, 0.1], 1),   # closest different-label
        (3, [0.0, 1.0], 1),   # orthogonal different-label
        (4, [0.5, 0.5], 2),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = hard_negative_topk(df, [0], k=2).collect()
    assert [r.neighbor_id for r in out] == [2, 4]
    assert all(r.neighbor_label != r.query_label for r in out)
    assert [r.rk for r in out] == [1, 2]


def test_retrieval_eval_metrics_hand_case(spark):
    """recall/MRR/nDCG on a hand-checkable 2-query case."""
    from cloud_native_reddit_data_pipeline_spark.operators.similarity import (
        _dcg_discount_literals,
        retrieval_eval_metrics,
    )

    # q1: approx got the true #1 at rank 2, one miss at rank 3
    approx = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 99, 3),
         (2, 20, 1), (2, 98, 2), (2, 97, 3)],
        "query_id long, neighbor_id long, rk int",
    )
    exact = spark.createDataFrame(
        [(1, 11, 1), (1, 10, 2), (1, 12, 3),
         (2, 21, 1), (2, 22, 2), (2, 23, 3)],
        "query_id long, neighbor_id long, rk int",
    )
    out = {r.query_id: r for r in
           retrieval_eval_metrics(approx, exact, k=3).collect()}
    d = _dcg_discount_literals(3)
    idcg = d[1] + d[2] + d[3]
    assert (out[1].n_overlap, out[1].recall_at_k) == (2, round(2 / 3, 4))
    assert out[1].mrr == 0.5                      # true #1 found at rank 2
    assert out[1].ndcg_at_k == round((d[1] + d[2]) / idcg + 1e-9, 4)
    # q2: only approx rank-1 is relevant (exact rank... none match)
    assert (out[2].n_overlap, out[2].mrr, out[2].ndcg_at_k) == (0, 0.0, 0.0)


def test_jl_project_matches_numpy(spark):
    import numpy as np

    from cloud_native_reddit_data_pipeline_spark.functions.vectors import (
        make_planes,
    )
    from cloud_native_reddit_data_pipeline_spark.operators.similarity import (
        jl_project,
    )

    vecs = [(i, [float((i * 7 + j) % 11) - 5.0 for j in range(8)]) for i in range(5)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = {r.vec_id: list(r.proj) for r in
           jl_project(emb, out_dim=3, seed=7, in_dim=8).collect()}
    planes = np.array(make_planes(8, 3, seed=7))
    for i, v in vecs:
        want = planes @ np.array(v)
        assert np.allclose(out[i], want, atol=1e-9)
    assert all(len(p) == 3 for p in out.values())


def _emb64(spark):
    # 64-dim corpus for the sign-bit sketch family: 0 and 10 share all
    # signs; 2 flips exactly the first 3 dims; 3 flips dims 33..64.
    base = [1.0 if i % 2 == 0 else -1.0 for i in range(64)]
    flip3 = [-x if i < 3 else x for i, x in enumerate(base)]
    fliphi = [-x if i >= 32 else x for i, x in enumerate(base)]
    rows = [
        (0, base),
        (10, [x * 0.5 for x in base]),  # same signs, scaled
        (2, flip3),
        (3, fliphi),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_sign_bit_pack_words(spark):
    out = {r["vec_id"]: (r["w_lo"], r["w_hi"]) for r in
           similarity.sign_bit_pack(_emb64(spark)).collect()}
    # base signs: + at even 0-based dims -> bits 0,2,4,... set = 0x55555555
    assert out[0] == (0x55555555, 0x55555555)
    assert out[10] == out[0]  # scaling never changes a sign
    # flip3 flips 0-based dims 0..2: bits 0 and 2 clear, bit 1 set
    assert out[2][0] == (0x55555555 ^ 0b111) and out[2][1] == 0x55555555
    # fliphi flips the whole high word
    assert out[3] == (0x55555555, 0x55555555 ^ 0xFFFFFFFF)


def test_hamming_topk_orders_by_bit_distance(spark):
    rows = sorted(
        similarity.hamming_topk(_emb64(spark), [0], k=3).collect(),
        key=lambda r: r["rk"],
    )
    assert [r["neighbor_id"] for r in rows] == [10, 2, 3]
    assert [r["hamming"] for r in rows] == [0, 3, 32]


def test_hamming_rerank_rescores_with_cosine(spark):
    rows = sorted(
        similarity.hamming_rerank_topk(_emb64(spark), [0], k=3, shortlist=3).collect(),
        key=lambda r: r["rk"],
    )
    # the scaled twin wins on cosine (1.0), and every shortlist row
    # carries both its hamming and its exact rescored cosine
    assert rows[0]["neighbor_id"] == 10 and rows[0]["cos"] == 1.0
    assert all(r["hamming"] is not None for r in rows)
    assert [r["rk"] for r in rows] == [1, 2, 3]


def test_ivf_cell_stats_partitions_the_corpus(spark):
    from cloud_native_reddit_data_pipeline_spark.sources.tables import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    rows = similarity.ivf_cell_stats(emb, n_centroids=8).collect()
    n = emb.count()
    assert sum(r.n_vecs for r in rows) == n
    assert all(0 <= r.cell < 8 for r in rows)
    for r in rows:
        assert r.share_ppm == (1_000_000 * r.n_vecs) // n
        assert r.load_pct_of_mean == (100 * r.n_vecs * 8) // n


def test_mmr_rerank_promotes_diverse_candidate(spark):
    # A top; B a near-duplicate of A with mid relevance; C orthogonal
    # with lower relevance.  Pure relevance: A,B,C.  MMR: B's duplicate
    # penalty (cos=1) drops it below C.
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [1.0, 0.0, 0.0, 0.0]),
            (3, [0.0, 1.0, 0.0, 0.0]),
        ],
        "doc_id long, embedding array<double>",
    )
    cands = spark.createDataFrame(
        [(1, 1.0), (2, 0.6), (3, 0.5)], "doc_id long, rel double"
    )
    out = sorted(
        similarity.mmr_rerank(cands, emb, k=3, lam=0.75).collect(),
        key=lambda r: r.mmr_rank,
    )
    assert [r.doc_id for r in out] == [1, 3, 2]
    # step scores: A = .75*1.0; C = .75*.5 - .25*0; B = .75*.6 - .25*1
    assert abs(out[0].mmr_score - 0.75) < 1e-6
    assert abs(out[1].mmr_score - 0.375) < 1e-6
    assert abs(out[2].mmr_score - 0.2) < 1e-6


def test_embedding_isotropy_identity_hand_cases(spark):
    """The O(n) sum-vector identity must reproduce the brute-force mean
    pairwise cosine: identical vectors -> 1.0; an orthogonal pair ->
    0.0; a mixed set -> the hand-computed mean."""
    from cloud_native_reddit_data_pipeline_spark.queries import (
        embedding_isotropy_audit_q,
    )
    import tempfile, os

    def run(vecs):
        with tempfile.TemporaryDirectory() as tmp:
            df = spark.createDataFrame(
                [(i, v, 0) for i, v in enumerate(vecs)],
                "vec_id long, embedding array<float>, label int",
            )
            df.coalesce(1).write.parquet(f"{tmp}/embeddings.parquet")
            return embedding_isotropy_audit_q(spark, tmp).collect()[0]

    r = run([[1.0, 0.0], [1.0, 0.0], [1.0, 0.0]])
    assert r["n_vectors"] == 3
    assert abs(r["mean_norm"] - 1.0) < 1e-3
    assert abs(r["avg_pairwise_cos"] - 1.0) < 1e-4

    r = run([[1.0, 0.0], [0.0, 1.0]])
    assert abs(r["avg_pairwise_cos"] - 0.0) < 1e-4

    # mixed: u1=(1,0), u2=(0,1), u3=(1,0) -> pairs cos: (u1,u2)=0,
    # (u1,u3)=1, (u2,u3)=0 -> mean over 3 unordered pairs = 1/3
    r = run([[2.0, 0.0], [0.0, 5.0], [3.0, 0.0]])
    assert abs(r["avg_pairwise_cos"] - (1.0 / 3.0)) < 1e-4
