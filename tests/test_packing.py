"""Sequence packing: budget adherence, global-uniqueness of shard-major
pack ids, and the plan property that motivates the partitioned form —
its window is hash-partitioned (parallel), not single-partition.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from cloud_native_reddit_data_pipeline_spark.operators import packing
from cloud_native_reddit_data_pipeline_spark.sources.tables import load

SF = "/root/testdata/sf0.001"
BUDGET = 512


def _ntok(spark):
    return packing.with_token_counts(load(spark, SF, "documents"))


def test_partitioned_packing_respects_budget(spark):
    packed = packing.pack_sequences(_ntok(spark), BUDGET, n_shards=8)
    # greedy running-sum rule: a doc only joins a pack whose cumulative
    # token count before it is still under budget (a lone doc may exceed
    # the budget by itself — it can't be split)
    from pyspark.sql import Window

    w = (
        Window.partitionBy("pack_id")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bad = (
        packed.withColumn("before", F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
        .filter(F.col("before") >= BUDGET)
        .count()
    )
    assert bad == 0


def test_partitioned_pack_ids_unique_across_shards(spark):
    packed = packing.pack_sequences(_ntok(spark), BUDGET, n_shards=8)
    # (shard, local) -> pack_id must be injective: distinct pack_id
    # count equals distinct (shard, pack_id) count
    a = packed.select("pack_id").distinct().count()
    b = packed.select("shard", "pack_id").distinct().count()
    assert a == b > 0


def test_global_twin_matches_partitioned_totals(spark):
    nt = _ntok(spark)
    g = packing.pack_sequences_global(nt, BUDGET)
    p = packing.pack_sequences(nt, BUDGET, n_shards=8)
    # both assign every doc exactly once and conserve total tokens
    assert g.count() == p.count() == nt.count()
    tg = g.agg(F.sum("n_tok")).first()[0]
    tp = p.agg(F.sum("n_tok")).first()[0]
    assert tg == tp


def test_partitioned_window_is_hash_partitioned_not_single(spark):
    packed = packing.pack_sequences(_ntok(spark), BUDGET, n_shards=8)
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(shard" in plan
    assert "SinglePartition" not in plan


def test_global_form_is_single_partition_by_design(spark):
    g = packing.pack_sequences_global(_ntok(spark), BUDGET)
    plan = g._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" in plan  # documented small-data-only shape


def test_sliding_chunks_overlap_and_coverage(spark):
    from cloud_native_reddit_data_pipeline_spark.operators.packing import (
        sliding_chunks,
    )
    from cloud_native_reddit_data_pipeline_spark.sources.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents").limit(40)
    out = sliding_chunks(docs, 64, 48).collect()
    texts = {r.doc_id: (r.text or "").split() for r in docs.collect()}
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_id)
        toks = texts[doc_id]
        for r in chunks:
            want = toks[r.start_token : r.start_token + 64]
            assert r.chunk_text.split() == want  # exact slice
            assert r.n_chunk_tokens == len(want)
        # consecutive chunks overlap by 16 tokens (when both full)
        for a, b in zip(chunks, chunks[1:]):
            assert b.start_token - a.start_token == 48
        # coverage: every token index falls inside some chunk
        covered = max(r.start_token + r.n_chunk_tokens for r in chunks)
        assert covered == len(toks)


def test_length_grouped_batches_padding_bill(spark):
    from cloud_native_reddit_data_pipeline_spark.operators.packing import (
        length_grouped_batches,
    )

    # 6 docs, batch_size 2: ordered lengths 6,5,4,3,2,1
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in
         [(1, 6), (2, 5), (3, 4), (4, 3), (5, 2), (6, 1)]],
        "doc_id long, text string",
    )
    out = {r.batch_id: r for r in
           length_grouped_batches(docs, "doc_id", "text", batch_size=2).collect()}
    assert set(out) == {0, 1, 2}
    # batch 0: lengths 6,5 -> pad 1 - 11/12
    assert out[0].max_tokens == 6 and out[0].sum_tokens == 11
    assert abs(out[0].pad_frac - (1 - 11 / 12)) < 1e-5
    # batch 2: lengths 2,1 -> pad 1 - 3/4
    assert out[2].max_tokens == 2 and abs(out[2].pad_frac - 0.25) < 1e-5
    # length-grouped batching beats the id-ordered split on total pad:
    # id order would pair (6,5),(4,3),(2,1) here identically, so use a
    # shuffled length layout instead
    docs2 = spark.createDataFrame(
        [(1, " ".join(["w"] * 6)), (2, " ".join(["w"] * 1)),
         (3, " ".join(["w"] * 5)), (4, " ".join(["w"] * 2))],
        "doc_id long, text string",
    )
    grouped = {r.batch_id: r for r in
               length_grouped_batches(docs2, "doc_id", "text", batch_size=2).collect()}
    # grouped: (6,5) pad 1/12, (2,1) pad 1/4 — vs id-order (6,1):5/12, (5,2):3/10
    grouped_waste = sum(r.n_docs * r.max_tokens - r.sum_tokens
                        for r in grouped.values())
    assert grouped_waste == (12 - 11) + (4 - 3)


def test_span_corruption_roundtrip_and_grid(spark):
    """Span corruption invariants: splicing each target span back over
    its sentinel reconstructs the original token stream exactly;
    sentinels number 0..k-1 in order; mask fraction stays in the
    block-grid envelope (<= span_len/block of tokens, n_spans
    consistent with n_masked)."""
    import re

    from cloud_native_reddit_data_pipeline_spark.operators.packing import (
        span_corruption_examples,
    )
    from cloud_native_reddit_data_pipeline_spark.sources.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    out = span_corruption_examples(docs).collect()
    assert len(out) == 500
    originals = {
        r["doc_id"]: [t for t in r["text"].split() if t]
        for r in docs.select("doc_id", "text").collect()
    }
    any_masked = False
    for r in out:
        inp = r["input_text"].split() if r["input_text"] else []
        tgt = r["target_text"].split() if r["target_text"] else []
        # parse target into {sentinel: [tokens...]}
        spans, cur = {}, None
        for t in tgt:
            if re.fullmatch(r"<extra_id_\d+>", t):
                cur = t
                spans[cur] = []
            else:
                spans[cur].append(t)
        # sentinels number 0..k-1 in order
        assert list(spans) == [f"<extra_id_{i}>" for i in range(len(spans))]
        assert r["n_spans"] == len(spans)
        assert r["n_masked"] == sum(len(v) for v in spans.values())
        # round-trip: substitute each sentinel with its span
        rebuilt = []
        for t in inp:
            rebuilt.extend(spans[t] if t in spans else [t])
        assert rebuilt == originals[r["doc_id"]], r["doc_id"]
        # grid envelope: at most span_len per block of 8
        assert r["n_masked"] <= (r["n_tokens"] // 8 + 1) * 3
        if r["n_spans"] > 0:
            any_masked = True
            # short docs can mask up to a whole block's span (a
            # 3-token doc may mask all 3); the ~15% expectation is a
            # corpus-level property, not per-doc
            assert 0 < r["mask_ppm"] <= 1_000_000
    assert any_masked
