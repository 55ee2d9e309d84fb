"""Streaming PSI drift monitor (`streaming/drift.py`): the first batch
freezes the reference, later batches score against it, and crash
replay is idempotent."""

from __future__ import annotations

from cloud_native_reddit_data_pipeline_spark.streaming.drift import (
    length_buckets,
    process_drift_batch,
    psi_against_reference,
)

SCHEMA = "doc_id long, text string"


def _docs(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_first_batch_freezes_reference_and_emits_nothing(spark, tmp_path):
    out, store = str(tmp_path / "o"), str(tmp_path / "s")
    b1 = _docs(spark, [(1, "w " * 10), (2, "w " * 50)])
    process_drift_batch(spark, b1, 0, out, store)
    assert not (tmp_path / "o").exists()  # nothing scored yet
    ref = spark.read.parquet(store + "/batch=0").collect()
    assert {(r.bucket, r.n) for r in ref} == {(0, 1), (2, 1)}


def test_identical_batch_scores_near_zero_psi(spark, tmp_path):
    out, store = str(tmp_path / "o"), str(tmp_path / "s")
    rows = [(i, "w " * 30) for i in range(10)]
    process_drift_batch(spark, _docs(spark, rows), 0, out, store)
    process_drift_batch(spark, _docs(spark, rows), 1, out, store)
    got = spark.read.parquet(out).collect()
    assert len(got) == 1 and got[0].bucket == 1
    assert abs(got[0].psi_contrib) < 1e-5  # identical distributions


def test_shifted_batch_flags_drift_and_replay_is_idempotent(spark, tmp_path):
    out, store = str(tmp_path / "o"), str(tmp_path / "s")
    process_drift_batch(
        spark, _docs(spark, [(i, "w " * 10) for i in range(10)]), 0, out, store
    )
    shifted = _docs(spark, [(i, "w " * 190) for i in range(10)])
    process_drift_batch(spark, shifted, 1, out, store)
    first = sorted(
        (r.bucket, r.psi_contrib)
        for r in spark.read.parquet(out).collect()
    )
    total_psi = sum(p for _, p in first)
    assert total_psi > 0.2  # the conventional drift alarm threshold
    # crash replay: same batch id + content -> identical rows
    process_drift_batch(spark, shifted, 1, out, store)
    again = sorted(
        (r.bucket, r.psi_contrib)
        for r in spark.read.parquet(out).collect()
    )
    assert again == first


def test_psi_is_symmetric_in_contribution_signs(spark):
    ref = length_buckets(
        _docs(spark, [(1, "w " * 10), (2, "w " * 10), (3, "w " * 50)])
    )
    cur = length_buckets(
        _docs(spark, [(1, "w " * 10), (2, "w " * 50), (3, "w " * 50)])
    )
    rows = {r.bucket: r for r in psi_against_reference(cur, ref).collect()}
    # every contribution is non-negative ((pa-pb)*ln(pa/pb) >= 0)
    assert all(r.psi_contrib >= 0 for r in rows.values())
    assert rows[0].n_ref == 2 and rows[0].n_cur == 1


def test_streaming_manifest_merges_to_batch_manifest(spark, tmp_path):
    from cloud_native_reddit_data_pipeline_spark.streaming.manifest import (
        process_manifest_batch,
        read_manifest,
        shard_manifest_delta,
    )

    store = str(tmp_path / "m")
    rows = [(i, f"text number {i} with words") for i in range(1, 41)]
    full = spark.createDataFrame(rows, SCHEMA)
    b1 = spark.createDataFrame(rows[:25], SCHEMA)
    b2 = spark.createDataFrame(rows[25:], SCHEMA)
    process_manifest_batch(spark, b1, 0, store)
    process_manifest_batch(spark, b2, 1, store)
    merged = {r.shard: r for r in read_manifest(spark, store).collect()}
    batch = {r.shard: r for r in shard_manifest_delta(full).collect()}
    assert set(merged) == set(batch)
    for s in batch:
        for c in ("n_docs", "n_tokens", "min_doc_id", "max_doc_id",
                  "content_digest"):
            assert getattr(merged[s], c) == getattr(batch[s], c), (s, c)
    # crash replay: rewriting batch 1's delta changes nothing
    process_manifest_batch(spark, b2, 1, store)
    again = {r.shard: r for r in read_manifest(spark, store).collect()}
    assert {s: r.content_digest for s, r in again.items()} == {
        s: r.content_digest for s, r in merged.items()
    }
