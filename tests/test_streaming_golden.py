"""Streaming golden-record maintenance (streaming/golden.py): CDC
upserts + per-batch survivorship refresh.

Hand-computed fixture: one 3-member cluster ("alpha a?" names, pairwise
levenshtein 1) + one singleton.  Keeper = highest score (id 2); modal
fields flip when an upsert changes a member's value.  Redelivering the
same update batch must be a value-identical no-op (at-least-once
delivery converges through the keyed upsert).
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from cloud_native_reddit_data_pipeline_spark.operators import dedup
from cloud_native_reddit_data_pipeline_spark.streaming.golden import (
    refresh_golden_records,
    start_golden_record_maintenance,
)
from cloud_native_reddit_data_pipeline_spark.streaming.ingest import (
    read_bucketed_table,
    upsert_parquet_by_key_bucketed,
)

SCHEMA = "rid long, name string, brand string, tier string, score long"
BASE = [
    (1, "alpha aa", "B1", "T1", 5),
    (2, "alpha ab", "B2", "T1", 9),  # keeper: highest score
    (3, "alpha ac", "B2", "T2", 7),
    (4, "zeta zz", "B7", "T7", 1),  # singleton: no edges, no golden row
]
# the update: member 3 flips brand B2 -> B1, so modal brand flips B2 -> B1
UPDATE = [(3, "alpha ac", "B1", "T2", 7)]


def _edges_fn(recs):
    blk = F.split(F.col("name"), " ").getItem(0)
    return dedup.blocked_entity_edges(
        recs, "rid", "name", blk, max_distance=2, max_block_names=64
    )


def _run_stream(spark, usrc, store, golden_dir, tmp_path):
    q = start_golden_record_maintenance(
        spark,
        usrc,
        SCHEMA,
        store,
        golden_dir,
        str(tmp_path / f"ckpt_{uuid.uuid4().hex[:8]}"),
        "rid",
        ["brand", "tier"],
        "score",
        _edges_fn,
        n_buckets=4,
    )
    q.awaitTermination(120)


def test_maintenance_applies_upsert_and_refreshes_golden(spark, tmp_path):
    store, golden_dir = str(tmp_path / "store"), str(tmp_path / "golden")
    usrc = str(tmp_path / "updates")
    upsert_parquet_by_key_bucketed(
        spark.createDataFrame(BASE, SCHEMA), store, "rid", n_buckets=4
    )
    spark.createDataFrame(UPDATE, SCHEMA).coalesce(1).write.parquet(usrc)
    _run_stream(spark, usrc, store, golden_dir, tmp_path)

    rows = spark.read.parquet(golden_dir).collect()
    assert len(rows) == 1  # the singleton has no edges, hence no golden row
    g = rows[0]
    # hand-computed: cluster {1,2,3}, keeper = id 2 (score 9),
    # brands after upsert = {B1, B2, B1} -> modal B1 (flipped by the
    # update); tiers = {T1, T1, T2} -> modal T1
    assert g["keeper_id"] == 2
    assert g["n_members"] == 3
    assert g["golden_brand"] == "B1"
    assert g["golden_tier"] == "T1"
    # the store holds the upserted value, exactly once per key
    store_rows = {r["rid"]: r for r in read_bucketed_table(spark, store).collect()}
    assert len(store_rows) == 4
    assert store_rows[3]["brand"] == "B1"


def test_redelivery_is_value_identical_noop(spark, tmp_path):
    """At-least-once delivery: replaying the SAME update batch through a
    fresh stream leaves both the store and the golden table unchanged."""
    store, golden_dir = str(tmp_path / "store"), str(tmp_path / "golden")
    upsert_parquet_by_key_bucketed(
        spark.createDataFrame(BASE, SCHEMA), store, "rid", n_buckets=4
    )
    usrc1 = str(tmp_path / "updates1")
    spark.createDataFrame(UPDATE, SCHEMA).coalesce(1).write.parquet(usrc1)
    _run_stream(spark, usrc1, store, golden_dir, tmp_path)
    first = sorted(map(tuple, spark.read.parquet(golden_dir).collect()))
    n_store = read_bucketed_table(spark, store).count()

    usrc2 = str(tmp_path / "updates2")  # the redelivery
    spark.createDataFrame(UPDATE, SCHEMA).coalesce(1).write.parquet(usrc2)
    _run_stream(spark, usrc2, store, golden_dir, tmp_path)
    again = sorted(map(tuple, spark.read.parquet(golden_dir).collect()))
    assert again == first
    assert read_bucketed_table(spark, store).count() == n_store


def test_maintained_golden_equals_batch_rule_over_final_store(spark, tmp_path):
    """The maintenance loop's output IS the batch golden_records rule
    applied to the final store (the sweep gate's contract, pinned here
    against the operator directly)."""
    store, golden_dir = str(tmp_path / "store"), str(tmp_path / "golden")
    usrc = str(tmp_path / "updates")
    upsert_parquet_by_key_bucketed(
        spark.createDataFrame(BASE, SCHEMA), store, "rid", n_buckets=4
    )
    spark.createDataFrame(UPDATE, SCHEMA).coalesce(1).write.parquet(usrc)
    _run_stream(spark, usrc, store, golden_dir, tmp_path)

    records = read_bucketed_table(spark, store)
    batch = dedup.golden_records(
        dedup.connected_components(_edges_fn(records)),
        records, "rid", ["brand", "tier"], "score",
    )
    assert sorted(map(tuple, spark.read.parquet(golden_dir).collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_refresh_is_atomic_write_aside(spark, tmp_path):
    """A crash during the golden rewrite must leave the PREVIOUS golden
    table readable (write-aside + swap, same contract as the upsert)."""
    store, golden_dir = str(tmp_path / "store"), str(tmp_path / "golden")
    upsert_parquet_by_key_bucketed(
        spark.createDataFrame(BASE, SCHEMA), store, "rid", n_buckets=4
    )
    refresh_golden_records(
        spark, store, golden_dir, "rid", ["brand", "tier"], "score", _edges_fn
    )
    before = sorted(map(tuple, spark.read.parquet(golden_dir).collect()))

    def crashing_edges(recs):
        raise RuntimeError("simulated crash mid-refresh")

    with pytest.raises(RuntimeError, match="simulated crash"):
        refresh_golden_records(
            spark, store, golden_dir, "rid", ["brand", "tier"], "score",
            crashing_edges,
        )
    assert sorted(map(tuple, spark.read.parquet(golden_dir).collect())) == before
