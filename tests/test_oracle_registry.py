"""Fast parity smoke at sf0.001: a representative subset of oracle-backed
queries checked against DuckDB inside pytest (the full registry gate —
67 queries at the time of writing — is tools/parity_check.py)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod
from cloud_native_reddit_data_pipeline_spark.sources.tables import TABLES

SF_DIR = "/root/testdata/sf0.001"

SUBSET = [
    "pricing_summary",
    "filter_contains",
    "normalize_text",
    "fk_join_agg",
    "topk_per_group",
    "sentiment_relational",
    "dedup_fingerprint",
    "simhash_signatures",
    "window_tumbling",
    "session_windows",
]


@pytest.fixture(scope="module")
def ducks():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in sorted(cols):
            v = r[c]
            if isinstance(v, float):
                v = "NaN" if math.isnan(v) else round(v, 6)
            vals.append(repr(v))
        out.append("|".join(vals))
    return sorted(out)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, ducks, name):
    sdf = entrymod.queries()[name](spark, SF_DIR)
    srows = [r.asDict() for r in sdf.collect()]
    rel = ducks.sql(entrymod.oracle_sql()[name])
    orows = [dict(zip(rel.columns, r)) for r in rel.fetchall()]
    assert sorted(sdf.columns) == sorted(rel.columns)
    assert len(srows) == len(orows)
    assert _norm(srows, sdf.columns) == _norm(orows, rel.columns)


def test_every_oracle_key_has_query():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 35


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_bench_headline_queries_all_registered():
    import bench

    assert set(bench.HEADLINE) <= set(entrymod.queries())


def test_approx_distinct_within_tolerance(spark):
    from pyspark.sql import functions as F

    from cloud_native_reddit_data_pipeline_spark.sources.tables import load

    ev = load(spark, SF_DIR, "events")
    exact = ev.select(F.countDistinct("user_id").alias("n")).first()["n"]
    approx = ev.select(
        F.approx_count_distinct("user_id", rsd=0.02).alias("n")
    ).first()["n"]
    assert abs(approx - exact) / exact < 0.05  # sketch within 5% of truth


def test_parity_gate_catches_hugeint_promotion(spark, ducks):
    """Round-3 regression pin: the local parity gate must flag a DuckDB
    HUGEINT column (SUM(BIGINT) promotion) against a Spark long even
    when every value matches — the driver's hash is type-sensitive."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from parity_check import duck_type_to_canon, type_mismatches

    rel = ducks.sql("SELECT SUM(o_custkey) AS s FROM orders")
    sdf = spark.sql("SELECT CAST(42 AS BIGINT) AS s")
    tm = type_mismatches(sdf.schema, rel.columns, rel.types)
    assert tm == [("s", "int", "hugeint")]
    # and the cast fix clears it
    rel2 = ducks.sql("SELECT CAST(SUM(o_custkey) AS BIGINT) AS s FROM orders")
    assert type_mismatches(sdf.schema, rel2.columns, rel2.types) == []
    # int-width family collapses (driver-hash equivalent)
    assert duck_type_to_canon("INTEGER") == duck_type_to_canon("BIGINT")
    # but decimal widths stay exact
    assert duck_type_to_canon("DECIMAL(12,2)") != duck_type_to_canon("DECIMAL(12,4)")


def test_bench_final_json_fits_driver_tail_buffer():
    """The driver keeps only the last 2000 bytes of stdout; the final
    JSON line must parse from that tail at any query count."""
    import json

    import bench

    qs = {f"query_with_a_rather_long_name_{i:03d}": round(i * 0.37, 2) for i in range(120)}
    payload = {
        "metric": "headline_query_wall_seconds",
        "value": 123.45,
        "unit": "sec",
        "queries": qs,
        "sf": 0.1,
    }
    line = bench._emit_final_json(payload, limit=1950)
    assert len(line) <= 1950
    parsed = json.loads(line)
    assert parsed["value"] == 123.45 and parsed.get("queries_truncated") is True
    # the EXPENSIVE queries survive truncation (the cheap ones drop)
    kept = parsed["queries"]
    assert "query_with_a_rather_long_name_119" in kept
    # small payloads pass through untouched
    small = {**payload, "queries": {"q1": 1.0}}
    line2 = bench._emit_final_json(small, limit=1950)
    assert json.loads(line2)["queries"] == {"q1": 1.0}
    assert "queries_truncated" not in json.loads(line2)


def test_parity_check_rejects_decimal_outputs(spark, ducks):
    """The driver's value hash treats DECIMAL payloads as engine-specific
    (round-3 HUGEINT, round-4 agg_state_merge reds) — parity_check must
    flag ANY final-output DECIMAL column, Spark-side or oracle-side."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from parity_check import decimal_columns

    bad = spark.sql("SELECT CAST(1.5 AS DECIMAL(10,2)) AS amount, 1 AS k")
    rel = ducks.sql("SELECT CAST(1.5 AS DECIMAL(10,2)) AS amount, 1 AS k")
    hits = decimal_columns(bad.schema, rel.columns, rel.types)
    assert any("amount (spark" in h for h in hits)
    assert any("amount (oracle" in h for h in hits)
    # clean schemas pass
    good = spark.sql("SELECT CAST(15000 AS BIGINT) AS amount_e4, 1 AS k")
    grel = ducks.sql("SELECT CAST(15000 AS BIGINT) AS amount_e4, 1 AS k")
    assert decimal_columns(good.schema, grel.columns, grel.types) == []


def test_no_registered_query_emits_decimal(spark):
    """Registry-wide guard: every non-streaming queries() entry must have
    a DECIMAL-free output schema (lazy — schemas only, no execution)."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from parity_check import decimal_columns

    offenders = {}
    for name, fn in entrymod.queries().items():
        if name.startswith("streaming_") or name.startswith("ml_"):
            continue  # streams/ML materialize eagerly; covered by parity sweep
        try:
            schema = fn(spark, SF_DIR).schema
        except Exception:
            continue  # build errors are caught by the parity harness
        hits = decimal_columns(schema)
        if hits:
            offenders[name] = hits
    assert offenders == {}


def test_registry_names_unique():
    """register() must raise on duplicate names — a silent dict overwrite
    once shadowed the round-5 pii scrub (VERDICT r5 #1).  Pin both the
    guard and that both PII variants are live."""
    from cloud_native_reddit_data_pipeline_spark import queries as q

    with pytest.raises(ValueError, match="duplicate query registration"):
        q.register("pii_scrub")(lambda spark, sf_dir: None)
    assert "pii_scrub" in q._QUERIES and "pii_scrub_v2" in q._QUERIES
    assert "pii_scrub" in q._ORACLES and "pii_scrub_v2" in q._ORACLES


def test_pii_scrub_v2_matches_oracle(spark, ducks):
    name = "pii_scrub_v2"
    sdf = entrymod.queries()[name](spark, SF_DIR)
    srows = [r.asDict() for r in sdf.collect()]
    rel = ducks.sql(entrymod.oracle_sql()[name])
    orows = [dict(zip(rel.columns, r)) for r in rel.fetchall()]
    assert sorted(sdf.columns) == sorted(rel.columns)
    assert len(srows) == len(orows)
    assert _norm(srows, sdf.columns) == _norm(orows, rel.columns)


def test_json_quality_gate_taxonomy_complete(spark):
    rows = {r.verdict: r for r in entrymod.queries()["json_quality_gate"](
        spark, SF_DIR
    ).collect()}
    # every planted corruption mode is detected, plus the clean class
    assert set(rows) == {"ok", "unparseable", "missing_key", "wrong_type"}
    total = sum(r.n_events for r in rows.values())
    assert sum(r.share_ppm for r in rows.values()) <= 1_000_000
    assert rows["ok"].n_events > total // 2  # most payloads are clean


def test_epoch_shard_manifest_is_a_complete_receipt(spark):
    rows = entrymod.queries()["epoch_shard_manifest"](spark, SF_DIR).collect()
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, []).append(r)
    assert set(by_epoch) == {0, 1}
    for epoch, shards in by_epoch.items():
        n = sum(r.n_docs for r in shards)
        # every doc dealt exactly once per epoch; pos range covers 1..n
        assert min(r.min_pos for r in shards) == 1
        assert max(r.max_pos for r in shards) == n
        # digests differ across epochs (different permutations)
    d0 = {r.shard: r.order_digest for r in by_epoch[0]}
    d1 = {r.shard: r.order_digest for r in by_epoch[1]}
    assert any(d0[s] != d1.get(s) for s in d0)


def test_sft_thread_examples_invariants(spark):
    rows = entrymod.queries()["sft_thread_examples"](spark, SF_DIR).collect()
    assert rows
    per_root = {}
    for r in rows:
        per_root.setdefault(r.root_id, 0)
        per_root[r.root_id] += 1
        assert 0.0 <= r.loss_fraction <= 1.0
        assert 0 <= r.loss_tokens <= r.total_tokens
        assert r.n_turns >= 1
    # the per-thread cap: never more than 2 examples per root
    assert max(per_root.values()) <= 2
    # every one of the 8 forest roots contributes
    assert len(per_root) == 8


def test_target_encode_loo_is_leakage_free(spark):
    import duckdb

    rows = entrymod.queries()["target_encode_loo"](spark, SF_DIR).collect()
    n = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_DIR}/orders.parquet'"
    ).fetchone()[0]
    assert len(rows) == n
    # LOO: two rows of the same category with different prices must get
    # DIFFERENT encodings (each excludes its own label)
    by_cat = {}
    for r in rows:
        by_cat.setdefault(r.cat, set()).add(r.target_enc)
    assert any(len(v) > 1 for v in by_cat.values())


def test_shard_merkle_receipt_detects_tamper(spark):
    import hashlib

    rows = entrymod.queries()["shard_merkle_receipt"](spark, SF_DIR).collect()
    by_level = {}
    for r in rows:
        by_level.setdefault(r.level, {})[r.pos] = r.h
    # shape: 16 -> 8 -> 4 -> 2 -> 1
    assert [len(by_level[i]) for i in range(5)] == [16, 8, 4, 2, 1]
    # interior nodes really are md5(left || right)
    for lvl in range(1, 5):
        for pos, h in by_level[lvl].items():
            lo = by_level[lvl - 1][2 * pos]
            hi = by_level[lvl - 1][2 * pos + 1]
            assert h == hashlib.md5((lo + hi).encode()).hexdigest()
    # a verification path: changing any leaf changes the root
    root = by_level[4][0]
    tampered = hashlib.md5(("x" + by_level[0][0][1:] + by_level[0][1]).encode()).hexdigest()
    assert tampered != by_level[1][0]
    assert root == by_level[4][0]


def test_langid_confusion_fracs_sum_to_one(spark):
    rows = entrymod.queries()["langid_confusion"](spark, SF_DIR).collect()
    per_decl = {}
    for r in rows:
        per_decl.setdefault(r.declared, [0, 0.0])
        per_decl[r.declared][0] += r.n
        per_decl[r.declared][1] += r.frac
    assert sum(v[0] for v in per_decl.values()) == 500
    for decl, (_n, fsum) in per_decl.items():
        assert abs(fsum - 1.0) < 5e-4, decl


def test_funnel_latency_percentiles_ordered(spark):
    row = entrymod.queries()["funnel_latency"](spark, SF_DIR).collect()[0]
    assert row.n_converted > 0
    assert 0 < row.p50_min <= row.p90_min <= row.p95_min
