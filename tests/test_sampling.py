"""Sampling + history operators: determinism, exact-k, interval chaining.

These are pure functions of the row keys (no RNG), so the tests assert
bit-stable re-runs and partitioning invariance — the properties that make
the operators safe to re-run incrementally at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cloud_native_reddit_data_pipeline_spark.operators.relational import scd2_history
from cloud_native_reddit_data_pipeline_spark.operators.sampling import (
    priority_sample_per_group,
    temperature_mixture_sample,
)
from cloud_native_reddit_data_pipeline_spark.operators.textstats import (
    unigram_divergence,
)
from cloud_native_reddit_data_pipeline_spark.sources.tables import load

SF_SMOKE = "/root/testdata/sf0.001"


def _docs(spark):
    return load(spark, SF_SMOKE, "documents")


def test_mixture_sample_deterministic_and_capped(spark):
    docs = _docs(spark)
    a = temperature_mixture_sample(docs, "source", "doc_id", alpha=0.5, budget=100)
    b = temperature_mixture_sample(
        docs.repartition(7), "source", "doc_id", alpha=0.5, budget=100
    )
    ra = sorted(r.doc_id for r in a.collect())
    rb = sorted(r.doc_id for r in b.collect())
    assert ra == rb and len(ra) > 0
    # keep rate is a probability
    assert a.filter((F.col("keep_rate") < 0) | (F.col("keep_rate") > 1.0 + 1e-9)).count() == 0


def test_mixture_alpha_flattens(spark):
    """alpha=0 gives every source the same target mass -> small sources are
    kept at higher rates than under natural (alpha=1) sampling."""
    docs = _docs(spark)
    flat = temperature_mixture_sample(docs, "source", "doc_id", alpha=0.0, budget=200)
    nat = temperature_mixture_sample(docs, "source", "doc_id", alpha=1.0, budget=200)
    # natural sampling keeps every source at the same rate (budget/N)
    nat_rates = {r.source: r.keep_rate for r in nat.select("source", "keep_rate").distinct().collect()}
    assert len(set(nat_rates.values())) == 1
    flat_rates = {r.source: r.keep_rate for r in flat.select("source", "keep_rate").distinct().collect()}
    counts = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    smallest = min(counts, key=counts.get)
    biggest = max(counts, key=counts.get)
    if counts[smallest] < counts[biggest] and smallest in flat_rates and biggest in flat_rates:
        assert flat_rates[smallest] >= flat_rates[biggest]


def test_priority_sample_exact_k(spark):
    docs = _docs(spark)
    k = 5
    out = priority_sample_per_group(docs, "source", "doc_id", k=k)
    per_group = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    sizes = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for g, n in per_group.items():
        assert n == min(k, sizes[g])
    # deterministic under repartition
    again = priority_sample_per_group(docs.repartition(11), "source", "doc_id", k=k)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_scd2_intervals_chain(spark):
    ev = load(spark, SF_SMOKE, "events")
    hist = scd2_history(ev, "user_id", "ts", "event_type", "event_id").collect()
    by_user: dict[int, list] = {}
    for r in hist:
        by_user.setdefault(r.user_id, []).append(r)
    for user, rows in by_user.items():
        rows.sort(key=lambda r: r.version)
        # exactly one open (current) interval per user, and it is the last
        assert [r.is_current for r in rows].count(True) == 1
        assert rows[-1].is_current and rows[-1].valid_to is None
        for prev, nxt in zip(rows, rows[1:]):
            assert prev.valid_to == nxt.valid_from  # gapless chain
            assert prev.event_type != nxt.event_type  # real change points
            assert nxt.version == prev.version + 1


def test_unigram_divergence_bounds(spark):
    docs = _docs(spark)
    out = unigram_divergence(docs, "source", "text").collect()
    assert len(out) > 0
    for r in out:
        assert r.kl_to_corpus >= -1e-6  # KL >= 0 (tiny float slack)
        assert -1e-6 <= r.tv_to_corpus <= 1.0 + 1e-6
        assert r.n_tokens > 0 and r.vocab_size > 0


def test_weighted_sample_matches_python_formula(spark):
    import hashlib
    import math
    from decimal import Decimal

    from cloud_native_reddit_data_pipeline_spark.operators.sampling import (
        weighted_priority_sample,
    )
    from cloud_native_reddit_data_pipeline_spark.sources.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    rows = {r.doc_id: r.n_chars for r in docs.select("doc_id", "n_chars").collect()}

    def es_key(doc_id, w):
        v = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
        u = (v + 0.5) / 16**8
        return Decimal(-math.log(u) / w).quantize(Decimal("1e-12"))

    want = sorted(rows, key=lambda d: (es_key(d, rows[d]), d))[:20]
    got = [
        r.doc_id
        for r in weighted_priority_sample(docs, "doc_id", "n_chars", k=20)
        .orderBy("sample_rank")
        .collect()
    ]
    assert got == want
