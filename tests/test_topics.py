from __future__ import annotations

import pyspark.sql.functions as F

from cloud_native_reddit_data_pipeline_spark.operators.topics import (
    fit_topics,
    topic_names,
    widen_topics,
)


def _corpus(spark):
    from cloud_native_reddit_data_pipeline_spark.sources.tables import load

    return load(spark, "/root/testdata/sf0.001", "documents").select(
        F.col("doc_id").alias("id"), "text"
    )


def test_lda_topic_distribution_is_simplex(spark):
    docs = _corpus(spark)
    k = 4
    _, transformed = fit_topics(docs, id_col="id", text_col="text", k=k, min_df=2.0)
    wide = widen_topics(transformed, ["id"], k=k)
    rows = wide.collect()
    assert len(rows) == docs.count()
    for r in rows[:20]:
        vals = [r[f"topic_{i + 1}"] for i in range(k)]
        assert all(v >= 0 for v in vals)
        assert abs(sum(vals) - 1.0) < 1e-6


def test_topic_names_format(spark):
    docs = _corpus(spark)
    model, _ = fit_topics(docs, id_col="id", text_col="text", k=3, min_df=2.0)
    names = topic_names(model, top_n=10).collect()
    assert len(names) == 3
    for r in names:
        label, words = r["topic_name"].split(": ", 1)
        assert label == f"topic_{r['topic'] + 1}"
        assert len(words.split(" ")) == 10


def test_lda_seed_determinism(spark):
    docs = _corpus(spark)
    _, t1 = fit_topics(docs, id_col="id", text_col="text", k=3, seed=42, min_df=2.0)
    _, t2 = fit_topics(docs, id_col="id", text_col="text", k=3, seed=42, min_df=2.0)
    w1 = widen_topics(t1, ["id"], 3).orderBy("id").collect()
    w2 = widen_topics(t2, ["id"], 3).orderBy("id").collect()
    for a, b in zip(w1[:10], w2[:10]):
        for i in range(3):
            assert abs(a[f"topic_{i + 1}"] - b[f"topic_{i + 1}"]) < 1e-9


def test_reproducible_fit_bit_exact_and_partition_invariant(spark):
    from cloud_native_reddit_data_pipeline_spark.operators.topics import (
        fit_topics_reproducible,
    )

    docs = _corpus(spark)
    _, t1 = fit_topics_reproducible(docs, id_col="id", text_col="text", k=3, min_df=2.0)
    _, t2 = fit_topics_reproducible(docs, id_col="id", text_col="text", k=3, min_df=2.0)
    # upstream layout must not matter: the canonical order is internal
    _, t3 = fit_topics_reproducible(
        docs.repartition(8), id_col="id", text_col="text", k=3, min_df=2.0
    )
    w1 = widen_topics(t1, ["id"], 3).orderBy("id").collect()
    w2 = widen_topics(t2, ["id"], 3).orderBy("id").collect()
    w3 = widen_topics(t3, ["id"], 3).orderBy("id").collect()
    for a, b, c in zip(w1, w2, w3):
        for i in range(3):
            # BIT-exact, not approximately equal
            assert a[f"topic_{i + 1}"] == b[f"topic_{i + 1}"]
            assert a[f"topic_{i + 1}"] == c[f"topic_{i + 1}"]


def test_reproducible_fit_seed_is_live(spark):
    """Guards the determinism gate against vacuity: a different seed
    must actually move the distributions."""
    from cloud_native_reddit_data_pipeline_spark.operators.topics import (
        fit_topics_reproducible,
    )

    docs = _corpus(spark)
    _, t1 = fit_topics_reproducible(
        docs, id_col="id", text_col="text", k=3, seed=42, min_df=2.0
    )
    _, t2 = fit_topics_reproducible(
        docs, id_col="id", text_col="text", k=3, seed=43, min_df=2.0
    )
    w1 = widen_topics(t1, ["id"], 3).orderBy("id").collect()
    w2 = widen_topics(t2, ["id"], 3).orderBy("id").collect()
    max_diff = max(
        abs(a[f"topic_{i + 1}"] - b[f"topic_{i + 1}"])
        for a, b in zip(w1, w2)
        for i in range(3)
    )
    assert max_diff > 1e-3
