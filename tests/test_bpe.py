"""BPE merge learning: exact agreement with an independent pure-Python
reference (merge order, pair frequencies, tie-breaks), determinism under
repartitioning, and degenerate-corpus behavior."""

from __future__ import annotations

from cloud_native_reddit_data_pipeline_spark.operators.bpe import (
    learn_bpe_merges,
    learn_bpe_merges_py,
)
from cloud_native_reddit_data_pipeline_spark.sources.tables import load

SF_SMOKE = "/root/testdata/sf0.001"


def test_bpe_matches_python_reference_on_documents(spark):
    docs = load(spark, SF_SMOKE, "documents").select("text")
    texts = [r.text for r in docs.collect()]
    got = [tuple(r) for r in learn_bpe_merges(docs, "text", n_merges=10).collect()]
    want = learn_bpe_merges_py(texts, n_merges=10)
    assert got == want


def test_bpe_deterministic_under_repartition(spark):
    docs = load(spark, SF_SMOKE, "documents").select("text")
    a = [tuple(r) for r in learn_bpe_merges(docs, "text", n_merges=6).collect()]
    b = [
        tuple(r)
        for r in learn_bpe_merges(docs.repartition(13), "text", n_merges=6).collect()
    ]
    assert a == b


def test_bpe_exhausts_small_corpus(spark):
    # one word fully merges in len(word)+1 symbols - 1 merges; the loop
    # must stop when no pairs remain instead of erroring
    df = spark.createDataFrame([("ab ab",)], "text string")
    out = [tuple(r) for r in learn_bpe_merges(df, "text", n_merges=50).collect()]
    want = learn_bpe_merges_py(["ab ab"], n_merges=50)
    assert out == want
    assert len(out) == 2  # (a,b)->ab, (ab,</w>)->ab</w>
