"""WordPiece learning + greedy encoding: exact agreement with an
independent pure-Python reference, objective sanity (likelihood vs
frequency argmax genuinely differ), determinism, and the three-way
tokenizer fertility comparison."""

from __future__ import annotations

from pyspark.sql import functions as F

from cloud_native_reddit_data_pipeline_spark.operators.wordpiece import (
    learn_wordpiece_merges,
    learn_wordpiece_py,
    wordpiece_encode_stats,
    wordpiece_vocab,
)
from cloud_native_reddit_data_pipeline_spark.sources.tables import load

SF_SMOKE = "/root/testdata/sf0.001"


def test_wordpiece_matches_python_reference(spark):
    docs = load(spark, SF_SMOKE, "documents").select("text")
    texts = [r.text for r in docs.collect()]
    got = [tuple(r) for r in learn_wordpiece_merges(docs, "text", n_merges=12).collect()]
    want = learn_wordpiece_py(texts, n_merges=12)
    assert got == want


def test_wordpiece_objective_differs_from_bpe(spark):
    """The likelihood-gain argmax must not just replay frequency order:
    on this corpus the first WordPiece merge differs from the first BPE
    merge (rare-symbol pairs with high mutual information win)."""
    from cloud_native_reddit_data_pipeline_spark.operators.bpe import (
        learn_bpe_merges_py,
    )

    docs = load(spark, SF_SMOKE, "documents").select("text")
    texts = [r.text for r in docs.collect()]
    wp = learn_wordpiece_py(texts, n_merges=6)
    bpe = learn_bpe_merges_py(texts, n_merges=6)
    assert [(m[1], m[2]) for m in wp] != [(m[1], m[2]) for m in bpe]


def test_wordpiece_encode_walk_covers_words(spark):
    """Greedy longest-match walk: every distinct word encodes with at
    least one and at most len(word)+1 pieces (chars + end marker),
    and doc aggregates are consistent."""
    docs = load(spark, SF_SMOKE, "documents")
    vocab = wordpiece_vocab(docs, "text", n_merges=12)
    enc = wordpiece_encode_stats(docs, "doc_id", "text", vocab)
    rows = enc.collect()
    assert len(rows) == 500
    for r in rows:
        assert r["n_wp_tokens"] >= r["n_words"]  # >= 1 piece per word
        assert float(r["chars_per_wp_token"]) > 0


def test_wordpiece_deterministic_under_repartition(spark):
    docs = load(spark, SF_SMOKE, "documents").select("text")
    a = [tuple(r) for r in learn_wordpiece_merges(docs, "text", n_merges=6).collect()]
    b = [
        tuple(r)
        for r in learn_wordpiece_merges(
            docs.repartition(13), "text", n_merges=6
        ).collect()
    ]
    assert a == b


def test_three_tokenizer_fertility_comparison(spark):
    """BPE vs unigram vs WordPiece on the same corpus: all three
    produce >= 1 token per word and a positive chars-per-token; the
    unigram model (200-piece budget) compresses at least as well as
    the 12-merge greedy learners."""
    from cloud_native_reddit_data_pipeline_spark.operators.bpe import (
        bpe_encode_stats,
        learn_bpe_merges,
    )
    from cloud_native_reddit_data_pipeline_spark.operators.unigram import (
        learn_unigram_vocab,
        unigram_encode_stats,
    )

    docs = load(spark, SF_SMOKE, "documents")

    def avg_cpt(df, col):
        return float(df.agg(F.avg(col)).first()[0])

    merges = [
        (r["left"], r["right"])
        for r in learn_bpe_merges(docs, "text", n_merges=12).collect()
    ]
    bpe_cpt = avg_cpt(
        bpe_encode_stats(docs, "doc_id", "text", merges), "chars_per_bpe_token"
    )
    uni_cpt = avg_cpt(
        unigram_encode_stats(
            docs, "doc_id", "text", learn_unigram_vocab(docs, "text")
        ),
        "chars_per_piece",
    )
    wp_cpt = avg_cpt(
        wordpiece_encode_stats(
            docs, "doc_id", "text", wordpiece_vocab(docs, "text", n_merges=12)
        ),
        "chars_per_wp_token",
    )
    assert bpe_cpt > 0 and uni_cpt > 0 and wp_cpt > 0
    assert uni_cpt >= bpe_cpt and uni_cpt >= wp_cpt
