"""Tokenizer artifact persistence (operators/artifacts.py): an encode
driven by a LOADED artifact must be byte-identical to one driven by the
in-memory learner output — for the BPE merge table, the WordPiece merge
table, and the unigram-LM piece table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cloud_native_reddit_data_pipeline_spark.operators.artifacts import (
    artifact_manifest,
    load_merges,
    load_pieces,
    save_merge_table,
    save_piece_table,
)
from cloud_native_reddit_data_pipeline_spark.sources.tables import load

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return load(spark, SF, "documents").select("doc_id", "text").limit(200)


def test_bpe_merge_table_roundtrip(spark, tmp_path):
    from cloud_native_reddit_data_pipeline_spark.operators.bpe import (
        bpe_encode_stats,
        learn_bpe_merges,
    )

    docs = _docs(spark)
    learned = learn_bpe_merges(docs, "text", n_merges=8)
    direct = [(r["left"], r["right"]) for r in learned.orderBy("rank").collect()]
    save_merge_table(learned, str(tmp_path / "bpe"))
    loaded = load_merges(spark, str(tmp_path / "bpe"))
    assert loaded == direct  # rank order and values survive parquet
    a = sorted(map(tuple, bpe_encode_stats(docs, "doc_id", "text", direct).collect()))
    b = sorted(map(tuple, bpe_encode_stats(docs, "doc_id", "text", loaded).collect()))
    assert a == b


def test_wordpiece_merge_table_roundtrip(spark, tmp_path):
    """WordPiece's shipped artifact is the merge table; the encode-time
    vocabulary is base symbols ∪ merged symbols, so the round-trip
    rebuilds the vocab from the LOADED merges and must encode
    identically to the learner-driven wordpiece_vocab path."""
    from cloud_native_reddit_data_pipeline_spark.operators.bpe import (
        word_symbol_table,
    )
    from cloud_native_reddit_data_pipeline_spark.operators.wordpiece import (
        learn_wordpiece_merges,
        wordpiece_encode_stats,
        wordpiece_vocab,
    )

    docs = _docs(spark)
    learned = learn_wordpiece_merges(docs, "text", n_merges=6)
    direct = [(r["left"], r["right"]) for r in learned.orderBy("rank").collect()]
    save_merge_table(learned, str(tmp_path / "wp"))
    loaded = load_merges(spark, str(tmp_path / "wp"))
    assert loaded == direct
    base = (
        word_symbol_table(docs, "text")
        .select(F.explode("syms").alias("sym"))
        .distinct()
    )
    merged = spark.createDataFrame(
        [(left + right,) for left, right in loaded], "sym string"
    )
    vocab_from_artifact = base.unionByName(merged).distinct()
    vocab_direct = wordpiece_vocab(docs, "text", n_merges=6)
    a = sorted(
        map(
            tuple,
            wordpiece_encode_stats(docs, "doc_id", "text", vocab_direct).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            wordpiece_encode_stats(
                docs, "doc_id", "text", vocab_from_artifact
            ).collect(),
        )
    )
    assert a == b


def test_unigram_piece_table_roundtrip(spark, tmp_path):
    from cloud_native_reddit_data_pipeline_spark.operators.unigram import (
        learn_unigram_vocab,
        unigram_encode_stats,
    )

    docs = _docs(spark)
    pieces = learn_unigram_vocab(docs, "text", em_rounds=1, seed_size=100)
    save_piece_table(pieces, str(tmp_path / "ug"))
    loaded = load_pieces(spark, str(tmp_path / "ug"))
    # integer micro-nat scores round-trip exactly
    a = sorted(map(tuple, pieces.collect()))
    b = sorted(map(tuple, loaded.collect()))
    assert a == b
    ea = sorted(
        map(tuple, unigram_encode_stats(docs, "doc_id", "text", pieces).collect())
    )
    eb = sorted(
        map(tuple, unigram_encode_stats(docs, "doc_id", "text", loaded).collect())
    )
    assert ea == eb


def test_artifact_manifest(spark, tmp_path):
    from cloud_native_reddit_data_pipeline_spark.operators.bpe import (
        learn_bpe_merges,
    )

    docs = _docs(spark)
    learned = learn_bpe_merges(docs, "text", n_merges=8)
    save_merge_table(learned, str(tmp_path / "a"))
    m = {r["component"]: r["n_rows"] for r in
         artifact_manifest(spark, str(tmp_path / "a")).collect()}
    assert m == {"merges": 8}
