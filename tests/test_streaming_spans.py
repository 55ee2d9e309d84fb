"""Incremental ExactSubstr span-cut stream (`streaming/spans.py`):
passages repeating earlier batches are cut from later documents, the
first (accepted) copy stays intact, in-batch duplication cuts both
copies, and the store grows append-only."""

from __future__ import annotations

import json
import os

from cloud_native_reddit_data_pipeline_spark.streaming.spans import (
    span_cut_batch_against_store,
    start_span_cut_stream,
)

PASSAGE = "the quick brown fox jumps over the lazy dog tonight"  # 10 tokens
SCHEMA = "doc_id LONG, text STRING"


def _write_batch(dirpath, rows):
    dirpath.mkdir(parents=True, exist_ok=True)
    seq = len(list(dirpath.iterdir()))
    f = dirpath / f"b{seq}.json"
    f.write_text("\n".join(json.dumps({"doc_id": i, "text": t}) for i, t in rows))
    t = 1_700_000_000 + seq
    os.utime(f, (t, t))


def _run(spark, src, tmp_path):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = start_span_cut_stream(
        stream,
        str(tmp_path / "corpus"),
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    return {
        r["doc_id"]: r
        for r in spark.read.parquet(str(tmp_path / "corpus")).collect()
    }


def test_cross_batch_passage_cut_first_copy_intact(spark, tmp_path):
    src = tmp_path / "src"
    _write_batch(src, [(1, f"alpha beta {PASSAGE}")])
    _write_batch(src, [(2, f"{PASSAGE} omega psi chi phi upsilon")])
    corpus = _run(spark, src, tmp_path)
    # batch-1 doc was first: accepted whole
    assert corpus[1].cleaned_text.split() == f"alpha beta {PASSAGE}".split()
    # batch-2 doc repeats the accepted passage: it arrives cut
    assert corpus[2].cleaned_text == "omega psi chi phi upsilon"
    assert (corpus[2].n_tokens, corpus[2].n_kept_tokens) == (15, 5)


def test_within_batch_duplication_cuts_both(spark, tmp_path):
    src = tmp_path / "src"
    _write_batch(
        src,
        [(1, f"{PASSAGE} unique one two"), (2, f"{PASSAGE} other say three")],
    )
    corpus = _run(spark, src, tmp_path)
    assert corpus[1].cleaned_text == "unique one two"
    assert corpus[2].cleaned_text == "other say three"


def test_unique_docs_pass_whole_and_store_appends(spark, tmp_path):
    src = tmp_path / "src"
    _write_batch(src, [(1, "entirely unique words nothing repeats here at all")])
    _write_batch(src, [(2, "another fully distinct document with fresh tokens only")])
    corpus = _run(spark, src, tmp_path)
    assert corpus[1].n_kept_tokens == corpus[1].n_tokens
    assert corpus[2].n_kept_tokens == corpus[2].n_tokens
    store = spark.read.parquet(str(tmp_path / "store"))
    # store holds grams of BOTH docs (append-only, batch= partitioned)
    assert {r["doc_id"] for r in store.collect()} == {1, 2}
    batches = {e for e in os.listdir(tmp_path / "store") if e.startswith("batch=")}
    assert len(batches) == 2


def test_batch_step_standalone_matches_batch_operator_when_no_store(spark):
    """With no store, one batch through the streaming step must equal
    the batch cut operator on the same frame."""
    from cloud_native_reddit_data_pipeline_spark.operators.dedup import (
        cut_duplicate_spans,
    )

    rows = [
        (1, f"alpha beta {PASSAGE} gamma delta"),
        (2, f"{PASSAGE} omega psi chi phi upsilon"),
        (3, "entirely unique words nothing repeats here at all ok fine"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    cleaned, _ = span_cut_batch_against_store(df, None, "doc_id", "text", k=5)
    want = {r.doc_id: r for r in cut_duplicate_spans(df, "doc_id", "text", k=5).collect()}
    got = {r.doc_id: r for r in cleaned.collect()}
    assert {k: (v.n_tokens, v.n_kept_tokens, v.cleaned_text) for k, v in got.items()} == {
        k: (v.n_tokens, v.n_kept_tokens, v.cleaned_text) for k, v in want.items()
    }


def test_crash_replay_does_not_poison_span_cut(spark, tmp_path):
    """If a batch crashes after its gram-store write but before the
    streaming commit, foreachBatch replays the same batch_id — the
    replay must NOT see the batch's own grams in the store (else every
    gram matches and the replayed corpus partition is emptied)."""
    from cloud_native_reddit_data_pipeline_spark.streaming.spans import (
        process_span_cut_batch,
    )

    corpus = str(tmp_path / "corpus")
    store = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(1, f"alpha beta {PASSAGE} gamma delta epsilon")], SCHEMA
    )
    process_span_cut_batch(spark, df, 0, corpus, store)
    first = spark.read.parquet(corpus + "/batch=0").collect()
    # simulate crash-after-store-write: replay the SAME batch_id
    process_span_cut_batch(spark, df, 0, corpus, store)
    replay = spark.read.parquet(corpus + "/batch=0").collect()
    assert {r.doc_id: r.cleaned_text for r in replay} == {
        r.doc_id: r.cleaned_text for r in first
    }
    # intact: nothing in this unique doc should have been cut
    assert replay[0].n_kept_tokens == replay[0].n_tokens
    # and a LATER batch still sees batch-0 evidence (filter is strict <)
    df2 = spark.createDataFrame([(2, f"{PASSAGE} omega psi chi phi upsilon")], SCHEMA)
    process_span_cut_batch(spark, df2, 1, corpus, store)
    later = spark.read.parquet(corpus + "/batch=1").collect()
    assert later[0].cleaned_text == "omega psi chi phi upsilon"
