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


def test_bpe_encode_matches_python_reference(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from cloud_native_reddit_data_pipeline_spark.operators.bpe import (
        END_OF_WORD,
        bpe_encode_stats,
        learn_bpe_merges,
        learn_bpe_merges_py,
    )
    from cloud_native_reddit_data_pipeline_spark.sources.tables import load

    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text").limit(50)
    texts = {r.doc_id: r.text for r in docs.collect()}
    merges = [(r.left, r.right) for r in learn_bpe_merges(docs, "text", n_merges=8).collect()]
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe_encode_stats(docs, "doc_id", "text", merges).collect()
    }

    def encode_py(text):
        total_words = total_bpe = 0
        for w in (text or "").lower().split():
            syms = list(w) + [END_OF_WORD]
            for a, b in merges:
                new, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        new.append(a + b)
                        i += 2
                    else:
                        new.append(syms[i])
                        i += 1
                syms = new
            total_words += 1
            total_bpe += len(syms)
        return total_words, total_bpe

    for doc_id, text in texts.items():
        assert got[doc_id] == encode_py(text), doc_id


def test_bpe_batched_equals_sequential_on_overlapping_pairs(spark):
    """Adversarial: top pairs share symbols ('a b' and 'b c' chains), so
    the batch selector must truncate — batched output must still equal
    the one-merge-per-round Python reference exactly."""
    texts = [
        "abc abc abc abc ab ab bc bc bc a b c",
        "aab abb bba baa ab ba",
        "xy xy xyz zyx yx yx yx",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    for n in (4, 8, 12):
        got = [tuple(r) for r in learn_bpe_merges(df, "text", n_merges=n).collect()]
        assert got == learn_bpe_merges_py(texts, n_merges=n), n


def test_bpe_batch_size_invariance(spark):
    """max_batch is a pure performance knob: 1 (sequential), 4, 8 must
    produce identical merge tables."""
    docs = load(spark, SF_SMOKE, "documents").select("text").limit(80)
    outs = [
        [tuple(r) for r in learn_bpe_merges(docs, "text", n_merges=8, max_batch=m).collect()]
        for m in (1, 4, 8)
    ]
    assert outs[0] == outs[1] == outs[2]


def test_select_merge_batch_rules():
    from collections import namedtuple

    from cloud_native_reddit_data_pipeline_spark.operators.bpe import (
        _select_merge_batch,
    )

    P = namedtuple("P", "l r cnt")
    # disjoint prefix, strict count gap: all taken
    rows = [P("a", "b", 10), P("c", "d", 8), P("e", "f", 5)]
    assert _select_merge_batch(rows, 8) == rows
    # conflict at rank 2 (shares 'b'): batch stops AND ties with the
    # excluded count are dropped
    rows = [P("a", "b", 10), P("b", "c", 10)]
    assert _select_merge_batch(rows, 8) == [P("a", "b", 10)]
    # count tie with first excluded pair truncates (created-pair guard)
    rows = [P("a", "b", 10), P("c", "d", 8), P("d", "e", 8)]
    assert _select_merge_batch(rows, 8) == [P("a", "b", 10)]
    # symbol equal to an earlier concat conflicts ('ab' == 'a'+'b')
    rows = [P("a", "b", 10), P("ab", "c", 7)]
    assert _select_merge_batch(rows, 8) == [P("a", "b", 10)]
    # fallback: truncation always keeps the argmax
    rows = [P("a", "b", 10), P("c", "a", 10)]
    assert _select_merge_batch(rows, 8) == [P("a", "b", 10)]


def test_select_merge_batch_known_symbol_poison():
    """A selected pair whose concatenation ALREADY exists as a symbol
    (different formation, e.g. 'abc' = ab+c earlier vs a+bc now) can
    boost a pre-existing pair past a later batch member, so the batch
    must stop right after it (ADVICE r4)."""
    from collections import namedtuple

    from cloud_native_reddit_data_pipeline_spark.operators.bpe import (
        _select_merge_batch,
    )

    P = namedtuple("P", "l r cnt")
    rows = [P("a", "bc", 10), P("x", "y", 8), P("p", "q", 5)]
    # without the known symbol, the whole disjoint prefix is taken
    assert _select_merge_batch(rows, 8) == rows
    # 'abc' pre-exists: batch stops after the poisoning member — the
    # count-8 pair could be outrun by a boosted pre-existing (X,'abc')
    got = _select_merge_batch(rows, 8, known_symbols={"abc"})
    assert got == [P("a", "bc", 10)]
    # poison in a LATER member truncates from there, keeping the prefix
    rows = [P("x", "y", 10), P("a", "bc", 8), P("p", "q", 5)]
    got = _select_merge_batch(rows, 8, known_symbols={"abc"})
    assert got == [P("x", "y", 10), P("a", "bc", 8)]
    # two batch members sharing one concatenation ('abc' via a+bc and
    # ab+c) double-form the same symbol — the second must conflict
    rows = [P("a", "bc", 10), P("ab", "c", 8), P("p", "q", 5)]
    assert _select_merge_batch(rows, 8) == [P("a", "bc", 10)]


def test_bpe_oracle_early_stop_parity_on_degenerate_corpus(spark):
    """r7-verdict task 3 'Done=' case: a corpus that exhausts mergeable
    pairs before n_merges must leave BOTH legs equal — the engine
    early-stops, and the oracle's per-round v{k} falls back to v{k-1}
    via the NOT-EXISTS pass-through when best{k} is empty (without it,
    every post-exhaustion CTE would go empty and the merge list and
    encode stats would silently diverge)."""
    import duckdb
    import pandas as pd

    from cloud_native_reddit_data_pipeline_spark.operators.bpe import (
        bpe_encode_stats,
        bpe_merges_oracle_sql,
        bpe_encode_oracle_sql,
        learn_bpe_merges,
    )

    # "ab ab" fully merges in 2 rounds; ask for 6
    df = spark.createDataFrame([(1, "ab ab"), (2, "ab")], "doc_id long, text string")
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": [1, 2], "text": ["ab ab", "ab"]})
    )

    merges_engine = [
        (r.rank, r.left, r.right, r.merged, r.pair_freq)
        for r in learn_bpe_merges(df, "text", n_merges=6).collect()
    ]
    merges_oracle = [tuple(r) for r in con.execute(bpe_merges_oracle_sql(6)).fetchall()]
    assert len(merges_engine) == 2  # (a,b)->ab, (ab,</w>)->ab</w>
    assert sorted(merges_engine) == sorted(merges_oracle)

    pairs = [(le, r) for _, le, r, _, _ in sorted(merges_engine)]
    enc_engine = {
        r.doc_id: (r.n_words, r.n_bpe_tokens, r.chars_per_bpe_token)
        for r in bpe_encode_stats(df, "doc_id", "text", pairs).collect()
    }
    enc_oracle = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(bpe_encode_oracle_sql(6)).fetchall()
    }
    assert enc_engine == enc_oracle
