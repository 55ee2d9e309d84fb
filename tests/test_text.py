"""normalize_text must reproduce the reference preprocess() semantics
(redditProcessor.py:36-53) — checked against an independent Python
re-implementation of the documented chain."""

from __future__ import annotations

import re
import string

import pyspark.sql.functions as F
import pytest

from cloud_native_reddit_data_pipeline_spark.functions.text import (
    REFERENCE_STOPWORDS,
    fingerprint,
    normalize_text,
    token_count,
    word_shingles,
)


def reference_preprocess(text: str) -> str:
    """Independent reimplementation of the reference chain for testing."""
    text = text.lower()
    text = re.sub(r"http\S+|www\S+|https\S+", "", text, flags=re.IGNORECASE)
    text = re.sub(r"[" + re.escape(string.punctuation) + r"]", "", text)
    text = re.sub(
        r"\b(?:" + "|".join(REFERENCE_STOPWORDS) + r")\b", "", text, flags=re.IGNORECASE
    )
    return re.sub(r"\s+", " ", text).strip()


CASES = [
    "Hello World! This is JUST a test.",
    "check https://example.com/x?a=1 and www.foo.bar links",
    "I've got really good coffee... yes!",
    "punct: []{}()<>@#$%^&*~`|\\/;:'\"-_=+",
    "  many   spaces\tand\nnewlines  ",
    "",
    "thats the way (tho) I like it",
]


@pytest.mark.parametrize("text", CASES)
def test_normalize_matches_reference_chain(spark, text):
    got = (
        spark.createDataFrame([(text,)], "t string")
        .select(normalize_text("t").alias("c"))
        .first()["c"]
    )
    assert got == reference_preprocess(text)


def test_token_count_and_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",), ("",)], "t string")
    rows = df.select(
        token_count("t").alias("n"), word_shingles("t", 3).alias("sh")
    ).collect()
    assert [r["n"] for r in rows] == [4, 2, 0]
    assert rows[0]["sh"] == ["a b c", "b c d"]
    assert rows[1]["sh"] == []
    assert rows[2]["sh"] == []


def test_fingerprint_order_invariant(spark):
    df = spark.createDataFrame(
        [("The quick brown fox!",), ("brown FOX, the quick.",), ("other text",)],
        "t string",
    )
    fps = [r["fp"] for r in df.select(fingerprint("t").alias("fp")).collect()]
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


def test_bm25_saturation_and_length_normalization(spark):
    from cloud_native_reddit_data_pipeline_spark.operators.textstats import (
        ranked_keyword_search_bm25,
    )

    pad = " ".join(f"w{i}" for i in range(20))
    df = spark.createDataFrame(
        [
            (1, "spark " + pad),                      # 1 hit, 21 tokens
            (2, " ".join(["spark"] * 10) + " " + pad),  # 10 hits, 30 tokens
            (3, "spark spark " + pad),                # 2 hits, 22 tokens
            (4, "spark"),                             # 1 hit, 1 token (short doc)
            (5, pad),                                 # no hits
        ],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: r["score"]
        for r in ranked_keyword_search_bm25(df, "doc_id", "text", ["spark"]).collect()
    }
    assert 5 not in got  # no hit, no row
    # saturation: 10x the term frequency is nowhere near 10x the score
    assert got[2] > got[3] > got[1]
    assert got[2] < 3 * got[1]
    # length normalization: same tf, shorter doc scores higher
    assert got[4] > got[1]


def test_fielded_search_boosts_title_hits(spark):
    from cloud_native_reddit_data_pipeline_spark.operators.textstats import (
        ranked_keyword_search_fielded,
    )

    pad = " ".join(f"w{i}" for i in range(20))
    df = spark.createDataFrame(
        [
            (1, "spark intro " + pad),     # hit in title (first 8 tokens)
            (2, pad + " spark"),           # same single hit, but in body
            (3, pad),                      # no hits
        ],
        "doc_id int, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in ranked_keyword_search_fielded(
            df, "doc_id", "text", ["spark"]
        ).collect()
    }
    assert 3 not in rows  # no hit, no row
    assert rows[1]["n_hits"] == 1 and rows[2]["n_hits"] == 1
    # the title field carries a 2.0 boost: a title hit outranks the
    # same single hit in the body
    assert rows[1]["score"] > rows[2]["score"]


def test_fielded_search_sums_both_fields(spark):
    from cloud_native_reddit_data_pipeline_spark.operators.textstats import (
        ranked_keyword_search_fielded,
    )

    pad = " ".join(f"w{i}" for i in range(20))
    df = spark.createDataFrame(
        [
            (1, "spark here " + pad + " spark"),  # title hit + body hit
            (2, "spark here " + pad),             # title hit only
            (3, pad + " spark"),                  # body hit only
        ],
        "doc_id int, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in ranked_keyword_search_fielded(
            df, "doc_id", "text", ["spark"]
        ).collect()
    }
    # most_fields: both fields contribute, so doc 1 beats either
    # single-field hit and reports both hits
    assert rows[1]["n_hits"] == 2
    assert rows[1]["score"] > rows[2]["score"] > rows[3]["score"]


def test_repetition_stats_flags_boilerplate(spark):
    from cloud_native_reddit_data_pipeline_spark.operators.textstats import (
        repetition_stats,
    )

    df = spark.createDataFrame(
        [
            (1, "alpha beta\nalpha beta\ngamma delta"),   # dup line
            (2, "buy now buy now buy now buy now"),       # repeated bigram
            (3, "all words here are fully distinct ones"),
            (4, ""),                                       # empty: all zeros
        ],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(df, "doc_id", "text").collect()}
    assert got[1]["n_lines"] == 3 and got[1]["dup_line_frac"] == pytest.approx(1 / 3, abs=1e-3)
    # "buy now" appears 4x of 7 bigrams; 3-grams heavily duplicated too
    assert got[2]["top_bigram_frac"] == pytest.approx(4 / 7, abs=1e-3)
    assert got[2]["dup_trigram_frac"] > 0.5
    assert got[3]["dup_line_frac"] == 0.0
    assert got[3]["top_bigram_frac"] == pytest.approx(1 / 6, abs=1e-3)  # all unique
    assert got[4] == {
        "doc_id": 4, "n_lines": 0, "dup_line_frac": 0.0,
        "top_bigram_frac": 0.0, "dup_trigram_frac": 0.0,
    }


def test_chunk_fixed_sequences_exact_and_shuffle_free(spark):
    from cloud_native_reddit_data_pipeline_spark.operators.packing import (
        chunk_fixed_sequences,
    )

    df = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(10))),  # 10 toks -> 4+4+2
            (2, "a b c"),                                # single short chunk
            (3, ""),                                     # empty: no chunks
        ],
        "doc_id int, text string",
    )
    out = chunk_fixed_sequences(df, 4, "doc_id", "text")
    rows = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
    assert len(rows) == 4
    assert rows[(1, 0)]["chunk_text"] == "w0 w1 w2 w3"
    assert rows[(1, 2)]["n_chunk_tokens"] == 2 and rows[(1, 2)]["n_pad"] == 2
    assert rows[(2, 0)]["n_pad"] == 1
    # scale shape: a pure narrow projection — zero exchanges in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_cms_never_underestimates_and_merges(spark):
    from pyspark.sql import functions as F

    from cloud_native_reddit_data_pipeline_spark.operators.textstats import (
        cms_point_estimates,
        count_min_sketch,
    )
    from cloud_native_reddit_data_pipeline_spark.sources.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    est = cms_point_estimates(docs, "text", top_n=15).collect()
    assert len(est) == 15
    for r in est:
        assert r.cms_estimate >= r.exact_cnt  # one-sided error
    # mergeability: sketch(shard1) + sketch(shard2) == sketch(all)
    s1 = count_min_sketch(docs.filter(F.col("doc_id") % 2 == 0), "text")
    s2 = count_min_sketch(docs.filter(F.col("doc_id") % 2 == 1), "text")
    merged = (
        s1.unionByName(s2)
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("m_cnt"))
    )
    whole = count_min_sketch(docs, "text").withColumnRenamed("cnt", "w_cnt")
    diff = merged.join(whole, ["row", "col"], "full").filter(
        F.coalesce("m_cnt", F.lit(0)) != F.coalesce("w_cnt", F.lit(0))
    )
    assert diff.count() == 0


def test_pii_scrub_redacts_all_classes(spark):
    from cloud_native_reddit_data_pipeline_spark.functions.text import (
        pii_counts,
        scrub_pii,
    )

    rows = [
        (1, "mail a.b+c@sub.example.org or bob@x.io now"),
        (2, "ssn 123-45-6789 phone 415-555-1234 alt 415.555.9999"),
        (3, "server at 192.168.0.1 and 10.0.0.255 ok"),
        (4, "clean text with digits 12345 and date 2024-01-02"),
    ]
    df = spark.createDataFrame(rows, "id int, t string")
    out = {
        r["id"]: r
        for r in df.select(
            "id", *pii_counts("t"), scrub_pii("t").alias("s")
        ).collect()
    }
    assert out[1]["n_email"] == 2 and out[1]["s"] == "mail <EMAIL> or <EMAIL> now"
    assert out[2]["n_ssn"] == 1 and out[2]["n_phone"] == 2
    assert out[2]["s"] == "ssn <ID> phone <PHONE> alt <PHONE>"
    assert out[3]["n_ip"] == 2 and out[3]["s"] == "server at <IP> and <IP> ok"
    # no false positives: plain digits and ISO dates survive
    assert out[4]["s"] == rows[3][1]
    assert all(out[4][c] == 0 for c in ("n_email", "n_ssn", "n_phone", "n_ip"))


def test_phrase_search_exact_and_slop(spark):
    """match_phrase + slop semantics: consecutive hits counted exactly,
    proximity hits within the window, ranked by hits with doc_id
    tiebreak."""
    from cloud_native_reddit_data_pipeline_spark.operators.textstats import (
        phrase_search,
    )

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha beta"),   # 2 exact "alpha beta"
            (2, "alpha x beta"),                   # slop-2 only
            (3, "beta alpha"),                     # reversed: slop only
            (4, "alpha y y y y beta"),             # outside slop window
            (5, "nothing relevant here"),
        ],
        "doc_id long, text string",
    )
    out = phrase_search(
        df, "doc_id", "text", ["alpha", "beta"], prox_window=2, top_n=10
    ).collect()
    by_id = {r.doc_id: r for r in out}
    # only docs with >=1 exact phrase hit are returned
    assert set(by_id) == {1}
    assert (by_id[1].phrase_hits, by_id[1].first_pos) == (2, 1)
    # near_hits: |pa-pb|<=2 pairs in doc 1: (1,2),(4,5),(2,4)->|2-4|=2 yes,
    # (1,5)->4 no, plus (4,2)? pa=alpha pos {1,4}, pb=beta pos {2,5}:
    # |1-2|=1 ok, |1-5|=4 no, |4-2|=2 ok, |4-5|=1 ok -> 3
    assert by_id[1].near_hits == 3
    # three-term phrase
    out3 = phrase_search(
        df, "doc_id", "text", ["alpha", "beta", "gamma"], prox_window=1, top_n=10
    ).collect()
    assert [(r.doc_id, r.phrase_hits) for r in out3] == [(1, 1)]


def test_gopher_quality_gate_rules(spark):
    """Each Gopher rule flips on the document built to violate it."""
    from cloud_native_reddit_data_pipeline_spark.operators.textstats import (
        gopher_quality_gate,
    )

    good = "the a data " + " ".join(f"word{i}" for i in range(47))  # 50 words
    short = "the a tiny doc"                                        # < min_words
    longwords = "the a " + " ".join("x" * 30 for _ in range(48))    # mean len > 10
    nonalpha = "the a " + " ".join("1234" for _ in range(48))       # alpha < 80%
    nostop = " ".join(f"w{i}" for i in range(50))                   # no stopwords
    spam = "the a " + "spam gram " * 24                             # top bigram > 20%
    df = spark.createDataFrame(
        [
            (1, good), (2, short), (3, longwords),
            (4, nonalpha), (5, nostop), (6, spam),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in gopher_quality_gate(df, "doc_id", "text").collect()
    }
    assert out[1].pass_gate
    assert not out[2].words_ok and not out[2].pass_gate
    assert not out[3].mean_len_ok and not out[3].pass_gate
    assert not out[4].alpha_ok and not out[4].pass_gate
    assert not out[5].stop_ok and not out[5].pass_gate
    assert not out[6].bigram_ok and not out[6].pass_gate
    # every violator fails ONLY for reasons it was built to fail
    assert out[3].words_ok and out[3].alpha_ok and out[3].stop_ok
    assert out[4].words_ok and out[4].mean_len_ok and out[4].stop_ok


def test_classifier_calibration_bins_are_exact_integers(spark):
    from cloud_native_reddit_data_pipeline_spark.operators.textstats import (
        classifier_calibration,
    )
    from cloud_native_reddit_data_pipeline_spark.sources.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    rows = {r.bin: r for r in
            classifier_calibration(docs, "doc_id", "text", n_bins=4).collect()}
    n_docs = docs.count()
    assert sum(r.n_docs for r in rows.values()) == n_docs
    # first n % t tiles take ceil(n/t), rest floor (SQL ntile contract)
    sizes = sorted((r.n_docs for r in rows.values()), reverse=True)
    assert sizes[0] - sizes[-1] <= 1
    for r in rows.values():
        assert 0 <= r.conf_ppm <= 1_000_000
        assert 0 <= r.acc_ppm <= 1_000_000
        assert r.gap_ppm == abs(r.acc_ppm - r.conf_ppm)
        assert 0 <= r.n_pos <= r.n_docs
    # bins are ordered by logit, so hard-sigmoid confidence must be
    # monotone non-decreasing across bins
    confs = [rows[b].conf_ppm for b in sorted(rows)]
    assert confs == sorted(confs)


def test_perplexity_buckets_tercile_order(spark):
    from cloud_native_reddit_data_pipeline_spark.operators.textstats import (
        perplexity_buckets,
    )

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and the cat sat again"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            (3, "one two three four five six seven eight nine ten"),
            (4, "repeat repeat repeat repeat repeat repeat repeat"),
            (5, "mixed bag of words mixed bag of words mixed bag"),
            (6, ""),  # unscorable: must land in the tail, rank last
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in
           perplexity_buckets(df, "doc_id", "text").collect()}
    assert len(out) == 6
    # ranks are a permutation of 1..6 and the empty doc is last
    assert sorted(r.ppl_rank for r in out.values()) == list(range(1, 7))
    assert out[6].ppl_rank == 6 and out[6].bucket == "tail"
    assert out[6].perplexity is None
    # bucket follows rank terciles: ranks 1-2 head, 3-4 middle, 5-6 tail
    by_rank = {r.ppl_rank: r.bucket for r in out.values()}
    assert by_rank[1] == "head" and by_rank[2] == "head"
    assert by_rank[3] == "middle" and by_rank[4] == "middle"
    assert by_rank[5] == "tail" and by_rank[6] == "tail"
    # lower perplexity == earlier rank among scored docs
    scored = sorted(
        (r for r in out.values() if r.perplexity is not None),
        key=lambda r: r.ppl_rank,
    )
    ppls = [r.perplexity for r in scored]
    assert ppls == sorted(ppls)


def test_self_bleu_flags_templated_corpus(spark):
    from cloud_native_reddit_data_pipeline_spark.operators.textstats import (
        self_bleu_diversity,
    )

    # 4 identical templated docs + 2 unique-vocabulary docs
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "the quick brown fox jumps over the lazy dog"),
        (4, "the quick brown fox jumps over the lazy dog"),
        (5, "alpha beta gamma delta epsilon zeta eta theta"),
        (6, "uno dos tres cuatro cinco seis siete ocho"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           self_bleu_diversity(df, "doc_id", "text", sample_size=6).collect()}
    assert len(out) == 6
    # each templated doc's 8 bigrams are fully covered by 3 of the 5
    # other docs: sum_clipped = 24, ppm = 1e6*24 // (5*8) = 600000
    for d in (1, 2, 3, 4):
        assert out[d].n_bigrams == 8 and out[d].sum_clipped == 24
        assert out[d].selfbleu_ppm == 600000
    # unique docs share no bigram with anything
    for d in (5, 6):
        assert out[d].sum_clipped == 0 and out[d].selfbleu_ppm == 0


def test_domain_hardness_weights_upweights_hard_domain(spark):
    from cloud_native_reddit_data_pipeline_spark.operators.textstats import (
        domain_hardness_weights,
    )

    # easy: pure repetition (low KN surprise); hard: varied bigrams
    easy = "spam spam spam spam spam spam spam spam spam spam"
    rows = [(i, easy, "easy") for i in range(1, 5)] + [
        (5, "one two three four five six seven eight nine ten", "hard"),
        (6, "red green blue cyan magenta yellow black white grey pink", "hard"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.source: r for r in
           domain_hardness_weights(df, "doc_id", "text", "source").collect()}
    assert set(out) == {"easy", "hard"}
    assert out["easy"].n_docs == 4 and out["hard"].n_docs == 2
    assert out["hard"].mean_ce_e4 > out["easy"].mean_ce_e4
    assert out["hard"].excess_e4 > 0 and out["easy"].excess_e4 == 0
    assert out["hard"].weight_ppm > out["easy"].weight_ppm
    total = sum(r.weight_ppm for r in out.values())
    assert 0 < total <= 1_000_000


def test_pii_scrub_recall_full_on_planted(spark):
    from cloud_native_reddit_data_pipeline_spark.operators.textstats import (
        pii_scrub_recall,
    )

    df = spark.createDataFrame(
        [(i, "plain words only here") for i in range(1, 21)],
        "doc_id long, text string",
    )
    out = {r.pii_class: r for r in pii_scrub_recall(df, "doc_id", "text").collect()}
    assert set(out) == {"email", "ssn", "phone", "ip"}
    for r in out.values():
        assert r.n_docs == 20
        assert r.n_before >= 20          # every doc got one planted item
        assert r.n_survived == 0         # the production chain catches all
        assert r.n_placeholders >= 20
        assert r.recall_ppm == 1_000_000


def test_rag_context_pack_prefix_budget(spark):
    from cloud_native_reddit_data_pipeline_spark.operators.textstats import (
        rag_context_pack,
    )

    rows = [
        (1, "spark " * 30),         # 30 tokens, 1 hit per token
        (2, "spark spark " + "x " * 8),   # 10 tokens, high tf
        (3, "spark " + "y " * 99),  # 100 tokens, low density
        (4, "nothing relevant here"),
    ]
    df = spark.createDataFrame(
        [(i, t.strip()) for i, t in rows], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in
           rag_context_pack(df, "doc_id", "text", ["spark"],
                            k=10, token_budget=45).collect()}
    assert 4 not in out                      # no hit, not retrieved
    ranks = {r.rank: r.doc_id for r in out.values()}
    assert set(ranks) == {1, 2, 3}
    # cum_tokens is monotone in rank and included is the prefix rule
    by_rank = [out[ranks[i]] for i in sorted(ranks)]
    cums = [r.cum_tokens for r in by_rank]
    assert cums == sorted(cums)
    for r in by_rank:
        assert r.included == (r.cum_tokens <= 45)
    # the 100-token doc can never fit a 45-token budget
    assert not out[3].included


def test_quality_threshold_yield_cumulative(spark):
    from cloud_native_reddit_data_pipeline_spark.operators.textstats import (
        quality_threshold_yield,
    )
    from cloud_native_reddit_data_pipeline_spark.sources.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    out = sorted(
        quality_threshold_yield(docs, "doc_id", "text", n_tiles=5).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in out] == [1, 2, 3, 4, 5]
    assert sum(r.n_docs for r in out) == docs.count()
    assert out[-1].cum_docs == docs.count()
    # cumulative columns really accumulate
    run_d = run_t = 0
    for r in out:
        run_d += r.n_docs
        run_t += r.n_tokens
        assert (r.cum_docs, r.cum_tokens) == (run_d, run_t)
    # decile 1 holds the best scores: min logit non-increasing
    mins = [r.min_logit_e3 for r in out]
    assert mins == sorted(mins, reverse=True)


def test_encoding_repair_roundtrip_and_audit(spark):
    from cloud_native_reddit_data_pipeline_spark.functions.text import (
        MOJIBAKE_MAP,
        repair_encoding,
    )
    from cloud_native_reddit_data_pipeline_spark.operators.textstats import (
        encoding_repair_audit,
    )

    df = spark.createDataFrame(
        [(1, "clean words"), (2, "already-broken cafÃ© twice cafÃ©")],
        "doc_id long, text string",
    )
    fixed = df.select(repair_encoding("text").alias("t")).collect()
    assert fixed[1].t == "already-broken café twice café"
    out = {r.artifact: r for r in
           encoding_repair_audit(df, "doc_id", "text").collect()}
    assert len(out) == len(MOJIBAKE_MAP)
    for r in out.values():
        assert r.n_docs == 2
        assert r.n_before >= 2       # every doc got the planted phrase
        assert r.n_survived == 0
        assert r.recall_ppm == 1_000_000
    # doc 2's pre-existing artifacts are counted too
    assert out["Ã©"].n_before == 4


def test_vocab_coverage_min_count_rule(spark):
    from cloud_native_reddit_data_pipeline_spark.operators.textstats import (
        vocab_coverage,
    )

    # "common" appears 6x (in vocab at min_count=5); each "rareN" once
    rows = [(i, "common rare%d" % i) for i in range(1, 7)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           vocab_coverage(df, "doc_id", "text", min_count=5).collect()}
    for i in range(1, 7):
        assert out[i].n_tokens == 2
        assert out[i].n_oov == 1           # the rare token
        assert out[i].oov_ppm == 500_000


def test_winnowing_coverage_and_density(spark):
    from cloud_native_reddit_data_pipeline_spark.operators.textstats import (
        winnowing_fingerprints,
    )

    # 20 distinct words -> 18 trigrams -> 15 full windows at w=4
    text = " ".join(f"tok{i}" for i in range(20))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    fps = sorted(r.fpos for r in
                 winnowing_fingerprints(df, "doc_id", "text", k=3, w=4).collect())
    # coverage guarantee: every window of 4 consecutive kgram positions
    # [s, s+3] (s <= n_kgrams - 4) contains a selected position
    for s in range(0, 18 - 4 + 1):
        assert any(s <= p <= s + 3 for p in fps), f"window {s} uncovered"
    # density: |fps| between n/w and 2n/(w+1) ballpark — never all grams
    assert 4 <= len(fps) <= 12
    # short doc: fewer than w+k-1 = 6 words -> no full window -> empty
    short = spark.createDataFrame([(2, "a b c d e")], "doc_id long, text string")
    assert winnowing_fingerprints(short, "doc_id", "text").count() == 0


def test_winnowing_overlap_detects_shared_passage(spark):
    from cloud_native_reddit_data_pipeline_spark.operators.textstats import (
        winnowing_overlap_pairs,
    )

    passage = " ".join(f"plag{i}" for i in range(15))
    rows = [
        (1, "intro words here " + passage),
        (2, passage + " totally different ending words now"),
        (3, "unrelated content " + " ".join(f"x{i}" for i in range(15))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.id_a, r.id_b): r.n_shared for r in
             winnowing_overlap_pairs(df, "doc_id", "text",
                                     min_shared=2).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2
    assert all(3 not in p for p in pairs)


def test_source_quality_ci_wilson_bounds(spark):
    import math

    import __spark_entry__ as entry

    rows = entry.queries()["source_quality_ci"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    z = 1.959963984540054
    for r in rows:
        n, k = r.n, r.n_pass
        assert 0 <= k <= n
        # interval brackets the point rate and stays in [0, 1]
        assert -1e-9 <= r.wilson_lo <= k / n + 1e-9
        assert k / n - 1e-9 <= r.wilson_hi <= 1 + 1e-9
        # matches the reference Wilson formula to rounding
        denom = 1 + z * z / n
        center = (k / n + z * z / (2 * n)) / denom
        half = (z / denom) * math.sqrt(
            (k / n) * (1 - k / n) / n + z * z / (4 * n * n)
        )
        assert abs(r.wilson_lo - (center - half)) < 1e-5
        assert abs(r.wilson_hi - (center + half)) < 1e-5


def test_keyness_loglr_hand_computed(spark):
    import math

    from cloud_native_reddit_data_pipeline_spark.operators.textstats import keyness_loglr

    # 'zebra' appears 4x in group x (n1=8 tokens) and 0x in group y
    # (n2=8): a=4, b=0, t=4, N=16 -> E1=2, G2 = 2*4*ln(2)
    docs = spark.createDataFrame(
        [
            ("x", "zebra zebra common common"),
            ("x", "zebra zebra common common"),
            ("y", "common common other other"),
            ("y", "common common other other"),
        ],
        "source string, text string",
    )
    rows = {
        (r.source, r.term): r
        for r in keyness_loglr(docs, "source", "text", k=5, min_count=3).collect()
    }
    z = rows[("x", "zebra")]
    assert (z.focus_count, z.rest_count) == (4, 0)
    assert abs(z.g2 - round(2 * 4 * math.log(2) + 1e-9, 4)) < 1e-9
    assert z.rank == 1
    # 'common' is evenly spread -> not over-represented anywhere
    assert ("x", "common") not in rows and ("y", "common") not in rows
    # 'other' is distinctive of y
    assert rows[("y", "other")].focus_count == 4


def test_pmi_collocations_planted_phrase(spark):
    import math

    from cloud_native_reddit_data_pipeline_spark.operators.textstats import (
        pmi_collocations,
    )

    # "xq yq" always co-occurs (5 times); filler words are frequent and
    # independent, so the planted pair must rank first.
    docs = spark.createDataFrame(
        [(i, "xq yq " + "the cat sat on the mat " * 3) for i in range(5)],
        "doc_id long, text string",
    )
    rows = pmi_collocations(docs, "text", min_count=5, k=5).collect()
    top = rows[0]
    assert (top.w1, top.w2, top.rank) == ("xq", "yq", 1)
    assert top.n_pair == 5 and top.n_w1 == 5 and top.n_w2 == 5
    # hand-check: B = 5*19 bigrams, N = 5*20 tokens
    b, n = 5 * 19, 5 * 20
    expect = round(math.log((5 / b) / ((5 / n) * (5 / n))) + 1e-9, 4)
    assert abs(top.pmi - expect) < 1e-9
    # every returned pair met min_count
    assert all(r.n_pair >= 5 for r in rows)


def test_stemmed_search_matches_inflections_and_handles_quotes(spark):
    from cloud_native_reddit_data_pipeline_spark.operators.textstats import (
        fuzzy_keyword_search,
        ranked_keyword_search_bm25,
        ranked_keyword_search_stemmed,
    )

    pad = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [
            (1, "joins joining joined " + pad),
            (2, "join " + pad),
            (3, pad),
        ],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: r["n_hits"]
        for r in ranked_keyword_search_stemmed(
            df, "doc_id", "text", ["join"]
        ).collect()
    }
    assert got == {1: 3, 2: 1}  # all inflections stem to 'join'
    # the exact ranker only sees the literal term
    exact = {
        r["doc_id"]: r["n_hits"]
        for r in ranked_keyword_search_bm25(
            df, "doc_id", "text", ["join"]
        ).collect()
    }
    assert exact == {2: 1}
    # keywords are DATA, not SQL text: quotes must not parse-error
    quoted = ranked_keyword_search_stemmed(
        df, "doc_id", "text", ["it's", "join"]
    ).collect()
    assert {r["doc_id"] for r in quoted} == {1, 2}


def test_fuzzy_search_edit_distance_and_ranking(spark):
    from cloud_native_reddit_data_pipeline_spark.operators.textstats import (
        fuzzy_keyword_search,
    )

    pad = " ".join(f"zz{i}" for i in range(10))
    df = spark.createDataFrame(
        [
            (1, "sparc joind " + pad),   # 1-edit typo hits for both terms
            (2, "spark spark " + pad),   # exact hits, one term
            (3, "sparkle " + pad),       # 2 edits away — no match
            (4, pad),
        ],
        "doc_id int, text string",
    )
    rows = fuzzy_keyword_search(
        df, "doc_id", "text", ["spark", "joins"], max_edits=1, k=10
    ).collect()
    got = {r["doc_id"]: (r["n_terms"], r["n_hits"]) for r in rows}
    assert got[1] == (2, 2)      # both terms matched via 1-edit typos
    assert got[2] == (1, 2)      # one term, twice
    assert 3 not in got and 4 not in got
    # term coverage outranks hit volume
    assert rows[0]["doc_id"] == 1
