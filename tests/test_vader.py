"""Full-VADER sentiment semantics (redditProcessor.py:23-33 parity):

- pinned canonical cases: negation flip, booster scaling, ALL-CAPS
  emphasis, punctuation emphasis, but-clause reweighting, never-so/this,
  least-check — values match the stock analyzer where vocabulary overlaps
  ("not good" = -0.3412 and "very good" = 0.4927 are the published stock
  VADER outputs for the stock lexicon's good=1.9)
- three-way exact agreement: pure-Python scorer == relational plan ==
  generated DuckDB oracle, on crafted cases and on the documents table
- threshold bucketing matches the reference's >0.05 / <-0.05 rule
"""

from __future__ import annotations

import duckdb
import pytest

from cloud_native_reddit_data_pipeline_spark.functions import vader
from cloud_native_reddit_data_pipeline_spark.sources.tables import load

SF = "/root/testdata/sf0.001"

CASES = [
    "good", "not good", "very good", "VERY good movie here", "good!!!",
    "good but awful", "never so good", "this was never so good honestly",
    "at least good", "least good thing", "extremely BAD day today",
    "I do not hate it", "isn't terrible at all", "SO GREAT",
    "barely useful", "really really love this", "what??? is this good???",
    "kinda slow but absolutely amazing!!", "", "   ",
    "no sentiment here at all", "wasn't very good",
    "utterly broken and totally useless",
    # stock "no" rules
    "no good", "no fun or good options here", "there is no hope left",
    # multi-word boosters (undamped, unsigned adds)
    "it was sort of good", "it was kind of nice", "it was just enough good",
    # special-case idioms: lookback + lookahead windows
    "it was the kiss of death", "she has a broken heart",
    "what a tragedy the kiss of death came", "this film is the bomb honestly",
    "it was a bad ass show",
    # quirky distance-3 precedence + without-doubt carve-outs
    "tell me is this good", "this was never so good",
    "it was without doubt excellent", "without doubt excellent",
    # stock tokenizer: short tokens keep punctuation, punct tokens persist
    "me! you! us! great", "ok! fine", "wow , not , good", ":) :( happy",
    # round-4 lexicon growth tranche: new positive/negative vocabulary
    # through every path (negation, boosters, caps, idiom windows)
    "what an accomplishment, truly inspiring work",
    "not impressed, very frustrating and a huge mistake",
    "blessed and grateful for this tremendous opportunity",
    "an absolute nightmare: delayed, overwhelmed, and betrayed",
    "VERY courageous rescue, the hero was fearless!!",
    "kind of awkward but sort of charming",
    "no mercy for the ruthless villain's savage betrayal",
    "without doubt the finest, most splendid masterpiece",
    "struggling with grief and sorrow, utterly hopeless",
    "wow, yay, terrific news — we won the award!",
    # round-5 lexicon growth tranche (828 -> 1,521 entries)
    "a heartwarming and spectacular performance, truly remarkable",
    "not trustworthy: manipulative, deceitful, and fraudulent",
    "the renovation was exquisite, the craftsmanship immaculate",
    "appalling service, overpriced junk and a rude unprofessional staff",
    "VERY resilient community, thriving against adversity!!",
    "kind of tedious but sort of intriguing",
    "no forgiveness for the merciless tyrant's atrocity",
    "lol that was hilarious, hahaha",
    "ugh, wtf, this is unbearable",
    "she survived heartbreak and emerged victorious, overjoyed",
    # round-5 inflection tranche (1,521 -> 1,820 entries)
    "he abandons his promises and blames everyone else",
    "she achieves and inspires, truly amazes the critics",
    "the scandal disgraces the villains and ruins their frauds",
    "not discouraged: the team celebrates, rejoices and thrives",
    "threats, insults and curses — the mob riots and attacks",
]


@pytest.mark.parametrize(
    "text,expected",
    [
        ("good", 0.4404),
        ("not good", -0.3412),  # stock VADER value: 1.9 * -0.74, normalized
        ("very good", 0.4927),  # stock VADER value: booster +0.293
        ("good!!!", 0.5826),  # 3 x 0.292 exclamation amplification
        ("at least good", 0.4404),  # "at least" does NOT flip
        ("least good thing", -0.3412),  # bare "least" flips
        ("", 0.0),
        ("no sentiment here at all", 0.0),
        # stock "no" rules: replacement by raw valence * N_SCALAR
        ("no good", -0.3412),  # same as "not good" in stock
        ("no fun or good options here", -0.6259),  # "no ... or/nor" distance-3 path
        # multi-word boosters added raw inside the distance-3 iteration
        ("it was sort of good", 0.3832),  # 1.9 - 0.293
        ("it was just enough good", 0.3832),
        # special-case idioms replace the valence.  Both "kiss" and
        # "death" are lexicon entries (as in stock), so the idiom fires
        # at BOTH token positions — kiss via lookahead, death via
        # lookback — for -1.5 + -1.5 = -3.0: the stock analyzer's own
        # double-replace quirk, reproduced faithfully.
        ("it was the kiss of death", -0.6124),
        ("she has a broken heart", -0.5994),  # lookahead "broken heart" -> -2.9
        # stock's quirky distance-3 precedence: "this/so" right before the
        # hit fires 1.25 with no "never" anywhere
        ("tell me is this good", 0.5228),
        ("this was never so good", 0.7279),  # 1.9 +0.293, x1.5, x1.25
        # "without doubt" carve-out: no negation ("doubt" itself still flips)
        ("without doubt excellent", 0.6796),
        # stock tokenizer: "me!" keeps its punctuation (stripped form <= 2)
        ("me! you! us! great", 0.7163),
    ],
)
def test_pinned_cases(text, expected):
    assert vader.score_vader_py(text) == pytest.approx(expected, abs=1e-9)


def test_semantic_orderings():
    s = vader.score_vader_py
    assert s("not good") < 0 < s("good")  # negation flips
    assert s("very good") > s("good")  # booster amplifies
    assert s("barely useful") < s("useful")  # dampener reduces
    assert s("good!!!") > s("good!") > s("good")  # punctuation emphasis
    assert s("GREAT day today") > s("great day today")  # caps (mixed-case doc)
    assert s("SO GREAT") == s("so great")  # all-caps doc: no cap_diff
    assert s("good but awful") < 0  # post-but clause dominates
    assert s("never so good") > s("good")  # intensifier idiom, not negation


def test_three_way_agreement_crafted(spark):
    df = spark.createDataFrame(
        list(enumerate(CASES)), "doc_id long, text string"
    )
    rel = {
        r["doc_id"]: (r["sentiment_score"], r["sentiment"])
        for r in vader.score_vader_relational(df, "doc_id", "text").collect()
    }
    con = duckdb.connect()
    con.sql("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", list(enumerate(CASES)))
    ora = {
        r[0]: (r[1], r[2])
        for r in con.sql(vader.vader_oracle_sql("docs", "doc_id", "text")).fetchall()
    }
    for i, c in enumerate(CASES):
        py = vader.score_vader_py(c)
        assert rel[i][0] == pytest.approx(py, abs=1e-9), (c, rel[i], py)
        assert ora[i][0] == pytest.approx(py, abs=1e-9), (c, ora[i], py)
        assert rel[i][1] == ora[i][1] == vader.label_for(py)


def test_relational_matches_python_on_documents(spark):
    docs = load(spark, SF, "documents")
    rel = {
        r["doc_id"]: r["sentiment_score"]
        for r in vader.score_vader_relational(docs, "doc_id", "text").collect()
    }
    for row in docs.select("doc_id", "text").collect():
        assert rel[row["doc_id"]] == pytest.approx(
            vader.score_vader_py(row["text"]), abs=1e-9
        )


def test_pandas_udf_path_agrees(spark):
    docs = load(spark, SF, "documents").limit(100)
    rel = {
        r["doc_id"]: r["sentiment_score"]
        for r in vader.score_vader_relational(docs, "doc_id", "text").collect()
    }
    pud = {
        r["doc_id"]: r["sentiment_score"]
        for r in vader.vader_pandas_udf(docs, "text")
        .select("doc_id", "sentiment_score")
        .collect()
    }
    assert rel == pud


def test_lexicon_join_broadcasts(spark):
    docs = load(spark, SF, "documents")
    plan = (
        vader.score_vader_relational(docs, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "PythonUDF" not in plan  # pure Catalyst, no Python in the plan


def test_lexicon_file_loader(tmp_path):
    p = tmp_path / "vader_lexicon.txt"
    p.write_text("great\t3.1\t0.7\t[3, 3, 3]\nbad\t-2.5\t0.5\t[-2, -3]\n")
    lex = vader.load_lexicon_file(str(p))
    assert lex == {"great": 3.1, "bad": -2.5}
    assert vader.score_vader_py("not great", lexicon=lex) == pytest.approx(
        vader.score_vader_py("not great", lexicon={"great": 3.1}), abs=1e-9
    )


def test_round4_lexicon_growth_semantics():
    s = vader.score_vader_py
    assert len(vader.VADER_LEXICON) >= 800
    assert s("inspiring") > 0 > s("nightmare")
    assert s("not inspiring") < 0 < s("not worthless")  # negation flips new words
    assert s("very terrific") > s("terrific")  # boosters on new words
    assert s("TERRIFIC news today") > s("terrific news today")  # caps emphasis
    assert s("hopeless!!!") < s("hopeless!") < s("hopeless")


def test_interpolated_tail_blast_radius_bound():
    """Quantified divergence bound for the family-interpolated lexicon
    tail (functions/vader.py INTERPOLATED_ENTRIES): assuming the stock
    turker mean differs from our interpolated valence by at most
    +/- 1.0 on the [-4, 4] scale (the stock lexicon's own inter-rater
    stddev envelope), the worst-case compound-score delta any single
    interpolated word can contribute — measured through the REAL
    scorer on the worst single-token sentence, with and without the
    maximum '!!!!' punctuation amplifier — is bounded and PINNED here,
    so a future drop-in of the real MIT TSV has a predicted blast
    radius (see PARITY.md 'VADER interpolated tail').
    """
    from cloud_native_reddit_data_pipeline_spark.functions.vader import (
        INTERPOLATED_ENTRIES,
        VADER_LEXICON,
        score_vader_py,
    )

    ERR = 1.0
    max_delta = 0.0
    worst_word = None
    n_label_flippable = 0
    for w in sorted(INTERPOLATED_ENTRIES):
        v = VADER_LEXICON[w]
        word_worst = 0.0
        flips = False
        for text in (w, w + "!!!!"):
            base = score_vader_py(text)
            for v_true in (max(v - ERR, -4.0), min(v + ERR, 4.0)):
                patched = dict(VADER_LEXICON)
                patched[w] = v_true
                alt = score_vader_py(text, lexicon=patched)
                word_worst = max(word_worst, abs(base - alt))
                # label flip: crossing the +/-0.05 thresholds
                lab = lambda c: "pos" if c > 0.05 else ("neg" if c < -0.05 else "neu")
                if lab(base) != lab(alt):
                    flips = True
        if word_worst > max_delta:
            max_delta, worst_word = word_worst, w
        n_label_flippable += int(flips)

    # PINNED bound: worst-case single-word compound delta under a
    # +/-1.0 valence error.  The normalization x/sqrt(x^2+15) is
    # steepest at 0 (slope 1/sqrt(15) ~ 0.258), so low-|valence|
    # entries dominate.  The worst case is a low-|v| entry ('apologise',
    # v=0.4) whose error FLIPS the sign of the sum: the '!!!!'
    # amplifier (sign-matched, +/-1.168) then pushes the two scores
    # apart instead of shifting both the same way — 0.4+1.168 vs
    # -0.6-1.168 through the normalizer gives the 0.79 spread.
    assert max_delta <= 0.80, (worst_word, max_delta)
    # every interpolated entry has |v| <= 2.7 < 4 - no clipping
    # asymmetry; and a +/-1.0 error can flip the pos/neg label for
    # any entry with |v| within ERR + threshold band of 0 - count it
    assert 0 < n_label_flippable <= len(INTERPOLATED_ENTRIES)
    # pin the measured values so drift is visible (update PARITY.md
    # if these move)
    assert round(max_delta, 4) == 0.7906, (worst_word, max_delta)
    assert worst_word == "apologise"
    # only the low-|valence| slice can flip its label under +/-1.0
    # (norm(|v|-1.0) must cross the 0.05 threshold): 15 of 55 entries
    assert n_label_flippable == 15, n_label_flippable


def test_interpolated_tail_absent_from_gate_corpus():
    """Corpus-level blast radius on the correctness-gate data is
    exactly ZERO: the synthetic documents vocabulary contains no
    interpolated-tail token, so every sentiment oracle result is
    invariant to the tail — a stock-TSV drop-in cannot move any gate
    hash."""
    import duckdb

    from cloud_native_reddit_data_pipeline_spark.functions.vader import (
        INTERPOLATED_ENTRIES,
    )

    con = duckdb.connect()
    ws = {
        r[0]
        for r in con.sql(
            "SELECT DISTINCT unnest(list_filter(regexp_split_to_array("
            "lower(text), '\\s+'), x -> x <> '')) "
            "FROM '/root/testdata/sf0.01/documents.parquet'"
        ).fetchall()
    }
    assert not (ws & set(INTERPOLATED_ENTRIES))
