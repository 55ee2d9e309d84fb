"""Text-analysis operators over the `documents` table: document
frequency / TF-IDF (SURVEY.md O31 relational form), token statistics,
quality scoring, and n-gram language ID — all pure column expressions
with exact SQL oracles (no UDFs, no model state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens

# A small english-function-word list for quality scoring + language ID.
EN_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "for", "on", "with"]
DE_STOPWORDS = ["der", "die", "das", "und", "ist", "ein", "eine", "mit", "von", "zu"]
FR_STOPWORDS = ["le", "la", "les", "et", "est", "un", "une", "avec", "de", "pour"]

LANG_PROFILES: dict[str, list[str]] = {
    "en": EN_STOPWORDS,
    "de": DE_STOPWORDS,
    "fr": FR_STOPWORDS,
}


def doc_frequency(
    df: DataFrame, id_col: str, text_col: str, min_df: int = 2, max_df_frac: float = 0.95
) -> DataFrame:
    """Document-frequency aggregation — the relational core of
    TfidfVectorizer(min_df=2, max_df=0.95) (redditProcessor.py:103-104).
    Returns per-term df + idf over the corpus; min_df/max_df applied as
    a HAVING filter.  explode -> distinct -> groupBy(term): the shuffle
    carries (term, id) pairs once; countDistinct is exact."""
    from ..sources.tables import fan_out

    df = fan_out(df)
    n_docs = df.count()
    term_doc = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    ).distinct()
    return (
        term_doc.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") >= min_df) & (F.col("df") <= int(max_df_frac * n_docs)))
        .select(
            "term",
            "df",
            F.round(F.log((F.lit(1.0) + n_docs) / (F.lit(1.0) + F.col("df"))) + 1.0, 4).alias("idf"),
        )
    )


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document token statistics: whitespace token count, a BPE-ish
    subword-unit count (runs of letters, digits, or single non-space
    symbols — a cheap proxy for tokenizer cost), char count, and average
    token length."""
    toks = tokens(text_col)
    bpe_ish = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"), 0))
    n_tok = F.size(toks)
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        bpe_ish.alias("n_subword_units"),
        F.length(F.col(text_col)).alias("n_chars_measured"),
        F.round(
            F.when(n_tok > 0, (F.length(F.col(text_col)) - (n_tok - 1)) / n_tok).otherwise(0.0), 4
        ).alias("avg_token_len"),
    )


def quality_cols(text_col: str) -> dict[str, "F.Column"]:
    """Per-row quality measures as COLUMN BUILDERS, so callers can
    compute them inside an existing projection without another scan of
    the table (see queries.training_corpus_select)."""
    toks = tokens(text_col)
    n_tok = F.size(toks)
    stop_arr = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
    n_punct = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(r"""[!"#$%&'()*+,\-./:;<=>?@\[\]^_`{|}~]"""), 0)
    )
    n_uniq = F.size(F.array_distinct(toks))
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(0.0)
    punct_ratio = F.when(F.length(F.col(text_col)) > 0, n_punct / F.length(F.col(text_col))).otherwise(0.0)
    uniq_ratio = F.when(n_tok > 0, n_uniq / n_tok).otherwise(0.0)
    length_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    # + 1e-9 before rounding: the weighted sum can land EXACTLY on a
    # .xxxx5 boundary (ratios are small rationals), where engines
    # legitimately disagree (JVM BigDecimal HALF_UP on the shortest
    # decimal repr vs C round on the binary double).  The epsilon pushes
    # boundary values off the knife edge identically everywhere.
    score = (
        F.lit(0.4) * uniq_ratio
        + F.lit(0.3) * length_score
        + F.lit(0.2) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.1) * (F.lit(1.0) - F.least(stop_ratio * 2, F.lit(1.0)))
        + F.lit(1e-9)
    )
    return {
        "n_tokens": n_tok,
        "stopword_ratio": F.round(stop_ratio, 4),
        "punct_ratio": F.round(punct_ratio, 4),
        "uniq_ratio": F.round(uniq_ratio, 4),
        "quality_score": F.round(score, 4),
    }


def quality_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic document-quality scoring for training-data filtering:
    length, stopword ratio, punctuation ratio, uniqueness (distinct/total
    tokens), composite score in [0,1].  All native expressions."""
    cols = quality_cols(text_col)
    return df.select(F.col(id_col), *[c.alias(name) for name, c in cols.items()])


def lang_score_cols(text_col: str) -> dict[str, "F.Column"]:
    """Per-language profile-hit counts as column builders."""
    toks = tokens(F.lower(F.col(text_col)))

    def _profile_hits(words: list[str]):
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    return {lang: _profile_hits(words) for lang, words in LANG_PROFILES.items()}


def pred_lang_col(text_col: str) -> "F.Column":
    """Argmax language prediction as ONE column expression (ties broken
    on language code; 'und' when no profile matches) — composable into
    any projection without a scan of its own."""
    scores = lang_score_cols(text_col)
    langs = sorted(LANG_PROFILES)
    best = None
    for lang in langs:
        best = scores[lang] if best is None else F.greatest(best, scores[lang])
    pred = F.lit("und")
    for lang in reversed(langs):
        pred = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return pred


def langid(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Function-word-profile language ID: score = matches of each
    language's stopword profile; argmax with deterministic tie-break on
    language code; 'und' (undetermined) when no profile matches."""
    scores = lang_score_cols(text_col)
    out = df.select(F.col(id_col), *[scores[lang].alias(f"score_{lang}") for lang in LANG_PROFILES])
    langs = sorted(LANG_PROFILES)
    best = None
    for lang in langs:
        c = F.col(f"score_{lang}")
        best = c if best is None else F.greatest(best, c)
    pred = F.lit("und")
    for lang in reversed(langs):
        pred = F.when(
            (F.col(f"score_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return out.select(id_col, *[f"score_{lang}" for lang in langs], pred.alias("pred_lang"))


def ranked_keyword_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    keywords: list[str],
    k: int = 20,
) -> DataFrame:
    """Relevance-RANKED full-text search — the ES `multi_match` analogue
    (redditProcessor.py:67-75) upgraded from the boolean
    `contains_filter` reduction: per-document TF-IDF score over the
    query keywords, deterministic top-k.

    Scale shape: tokens are filtered to the query keywords BEFORE any
    shuffle, so the per-term and per-doc aggregations move only rows
    that actually hit a keyword (|hits|, not |corpus|); the per-term
    document frequencies are a handful of rows and broadcast back; the
    final top-k is TakeOrderedAndProject (per-partition heap + driver
    merge), never a global sort.  idf = ln((1+N)/(1+df)) + 1, the
    TfidfVectorizer formulation already used by `doc_frequency`; ties
    broken on the id for a deterministic result set.
    """
    kws = sorted({w.lower() for w in keywords})
    n_docs = df.select(F.count(F.lit(1)).alias("_n"))
    hits = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("_t"))
        .select(id_col, F.lower(F.col("_t")).alias("term"))
        .filter(F.col("term").isin(kws))
    )
    tf = hits.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (
        hits.select(id_col, "term")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_hits"),
            F.round(
                F.sum(
                    F.col("tf")
                    * (F.log((F.lit(1.0) + F.col("_n")) / (F.lit(1.0) + F.col("df"))) + 1.0)
                ),
                4,
            ).alias("score"),
        )
    )
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Repetition-based quality measures for training-data filtering
    (the Gopher/MassiveText repetition filters): duplicate-line
    fraction, most-frequent-bigram fraction, duplicate-trigram
    fraction.  High values mark boilerplate/template/spam documents
    that survive length and stopword heuristics.

    Scale shape: line stats are pure array expressions (narrow map);
    the 2- and 3-gram stats share ONE explode and two groupBys keyed on
    the same doc id (the n-grams travel tagged by n, so no second pass
    over the text), and the final join is doc-id-keyed like everything
    else — AQE coalesces the exchanges."""
    from ..functions.text import word_shingles
    from ..sources.tables import fan_out

    df = fan_out(df)
    lines = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\n"),
        lambda x: F.trim(x) != "",
    )
    base = df.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        F.size(F.array_distinct(lines)).alias("_uniq_lines"),
    )
    tag = lambda n: F.transform(  # noqa: E731
        word_shingles(text_col, n),
        lambda g: F.struct(F.lit(n).alias("n"), g.alias("g")),
    )
    grams = df.select(
        F.col(id_col), F.explode(F.concat(tag(2), tag(3))).alias("ng")
    ).select(id_col, F.col("ng.n").alias("n"), F.col("ng.g").alias("g"))
    per = grams.groupBy(id_col, "n", "g").agg(F.count(F.lit(1)).alias("c"))
    two, three = F.col("n") == 2, F.col("n") == 3
    ag = per.groupBy(id_col).agg(
        F.sum(F.when(two, F.col("c"))).alias("_tot2"),
        F.max(F.when(two, F.col("c"))).alias("_top2"),
        F.sum(F.when(three, F.col("c"))).alias("_tot3"),
        F.count(F.when(three, F.lit(1))).alias("_uniq3"),
    )

    def frac(num, den):
        # +1e-9: integer quotients can land exactly on .xxxx5 round
        # boundaries where engine round semantics differ (see
        # quality_cols); the epsilon shifts both engines identically
        return F.round(
            F.when(den > 0, num / den).otherwise(F.lit(0.0)) + F.lit(1e-9), 4
        )

    return base.join(ag, id_col, "left").select(
        id_col,
        "n_lines",
        frac(F.col("n_lines") - F.col("_uniq_lines"), F.col("n_lines")).alias(
            "dup_line_frac"
        ),
        frac(F.coalesce("_top2", F.lit(0)), F.coalesce("_tot2", F.lit(0))).alias(
            "top_bigram_frac"
        ),
        frac(
            F.coalesce("_tot3", F.lit(0)) - F.coalesce("_uniq3", F.lit(0)),
            F.coalesce("_tot3", F.lit(0)),
        ).alias("dup_trigram_frac"),
    )


def top_ngrams(df: DataFrame, text_col: str, n: int = 3, k: int = 100) -> DataFrame:
    """Corpus-wide most-frequent word n-grams — the frequency mining
    behind boilerplate detection and tokenizer-vocabulary construction.

    Scale shape: explode -> groupBy(ngram) with map-side partial
    aggregation (hot n-grams collapse to one row per partition before
    the shuffle), then TakeOrderedAndProject for the top-k (per-partition
    heap + driver merge, never a global sort).  Ties broken on the
    n-gram string so the boundary of the top-k set is deterministic."""
    from ..functions.text import word_shingles

    grams = df.select(F.explode(word_shingles(text_col, n)).alias("ngram"))
    counts = grams.groupBy("ngram").agg(F.count(F.lit(1)).alias("n_occurrences"))
    return counts.orderBy(F.desc("n_occurrences"), F.col("ngram")).limit(k)


def zipf_token_stats(df: DataFrame, text_col: str, k: int = 50) -> DataFrame:
    """Token-frequency head of the corpus with Zipf diagnostics: rank,
    count, frequency relative to the most common token, and the Zipf
    product rank*count normalized by the top count (≈1 under an ideal
    Zipf law).  Used to sanity-check a corpus before tokenizer training.

    Scale shape: the full-vocabulary count uses map-side partial
    aggregation; the top-k cut is TakeOrderedAndProject.  Only THEN does
    the unpartitioned rank window run — over exactly k rows, so the
    single-partition window is a no-op at any corpus size."""
    from pyspark.sql import Window

    counts = (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.col("token"))
        .limit(k)
    )
    w = Window.orderBy(F.desc("n_occurrences"), F.col("token"))
    top = Window.partitionBy()  # k-row frame: max == the head count
    return counts.select(
        "token",
        "n_occurrences",
        F.row_number().over(w).alias("rank"),
        F.round(
            F.col("n_occurrences") / F.max("n_occurrences").over(top), 4
        ).alias("rel_freq"),
        F.round(
            F.row_number().over(w)
            * F.col("n_occurrences")
            / F.max("n_occurrences").over(top),
            4,
        ).alias("zipf_product"),
    )


def _bigram_type_counts(fdf: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, prev, cur, n) rows: per-document bigram TYPE counts over
    lowercase tokens — the shared front-end of the add-k and
    Kneser-Ney LM scorers.  Pairs are built JVM-side (zip_with against
    the shifted slice; tokens only in argument position — the
    word_shingles lesson), then pre-aggregated per (doc, bigram) so
    the model join moves one row per distinct bigram per doc."""
    toks = F.transform(tokens(text_col), lambda t: F.lower(t))
    pair_t = "array<struct<prev:string,cur:string>>"
    zipped = F.zip_with(
        toks,
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
    )
    pairs = F.when(
        F.size(toks) >= 2,
        F.slice(zipped, 1, F.size(toks) - 1),
    ).otherwise(F.array().cast(pair_t))
    inst = fdf.select(F.col(id_col), F.explode(pairs).alias("bg")).select(
        id_col, F.col("bg.prev").alias("prev"), F.col("bg.cur").alias("cur")
    )
    return inst.groupBy(id_col, "prev", "cur").agg(F.count(F.lit(1)).alias("n"))


def bigram_lm_perplexity(
    df: DataFrame, id_col: str, text_col: str, k: float = 0.5
) -> DataFrame:
    """Per-document cross-entropy / perplexity under an add-k-smoothed
    bigram language model trained on the corpus itself — the classic
    perplexity quality filter for training-data curation (documents the
    corpus LM finds surprising are boilerplate, non-language, or noise).

    p(cur|prev) = (c(prev,cur) + k) / (c(prev) + k*V), V = |vocab|;
    cross_entropy(doc) = mean over its bigram instances of -ln p;
    perplexity = exp(cross_entropy).  Docs with < 2 tokens carry NULLs.

    Scale shape: bigram pairs are built JVM-side from the token array
    (zip_with against the shifted slice — tokens only in argument
    position, so the tokenizer runs a constant number of times per ROW,
    never per element; the word_shingles lesson) after a fan_out (the
    explode is the compute-heavy stage; no-op at scale);
    instances pre-aggregate per (doc, bigram) so the count join moves
    one row per distinct bigram per doc, not one per token.  The model
    table is ONE subtree — bigram counts with the context total
    attached via a window over the (vocabulary-sized) count table — so
    the heavy per-doc aggregate feeds exactly two consumers (probe +
    model build) whose identical (prev,cur) exchanges reuse, instead
    of the three separate aggregation branches a c_bg/c_prev join
    chain would re-execute (measured 14.9s -> ~3s at sf0.1 inside the
    v2 capstone).  V is a scalar broadcast.
    """
    from pyspark.sql import Window

    from ..sources.tables import fan_out

    fdf = fan_out(df)
    toks = F.transform(tokens(text_col), lambda t: F.lower(t))
    per_doc = _bigram_type_counts(fdf, id_col, text_col)
    c_model = per_doc.groupBy("prev", "cur").agg(F.sum("n").alias("c")).withColumn(
        "cp", F.sum("c").over(Window.partitionBy("prev"))
    )
    vocab = fdf.select(F.explode(toks).alias("w")).agg(
        F.countDistinct("w").alias("v")
    )
    p = (F.col("c") + F.lit(k)) / (F.col("cp") + F.lit(k) * F.col("v"))
    scored = (
        per_doc.join(c_model, ["prev", "cur"])
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.sum("n").alias("n_bigrams"),
            (F.sum(F.col("n") * -F.log(p)) / F.sum("n")).alias("_ce"),
        )
    )
    # +1e-9 before rounding: see quality_cols (engine round-boundary tie)
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.round(F.col("_ce") + F.lit(1e-9), 4).alias("cross_entropy"),
            F.round(F.exp("_ce") + F.lit(1e-9), 4).alias("perplexity"),
        )
    )


def bm25_idf(n_col, df_col):
    """The Lucene idf term, ln(1 + (N - df + 0.5)/(df + 0.5)) — THE
    single definition shared by the corpus-scan rankers, the fielded
    ranker, and the persistent search index's serving path, so the
    scoring math can never diverge between them (every oracle
    transcribes the identical expression)."""
    return F.log(
        F.lit(1.0) + (n_col - df_col + F.lit(0.5)) / (df_col + F.lit(0.5))
    )


def bm25_tf_sat(tf_col, dl_col, avgdl_col, k1: float, b: float):
    """The BM25 term-frequency saturation + length normalization term
    — the same single-definition discipline as `bm25_idf`."""
    return (tf_col * (F.lit(k1) + 1.0)) / (
        tf_col
        + F.lit(k1)
        * (F.lit(1.0) - F.lit(b) + F.lit(b) * dl_col / avgdl_col)
    )


def _bm25_rank(
    df: DataFrame,
    id_col: str,
    text_col: str,
    hits: DataFrame,
    k: int,
    k1: float,
    b: float,
) -> DataFrame:
    """Shared BM25 scoring body over a (id, term) hits frame: term-
    frequency saturation (k1), document-length normalization (b), the
    Lucene idf ln(1 + (N - df + 0.5)/(df + 0.5)), 4-decimal rounded
    score, (score DESC, id) top-k.  Both the exact and the stemmed
    ranker call this, so the scoring math can never diverge between
    them."""
    lens = df.select(F.col(id_col), F.size(tokens(text_col)).alias("dl"))
    stats = lens.select(
        F.count(F.lit(1)).alias("_n"), F.avg("dl").alias("_avgdl")
    )
    tf = hits.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (
        hits.select(id_col, "term")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    idf = bm25_idf(F.col("_n"), F.col("df"))
    tf_sat = bm25_tf_sat(F.col("tf"), F.col("dl"), F.col("_avgdl"), k1, b)
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(lens, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_hits"),
            F.round(F.sum(idf * tf_sat), 4).alias("score"),
        )
    )
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)


def ranked_keyword_search_bm25(
    df: DataFrame,
    id_col: str,
    text_col: str,
    keywords: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25-ranked full-text search — the actual scoring curve behind ES
    `multi_match` (redditProcessor.py:67-75), vs `ranked_keyword_search`'s
    TF-IDF: term-frequency saturation (k1) and document-length
    normalization (b) with the Lucene idf, ln(1 + (N - df + 0.5)/(df + 0.5)).

    Same 100-TB shape as the TF-IDF form — keyword filter before any
    shuffle, tiny df/avgdl aggregates broadcast back, TakeOrderedAndProject
    top-k — plus one narrow projection for per-document length (token
    array size, no explode/shuffle) whose corpus mean feeds the length
    normalization."""
    kws = sorted({w.lower() for w in keywords})
    hits = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("_t"))
        .select(id_col, F.lower(F.col("_t")).alias("term"))
        .filter(F.col("term").isin(kws))
    )
    return _bm25_rank(df, id_col, text_col, hits, k, k1, b)


def _bm25_field_scores(
    df: DataFrame,
    id_col: str,
    field_toks,
    kws: list[str],
    k1: float,
    b: float,
) -> DataFrame:
    """Per-document raw BM25 score over ONE field's token array:
    field-local tf / df / dl / avgdl (each field is its own BM25
    universe, the Lucene per-field statistics model).  Returns
    (id, n_hits, s) UNROUNDED — the fielded ranker sums boosted field
    scores before the single final rounding.  Same 100-TB shape as
    `_bm25_rank`: keyword filter before any shuffle, tiny df/stats
    aggregates broadcast back."""
    lens = df.select(F.col(id_col), F.size(field_toks).alias("dl"))
    stats = lens.select(
        F.count(F.lit(1)).alias("_n"), F.avg("dl").alias("_avgdl")
    )
    hits = (
        df.select(F.col(id_col), F.explode(field_toks).alias("_t"))
        .select(id_col, F.lower(F.col("_t")).alias("term"))
        .filter(F.col("term").isin(kws))
    )
    tf = hits.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (
        hits.select(id_col, "term")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    idf = bm25_idf(F.col("_n"), F.col("df"))
    tf_sat = bm25_tf_sat(F.col("tf"), F.col("dl"), F.col("_avgdl"), k1, b)
    return (
        tf.join(F.broadcast(dfreq), "term")
        .join(lens, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.sum("tf").alias("n_hits"), F.sum(idf * tf_sat).alias("s"))
    )


def ranked_keyword_search_fielded(
    df: DataFrame,
    id_col: str,
    text_col: str,
    keywords: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    title_len: int = 8,
    title_boost: float = 2.0,
    body_boost: float = 1.0,
) -> DataFrame:
    """Per-field BOOSTED BM25 — the ES `multi_match` field-boost form
    (`fields: ["title^2", "body"]`) the reference's two-field search
    is one flag away from (redditProcessor.py:67-75 passes title +
    selftext unboosted; the boost syntax is the standard ES relevance
    knob this engine previously had no analogue for).  `most_fields`
    combination semantics: each field is scored as its own BM25
    universe (field-local tf, df, dl, avgdl — the Lucene per-field
    statistics model) and the document score is the boost-weighted SUM
    of its field scores, rounded once at the end.

    The corpus here is a single text column, so the field split is a
    deterministic positional one — title = the first ``title_len``
    tokens, body = the rest — which both engines replay exactly
    (array slices; no NLP in the split).  On a corpus with real
    title/body columns, pass each column's tokens straight in.

    Scale shape: two keyword-filtered explodes (pushed ahead of any
    shuffle), per-field df/avgdl aggregates broadcast back, one
    hit-sized full outer join, TakeOrderedAndProject top-k."""
    kws = sorted({w.lower() for w in keywords})
    ts = tokens(text_col)
    title = F.slice(ts, 1, title_len)
    body = F.slice(
        ts,
        title_len + 1,
        F.greatest(F.size(ts) - title_len, F.lit(0)),
    )
    t_s = _bm25_field_scores(df, id_col, title, kws, k1, b).select(
        F.col(id_col),
        F.col("n_hits").alias("_tn"),
        F.col("s").alias("_ts"),
    )
    b_s = _bm25_field_scores(df, id_col, body, kws, k1, b).select(
        F.col(id_col),
        F.col("n_hits").alias("_bn"),
        F.col("s").alias("_bs"),
    )
    return (
        t_s.join(b_s, id_col, "full")
        .select(
            id_col,
            (
                F.coalesce("_tn", F.lit(0)) + F.coalesce("_bn", F.lit(0))
            ).alias("n_hits"),
            F.round(
                F.lit(title_boost) * F.coalesce("_ts", F.lit(0.0))
                + F.lit(body_boost) * F.coalesce("_bs", F.lit(0.0)),
                4,
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def _stem_step1_sql(expr: str) -> str:
    """Porter-lite step 1a (plural stripping) as portable SQL over an
    already-lowercased token: sses→ss · ies→i · keep ss · drop
    trailing s (len > 3)."""
    t = f"({expr})"
    return (
        f"CASE WHEN length{t} > 4 AND right({t}, 4) = 'sses' "
        f"THEN substr({t}, 1, length{t} - 2) "
        f"WHEN length{t} > 3 AND right({t}, 3) = 'ies' "
        f"THEN substr({t}, 1, length{t} - 2) "
        f"WHEN right({t}, 2) = 'ss' THEN {t} "
        f"WHEN length{t} > 3 AND right({t}, 1) = 's' "
        f"THEN substr({t}, 1, length{t} - 1) "
        f"ELSE {t} END"
    )


def _stem_step2_sql(expr: str) -> str:
    """Porter-lite step 1b (ing/ed stripping, vowel-in-stem gated) as
    portable SQL over a step-1a output.  The vowel test is
    translate-based — no regexp, whose flag syntax diverges between
    Spark SQL and DuckDB."""
    s = f"({expr})"
    vowel_ing = (
        f"length(translate(substr({s}, 1, length{s} - 3), 'aeiou', ''))"
        f" < length{s} - 3"
    )
    vowel_ed = (
        f"length(translate(substr({s}, 1, length{s} - 2), 'aeiou', ''))"
        f" < length{s} - 2"
    )
    return (
        f"CASE WHEN length{s} > 4 AND right({s}, 3) = 'ing' AND {vowel_ing} "
        f"THEN substr({s}, 1, length{s} - 3) "
        f"WHEN length{s} > 3 AND right({s}, 2) = 'ed' AND {vowel_ed} "
        f"THEN substr({s}, 1, length{s} - 2) "
        f"ELSE {s} END"
    )


def porter_lite_stem_sql(expr: str) -> str:
    """Deterministic Porter-lite suffix stripper over an (already
    lowercased) token, as PORTABLE SQL — the text runs verbatim in
    Spark SQL and DuckDB (only CASE/length/right/substr/translate, no
    regexp: regexp flag syntax diverges between the engines), so the
    operator and its oracle share one definition by construction.

    Rules (the high-recall slice of Porter steps 1a/1b that covers the
    ES `multi_match` analyzer behavior users actually observe —
    redditProcessor.py:67-75: 'joins'/'joining'/'joined' → 'join'):
      1a. sses→ss · ies→i · keep ss · drop trailing s (len > 3)
      1b. strip 'ing' (len > 4) / 'ed' (len > 3) when a vowel remains
          in the stem (translate-based vowel test)
    Not full Porter (no m-measure, no steps 2-5) — deliberately simple
    enough to be engine-portable and deterministic.  Composed from the
    two step helpers; the Spark operator evaluates the steps as
    SEPARATE projections (the step-1a output feeds step 1b once per
    row, instead of being re-derived inside every step-1b branch —
    CollapseProject keeps non-cheap multiply-referenced aliases in
    their own Project, and the 100x smoke measured the fused form 4x
    slower), while the oracle nests the same texts."""
    return _stem_step2_sql(_stem_step1_sql(expr))


def ranked_keyword_search_stemmed(
    df: DataFrame,
    id_col: str,
    text_col: str,
    keywords: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Stemmed BM25 search — the one ES `multi_match` behavior the
    exact-term rankers miss (redditProcessor.py:67-75 gets an analyzer
    chain for free from Elasticsearch): document tokens AND query
    keywords are both stemmed with `porter_lite_stem_sql`, so
    'joins'/'joining'/'joined' all score against the query 'join'.
    Scoring, length normalization and tie-breaks are exactly
    `ranked_keyword_search_bm25` over the stemmed term space (dl stays
    the raw token count — stemming never changes token counts).

    Scale shape: identical to the exact BM25 (stem is a per-token
    scalar expression inside the same explode), keyword filter before
    any shuffle, tiny df/avgdl aggregates broadcast back, top-k limit.
    The keyword stems are resolved through the SAME SQL expression
    applied to a literal keyword COLUMN (one tiny job, no text
    splicing — keywords with quotes are data, not SQL), so operator
    and oracle can never disagree on the stemmer."""
    spark = df.sparkSession
    kws = sorted({w.lower() for w in keywords})
    kset = sorted(
        {
            r["s"]
            for r in spark.range(1)
            .select(F.explode(F.lit(kws)).alias("kw"))
            .select(F.expr(_stem_step1_sql("kw")).alias("_s1"))
            .select(F.expr(_stem_step2_sql("_s1")).alias("s"))
            .collect()
        }
    )
    # stem-invariant prefix prefilter: the stemmer only strips
    # suffixes, so a token whose stem is in kset must share the stem's
    # first min(3, shortest-stem) characters — a cheap substring isin
    # that discards ~all tokens BEFORE the expensive stem expression
    # (the 100x smoke measured 107s -> 39s with it)
    plen = min(3, min(len(s) for s in kset)) if kset else 3
    prefixes = sorted({s[:plen] for s in kset})
    hits = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("_t"))
        .select(id_col, F.lower(F.col("_t")).alias("term"))
        .filter(F.substring("term", 1, plen).isin(prefixes))
        .withColumn("_s1", F.expr(_stem_step1_sql("term")))
        .select(id_col, F.expr(_stem_step2_sql("_s1")).alias("term"))
        .filter(F.col("term").isin(kset))
    )
    return _bm25_rank(df, id_col, text_col, hits, k, k1, b)


def fuzzy_keyword_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    keywords: list[str],
    max_edits: int = 1,
    k: int = 20,
) -> DataFrame:
    """Edit-distance fuzzy term search — the ES `multi_match`
    ``fuzziness`` behavior (redditProcessor.py:67-75): a document token
    matches a query term when ``levenshtein(token, term) <=
    max_edits`` (typos: 'spakr' ~ 'spark', 'joind' ~ 'joins').
    Returns the top-k documents by (n_terms_matched DESC, n_hits DESC,
    id) with both counts in the output — fuzzy hits are set-shaped, so
    coverage-of-terms outranks raw hit volume (a document matching all
    query terms once beats one repeating a single term).

    Scale shape: per-token cost is |keywords| levenshtein evaluations
    behind a length-window prefilter (abs(len diff) <= max_edits cuts
    most pairs before the O(len^2) distance), via a broadcast
    nested-loop join against the tiny keyword frame — a linear corpus
    scan with no shuffle until the per-document aggregate, then the
    top-k limit."""
    kws = sorted({w.lower() for w in keywords})
    kwdf = (
        df.sparkSession.range(1)
        .select(F.explode(F.lit(kws)).alias("kw"))
        .select("kw", F.length("kw").alias("_kl"))
    )
    toks = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("_t"))
        .select(id_col, F.lower(F.col("_t")).alias("term"))
        .withColumn("_tl", F.length("term"))
    )
    hits = toks.join(
        F.broadcast(kwdf),
        (F.abs(F.col("_tl") - F.col("_kl")) <= max_edits)
        & (F.levenshtein(F.col("term"), F.col("kw")) <= max_edits),
    )
    out = hits.groupBy(id_col).agg(
        F.countDistinct("kw").alias("n_terms"),
        F.count(F.lit(1)).alias("n_hits"),
    )
    return out.orderBy(
        F.desc("n_terms"), F.desc("n_hits"), F.col(id_col)
    ).limit(k)


def unigram_divergence(df: DataFrame, group_col: str, text_col: str) -> DataFrame:
    """Per-group corpus drift: KL divergence and total-variation distance
    between each group's unigram distribution p and the whole-corpus
    distribution q — the standard monitor for source/domain composition
    shift in training-data pipelines (a source whose token distribution
    drifts from the mix is flagged before it skews the model).

    TV is computed from group-present words only:
    0.5*(sum|p-q| + (1 - sum q_present)) — the absent-word mass is
    1 - sum(q over present words), so the full-vocab term never needs an
    outer join against the vocabulary.

    Scale shape: one explode -> (group, word) partial-agg (vocabulary-
    sized, not corpus-sized); corpus counts reuse those partials via a
    second groupBy on word; the join keys are words (natural partitioning
    for vocabulary tables); the final aggregate is one row per group.
    """
    toks = F.transform(tokens(text_col), lambda t: F.lower(t))
    words = df.select(F.col(group_col).alias("_g"), F.explode(toks).alias("_w"))
    gw = words.groupBy("_g", "_w").agg(F.count(F.lit(1)).alias("_ngw"))
    gt = gw.groupBy("_g").agg(
        F.sum("_ngw").alias("_ng"), F.count(F.lit(1)).alias("_vocab_g")
    )
    cw = gw.groupBy("_w").agg(F.sum("_ngw").alias("_nw"))
    tot = cw.agg(F.sum("_nw").alias("_n"))
    p = F.col("_ngw") / F.col("_ng")
    q = F.col("_nw") / F.col("_n")
    per_word = (
        gw.join(cw, "_w")
        .join(gt, "_g")
        .crossJoin(F.broadcast(tot))
        .select(
            "_g",
            "_vocab_g",
            "_ng",
            (p * F.log(p / q)).alias("_klw"),
            F.abs(p - q).alias("_adw"),
            q.alias("_qw"),
        )
    )
    return (
        per_word.groupBy("_g")
        .agg(
            F.first("_ng").alias("n_tokens"),
            F.first("_vocab_g").alias("vocab_size"),
            F.round(F.sum("_klw") + F.lit(1e-9), 6).alias("kl_to_corpus"),
            F.round(
                F.lit(0.5) * (F.sum("_adw") + (F.lit(1.0) - F.sum("_qw")))
                + F.lit(1e-9),
                6,
            ).alias("tv_to_corpus"),
        )
        .withColumnRenamed("_g", group_col)
    )


def count_min_sketch(
    df: DataFrame,
    text_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Mergeable count-min sketch of the corpus token stream as a
    DataFrame of (row, col, cnt) counters — the streaming-friendly
    frequency summary (point lookups overestimate, never underestimate).
    Hashes are md5-slice based (identical in any engine), so the sketch
    is bit-reproducible and exactly oracle-checkable, unlike opaque
    binary sketch buffers.

    Scale shape: explode -> narrow hash projection -> one partial-agg
    shuffle bounded by depth*width counters regardless of corpus size;
    sketches of corpus shards merge by summing counters on (row, col) —
    the property that makes the sketch a distributed aggregate."""
    toks = F.transform(tokens(text_col), lambda t: F.lower(t))
    w = df.select(F.explode(toks).alias("w"))
    rows = [
        w.select(
            F.lit(d).alias("row"),
            (
                F.conv(
                    F.substring(F.md5(F.concat_ws("|", F.lit(str(d)), F.col("w"))), 1, 8),
                    16,
                    10,
                ).cast("long")
                % width
            ).alias("col"),
        )
        for d in range(depth)
    ]
    allrows = rows[0]
    for r in rows[1:]:
        allrows = allrows.unionByName(r)
    return allrows.groupBy("row", "col").agg(F.count(F.lit(1)).alias("cnt"))


def cms_point_estimates(
    df: DataFrame,
    text_col: str,
    top_n: int = 20,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-min point queries for the corpus's top-N exact tokens:
    estimate = min over the depth counters each token hashes into.
    Emits (token, exact count, estimate) — the estimate provably >=
    exact, with error bounded by the sketch shape; having both columns
    oracle-checked pins the whole sketch construction."""
    sketch = count_min_sketch(df, text_col, depth, width)
    toks = F.transform(tokens(text_col), lambda t: F.lower(t))
    exact = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("w"))
        .limit(top_n)
    )
    probes = exact.select(
        "w",
        "exact_cnt",
        *[
            (
                F.conv(
                    F.substring(F.md5(F.concat_ws("|", F.lit(str(d)), F.col("w"))), 1, 8),
                    16,
                    10,
                ).cast("long")
                % width
            ).alias(f"_c{d}")
            for d in range(depth)
        ],
    )
    est = None
    joined = probes
    for d in range(depth):
        s = sketch.filter(F.col("row") == d).select(
            F.col("col").alias(f"_c{d}"), F.col("cnt").alias(f"_cnt{d}")
        )
        joined = joined.join(F.broadcast(s), f"_c{d}")
    est = F.least(*[F.col(f"_cnt{d}") for d in range(depth)])
    return joined.select(
        F.col("w").alias("token"),
        "exact_cnt",
        est.alias("cms_estimate"),
    )


def token_label_chi2(
    df: DataFrame,
    label_col: str,
    text_col: str,
    min_df: int = 5,
    top_n: int = 40,
) -> DataFrame:
    """Token-label association strength: per-token chi-square statistic
    over the (token-presence x label) contingency table — the standard
    label-leakage / shortcut-feature detector for training corpora (a
    token whose presence nearly determines the source/label is either a
    boilerplate artifact or a leak; both need review before training).

    For token t with document frequency n_t over N docs and label s with
    n_s docs, the observed present-cell is O_ts = |docs in s containing
    t|, expected E_ts = n_t * n_s / N, and the full 2xK statistic is

        chi2_t = sum_s (O_ts - E_ts)^2 * (1/E_ts + 1/(n_s - E_ts))

    (the absent row folds into the closed form).  Tokens with n_t <
    `min_df` or n_t = N are excluded (degenerate/zero-variance tables).

    Scale shape: one distinct (doc, token) explode -> two vocabulary-
    sized partial aggs (per-token, per-(token,label)) plus a labels-
    sized broadcast grid; nothing is ever corpus x vocab.  Output is
    the top_n tokens by chi2 — a bounded report."""
    toks = F.array_distinct(F.transform(tokens(text_col), lambda t: F.lower(t)))
    dt = df.select(
        F.col(label_col).alias("_s"), F.explode(toks).alias("_t")
    )
    n_docs = df.agg(F.count(F.lit(1)).alias("_n"))
    tok_df = dt.groupBy("_t").agg(F.count(F.lit(1)).alias("_nt"))
    lab_counts = df.groupBy(F.col(label_col).alias("_s")).agg(
        F.count(F.lit(1)).alias("_ns")
    )
    present = dt.groupBy("_t", "_s").agg(F.count(F.lit(1)).alias("_o"))
    grid = (
        tok_df.crossJoin(F.broadcast(lab_counts))
        .join(present, ["_t", "_s"], "left")
        .crossJoin(F.broadcast(n_docs))
        .filter((F.col("_nt") >= min_df) & (F.col("_nt") < F.col("_n")))
    )
    e = F.col("_nt") * F.col("_ns") / F.col("_n")
    o = F.coalesce(F.col("_o"), F.lit(0)).cast("double")
    cell = (o - e) * (o - e) * (F.lit(1.0) / e + F.lit(1.0) / (F.col("_ns") - e))
    out = (
        grid.select("_t", "_nt", cell.alias("_c"))
        .groupBy("_t")
        .agg(
            F.first("_nt").alias("doc_freq"),
            # per-cell round-to-1e-6 THEN exact integer sum: double
            # addition order across partitions/retries is not
            # deterministic, so summing raw double cells could flip a
            # ROUND boundary between reruns (round-5 advice); the
            # scaled-integer sum is order-free
            F.round(
                F.sum(F.round(F.col("_c") * F.lit(1e6)).cast("long"))
                / F.lit(1e6)
                + F.lit(1e-9),
                6,
            ).alias("chi2"),
        )
        .select(
            F.col("_t").alias("token"),
            F.col("doc_freq").cast("long").alias("doc_freq"),
            "chi2",
        )
    )
    return out.orderBy(F.desc("chi2"), F.col("token")).limit(top_n)


def inverted_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int = 5,
    top_n: int = 50,
) -> DataFrame:
    """Materialized inverted index: for each sufficiently frequent
    term, the sorted posting list of containing document ids plus
    document frequency and collection frequency — the search-engine
    build step behind `ranked_search`/`ranked_search_bm25` (those
    recompute postings per query; a real deployment materializes this
    table once and semi-joins it).

    Scale shape: explode -> one (term, doc) partial count (collection
    frequency falls out of the same pass) -> per-term sort-collect.
    Posting lists are per-term local sorts (no global order), and the
    df >= `min_df` filter plus top_n bound the output; at 100 TB the
    same plan writes the full index partitioned by term hash instead
    of limiting."""
    toks = F.transform(tokens(text_col), lambda t: F.lower(t))
    td = (
        df.select(F.col(id_col).alias("_d"), F.explode(toks).alias("_t"))
        .groupBy("_t", "_d")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    return (
        td.groupBy("_t")
        .agg(
            F.count(F.lit(1)).alias("doc_freq"),
            F.sum("_tf").alias("coll_freq"),
            F.sort_array(F.collect_list("_d")).alias("postings"),
        )
        .filter(F.col("doc_freq") >= min_df)
        .select(
            F.col("_t").alias("term"),
            F.col("doc_freq").cast("long").alias("doc_freq"),
            F.col("coll_freq").cast("long").alias("coll_freq"),
            "postings",
        )
        .orderBy(F.desc("doc_freq"), F.col("term"))
        .limit(top_n)
    )


def readability_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Flesch reading-ease and Flesch-Kincaid grade per document, with
    a deterministic vowel-group syllable heuristic (count maximal
    [aeiouy]+ runs per word, minimum 1) — the classic text-quality
    signal a training-data pipeline uses alongside `quality_scores`
    (length/punct ratios there; linguistic complexity here).  The
    heuristic is the standard cheap approximation; both engines run
    the IDENTICAL regex so the score is exact-parity even where the
    heuristic miscounts English edge cases.

        ease  = 206.835 - 1.015*(words/sentences) - 84.6*(syllables/words)
        grade = 0.39*(words/sentences) + 11.8*(syllables/words) - 15.59

    Sentences = maximal [.!?]+ runs (minimum 1).  One narrow projection
    — array expressions over the token split, no explode, no shuffle;
    scan -> map at any corpus size."""
    toks = tokens(text_col)
    n_words = F.greatest(F.size(toks), F.lit(1))
    syl_per_word = F.transform(
        toks,
        lambda w: F.greatest(
            F.size(F.regexp_extract_all(F.lower(w), F.lit("[aeiouy]+"), F.lit(0))),
            F.lit(1),
        ),
    )
    n_syllables = F.aggregate(
        syl_per_word, F.lit(0), lambda acc, x: acc + x
    )
    n_sentences = F.greatest(
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit("[.!?]+"), F.lit(0))
        ),
        F.lit(1),
    )
    wps = n_words.cast("double") / n_sentences
    spw = n_syllables.cast("double") / n_words
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        n_sentences.cast("long").alias("n_sentences"),
        n_syllables.cast("long").alias("n_syllables"),
        F.round(
            F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw + F.lit(1e-9),
            4,
        ).alias("flesch_ease"),
        F.round(
            F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59) + F.lit(1e-9),
            4,
        ).alias("fk_grade"),
    )


# Unicode script classes as EXPLICIT code-point ranges: Java regex
# (Spark) spells script properties \p{IsHan} while RE2 (DuckDB) spells
# them \p{Han}, and their Unicode tables can differ by version — raw
# ranges have identical semantics in both engines, so the per-script
# counts are exactly comparable.
SCRIPT_RANGES: dict[str, str] = {
    "latin": "A-Za-z",
    "cjk": "\\u4e00-\\u9fff",
    "cyrillic": "\\u0400-\\u04ff",
    "arabic": "\\u0600-\\u06ff",
}


def unicode_script_profile(
    df: DataFrame, id_col: str, text_col: str, round_to: int = 4
) -> DataFrame:
    """Per-document writing-script profile: counts and ratios of
    characters in each major Unicode script block — the
    language-coverage / mojibake audit a multilingual training corpus
    runs before mixing sources (a "lang=en" shard with 30% CJK bytes is
    mislabeled or corrupted).  Pure narrow map (regexp counts per
    range), scan-bound at 100 TB — no shuffle, no UDF."""
    counts = {
        name: F.size(
            F.regexp_extract_all(
                F.col(text_col), F.lit(f"[{rng}]"), F.lit(0)
            )
        ).cast("long")
        for name, rng in SCRIPT_RANGES.items()
    }
    n_chars = F.length(text_col).cast("long")
    known = None
    for c in counts.values():
        known = c if known is None else known + c
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        *[c.alias(f"n_{name}") for name, c in counts.items()],
        (n_chars - known).alias("n_other"),
        F.round(
            counts["latin"] / F.greatest(n_chars, F.lit(1)).cast("double")
            + F.lit(1e-9),
            round_to,
        ).alias("latin_ratio"),
        (
            (counts["cjk"] + counts["cyrillic"] + counts["arabic"])
            > (n_chars / F.lit(10))
        ).alias("nonlatin_flag"),
    )


def zipf_token_spectrum(df: DataFrame, text_col: str) -> DataFrame:
    """Token-frequency spectrum in log2 buckets: for each power-of-two
    band of term frequency, how many distinct terms fall in it and how
    much corpus mass they carry — the Zipf/head-tail diagnostic run
    before tokenizer training (a healthy natural corpus shows a smooth
    power-law decay; a synthetic or templated one shows spikes).

    Exactness: bucket = floor(log2(freq)) computed as
    length(bin(freq)) - 1 — pure integer/string ops, identical in both
    engines (FLOOR(LOG2(2^k)) can land on k-1 in floating point).
    Scale shape: explode -> one (term) partial-agg shuffle -> one
    bucket-sized aggregate (<= 64 rows); nothing is globally sorted."""
    from ..functions.text import tokens
    from ..sources.tables import fan_out

    toks = fan_out(df).select(
        F.explode(F.transform(tokens(text_col), lambda t: F.lower(t))).alias(
            "_t"
        )
    )
    freqs = toks.groupBy("_t").agg(F.count(F.lit(1)).alias("_f"))
    bucket = (F.length(F.bin(F.col("_f"))) - 1).cast("int")
    return (
        freqs.groupBy(bucket.alias("log2_freq_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("_f").alias("total_occurrences"),
            F.min("_f").alias("min_freq"),
            F.max("_f").alias("max_freq"),
        )
        .select(
            "log2_freq_bucket",
            F.col("n_terms").cast("long").alias("n_terms"),
            F.col("total_occurrences").cast("long").alias("total_occurrences"),
            F.col("min_freq").cast("long").alias("min_freq"),
            F.col("max_freq").cast("long").alias("max_freq"),
        )
    )


def phrase_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    phrase_terms: list,
    prox_window: int = 3,
    top_n: int = 20,
) -> DataFrame:
    """Positional phrase + proximity search over a token-position
    inverted index (the Elasticsearch `match_phrase` / `slop`
    semantics the reference's search API exposes, re-expressed as
    equi-joins -- reference query surface:
    elasticsearch_sydney.py match queries).

    phrase_hits: occurrences of the EXACT consecutive phrase (terms at
    positions p, p+1, ..., p+n-1).  near_hits: unordered co-occurrence
    of the first two terms within `prox_window` tokens (classic slop
    proximity).  Returns the top_n documents by (phrase_hits DESC,
    near_hits DESC, id) with the first phrase position.

    Scale shape: postings are filtered to the query terms BEFORE any
    shuffle (a ~|terms|/|vocab| selectivity cut that reaches the scan
    via the explode-then-filter pipeline), then each phrase step is a
    hash equi-join on (id, pos + offset) -- never a cross join and
    never a per-doc window.  The proximity leg is a banded join on the
    same filtered postings, bounded by the query-term posting lists."""
    terms = [t.lower() for t in phrase_terms]
    if len(terms) < 2:
        raise ValueError("phrase_terms needs at least two terms")
    from ..sources.tables import fan_out

    postings = (
        fan_out(df)
        .select(
            F.col(id_col),
            F.posexplode(F.transform(tokens(text_col), F.lower)).alias(
                "_p0", "_t"
            ),
        )
        .where(F.col("_t").isin(terms))
        .select(id_col, (F.col("_p0") + 1).alias("pos"), "_t")
    )
    return phrase_rank_from_postings(
        postings, id_col, terms, prox_window, top_n
    )


def phrase_rank_from_postings(
    postings: DataFrame,
    id_col: str,
    terms: list,
    prox_window: int = 3,
    top_n: int = 20,
) -> DataFrame:
    """The phrase/proximity ranking body over an ALREADY-FILTERED
    (id, pos, _t) positional-postings frame — extracted so the
    corpus-scan `phrase_search` and the persistent search index's
    phrase query share ONE definition of the join chain, scoring, and
    tie-break (positions 1-based)."""
    base = postings.where(F.col("_t") == terms[0]).select(id_col, "pos")
    for i, t in enumerate(terms[1:], start=1):
        step = postings.where(F.col("_t") == t).select(
            F.col(id_col), (F.col("pos") - F.lit(i)).alias("_start")
        )
        base = base.join(
            step,
            (base[id_col] == step[id_col]) & (base["pos"] == step["_start"]),
        ).select(base[id_col], base["pos"])
    phrase = base.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("phrase_hits"),
        F.min("pos").alias("first_pos"),
    )
    pa = postings.where(F.col("_t") == terms[0]).select(
        F.col(id_col).alias("_ida"), F.col("pos").alias("_pa")
    )
    pb = postings.where(F.col("_t") == terms[1]).select(
        F.col(id_col).alias("_idb"), F.col("pos").alias("_pb")
    )
    near = (
        pa.join(
            pb,
            (F.col("_ida") == F.col("_idb"))
            & (F.abs(F.col("_pa") - F.col("_pb")) <= prox_window)
            & (F.col("_pa") != F.col("_pb")),
        )
        .groupBy(F.col("_ida").alias(id_col))
        .agg(F.count(F.lit(1)).alias("near_hits"))
    )
    return (
        phrase.join(near, id_col, "left")
        .select(
            id_col,
            F.col("phrase_hits").cast("long").alias("phrase_hits"),
            F.coalesce("near_hits", F.lit(0)).cast("long").alias("near_hits"),
            F.col("first_pos").cast("long").alias("first_pos"),
        )
        .orderBy(
            F.desc("phrase_hits"), F.desc("near_hits"), F.col(id_col)
        )
        .limit(top_n)
    )


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with", "a"]


def gopher_quality_gate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher/MassiveText-style composite quality GATE (Rae et al.
    2021, Appendix A): per-document accept/reject booleans for each
    rule plus the conjunction -- the single filter a corpus-selection
    pipeline thresholds on, composing the signals `quality_scores` and
    `repetition_stats` expose individually.

    Rules (adapted to the whitespace corpus; every ratio compared in
    EXACT integer arithmetic so both engines agree bit-for-bit):
      words_ok:    min_words <= n_words <= max_words
      mean_len_ok: mean word length in [3, 10]  (3n <= sum_len <= 10n)
      alpha_ok:    >= 80% of words contain an alphabetic char
                   (5*alpha_cnt >= 4*n)
      stop_ok:     >= min_stop_hits DISTINCT required stopwords
      bigram_ok:   most-frequent bigram covers <= 20% of bigrams
                   (5*top_bg <= n_bigrams; vacuously true below 2 words)

    Scale shape: ONE token explode + doc-keyed hash aggregate computes
    every word-level statistic (count, summed length, alpha count,
    distinct stopword hits), and the bigram rule shares one shingle
    explode and two doc-keyed groupBys -- the `repetition_stats` plan
    shape.  The rule booleans are built ON TOP of the aggregated
    integers: an aggregate is a predicate-pushdown barrier, so a
    downstream filter on pass_gate compares six ints per doc instead
    of inlining ~14 copies of the interpreted higher-order tokenizer
    chain into the scan filter (the array-expression form measured
    ~6x the per-row cost in the 10x scale smoke)."""
    from ..functions.text import word_shingles
    from ..sources.tables import fan_out

    df = fan_out(df)
    stops = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    words = df.select(
        F.col(id_col),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("_w"),
    )
    stats = words.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.length("_w")).alias("_sum_len"),
        F.count(F.when(F.col("_w").rlike("[a-z]"), F.lit(1))).alias(
            "_alpha_cnt"
        ),
        F.count_distinct(
            F.when(F.array_contains(stops, F.col("_w")), F.col("_w"))
        ).alias("_stop_hits"),
    )
    n = F.coalesce("_n", F.lit(0))
    sum_len = F.coalesce("_sum_len", F.lit(0))
    alpha_cnt = F.coalesce("_alpha_cnt", F.lit(0))
    stop_hits = F.coalesce("_stop_hits", F.lit(0))
    base = (
        df.select(id_col)
        .join(stats, id_col, "left")  # empty docs fell out of the explode
        .select(
            F.col(id_col),
            n.cast("long").alias("n_words"),
            ((n >= min_words) & (n <= max_words)).alias("words_ok"),
            ((sum_len >= 3 * n) & (sum_len <= 10 * n)).alias("mean_len_ok"),
            (5 * alpha_cnt >= 4 * n).alias("alpha_ok"),
            (stop_hits >= min_stop_hits).alias("stop_ok"),
        )
    )
    bg = (
        df.select(
            F.col(id_col),
            F.explode(word_shingles(F.lower(F.col(text_col)), 2)).alias("_g"),
        )
        .groupBy(id_col, "_g")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col)
        .agg(
            F.max("_c").alias("_top_bg"),
            F.sum("_c").alias("_n_bg"),
        )
    )
    return (
        base.join(bg, id_col, "left")
        .select(
            id_col,
            "n_words",
            "words_ok",
            "mean_len_ok",
            "alpha_ok",
            "stop_ok",
            F.coalesce(
                5 * F.col("_top_bg") <= F.col("_n_bg"), F.lit(True)
            ).alias("bigram_ok"),
        )
        .withColumn(
            "pass_gate",
            F.col("words_ok")
            & F.col("mean_len_ok")
            & F.col("alpha_ok")
            & F.col("stop_ok")
            & F.col("bigram_ok"),
        )
    )


def hashed_linear_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 4096,
) -> DataFrame:
    """fastText-style hashed linear classifier scorer — the CCNet /
    quality-gate architecture (Joulin et al. 2017: bag of hashed
    unigram+bigram features, linear scorer) as one Spark plan: lowercase
    tokens plus word bigrams hash into `n_buckets` feature buckets, each
    bucket carries a weight, the document logit is the weighted feature
    sum, and the label thresholds the logit at 0.

    Weights here are deterministic pseudo-weights — a Knuth
    multiplicative hash of the bucket id mapped to [-1.000, 1.000] at
    1e-3 resolution — so both engines reproduce them bit-exactly and
    the whole scorer is value-hash-verifiable.  A TRAINED model drops
    in by replacing the weight expression with a broadcast
    (bucket -> weight) lookup; nothing else in the plan changes.

    Scale shape: explode of unigrams+bigrams is a narrow map (the
    word_shingles zip_with form — tokenizer runs O(1) per row, not per
    element); bucketing and the weight are integer column math; the
    only shuffle is the doc-keyed integer SUM (map-side combined).
    Exact integer logits (scale 3) — no float accumulation anywhere."""
    from ..functions.text import word_shingles
    from ..sources.tables import fan_out

    lowered = F.lower(F.col(text_col))
    feats = F.concat(tokens(lowered), word_shingles(lowered, 2))
    ex = fan_out(df).select(F.col(id_col), F.explode(feats).alias("_f"))
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("_f")), 1, 8), 16, 10).cast("long"),
        F.lit(n_buckets),
    )
    w_e3 = F.pmod(bucket * F.lit(2654435761), F.lit(2001)) - F.lit(1000)
    per = (
        ex.select(F.col(id_col), w_e3.alias("_w"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("_nf"),
            F.sum("_w").alias("_logit"),
        )
    )
    return (
        df.select(id_col)
        .join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce("_nf", F.lit(0)).cast("long").alias("n_features"),
            F.coalesce("_logit", F.lit(0)).cast("long").alias("logit_e3"),
            F.when(F.coalesce("_logit", F.lit(0)) > 0, F.lit("keep"))
            .otherwise(F.lit("drop"))
            .alias("label"),
        )
    )


def kneser_ney_perplexity(
    df: DataFrame, id_col: str, text_col: str, discount: float = 0.75
) -> DataFrame:
    """Per-document perplexity under an interpolated Kneser-Ney bigram
    model trained on the corpus itself — the smoothing every serious
    n-gram quality filter (KenLM/CCNet) actually uses, vs
    `bigram_lm_perplexity`'s add-k:

        p(cur|prev) = max(c(prev,cur) - d, 0) / c(prev)
                      + d * N1+(prev,.) / c(prev) * Pcont(cur)
        Pcont(cur)  = N1+(., cur) / |distinct bigram types|

    The continuation probability is what distinguishes KN: a word seen
    after MANY contexts backs off strongly, a word frequent in one
    context only does not.  Probe bigrams always exist in the model
    (trained on the same corpus), so the formula needs no unseen-event
    branch here.

    Scale shape: shares `_bigram_type_counts` with the add-k scorer;
    the model adds two vocabulary-partitioned windows (context total +
    distinct-successor count per prev; distinct-predecessor count per
    cur) on the bigram TYPE table, and the type-count total is a
    broadcast scalar — never a global window over the type table."""
    from pyspark.sql import Window

    from ..sources.tables import fan_out

    fdf = fan_out(df)
    # the per-doc bigram table feeds THREE subtrees (the model groupBy,
    # the type-count total, and the scoring join); without pinning, the
    # corpus-proportional explode+groupBy pass executes once per
    # subtree (plan audit: 6 Generate nodes, 0 ReusedExchange).
    # persist(), not localCheckpoint: the SQL cache stores compressed
    # columnar batches that EVICT under execution pressure and are
    # released by spark.catalog.clearCache() (a localCheckpoint's
    # deserialized row blocks are neither — a 100x smoke OOMed the
    # executor heap on exactly that residency), and it keeps the
    # child plan's parquet-derived statistics so downstream join
    # strategies stay data-driven.
    per_doc = _bigram_type_counts(fdf, id_col, text_col).persist()
    c_model = (
        per_doc.groupBy("prev", "cur")
        .agg(F.sum("n").alias("c"))
        .withColumn("cp", F.sum("c").over(Window.partitionBy("prev")))
        .withColumn("n1p_prev", F.count(F.lit(1)).over(Window.partitionBy("prev")))
        .withColumn("n1p_cur", F.count(F.lit(1)).over(Window.partitionBy("cur")))
    )
    btot = per_doc.select("prev", "cur").distinct().agg(
        F.count(F.lit(1)).alias("bt")
    )
    d = F.lit(float(discount))
    p = (
        F.greatest(F.col("c") - d, F.lit(0.0)) / F.col("cp")
        + d * F.col("n1p_prev") / F.col("cp")
        * (F.col("n1p_cur") / F.col("bt"))
    )
    scored = (
        # the model side must NEVER broadcast: its real size is bigram-
        # type-table-sized (driver-fatal at large corpora), but the
        # checkpoint above replaces the parquet-derived statistics that
        # used to steer Catalyst away from broadcasting it (measured: a
        # 100x smoke OOMed the driver on exactly this join once per_doc
        # was checkpointed).  Pin the scale-safe strategy explicitly.
        per_doc.join(c_model.hint("merge"), ["prev", "cur"])
        .crossJoin(F.broadcast(btot))
        .groupBy(id_col)
        .agg(
            F.sum("n").alias("n_bigrams"),
            (F.sum(F.col("n") * -F.log(p)) / F.sum("n")).alias("_ce"),
        )
    )
    out = (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.round(F.col("_ce") + F.lit(1e-9), 4).alias("cross_entropy"),
            F.round(F.exp("_ce") + F.lit(1e-9), 4).alias("perplexity"),
        )
    )
    # The per_doc pin must not outlive the call: persist() registers in
    # the CacheManager at call time and is never GC-reclaimed, so a
    # lazily returned frame leaks the pin into every later query in the
    # session (the tests' cache-idle gate catches exactly this — the
    # round-14 persist change shipped the leak because only the
    # targeted suites were re-run).  The output is one narrow row per
    # document — far smaller than the pinned bigram table — so the
    # standard materialize-and-release discipline applies; the
    # checkpointed blocks are MEMORY_AND_DISK and ContextCleaner-
    # reclaimed once the frame is dropped.
    from ..caching import materialize_and_release

    return materialize_and_release(out, per_doc)


def classifier_calibration(
    df: DataFrame, id_col: str, text_col: str, n_bins: int = 10
) -> DataFrame:
    """Reliability-diagram table (the ECE input) for the hashed linear
    classifier, scored against the Gopher integer-rule gate as the
    reference labels — the calibration audit a pipeline runs before
    trusting a learned quality filter's scores as probabilities
    (Guo et al. 2017's binned confidence-vs-accuracy table).

    Confidence is a HARD sigmoid of the logit — clip(x/6 + 1/2, 0, 1),
    the published piecewise-linear sigmoid surrogate — kept in exact
    integer arithmetic: with logits at scale 1e3, conf*3e6 =
    clamp(1_500_000 + logit_e3*500, 0, 3_000_000).  Every output is a
    floor-divided ppm integer of non-negative operands (Spark `div`
    truncation == DuckDB `//` floor on non-negatives), so the whole
    table is hash-stable with no float anywhere.

    Bins are logit deciles over a total order (logit, id), built on the
    distributed rank (`with_global_row_numbers` + `ntile_from_rank`) —
    no single-partition window at any corpus size.  Per bin:
    n_docs, n_pos (gate passes), conf_ppm (mean hard-sigmoid
    confidence), acc_ppm (observed pass rate), gap_ppm (|acc - conf|,
    the bin's ECE contribution before the n_b/N weighting)."""
    from .relational import ntile_from_rank, with_global_row_numbers

    scored = hashed_linear_score(df, id_col, text_col).select(id_col, "logit_e3")
    gate = gopher_quality_gate(df, id_col, text_col).select(id_col, "pass_gate")
    conf3 = F.greatest(
        F.lit(0).cast("long"),
        F.least(
            F.lit(3_000_000).cast("long"),
            (F.lit(1_500_000) + F.col("logit_e3") * 500).cast("long"),
        ),
    )
    j = scored.join(gate, id_col).select(
        F.col(id_col), F.col("logit_e3"), F.col("pass_gate"), conf3.alias("_c3")
    )
    ranked = with_global_row_numbers(
        j, [F.asc("logit_e3"), F.asc(id_col)], col_name="_rn"
    )
    n_df = F.broadcast(ranked.agg(F.count(F.lit(1)).alias("_n")))
    binned = ranked.crossJoin(n_df).select(
        ntile_from_rank(F.col("_rn"), F.col("_n"), n_bins).alias("bin"),
        "pass_gate",
        "_c3",
    )
    per = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("pass_gate"), 1).otherwise(0)).alias("n_pos"),
        F.sum("_c3").alias("_sum_c3"),
    )
    return per.select(
        F.col("bin").cast("long").alias("bin"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.expr("_sum_c3 div (3 * n_docs)").cast("long").alias("conf_ppm"),
        F.expr("(1000000 * n_pos) div n_docs").cast("long").alias("acc_ppm"),
        F.expr(
            "abs(_sum_c3 div (3 * n_docs) - (1000000 * n_pos) div n_docs)"
        ).cast("long").alias("gap_ppm"),
    )


def perplexity_buckets(
    df: DataFrame, id_col: str, text_col: str, n_buckets: int = 3
) -> DataFrame:
    """CCNet's perplexity bucketing (Wenzek et al. 2020): rank every
    document by its Kneser-Ney LM perplexity and split the corpus into
    head / middle / tail terciles — head feeds training, tail gets
    dropped or down-weighted.  The canonical LM-quality partitioning
    step between scoring and selection.

    Rank is over the ROUNDED perplexity (4 decimals — the value both
    engines already agree on bit-for-bit in `kneser_ney_perplexity`)
    with id tie-breaks and NULLS LAST (unscorable empty docs land in
    the tail), so bucket assignment is a deterministic total order.
    Buckets come from the distributed rank + integer ntile — no
    single-partition sort at any corpus size; the LM scoring itself
    rides the shared vocabulary-partitioned KN plan."""
    from .relational import ntile_from_rank, with_global_row_numbers

    names = {1: "head", 2: "middle", 3: "tail"}
    ppl = kneser_ney_perplexity(df, id_col, text_col)
    ranked = with_global_row_numbers(
        ppl,
        [F.asc_nulls_last("perplexity"), F.asc(id_col)],
        col_name="ppl_rank",
    )
    n_df = F.broadcast(ranked.agg(F.count(F.lit(1)).alias("_n")))
    tile = ntile_from_rank(F.col("ppl_rank"), F.col("_n"), n_buckets)
    bucket = F.lit(None).cast("string")
    for idx in range(n_buckets, 0, -1):
        bucket = F.when(tile == idx, F.lit(names.get(idx, str(idx)))).otherwise(
            bucket
        )
    return ranked.crossJoin(n_df).select(
        F.col(id_col),
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        "perplexity",
        F.col("ppl_rank").cast("long").alias("ppl_rank"),
        bucket.alias("bucket"),
    )


def self_bleu_diversity(
    df: DataFrame, id_col: str, text_col: str, sample_size: int = 50
) -> DataFrame:
    """Corpus diversity audit via micro-averaged self-BLEU-2 (Zhu et
    al. 2018's Texygen metric): how much each document's bigrams are
    covered by the REST of the corpus — high values flag templated /
    mode-collapsed text (synthetic-data QA runs this before mixing
    generated corpora into training data).

    Pairwise by nature, so it runs on a DETERMINISTIC hash-ordered
    sample (`sample_size` smallest md5(id) — stable across runs,
    engines, and partitionings; the sample size is the compute knob and
    the ONLY thing that grows the pairwise stage, never the corpus).
    Per sampled doc: clipped bigram matches summed over all other
    sampled docs, micro-averaged as a ppm ratio-of-sums (floor-divided
    non-negative integers -> hash-stable, no float anywhere).

    Scale shape: distributed TakeOrdered for the sample (no global
    sort materialization), one bigram explode over `sample_size` docs,
    and a gram-keyed self-join bounded by the sample, not the corpus."""
    from ..functions.text import word_shingles

    lowered = F.lower(F.col(text_col))
    sample = (
        df.select(F.col(id_col), lowered.alias("_t"))
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(sample_size)
    )
    grams = (
        sample.select(
            F.col(id_col), F.explode(word_shingles(F.col("_t"), 2)).alias("_g")
        )
        .groupBy(id_col, "_g")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    nb = grams.groupBy(id_col).agg(F.sum("_c").alias("n_bigrams"))
    s_cnt = F.broadcast(sample.agg(F.count(F.lit(1)).alias("_s")))
    a = grams.select(
        F.col(id_col).alias("_ida"), F.col("_g"), F.col("_c").alias("_ca")
    )
    b = grams.select(
        F.col(id_col).alias("_idb"), F.col("_g"), F.col("_c").alias("_cb")
    )
    clipped = (
        a.join(b, "_g")
        .filter(F.col("_ida") != F.col("_idb"))
        .groupBy(F.col("_ida").alias(id_col))
        .agg(F.sum(F.least("_ca", "_cb")).alias("sum_clipped"))
    )
    return (
        sample.select(id_col)
        .join(nb, id_col, "left")
        .join(clipped, id_col, "left")
        .crossJoin(s_cnt)
        .select(
            F.col(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("sum_clipped", F.lit(0)).cast("long").alias("sum_clipped"),
            F.when(
                (F.coalesce("n_bigrams", F.lit(0)) > 0) & (F.col("_s") > 1),
                F.expr(
                    "(1000000 * coalesce(sum_clipped, 0)) "
                    "div ((_s - 1) * n_bigrams)"
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("selfbleu_ppm"),
        )
    )


def domain_hardness_weights(
    df: DataFrame, id_col: str, text_col: str, domain_col: str
) -> DataFrame:
    """Hardness-proportional domain reweighting — the DoReMi signal
    (Xie et al. 2023: upweight domains with EXCESS loss over a
    reference) with a single linear multiplicative-weights step instead
    of the proxy-model loop: domains whose mean Kneser-Ney
    cross-entropy exceeds the corpus mean get weight proportional to
    that excess; domains at or below it share a uniform floor.

    All arithmetic integer-exact: per-doc cross-entropy is the KN
    query's 4-decimal-rounded double scaled to e4 (never a cross-
    partition float SUM of unrounded values — both engines agree on
    the rounded per-doc number first, then sum exact integers), means
    are floor divisions of non-negative operands, and the final weights
    are ppm integers.

    Scale shape: rides the shared KN plan, then one domain-keyed
    integer aggregate (20ish rows) + two broadcast scalars — nothing
    downstream of the LM scoring touches per-document data again."""
    kn = kneser_ney_perplexity(df, id_col, text_col)
    scored = (
        df.select(F.col(id_col), F.col(domain_col))
        .join(kn, id_col)
        .select(
            domain_col,
            F.col("n_bigrams"),
            F.when(
                F.col("cross_entropy").isNotNull(),
                F.round(F.col("cross_entropy") * 10000).cast("long"),
            ).alias("_ce_e4"),
        )
    )
    per = scored.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("_ce_e4").alias("n_scored"),
        F.coalesce(F.sum("_ce_e4"), F.lit(0)).alias("_sum_ce"),
    )
    overall = F.broadcast(
        scored.agg(
            F.coalesce(F.sum("_ce_e4"), F.lit(0)).alias("_tot_ce"),
            F.count("_ce_e4").alias("_tot_n"),
        )
    )
    w = per.crossJoin(overall).select(
        domain_col,
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_scored").cast("long").alias("n_scored"),
        F.when(
            F.col("n_scored") > 0, F.expr("_sum_ce div n_scored")
        )
        .otherwise(F.expr("CASE WHEN _tot_n > 0 THEN _tot_ce div _tot_n ELSE 0 END"))
        .cast("long")
        .alias("mean_ce_e4"),
        F.expr("CASE WHEN _tot_n > 0 THEN _tot_ce div _tot_n ELSE 0 END")
        .cast("long")
        .alias("_overall_e4"),
    )
    w = w.withColumn(
        "excess_e4",
        F.greatest(F.col("mean_ce_e4") - F.col("_overall_e4"), F.lit(0)).cast(
            "long"
        ),
    ).withColumn("_raw", F.greatest(F.col("excess_e4"), F.lit(1)))
    tot_raw = F.broadcast(w.agg(F.sum("_raw").alias("_tot_raw")))
    return w.crossJoin(tot_raw).select(
        domain_col,
        "n_docs",
        "n_scored",
        "mean_ce_e4",
        "excess_e4",
        F.expr("(1000000 * _raw) div _tot_raw").cast("long").alias("weight_ppm"),
    )


# Deterministic planted-PII expressions (shared by engine and oracle —
# every digit derives from the doc id, so both engines synthesize the
# exact same strings with no RNG)
PII_PLANT_SQL = {
    "email": "concat('user', CAST({id} AS STRING), '@example.com')",
    "ssn": (
        "concat(lpad(CAST({id} % 1000 AS STRING), 3, '0'), '-', "
        "lpad(CAST({id} % 100 AS STRING), 2, '0'), '-', "
        "lpad(CAST({id} % 10000 AS STRING), 4, '0'))"
    ),
    "phone": (
        "concat(lpad(CAST({id} % 1000 AS STRING), 3, '0'), '-', "
        "lpad(CAST(({id} * 7) % 1000 AS STRING), 3, '0'), '-', "
        "lpad(CAST(({id} * 13) % 10000 AS STRING), 4, '0'))"
    ),
    "ip": (
        "concat(CAST({id} % 256 AS STRING), '.', "
        "CAST(({id} * 3) % 256 AS STRING), '.', "
        "CAST(({id} * 5) % 256 AS STRING), '.', "
        "CAST(({id} * 7) % 256 AS STRING))"
    ),
}


def pii_scrub_recall(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Planted-PII recall audit for the scrubber: inject one
    deterministic synthetic item of every PII class into each document
    (all digits derived from the doc id — no RNG, both engines plant
    byte-identical strings), run the production `scrub_pii` chain, and
    measure per class how many pattern matches existed before, how
    many SURVIVED the scrub, and how many placeholder tokens landed.

    This is the eval harness privacy reviews actually ask for — "show
    me measured recall, not the regex" — and it exercises the real
    scrub chain, not a copy (a pattern-order regression or an
    over-narrow character class shows up as survivors > 0).

    Scale shape: one narrow per-row map (plant + scrub + 12
    regexp_counts, all codegen'd in the scan stage), ONE single-row
    aggregate, then a 4-row explode — per-class totals with exact
    integer arithmetic (recall_ppm floor-divided)."""
    from ..functions.text import PII_PATTERNS, scrub_pii
    from ..sources.tables import fan_out

    idc = f"CAST({id_col} AS BIGINT)"
    plant = F.expr(
        "concat(" + f"{text_col}, ' contact ', "
        + PII_PLANT_SQL["email"].format(id=idc) + ", ' id ', "
        + PII_PLANT_SQL["ssn"].format(id=idc) + ", ' tel ', "
        + PII_PLANT_SQL["phone"].format(id=idc) + ", ' at ', "
        + PII_PLANT_SQL["ip"].format(id=idc) + ")"
    )
    planted = fan_out(df).select(
        F.col(id_col), plant.alias("_pt")
    ).withColumn("_sc", scrub_pii(F.col("_pt")))
    aggs = []
    for name, pat, repl in PII_PATTERNS:
        aggs += [
            F.sum(F.regexp_count(F.col("_pt"), F.lit(pat))).alias(f"_b_{name}"),
            F.sum(F.regexp_count(F.col("_sc"), F.lit(pat))).alias(f"_a_{name}"),
            # placeholder tokens are regex-safe literals ('<', '>' are
            # not metachars in Java regex or RE2)
            F.sum(F.regexp_count(F.col("_sc"), F.lit(repl))).alias(
                f"_p_{name}"
            ),
        ]
    one = planted.agg(F.count(F.lit(1)).alias("_n"), *aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("pii_class"),
                F.col("_n").cast("long").alias("n_docs"),
                F.col(f"_b_{name}").cast("long").alias("n_before"),
                F.col(f"_a_{name}").cast("long").alias("n_survived"),
                F.col(f"_p_{name}").cast("long").alias("n_placeholders"),
            )
            for name, _, _ in PII_PATTERNS
        ]
    )
    return (
        one.select(F.explode(rows).alias("r"))
        .select("r.*")
        .withColumn(
            "recall_ppm",
            F.when(
                F.col("n_before") > 0,
                F.expr("(1000000 * (n_before - n_survived)) div n_before"),
            )
            .otherwise(F.lit(1_000_000))
            .cast("long"),
        )
    )


def rag_context_pack(
    df: DataFrame,
    id_col: str,
    text_col: str,
    keywords: list[str],
    k: int = 20,
    token_budget: int = 256,
) -> DataFrame:
    """RAG context assembly: BM25 top-k retrieval, then greedy packing
    of the ranked hits into a fixed token budget in rank order — the
    step between retrieval and prompt construction (every RAG serving
    stack runs exactly this loop; here it is one declarative plan).

    A doc is included iff the running token total THROUGH it fits the
    budget — the greedy PREFIX rule (stop at the first overflow),
    matching the plain context-window cutoff serving stacks use;
    deterministic because the order is the hash-gated rounded BM25
    score with id tie-breaks.  (The skip-and-continue bin-packing
    variant is `sequence_packing`'s territory, not retrieval's.)

    Scale shape: everything heavy is the BM25 scan (keyword filter
    before any shuffle, broadcast df/avgdl); the pack stage is a
    running sum over k<=20 rows — bounded, never corpus-sized."""
    hits = ranked_keyword_search_bm25(
        df, id_col, text_col, keywords, k=k
    ).select(id_col, "score")
    lens = df.select(
        F.col(id_col), F.size(tokens(F.col(text_col))).alias("n_tokens")
    )
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    ranked = (
        hits.join(lens, id_col)
        .withColumn("rank", F.row_number().over(w))
        .withColumn(
            "cum_tokens",
            F.sum("n_tokens").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return ranked.select(
        F.col(id_col),
        F.col("rank").cast("long").alias("rank"),
        "score",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
        (F.col("cum_tokens") <= token_budget).alias("included"),
    )


def quality_threshold_yield(
    df: DataFrame, id_col: str, text_col: str, n_tiles: int = 10
) -> DataFrame:
    """Classifier-threshold yield curve: rank the corpus by the hashed
    linear classifier's logit, split into score deciles, and report
    per-decile and cumulative-from-the-top doc/token yields — the
    table a data lead reads to pick the quality threshold that fits
    the token budget (the FineWeb-Edu "sweep the classifier threshold,
    watch the yield" exercise).

    All integers: token counts are exact array sizes, deciles come
    from the distributed rank + integer ntile, cumulative sums run
    over n_tiles<=10 rows.  Decile 1 = highest scores."""
    from .relational import ntile_from_rank, with_global_row_numbers

    scored = hashed_linear_score(df, id_col, text_col).select(
        id_col, "logit_e3"
    )
    lens = df.select(
        F.col(id_col), F.size(tokens(F.col(text_col))).alias("_nt")
    )
    j = scored.join(lens, id_col)
    ranked = with_global_row_numbers(
        j, [F.desc("logit_e3"), F.asc(id_col)], col_name="_rn"
    )
    n_df = F.broadcast(ranked.agg(F.count(F.lit(1)).alias("_n")))
    per = (
        ranked.crossJoin(n_df)
        .select(
            ntile_from_rank(F.col("_rn"), F.col("_n"), n_tiles).alias(
                "decile"
            ),
            "logit_e3",
            "_nt",
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_nt").alias("n_tokens"),
            F.min("logit_e3").alias("min_logit_e3"),
        )
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return per.select(
        F.col("decile").cast("long").alias("decile"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("min_logit_e3").cast("long").alias("min_logit_e3"),
        F.sum("n_docs").over(w).cast("long").alias("cum_docs"),
        F.sum("n_tokens").over(w).cast("long").alias("cum_tokens"),
    )


# Deterministic mojibake plant (id-less: one fixed phrase per doc
# exercising every MOJIBAKE_MAP entry) — shared with the SQL oracle.
MOJIBAKE_PLANT = (
    " cafÃ© crÃ¨me naÃ¯ve Ã¼ber schÃ¶n Ã¤hnlich seÃ±or franÃ§ais "
    "â€œquotedâ€™ â€“ dash â€” line"
)


def encoding_repair_audit(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Mojibake repair audit (the ftfy-lite ingestion pass, measured):
    plant one fixed phrase containing every double-encoding artifact
    into each document, run the production `repair_encoding` chain,
    and report per artifact class how many occurrences existed before,
    how many SURVIVED, and how many repaired glyphs landed — recall as
    a floor-divided ppm integer, same audit shape as
    `pii_scrub_recall`.

    Scale shape: one narrow per-row map (plant + repair + literal
    counts, all codegen'd), ONE single-row aggregate, then a 12-row
    explode."""
    from ..functions.text import MOJIBAKE_MAP, repair_encoding
    from ..sources.tables import fan_out

    planted = fan_out(df).select(
        F.col(id_col),
        F.concat(F.col(text_col), F.lit(MOJIBAKE_PLANT)).alias("_pt"),
    ).withColumn("_rc", repair_encoding(F.col("_pt")))
    aggs = []
    for i, (bad, good) in enumerate(MOJIBAKE_MAP):
        aggs += [
            F.sum(F.regexp_count(F.col("_pt"), F.lit(bad))).alias(f"_b_{i}"),
            F.sum(F.regexp_count(F.col("_rc"), F.lit(bad))).alias(f"_a_{i}"),
            F.sum(F.regexp_count(F.col("_rc"), F.lit(good))).alias(f"_g_{i}"),
        ]
    one = planted.agg(F.count(F.lit(1)).alias("_n"), *aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(bad).alias("artifact"),
                F.lit(good).alias("repaired_to"),
                F.col("_n").cast("long").alias("n_docs"),
                F.col(f"_b_{i}").cast("long").alias("n_before"),
                F.col(f"_a_{i}").cast("long").alias("n_survived"),
                F.col(f"_g_{i}").cast("long").alias("n_glyphs_after"),
            )
            for i, (bad, good) in enumerate(MOJIBAKE_MAP)
        ]
    )
    return (
        one.select(F.explode(rows).alias("r"))
        .select("r.*")
        .withColumn(
            "recall_ppm",
            F.when(
                F.col("n_before") > 0,
                F.expr("(1000000 * (n_before - n_survived)) div n_before"),
            )
            .otherwise(F.lit(1_000_000))
            .cast("long"),
        )
    )


def vocab_coverage(
    df: DataFrame, id_col: str, text_col: str, min_count: int = 5
) -> DataFrame:
    """Frequency-filtered vocabulary coverage: build the corpus
    vocabulary (tokens with count >= `min_count` — the word2vec /
    classical-tokenizer min_count rule) and report each document's
    out-of-vocabulary token count and rate — the audit run before
    freezing a vocabulary (a high-OOV tail is either noise to drop or
    evidence the vocab is too small).

    Scale shape: one token explode feeds BOTH the vocabulary aggregate
    (token-keyed, map-side combined) and the per-doc count; membership
    is a left join on the token key (a real vocab is ~10^5 rows —
    broadcastable; Catalyst picks broadcast automatically under the
    threshold).  OOV rate is a floor-divided ppm integer."""
    from ..sources.tables import fan_out

    toks = fan_out(df).select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("_w")
    )
    vocab = (
        toks.groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= min_count)
        .select(F.col("_w").alias("_vw"))
        .withColumn("_in", F.lit(True))
    )
    per = (
        toks.join(vocab, toks["_w"] == F.col("_vw"), "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count(F.when(F.col("_in").isNull(), F.lit(1))).alias("n_oov"),
        )
    )
    return (
        df.select(id_col)
        .join(per, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
            F.when(
                F.coalesce("n_tokens", F.lit(0)) > 0,
                F.expr("(1000000 * n_oov) div n_tokens"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("oov_ppm"),
        )
    )


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """TRUE winnowing fingerprint selection (Schleimer/Wilkerson/Aiken
    2003, the MOSS algorithm): hash every word k-gram, slide a window
    of `w` consecutive hashes, and select each window's minimum with
    RIGHTMOST tie-breaking; the distinct selected (pos, hash) set is
    the document's fingerprint sketch.  Guarantees every length-w gap
    contains a selected gram (the coverage property rolling-hash
    whole-doc fingerprints lack) at expected density 2/(w+1).

    The rightmost-min argmin is one window MIN over struct(h, -pos)
    with frame [CURRENT, w-1 FOLLOWING] (lexicographic struct min =
    smallest hash, then largest pos) — both engines aggregate structs
    identically, so selection is exactly SQL-replayable.  Only FULL
    windows select (docs shorter than w+k-1 words yield no
    fingerprints — documented, they carry no overlap signal at this
    granularity).

    Returns (id, fpos, fhash) — one row per selected fingerprint."""
    from ..functions.text import word_shingles
    from ..sources.tables import fan_out

    grams = fan_out(df).select(
        F.col(id_col),
        F.posexplode(word_shingles(F.lower(F.col(text_col)), k)).alias(
            "pos", "_g"
        ),
    )
    hashed = grams.select(
        id_col,
        "pos",
        F.conv(F.substring(F.md5("_g"), 1, 15), 16, 10)
        .cast("long")
        .alias("_h"),
    )
    wspec = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    wn = Window.partitionBy(id_col)
    sel = hashed.select(
        F.col(id_col),
        F.col("pos"),
        F.count(F.lit(1)).over(wn).alias("_n"),
        F.min(F.struct(F.col("_h"), (-F.col("pos")).alias("_np"))).over(
            wspec
        ).alias("_m"),
    ).filter(F.col("pos") <= F.col("_n") - w)
    return sel.select(
        F.col(id_col),
        (-F.col("_m._np")).cast("long").alias("fpos"),
        F.col("_m._h").alias("fhash"),
    ).distinct()


def winnowing_overlap_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    w: int = 4,
    max_df: int = 10,
    min_shared: int = 3,
) -> DataFrame:
    """MOSS-style overlap detection on winnowing fingerprints: docs
    sharing >= `min_shared` selected fingerprint hashes, with the
    standard document-frequency cap (`max_df`) excluding boilerplate
    hashes before the pair join — the same quadratic-tail guard as
    `jaccard_prefix_pairs`' df-cap: a hash shared by B docs generates
    B^2 pairs, so ubiquitous grams are evidence of BOILERPLATE, not
    plagiarism, and are dropped from pairing (never from the per-doc
    sketch)."""
    fps = winnowing_fingerprints(df, id_col, text_col, k, w).select(
        id_col, "fhash"
    ).distinct()
    dfreq = fps.groupBy("fhash").agg(F.count(F.lit(1)).alias("_df"))
    rare = fps.join(
        dfreq.filter(F.col("_df") <= max_df).select("fhash"), "fhash"
    )
    a = rare.select(F.col("fhash"), F.col(id_col).alias("id_a"))
    b = rare.select(F.col("fhash"), F.col(id_col).alias("id_b"))
    return (
        a.join(b, "fhash")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def keyness_loglr(
    df: DataFrame,
    group_col: str,
    text_col: str,
    k: int = 10,
    min_count: int = 3,
) -> DataFrame:
    """Per-group KEYNESS: the top-k terms most characteristic of each
    group vs the rest of the corpus by Dunning's log-likelihood ratio
    (G2) — the corpus-linguistics standard for "what words make this
    source/domain distinctive", sharper than raw TF-IDF because it
    scores against an explicit rest-of-corpus expectation rather than
    rarity alone.  Complements `unigram_divergence` (one drift number
    per group) with the per-TERM attribution of that drift.

        a = count(term, group)     n1 = tokens(group)
        b = count(term, rest)      n2 = tokens(rest)
        E1 = n1*(a+b)/(n1+n2)      E2 = n2*(a+b)/(n1+n2)
        G2 = 2*(a*ln(a/E1) + b*ln(b/E2))      (0*ln(0) := 0)

    Only over-represented terms (a/n1 > b/n2) are ranked; ranking uses
    the ROUNDED G2 with a term tie-break so ordering is deterministic
    across engines.  Scale shape: one explode -> (group, term) partial
    agg (vocabulary-sized); term totals reuse those partials via a
    second groupBy on term; group totals are a tiny aggregate joined
    broadcast; the top-k window partitions by group over candidate
    terms only (already collapsed to vocabulary granularity)."""
    toks = F.transform(tokens(text_col), lambda t: F.lower(t))
    words = df.select(F.col(group_col).alias("_g"), F.explode(toks).alias("term"))
    gw = words.groupBy("_g", "term").agg(F.count(F.lit(1)).alias("_a"))
    gt = gw.groupBy("_g").agg(F.sum("_a").alias("_n1"))
    tw = gw.groupBy("term").agg(F.sum("_a").alias("_t"))
    tot = gt.agg(F.sum("_n1").alias("_n"))
    a = F.col("_a").cast("double")
    b = (F.col("_t") - F.col("_a")).cast("double")
    n1 = F.col("_n1").cast("double")
    n2 = (F.col("_n") - F.col("_n1")).cast("double")
    t = F.col("_t").cast("double")
    e1 = n1 * t / F.col("_n").cast("double")
    e2 = n2 * t / F.col("_n").cast("double")
    g2 = F.lit(2.0) * (
        F.when(a > 0, a * F.log(a / e1)).otherwise(F.lit(0.0))
        + F.when(b > 0, b * F.log(b / e2)).otherwise(F.lit(0.0))
    )
    scored = (
        gw.join(tw, "term")
        .join(F.broadcast(gt), "_g")
        .crossJoin(F.broadcast(tot))
        .filter((F.col("_a") >= min_count) & (a / n1 > b / n2))
        .select(
            F.col("_g"),
            "term",
            F.col("_a").alias("focus_count"),
            (F.col("_t") - F.col("_a")).alias("rest_count"),
            F.round(g2 + F.lit(1e-9), 4).alias("g2"),
        )
    )
    w = Window.partitionBy("_g").orderBy(F.desc("g2"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumnRenamed("_g", group_col)
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str,
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-k collocations by pointwise mutual information over adjacent
    lowercase token pairs — the classic lexical-association miner
    (Church & Hanks 1990): phrases whose parts co-occur far above
    chance ("new york", "machine learning"), the statistical front-end
    of phrase-vocabulary induction (word2vec-style phrase joining) and
    a sharper signal than raw bigram frequency (`top_ngrams`), which
    ranks "of the" first.

        pmi = ln( (c_xy / B) / ((c_x / N) * (c_y / N)) )

    with B total bigrams, N total tokens; `min_count` suppresses the
    hapax pairs whose PMI is maximal by accident.

    Scale shape: bigrams are built JVM-side (the zip_with shape of
    `_bigram_type_counts`) and collapse to vocabulary-pair counts with
    map-side partial aggregation; unigram counts join on word keys;
    the global totals are 1-row broadcast cross joins; the top-k cut
    is TakeOrderedAndProject on the rounded PMI with a pair tie-break,
    then a rank window over exactly k rows."""
    toks = F.transform(tokens(text_col), lambda t: F.lower(t))
    pair_t = "array<struct<w1:string,w2:string>>"
    zipped = F.zip_with(
        toks,
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    pairs = F.when(
        F.size(toks) >= 2, F.slice(zipped, 1, F.size(toks) - 1)
    ).otherwise(F.array().cast(pair_t))
    bg = (
        df.select(F.explode(pairs).alias("bg"))
        .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    uni = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    tot = uni.agg(
        F.sum("n_w").alias("_n"),
    )
    btot = bg.agg(F.sum("n_pair").alias("_b"))
    cand = (
        bg.filter(F.col("n_pair") >= min_count)
        .join(uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_w1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_w2")), "w2")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(btot))
    )
    pmi = F.log(
        (F.col("n_pair").cast("double") / F.col("_b").cast("double"))
        / (
            (F.col("n_w1").cast("double") / F.col("_n").cast("double"))
            * (F.col("n_w2").cast("double") / F.col("_n").cast("double"))
        )
    )
    top = (
        cand.select(
            "w1",
            "w2",
            "n_pair",
            "n_w1",
            "n_w2",
            F.round(pmi + F.lit(1e-9), 4).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(k)
    )
    w = Window.orderBy(F.desc("pmi"), "w1", "w2")
    return top.withColumn("rank", F.row_number().over(w))
