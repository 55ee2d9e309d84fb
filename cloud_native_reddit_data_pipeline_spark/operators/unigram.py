"""Distributed Unigram-LM (SentencePiece-style) tokenizer learning.

The second classic subword algorithm next to BPE (operators/bpe.py):
instead of greedily merging pairs, keep a candidate-piece vocabulary
with a probability per piece and let each word pick its best
segmentation under the model (Kudo 2018, "Subword Regularization");
training alternates Viterbi segmentation (E-step) with count
re-estimation (M-step).  The reference has no tokenizer at all (its
NLP is bag-of-words TF-IDF, redditProcessor.py:103-110); like BPE this
is an additive north-star operator for the LLM-training-data pipeline.

Spark-first shape (mirrors bpe.py's collapse): the corpus reduces to
the VOCABULARY-sized word-frequency table after one explode+groupBy,
and everything else — seeding, EM rounds, encoding — runs on that
table.  Per round:

- the candidate-piece table (bounded: top-N substrings + all single
  characters) broadcast-joins against per-word substring positions to
  form the segmentation edge set;
- Viterbi DP + backtrack run as codegen'd higher-order aggregates per
  word row (no UDF, no driver loop, no collect anywhere — the model
  parameters live in a DataFrame end to end);
- the M-step is one explode+groupBy over the chosen pieces.

Determinism / oracle contract: piece log-probabilities are QUANTIZED
to integer micro-nats (round(ln(cnt/total) * 1e6) as BIGINT), so every
DP comparison is an exact integer comparison — no cross-engine float
ordering anywhere (the kneser-ney libm-log tactic, hardened: scores
are compared, not just reported).  DP ties break on the smaller start
position (prefer the longer final piece); the start position is unique
per candidate at a fixed (word, end), so the tie-break is total.
Single characters can never leave the vocabulary (add-one smoothing in
every M-step), which also guarantees every DP position is reachable.

100-TB shape: the word table is vocabulary-sized (millions of rows,
not trillions); the piece table is model-sized (seed_size + alphabet)
and broadcasts; each EM round costs one broadcast join + one
vocabulary-table aggregate — same budget as one BPE merge batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens

MICRO = 1_000_000


def word_freq_table(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus -> (w, freq): one explode + one groupBy, the same
    vocabulary collapse bpe.word_symbol_table performs."""
    words = df.select(
        F.explode(F.transform(tokens(text_col), lambda t: F.lower(t))).alias("w")
    )
    return words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))


def _substr_structs(max_piece_len: int) -> F.Column:
    """All (i, j, piece) substrings of `w` with 1 <= j - i <=
    max_piece_len, as a flattened struct array; i/j are 0-based
    cut positions (piece = w[i:j])."""
    wlen = F.length("w")
    return F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.least(F.lit(max_piece_len), wlen)),
            lambda l: F.transform(
                F.sequence(F.lit(1), wlen - l + 1),
                lambda s: F.struct(
                    (s - 1).cast("int").alias("i"),
                    (s - 1 + l).cast("int").alias("j"),
                    F.col("w").substr(s, l).alias("piece"),
                ),
            ),
        )
    )


def seed_pieces(
    words: DataFrame, max_piece_len: int = 4, seed_size: int = 200
) -> DataFrame:
    """Candidate seed vocabulary: the top `seed_size` substrings of
    length <= max_piece_len by occurrence-weighted frequency (ties
    lexicographic), UNIONed with every single character so coverage is
    total.  Returns (piece, cnt)."""
    occ = (
        words.select("freq", F.explode(_substr_structs(max_piece_len)).alias("e"))
        .groupBy(F.col("e.piece").alias("piece"))
        .agg(F.sum("freq").alias("cnt"))
    )
    top = occ.orderBy(F.desc("cnt"), F.asc("piece")).limit(seed_size)
    chars = occ.filter(F.length("piece") == 1)
    return top.unionByName(chars).groupBy("piece").agg(F.max("cnt").alias("cnt"))


def scores_from_counts(pieces: DataFrame) -> DataFrame:
    """(piece, cnt) -> (piece, cnt, score) with score the integer
    micro-nat log-probability round(ln(cnt/total) * 1e6).  total is
    the sum of counts over the CURRENT piece table (an exact long),
    so both engines derive the same double before the one quantizing
    round."""
    total = pieces.groupBy().agg(F.sum("cnt").alias("_t"))
    return (
        pieces.crossJoin(F.broadcast(total))
        .select(
            "piece",
            "cnt",
            F.round(F.log(F.col("cnt").cast("double") / F.col("_t").cast("double")) * MICRO, 0)
            .cast("long")
            .alias("score"),
        )
    )


def _viterbi_pieces(words: DataFrame, pieces: DataFrame, max_piece_len: int) -> DataFrame:
    """(w, freq) x (piece, score) -> (w, freq, ps) where ps is the
    Viterbi-best segmentation of w (max total score; ties prefer the
    smaller start position = the longer final piece).

    The edge set comes from a broadcast join of per-word substring
    positions against the piece table; DP and backtrack are
    higher-order aggregates over the word's own edge array — a narrow
    per-row computation, vocabulary-sized input."""
    edges = (
        words.select("w", "freq", F.explode(_substr_structs(max_piece_len)).alias("e"))
        .join(
            F.broadcast(pieces.select(F.col("piece").alias("_p"), "score")),
            F.col("e.piece") == F.col("_p"),
        )
        .groupBy("w", "freq")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("e.i").alias("i"),
                    F.col("e.j").alias("j"),
                    F.col("e.piece").alias("piece"),
                    F.col("score").alias("score"),
                )
            ).alias("edges")
        )
    )
    wlen = F.length("w")
    # dp[j+1] = (score, previ, piece) of the best segmentation of the
    # first j characters; dp[1] is the (0, -1, '') base.  Single chars
    # are always in the piece table, so every position is reachable
    # and the candidate set at each step is non-empty.
    dp = F.aggregate(
        F.sequence(F.lit(1), wlen),
        F.array(
            F.struct(
                F.lit(0).cast("long").alias("score"),
                F.lit(-1).cast("int").alias("previ"),
                F.lit("").alias("piece"),
            )
        ),
        lambda acc, j: F.concat(
            acc,
            F.array(
                _best_step(acc, j),
            ),
        ),
    )
    out = edges.withColumn("dp", dp)
    bt = F.aggregate(
        F.sequence(F.lit(1), wlen),
        F.struct(
            wlen.cast("int").alias("j"),
            F.array().cast("array<string>").alias("ps"),
        ),
        lambda acc, _: F.when(
            acc["j"] > 0,
            F.struct(
                F.element_at(F.col("dp"), acc["j"] + 1)["previ"].alias("j"),
                F.concat(
                    acc["ps"],
                    F.array(F.element_at(F.col("dp"), acc["j"] + 1)["piece"]),
                ).alias("ps"),
            ),
        ).otherwise(acc),
        lambda acc: F.reverse(acc["ps"]),
    )
    return out.select("w", "freq", bt.alias("ps"))


def _best_step(acc, j):
    """Best candidate ending at position j: max total score, ties to
    the smallest start i (encoded as max of (total, -i)); i is unique
    per candidate at fixed (w, j), so the order is total."""
    cands = F.filter(F.col("edges"), lambda e: e["j"] == j)
    keyed = F.transform(
        cands,
        lambda e: F.struct(
            (F.element_at(acc, e["i"] + 1)["score"] + e["score"]).alias("score"),
            (-e["i"]).cast("int").alias("negi"),
            e["piece"].alias("piece"),
        ),
    )
    best = F.array_max(keyed)
    return F.struct(
        best["score"].alias("score"),
        (-best["negi"]).cast("int").alias("previ"),
        best["piece"].alias("piece"),
    )


def _m_step(segmented: DataFrame, prev_pieces: DataFrame) -> DataFrame:
    """Re-estimate counts from the chosen segmentations: multi-char
    pieces keep their (freq-weighted) usage count and drop at zero;
    single characters get add-one smoothing on top so they never leave
    (total coverage stays guaranteed).  Returns (piece, cnt)."""
    used = (
        segmented.select("freq", F.explode("ps").alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").alias("used"))
    )
    chars = prev_pieces.filter(F.length("piece") == 1).select("piece")
    return (
        prev_pieces.select("piece")
        .join(used, "piece", "left")
        .join(chars.withColumn("_c", F.lit(1)), "piece", "left")
        .select(
            "piece",
            (F.coalesce("used", F.lit(0)) + F.coalesce("_c", F.lit(0))).alias("cnt"),
        )
        .filter(F.col("cnt") > 0)
    )


def learn_unigram_vocab(
    df: DataFrame,
    text_col: str,
    em_rounds: int = 2,
    max_piece_len: int = 4,
    seed_size: int = 200,
    words: DataFrame | None = None,
) -> DataFrame:
    """Learn a unigram-LM piece vocabulary: seed from top substrings,
    then `em_rounds` of hard-EM (Viterbi segmentation E-step, count
    re-estimation M-step).  Returns the final (piece, cnt, score)
    table — counts after the last M-step, scores in integer
    micro-nats.  Fixed-round unrolled, one localCheckpoint per round
    (the bpe.py / graph-operator lineage guard).  ``words``
    short-circuits the corpus collapse with a precomputed,
    caller-materialized (w, freq) table — the composed fertility query
    shares one across all three tokenizer legs."""
    if words is None:
        words = word_freq_table(df, text_col).localCheckpoint(eager=True)
    pieces = scores_from_counts(seed_pieces(words, max_piece_len, seed_size))
    for _ in range(em_rounds):
        seg = _viterbi_pieces(words, pieces, max_piece_len)
        pieces = scores_from_counts(_m_step(seg, pieces))
        pieces = pieces.localCheckpoint(eager=True)
    return pieces


def unigram_encode_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    pieces: DataFrame,
    max_piece_len: int = 4,
    doc_words: DataFrame | None = None,
) -> DataFrame:
    """Encode the corpus with a learned piece table and report per-doc
    (n_words, n_pieces, chars_per_piece) — the unigram twin of
    bpe.bpe_encode_stats, and the fertility comparison hook.  One
    Viterbi pass over the distinct-word table, then a join against
    per-doc word counts; the corpus text is scanned once.
    ``doc_words`` short-circuits the scan with a precomputed (id, w, n)
    table shared across encode legs (caller owns the persistence)."""
    if doc_words is None:
        toks = F.transform(tokens(text_col), lambda t: F.lower(t))
        doc_words = (
            df.select(F.col(id_col), F.explode(toks).alias("w"))
            .groupBy(id_col, "w")
            .agg(F.count(F.lit(1)).alias("n"))
        )
    vocab = doc_words.groupBy("w").agg(F.sum("n").alias("freq"))
    seg = _viterbi_pieces(vocab, pieces, max_piece_len).select(
        "w", F.size("ps").alias("n_pieces"), F.length("w").alias("n_chars")
    )
    return (
        doc_words.join(seg, "w")
        .groupBy(id_col)
        .agg(
            F.sum("n").alias("n_words"),
            F.sum(F.col("n") * F.col("n_pieces")).alias("n_pieces"),
            F.round(
                F.sum(F.col("n") * F.col("n_chars"))
                / F.sum(F.col("n") * F.col("n_pieces"))
                + F.lit(1e-9),
                4,
            ).alias("chars_per_piece"),
        )
    )


def learn_unigram_py(
    texts: list[str],
    em_rounds: int = 2,
    max_piece_len: int = 4,
    seed_size: int = 200,
) -> dict[str, tuple[int, int]]:
    """Independent pure-Python reference (for tests): identical
    semantics — occurrence-weighted seeding, integer micro-nat scores,
    Viterbi with the same tie-break, add-one char smoothing.  Returns
    {piece: (cnt, score)}."""
    import math
    from collections import Counter

    vocab: Counter = Counter()
    for t in texts:
        for w in (t or "").lower().split():
            vocab[w] += 1

    occ: Counter = Counter()
    for w, f in vocab.items():
        for l in range(1, min(max_piece_len, len(w)) + 1):
            for s in range(len(w) - l + 1):
                occ[w[s : s + l]] += f
    top = sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))[:seed_size]
    pieces = dict(top)
    for p, c in occ.items():
        if len(p) == 1:
            pieces.setdefault(p, c)

    def rescore(cnts: dict[str, int]) -> dict[str, tuple[int, int]]:
        total = sum(cnts.values())
        return {
            p: (c, round(math.log(c / total) * MICRO))
            for p, c in cnts.items()
        }

    scored = rescore(pieces)

    def viterbi(w: str) -> list[str]:
        dp: list[tuple[int, int, str]] = [(0, -1, "")]
        for j in range(1, len(w) + 1):
            best = None
            for i in range(max(0, j - max_piece_len), j):
                p = w[i:j]
                if p in scored:
                    key = (dp[i][0] + scored[p][1], -i)
                    if best is None or key > best[0]:
                        best = (key, i, p)
            assert best is not None
            dp.append((best[0][0], best[1], best[2]))
        ps, j = [], len(w)
        while j > 0:
            ps.append(dp[j][2])
            j = dp[j][1]
        return list(reversed(ps))

    for _ in range(em_rounds):
        used: Counter = Counter()
        for w, f in vocab.items():
            for p in viterbi(w):
                used[p] += f
        cnts = {}
        for p in scored:
            c = used.get(p, 0) + (1 if len(p) == 1 else 0)
            if c > 0:
                cnts[p] = c
        scored = rescore(cnts)
    return scored


# --- DuckDB oracle builders (the bpe.py unrolled-round tactic) --------------

_ORACLE_TOKS = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"

# DP relaxation rounds in the SQL replay: paths of <= R pieces.  A word
# of length L needs at most L single-char pieces, so R bounds the word
# length the oracle can segment; the corpus tokenizer words are <= 8
# chars (scaled copies <= 5), R = 16 carries margin.  The ENGINE has no
# such bound (its DP runs length(w) steps per row).
_DP_ROUNDS = 16


def _subpos_sql(wtab: str, max_piece_len: int) -> str:
    """FROM-clause fragment enumerating (l, s) substring positions of
    {wtab}.w with 1 <= l <= max_piece_len."""
    return (
        f"{wtab}, "
        f"LATERAL (SELECT unnest(generate_series(1, least({max_piece_len}, "
        f"length(w)))) AS l), "
        f"LATERAL (SELECT unnest(generate_series(1, length(w) - l + 1)) AS s)"
    )


def _score_sql(src: str) -> str:
    """(piece, cnt) table -> (piece, cnt, score) with the identical
    micro-nat quantization the engine applies."""
    return (
        f"SELECT piece, cnt, CAST(ROUND(ln(CAST(cnt AS DOUBLE) / t.total) "
        f"* {MICRO}, 0) AS BIGINT) AS score "
        f"FROM {src}, (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM {src}) t"
    )


def _viterbi_round_sql(k: int, ptab: str, max_piece_len: int) -> str:
    """CTEs for one Viterbi pass with piece table `ptab`: edge set,
    unrolled DP relaxation (exact integer max), deterministic argmax
    choice (max score, then min start i — the engine's tie-break), and
    a linear recursive backtrack."""
    dp = [
        f"b{k}_0 AS MATERIALIZED (SELECT w, 0 AS j, CAST(0 AS BIGINT) AS score "
        f"FROM words)"
    ]
    for t in range(1, _DP_ROUNDS + 1):
        dp.append(
            f"""b{k}_{t} AS MATERIALIZED (
      SELECT w, j, MAX(score) AS score FROM (
        SELECT w, j, score FROM b{k}_{t - 1}
        UNION ALL
        SELECT e.w, e.j, b.score + e.score
        FROM b{k}_{t - 1} b JOIN edges{k} e ON e.w = b.w AND e.i = b.j
      ) GROUP BY w, j
    )"""
        )
    return f"""
    edges{k} AS MATERIALIZED (
      SELECT words.w, words.freq, s - 1 AS i, s - 1 + l AS j,
             p.piece, p.score
      FROM {_subpos_sql("words", max_piece_len)}
      JOIN {ptab} p ON p.piece = substring(words.w, s, l)
    ),
    {",".join(dp)},
    choice{k} AS MATERIALIZED (
      SELECT w, j, i, piece FROM (
        SELECT e.w, e.j, e.i, e.piece,
               ROW_NUMBER() OVER (PARTITION BY e.w, e.j
                                  ORDER BY (b.score + e.score) DESC, e.i ASC)
                 AS rn
        FROM edges{k} e
        JOIN b{k}_{_DP_ROUNDS} b ON b.w = e.w AND b.j = e.i
      ) WHERE rn = 1
    ),
    bt{k}(w, j, piece) AS (
      SELECT w, length(w), CAST(NULL AS VARCHAR) FROM words
      UNION ALL
      SELECT b.w, c.i, c.piece
      FROM bt{k} b JOIN choice{k} c ON c.w = b.w AND c.j = b.j
      WHERE b.j > 0
    )"""


def _unigram_cte_prefix(
    em_rounds: int, max_piece_len: int, seed_size: int
) -> str:
    """Shared WITH-prefix: word table, seed, p0, and `em_rounds`
    Viterbi+M-step rounds producing p{em_rounds}."""
    parts = [
        f"""
    WITH RECURSIVE words AS MATERIALIZED (
      SELECT w, COUNT(*) AS freq FROM (
        SELECT unnest(list_transform({_ORACLE_TOKS}, x -> lower(x))) AS w
        FROM documents
      ) GROUP BY w
    ),
    occ AS MATERIALIZED (
      SELECT piece, SUM(freq) AS cnt FROM (
        SELECT substring(words.w, s, l) AS piece, freq
        FROM {_subpos_sql("words", max_piece_len)}
      ) GROUP BY piece
    ),
    seed AS MATERIALIZED (
      SELECT piece, MAX(cnt) AS cnt FROM (
        SELECT piece, cnt FROM
          (SELECT piece, cnt FROM occ ORDER BY cnt DESC, piece LIMIT {seed_size})
        UNION ALL
        SELECT piece, cnt FROM occ WHERE length(piece) = 1
      ) GROUP BY piece
    ),
    p0 AS MATERIALIZED ({_score_sql("seed")})"""
    ]
    for k in range(1, em_rounds + 1):
        parts.append(_viterbi_round_sql(k, f"p{k - 1}", max_piece_len))
        parts.append(
            f"""
    used{k} AS MATERIALIZED (
      SELECT t.piece, SUM(w.freq) AS used
      FROM bt{k} t JOIN words w ON w.w = t.w
      WHERE t.piece IS NOT NULL GROUP BY t.piece
    ),
    cnts{k} AS MATERIALIZED (
      SELECT piece, cnt FROM (
        SELECT p.piece,
               COALESCE(u.used, 0)
                 + CASE WHEN length(p.piece) = 1 THEN 1 ELSE 0 END AS cnt
        FROM p{k - 1} p LEFT JOIN used{k} u ON u.piece = p.piece
      ) WHERE cnt > 0
    ),
    p{k} AS MATERIALIZED ({_score_sql(f"cnts{k}")})"""
        )
    return ",".join(parts)


def unigram_vocab_oracle_sql(
    em_rounds: int = 2, max_piece_len: int = 4, seed_size: int = 200
) -> str:
    """DuckDB replay of `learn_unigram_vocab`: integer-exact DP scores
    make every comparison engine-identical; the single quantizing
    ROUND is the only float touchpoint per round."""
    return (
        _unigram_cte_prefix(em_rounds, max_piece_len, seed_size)
        + f"""
    SELECT piece, CAST(cnt AS BIGINT) AS cnt, score FROM p{em_rounds}
    """
    )


def unigram_encode_oracle_sql(
    em_rounds: int = 2, max_piece_len: int = 4, seed_size: int = 200
) -> str:
    """DuckDB replay of learn-then-encode (`unigram_encode_stats` with
    the vocab learned from the same corpus): one more Viterbi pass
    with the final piece table, then per-doc stats."""
    kf = em_rounds + 1
    return (
        _unigram_cte_prefix(em_rounds, max_piece_len, seed_size)
        + ","
        + _viterbi_round_sql(kf, f"p{em_rounds}", max_piece_len)
        + f""",
    wseg AS MATERIALIZED (
      SELECT w, COUNT(piece) AS n_pieces, ANY_VALUE(length(w)) AS n_chars
      FROM bt{kf} WHERE piece IS NOT NULL GROUP BY w
    ),
    doc_words AS MATERIALIZED (
      SELECT doc_id, w, COUNT(*) AS n FROM (
        SELECT doc_id,
               unnest(list_transform({_ORACLE_TOKS}, x -> lower(x))) AS w
        FROM documents
      ) GROUP BY doc_id, w
    )
    SELECT doc_id,
           CAST(SUM(n) AS BIGINT) AS n_words,
           CAST(SUM(n * n_pieces) AS BIGINT) AS n_pieces,
           ROUND(SUM(n * n_chars) / (1.0 * SUM(n * n_pieces)) + 1e-9, 4)
             AS chars_per_piece
    FROM doc_words JOIN wseg USING (w)
    GROUP BY doc_id
    """
    )


def learn_unigram_vocab_pruned(
    df: DataFrame,
    text_col: str,
    em_rounds: int = 2,
    max_piece_len: int = 4,
    seed_size: int = 200,
    target_multi: int = 24,
) -> DataFrame:
    """SentencePiece's prune phase on top of :func:`learn_unigram_vocab`:
    after the EM rounds, keep only the ``target_multi`` highest-count
    multi-char pieces (ties lexicographic) plus every single character,
    re-normalize, and run ONE more EM round so the surviving pieces
    re-absorb the pruned pieces' usage.  (Stock SentencePiece ranks by
    likelihood loss from the full lattice; count ranking is the
    deterministic hard-EM analogue — under Viterbi counts a piece's
    removal loss is monotone in its usage at equal length, and the
    ranking is engine-exact with no extra DP.)  Same cost envelope as
    one extra EM round."""
    words = word_freq_table(df, text_col).localCheckpoint(eager=True)
    pieces = scores_from_counts(seed_pieces(words, max_piece_len, seed_size))
    for _ in range(em_rounds):
        seg = _viterbi_pieces(words, pieces, max_piece_len)
        pieces = scores_from_counts(_m_step(seg, pieces)).localCheckpoint(eager=True)
    multi = (
        pieces.filter(F.length("piece") > 1)
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(target_multi)
        .select("piece", "cnt")
    )
    chars = pieces.filter(F.length("piece") == 1).select("piece", "cnt")
    pruned = scores_from_counts(multi.unionByName(chars))
    seg = _viterbi_pieces(words, pruned, max_piece_len)
    return scores_from_counts(_m_step(seg, pruned))


def learn_unigram_pruned_py(
    texts: list[str],
    em_rounds: int = 2,
    max_piece_len: int = 4,
    seed_size: int = 200,
    target_multi: int = 24,
) -> dict[str, tuple[int, int]]:
    """Pure-Python reference for the pruned learner (tests)."""
    import math

    scored = learn_unigram_py(texts, em_rounds, max_piece_len, seed_size)
    multi = sorted(
        ((p, c) for p, (c, _) in scored.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[:target_multi]
    cnts = dict(multi)
    for p, (c, _) in scored.items():
        if len(p) == 1:
            cnts[p] = c
    total = sum(cnts.values())
    scored = {p: (c, round(math.log(c / total) * MICRO)) for p, c in cnts.items()}

    from collections import Counter

    vocab: Counter = Counter()
    for t in texts:
        for w in (t or "").lower().split():
            vocab[w] += 1

    def viterbi(w: str) -> list[str]:
        dp: list[tuple[int, int, str]] = [(0, -1, "")]
        for j in range(1, len(w) + 1):
            best = None
            for i in range(max(0, j - max_piece_len), j):
                p = w[i:j]
                if p in scored:
                    key = (dp[i][0] + scored[p][1], -i)
                    if best is None or key > best[0]:
                        best = (key, i, p)
            assert best is not None
            dp.append((best[0][0], best[1], best[2]))
        ps, j = [], len(w)
        while j > 0:
            ps.append(dp[j][2])
            j = dp[j][1]
        return list(reversed(ps))

    used: Counter = Counter()
    for w, f in vocab.items():
        for p in viterbi(w):
            used[p] += f
    cnts = {}
    for p in scored:
        c = used.get(p, 0) + (1 if len(p) == 1 else 0)
        if c > 0:
            cnts[p] = c
    total = sum(cnts.values())
    return {p: (c, round(math.log(c / total) * MICRO)) for p, c in cnts.items()}


def unigram_pruned_oracle_sql(
    em_rounds: int = 2,
    max_piece_len: int = 4,
    seed_size: int = 200,
    target_multi: int = 24,
) -> str:
    """DuckDB replay of `learn_unigram_vocab_pruned`: the EM prefix,
    a prune CTE (top multi-char by count + all chars), and one more
    Viterbi + M-step round over the pruned table."""
    n = em_rounds
    kf = n + 1
    return (
        _unigram_cte_prefix(n, max_piece_len, seed_size)
        + f""",
    pr AS MATERIALIZED (
      SELECT piece, cnt FROM (
        SELECT piece, cnt FROM p{n} WHERE length(piece) > 1
        ORDER BY cnt DESC, piece LIMIT {target_multi}
      )
      UNION ALL
      SELECT piece, cnt FROM p{n} WHERE length(piece) = 1
    ),
    pp AS MATERIALIZED ({_score_sql("pr")}),"""
        + _viterbi_round_sql(kf, "pp", max_piece_len)
        + f""",
    used{kf} AS MATERIALIZED (
      SELECT t.piece, SUM(w.freq) AS used
      FROM bt{kf} t JOIN words w ON w.w = t.w
      WHERE t.piece IS NOT NULL GROUP BY t.piece
    ),
    cnts{kf} AS MATERIALIZED (
      SELECT piece, cnt FROM (
        SELECT p.piece,
               COALESCE(u.used, 0)
                 + CASE WHEN length(p.piece) = 1 THEN 1 ELSE 0 END AS cnt
        FROM pp p LEFT JOIN used{kf} u ON u.piece = p.piece
      ) WHERE cnt > 0
    ),
    pfin AS MATERIALIZED ({_score_sql(f"cnts{kf}")})
    SELECT piece, CAST(cnt AS BIGINT) AS cnt, score FROM pfin
    """
    )
