"""Distributed WordPiece tokenizer learning + greedy encoding.

The third classic subword algorithm next to BPE (operators/bpe.py) and
unigram-LM (operators/unigram.py): like BPE it grows a vocabulary by
merging adjacent symbol pairs, but the merge objective is the LM
LIKELIHOOD GAIN score cnt(l,r) / (cnt(l) * cnt(r)) instead of raw pair
frequency (Schuster & Nakajima 2012; the BERT tokenizer), and encoding
is greedy longest-match-first with a ``##`` continuation prefix rather
than merge replay.  The reference has no tokenizer at all (its NLP is
bag-of-words TF-IDF, redditProcessor.py:103-110); additive north-star
operator, completing the tokenizer family the LLM brief asks for.

Spark-first shape: identical collapse to bpe.py — the corpus reduces
to the vocabulary-sized word-frequency table, each round is one pair
count + one symbol count over that table, and the argmax is a one-row
collect (a learned model parameter, the same driver-side role as the
BPE merge row and the k-means centroid fetch).  The pair rewrite
reuses bpe._merge_adjacent verbatim (left-to-right non-overlapping).

Determinism / oracle contract: the likelihood score is QUANTIZED to
integer micro-nats, round((ln(pair) - ln(l) - ln(r)) * 1e6) as BIGINT
(the unigram.py tactic), so the per-round argmax is an exact integer
comparison in both engines; ties break lexicographically on (l, r).
The raw ratio would otherwise need cross-engine float ordering or
DECIMAL(38) triple products — the quantized log keeps the contract
integer-exact with one libm-log touchpoint per candidate.

Encoding: greedy longest-match-first against the final symbol
vocabulary (initial characters + every merged symbol), ``##``-prefixed
for non-initial positions, per-word higher-order aggregate — no UDF.
Unmatchable positions cannot occur (single characters are always in
the vocabulary; the word table derives from the same corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens
from .bpe import END_OF_WORD, _merge_adjacent, word_symbol_table
from .unigram import MICRO


def _pair_and_symbol_counts(cur: DataFrame) -> tuple[DataFrame, DataFrame]:
    """One pass each: adjacent-pair counts and unigram symbol counts
    over the (freq, syms) vocabulary table — both map-side partial
    aggregates."""
    tail = F.expr("slice(syms, 2, greatest(size(syms) - 1, 0))")
    pairs = (
        cur.filter(F.size("syms") >= 2)
        .select(
            "freq",
            F.explode(
                F.arrays_zip(F.col("syms").alias("l"), tail.alias("r"))
            ).alias("p"),
        )
        .filter(F.col("p.r").isNotNull())
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").alias("cnt"))
    )
    syms = (
        cur.select("freq", F.explode("syms").alias("s"))
        .groupBy("s")
        .agg(F.sum("freq").alias("scnt"))
    )
    return pairs, syms


def learn_wordpiece_merges(
    df: DataFrame,
    text_col: str,
    n_merges: int = 12,
    checkpoint_every: int = 2,
    words: DataFrame | None = None,
) -> DataFrame:
    """Learn the first ``n_merges`` WordPiece merges.  Returns (rank,
    left, right, merged, pair_freq, score) in merge order, score in
    integer micro-nats of ln(cnt(l,r)) - ln(cnt(l)) - ln(cnt(r)).

    One merge per round (the likelihood scores of surviving pairs all
    shift when symbol counts change, so BPE's provably-independent
    batching does not carry over).  Each round is two vocabulary-table
    aggregates; the symbol counts come back to the driver and re-enter
    the pair scoring as a LITERAL map rather than a broadcast join —
    the symbol vocabulary is MODEL-sized (|initial characters| +
    END_OF_WORD + one new symbol per merge, a few hundred entries at
    any corpus scale), the same bounded driver-side role as the argmax
    row itself, and the literal form saves a broadcast-exchange job
    per round in an already job-overhead-bound loop."""
    spark = df.sparkSession
    cur = word_symbol_table(df, text_col, words).select("freq", "syms")
    # LAZY checkpoint: plan truncation at creation, materialization
    # folded into the first round's (concurrent) aggregates — the
    # block-level compute locks serialize only the shared parent, so
    # the overlap of the two consumers is preserved minus one job
    cur = cur.localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, str, int, int]] = []
    rounds_since_ckpt = 0
    from ..storage.manifest import run_concurrent

    for _ in range(n_merges):
        pairs, syms = _pair_and_symbol_counts(cur)
        # the two vocabulary-table aggregates are independent jobs over
        # the checkpointed table — overlap them so a round pays ONE
        # aggregation wall, not two (the symbol collect is bounded:
        # symbol vocab, not corpus; the pair checkpoint is bounded by
        # distinct adjacent symbol pairs)
        srows, pairs = run_concurrent(
            syms.collect,
            lambda: pairs.localCheckpoint(eager=True),
        )
        smap = F.create_map(
            *[
                lit
                for r in srows
                for lit in (F.lit(r["s"]), F.lit(int(r["scnt"])))
            ]
        )
        scored = pairs.select(
            "l",
            "r",
            "cnt",
            F.round(
                (
                    F.log(F.col("cnt").cast("double"))
                    - F.log(F.element_at(smap, F.col("l")).cast("double"))
                    - F.log(F.element_at(smap, F.col("r")).cast("double"))
                )
                * MICRO,
                0,
            )
            .cast("long")
            .alias("score"),
        )
        top = scored.orderBy(F.desc("score"), F.asc("l"), F.asc("r")).limit(1).collect()
        if not top:
            break
        b = top[0]
        merges.append((len(merges) + 1, b.l, b.r, b.l + b.r, int(b.cnt), int(b.score)))
        cur = cur.withColumn("syms", _merge_adjacent("syms", b.l, b.r))
        rounds_since_ckpt += 1
        if rounds_since_ckpt >= checkpoint_every:
            # lazy: next round's aggregates materialize it; an eager pin
            # here was one blocking vocabulary-copy job per two rounds
            cur = cur.localCheckpoint(eager=False)
            rounds_since_ckpt = 0
    return spark.createDataFrame(
        merges,
        "rank int, left string, right string, merged string, "
        "pair_freq long, score long",
    )


def wordpiece_vocab(
    df: DataFrame,
    text_col: str,
    n_merges: int = 12,
    words: DataFrame | None = None,
) -> DataFrame:
    """Final WordPiece vocabulary: every initial character (plus the
    end-of-word marker) and every merged symbol.  Returns (sym).
    ``words`` = optional precomputed (w, freq) table shared with the
    other tokenizer legs (caller owns the persistence)."""
    base = (
        word_symbol_table(df, text_col, words)
        .select(F.explode("syms").alias("sym"))
        .distinct()
    )
    merged = learn_wordpiece_merges(
        df, text_col, n_merges=n_merges, words=words
    ).select(F.col("merged").alias("sym"))
    return base.unionByName(merged).distinct()


def wordpiece_encode_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: DataFrame,
    max_sym_len: int = 16,
    doc_words: DataFrame | None = None,
) -> DataFrame:
    """Greedy longest-match-first WordPiece encoding, reported as
    per-document (n_words, n_wp_tokens, chars_per_wp_token).

    Encoding runs on the DISTINCT-WORD table (the learner's collapse):
    per word, a higher-order aggregate walks the symbol string
    left-to-right, at each step taking the LONGEST vocabulary symbol
    that prefixes the remainder (non-initial steps consume plain
    symbols too — the learner's symbols carry no ``##`` marker, the
    continuation flag is positional here).  Symbols are bounded by
    ``max_sym_len`` so the per-step candidate scan is constant-width.
    The vocabulary broadcasts as a map literal via a join-free lookup:
    we join the word's own substrings against the vocab ONCE to build
    a per-word match set, then the walk is pure array logic.
    ``doc_words`` short-circuits the corpus scan with a precomputed
    (id, w, n) table shared across encode legs (caller owns the
    persistence)."""
    if doc_words is None:
        toks = F.transform(tokens(text_col), lambda t: F.lower(t))
        doc_words = (
            df.select(F.col(id_col), F.explode(toks).alias("w"))
            .groupBy(id_col, "w")
            .agg(F.count(F.lit(1)).alias("n"))
        )
    words = doc_words.groupBy("w").agg(F.sum("n").alias("freq"))
    # the learner appends END_OF_WORD to each word's symbol string;
    # encode over the same augmented form so vocab symbols line up.
    # matches: (start i 0-based, length l) pairs of vocab symbols
    # occurring in w + END_OF_WORD, built by ONE broadcast join.
    marker_len = len(END_OF_WORD)
    aug = F.concat(F.col("w"), F.lit(END_OF_WORD))
    wlen = F.length(aug)
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.least(F.lit(max_sym_len), wlen)),
            lambda l: F.transform(
                F.sequence(F.lit(1), wlen - l + 1),
                lambda s: F.struct(
                    (s - 1).cast("int").alias("i"),
                    l.cast("int").alias("l"),
                    aug.substr(s, l).alias("piece"),
                ),
            ),
        )
    )
    matches = (
        words.select("w", "freq", F.explode(subs).alias("e"))
        .join(
            F.broadcast(vocab.select(F.col("sym").alias("_v"))),
            F.col("e.piece") == F.col("_v"),
        )
        .groupBy("w", "freq")
        .agg(
            F.collect_list(
                F.struct(F.col("e.i").alias("i"), F.col("e.l").alias("l"))
            ).alias("ms")
        )
    )
    awlen = F.length(F.concat(F.col("w"), F.lit(END_OF_WORD)))
    # walk: up to len(aug) steps; at each, consume the longest match
    # starting at the cursor.  Single chars + the end marker are always
    # in the vocab, so progress is guaranteed.
    walk = F.aggregate(
        F.sequence(F.lit(1), awlen),
        F.struct(F.lit(0).cast("int").alias("pos"), F.lit(0).cast("int").alias("k")),
        lambda acc, _: F.when(
            acc["pos"] < awlen,
            F.struct(
                (
                    acc["pos"]
                    + F.array_max(
                        F.transform(
                            F.filter(F.col("ms"), lambda m: m["i"] == acc["pos"]),
                            lambda m: m["l"],
                        )
                    )
                ).cast("int").alias("pos"),
                (acc["k"] + 1).cast("int").alias("k"),
            ),
        ).otherwise(acc),
        lambda acc: acc["k"],
    )
    enc = matches.select(
        "w",
        walk.alias("n_wp"),
        (F.length("w")).alias("n_chars"),
    )
    return (
        doc_words.join(enc, "w")
        .groupBy(id_col)
        .agg(
            F.sum("n").alias("n_words"),
            F.sum(F.col("n") * F.col("n_wp")).alias("n_wp_tokens"),
            F.round(
                F.sum(F.col("n") * F.col("n_chars"))
                / F.sum(F.col("n") * F.col("n_wp"))
                + F.lit(1e-9),
                4,
            ).alias("chars_per_wp_token"),
        )
    )


def learn_wordpiece_py(texts: list[str], n_merges: int = 12) -> list[tuple]:
    """Independent pure-Python reference (for tests): identical
    semantics — likelihood-gain argmax in integer micro-nats,
    lexicographic ties, left-to-right non-overlapping rewrite."""
    import math
    from collections import Counter

    vocab: Counter = Counter()
    for t in texts:
        for w in (t or "").lower().split():
            vocab[w] += 1
    words = {w: list(w) + [END_OF_WORD] for w in vocab}
    out = []
    for rank in range(1, n_merges + 1):
        pcnt: Counter = Counter()
        scnt: Counter = Counter()
        for w, syms in words.items():
            f = vocab[w]
            for s in syms:
                scnt[s] += f
            for a, b in zip(syms, syms[1:]):
                pcnt[(a, b)] += f
        if not pcnt:
            break
        scored = {
            (a, b): round(
                (math.log(c) - math.log(scnt[a]) - math.log(scnt[b])) * MICRO
            )
            for (a, b), c in pcnt.items()
        }
        (a, b), sc = min(scored.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        out.append((rank, a, b, a + b, pcnt[(a, b)], sc))
        for w, syms in words.items():
            new, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    new.append(a + b)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            words[w] = new
    return out


# --- DuckDB oracle builders (reusing bpe.py's rewrite machinery) ------------


def _wp_best_sql(k: int) -> str:
    """best{k} body for the likelihood-gain argmax: micro-nat quantized
    ln(pair) - ln(l) - ln(r), ties lexicographic — identical operation
    order to the engine's scored frame."""
    p = k - 1
    return f"""
      WITH syms{k} AS (
        SELECT s, SUM(freq) AS scnt FROM (
          SELECT freq, unnest(syms) AS s FROM v{p}
        ) GROUP BY s
      )
      SELECT l AS bl, r AS br, cnt, score FROM (
        SELECT p.l, p.r, p.cnt,
               CAST(ROUND((ln(CAST(p.cnt AS DOUBLE))
                           - ln(CAST(a.scnt AS DOUBLE))
                           - ln(CAST(b.scnt AS DOUBLE))) * {MICRO}, 0)
                 AS BIGINT) AS score
        FROM pairs{k} p
        JOIN syms{k} a ON a.s = p.l
        JOIN syms{k} b ON b.s = p.r
      ) ORDER BY score DESC, l, r LIMIT 1"""


def _wp_cte_prefix(n_merges: int) -> str:
    from .bpe import _bpe_cte_prefix, _bpe_round_sql

    # WITH RECURSIVE: the encode oracle's cursor walk is recursive
    head = _bpe_cte_prefix(0).rstrip().rstrip(",").replace(
        "WITH words", "WITH RECURSIVE words", 1
    )  # words + v0 only
    rounds = ",".join(
        _bpe_round_sql(k, best_sql=_wp_best_sql(k)) for k in range(1, n_merges + 1)
    )
    return head + "," + rounds


def wordpiece_merges_oracle_sql(n_merges: int) -> str:
    """DuckDB replay of `learn_wordpiece_merges`: BPE's unrolled
    rewrite rounds with the likelihood-score argmax swapped in."""
    sel = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS INT) AS rank, bl AS left, br AS right, "
        f"bl || br AS merged, CAST(cnt AS BIGINT) AS pair_freq, score FROM best{k}"
        for k in range(1, n_merges + 1)
    )
    return _wp_cte_prefix(n_merges) + "\n" + sel


def wordpiece_encode_oracle_sql(n_merges: int, max_sym_len: int = 16) -> str:
    """DuckDB replay of vocab-then-encode: final vocabulary = v0's
    distinct symbols + every merged symbol; greedy longest-match walk
    as a precomputed per-position max-jump table + a linear recursive
    cursor walk (the unigram-oracle backtrack tactic)."""
    merged_sel = "\n        UNION ALL\n        ".join(
        f"SELECT bl || br AS sym FROM best{k}" for k in range(1, n_merges + 1)
    )
    return (
        _wp_cte_prefix(n_merges)
        + f""",
    vocab AS MATERIALIZED (
      SELECT DISTINCT sym FROM (
        SELECT unnest(syms) AS sym FROM v0
        UNION ALL
        {merged_sel}
      )
    ),
    wtab AS MATERIALIZED (
      SELECT w, w || '{END_OF_WORD}' AS aug FROM v0
    ),
    jump AS MATERIALIZED (
      SELECT w, i, MAX(l) AS maxl FROM (
        SELECT wtab.w, s - 1 AS i, l
        FROM wtab,
             LATERAL (SELECT unnest(generate_series(1,
               least({max_sym_len}, length(aug)))) AS l),
             LATERAL (SELECT unnest(generate_series(1,
               length(aug) - l + 1)) AS s)
        JOIN vocab ON vocab.sym = substring(aug, s, l)
      ) GROUP BY w, i
    ),
    walk(w, pos, k) AS (
      SELECT w, 0, 0 FROM wtab
      UNION ALL
      SELECT wk.w, wk.pos + j.maxl, wk.k + 1
      FROM walk wk JOIN jump j ON j.w = wk.w AND j.i = wk.pos
    ),
    wenc AS MATERIALIZED (
      SELECT w, MAX(k) AS n_wp FROM walk GROUP BY w
    ),
    doc_words AS MATERIALIZED (
      SELECT doc_id, w, COUNT(*) AS n FROM (
        SELECT doc_id,
               unnest(list_transform({_SQL_TOKS}, x -> lower(x))) AS w
        FROM documents
      ) GROUP BY doc_id, w
    )
    SELECT doc_id,
           CAST(SUM(n) AS BIGINT) AS n_words,
           CAST(SUM(n * e.n_wp) AS BIGINT) AS n_wp_tokens,
           ROUND(SUM(n * length(doc_words.w)) / (1.0 * SUM(n * e.n_wp)) + 1e-9, 4)
             AS chars_per_wp_token
    FROM doc_words
    JOIN wenc e ON e.w = doc_words.w
    GROUP BY doc_id
    """
    )


from .bpe import _ORACLE_TOKS as _SQL_TOKS  # noqa: E402
