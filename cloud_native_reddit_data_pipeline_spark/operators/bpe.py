"""Distributed byte-pair-encoding (BPE) merge learning.

The core of every modern LLM tokenizer (GPT-2/SentencePiece-style): start
from characters, repeatedly merge the most frequent adjacent symbol pair.
The reference has no tokenizer at all (its NLP is bag-of-words TF-IDF,
redditProcessor.py:103-110); this is an additive north-star operator for
the training-data pipeline — the engine that counts the corpus must be
the engine that learns the vocabulary, or the corpus moves twice.

Spark-first shape: the corpus collapses to the *word-frequency* table
after one explode+groupBy (vocabulary-sized — millions of rows at 100 TB,
not trillions), and every merge iteration is pair-counting + a per-word
symbol rewrite on that small table.  Pair statistics aggregate with
map-side combine; the argmax pair is a one-row collect (a learned model
parameter, same driver-side role as the k-means centroid fetch in
operators/clustering.py).  The symbol rewrite is a JVM-side higher-order
aggregate (left-to-right non-overlapping, exactly classic BPE) — no
Python UDF anywhere.  Lineage is truncated with localCheckpoint every few
iterations, the same guard the iterative graph operators use (cadence 2:
the rewrite lambdas evaluate interpreted per symbol, so re-deriving
several stacked rewrite layers on every pair-count pass costs far more
than materializing the vocabulary table — measured 3.6x wall at
cadence 5 vs 2 on sf0.1).

Determinism: pair counts are exact long sums; ties break lexicographically
on (left, right).  tests/test_bpe.py pins the merge sequence against an
independent pure-Python reference implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens

END_OF_WORD = "</w>"


def word_symbol_table(
    df: DataFrame, text_col: str, words: DataFrame | None = None
) -> DataFrame:
    """Corpus -> (word, freq, syms) with syms = characters + end-of-word
    marker.  One explode + one groupBy; everything after runs on this
    vocabulary-sized table.  ``words`` short-circuits the collapse with
    a precomputed (w, freq) table — the composed fertility query
    derives ONE word-frequency table from the corpus and shares it
    across all three tokenizer legs instead of re-scanning per leg
    (pass it materialized: the caller owns the persistence)."""
    if words is None:
        exploded = df.select(
            F.explode(
                F.transform(tokens(text_col), lambda t: F.lower(t))
            ).alias("w")
        )
        words = exploded.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    vocab = words.select("w", "freq")
    chars = F.filter(F.split(F.col("w"), ""), lambda c: c != F.lit(""))
    return vocab.withColumn(
        "syms", F.concat(chars, F.array(F.lit(END_OF_WORD)))
    )


def _merge_adjacent(syms_col: str, left: str, right: str) -> F.Column:
    """Rewrite a symbol array, replacing adjacent (left, right) pairs with
    the concatenated symbol, left-to-right non-overlapping — classic BPE
    application, as a codegen'd higher-order aggregate (no UDF)."""
    merged = left + right
    syms = F.col(syms_col)
    step = F.aggregate(
        F.sequence(F.lit(1), F.size(syms)),
        F.struct(
            F.array().cast("array<string>").alias("out"),
            F.lit(False).alias("skip"),
        ),
        lambda acc, i: F.when(
            acc["skip"],
            F.struct(acc["out"].alias("out"), F.lit(False).alias("skip")),
        )
        .when(
            (F.element_at(syms, i) == F.lit(left))
            & (F.coalesce(
                # try_element_at: i+1 runs past the array at the last
                # index, and ANSI-mode element_at would throw there —
                # the old form survived only because And short-circuits
                # on a '</w>'-suffix invariant (ADVICE r3).
                F.try_element_at(syms, i + 1) == F.lit(right), F.lit(False)
            )),
            F.struct(
                F.concat(acc["out"], F.array(F.lit(merged))).alias("out"),
                F.lit(True).alias("skip"),
            ),
        )
        .otherwise(
            F.struct(
                F.concat(acc["out"], F.array(F.element_at(syms, i))).alias("out"),
                F.lit(False).alias("skip"),
            )
        ),
        lambda acc: acc["out"],
    )
    return step


def _select_merge_batch(rows, max_batch: int, known_symbols=frozenset()):
    """Pick the longest PREFIX of the sorted pair list that provably
    yields the same merge sequence as one-at-a-time greedy BPE.

    rows are sorted by (cnt desc, l asc, r asc).  A prefix p1..pj is
    sequentially-exact when (a) it is consecutive in sorted order (no
    pair may be skipped: a skipped higher-count pair could still win a
    later round), (b) the pairs are pairwise symbol-disjoint, no pair's
    symbol equals an earlier selected pair's concatenation, and no two
    selected pairs share a concatenation (so no earlier merge can
    create or destroy occurrences of a later batch member), and
    (c) every selected count is STRICTLY greater than t, the count of
    the first excluded pair.  (c) is what makes created pairs harmless:
    any pair a batch merge can create descends from an initial pair
    that conflicts with the batch, and every conflicting pair ranks at
    or below the exclusion point, so created counts are <= t <
    count(p_i) — sequential greedy still picks p_i at its turn.

    (c)'s bound assumes created pairs are NEW.  If a selected pair's
    concatenation already exists as a vocabulary symbol via a DIFFERENT
    formation (``'abc'`` from ``ab+c`` when the batch merges ``a+bc``),
    a PRE-EXISTING pair like (X, 'abc') with count <= t gets boosted by
    up to t on top — potentially past a later batch member in (t, 2t),
    which sequential greedy would then reorder.  ``known_symbols`` (the
    symbols prior merges created; initial symbols are single characters
    and can never equal a 2+-char concatenation, except the end-of-word
    marker which is included) closes that hole: such a pair may still
    be selected, but the batch STOPS after it, so no later member can
    be outrun.  Falls back to the plain argmax [p1] when truncation
    empties the prefix (always exact)."""
    batch, used, concats = [], set(), set()
    t = 0
    stop_after = False
    for row in rows:
        concat = row.l + row.r
        conflict = (
            row.l in used
            or row.r in used
            or row.l in concats
            or row.r in concats
            or concat in used
            or concat in concats
        )
        if conflict or stop_after or len(batch) >= max_batch:
            t = row.cnt
            break
        batch.append(row)
        used.update((row.l, row.r))
        concats.add(concat)
        if concat in known_symbols:
            stop_after = True
    batch = [b for b in batch if b.cnt > t] or batch[:1]
    return batch


def learn_bpe_merges(
    df: DataFrame,
    text_col: str,
    n_merges: int = 20,
    checkpoint_every: int = 2,
    max_batch: int = 8,
    words: DataFrame | None = None,
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges from the corpus.  Returns a
    DataFrame (rank int, left str, right str, merged str, pair_freq long)
    in merge order — the merge table a tokenizer ships with.

    Each pass counts pairs ONCE and applies a batch of provably-
    independent merges (`_select_merge_batch`), collapsing the
    n_merges sequential count->collect->rewrite rounds to ~n/batch
    passes — the count shuffle over the vocabulary table is the
    dominant per-round cost at scale, and the batch rule guarantees
    the output sequence is bit-identical to one-merge-per-round
    greedy (pinned against the pure-Python reference in tests)."""
    spark = df.sparkSession
    cur = word_symbol_table(df, text_col, words).select("freq", "syms")
    # LAZY checkpoint: plan truncation happens at checkpoint creation;
    # materialization folds into the first round's pair-count collect
    # instead of paying a separate blocking job (the learn loop is
    # job-count-bound — every barrier removed is a round-trip saved)
    cur = cur.localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, str, int]] = []
    # every non-initial symbol is some applied merge's concatenation;
    # initial symbols are single chars (never equal to a 2+-char
    # concat) plus the end-of-word marker
    known_symbols: set[str] = {END_OF_WORD}
    rounds_since_ckpt = 0
    while len(merges) < n_merges:
        remaining = n_merges - len(merges)
        tail = F.expr("slice(syms, 2, greatest(size(syms) - 1, 0))")
        pairs = (
            cur.filter(F.size("syms") >= 2)
            .select(
                "freq",
                F.explode(F.arrays_zip(F.col("syms").alias("l"), tail.alias("r"))).alias("p"),
            )
            .filter(F.col("p.r").isNotNull())
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
        )
        cap = min(max_batch, remaining)
        # cap+1 rows: the first excluded pair (if any) is the exactness
        # bound t in _select_merge_batch
        top = (
            pairs.orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(cap + 1)
            .collect()
        )
        if not top:
            break
        batch = _select_merge_batch(top, cap, known_symbols)
        for b in batch:
            merges.append((len(merges) + 1, b.l, b.r, b.l + b.r, int(b.cnt)))
            known_symbols.add(b.l + b.r)
            # batch members are mutually independent, so stacking the
            # rewrites in one pass equals applying them one round apiece
            cur = cur.withColumn("syms", _merge_adjacent("syms", b.l, b.r))
        rounds_since_ckpt += len(batch)
        if rounds_since_ckpt >= checkpoint_every:
            # lazy: the next round's collect (or nothing, if this was
            # the final batch — an eager pin here burned a full job
            # whose result was never read) materializes it
            cur = cur.localCheckpoint(eager=False)
            rounds_since_ckpt = 0
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, pair_freq long"
    )


def learn_bpe_merges_py(texts: list[str], n_merges: int = 20) -> list[tuple]:
    """Independent pure-Python reference (for tests): identical greedy
    semantics — word-frequency model, most-frequent pair, lexicographic
    tie-break, left-to-right non-overlapping application."""
    from collections import Counter

    vocab: Counter = Counter()
    for t in texts:
        for w in (t or "").lower().split():
            vocab[w] += 1
    words = {w: list(w) + [END_OF_WORD] for w in vocab}
    out = []
    for rank in range(1, n_merges + 1):
        counts: Counter = Counter()
        for w, syms in words.items():
            f = vocab[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (a, b), cnt = best
        out.append((rank, a, b, a + b, cnt))
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


def bpe_encode_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
    doc_words: DataFrame | None = None,
) -> DataFrame:
    """Apply a learned merge list and report per-document encoding stats
    (word count, BPE token count, chars per BPE token) — the second half
    of the tokenizer contract: learn_bpe_merges produces the vocabulary,
    this encodes the corpus with it.

    Scale shape: the merge rewrite (a chain of higher-order aggregates,
    one per merge) runs on the DISTINCT-WORD table only — vocabulary-
    sized, the same collapse the learner uses — and per-document stats
    come from joining (doc, word, count) back against the encoded
    vocabulary on the word key.  The corpus text is scanned once and
    never carries symbol arrays.  ``doc_words`` short-circuits that
    scan with a precomputed (id, w, n) table — the composed fertility
    query shares one across all three encode legs (caller owns the
    persistence)."""
    if doc_words is None:
        toks = F.transform(tokens(text_col), lambda t: F.lower(t))
        doc_words = (
            df.select(F.col(id_col), F.explode(toks).alias("w"))
            .groupBy(id_col, "w")
            .agg(F.count(F.lit(1)).alias("n"))
        )
    vocab = doc_words.groupBy("w").agg(F.sum("n").alias("_f")).select("w")
    chars = F.filter(F.split(F.col("w"), ""), lambda c: c != F.lit(""))
    enc = vocab.withColumn("syms", F.concat(chars, F.array(F.lit(END_OF_WORD))))
    for i, (a, b) in enumerate(merges, start=1):
        enc = enc.withColumn("syms", _merge_adjacent("syms", a, b))
        if i % 2 == 0:
            # lazy: still segments the higher-order-aggregate expression
            # chain for codegen, but the whole rewrite runs as ONE job
            # at the caller's action instead of one blocking job per
            # two merges (6 sequential vocabulary-table jobs for a
            # 12-merge table)
            enc = enc.localCheckpoint(eager=False)
    enc = enc.select("w", F.size("syms").alias("n_bpe"), F.length("w").alias("n_chars"))
    return (
        doc_words.join(enc, "w")
        .groupBy(id_col)
        .agg(
            F.sum("n").alias("n_words"),
            F.sum(F.col("n") * F.col("n_bpe")).alias("n_bpe_tokens"),
            F.round(
                F.sum(F.col("n") * F.col("n_chars"))
                / F.sum(F.col("n") * F.col("n_bpe"))
                + F.lit(1e-9),
                4,
            ).alias("chars_per_bpe_token"),
        )
    )


_ORACLE_TOKS = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"


def _bpe_round_sql(k: int, best_sql: str | None = None) -> str:
    """One unrolled greedy round: pair counts -> (cnt DESC, l, r) argmax
    -> left-to-right non-overlapping rewrite.  The rewrite uses the
    RUN-PARITY formulation instead of a sequential scan: within each
    maximal run of consecutive candidate positions (s[i]=l, s[i+1]=r),
    exactly the odd-indexed ones merge — equivalent to the greedy scan,
    but expressible with two window functions.  Every CTE is
    MATERIALIZED: the rewrite references its round's inputs several
    times, and un-materialized inlining grows exponentially in rounds.

    ``best_sql`` overrides the best{k} CTE body (it must produce
    columns bl, br and may add more) — the WordPiece oracle reuses the
    whole rewrite machinery with a likelihood-score argmax instead of
    the frequency argmax (operators/wordpiece.py)."""
    p = k - 1
    if best_sql is None:
        best_sql = f"""
      SELECT l AS bl, r AS br, cnt FROM pairs{k}
      ORDER BY cnt DESC, l, r LIMIT 1"""
    return f"""
    pairs{k} AS MATERIALIZED (
      SELECT l, r, SUM(freq) AS cnt FROM (
        SELECT freq, unnest(list_zip(syms, syms[2:])) AS z
        FROM v{p} WHERE len(syms) >= 2
      ), LATERAL (SELECT z[1] AS l, z[2] AS r)
      WHERE r IS NOT NULL GROUP BY l, r
    ),
    best{k} AS MATERIALIZED ({best_sql}
    ),
    u{k} AS MATERIALIZED (
      SELECT w, freq, i, syms[i] AS s,
             (syms[i] = b.bl AND syms[i + 1] = b.br) AS cand
      FROM v{p} CROSS JOIN best{k} b,
           LATERAL (SELECT unnest(generate_series(1, len(syms))) AS i)
    ),
    cand{k} AS MATERIALIZED (
      SELECT w, i, i - ROW_NUMBER() OVER (PARTITION BY w ORDER BY i) AS grp
      FROM u{k} WHERE cand
    ),
    real{k} AS MATERIALIZED (
      SELECT w, i,
             (ROW_NUMBER() OVER (PARTITION BY w, grp ORDER BY i) % 2) = 1
               AS realized
      FROM cand{k}
    ),
    v{k} AS MATERIALIZED (
      SELECT w, ANY_VALUE(freq) AS freq,
             list(sym ORDER BY i) FILTER (WHERE sym IS NOT NULL) AS syms
      FROM (
        SELECT m.w, m.freq, m.i,
               CASE WHEN COALESCE(r1.realized, FALSE)
                      THEN (SELECT bl || br FROM best{k})
                    WHEN COALESCE(r0.realized, FALSE) THEN NULL
                    ELSE m.s END AS sym
        FROM u{k} m
        LEFT JOIN real{k} r1 ON r1.w = m.w AND r1.i = m.i
        LEFT JOIN real{k} r0 ON r0.w = m.w AND r0.i = m.i - 1
      ) GROUP BY w
      -- early-stop fallback (r6 ADVICE): a corpus that exhausts
      -- mergeable pairs before round {k} leaves best{k} empty and the
      -- CROSS JOIN would empty every later v; pass v{p} through
      -- unchanged instead, mirroring the engine's early stop
      UNION ALL
      SELECT w, freq, syms FROM v{p}
      WHERE NOT EXISTS (SELECT 1 FROM best{k})
    )"""


def _bpe_cte_prefix(n_merges: int) -> str:
    head = f"""
    WITH words AS MATERIALIZED (
      SELECT unnest(list_transform({_ORACLE_TOKS}, x -> lower(x))) AS w
      FROM documents
    ),
    v0 AS MATERIALIZED (
      SELECT w, COUNT(*) AS freq,
             list_append(regexp_split_to_array(w, ''), '{END_OF_WORD}') AS syms
      FROM words GROUP BY w
    )"""
    return head + "," + ",".join(_bpe_round_sql(k) for k in range(1, n_merges + 1))


def bpe_merges_oracle_sql(n_merges: int) -> str:
    """DuckDB replay of `learn_bpe_merges` as unrolled one-merge-per-
    round greedy CTEs (the engine's provably-equivalent batched form
    collapses to the same sequence).  Same kmeans-oracle tactic: the
    iterative algorithm is finite and deterministic, so unroll it."""
    sel = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS INT) AS rank, bl AS left, br AS right, "
        f"bl || br AS merged, CAST(cnt AS BIGINT) AS pair_freq FROM best{k}"
        for k in range(1, n_merges + 1)
    )
    return _bpe_cte_prefix(n_merges) + "\n" + sel


def bpe_encode_oracle_sql(n_merges: int) -> str:
    """DuckDB replay of learn-then-encode (`bpe_encode_stats` with the
    merges learned from the same corpus): the final per-word symbol
    table IS the learner's v{n}, so the encode stats are one join of
    per-doc word counts against len(v{n}.syms)."""
    n = n_merges
    return (
        _bpe_cte_prefix(n)
        + f""",
    doc_words AS MATERIALIZED (
      SELECT doc_id, w, COUNT(*) AS n FROM (
        SELECT doc_id,
               unnest(list_transform({_ORACLE_TOKS}, x -> lower(x))) AS w
        FROM documents
      ) GROUP BY doc_id, w
    ),
    enc AS MATERIALIZED (
      SELECT w, len(syms) AS n_bpe, length(w) AS n_chars FROM v{n}
    )
    SELECT doc_id,
           CAST(SUM(n) AS BIGINT) AS n_words,
           CAST(SUM(n * n_bpe) AS BIGINT) AS n_bpe_tokens,
           ROUND(SUM(n * n_chars) / (1.0 * SUM(n * n_bpe)) + 1e-9, 4)
             AS chars_per_bpe_token
    FROM doc_words JOIN enc USING (w)
    GROUP BY doc_id
    """
    )
