"""Sequence packing — the batching primitive that turns a cleaned,
token-counted corpus into fixed-budget training sequences.

Two formulations of the same greedy running-sum assignment:

- ``pack_sequences`` (the scale path): shard the corpus on a
  deterministic key, then pack *within* each shard with a partitioned
  window.  Packing needs no global document order — only budget
  adherence — so each shard's cumulative sum runs as an independent
  task and the plan has exactly one shuffle (the window's hash
  partitioning on the shard key).  At 100 TB this is the only viable
  shape: N shards -> N parallel window tasks, no single-partition sort.

- ``pack_sequences_global`` (the exact small-data twin): one
  unpartitioned running sum in strict ``doc_id`` order.  Spark executes
  an unpartitioned window on ONE partition — correct, oracle-able, and
  deliberately reserved for bounded inputs (oracle runs, golden files).

Pack ids from the sharded form are globally unique via shard-major
encoding (``shard * 2^32 + local_pack``), so downstream group-bys on
``pack_id`` never collide across shards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: shard-major multiplier: supports 2^32 packs per shard before collision.
_SHARD_STRIDE = 1 << 32


def with_token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Project (doc_id, n_tok): whitespace token count, JVM-side."""
    from ..functions.text import tokens

    return docs.select(
        "doc_id", F.size(tokens(text_col)).cast("long").alias("n_tok")
    )


def pack_sequences(
    with_ntok: DataFrame,
    budget: int,
    n_shards: int = 32,
    key_col: str = "doc_id",
) -> DataFrame:
    """Partition-local greedy packing (the 100-TB path).

    Shards rows by ``pmod(key, n_shards)``, runs the running token sum
    per shard (partitioned window -> one ordinary hash-partition
    shuffle, every shard packed in parallel), and emits globally unique
    ``pack_id = shard * 2^32 + local_pack``.

    Budget adherence is per-pack and therefore unaffected by sharding;
    only the *grouping* of documents into packs differs from the global
    form, which is exactly the freedom packing has.  ``n_shards``
    should be sized so each shard's rows fit a task comfortably
    (rows / n_shards well under tens of millions).
    """
    part = F.pmod(F.col(key_col), F.lit(n_shards)).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum("n_tok").over(w)
    local_pack = F.floor((cum - F.col("n_tok")) / F.lit(budget))
    return with_ntok.select("*", part).select(
        key_col,
        "n_tok",
        "shard",
        (F.col("shard") * F.lit(_SHARD_STRIDE) + local_pack).alias("pack_id"),
    )


def pack_sequences_global(
    with_ntok: DataFrame, budget: int, key_col: str = "doc_id"
) -> DataFrame:
    """Exact global-order twin: single unpartitioned running sum.

    Spark runs this on ONE partition (it will warn) — use only for
    bounded inputs; ``pack_sequences`` is the scale form.
    """
    w = Window.orderBy(key_col).rowsBetween(Window.unboundedPreceding, 0)
    cum = F.sum("n_tok").over(w)
    return with_ntok.select(
        key_col,
        "n_tok",
        F.floor((cum - F.col("n_tok")) / F.lit(budget)).alias("pack_id"),
    )


def chunk_fixed_sequences(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fixed-length sequence chunking — the complement of packing:
    split each document's token stream into consecutive `seq_len`-token
    chunks (final chunk short; `n_pad` is what a trainer would pad).

    Entirely array expressions inside one narrow projection — sequence +
    slice over the token array, no explode-then-window, no shuffle at
    ANY corpus size; the explode emits finished chunks only.  The 100-TB
    plan is scan -> map, embarrassingly parallel."""
    from ..functions.text import tokens

    # Stage the token array as a column: the transform lambda below
    # must reference an ATTRIBUTE, not the tokenizer expression — a
    # non-lambda-variable subexpression in a lambda body re-evaluates
    # per element, which would tokenize a 1M-token document once per
    # chunk (quadratic per row; the word_shingles lesson).
    staged = docs.select(
        F.col(id_col), tokens(text_col).alias("_tk")
    ).filter(F.size("_tk") > 0)
    toks = F.col("_tk")
    n_chunks = F.ceil(F.size(toks) / F.lit(float(seq_len))).cast("int")
    chunk = F.explode(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                i.cast("int").alias("chunk_id"),
                F.slice(toks, i * seq_len + 1, seq_len).alias("t"),
            ),
        )
    )
    return staged.select(F.col(id_col), chunk.alias("ck")).select(
        id_col,
        F.col("ck.chunk_id").alias("chunk_id"),
        F.size("ck.t").alias("n_chunk_tokens"),
        (F.lit(seq_len) - F.size("ck.t")).alias("n_pad"),
        F.array_join("ck.t", " ").alias("chunk_text"),
    )


def sliding_chunks(
    docs: DataFrame,
    seq_len: int,
    stride: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping sliding-window chunking (stride < seq_len overlaps
    adjacent chunks by seq_len - stride tokens) — the retrieval /
    long-context prep twin of `chunk_fixed_sequences`: overlap keeps
    sentences that straddle a boundary retrievable from both sides.

    Chunk starts are 0, stride, 2*stride, ... while start < n_tokens
    (every token is covered; the final chunk may be short).  Same 100-TB
    plan as fixed chunking: sequence + slice in one narrow projection,
    explode emits finished chunks, no shuffle at any corpus size."""
    from ..functions.text import tokens

    # token array staged as an attribute: see chunk_fixed_sequences
    staged = docs.select(
        F.col(id_col), tokens(text_col).alias("_tk")
    ).filter(F.size("_tk") > 0)
    toks = F.col("_tk")
    n_chunks = F.ceil(F.size(toks) / F.lit(float(stride))).cast("int")
    chunk = F.explode(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                i.cast("int").alias("chunk_id"),
                F.slice(toks, i * stride + 1, seq_len).alias("t"),
            ),
        )
    )
    return staged.select(F.col(id_col), chunk.alias("ck")).select(
        id_col,
        F.col("ck.chunk_id").alias("chunk_id"),
        (F.col("ck.chunk_id") * stride).alias("start_token"),
        F.size("ck.t").alias("n_chunk_tokens"),
        F.array_join("ck.t", " ").alias("chunk_text"),
    )


def length_grouped_batches(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    batch_size: int = 32,
) -> DataFrame:
    """Length-grouped inference batching (the `group_by_length` trick):
    order documents by token count descending (id tie-break), cut the
    ranking into fixed-size batches, and report each batch's padding
    bill — pad_frac = 1 - sum_tokens / (n_docs * max_tokens), the
    fraction of a padded (batch x max_len) tensor that is wasted.
    Sorting by length makes same-batch lengths similar, which is the
    whole point: random batching pads every sequence to the batch max.

    Scale shape: the global ordering rides
    `relational.with_global_row_numbers` (range-partitioned sort +
    per-partition offsets — no single-partition window at any corpus
    size); batch stats are one groupBy on batch_id with exact integer
    sums."""
    from ..functions.text import tokens
    from .relational import with_global_row_numbers

    base = docs.select(
        F.col(id_col), F.size(tokens(text_col)).alias("n_tokens")
    )
    ranked = with_global_row_numbers(
        base, [F.desc("n_tokens"), F.asc(id_col)], col_name="_rn"
    )
    batched = ranked.withColumn(
        "batch_id", F.expr(f"(_rn - 1) div {int(batch_size)}")
    )
    per = batched.groupBy("batch_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("n_tokens").alias("max_tokens"),
        F.sum("n_tokens").alias("sum_tokens"),
    )
    pad = F.when(
        (F.col("max_tokens") > 0) & (F.col("n_docs") > 0),
        1.0
        - F.col("sum_tokens")
        / (F.col("n_docs").cast("double") * F.col("max_tokens")),
    ).otherwise(F.lit(0.0))
    return per.select(
        F.col("batch_id").cast("long").alias("batch_id"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("max_tokens").cast("long").alias("max_tokens"),
        F.col("sum_tokens").cast("long").alias("sum_tokens"),
        F.round(pad + F.lit(1e-9), 6).alias("pad_frac"),
    )


def span_corruption_examples(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block: int = 8,
    span_len: int = 3,
    rate_pct: int = 40,
) -> DataFrame:
    """T5-style span-corruption training examples: mask deterministic
    token spans, emit (input with <extra_id_k> sentinels, target of
    sentinel+masked-tokens runs) per document.

    Span placement is a BLOCK GRID, not a sequential scan: the token
    stream partitions into `block`-token blocks; a block is selected
    when md5(doc_id#block)'s first hex word mod 100 < rate_pct, and the
    span of `span_len` tokens starts at the second hex word mod
    (block - span_len + 1).  Blocks are independent, so the whole
    example builds in ONE per-row fold (scan -> narrow map, no shuffle
    at any corpus size — the chunk_fixed_sequences plan); expected mask
    fraction is rate_pct% * span_len/block (~15% at the defaults), the
    T5 regime.  Sequential-scan corruption (span starts drawn until
    budget, as in the original paper) chains every draw on the previous
    one — inexpressible without a per-row loop AND irreproducible
    across engines; the grid variant is deterministic, engine-exact,
    and keeps the same (rate, mean-span) knobs.

    Long documents should be chunked first (chunk_fixed_sequences);
    the fold is linear in the token count per row."""
    from ..functions.text import tokens

    staged = docs.select(
        F.col(id_col), tokens(text_col).alias("_tk")
    ).filter(F.size("_tk") > 0)
    tk = F.col("_tk")
    n = F.size(tk)
    n_blocks = F.ceil(n / F.lit(float(block))).cast("int")
    did = F.col(id_col).cast("string")

    def fold(acc, b):
        digest = F.md5(F.concat(did, F.lit("#"), b.cast("string")))
        h1 = F.conv(F.substring(digest, 1, 8), 16, 10).cast("long")
        h2 = F.conv(F.substring(digest, 9, 8), 16, 10).cast("long")
        off = F.pmod(h2, F.lit(block - span_len + 1)).cast("int")
        btoks = F.slice(tk, b * block + 1, block)
        sel = (F.pmod(h1, F.lit(100)) < F.lit(rate_pct)) & (off < F.size(btoks))
        sentinel = F.concat(
            F.lit("<extra_id_"), acc["k"].cast("string"), F.lit(">")
        )
        masked = F.slice(btoks, off + 1, span_len)
        inp_sel = F.concat(
            acc["inp"],
            F.slice(btoks, 1, off),
            F.array(sentinel),
            # post-span remainder; slice(start > size) errors under
            # ANSI, so guard with a when on the remaining width
            F.when(
                off + span_len < F.size(btoks),
                F.slice(btoks, off + span_len + 1, block),
            ).otherwise(F.array().cast("array<string>")),
        )
        tgt_sel = F.concat(acc["tgt"], F.array(sentinel), masked)
        return F.when(
            sel,
            F.struct(
                inp_sel.alias("inp"),
                tgt_sel.alias("tgt"),
                (acc["k"] + 1).cast("int").alias("k"),
                (acc["m"] + F.size(masked)).cast("int").alias("m"),
            ),
        ).otherwise(
            F.struct(
                F.concat(acc["inp"], btoks).alias("inp"),
                acc["tgt"].alias("tgt"),
                acc["k"].alias("k"),
                acc["m"].alias("m"),
            )
        )

    built = F.aggregate(
        F.sequence(F.lit(0), n_blocks - 1),
        F.struct(
            F.array().cast("array<string>").alias("inp"),
            F.array().cast("array<string>").alias("tgt"),
            F.lit(0).cast("int").alias("k"),
            F.lit(0).cast("int").alias("m"),
        ),
        fold,
    )
    return staged.select(
        id_col,
        n.alias("n_tokens"),
        built.alias("_b"),
    ).select(
        id_col,
        "n_tokens",
        F.col("_b.k").cast("long").alias("n_spans"),
        F.col("_b.m").cast("long").alias("n_masked"),
        F.floor(F.col("_b.m").cast("long") * 1_000_000 / F.col("n_tokens"))
        .cast("long")
        .alias("mask_ppm"),
        F.array_join("_b.inp", " ").alias("input_text"),
        F.array_join("_b.tgt", " ").alias("target_text"),
    )
