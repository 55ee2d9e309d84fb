"""Streaming top-k term counts (north-star extension; the batch form
is `textstats.top_ngrams` at n=1).

Exact heavy-hitters over an unbounded document stream: each micro-batch
writes its own term-count DELTA to a `batch=<id>` partition; because
integer counts under addition are a commutative monoid, the union of
all deltas aggregates to exactly the batch-wide counts, so the final
top-k (count desc, term asc) is BIT-EQUAL to the batch answer at any
batch split — the oracle asserts precisely that.  This is the exact
counterpart of the approximate SpaceSaving/Misra-Gries stream sketches:
state is vocabulary-sized rather than k-sized, the honest trade for an
exact answer (documented; the CMS operator is the bounded-memory
estimate when vocabulary-scale state is too much).

Exactly-once: delta partitions are idempotent batch-keyed overwrites
(the standard replay contract); a replayed batch overwrites its own
delta rather than double-counting.  Per batch the work is one
tokenize+groupBy over arriving rows; nothing rescans earlier batches
until the final (or periodic) top-k read, which is a vocabulary-sized
groupBy + TakeOrdered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens


def term_counts(batch: DataFrame, text_col: str) -> DataFrame:
    """Lowercase whitespace-token counts of one batch: (term, cnt)."""
    toks = F.transform(tokens(text_col), lambda t: F.lower(t))
    return (
        batch.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def start_topk_terms_stream(
    stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
):
    """foreachBatch driver: write each batch's term-count delta."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        (
            term_counts(batch_df, text_col)
            .withColumn("batch", F.lit(int(batch_id)))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{store_dir}/batch={int(batch_id)}")
        )

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def topk_terms(spark: SparkSession, store_dir: str, k: int) -> DataFrame:
    """Merge all deltas and take the top-k: (term, n) by (n desc,
    term asc) — deterministic boundary."""
    return (
        spark.read.parquet(store_dir)
        .groupBy("term")
        .agg(F.sum("cnt").alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(k)
    )
