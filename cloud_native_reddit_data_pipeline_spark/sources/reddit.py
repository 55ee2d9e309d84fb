"""Reddit entity schemas + JSON batch ingest (SURVEY.md section 1.3, O12/O22).

The reference moves schemaless JSON dict batches (harvester -> queue ->
ES); we declare explicit StructTypes and parse with `from_json` in
PERMISSIVE mode, routing malformed records to a quarantine column
instead of rejecting the whole batch (reference behavior:
addReddit.py:38-40 drops the entire batch with HTTP 400).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# post doc built at reddit_harvester_sydney.py:44-57, re-projected
# addReddit.py:51-61 (9 cols).
POST_SCHEMA = T.StructType(
    [
        T.StructField("author", T.StringType(), True),
        T.StructField("created_utc", T.TimestampType(), True),
        T.StructField("id", T.StringType(), False),
        T.StructField("num_comments", T.IntegerType(), True),
        T.StructField("score", T.IntegerType(), True),
        T.StructField("selftext", T.StringType(), True),
        T.StructField("subreddit", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
    ]
)

# comment doc built at reddit_harvester_sydney.py:64-75, re-projected
# addReddit.py:107-115 (7 cols).
COMMENT_SCHEMA = T.StructType(
    [
        T.StructField("created_utc", T.TimestampType(), True),
        T.StructField("p_id", T.StringType(), True),
        T.StructField("c_id", T.StringType(), False),
        T.StructField("body", T.StringType(), True),
        T.StructField("subreddit", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("score", T.IntegerType(), True),
    ]
)


def parse_batch_column(raw: Column, item_schema: T.StructType) -> Column:
    """Parse a JSON-array-of-docs queue message (enqueue.py:33,45 payload
    shape) into array<struct>; null on malformed (caller quarantines)."""
    return F.from_json(raw, T.ArrayType(item_schema))


def explode_batches(df: DataFrame, raw_col: str, item_schema: T.StructType) -> DataFrame:
    """JSON batch messages -> one row per document + `_corrupt` flag.

    Malformed messages (from_json -> NULL) survive as quarantine rows
    instead of poisoning the batch — strictly better than the
    reference's all-or-nothing reject (addReddit.py:94-96)."""
    parsed = df.withColumn("_docs", parse_batch_column(F.col(raw_col), item_schema))
    good = (
        parsed.filter(F.col("_docs").isNotNull())
        .select(F.explode(F.col("_docs")).alias("_d"), F.lit(False).alias("_corrupt"))
        .select("_d.*", "_corrupt")
    )
    bad = parsed.filter(F.col("_docs").isNull() & F.col(raw_col).isNotNull()).select(
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in item_schema.fields],
        F.lit(True).alias("_corrupt"),
    )
    return good.unionByName(bad)
