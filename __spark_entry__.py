"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over `cloud_native_reddit_data_pipeline_spark.queries`, which
registers every implemented operator from SURVEY.md section 2 (plus north-star
training-data operators) as (spark_fn, duckdb_oracle) pairs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloud_native_reddit_data_pipeline_spark import queries as _registry
from cloud_native_reddit_data_pipeline_spark.functions.sentiment import score_relational
from cloud_native_reddit_data_pipeline_spark.functions.text import normalize_text
from cloud_native_reddit_data_pipeline_spark.sources.tables import load

FLAGSHIP_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (smoke check at sf0.001): the reference's EP3
    relational core on the `documents` table — keyword filter (O15) ->
    normalization chain (O20) -> relational sentiment (O21) -> grouped
    aggregation.  One Catalyst plan, no Python in the loop."""
    docs = load(spark, FLAGSHIP_SF_DIR, "documents")
    corpus = docs.filter(
        F.lower(F.col("text")).contains("spark")
        | F.lower(F.col("text")).contains("table")
    ).select("doc_id", "lang", normalize_text("text").alias("text"))
    sent = score_relational(corpus, ["doc_id"], "text")
    return (
        corpus.join(sent, "doc_id")
        .groupBy("lang", "sentiment")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("sentiment_score"), 4).alias("avg_score"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
