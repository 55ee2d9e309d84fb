"""The reference's EP3 analytics job (redditProcessor.py:56-156,
SURVEY.md section 3) as ONE lazy DataFrame plan.

Reference control flow -> engine plan:
  ES scroll scan x2 + multi_match pushdown  -> two filtered scans (O4/O15)
  sort by created_utc (O25)                 -> orderBy (only where output
                                               order matters; the union
                                               input sort is dropped —
                                               pandas needed it only for
                                               lexicographic-ISO reasons)
  title+selftext concat, p_id/body rename   -> concat_ws / alias (O19/O14)
  pd.concat union (O28)                     -> unionByName
  preprocess .apply (O20/O40)               -> native regex chain
  VADER sentiment .apply (O21)              -> relational lexicon scorer
  TF-IDF + LDA + widen + topic names        -> Spark ML pipeline (O31-O34)
  batch_id stamp (O23)                      -> lit(run_id)
  bulk ES writes (O9)                       -> parquet append sinks

The whole relational prefix is a single Catalyst plan — scans, filters,
projection, union, regex chain, sentiment join, all whole-stage-codegen;
only the LDA fit is an ML iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.sentiment import score_relational
from ..functions.text import concat_title_body, normalize_text
from ..operators.relational import contains_filter, schema_aligned_union
from ..operators.topics import fit_topics, topic_names, widen_topics

ANALYSIS_COLS = ["id", "created_utc", "subreddit", "score", "text"]


def prepare_corpus(posts: DataFrame, comments: DataFrame, keyword: str = "coffee") -> DataFrame:
    """Filter + align + union the post/comment corpora
    (redditProcessor.py:67-95)."""
    p = contains_filter(posts, ["title", "selftext"], keyword).select(
        "id",
        "created_utc",
        "subreddit",
        "score",
        concat_title_body("title", "selftext").alias("text"),
    )
    c = contains_filter(comments, ["body"], keyword).select(
        F.col("p_id").alias("id"),
        "created_utc",
        "subreddit",
        "score",
        F.col("body").alias("text"),
    )
    merged = schema_aligned_union(p, c, ANALYSIS_COLS)
    return merged.withColumn("text", normalize_text("text"))


def run_analytics(
    posts: DataFrame,
    comments: DataFrame,
    keyword: str = "coffee",
    k: int = 20,
    seed: int = 42,
    batch_id: str = "batch-0",
) -> tuple[DataFrame, DataFrame]:
    """Full EP3: returns (analysis_df, topic_names_df) — the
    `reddit-analysis` and `reddit-topic` outputs (A4/A5 in FIXTURES.md).

    A surrogate doc key (`monotonically_increasing_id`) is carried
    through the ML pipeline so the topic matrix re-attaches by key, not
    by row position (fixes O29's distribution-hostile positional join)."""
    corpus = prepare_corpus(posts, comments, keyword).withColumn(
        "_doc", F.monotonically_increasing_id()
    )
    sent = score_relational(corpus, ["_doc"], "text")
    corpus_s = corpus.join(sent, "_doc")

    model, transformed = fit_topics(corpus_s, id_col="_doc", text_col="text", k=k, seed=seed)
    wide = widen_topics(transformed, ["_doc"], k=k)
    analysis = (
        corpus_s.join(wide, "_doc")
        .drop("_doc")
        .withColumn("batch_id", F.lit(batch_id))
    )
    names = topic_names(model, top_n=10).withColumn("batch_id", F.lit(batch_id))
    return analysis, names
