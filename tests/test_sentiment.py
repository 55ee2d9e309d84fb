from __future__ import annotations

from cloud_native_reddit_data_pipeline_spark.functions.sentiment import (
    score_pandas_udf,
    score_relational,
)


def test_relational_and_pandas_udf_paths_agree(spark):
    df = spark.createDataFrame(
        [
            (1, "good great coffee"),
            (2, "bad terrible awful slow"),
            (3, "neutral words only here"),
            (4, ""),
        ],
        "id int, text string",
    )
    rel = {
        r["id"]: (r["sentiment_score"], r["sentiment"])
        for r in score_relational(df, ["id"], "text").collect()
    }
    udf = {
        r["id"]: (r["sentiment_score"], r["sentiment"])
        for r in score_pandas_udf(df, "text").select("id", "sentiment_score", "sentiment").collect()
    }
    assert rel == udf
    assert rel[1][1] == "positive"
    assert rel[2][1] == "negative"
    assert rel[3] == (0.0, "neutral")
    assert rel[4] == (0.0, "neutral")


def test_threshold_rule(spark):
    # score must be strictly > 0.05 for positive (redditProcessor.py:28-33)
    df = spark.createDataFrame([(1, "good")], "id int, text string")
    row = score_relational(df, ["id"], "text").first()
    assert row["sentiment_score"] > 0.05 and row["sentiment"] == "positive"
