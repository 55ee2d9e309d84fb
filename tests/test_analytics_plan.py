"""End-to-end EP3 analytics plan (plans/analytics.py) on a small
post/comment fixture shaped like FIXTURES.md A1/A2; asserts the A4/A5
output contracts."""

from __future__ import annotations

import datetime as dt

from cloud_native_reddit_data_pipeline_spark.plans.analytics import run_analytics

WORDS = ["espresso", "beans", "roast", "brew", "grind", "filter", "milk", "crema"]


def _fixture(spark):
    base = dt.datetime(2024, 1, 1)
    posts = [
        (
            f"p{i}",
            f"user{i % 3}",
            base + dt.timedelta(hours=i),
            i % 7,
            i - 5,
            f"coffee {WORDS[i % 8]} {WORDS[(i + 1) % 8]} great story",
            ["sydney", "melbourne"][i % 2],
            f"my {WORDS[i % 8]} coffee",
            None,
        )
        for i in range(30)
    ]
    comments = [
        (
            f"c{i}",
            f"p{i % 30}",
            base + dt.timedelta(hours=i, minutes=30),
            f"coffee {WORDS[(i + 2) % 8]} tastes bad {WORDS[i % 8]}",
            "sydney",
            "parent title",
            i,
        )
        for i in range(40)
    ]
    posts_df = spark.createDataFrame(
        posts,
        "id string, author string, created_utc timestamp, num_comments int,"
        " score int, selftext string, subreddit string, title string, url string",
    )
    comments_df = spark.createDataFrame(
        comments,
        "c_id string, p_id string, created_utc timestamp, body string,"
        " subreddit string, title string, score int",
    )
    return posts_df, comments_df


def test_run_analytics_output_contracts(spark):
    posts, comments = _fixture(spark)
    analysis, names = run_analytics(posts, comments, keyword="coffee", k=5, batch_id="b1")
    rows = analysis.collect()
    assert len(rows) == 70  # all posts + comments mention coffee

    for r in rows[:10]:
        # A4 contract: sentiment label matches threshold rule
        s = r["sentiment_score"]
        expected = "positive" if s > 0.05 else ("negative" if s < -0.05 else "neutral")
        assert r["sentiment"] == expected
        # topic distribution: k simplex components
        topics = [r[f"topic_{i + 1}"] for i in range(5)]
        assert all(t >= 0 for t in topics)
        assert abs(sum(topics) - 1.0) < 1e-6
        assert r["batch_id"] == "b1"

    # A5 contract: one name row per topic, 'topic_N: w1 .. w10'
    name_rows = names.collect()
    assert len(name_rows) == 5
    assert all(r["topic_name"].startswith(f"topic_{r['topic'] + 1}: ") for r in name_rows)
