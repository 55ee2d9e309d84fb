"""Composed end-to-end pipeline EP0 -> EP1/EP2 -> EP3 (round-9 verdict
task 3): harvest adapter -> file queue -> streaming stateful-dedup
ingest -> bucketed keyed upsert -> analytics plan, as ONE runnable
composition so the whole chain has a single scale-smoke row
(tools/scale_smoke.py `composed_pipeline_e2e`) instead of only
per-stage evidence.

The synthetic "Reddit" client is deterministic and cursor-based (each
`search()` call returns the next window, like a cron-fired harvester
seeing new posts).  Redelivery is modeled the way it actually happens
in the reference deployment: a SECOND harvester pod with a fresh
seen-set re-harvests an overlapping id range (a restarted Fission pod
loses nothing to Redis here — our seen-set is injected per pod), so
~`redeliver_frac` of the queue messages are true duplicates and the
streaming dedup + idempotent upsert merge both do real work.

Scale shape: driver-side work is the harvester shaping (O(posts) dict
building — the adapter is IO-bound in production); everything after the
queue is the engine's streaming + relational + ML path.  The store is
asserted duplicate-free and complete before analytics runs.
"""

from __future__ import annotations

from types import SimpleNamespace

from pyspark.sql import SparkSession

_EPOCH = 1704067200  # 2024-01-01T00:00:00Z


def _make_submission(i: int, n_comments: int = 2) -> SimpleNamespace:
    sub = SimpleNamespace(display_name="sydney")
    # ~half the posts and comments carry the analytics keyword so the
    # EP3 contains-filter keeps a predictable slice
    kw = "coffee" if i % 2 == 0 else "espresso"
    return SimpleNamespace(
        id=f"p{i}",
        author=f"user{i % 97}",
        created_utc=_EPOCH + i,
        num_comments=n_comments,
        score=i % 100,
        selftext=f"body text {i} about {kw} brewing",
        subreddit=sub,
        title=f"{kw} post {i}",
        url=f"https://example.invalid/{i}",
        comments=[
            SimpleNamespace(
                id=f"c{i}_{j}",
                body=f"comment {j} on {kw} thread {i}",
                created_utc=_EPOCH + i + j + 1,
                score=j,
            )
            for j in range(n_comments)
        ],
    )


class _SyntheticRedditClient:
    """Cursor-based PRAW-shaped search stub: each `search()` call yields
    the next `per_call` submissions of [lo, hi) — one cron firing sees
    one window of new posts."""

    def __init__(self, lo: int, hi: int, per_call: int = 500) -> None:
        self.cursor, self.hi, self.per_call = lo, hi, per_call

    def search(self, subreddit: str, term: str):
        end = min(self.cursor + self.per_call, self.hi)
        for i in range(self.cursor, end):
            yield _make_submission(i)
        self.cursor = end


def run_composed_pipeline(
    spark: SparkSession,
    workdir: str,
    n_posts: int,
    redeliver_frac: float = 0.1,
    k: int = 5,
) -> dict:
    """Run the full composition over `n_posts` unique posts (plus a
    `redeliver_frac` duplicate tail re-harvested by a fresh pod).
    Returns counts; raises if the upserted store contains duplicates or
    is incomplete."""
    from ..sources.harvester import SubredditHarvester
    from ..streaming.ingest import (
        ingest_comments_stream,
        ingest_posts_stream,
        read_bucketed_table,
        start_upsert_stream,
    )
    from .analytics import run_analytics

    queue = f"{workdir}/queue"
    batch = 500

    # EP0 pod 1: the full id range
    c1 = _SyntheticRedditClient(0, n_posts, per_call=batch)
    h1 = SubredditHarvester(c1, queue, batch_size=batch)
    while c1.cursor < n_posts:
        h1.harvest_once()
    # EP0 pod 2 (fresh seen-set): re-harvests the trailing overlap —
    # these batches are REAL duplicates on the queue
    n_dup = max(1, int(n_posts * redeliver_frac))
    c2 = _SyntheticRedditClient(n_posts - n_dup, n_posts, per_call=batch)
    h2 = SubredditHarvester(c2, queue, batch_size=batch)
    while c2.cursor < n_posts:
        h2.harvest_once()

    # EP1/EP2: stateful-dedup ingest -> bucketed keyed upsert.  Size
    # state-store partitions to the micro-batch (the
    # bench_streaming_ingest_upsert note: 32 state partitions on a
    # 500-row trigger is pure overhead).
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        qp = start_upsert_stream(
            ingest_posts_stream(spark, queue),
            f"{workdir}/posts",
            f"{workdir}/ckpt_posts",
            key="id",
            available_now=True,
        )
        qc = start_upsert_stream(
            ingest_comments_stream(spark, queue),
            f"{workdir}/comments",
            f"{workdir}/ckpt_comments",
            key="c_id",
            available_now=True,
        )
        qp.awaitTermination(600)
        qc.awaitTermination(600)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

    posts = read_bucketed_table(spark, f"{workdir}/posts")
    comments = read_bucketed_table(spark, f"{workdir}/comments")

    # the contract the composition exists to prove: despite redelivered
    # queue batches, the store is duplicate-free AND complete
    n_p, n_pd = posts.count(), posts.select("id").distinct().count()
    n_c, n_cd = comments.count(), comments.select("c_id").distinct().count()
    if not (n_p == n_pd == n_posts):
        raise AssertionError(
            f"post store not duplicate-free/complete: rows={n_p} "
            f"distinct={n_pd} expected={n_posts}"
        )
    if not (n_c == n_cd == 2 * n_posts):
        raise AssertionError(
            f"comment store not duplicate-free/complete: rows={n_c} "
            f"distinct={n_cd} expected={2 * n_posts}"
        )

    # EP3: the analytics plan over the upserted store
    analysis, topics = run_analytics(
        posts, comments, keyword="coffee", k=k, batch_id="composed-smoke"
    )
    return {
        "posts": n_p,
        "comments": n_c,
        "analysis_rows": analysis.count(),
        "topic_rows": topics.count(),
    }
