"""Harvester -> queue adapter (EP0 of the reference, previously only
described in SURVEY.md §2 O1 as outside the engine boundary — this
module ships the adapter shape as real, testable code).

Mirrors `reddit_harvester_sydney.py:40-105` + `enqueue.py:44` exactly:

  search the subreddit -> skip ids in the seen-set (Redis SISMEMBER) ->
  shape post + comment docs -> mark seen (SADD) -> stop at batch_size ->
  enqueue ONE message per topic containing the whole batch as a JSON
  array (the reference LPUSHes `json.dumps(list)`); an empty batch is
  skipped (enqueue.py returns 204 for empty payloads).

The network-facing pieces are injected: `client` is anything that
yields PRAW-shaped submissions from `search(subreddit, term)` (a real
deployment passes a thin praw.Reddit wrapper; tests pass a fake), and
`seen` is any set-like with `__contains__`/`add` (a real deployment
passes a Redis-set adapter).  The queue side is the engine's file queue
(`streaming.ingest.write_queue_batch`), which the streaming ingest
consumes — so harvest -> queue -> ingest runs end-to-end in tests.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone
from typing import Any, Iterable

from ..streaming.ingest import write_queue_batch


def _iso_utc(epoch: float) -> str:
    """epoch seconds -> 'YYYY-MM-DDTHH:MM:SSZ', the reference's
    datetime.utcfromtimestamp(...).isoformat() + 'Z' encoding (O18)."""
    return (
        datetime.fromtimestamp(epoch, tz=timezone.utc)
        .replace(tzinfo=None)
        .isoformat()
        + "Z"
    )


def post_doc(submission: Any) -> dict:
    """Shape a submission into the reference's post document
    (reddit_harvester_sydney.py:44-56), field for field."""
    return {
        "author": str(submission.author),
        "created_utc": _iso_utc(submission.created_utc),
        "id": submission.id,
        "num_comments": submission.num_comments,
        "score": submission.score,
        "selftext": submission.selftext,
        "subreddit": submission.subreddit.display_name,
        "title": submission.title,
        "url": submission.url,
    }


def comment_doc(submission: Any, comment: Any) -> dict:
    """Shape a comment into the reference's comment document
    (reddit_harvester_sydney.py:64-73): carries the parent's id and
    title alongside the comment fields."""
    return {
        "created_utc": _iso_utc(comment.created_utc),
        "p_id": submission.id,
        "c_id": comment.id,
        "body": comment.body,
        "subreddit": submission.subreddit.display_name,
        "title": submission.title,
        "score": comment.score,
    }


class SubredditHarvester:
    """One harvester instance per subreddit (the reference deploys one
    Fission function per city subreddit; the spec files differ only in
    `subreddit_name` and the user agent).

    `harvest_once()` is one cron firing of the reference's `main()`:
    fetch -> dedup -> shape -> enqueue.  Returns counts for logging."""

    def __init__(
        self,
        client: Any,
        queue_path: str,
        subreddit: str = "sydney",
        search_term: str = "coffee",
        batch_size: int = 10,
        post_topic: str = "rharvest",
        comment_topic: str = "rharvestcomment",
        seen: Any | None = None,
    ) -> None:
        self.client = client
        self.queue_path = queue_path
        self.subreddit = subreddit
        self.search_term = search_term
        self.batch_size = batch_size
        self.post_topic = post_topic
        self.comment_topic = comment_topic
        # the reference's REDIS_DUPLICATE_SET ("reddit_post_ids");
        # any set-like with __contains__/add works (Redis adapter in prod)
        self.seen = seen if seen is not None else set()

    def harvest_once(self) -> dict:
        new_posts: list[dict] = []
        new_comments: list[dict] = []
        submissions: Iterable[Any] = self.client.search(
            self.subreddit, self.search_term
        )
        count = 0
        for submission in submissions:
            if submission.id in self.seen:  # SISMEMBER, harvester:41
                continue
            new_posts.append(post_doc(submission))
            # The reference flattens the FULL comment tree:
            # comments.replace_more(limit=None) then comments.list()
            # (reddit_harvester_sydney.py:60-63).  Mirror that when the
            # injected client exposes the PRAW CommentForest API; plain
            # iterables (tests, pre-flattened feeds) are used as-is and
            # must already be flat.
            forest = submission.comments
            if hasattr(forest, "replace_more") and hasattr(forest, "list"):
                forest.replace_more(limit=None)
                comments = forest.list()
            else:
                comments = forest
            for comment in comments:
                new_comments.append(comment_doc(submission, comment))
            self.seen.add(submission.id)  # SADD, harvester:79
            count += 1
            if count >= self.batch_size:  # batch cap, harvester:82-83
                break
        # one queue message per topic holding the whole batch as a JSON
        # array (enqueue.py:44 LPUSHes json.dumps(list)); empty batches
        # are skipped (enqueue.py:40-42)
        if new_posts:
            write_queue_batch(self.queue_path, self.post_topic, [json.dumps(new_posts)])
        if new_comments:
            write_queue_batch(
                self.queue_path, self.comment_topic, [json.dumps(new_comments)]
            )
        return {"posts": len(new_posts), "comments": len(new_comments)}
