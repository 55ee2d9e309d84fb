from __future__ import annotations

import json
import os
from types import SimpleNamespace


def _submission(i, n_comments=2, epoch=1704067200):
    sub = SimpleNamespace(display_name="sydney")
    return SimpleNamespace(
        id=f"p{i}",
        author=f"user{i}",
        created_utc=epoch + i,
        num_comments=n_comments,
        score=i,
        selftext=f"body {i}",
        subreddit=sub,
        title=f"coffee post {i}",
        url=f"https://example.invalid/{i}",
        comments=[
            SimpleNamespace(
                id=f"c{i}_{j}", body=f"comment {j}", created_utc=epoch + i + j, score=j
            )
            for j in range(n_comments)
        ],
    )


class FakeClient:
    """PRAW-shaped search stub: yields a fixed submission list."""

    def __init__(self, submissions):
        self.submissions = submissions
        self.calls = []

    def search(self, subreddit, term):
        self.calls.append((subreddit, term))
        return iter(self.submissions)


def test_harvest_once_shapes_docs_and_batches(tmp_path):
    from cloud_native_reddit_data_pipeline_spark.sources.harvester import (
        SubredditHarvester,
    )

    queue = str(tmp_path / "q")
    client = FakeClient([_submission(i) for i in range(4)])
    h = SubredditHarvester(client, queue, batch_size=10)
    counts = h.harvest_once()
    assert counts == {"posts": 4, "comments": 8}
    assert client.calls == [("sydney", "coffee")]

    # one message per topic, each one JSON array (the reference LPUSHes
    # json.dumps(batch) as a single element)
    post_files = os.listdir(os.path.join(queue, "topic=rharvest"))
    comment_files = os.listdir(os.path.join(queue, "topic=rharvestcomment"))
    assert len(post_files) == 1 and len(comment_files) == 1
    with open(os.path.join(queue, "topic=rharvest", post_files[0])) as f:
        lines = f.read().splitlines()
    assert len(lines) == 1
    batch = json.loads(lines[0])
    assert [p["id"] for p in batch] == ["p0", "p1", "p2", "p3"]
    # exact reference doc shape (reddit_harvester_sydney.py:44-56)
    assert set(batch[0]) == {
        "author", "created_utc", "id", "num_comments", "score",
        "selftext", "subreddit", "title", "url",
    }
    assert batch[0]["created_utc"].endswith("Z")
    assert batch[0]["subreddit"] == "sydney"


def test_harvest_flattens_praw_comment_forest(tmp_path):
    """A PRAW-shaped CommentForest (replace_more + list) must be fully
    flattened like the reference (reddit_harvester_sydney.py:60-63) —
    nested replies included, MoreComments resolved first."""
    from cloud_native_reddit_data_pipeline_spark.sources.harvester import (
        SubredditHarvester,
    )

    class FakeForest:
        def __init__(self, flat):
            self._flat = flat
            self.replace_more_calls = []

        def replace_more(self, limit):
            self.replace_more_calls.append(limit)

        def list(self):
            return list(self._flat)

        def __iter__(self):  # top-level-only iteration must NOT be used
            raise AssertionError("adapter iterated the forest directly")

    epoch = 1704067200
    flat = [
        SimpleNamespace(id=f"c{j}", body=f"c {j}", created_utc=epoch + j, score=j)
        for j in range(5)  # includes nested replies a plain iter would miss
    ]
    sub = _submission(0, n_comments=0)
    forest = FakeForest(flat)
    sub.comments = forest
    h = SubredditHarvester(FakeClient([sub]), str(tmp_path / "q"), batch_size=10)
    counts = h.harvest_once()
    assert counts == {"posts": 1, "comments": 5}
    assert forest.replace_more_calls == [None]  # replace_more(limit=None)


def test_harvest_seen_set_and_batch_cap(tmp_path):
    from cloud_native_reddit_data_pipeline_spark.sources.harvester import (
        SubredditHarvester,
    )

    queue = str(tmp_path / "q")
    subs = [_submission(i, n_comments=0) for i in range(7)]
    for s in subs:
        s.comments = []
    client = FakeClient(subs)
    h = SubredditHarvester(client, queue, batch_size=3)

    assert h.harvest_once()["posts"] == 3  # cap, harvester:82-83
    # second firing skips the seen ids and takes the next 3
    assert h.harvest_once()["posts"] == 3
    assert h.harvest_once()["posts"] == 1
    # everything seen: nothing enqueued (204 skip path — no new file)
    n_files_before = len(os.listdir(os.path.join(queue, "topic=rharvest")))
    assert h.harvest_once() == {"posts": 0, "comments": 0}
    assert len(os.listdir(os.path.join(queue, "topic=rharvest"))) == n_files_before
    assert not os.path.exists(os.path.join(queue, "topic=rharvestcomment"))


def test_harvest_to_ingest_end_to_end(spark, tmp_path):
    """EP0 -> EP1/EP2: harvested batches flow through the streaming
    ingest into the keyed upsert tables, comments joined to posts."""
    from cloud_native_reddit_data_pipeline_spark.sources.harvester import (
        SubredditHarvester,
    )
    from cloud_native_reddit_data_pipeline_spark.streaming.ingest import (
        ingest_comments_stream,
        ingest_posts_stream,
        read_bucketed_table,
        start_upsert_stream,
    )

    queue = str(tmp_path / "q")
    client = FakeClient([_submission(i, n_comments=3) for i in range(5)])
    SubredditHarvester(client, queue, batch_size=10).harvest_once()

    qp = start_upsert_stream(
        ingest_posts_stream(spark, queue),
        str(tmp_path / "tp"),
        str(tmp_path / "cp"),
        key="id",
        available_now=True,
    )
    qc = start_upsert_stream(
        ingest_comments_stream(spark, queue),
        str(tmp_path / "tc"),
        str(tmp_path / "cc"),
        key="c_id",
        available_now=True,
    )
    qp.awaitTermination(120)
    qc.awaitTermination(120)

    posts = read_bucketed_table(spark, str(tmp_path / "tp"))
    comments = read_bucketed_table(spark, str(tmp_path / "tc"))
    assert posts.count() == 5
    assert comments.count() == 15
    joined = comments.join(posts.select("id"), comments.p_id == posts.id)
    assert joined.count() == 15  # every comment's parent resolves
