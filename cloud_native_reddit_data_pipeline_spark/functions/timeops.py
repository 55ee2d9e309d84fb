"""Timestamp encode/decode (SURVEY.md O18, O23).

The reference hand-builds ISO-8601+"Z" strings from Unix epochs
(reddit_harvester_sydney.py:46-49) and relies on lexicographic order ==
chronological order.  We store real timestamps and only render the ISO
form at the edge.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ISO_Z = "yyyy-MM-dd'T'HH:mm:ss'Z'"


def epoch_to_ts(col: Column | str) -> Column:
    """Unix epoch seconds -> timestamp (replaces utcfromtimestamp)."""
    return F.timestamp_seconds(F.col(col) if isinstance(col, str) else col)


def ts_to_iso(col: Column | str) -> Column:
    """timestamp -> '2024-01-01T00:00:07Z' display form (O18)."""
    return F.date_format(F.col(col) if isinstance(col, str) else col, ISO_Z)


def batch_id(run_ts: Column | None = None) -> Column:
    """Per-run batch id (redditProcessor.py:128: utcnow().isoformat()+'Z',
    O23).  Stamped once at job start, not per row."""
    ts = run_ts if run_ts is not None else F.current_timestamp()
    return F.date_format(ts, ISO_Z)
