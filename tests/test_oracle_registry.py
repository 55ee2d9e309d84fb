"""Fast parity smoke at sf0.001: a representative subset of oracle-backed
queries checked against DuckDB inside pytest (the full registry gate —
67 queries at the time of writing — is tools/parity_check.py)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod
from cloud_native_reddit_data_pipeline_spark.sources.tables import TABLES

SF_DIR = "/root/testdata/sf0.001"

SUBSET = [
    "pricing_summary",
    "filter_contains",
    "normalize_text",
    "fk_join_agg",
    "topk_per_group",
    "sentiment_relational",
    "dedup_fingerprint",
    "simhash_signatures",
    "window_tumbling",
    "session_windows",
]


@pytest.fixture(scope="module")
def ducks():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in sorted(cols):
            v = r[c]
            if isinstance(v, float):
                v = "NaN" if math.isnan(v) else round(v, 6)
            vals.append(repr(v))
        out.append("|".join(vals))
    return sorted(out)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, ducks, name):
    sdf = entrymod.queries()[name](spark, SF_DIR)
    srows = [r.asDict() for r in sdf.collect()]
    rel = ducks.sql(entrymod.oracle_sql()[name])
    orows = [dict(zip(rel.columns, r)) for r in rel.fetchall()]
    assert sorted(sdf.columns) == sorted(rel.columns)
    assert len(srows) == len(orows)
    assert _norm(srows, sdf.columns) == _norm(orows, rel.columns)


def test_every_oracle_key_has_query():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 35


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_bench_headline_queries_all_registered():
    import bench

    assert set(bench.HEADLINE) <= set(entrymod.queries())


def test_approx_distinct_within_tolerance(spark):
    from pyspark.sql import functions as F

    from cloud_native_reddit_data_pipeline_spark.sources.tables import load

    ev = load(spark, SF_DIR, "events")
    exact = ev.select(F.countDistinct("user_id").alias("n")).first()["n"]
    approx = ev.select(
        F.approx_count_distinct("user_id", rsd=0.02).alias("n")
    ).first()["n"]
    assert abs(approx - exact) / exact < 0.05  # sketch within 5% of truth
