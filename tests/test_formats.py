"""Interchange-format connectors (`sources/formats.py`): typed
round-trips for CSV/JSON/ORC, corrupt-record quarantine for the text
formats, and ORC predicate pushdown."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from cloud_native_reddit_data_pipeline_spark.sources.formats import (
    read_quarantined,
    read_table,
    write_table,
)

DDL = (
    "id LONG, name STRING, score DOUBLE, ok BOOLEAN, "
    "d DATE, ts TIMESTAMP"
)


def _frame(spark):
    rows = [
        (1, "alpha", 1.5, True,
         datetime.date(2024, 3, 1),
         datetime.datetime(2024, 3, 1, 12, 30, 45, 123456)),
        (2, "beta,with,commas", -2.25, False,
         datetime.date(1999, 12, 31),
         datetime.datetime(2000, 1, 1, 0, 0, 0)),
        (3, None, None, None, None, None),
    ]
    return spark.createDataFrame(rows, DDL)


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_typed_roundtrip(spark, tmp_path, fmt):
    df = _frame(spark)
    path = str(tmp_path / fmt)
    write_table(df, path, fmt)
    back = read_table(spark, path, fmt, DDL)
    assert back.schema == df.schema
    key = lambda r: (r["id"],)
    assert sorted(back.collect(), key=key) == sorted(df.collect(), key=key)


def test_json_quarantine_routes_bad_rows(spark, tmp_path):
    p = tmp_path / "j"
    p.mkdir()
    (p / "part.json").write_text(
        '{"id": 1, "name": "good", "score": 1.0, "ok": true, "d": "2024-01-01", "ts": "2024-01-01T00:00:00.000000"}\n'
        "this is not json at all\n"
        '{"id": "NOT_A_NUMBER", "name": "bad type"}\n'
    )
    good = read_table(spark, str(p), "json", DDL)
    assert [r["id"] for r in good.collect()] == [1]
    bad = read_quarantined(spark, str(p), "json", DDL)
    assert bad.count() == 2  # both failures preserved for audit


def test_csv_quarantine_routes_bad_rows(spark, tmp_path):
    p = tmp_path / "c"
    p.mkdir()
    (p / "part.csv").write_text(
        "id,name,score,ok,d,ts\n"
        "1,good,1.0,true,2024-01-01,2024-01-01T00:00:00.000000\n"
        "NOT_A_NUMBER,bad,xx,yy,zz,ww\n"
    )
    good = read_table(spark, str(p), "csv", DDL)
    assert [r["id"] for r in good.collect()] == [1]
    assert read_quarantined(spark, str(p), "csv", DDL).count() == 1


def test_orc_predicate_pushdown_reaches_scan(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("bucket"), F.lit("x").alias("pad")
    )
    path = str(tmp_path / "o")
    write_table(df, path, "orc")
    back = read_table(spark, path, "orc", "id LONG, bucket LONG, pad STRING")
    q = back.filter(F.col("bucket") == 3).select("id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(bucket), EqualTo(bucket,3)]" in plan
    # column pruning too: pad is not read
    read_line = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "pad" not in read_line
    assert q.count() == df.filter("bucket = 3").count()


def test_unsupported_format_rejected(spark, tmp_path):
    with pytest.raises(ValueError):
        write_table(_frame(spark), str(tmp_path / "x"), "xml")
    with pytest.raises(ValueError):
        read_table(spark, str(tmp_path / "x"), "avro", DDL)
