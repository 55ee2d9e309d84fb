from __future__ import annotations

import pyspark.sql.functions as F

from cloud_native_reddit_data_pipeline_spark.operators import relational


def test_project_rename(spark):
    df = spark.createDataFrame([(1, "a", 3.0)], "x int, y string, z double")
    out = relational.project_rename(df, {"y": "name", "x": "id"})
    assert out.columns == ["name", "id"]
    assert out.first()["name"] == "a"


def test_contains_filter_multi_column_or(spark):
    df = spark.createDataFrame(
        [("Coffee is great", "x"), ("tea", "likes COFFEE"), ("tea", "water")],
        "title string, body string",
    )
    out = relational.contains_filter(df, ["title", "body"], "coffee")
    assert out.count() == 2


def test_schema_aligned_union_is_bag(spark):
    a = spark.createDataFrame([(1, "x"), (1, "x")], "id int, v string")
    b = spark.createDataFrame([(1, "x")], "id int, v string")
    assert relational.schema_aligned_union(a, b, ["id", "v"]).count() == 3


def test_topk_per_group(spark):
    df = spark.createDataFrame(
        [("g1", 1), ("g1", 5), ("g1", 3), ("g2", 9)], "g string, v int"
    )
    out = relational.topk_per_group(df, ["g"], [F.desc("v")], 2)
    got = {(r["g"], r["v"]) for r in out.collect()}
    assert got == {("g1", 5), ("g1", 3), ("g2", 9)}


def test_positional_zip_join(spark):
    a = spark.createDataFrame([(10,), (20,), (30,)], "x int")
    b = spark.createDataFrame([("a",), ("b",), ("c",)], "y string")
    out = relational.positional_zip_join(a, b, [F.asc("x")], [F.asc("y")])
    got = sorted((r["x"], r["y"]) for r in out.collect())
    assert got == [(10, "a"), (20, "b"), (30, "c")]


def test_fk_join_left_keeps_orphans(spark):
    child = spark.createDataFrame([("c1", "p1"), ("c2", "zz")], "cid string, pid string")
    parent = spark.createDataFrame([("p1", "t")], "id string, title string")
    out = relational.fk_join(child, parent, "pid", "id", "left")
    assert out.count() == 2
    orphan = out.filter(F.col("cid") == "c2").first()
    assert orphan["title"] is None


def test_rollup_has_grand_total(spark):
    df = spark.createDataFrame([("a", "x", 1), ("a", "y", 2)], "k1 string, k2 string, v int")
    out = relational.rollup_counts(df, ["k1", "k2"], {"n": F.count(F.lit(1))})
    rows = out.collect()
    assert len(rows) == 4  # (a,x),(a,y),(a,null),(null,null)
    total = [r for r in rows if r["k1"] is None and r["k2"] is None]
    assert total[0]["n"] == 2
