"""Parquet table sources (SURVEY.md O4: the reference's full-index ES
scroll scan becomes a plain columnar scan — Catalyst drives partitioning,
column pruning, and predicate pushdown natively, replacing the manual
`_source` projection + `multi_match` pushdown of redditProcessor.py:11-20,67-75).

At 100 TB these are directories of parquet files (ideally partitioned /
bucketed by the join keys); the loader API is identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Column pruning + predicate pushdown are applied by
    Catalyst at the parquet reader (check `.explain`: ReadSchema / PushedFilters).

    Timestamp normalization: the generated parquet has carried both
    TIMESTAMP(NANOS) (earlier rounds — Spark reads it only as long via the
    legacy nanos conf) and timezone-less TIMESTAMP(MICROS) (current — Spark 4
    would infer TIMESTAMP_NTZ).  Both are normalized to session-local
    TIMESTAMP at the scan: NTZ inference is disabled on the session so the
    reader produces TIMESTAMP directly (no cast -> timestamp predicates
    still push down to the parquet scan), and the session timezone is UTC,
    so the values match DuckDB's naive reading of the same file, keeping
    every oracle aligned while LTZ-only functions (unix_micros, window,
    sessionization) keep working unchanged."""
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return _ntz_to_ltz(df)
    return _ntz_to_ltz(spark.read.parquet(f"{sf_dir}/{name}.parquet"))


def _ntz_to_ltz(df: DataFrame) -> DataFrame:
    """Cast every TIMESTAMP_NTZ column to TIMESTAMP.  A no-op projection
    unless the file was written timezone-less; Catalyst still prunes/pushes
    through the cast-free columns."""
    from pyspark.sql import functions as F

    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if not ntz:
        return df
    return df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})


def _parse_bytes(s: str, default: int = 128 * 1024 * 1024) -> int:
    try:
        s = s.strip().lower()
        for suffix, mult in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                             ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                             ("b", 1)):
            if s.endswith(suffix):
                return int(float(s[: -len(suffix)]) * mult)
        return int(s)
    except (ValueError, AttributeError):
        return default


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Spread a compute-heavy input across the cluster.

    Small tables often arrive as one unsplittable parquet row group, so a
    narrow explode/hash stage would run on ONE core.  Round-robin
    repartition to default parallelism fixes that; gated on the SPLIT
    ESTIMATE max(n_files, size/maxPartitionBytes) — file metadata from
    the analyzed plan, never `.rdd` (which would force full physical
    planning per call) — so it is a NO-OP at scale (a 100 TB input
    already has thousands of splits; no extra shuffle is added)."""
    spark = df.sparkSession
    target = min_parts or spark.sparkContext.defaultParallelism
    files = df.inputFiles()
    if len(files) >= target:
        return df
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        size = 0
    max_bytes = _parse_bytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
    )
    est_splits = max(len(files), size // max_bytes)
    if est_splits < target:
        return df.repartition(target)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so `spark.sql` can be used."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
