"""Interchange-format connectors: CSV / JSON lines / ORC read+write
with the same discipline `tables.load` applies to parquet — EXPLICIT
schemas (never a driver-side inference scan over a 100 TB input),
permissive parse with corrupt-record quarantine for the text formats,
and Catalyst pushdown kept intact for the columnar one.

Why each format is shaped the way it is at scale:

- **CSV/JSON are row formats**: no column pruning, no predicate
  pushdown — every byte is read and parsed.  They are INGEST EDGES
  (the reference's Reddit API emits JSON; partner drops arrive as
  CSV), so the pattern is read-once -> quarantine bad rows -> write
  parquet/ORC, never repeated analytics over the text files.
- **ORC is columnar with pushdown** (min/max stripe statistics +
  dictionary filters): `read_table` keeps filters in the scan exactly
  like parquet (plan-asserted in tests) — the alternate warehouse
  format for engines standardized on ORC.
- **Explicit schema everywhere**: schema inference samples or scans
  the input on the DRIVER'S clock before the job starts; at 100 TB
  that is a second full read.  Callers pass the StructType/DDL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

_TEXT_FORMATS = {"csv", "json"}
_FORMATS = _TEXT_FORMATS | {"orc"}

# deterministic lexical date/timestamp wire format for the TEXT formats
# (ISO-8601 at MICROsecond precision, UTC session): the writer defaults
# truncate timestamps to milliseconds, which would silently lose
# precision on a round-trip
_TEXT_OPTIONS = {
    "dateFormat": "yyyy-MM-dd",
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
}
_CSV_OPTIONS = {"header": "true", **_TEXT_OPTIONS}


def write_table(df: DataFrame, path: str, fmt: str, mode: str = "overwrite") -> None:
    """Write `df` as csv/json/orc.  CSV gets a header + ISO date/time
    formats; JSON is one object per line (the streaming-friendly
    framing); ORC writes stripe statistics for pushdown."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {sorted(_FORMATS)}")
    w = df.write.mode(mode)
    if fmt in _TEXT_FORMATS:
        for k, v in (_CSV_OPTIONS if fmt == "csv" else _TEXT_OPTIONS).items():
            w = w.option(k, v)
    getattr(w, fmt)(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: T.StructType | str,
    quarantine: bool = True,
) -> DataFrame:
    """Read csv/json/orc under an EXPLICIT schema.  For the text
    formats, PERMISSIVE mode routes unparseable rows into
    `_corrupt_record`; `quarantine=True` drops them from the result
    (pair with `read_quarantined` to inspect) — the same
    corrupt-record contract as sources/reddit.py."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {sorted(_FORMATS)}")
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if fmt == "orc":
        return spark.read.schema(schema).orc(path)
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    r = spark.read.schema(full).option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", CORRUPT_COL
    )
    for k, v in (_CSV_OPTIONS if fmt == "csv" else _TEXT_OPTIONS).items():
        r = r.option(k, v)
    df = getattr(r, fmt)(path)
    if quarantine:
        df = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    return df


def read_quarantined(
    spark: SparkSession, path: str, fmt: str, schema: T.StructType | str
) -> DataFrame:
    """The rows `read_table` dropped: raw text of every record that
    failed the schema — audit them, never silently lose them.

    Spark refuses corrupt-column-only queries over raw text scans
    (column pruning would leave nothing to parse), so the parse is
    pinned, the (small) quarantine set materialized, and the pin
    released — the same materialize-and-release contract as
    caching.py."""
    from ..caching import materialize_and_release

    df = read_table(spark, path, fmt, schema, quarantine=False).persist()
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return materialize_and_release(bad, df)
