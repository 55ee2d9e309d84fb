"""Local stand-in for the driver's t2 correctness gate: run every
queries() entry at a given sf against its oracle_sql() via DuckDB and
compare row-count, column names, column TYPES, and (order-insensitive)
values.

The driver's value hash is type-sensitive: a DuckDB HUGEINT (e.g. the
implicit promotion of SUM(BIGINT)) hashes differently from a Spark
long even when every value is identical.  Round 3 shipped two reds for
exactly that reason, so this gate now maps both engines' column types
to a canonical form and fails on any mismatch.

Usage: python tools/parity_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")


def duck_type_to_canon(type_str: str) -> str:
    """Canonicalise a DuckDB type name.  All int64-representable
    integer widths collapse to one family (the driver's hash treats
    them alike — round-3 evidence: Spark int row_number vs DuckDB
    BIGINT was hash-green), but HUGEINT/UHUGEINT/UBIGINT keep their
    own names so SUM(BIGINT) promotions are caught."""
    s = str(type_str).strip().upper()
    if s.endswith("[]"):
        return f"array<{duck_type_to_canon(s[:-2])}>"
    if s.startswith("DECIMAL"):
        return s.replace(" ", "")
    simple = {
        "BIGINT": "int",
        "INTEGER": "int",
        "SMALLINT": "int",
        "TINYINT": "int",
        "HUGEINT": "hugeint",
        "UHUGEINT": "uhugeint",
        "UBIGINT": "ulong",
        "UINTEGER": "int",
        "DOUBLE": "double",
        "FLOAT": "float",
        "REAL": "float",
        "VARCHAR": "string",
        "BOOLEAN": "boolean",
        "DATE": "date",
        "TIMESTAMP": "timestamp",
        "TIMESTAMP WITH TIME ZONE": "timestamp",
        "TIMESTAMP_NS": "timestamp",
        "BLOB": "binary",
    }
    return simple.get(s, s.lower())


def spark_type_to_canon(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, T.ArrayType):
        return f"array<{spark_type_to_canon(dt.elementType)}>"
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    simple = {
        T.LongType: "int",
        T.IntegerType: "int",
        T.ShortType: "int",
        T.ByteType: "int",
        T.DoubleType: "double",
        T.FloatType: "float",
        T.StringType: "string",
        T.BooleanType: "boolean",
        T.DateType: "date",
        T.TimestampType: "timestamp",
        T.TimestampNTZType: "timestamp",
        T.BinaryType: "binary",
    }
    for cls, canon in simple.items():
        if isinstance(dt, cls):
            return canon
    return dt.simpleString()


def decimal_columns(spark_schema, duck_cols=None, duck_types=None) -> list:
    """Return every output column whose type is DECIMAL on either
    engine.  DECIMAL payloads hash engine-specifically even at equal
    precision/scale (round-3 HUGEINT, round-4 `agg_state_merge`
    DECIMAL reds) — final schemas must emit a scaled BIGINT or a
    rounded DOUBLE instead, so ANY decimal output is a hard failure."""
    hits = []
    for f in spark_schema.fields:
        if "DECIMAL" in spark_type_to_canon(f.dataType).upper():
            hits.append(f"{f.name} (spark {spark_type_to_canon(f.dataType)})")
    if duck_cols is not None:
        for cname, dtype in zip(duck_cols, duck_types):
            if "DECIMAL" in duck_type_to_canon(str(dtype)).upper():
                hits.append(f"{cname} (oracle {duck_type_to_canon(str(dtype))})")
    return hits


def type_mismatches(spark_schema, duck_cols, duck_types) -> list:
    """Return [(col, spark_canon, duck_canon)] for every column whose
    canonical types differ.  Catches HUGEINT/long, DECIMAL width, and
    INT/BIGINT drift that value comparison alone cannot see."""
    spark_by_name = {f.name: spark_type_to_canon(f.dataType) for f in spark_schema.fields}
    out = []
    for cname, dtype in zip(duck_cols, duck_types):
        d_canon = duck_type_to_canon(str(dtype))
        s_canon = spark_by_name.get(cname)
        if s_canon is not None and s_canon != d_canon:
            out.append((cname, s_canon, d_canon))
    return out


def to_comparable(rows, colnames):
    out = []
    for r in rows:
        vals = []
        for c in sorted(colnames):
            v = r[c]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 6)
            vals.append(repr(v))
        out.append("|".join(vals))
    return sorted(out)


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from cloud_native_reddit_data_pipeline_spark.session import build_session
    from cloud_native_reddit_data_pipeline_spark.sources.tables import TABLES

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = build_session("parity-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
            sschema = sdf.schema
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL] {name}: spark error: {str(e)[:500]}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(srows)} rows, cols={scols}")
            if len(srows) == 0:
                failures.append((name, "rows-only query returned 0 rows"))
            dec = decimal_columns(sschema)
            if dec:
                failures.append((name, f"DECIMAL output columns: {dec}"))
                print(f"[FAIL] {name}: DECIMAL output columns (hash hazard): {dec}")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = rel.columns
            otypes = rel.types
            orows = [dict(zip(ocols, r)) for r in rel.fetchall()]
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"[FAIL] {name}: oracle error: {str(e)[:500]}")
            continue
        sdicts = [r.asDict() for r in srows]
        problems = []
        dec = decimal_columns(sschema, ocols, otypes)
        if dec:
            problems.append(f"DECIMAL output columns (hash hazard): {dec}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        else:
            tm = type_mismatches(sschema, ocols, otypes)
            if tm:
                problems.append(
                    "TYPE mismatch (driver hash is type-sensitive): "
                    + ", ".join(f"{c}: spark={s} oracle={d}" for c, s, d in tm)
                )
        if len(sdicts) != len(orows):
            problems.append(f"rowcount spark={len(sdicts)} oracle={len(orows)}")
        if not problems:
            sc = to_comparable(sdicts, scols)
            oc = to_comparable(orows, ocols)
            if sc != oc:
                diff = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"[FAIL] {name}: {'; '.join(problems)[:800]}")
        else:
            print(f"[ok] {name}: {len(sdicts)} rows")

    print(f"\n{len(failures)} failures / {len(qs) if not only else len(only)} checked")
    for name, msg in failures:
        print(f"  FAIL {name}: {msg[:300]}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
