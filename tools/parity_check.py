"""Local stand-in for the driver's t2 correctness gate: run every
queries() entry at a given sf against its oracle_sql() via DuckDB and
compare row-count, column names, and (order-insensitive) values.

Usage: python tools/parity_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")


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
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL] {name}: spark error: {str(e)[:500]}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(srows)} rows, cols={scols}")
            if len(srows) == 0:
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = rel.columns
            orows = [dict(zip(ocols, r)) for r in rel.fetchall()]
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"[FAIL] {name}: oracle error: {str(e)[:500]}")
            continue
        sdicts = [r.asDict() for r in srows]
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
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
