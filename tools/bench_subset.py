"""Time a subset of registry queries exactly the way bench.py does
(best-of-2, cache-clear + JVM GC between runs) and print one JSON line.

Usage: python tools/bench_subset.py [sf_dir] name1 name2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    if args and os.path.isdir(args[0]):
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", args

    from cloud_native_reddit_data_pipeline_spark import queries as registry
    from cloud_native_reddit_data_pipeline_spark.session import build_session

    spark = build_session("cnrdp-bench-subset")
    qs = registry.queries()
    qs["project_rename"](spark, sf_dir).count()  # warm-up

    timings: dict[str, float] = {}
    for name in names:
        best, n = None, 0
        for _ in range(2):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            n = df.count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        timings[name] = round(best, 2)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)
    timings["_total"] = round(sum(timings.values()), 2)
    print(json.dumps(timings, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
