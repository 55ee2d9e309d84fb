"""Plan audit: print `explain(formatted)` for every headline query so
plan regressions are reviewable (scan pruning, pushed filters, join
strategies, exchange counts, codegen spans).

Usage:
    python tools/explain_audit.py [sf_dir] [query ...]   # default: headline set
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from bench import HEADLINE
    from cloud_native_reddit_data_pipeline_spark import queries as registry
    from cloud_native_reddit_data_pipeline_spark.session import build_session

    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    names = [a for a in args if not os.path.isdir(a)] or HEADLINE

    spark = build_session("cnrdp-explain")
    qs = registry.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        print(f"\n{'=' * 70}\n## {name}\n{'=' * 70}")
        print(plan)
        # one-line summary of the properties that matter at scale
        exchanges = len(re.findall(r"\bExchange\b", plan))
        joins = re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)", plan)
        python = len(re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas)", plan))
        print(
            f"--> exchanges={exchanges} joins={joins or 'none'} python_stages={python}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
