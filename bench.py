"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.

The headline set exercises every scale-relevant plan shape: pushdown
agg, shuffle joins (broadcast + sort-merge), window rank, event-time
windows, sessionization, hash dedup, MinHash-LSH, SimHash, relational
sentiment, and brute-force + LSH vector search.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pricing_summary",
    "shipping_priority_top10",
    "regional_supplier_volume",
    "fk_join_agg",
    "star_join_broadcast",
    "topk_per_group",
    "union_schema_aligned",
    "normalize_text",
    "doc_frequency",
    "sentiment_relational",
    "dedup_exact_content",
    "dedup_fingerprint",
    "minhash_lsh_pairs",
    "simhash_signatures",
    "window_tumbling",
    "session_windows",
    "pivot_event_counts",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "asof_join_clicks_purchases",
    "tfidf_per_doc",
    "range_band_join",
    "embedding_neardup",
    "cube_agg",
    "percentile_stats",
    "running_window_funcs",
    "salted_join_agg",
    "ann_ivf_topk",
    "training_corpus_select",
    "rolling_hash_fingerprint",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from cloud_native_reddit_data_pipeline_spark import queries as registry
    from cloud_native_reddit_data_pipeline_spark.session import build_session

    spark = build_session("cnrdp-bench")
    qs = registry.queries()

    # Warm the JVM + parquet footers once so per-query numbers measure the
    # query, not session startup.
    qs["project_rename"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    t_all = time.perf_counter()
    for name in HEADLINE:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        n = df.count()  # full execution; count avoids driver-collect cost
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)
        # Release intra-query persist() caches — leaked storage memory
        # otherwise degrades later queries (measured: 3x on the last ones).
        spark.catalog.clearCache()
    total = round(time.perf_counter() - t_all, 3)

    print(
        json.dumps(
            {
                "metric": "headline_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
