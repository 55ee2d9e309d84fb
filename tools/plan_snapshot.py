"""Plan snapshot: one summary row per headline query — join strategies,
exchange count, python-stage count, cartesian flag — written to
PLANS.md so the per-round "zero cartesians, Python only at the codec
boundary" claim is a COMMITTED artifact, not a session note
(round-9 verdict task 5).

tests/test_plan_snapshot.py validates the artifact: every headline
query has a row, no row has a CartesianProduct, python stages only
appear on queries in PYTHON_WHITELIST, and global (unpartitioned)
Window nodes only on GLOBAL_WINDOW_WHITELIST — each entry declaring
the bound that keeps its SinglePartition sort safe at scale
(round-12 verdict task 4).

Usage:
    python tools/plan_snapshot.py [sf_dir]   # writes /root/repo/PLANS.md
"""

from __future__ import annotations

import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Queries whose plans legitimately contain Python stages: the media
# codec boundary (pure-stdlib PNG/WAV/Y4M decoders over Arrow batches —
# no JVM codec exists here) and the declared pandas-UDF surfaces
# (SURVEY O40: the row-wise UDF surface, shipped as vectorized twins).
PYTHON_WHITELIST = {
    # media codec boundary (functions/{png,wav,y4m}.py via mapInPandas)
    "image_phash_dedup",
    "audio_fingerprint_dedup",
    "video_frame_dedup",
    "multimodal_dedup_manifest",
    "image_text_contrastive_pairs",
    # declared pandas-UDF / UDTF surfaces (O40)
    "sentiment_pandas_udf",
    "udtf_expand_events",
    "grouped_agg_pandas",
    "train_batches_mapinpandas",
}

# Queries whose plans legitimately contain a GLOBAL (unpartitioned)
# window — every entry must state the bound that keeps the
# SinglePartition sort safe at scale (round-12 verdict task 4: the
# "every global window is over an already-bounded frame" invariant was
# a session-audit note; this pins it as a committed gate).  A global
# window over a raw corpus-sized frame is a scale-killer and fails
# tests/test_plan_snapshot.py unless declared here with its bound.
GLOBAL_WINDOW_WHITELIST = {
    # Corpus-order trades, documented in their operator docstrings:
    # the cut/packing/permutation NEEDS one total order; the frame is
    # one narrow column pair, never the full row width.
    "training_corpus_select": "budget prefix-sum over per-doc scores "
        "(textstats.py corpus-selection trade: the token-budget cut "
        "needs a global score order; one narrow (id, score) pair)",
    "weighted_sample": "exponential-key order for weighted sampling "
        "without replacement (sampling.py:161; one narrow (key, _k) "
        "pair — the A-ES selection rule needs a global key order)",
    "stratified_split": "within-stratum frames are partitioned; ONE "
        "global frame assigns split boundaries over the stratum "
        "summary (strata-count-sized)",
    # Aggregate-table frames: the windowed frame is an aggregation
    # output bounded by a dimension, vocabulary, calendar, or grid —
    # orders of magnitude below corpus scale by construction.
    "lm_perplexity": "rank over the token-frequency table "
        "(vocabulary-sized)",
    "kneser_ney_perplexity": "continuation-count normalizations over "
        "n-gram vocabulary tables",
    "pmi_collocations": "top-k rank over the bigram PMI table "
        "(textstats.py:2190; bigram-vocabulary-sized)",
    "kmv_distinct_custkeys": "k-minimum-values rank over hashed keys "
        "(windows.py:313 bounded-k sketch frame)",
    "pareto_skyline_parts": "skyline scan over the per-part aggregate "
        "(part-dimension-sized)",
    "cusum_changepoint": "cumulative sums over the per-day series "
        "(calendar-bounded)",
    "histogram_quantile_sketch": "cumulative counts over the fixed "
        "bin table",
    "session_overlap": "duration-order frame over the per-session "
        "aggregate (windows.py:1377; one narrow column of session "
        "durations, post-sessionization)",
    "linear_attribution": "share normalization over the channel table "
        "(channel-count-sized)",
    "unimax_allocation": "UniMax waterline frames over the per-source "
        "budget table (sampling.py:419; source-count-sized)",
    "domain_hardness_weights": "weight-normalization frames over the "
        "per-domain summary (domain-count-sized)",
    "quality_threshold_yield": "yield curve over the threshold grid "
        "(fixed grid)",
    "kaplan_meier_conversion": "KM product over per-day event counts "
        "(calendar-bounded)",
    "langid_confusion": "confusion normalization over the (lang, lang) "
        "matrix (langs-squared bounded)",
    "poisson_bootstrap_lift": "CI quantiles over the replicate table "
        "(fixed replicate count)",
    "winnowing_fingerprint_stats": "final stats rank over the per-doc "
        "fingerprint aggregate (the winnowing min-window itself is "
        "doc-partitioned, textstats.py:1993)",
    "winnowing_overlap_pairs": "pair ranks over the banded candidate "
        "table (same doc-partitioned core)",
    # Per-query / per-entity candidate frames: bounded by
    # queries x k or the blocked candidate set, not the corpus.
    "retrieve_rerank": "rerank over the per-query retrieved set "
        "(queries x k bounded)",
    "rag_context_pack": "context packing over the per-query retrieved "
        "set (queries x k bounded)",
    "preference_pairs": "pair rank over the per-prompt candidate table "
        "(prompt-bounded)",
    "entity_resolution": "cluster-representative ordering over the "
        "blocked match-pair clusters (blocking-bounded)",
    "golden_record_merge": "survivorship ordering over matched-pair "
        "clusters (blocking-bounded)",
    "multimodal_dedup_manifest": "final manifest ordering over the "
        "per-group dedup summary (group-count-sized)",
    "image_text_contrastive_pairs": "pair-id frame over the banded "
        "hamming candidate pairs (banding-bounded)",
}

JOIN_OPS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)
PY_OPS = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "MapInArrow",
)


def summarize(plan: str) -> dict:
    joins = {op: len(re.findall(rf"\b{op}\b", plan)) for op in JOIN_OPS}
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "joins": {k: v for k, v in joins.items() if v},
        "python": sum(len(re.findall(rf"\b{op}\b", plan)) for op in PY_OPS),
        "cartesian": joins["CartesianProduct"] > 0,
    }


def count_global_windows(simple_plan: str) -> int:
    """Window nodes with NO partition spec (a SinglePartition sort) in
    the simple executed-plan tree.  A partitioned Window prints three
    top-level bracket groups — ``Window [exprs], [part], [order]`` —
    a global one only two (or one): count the ``], [`` separators on
    each Window line (window expressions never contain that token —
    specs print as parenthesized windowspecdefinition(...))."""
    n = 0
    for line in simple_plan.splitlines():
        m = re.search(r"\bWindow \[", line)
        if m and line[m.start():].count("], [") < 2:
            n += 1
    return n


def main() -> None:
    from bench import HEADLINE
    from cloud_native_reddit_data_pipeline_spark import queries as registry
    from cloud_native_reddit_data_pipeline_spark.session import build_session

    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"

    spark = build_session("cnrdp-plans")
    qs = registry.queries()
    rows = []
    for i, name in enumerate(HEADLINE):
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        s = summarize(plan)
        s["global_windows"] = count_global_windows(
            df._jdf.queryExecution().executedPlan().toString()
        )
        rows.append((name, s))
        print(
            f"[{i + 1}/{len(HEADLINE)}] {name}: exch={s['exchanges']} "
            f"py={s['python']} gwin={s['global_windows']} "
            f"joins={s['joins'] or '-'} "
            f"({time.perf_counter() - t0:.1f}s)",
            file=sys.stderr,
        )
    spark.stop()

    out = [
        "# PLANS — headline physical-plan summaries (regenerated per round)",
        "",
        f"Generated by `python tools/plan_snapshot.py {sf_dir}`.",
        "Gate (tests/test_plan_snapshot.py): every headline query rowed,",
        "zero CartesianProduct, python stages only on PYTHON_WHITELIST",
        "(the media codec boundary + declared pandas-UDF surfaces), and",
        "global (unpartitioned) Window nodes only on",
        "GLOBAL_WINDOW_WHITELIST — each entry declares the bound that",
        "keeps its SinglePartition sort safe at scale.",
        "",
        "| query | exchanges | joins | python stages | global windows |",
        "|---|---|---|---|---|",
    ]
    for name, s in rows:
        joins = (
            ", ".join(f"{k}×{v}" for k, v in sorted(s["joins"].items()))
            or "none"
        )
        out.append(
            f"| {name} | {s['exchanges']} | {joins} | {s['python']} "
            f"| {s['global_windows']} |"
        )
    n_cart = sum(1 for _, s in rows if s["cartesian"])
    n_py = sum(1 for _, s in rows if s["python"])
    n_gwin = sum(1 for _, s in rows if s["global_windows"])
    out += [
        "",
        f"Totals: {len(rows)} queries, {n_cart} with CartesianProduct, "
        f"{n_py} with python stages, {n_gwin} with global windows "
        f"(all declared-bounded).",
        "",
    ]
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(rows)} rows, {n_cart} cartesians)")


if __name__ == "__main__":
    main()
