"""Scale smoke: synthesize a FACTOR-times copy of an sf directory and
time a candidate set of queries at both scales, reporting the wall-
clock ratio against the data ratio.  Queries scaling clearly worse
than ~linear get flagged — the failure mode the per-round sf0.1 bench
cannot see.

The scaled data is for TIMING ONLY (correctness gates always run on
the driver-generated parquet): copy i shifts every entity key by
i * (max_key + 1) so keys stay unique, fact tables multiply while the
part/supplier catalog stays fixed (10x orders over the same parts —
the realistic axis), document text gets a per-copy marker token to
avoid a pure exact-duplicate explosion, and embedding copies are
regenerated from a deterministic hash so vector space fills instead of
stacking 10 identical points on every original.

Usage: python tools/scale_smoke.py [factor] [query ...]
Writes the report into BENCH_DETAIL.json under "scale_smoke".
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

SRC = "/root/testdata/sf0.1"
# factor-keyed so a 100x run never silently reuses 10x files
DST_TMPL = "/tmp/sf_scaled_x{factor}"

DEFAULT_QUERIES = [
    "session_overlap",
    "khop_reachability",
    "association_rules",
    "embedding_neardup",
    "embedding_neardup_capped",
    "semantic_dedup",
    "minhash_lsh_pairs",
    "duplicate_spans",
    "pagerank_copurchase",
    "training_corpus_select_v2",
    "pricing_summary",
    # round-6 distributed-rank forms (range-partitioned prefix sums /
    # row numbers replacing single-task windows)
    "ntile_deciles",
    "rfm_segments",
    "spend_concentration",
    "ecdf_normalize_lengths",
    "touch_attribution",
    "stratified_split",
    # round-7 additions (entity_resolution is omitted: it runs on the
    # part catalog, which the scaled data keeps FIXED by design, so a
    # smoke ratio would measure nothing)
    "line_dedup_corpus",
    "phrase_search_slop",
    "gopher_quality_gate",
    "ann_ivf_eval",
    "hard_negative_mining",
    "training_batch_prepare",
    # round-8 additions
    "token_budget_select",
    "fasttext_hash_score",
    "personalized_pagerank",
    "jl_projection_recall",
    "dedup_yield_report",
    "incremental_dedup",
    "length_grouped_batches",
    "quality_gate_agreement",
    "unimax_allocation",
    "epoch_shuffle",
    "badwords_filter",
    "curriculum_stages",
    "kneser_ney_perplexity",
    "corpus_manifest",
    "retrieve_rerank",
    "negative_sampling",
    "snapshot_drift_psi",
    # media dedup queries (image_phash_dedup, audio_fingerprint_dedup)
    # are omitted: they run on the fixed 64-row synthetic media table,
    # so a smoke ratio would measure nothing (entity_resolution-style
    # note; their scale story is the banded-hamming pair generator)
    "semantic_decontamination",
    "ann_hamming_topk",
    "ann_hamming_rerank",
    "classifier_calibration",
    "perplexity_buckets",
    "preference_pairs",
    "dedup_aware_split",
    "self_bleu_diversity",
    "domain_hardness_weights",
    "pii_scrub_recall",
    "event_sequence_examples",
    "rag_context_pack",
    "quality_threshold_yield",
    "encoding_repair_audit",
    "ann_cell_balance",
    "dedup_cluster_histogram",
    "corpus_manifest_diff",
    "corpus_datacard",
    "hll_distinct_custkeys",
    "vocab_coverage",
    "embargo_time_split",
    "winnowing_fingerprint_stats",
    "winnowing_overlap_pairs",
    "vocab_drift_topk",
    "filter_attribution",
    "kcore_copurchase",
    "simhash_dedup_pairs",
    "label_balance_sample",
    "source_quality_ci",
    "json_quality_gate",
    "epoch_shard_manifest",
    "mmr_diversity_rerank",
    "daily_hll_users",
    # round-9: cross-modal capstone — document + embedding legs scale;
    # the media-group leg is the fixed 44-asset catalog by design (the
    # image_phash_dedup omission note), so the ratio measures the
    # text/embedding composition
    "multimodal_dedup_manifest",
    # round-9 tokenizer family: the corpus collapses to the word-freq
    # table, so the ratio measures the collapse scan + per-round
    # vocabulary-table aggregates (the scaled corpus adds ~100 marker
    # words, so the model side grows slightly too)
    "unigram_lm_vocab",
    "unigram_lm_vocab_pruned",
    "unigram_lm_encode",
    "wordpiece_merges",
    "wordpiece_encode",
    # scan->map, no shuffle: the ratio IS the scan
    "span_corruption_examples",
    # doc-side scales, asset catalog fixed (media omission note)
    "image_text_contrastive_pairs",
    "cluster_balanced_sample",
    "kmv_set_overlap",
    # streaming_corpus_manifest omitted: fixed two-half replay twin
    # streaming_drift_psi omitted: fixed two-half replay twin (the
    # streaming_sequence_examples note applies)
    # video_frame_dedup omitted: fixed 21-video synthetic set (media
    # smoke-omission note above applies)
    # streaming_sequence_examples is omitted: it runs on a fixed
    # 2000-event two-batch replay (the correctness twin), so a smoke
    # ratio would measure nothing; its scale story is the bounded
    # per-user tail store (state O(users), never O(events))
    # round-10: the EP0->EP3 composition (scaled by post count, own
    # synthetic harvest — see the special case in main())
    "composed_pipeline_e2e",
]


def build_scaled(spark, factor: int, scale_part: bool = False) -> str:
    from pyspark.sql import functions as F

    from cloud_native_reddit_data_pipeline_spark.sources.tables import load

    # --scale-part writes to its OWN directory: the standard scaled set
    # keeps the part catalog fixed by design (facts grow, catalog
    # doesn't), and the exists-check below would otherwise hand one
    # mode the other mode's files
    DST = DST_TMPL.format(factor=factor) + ("_fullcat" if scale_part else "")
    os.makedirs(DST, exist_ok=True)
    # small dims + fixed catalog: copy once, unscaled
    fixed = ("region", "nation", "supplier") if scale_part else (
        "region", "nation", "supplier", "part"
    )
    for t in fixed:
        shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")

    def shifted_union(df, shift_cols, extra=None):
        maxes = {
            c: df.agg(F.max(c)).collect()[0][0] + 1 for c in shift_cols
        }
        parts = []
        for i in range(factor):
            p = df
            for c in shift_cols:
                p = p.withColumn(c, F.col(c) + F.lit(i * maxes[c]))
            if extra is not None:
                p = extra(p, i)
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    jobs = {
        **(
            {
                # entity-resolution axis (r8): copies append a suffix
                # TOKEN to p_name, so the blocking key (second word +
                # first char) is unchanged while distinct-name count
                # per block grows with the factor — exactly the load
                # the distinct-name collapse must carry; copies of one
                # base name sit within lev<=2 of each other, so
                # components chain across copies (the big-component
                # stress for large/small-star)
                "part": (
                    ["p_partkey"],
                    lambda p, i: p.withColumn(
                        "p_name",
                        F.concat(F.col("p_name"), F.lit(f" pv{i}"))
                        if i
                        else F.col("p_name"),
                    ),
                )
            }
            if scale_part
            else {}
        ),
        "customer": (["c_custkey"], None),
        "orders": (["o_orderkey", "o_custkey"], None),
        "lineitem": (["l_orderkey"], None),
        "events": (["event_id", "user_id"], None),
        "documents": (
            ["doc_id"],
            lambda p, i: p.withColumn(
                "text",
                F.concat(F.col("text"), F.lit(f" dv{i}")) if i else F.col("text"),
            ),
        ),
        "embeddings": (
            ["vec_id"],
            lambda p, i: p.withColumn(
                "embedding",
                F.transform(
                    F.sequence(F.lit(0), F.lit(63)),
                    lambda j: (
                        F.pmod(
                            F.xxhash64(F.col("vec_id"), F.lit(i), j),
                            F.lit(2000001),
                        )
                        / F.lit(1000000.0)
                        - F.lit(1.0)
                    ).cast("float"),
                )
                if i
                else F.col("embedding"),
            ),
        ),
    }
    for t, (cols, extra) in jobs.items():
        out = f"{DST}/{t}.parquet"
        if scale_part and t != "part" and not os.path.exists(out):
            # fullcat differs from the standard scaled set ONLY in
            # part: reuse the already-built fact tables instead of
            # re-synthesizing gigabytes
            std = DST_TMPL.format(factor=factor) + f"/{t}.parquet"
            if os.path.exists(std):
                os.symlink(std, out)
        if os.path.exists(out):
            continue
        df = load(spark, SRC, t)
        shifted_union(df, cols, extra).coalesce(8).write.mode(
            "overwrite"
        ).parquet(out)
        print(f"[scaled] {t}")
    return DST


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--scale-part"]
    scale_part = "--scale-part" in sys.argv[1:]
    factor = int(args[0]) if args else 10
    names = args[1:] or DEFAULT_QUERIES

    import __spark_entry__ as entrymod
    from cloud_native_reddit_data_pipeline_spark.session import build_session

    spark = build_session("scale-smoke")
    DST = build_scaled(spark, factor, scale_part=scale_part)

    qs = entrymod.queries()
    # per-entry provenance stamp (r6 ADVICE): a targeted rerun merges
    # into a standing report possibly produced by older code, so every
    # row records the commit + time that produced it
    try:
        commit = subprocess.run(
            ["git", "-C", "/root/repo", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:
        commit = "unknown"
    run_stamp = f"{commit}@{time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime())}"
    report = {"factor": factor, "queries": {}}
    for name in names:
        if name == "composed_pipeline_e2e":
            # EP0->EP1/EP2->EP3 composition (round-9 verdict task 3):
            # scaled by POST COUNT (base 1000 x factor), not by the
            # parquet tables — the composition synthesizes its own
            # harvest.  Single-run timing (the streaming legs carry a
            # large fixed trigger cost; best-of-2 would double a
            # minutes-long 100x leg for no plan information).  The
            # duplicate-free store assertion runs INSIDE
            # run_composed_pipeline — a failed contract raises here.
            import shutil as _sh
            import tempfile as _tf

            from cloud_native_reddit_data_pipeline_spark.plans.composed import (
                run_composed_pipeline,
            )

            base_n = 1000
            times = {}
            for label, n in (("base", base_n), ("scaled", base_n * factor)):
                spark.catalog.clearCache()
                tmpd = _tf.mkdtemp(prefix="composed-smoke-")
                t0 = time.time()
                out = run_composed_pipeline(spark, tmpd, n)
                times[label] = round(time.time() - t0, 2)
                times[f"{label}_rows"] = out["analysis_rows"]
                _sh.rmtree(tmpd, ignore_errors=True)
            ratio = round(times["scaled"] / max(times["base"], 0.01), 2)
            flag = "SUPERLINEAR" if ratio > factor * 1.5 else "ok"
            report["queries"][name] = {
                **times, "time_ratio": ratio, "flag": flag, "run": run_stamp,
                "store_verified": "duplicate-free",
            }
            print(f"{name}: base={times['base']}s scaled={times['scaled']}s "
                  f"ratio={ratio}x (posts x{factor}) [{flag}]")
            continue
        fn = qs[name]
        times = {}
        for label, d in (("base", SRC), ("scaled", DST)):
            spark.catalog.clearCache()
            best = None
            for _ in range(2):
                t0 = time.time()
                n = fn(spark, d).count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            times[label] = round(best, 2)
            times[f"{label}_rows"] = n
        ratio = round(times["scaled"] / max(times["base"], 0.01), 2)
        flag = "SUPERLINEAR" if ratio > factor * 1.5 else "ok"
        report["queries"][name] = {
            **times, "time_ratio": ratio, "flag": flag, "run": run_stamp,
            **({"data": "fullcat"} if scale_part else {}),
        }
        print(f"{name}: base={times['base']}s scaled={times['scaled']}s "
              f"ratio={ratio}x (data x{factor}) [{flag}]")

    detail_path = "/root/repo/BENCH_DETAIL.json"
    try:
        detail = json.load(open(detail_path))
    except Exception:
        detail = {}
    # Factor-keyed report slots ("scale_smoke" stays the 10x table for
    # continuity with earlier rounds; other factors get their own key),
    # and a targeted rerun (one or two queries) MERGES into the
    # standing report instead of clobbering the full-set table.
    key = "scale_smoke" if factor == 10 else f"scale_smoke_x{factor}"
    prev = detail.get(key)
    if (
        isinstance(prev, dict)
        and prev.get("factor") == factor
        and isinstance(prev.get("queries"), dict)
    ):
        merged = dict(prev["queries"])
        # full run-stamp coverage (r7-verdict task 5): carried-over
        # rows produced before per-entry stamping get an explicit
        # unknown-provenance marker, so the merged table can never
        # present mixed-provenance rows as one run
        for row in merged.values():
            if isinstance(row, dict):
                row.setdefault("run", "pre-stamp(unknown-commit)")
        merged.update(report["queries"])
        report = {**report, "queries": merged}
    detail[key] = report
    json.dump(detail, open(detail_path, "w"), indent=1)
    print(json.dumps(report))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
