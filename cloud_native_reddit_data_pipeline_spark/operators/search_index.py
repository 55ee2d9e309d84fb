"""Persistent incremental SEARCH index: build once, serve keyword
queries, ingest continuously.

The ranked-search operators (`textstats.ranked_keyword_search_bm25`
and friends) re-tokenize the WHOLE corpus per query — correct for
offline analytics, wrong shape for the serving path the reference
actually runs: Elasticsearch maintains an inverted index that
documents enter ONCE at ingest (`addReddit.py:63-64` writes each
harvested batch into the index; `redditProcessor.py:67-75` then
queries it without ever re-reading the corpus).  This module is that
behavior in engine terms, on the same generation-manifest commit
protocol as the ANN and dedup indexes (`storage/manifest.py` — see
that module's docstring for the object-store-safe commit story):

- `search_index_build`  — tokenize the corpus once and persist the
  three classic index components: POSTINGS (term, doc_id, tf),
  partitioned on disk by a 16-way md5 term bucket so keyword queries
  prune directories; DOCLENS (doc_id, dl) for BM25 length
  normalization (dl = 0 rows kept: empty docs count toward N/avgdl,
  exactly as the corpus-scan ranker counts them); and a STATS delta
  log holding (n_docs, sum_dl) so N and avgdl never require a
  corpus-wide scan at query time.
- `search_index_query`  — BM25 over the PERSISTED components, same
  math as `textstats._bm25_rank` (Lucene idf, k1/b saturation +
  length normalization, 4-decimal round, (score DESC, doc_id) top-k):
  the postings scan is pruned on disk to the keywords' term buckets
  (the bucket hash is md5-based so the query side computes it in
  pure Python — no routing job), df comes from the pruned slice, and
  N/avgdl are ONE tiny sum over the stats log.  Query cost is
  proportional to the matched postings, never the corpus.
- `search_index_append` — tokenize ONLY the new batch and append all
  three components (build(A) + append(B) is byte-identical to
  build(A ∪ B): postings/doclens are per-document functions and the
  stats log is additive).  Tombstoned and live-duplicate ids fail
  fast (one Spark job for both guards).  **Torn-append window**: the
  three appends have no joint commit point.  Write order is doclens →
  postings → stats, chosen so every prefix-crash is (a) invisible or
  under-reporting, never phantom-producing, and (b) detectable by
  `search_index_fsck`: a doc with dl > 0 but no postings can never be
  RETURNED (no posting rows), and a stats/doclens mismatch is a
  direct sum comparison.  `search_index_compact` HEALS the store
  (drops torn doclens rows, rewrites the stats log exactly from the
  surviving doclens), after which the append can be re-run cleanly.
- `search_index_delete` — tombstone append (LSM delete); queries
  anti-join the (broadcast, tombstone-sized) log.  The verb also
  appends a NEGATIVE stats delta for the genuinely-new dead ids
  (their dl looked up in one tombstone-sized semi-join), so N/avgdl
  keep tracking the LIVE corpus without any query-time doclens scan;
  already-tombstoned ids are dropped first so a repeated delete can
  never double-subtract.
- `search_index_compact` — rewrite live rows into a fresh generation
  (postings healed to doclens coverage, torn doclens rows dropped,
  stats log collapsed to one exact row), verify readability, COMMIT
  with one ``_commits`` append, GC best-effort.
- `search_index_fsck` / `search_index_stats` /
  `search_index_maintain` — the audit, ops-monitoring, and
  self-driving maintenance verbs every store in this engine ships:
  maintain derives its signals (torn coverage, stats drift, dead
  ratio, small files per bucket directory) FROM the store and
  triggers compact + gc when any trips; idempotent, receipt-returning.

Layout under ``{index_dir}/{version}/``::

    postings/    (term STRING, doc_id BIGINT, tf BIGINT)
                 partitioned by tb INT (md5 16-bucket)   [postings_gN]
    doclens/     (doc_id BIGINT, dl BIGINT)              [doclens_gN]
    stats/       (n_docs BIGINT, sum_dl BIGINT) — additive delta log,
                 one row per build/append/delete         [stats_gN]
    tombstones/  (doc_id BIGINT) — append-only delete log
    _meta/       (n_buckets INT, analyzer STRING, positions BOOLEAN)
                 — one row, self-describing
    _commits/    (seq BIGINT, gen INT, tomb_gen INT) — generation
                 manifest (shared protocol, storage/manifest.py)

Scale shape: the build is one tokenize pass (explode → map-side
combined tf counts) plus a layout-controlled partitioned write; a
query reads ≤ |keywords| bucket directories of the postings table,
aggregates df over that pruned slice, and touches doclens only for
the matched doc ids (hit-sized semi-join); appends cost the batch,
never the corpus; every verb resolves manifest state once and loads
the tombstone log once per call.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..storage.manifest import (
    append_commit as _append_commit,
    fs_delete as _fs_delete,
    fs_list as _fs_list,
    local_rows_df as _local_rows,
    manifest_state as _state,
    max_files_per_leaf_dir as _max_files,
    repartition_for_layout as _layout,
    reset_version_dir as _reset_version_dir,
    store_base as _base,
    try_read_parquet as _try_read,
    verify_readable as _verify_readable,
)

DEFAULT_BUCKETS = 16


class DuplicateIdsError(ValueError):
    """Raised by `search_index_append` when incoming ids are already
    present in the store ON EITHER SIDE (doclens or postings) — a
    TYPED signal (the snapshot-store typed-exception discipline).
    CAUTION for ingest loops: this fires both for a genuinely
    already-applied batch AND for a TORN one (the crash window leaves
    the ids on the doclens side only), so a redelivery handler must
    NOT blindly swallow it — run `search_index_maintain` first (a
    no-op on a whole store, a healing compact on a torn one) and
    retry the append; only a second DuplicateIdsError then means
    already-applied.  streaming_search_index in queries.py is the
    reference implementation of that handler."""


class TombstonedIdsError(ValueError):
    """Raised by `search_index_append` when incoming ids are
    tombstoned: their dead rows still live until the next compact, so
    clearing the tombstone would resurrect them — compact first."""


def _postings_dir(base: str, gen: int) -> str:
    return f"{base}/postings" if gen == 0 else f"{base}/postings_g{gen}"


def _doclens_dir(base: str, gen: int) -> str:
    return f"{base}/doclens" if gen == 0 else f"{base}/doclens_g{gen}"


def _stats_dir(base: str, gen: int) -> str:
    return f"{base}/stats" if gen == 0 else f"{base}/stats_g{gen}"


def _tomb_dir(base: str, tomb_gen: int) -> str:
    return (
        f"{base}/tombstones"
        if tomb_gen == 0
        else f"{base}/tombstones_t{tomb_gen}"
    )


def resolve_search_dirs(
    spark: SparkSession, index_dir: str, version: str = "v1"
) -> dict[str, str]:
    """Public resolver: the CURRENT committed directory per component
    (audits read through this, so they see exactly what queries see)."""
    base = _base(index_dir, version)
    gen, tomb_gen, _ = _state(spark, base)
    return {
        "postings": _postings_dir(base, gen),
        "doclens": _doclens_dir(base, gen),
        "stats": _stats_dir(base, gen),
        "tombstones": _tomb_dir(base, tomb_gen),
        "meta": f"{base}/_meta",
    }


def term_bucket_py(term: str, n_buckets: int) -> int:
    """The term→bucket hash in pure Python — MUST stay in lockstep with
    `_term_bucket_col` (md5-based precisely so the query path can route
    to bucket directories without a Spark job)."""
    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:8], 16) % n_buckets


def _term_bucket_col(term, n_buckets: int):
    c = F.col(term) if isinstance(term, str) else term
    return F.pmod(
        F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long"),
        F.lit(n_buckets),
    ).cast("int")


def _meta(spark: SparkSession, base: str) -> tuple[int, str, bool]:
    row = spark.read.parquet(f"{base}/_meta").collect()[0]
    return (
        int(row["n_buckets"]),
        str(row["analyzer"]),
        bool(row["positions"]),
    )


def _analyze(term_col_name: str, analyzer: str):
    """Apply the index's analyzer to the NAMED lowercased term column
    of the enclosing frame (the stemmed chain is portable SQL text, so
    it resolves by column name — the signature takes the name, not a
    Column, to make that contract explicit).  The ``stemmed`` analyzer
    is the shared portable Porter-lite SQL
    (textstats.porter_lite_stem_sql — ONE definition for the engine,
    the store, and every oracle), applied at INDEX time exactly like
    an ES analyzer chain: the stored term IS the analyzed form, and
    queries analyze their keywords the same way."""
    if analyzer == "exact":
        return F.col(term_col_name)
    if analyzer == "stemmed":
        from .textstats import porter_lite_stem_sql

        return F.expr(porter_lite_stem_sql(term_col_name))
    raise ValueError(f"search_index: unknown analyzer {analyzer!r}")


def _postings_ddl(positions: bool) -> str:
    base = "tb int, term string, doc_id long, tf long"
    return base + (", pos array<int>" if positions else "")


def _read_postings(
    spark: SparkSession, base: str, gen: int, positions: bool
) -> DataFrame:
    """The postings table, or a correctly-typed EMPTY frame when the
    directory holds no files yet — a partitionBy write of zero rows
    produces no parquet files, so an index built on an empty (or
    all-empty-text) corpus and then appended into continuously (the ES
    'create empty, ingest forever' lifecycle) must not crash the
    readers on schema inference."""
    df = _try_read(spark, _postings_dir(base, gen))
    if df is not None:
        return df
    return spark.createDataFrame([], _postings_ddl(positions))


def _tokenized(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int,
    analyzer: str = "exact",
    positions: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """(postings, doclens) for a document frame — the shared tokenize
    front-end of build and append.  Postings carry the partition
    bucket; doclens keep dl = 0 rows (empty docs count toward N and
    avgdl, matching the corpus-scan ranker's statistics).  With the
    ``stemmed`` analyzer two inflections of one stem merge into one
    posting (their tf adds), while dl stays the RAW token count —
    length normalization measures the document, not the analyzer.
    With ``positions`` each posting also carries the sorted 1-based
    RAW-TOKEN positions of its occurrences (the ES convention: the
    analyzer rewrites the term, never the position), enabling
    phrase/proximity queries off the store.  NULL text is normalized
    to the empty document (dl = 0, no postings) — without the
    coalesce, size(tokens(NULL)) = -1 would poison sum_dl and make
    compact's coverage heal silently drop the row."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    terms = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(tokens(txt)).alias("_p0", "_t"),
        )
        .select(
            "doc_id",
            (F.col("_p0") + 1).alias("pos"),
            F.lower(F.col("_t")).alias("term"),
        )
        .select("doc_id", "pos", _analyze("term", analyzer).alias("term"))
    )
    aggs = [F.count(F.lit(1)).alias("tf")]
    cols = ["tb", "term", "doc_id", "tf"]
    if positions:
        aggs.append(F.sort_array(F.collect_list("pos")).alias("pos"))
        cols.append("pos")
    postings = (
        terms.groupBy("doc_id", "term")
        .agg(*aggs)
        .select(_term_bucket_col("term", n_buckets).alias("tb"), *cols[1:])
    )
    doclens = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(txt)).cast("long").alias("dl"),
    )
    return postings, doclens


def _load_tombstones(spark: SparkSession, base: str, tomb_gen: int):
    t = _try_read(spark, _tomb_dir(base, tomb_gen))
    return None if t is None else t.distinct()


def _anti_tombstones(df: DataFrame, tombs, id_col: str) -> DataFrame:
    if tombs is None:
        return df
    return df.join(
        F.broadcast(tombs.withColumnRenamed("doc_id", "_dead")),
        df[id_col] == F.col("_dead"),
        "left_anti",
    )


def _bucket_manifest(postings: DataFrame) -> DataFrame:
    return postings.groupBy(F.col("tb").cast("int").alias("tb")).agg(
        F.count(F.lit(1)).alias("n_postings"),
        F.countDistinct("term").alias("n_terms"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


def _write_stats_delta(
    spark: SparkSession, sdir: str, n_docs: int, sum_dl: int
) -> None:
    _local_rows(
        spark, "n_docs long, sum_dl long", [(int(n_docs), int(sum_dl))]
    ).coalesce(1).write.mode("append").parquet(sdir)


# ---------------------------------------------------------------------------
# Build
# ---------------------------------------------------------------------------
def search_index_build(
    docs: DataFrame,
    index_dir: str,
    n_buckets: int = DEFAULT_BUCKETS,
    version: str = "v1",
    id_col: str = "doc_id",
    text_col: str = "text",
    files_per_partition: int = 1,
    analyzer: str = "exact",
    positions: bool = False,
) -> DataFrame:
    """Tokenize the corpus once and persist postings (bucket-
    partitioned), doclens, and the initial stats row; returns the
    per-bucket manifest read BACK from the persisted postings (the
    gate proves what is on disk, not an in-flight frame).  The
    ``analyzer`` ("exact" or "stemmed") and ``positions`` flag are
    stored in _meta — the index is self-describing, and append/query
    apply the same chain and schema."""
    spark = docs.sparkSession
    _analyze("term", analyzer)  # fail fast on an unknown name
    base = _base(index_dir, version)
    _reset_version_dir(spark, base)

    _local_rows(
        spark,
        "n_buckets int, analyzer string, positions boolean",
        [(n_buckets, analyzer, bool(positions))],
    ).coalesce(1).write.mode("overwrite").parquet(f"{base}/_meta")

    postings, doclens = _tokenized(
        docs, id_col, text_col, n_buckets, analyzer, positions
    )
    doclens.coalesce(files_per_partition).write.mode("overwrite").parquet(
        _doclens_dir(base, 0)
    )
    _layout(postings, ["tb"], files_per_partition, "term").write.mode(
        "overwrite"
    ).partitionBy("tb").parquet(_postings_dir(base, 0))
    # the exact stats row comes from the PERSISTED doclens, so the log
    # can never disagree with what readers resolve
    dstats = (
        spark.read.parquet(_doclens_dir(base, 0))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s"))
        .first()
    )
    _write_stats_delta(
        spark, _stats_dir(base, 0), dstats["n"], int(dstats["s"] or 0)
    )
    return _bucket_manifest(_read_postings(spark, base, 0, positions))


# ---------------------------------------------------------------------------
# Query (BM25 serving)
# ---------------------------------------------------------------------------
def search_index_query(
    spark: SparkSession,
    index_dir: str,
    keywords: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    version: str = "v1",
) -> DataFrame:
    """BM25-ranked keyword query over the persisted index — same math,
    rounding, and tie-break as `textstats.ranked_keyword_search_bm25`,
    so a store holding corpus C answers byte-identically to the
    corpus-scan ranker run over C.  Returns (doc_id, n_hits, score)
    top-k.  The postings scan is pruned ON DISK to the keywords' term
    buckets (bucket hash recomputed in pure Python — zero routing
    jobs); N/avgdl come from the additive stats log (one tiny sum);
    tombstoned docs never appear and never contribute df."""
    base = _base(index_dir, version)
    n_buckets, analyzer, _positions = _meta(spark, base)
    gen, tomb_gen, _ = _state(spark, base)

    kws = sorted({w.lower() for w in keywords})
    if analyzer != "exact":
        # analyze the keywords with the INDEX's chain — one tiny Spark
        # expression over a |keywords|-row literal frame (the stem is
        # shared SQL text, so there is no Python twin to drift from)
        kdf = _local_rows(spark, "term string", [(w,) for w in kws])
        kws = sorted(
            {
                r["t"]
                for r in kdf.select(
                    _analyze("term", analyzer).alias("t")
                ).collect()
            }
        )
    buckets = sorted({term_bucket_py(w, n_buckets) for w in kws})
    post = _read_postings(spark, base, gen, _positions).filter(
        F.col("tb").isin(buckets) & F.col("term").isin(kws)
    )
    tombs = _load_tombstones(spark, base, tomb_gen)
    post = _anti_tombstones(post, tombs, "doc_id")

    st = (
        spark.read.parquet(_stats_dir(base, gen))
        .agg(F.sum("n_docs").alias("_n"), F.sum("sum_dl").alias("_sdl"))
        .select(
            "_n", (F.col("_sdl").cast("double") / F.col("_n")).alias("_avgdl")
        )
    )
    dfreq = post.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    lens = _anti_tombstones(
        spark.read.parquet(_doclens_dir(base, gen)), tombs, "doc_id"
    )
    from .textstats import bm25_idf, bm25_tf_sat

    idf = bm25_idf(F.col("_n"), F.col("df"))
    tf_sat = bm25_tf_sat(F.col("tf"), F.col("dl"), F.col("_avgdl"), k1, b)
    return (
        post.join(F.broadcast(dfreq), "term")
        .join(lens, "doc_id")  # hit-sized: only matched docs reach here
        .crossJoin(F.broadcast(st))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_hits"),
            F.round(F.sum(idf * tf_sat), 4).alias("score"),
        )
        .orderBy(F.desc("score"), F.col("doc_id"))
        .limit(k)
    )


class PositionsUnavailableError(ValueError):
    """Raised by `search_index_phrase_query` against a store built
    without ``positions=True`` — phrase/proximity verification needs
    the per-occurrence position lists; rebuild with positions."""


def search_index_phrase_query(
    spark: SparkSession,
    index_dir: str,
    phrase_terms: list[str],
    prox_window: int = 3,
    k: int = 20,
    version: str = "v1",
) -> DataFrame:
    """Positional phrase + proximity query over the persisted index —
    the ES `match_phrase` / `slop` serving path, answering
    byte-identically to `textstats.phrase_search` over the live corpus
    (the ranking body is SHARED: `phrase_rank_from_postings`).  The
    postings scan prunes on disk to the phrase terms' buckets, the
    position lists explode only for the matched terms' hit-sized
    slice, and the join chain never touches raw text."""
    base = _base(index_dir, version)
    n_buckets, analyzer, has_pos = _meta(spark, base)
    if not has_pos:
        raise PositionsUnavailableError(
            f"search_index_phrase_query: index at {index_dir} was built "
            f"without positions=True — phrase verification needs the "
            f"per-occurrence position lists"
        )
    gen, tomb_gen, _ = _state(spark, base)

    terms = [t.lower() for t in phrase_terms]
    if analyzer != "exact":
        kdf = _local_rows(spark, "term string", [(w,) for w in terms])
        stem_of = {
            r["term"]: r["t"]
            for r in kdf.select(
                "term", _analyze("term", analyzer).alias("t")
            ).collect()
        }
        terms = [stem_of[w] for w in terms]
    buckets = sorted({term_bucket_py(w, n_buckets) for w in terms})
    post = _read_postings(spark, base, gen, True).filter(
        F.col("tb").isin(buckets) & F.col("term").isin(sorted(set(terms)))
    )
    tombs = _load_tombstones(spark, base, tomb_gen)
    post = _anti_tombstones(post, tombs, "doc_id")
    flat = post.select(
        "doc_id", F.explode("pos").alias("pos"), F.col("term").alias("_t")
    )
    from .textstats import phrase_rank_from_postings

    return phrase_rank_from_postings(
        flat, "doc_id", terms, prox_window=prox_window, top_n=k
    )


# ---------------------------------------------------------------------------
# Append
# ---------------------------------------------------------------------------
def search_index_append(
    spark: SparkSession,
    new_docs: DataFrame,
    index_dir: str,
    version: str = "v1",
    id_col: str = "doc_id",
    text_col: str = "text",
    assert_unique: bool = True,
) -> DataFrame:
    """Tokenize ONLY the new documents and append all three components.
    Postings/doclens are per-document functions and the stats log is
    additive, so build(A) + append(B) leaves the exact same serving
    state as build(A ∪ B) — pinned by tests.  Returns the per-bucket
    appended-count manifest.

    Id discipline (the store-family contract): a tombstoned id fails
    fast (its dead rows still live until the next compact — clearing
    the tombstone would resurrect them next to the new rows); a live
    duplicate id fails fast under ``assert_unique``, checking BOTH the
    doclens and postings sides (a torn append leaves the id on the
    doclens side only, and re-appending it blind would double-count
    its dl in the stats log).  Both guards resolve in one Spark job.

    Crash window: doclens → postings → stats (module docstring) — any
    prefix-crash only under-reports the new docs and is flagged by
    `search_index_fsck`; `search_index_compact` heals, after which the
    append can be re-run cleanly."""
    base = _base(index_dir, version)
    n_buckets, analyzer, positions = _meta(spark, base)
    gen, tomb_gen, _ = _state(spark, base)

    new_ids = new_docs.select(F.col(id_col).alias("doc_id")).distinct()
    tombs = _load_tombstones(spark, base, tomb_gen)
    conflicts = []
    if tombs is not None:
        conflicts.append(tombs.select("doc_id", F.lit("dead").alias("_why")))
    if assert_unique:
        conflicts.append(
            spark.read.parquet(_doclens_dir(base, gen)).select(
                "doc_id", F.lit("live").alias("_why")
            )
        )
        conflicts.append(
            _read_postings(spark, base, gen, positions).select(
                "doc_id", F.lit("live").alias("_why")
            )
        )
    if conflicts:
        existing = conflicts[0]
        for c in conflicts[1:]:
            existing = existing.unionByName(c)
        hits = {
            r["_why"]: r["n"]
            for r in existing.join(F.broadcast(new_ids), "doc_id", "semi")
            .groupBy("_why")
            .agg(F.countDistinct("doc_id").alias("n"))
            .collect()
        }
        if hits.get("dead"):
            raise TombstonedIdsError(
                f"search_index_append: {hits['dead']} incoming id(s) are "
                f"tombstoned — their dead rows still live in the index; run "
                f"search_index_compact to reclaim them, then re-insert"
            )
        if hits.get("live"):
            raise DuplicateIdsError(
                f"search_index_append: {hits['live']} incoming id(s) already "
                f"present in the index (in either store half — a torn "
                f"append counts) — duplicate ids double-count stats; run "
                f"search_index_compact to heal a torn store, or pass "
                f"assert_unique=False only with an external uniqueness "
                f"guarantee"
            )

    postings, doclens = _tokenized(
        new_docs, id_col, text_col, n_buckets, analyzer, positions
    )
    # materialize the batch doclens once: it is written, summed for the
    # stats delta, and the source of truth for the append receipt
    doclens = doclens.localCheckpoint(eager=True)
    # ... and the batch postings once as well: they are written AND
    # aggregated for the returned receipt manifest — without the
    # checkpoint the tokenize pipeline would run twice per append
    postings = postings.localCheckpoint(eager=True)
    # doclens FIRST, postings second, stats last (module docstring:
    # every prefix-crash under-reports only and fsck flags it)
    doclens.coalesce(1).write.mode("append").parquet(_doclens_dir(base, gen))
    _layout(postings, ["tb"], 1, "term").write.mode("append").partitionBy(
        "tb"
    ).parquet(_postings_dir(base, gen))
    dstats = doclens.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")
    ).first()
    _write_stats_delta(
        spark, _stats_dir(base, gen), dstats["n"], int(dstats["s"] or 0)
    )
    return _bucket_manifest(postings).localCheckpoint(eager=True)


# ---------------------------------------------------------------------------
# Delete (tombstones + negative stats delta)
# ---------------------------------------------------------------------------
def search_index_delete(
    spark: SparkSession,
    index_dir: str,
    delete_ids: list[int],
    version: str = "v1",
) -> DataFrame:
    """Tombstone deletion: genuinely-new dead ids append to the CURRENT
    tombstone generation AND subtract their (count, dl) from the stats
    log, so N/avgdl keep tracking the live corpus with zero query-time
    scans.  Already-tombstoned ids are dropped first — a repeated
    delete can never double-subtract.  Ids never indexed contribute
    nothing.  Returns the one-row receipt."""
    base = _base(index_dir, version)
    gen, tomb_gen, _ = _state(spark, base)
    tdir = _tomb_dir(base, tomb_gen)

    req = _local_rows(
        spark, "doc_id long", [(int(i),) for i in sorted(set(delete_ids))]
    )
    existing = _try_read(spark, tdir)
    fresh = (
        req
        if existing is None
        else req.join(existing.distinct(), "doc_id", "left_anti")
    )
    # dl lookup for the genuinely-new dead ids (tombstone-sized
    # broadcast semi-join against doclens)
    dead = (
        spark.read.parquet(_doclens_dir(base, gen))
        .join(F.broadcast(fresh), "doc_id", "semi")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s"))
        .first()
    )
    n_new = int(dead["n"])
    fresh_rows = [
        (int(r["doc_id"]),) for r in fresh.collect()
    ]  # bounded: ≤ |delete_ids|
    if fresh_rows:
        _local_rows(spark, "doc_id long", fresh_rows).coalesce(1).write.mode(
            "append"
        ).parquet(tdir)
        if n_new:
            _write_stats_delta(
                spark, _stats_dir(base, gen), -n_new, -int(dead["s"] or 0)
            )
    total = spark.read.parquet(tdir).distinct().count() if (
        fresh_rows or existing is not None
    ) else 0
    return _local_rows(
        spark,
        "n_tombstones_added long, n_tombstones_total long, "
        "n_live_docs_removed long",
        [(len(fresh_rows), total, n_new)],
    )


# ---------------------------------------------------------------------------
# Compact
# ---------------------------------------------------------------------------
def search_index_compact(
    spark: SparkSession,
    index_dir: str,
    version: str = "v1",
    files_per_partition: int = 1,
) -> DataFrame:
    """Rewrite live rows into a fresh generation triple and COMMIT with
    one ``_commits`` manifest append (shared protocol — never a
    rename; the fresh generation has no tombstone dir = delete-log
    truncation).  The rewrite HEALS a torn append: doclens rows with
    dl > 0 but no posting coverage are dropped (the torn document is
    lost and its append can be re-run — same discipline as the dedup
    index), postings without doclens coverage are dropped, and the
    stats log is rewritten as ONE exact row from the surviving
    doclens.  Old generations GC'd best-effort.  Returns the
    per-bucket manifest read BACK from the compacted store."""
    base = _base(index_dir, version)
    _, _, positions = _meta(spark, base)
    gen, tomb_gen, seq = _state(spark, base)
    new_gen = gen + 1
    tombs = _load_tombstones(spark, base, tomb_gen)

    post_live = _anti_tombstones(
        _read_postings(spark, base, gen, positions), tombs, "doc_id"
    )
    lens_live = _anti_tombstones(
        spark.read.parquet(_doclens_dir(base, gen)), tombs, "doc_id"
    )
    post_ids = post_live.select("doc_id").distinct()
    # heal: keep doclens rows that are either empty docs (dl = 0, no
    # postings by construction) or covered by postings; keep postings
    # covered by doclens
    lens_ok = lens_live.join(post_ids, "doc_id", "semi").unionByName(
        lens_live.filter(F.col("dl") == 0)
    ).distinct()
    post_ok = post_live.join(
        lens_live.select("doc_id").distinct(), "doc_id", "semi"
    )
    lens_ok.coalesce(files_per_partition).write.mode("overwrite").parquet(
        _doclens_dir(base, new_gen)
    )
    _layout(post_ok, ["tb"], files_per_partition, "term").write.mode(
        "overwrite"
    ).partitionBy("tb").parquet(_postings_dir(base, new_gen))
    dstats = (
        spark.read.parquet(_doclens_dir(base, new_gen))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s"))
        .first()
    )
    _write_stats_delta(
        spark, _stats_dir(base, new_gen), dstats["n"], int(dstats["s"] or 0)
    )

    unreadable = _verify_readable(
        spark,
        _postings_dir(base, new_gen),
        _doclens_dir(base, new_gen),
        _stats_dir(base, new_gen),
    )
    if unreadable:
        raise ValueError(
            f"search_index_compact: new generation at {unreadable} is empty "
            f"or unreadable (every row tombstoned?) — store left on the old "
            f"generation; rebuild instead of compacting to empty"
        )

    _append_commit(spark, base, seq + 1, new_gen, tomb_gen + 1)

    _fs_delete(spark, _postings_dir(base, gen))
    _fs_delete(spark, _doclens_dir(base, gen))
    _fs_delete(spark, _stats_dir(base, gen))
    _fs_delete(spark, _tomb_dir(base, tomb_gen))

    return _bucket_manifest(
        _read_postings(spark, base, new_gen, positions)
    )


def search_index_gc(
    spark: SparkSession, index_dir: str, version: str = "v1"
) -> list[str]:
    """Reclaim SUPERSEDED generation directories a crashed compact may
    have orphaned (readers never see them — the manifest is the single
    source of truth).  Returns the removed names."""
    import re

    base = _base(index_dir, version)
    gen, tomb_gen, _ = _state(spark, base)
    keep = {
        "_meta", "_commits",
        _postings_dir(base, gen).rsplit("/", 1)[-1],
        _doclens_dir(base, gen).rsplit("/", 1)[-1],
        _stats_dir(base, gen).rsplit("/", 1)[-1],
        _tomb_dir(base, tomb_gen).rsplit("/", 1)[-1],
    }
    collectable = re.compile(
        r"^(postings|doclens|stats)(_g\d+)?$|^tombstones(_t\d+)?$"
    )
    removed = []
    for name in _fs_list(spark, base):
        if name not in keep and collectable.match(name):
            _fs_delete(spark, f"{base}/{name}")
            removed.append(name)
    return sorted(removed)


# ---------------------------------------------------------------------------
# Fsck / stats / maintain
# ---------------------------------------------------------------------------
def search_index_fsck(
    spark: SparkSession, index_dir: str, version: str = "v1"
) -> DataFrame:
    """Integrity audit — the persisted components must agree:
    every posting id has a doclens row (postings_covered), every
    doc with dl > 0 has postings (tokens_covered — the torn-append
    detector), doclens ids are unique, (term, doc) posting pairs are
    unique, every tb matches the term's bucket hash, and the stats log
    sums to EXACTLY the doclens table (count and total dl).  All reads
    resolve through the generation manifest, so fsck audits exactly
    what queries see.  Returns one hard-gated row."""
    base = _base(index_dir, version)
    n_buckets, _analyzer_name, has_pos = _meta(spark, base)
    gen, tomb_gen, _ = _state(spark, base)
    post = _read_postings(spark, base, gen, has_pos)
    lens = spark.read.parquet(_doclens_dir(base, gen))

    pids = post.select("doc_id").distinct()
    lids = lens.select("doc_id")
    postings_covered = pids.join(lids, "doc_id", "left_anti").count() == 0
    tokens_covered = (
        lens.filter(F.col("dl") > 0)
        .join(pids, "doc_id", "left_anti")
        .count()
        == 0
    )
    doclens_unique = lens.count() == lids.distinct().count()
    postings_unique = (
        post.groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .count()
        == 0
    )
    tb_ok = (
        post.filter(
            F.col("tb").cast("int") != _term_bucket_col("term", n_buckets)
        ).count()
        == 0
    )
    # positional stores: tf must equal the position-list length and
    # positions must be 1-based (vacuously true on tf-only stores)
    pos_match = True
    if has_pos:
        pos_match = (
            post.filter(
                (F.col("tf") != F.size("pos"))
                | (F.array_min("pos") < 1)
            ).count()
            == 0
        )
    d = lens.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")
    ).first()
    s = (
        spark.read.parquet(_stats_dir(base, gen))
        .agg(F.sum("n_docs").alias("n"), F.sum("sum_dl").alias("s"))
        .first()
    )
    # the stats log tracks the LIVE corpus; compare against doclens
    # minus tombstones
    tombs = _load_tombstones(spark, base, tomb_gen)
    if tombs is not None:
        dl_live = (
            _anti_tombstones(lens, tombs, "doc_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s"))
            .first()
        )
    else:
        dl_live = d
    stats_match = int(s["n"] or 0) == int(dl_live["n"]) and int(
        s["s"] or 0
    ) == int(dl_live["s"] or 0)
    return _local_rows(
        spark,
        "n_docs long, postings_covered boolean, tokens_covered boolean, "
        "doclens_unique boolean, postings_unique boolean, tb_ok boolean, "
        "pos_match boolean, stats_match boolean",
        [
            (
                int(d["n"]),
                bool(postings_covered),
                bool(tokens_covered),
                bool(doclens_unique),
                bool(postings_unique),
                bool(tb_ok),
                bool(pos_match),
                bool(stats_match),
            )
        ],
    )


def search_index_stats(
    spark: SparkSession, index_dir: str, version: str = "v1"
) -> DataFrame:
    """Ops monitoring: per-bucket physical vs live posting counts,
    live distinct terms, and the max LIVE document frequency — the
    hot-term monitor (a stop-word-like term with corpus-sized df is
    what turns a keyword query into a corpus scan; production search
    services alert on it and stop-list the term)."""
    base = _base(index_dir, version)
    _, _, _has_pos = _meta(spark, base)
    gen, tomb_gen, _ = _state(spark, base)
    post = _read_postings(spark, base, gen, _has_pos)
    tombs = _load_tombstones(spark, base, tomb_gen)
    live = _anti_tombstones(post, tombs, "doc_id")

    phys = post.groupBy("tb").agg(F.count(F.lit(1)).alias("n_postings_physical"))
    per_term = live.groupBy("tb", "term").agg(
        F.count(F.lit(1)).alias("df")
    )
    lv = per_term.groupBy("tb").agg(
        F.sum("df").alias("n_postings_live"),
        F.count(F.lit(1)).alias("n_terms_live"),
        F.max("df").alias("max_df_live"),
    )
    return phys.join(lv, "tb", "left").select(
        F.col("tb").cast("int").alias("tb"),
        "n_postings_physical",
        F.coalesce("n_postings_live", F.lit(0)).alias("n_postings_live"),
        F.coalesce("n_terms_live", F.lit(0)).alias("n_terms_live"),
        F.coalesce("max_df_live", F.lit(0)).alias("max_df_live"),
    )


def search_index_maintain(
    spark: SparkSession,
    index_dir: str,
    version: str = "v1",
    max_dead_ratio: float = 0.2,
    max_files_per_partition: int = 4,
    files_per_partition: int = 1,
) -> DataFrame:
    """Auto-maintenance — the scheduler verb (the search twin of
    `ann_index_maintain` / `dedup_index_maintain` /
    `snapshot_maintain`): derives four compaction-debt signals from
    the store itself and runs compact + gc when any trips:

    - **torn append** (docs with dl > 0 but no postings — the
      documented doclens-first crash window);
    - **stats drift** (the additive log disagreeing with live doclens
      — a crash between the postings and stats writes);
    - **tombstone ratio** over live documents;
    - **small files** per bucket directory (one per append batch).

    Idempotent: the compacted generation is whole, stats-exact, and
    delete-log-free, so an immediate second call no-ops.  Returns a
    one-row receipt with each signal as measured BEFORE the action."""
    base = _base(index_dir, version)
    _, _, _has_pos = _meta(spark, base)
    gen, tomb_gen, _ = _state(spark, base)
    lens = spark.read.parquet(_doclens_dir(base, gen))
    pids = _read_postings(spark, base, gen, _has_pos).select("doc_id")
    torn = (
        lens.filter(F.col("dl") > 0)
        .join(pids.distinct(), "doc_id", "left_anti")
        .count()
    )
    tombs = _load_tombstones(spark, base, tomb_gen)
    n_docs = lens.count()
    n_dead = 0 if tombs is None else tombs.count()
    dead_ratio = n_dead / max(n_docs, 1)
    s = (
        spark.read.parquet(_stats_dir(base, gen))
        .agg(F.sum("n_docs").alias("n"), F.sum("sum_dl").alias("s"))
        .first()
    )
    live = _anti_tombstones(lens, tombs, "doc_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")
    ).first()
    drift = int(s["n"] or 0) != int(live["n"]) or int(s["s"] or 0) != int(
        live["s"] or 0
    )
    max_files = _max_files(spark, _postings_dir(base, gen), 1)

    reasons = []
    if torn > 0:
        reasons.append("torn_append")
    if drift:
        reasons.append("stats_drift")
    if dead_ratio > max_dead_ratio:
        reasons.append("dead_ratio")
    if max_files > max_files_per_partition:
        reasons.append("file_count")
    n_gc = 0
    if reasons:
        search_index_compact(
            spark, index_dir, version, files_per_partition
        ).collect()
        n_gc = len(search_index_gc(spark, index_dir, version))
    return _local_rows(
        spark,
        "action string, reason string, n_docs long, n_torn long, "
        "stats_drift boolean, n_dead long, dead_ratio double, "
        "max_files_per_partition int, n_gc_removed int",
        [
            (
                "compacted" if reasons else "noop",
                ",".join(reasons) or "none",
                n_docs,
                torn,
                bool(drift),
                n_dead,
                round(dead_ratio, 6),
                max_files,
                n_gc,
            )
        ],
    )
