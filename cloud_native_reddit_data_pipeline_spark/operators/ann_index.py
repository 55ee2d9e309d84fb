"""Persistent ANN index: build once, probe many (round-10 hardening of
the fused `similarity.ivf_topk` / `similarity.pq_adc_topk` forms).

Production ANN never re-derives its index per query — centroids, the
inverted file, and the PQ codebook are built ONCE and persisted; a probe
loads metadata and touches only the probed cells.  This module splits
the fused operators into exactly that shape:

- `ann_index_build`  — derive IVF centroids + cell assignments + PQ
  codebook/codes from the corpus and persist all four artifacts as
  parquet under ``{index_dir}/{version}/``; returns a per-cell manifest.
- `ann_index_probe`  — IVF probe straight off the persisted artifacts:
  centroid scoring on the (tiny) centroid table, **static partition
  pruning** of the cell-partitioned inverted file down to the probed
  cells, exact cosine re-rank.  Byte-identical to the fused
  `similarity.ivf_topk` (pinned by tests/test_ann_index.py).
- `ann_index_probe_dpp` — the same probe with the probe-cell set kept
  as a DataFrame end-to-end: the inverted-file scan is pruned by
  Spark's **dynamic partition pruning** (a DynamicPruningExpression on
  the ``cell`` partition column, fed by the broadcast probe side)
  instead of a driver-collected cell list.  Byte-identical to
  `ann_index_probe`; the serving path with zero driver-side routing.
- `ann_index_probe_pq` — ADC probe off the persisted codes + codebook,
  no re-encode.  Byte-identical to `similarity.pq_adc_topk`.  The
  per-query distance table is computed AS A SPARK EXPRESSION over the
  broadcast codebook (exact decimal(30,12) arithmetic — the same e12
  integers as the old driver-side Decimal loop it replaced), so driver
  work is O(1), not O(|queries|).

Layout under ``{index_dir}/{version}/``::

    centroids/     (centroid_id BIGINT, cv ARRAY<FLOAT>)         ~KB
    cells/         (vec_id BIGINT, embedding ARRAY<FLOAT>)
                   partitioned by cell INT (the inverted file)
    codes/         (vec_id BIGINT, code0..code{m-1} INT)          4B/vec
    codebook/      (sub INT, code INT, vals ARRAY<DECIMAL(9,6)>)  ~KB
    tombstones/    (vec_id BIGINT)  — append-only delete log
    _commits/      (seq BIGINT, gen INT, tomb_gen INT) — generation
                   manifest (see below); absent until the first
                   compaction / tombstone rewrite

**Object-store-safe commits.**  Compaction never renames or deletes on
the read path: it writes a brand-new generation directory
(``cells_g{N}`` / ``codes_g{N}``), then commits by appending ONE row to
the ``_commits`` manifest — readers resolve max-seq and look only at
that generation's directories (a fresh generation has no tombstone dir,
which IS the tombstone truncation).  A crash before the manifest append
leaves readers on the old, fully-consistent generation; a crash after
it leaves them on the new one (the new dirs are complete before the
commit row exists).  Old generation directories are garbage-collected
best-effort through the Hadoop FileSystem API — correctness never
depends on the GC.  This is the manifest-pointer pattern (Iceberg/Delta
commit protocol, miniaturized): it works identically on local disk,
HDFS and S3-style stores where rename is copy+delete.  Single writer
per index version assumed (one maintenance job owns an index), as in
any LSM store.

Scale shape: the build is the fused form's first half (one broadcast
centroid scoring pass + one partitionBy write — the shuffle is the
partitioned write itself, exactly the shuffle an inverted layout is FOR).
A probe reads the centroid table (KBs), prunes the inverted file to
``n_probe x |queries|`` cell directories on DISK (PartitionFilters for
the static form, DynamicPruningExpression for the DPP form — never a
post-scan filter), and re-ranks only those rows — corpus scan cost is
1/n_centroids per probed cell regardless of corpus size.

Float discipline: embeddings persist as the original ARRAY<FLOAT> (bit
round-trip through parquet), so probe-side cosines see the exact same
doubles as the fused form; the codebook persists at DECIMAL(9,6) (exact
round-trip), so ADC distances are the same e12 integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine
from .clustering import _quantize as _pq_quantize
from .similarity import _pq_encode_df, _pq_seed_codebook


def _base(index_dir: str, version: str) -> str:
    return f"{index_dir}/{version}"


# ---------------------------------------------------------------------------
# Generation manifest: FS-agnostic existence + commit + resolve
# ---------------------------------------------------------------------------
def _try_read(spark: SparkSession, path: str) -> DataFrame | None:
    """Read parquet at `path`, or None if it does not exist — resolved by
    ATTEMPTING the read (AnalysisException), never by a local-filesystem
    stat, so tombstone/manifest visibility is identical on file://,
    hdfs:// and s3a:// index dirs."""
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.parquet(path)
        df.schema  # force plan resolution (the read itself is lazy)
        return df
    except AnalysisException:
        return None


def _fs_delete(spark: SparkSession, path: str) -> None:
    """Best-effort recursive delete through the Hadoop FileSystem API
    (works on any supported scheme).  GC only — correctness never
    depends on it."""
    try:
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(p):
            fs.delete(p, True)
    except Exception:
        pass


def _state(spark: SparkSession, base: str) -> tuple[int, int, int]:
    """(gen, tomb_gen, seq) of the current committed generation —
    max-seq row of the ``_commits`` manifest, or (0, 0, -1) for a
    freshly-built index (no manifest yet)."""
    commits = _try_read(spark, f"{base}/_commits")
    if commits is None:
        return 0, 0, -1
    row = commits.orderBy(F.desc("seq")).limit(1).collect()[0]
    return int(row["gen"]), int(row["tomb_gen"]), int(row["seq"])


def _append_commit(
    spark: SparkSession, base: str, seq: int, gen: int, tomb_gen: int
) -> None:
    """THE commit point: one single-row parquet append to ``_commits``.
    Everything before this call is invisible to readers; everything
    after is durable.  Kept as a module-level seam so the crash-mid-
    compact test can fail it deliberately."""
    spark.createDataFrame(
        [(seq, gen, tomb_gen)], "seq long, gen int, tomb_gen int"
    ).coalesce(1).write.mode("append").parquet(f"{base}/_commits")


def _cells_dir(base: str, gen: int) -> str:
    return f"{base}/cells" if gen == 0 else f"{base}/cells_g{gen}"


def _codes_dir(base: str, gen: int) -> str:
    return f"{base}/codes" if gen == 0 else f"{base}/codes_g{gen}"


def _tomb_dir(base: str, tomb_gen: int) -> str:
    return (
        f"{base}/tombstones"
        if tomb_gen == 0
        else f"{base}/tombstones_t{tomb_gen}"
    )


def resolve_dirs(
    spark: SparkSession, index_dir: str, version: str = "v1"
) -> dict[str, str]:
    """Public resolver: the CURRENT committed directory for each index
    component (audits / fsck read through this, never hard-coded
    paths, so they see exactly what probes see)."""
    base = _base(index_dir, version)
    gen, tomb_gen, _ = _state(spark, base)
    return {
        "centroids": f"{base}/centroids",
        "cells": _cells_dir(base, gen),
        "codes": _codes_dir(base, gen),
        "codebook": f"{base}/codebook",
        "tombstones": _tomb_dir(base, tomb_gen),
    }


def _reset_version_dir(spark: SparkSession, base: str) -> None:
    """A (re)build OWNS its version directory: drop the generation
    manifest and every generation/tombstone directory first, so the
    fresh gen-0 artifacts are what readers resolve.  Without this, a
    rebuild over a previously-COMPACTED store writes gen-0 dirs while
    ``_commits`` still points readers at the old generation — the new
    build would be silently invisible (and collectable by GC).
    Rebuild-in-place is still not concurrent-safe with live probes;
    use a fresh ``version`` key for zero-downtime rebuilds."""
    import re

    collectable = re.compile(
        r"^(cells|codes|sigs|bands)(_g\d+)?$|^tombstones(_t\d+)?$|^_commits$"
    )
    for name in _fs_list(spark, base):
        if collectable.match(name):
            _fs_delete(spark, f"{base}/{name}")


# ---------------------------------------------------------------------------
# Build
# ---------------------------------------------------------------------------
def ann_index_build(
    emb: DataFrame,
    index_dir: str,
    n_centroids: int = 16,
    m: int = 4,
    k_codes: int = 16,
    version: str = "v1",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Build and persist the ANN index; returns the per-cell manifest
    ``(cell, n_vectors, min_vec_id, max_vec_id)`` read back from the
    persisted inverted file (so the gate proves what is ON DISK, not
    what was computed in flight)."""
    from ..sources.tables import fan_out

    spark = emb.sparkSession
    base = _base(index_dir, version)
    _reset_version_dir(spark, base)
    emb = fan_out(emb)

    # -- IVF half: centroids + cell assignment (same derivation, same
    #    rounding, same tie-break as similarity.ivf_topk) --------------
    cents = emb.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cv")
    )
    cents.coalesce(1).write.mode("overwrite").parquet(f"{base}/centroids")
    cents = spark.read.parquet(f"{base}/centroids")

    scored = emb.crossJoin(F.broadcast(cents)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("centroid_id"),
        F.round(cosine(F.col(vec_col), F.col("cv")), 6).alias("ccos"),
    )
    w_assign = Window.partitionBy(id_col).orderBy(F.desc("ccos"), F.asc("centroid_id"))
    assigned = (
        scored.withColumn("_rk", F.row_number().over(w_assign))
        .filter(F.col("_rk") == 1)
        .select(
            id_col, vec_col, F.col("centroid_id").cast("int").alias("cell")
        )
    )
    # the partitionBy write IS the inverted layout: one directory per
    # cell, so probes prune on disk
    assigned.write.mode("overwrite").partitionBy("cell").parquet(f"{base}/cells")

    # -- PQ half: seed codebook + codes ------------------------------
    quant = _pq_quantize(emb, id_col, vec_col)
    codebook = _pq_seed_codebook(quant, id_col, m, k_codes)
    dsub = len(codebook[0][0])
    cb_rows = [
        (s, c, codebook[s][c])
        for s in range(m)
        for c in range(k_codes)
    ]
    spark.createDataFrame(
        cb_rows, "sub int, code int, vals array<decimal(9,6)>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{base}/codebook")
    _pq_encode_df(quant, codebook, dsub).write.mode("overwrite").parquet(
        f"{base}/codes"
    )

    return (
        spark.read.parquet(f"{base}/cells")
        .groupBy(F.col("cell").cast("int").alias("cell"))
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min(id_col).alias("min_vec_id"),
            F.max(id_col).alias("max_vec_id"),
        )
    )


# ---------------------------------------------------------------------------
# Append
# ---------------------------------------------------------------------------
def ann_index_append(
    spark: SparkSession,
    new_vecs: DataFrame,
    index_dir: str,
    version: str = "v1",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assert_unique: bool = True,
) -> DataFrame:
    """Incremental index maintenance — the third production verb after
    build/probe: assign NEW vectors to the EXISTING centroids (an IVF
    index never moves centroids on ingest; drift is handled by a
    periodic rebuild under a new version key), append them to the
    cell-partitioned inverted file, and PQ-encode them against the
    PERSISTED codebook.  Because cell assignment and codes use the
    frozen artifacts, build(A) + append(B) leaves the exact same store
    as build(A ∪ B) whenever the seed rows live in A — pinned
    byte-identical by tests/test_ann_index.py.  Returns the per-cell
    appended-count manifest.

    Id discipline: an incoming id that is currently TOMBSTONED always
    fails fast — the dead physical row still lives in the inverted file
    until the next compact, so "clearing" the tombstone would resurrect
    the OLD vector alongside the new one; the contract is explicit:
    ``ann_index_compact`` first, then re-insert (checked against the
    tombstone-sized delete log, so it is always on).  Separately, with
    ``assert_unique`` (the default) the append also fails fast if any
    incoming id already lives LIVE in the index — a duplicate id would
    double probe candidates and ADC distance sums (a one-column pruned
    scan of the inverted file's id column; callers with an external
    uniqueness guarantee can skip it at very large scale).

    Scale shape: one broadcast centroid scoring pass over ONLY the new
    rows + one partitioned append (no touch of existing cell files);
    the PQ encode is the same narrow broadcast-codebook map."""
    base = _base(index_dir, version)
    gen, tomb_gen, _ = _state(spark, base)
    cells_dir, codes_dir = _cells_dir(base, gen), _codes_dir(base, gen)
    cents = spark.read.parquet(f"{base}/centroids")

    new_ids = new_vecs.select(F.col(id_col).alias("vec_id")).distinct()
    tombs = _load_tombstones(spark, base, tomb_gen)
    if tombs is not None:
        n_dead = tombs.join(F.broadcast(new_ids), "vec_id", "semi").count()
        if n_dead:
            raise ValueError(
                f"ann_index_append: {n_dead} incoming id(s) are tombstoned — "
                f"their dead rows still live in the inverted file; run "
                f"ann_index_compact to reclaim them, then re-insert"
            )
    if assert_unique:
        dup = (
            spark.read.parquet(cells_dir)
            .select(F.col(id_col).alias("vec_id"))
            .join(F.broadcast(new_ids), "vec_id", "semi")
            .count()
        )
        if dup:
            raise ValueError(
                f"ann_index_append: {dup} incoming id(s) already present in "
                f"the index — duplicate ids double probe candidates; pass "
                f"assert_unique=False only with an external uniqueness "
                f"guarantee"
            )

    scored = new_vecs.select(id_col, vec_col).crossJoin(F.broadcast(cents)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("centroid_id"),
        F.round(cosine(F.col(vec_col), F.col("cv")), 6).alias("ccos"),
    )
    w_assign = Window.partitionBy(id_col).orderBy(F.desc("ccos"), F.asc("centroid_id"))
    assigned = (
        scored.withColumn("_rk", F.row_number().over(w_assign))
        .filter(F.col("_rk") == 1)
        .select(id_col, vec_col, F.col("centroid_id").cast("int").alias("cell"))
    )
    assigned.write.mode("append").partitionBy("cell").parquet(cells_dir)

    cb_rows = spark.read.parquet(f"{base}/codebook").collect()
    m = 1 + max(r["sub"] for r in cb_rows)
    k_codes = 1 + max(r["code"] for r in cb_rows)
    codebook = [[None] * k_codes for _ in range(m)]
    for r in cb_rows:
        codebook[r["sub"]][r["code"]] = list(r["vals"])
    dsub = len(codebook[0][0])
    quant = _pq_quantize(new_vecs, id_col, vec_col)
    _pq_encode_df(quant, codebook, dsub).write.mode("append").parquet(codes_dir)

    return assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("n_appended"))


# ---------------------------------------------------------------------------
# Delete (tombstones)
# ---------------------------------------------------------------------------
def ann_index_delete(
    spark: SparkSession,
    index_dir: str,
    delete_ids: list[int],
    version: str = "v1",
) -> DataFrame:
    """Tombstone deletion — the fifth index verb: deletes never rewrite
    the inverted file in place (that would be a full compaction per
    delete batch); ids append to the CURRENT tombstone generation and
    every probe anti-joins it (the broadcast is tombstone-sized).
    Space is reclaimed by the NEXT `ann_index_compact`, whose fresh
    generation starts with an empty delete log — the LSM delete story.
    Returns the one-row (n_tombstones_added, n_tombstones_total)
    receipt."""
    base = _base(index_dir, version)
    _, tomb_gen, _ = _state(spark, base)
    tdir = _tomb_dir(base, tomb_gen)
    spark.createDataFrame(
        [(int(i),) for i in delete_ids], "vec_id long"
    ).coalesce(1).write.mode("append").parquet(tdir)
    total = spark.read.parquet(tdir).distinct().count()
    return spark.createDataFrame(
        [(len(delete_ids), total)],
        "n_tombstones_added long, n_tombstones_total long",
    )


def _load_tombstones(spark: SparkSession, base: str, tomb_gen: int):
    t = _try_read(spark, _tomb_dir(base, tomb_gen))
    return None if t is None else t.distinct()


def _anti_tombstones(
    df: DataFrame, spark: SparkSession, base: str, id_col: str, tomb_gen: int
) -> DataFrame:
    t = _load_tombstones(spark, base, tomb_gen)
    if t is None:
        return df
    return df.join(
        F.broadcast(t.withColumnRenamed("vec_id", "_dead")),
        df[id_col] == F.col("_dead"),
        "left_anti",
    )


# ---------------------------------------------------------------------------
# Compact
# ---------------------------------------------------------------------------
def ann_index_compact(
    spark: SparkSession,
    index_dir: str,
    version: str = "v1",
    files_per_cell: int = 1,
) -> DataFrame:
    """Compact the inverted file — the fourth index verb: after many
    appends each cell directory accumulates small files (one per
    append), and probe latency becomes file-open bound.  Rewrites every
    cell partition down to ``files_per_cell`` files with IDENTICAL live
    contents (probe results are pinned byte-identical by test), drops
    tombstoned rows, and COMMITS by appending one row to the ``_commits``
    manifest pointing readers at the new generation directories — never
    a rename: the swap is a single manifest append, so a crash at ANY
    point leaves probes on a complete generation (old before the
    commit, new after), on local disk and object stores alike.  The new
    generation has no tombstone directory, which IS the truncation of
    the delete log.  Old generation dirs are GC'd best-effort through
    the Hadoop FileSystem API afterwards.  Returns the per-cell
    (cell, n_vectors) manifest read back from the compacted store.

    Scale shape: one read + one partitioned write of the index (NOT
    the corpus — the index is the corpus's vectors, but compaction
    runs offline at a cadence, amortized like the build)."""
    base = _base(index_dir, version)
    gen, tomb_gen, seq = _state(spark, base)
    new_gen = gen + 1

    cells = _anti_tombstones(
        spark.read.parquet(_cells_dir(base, gen)), spark, base, "vec_id", tomb_gen
    )
    (
        cells.repartition(files_per_cell, "cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(_cells_dir(base, new_gen))
    )
    codes = _anti_tombstones(
        spark.read.parquet(_codes_dir(base, gen)), spark, base, "vec_id", tomb_gen
    )
    codes.coalesce(files_per_cell).write.mode("overwrite").parquet(
        _codes_dir(base, new_gen)
    )

    # verify the new generation is READABLE before flipping readers to
    # it — compacting a fully-tombstoned index writes file-less dirs,
    # and committing those would brick the store after the GC below
    for d in (_cells_dir(base, new_gen), _codes_dir(base, new_gen)):
        if _try_read(spark, d) is None:
            raise ValueError(
                f"ann_index_compact: new generation at {d} is empty or "
                f"unreadable (every row tombstoned?) — store left on the "
                f"old generation; rebuild instead of compacting to empty"
            )

    # THE commit: readers atomically move to (new_gen, tomb_gen+1) —
    # the fresh tombstone generation has no directory, i.e. empty log
    _append_commit(spark, base, seq + 1, new_gen, tomb_gen + 1)

    # best-effort GC of the superseded generation (never load-bearing)
    _fs_delete(spark, _cells_dir(base, gen))
    _fs_delete(spark, _codes_dir(base, gen))
    _fs_delete(spark, _tomb_dir(base, tomb_gen))

    return (
        spark.read.parquet(_cells_dir(base, new_gen))
        .groupBy(F.col("cell").cast("int").alias("cell"))
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


def ann_index_stats(
    spark: SparkSession, index_dir: str, version: str = "v1"
) -> DataFrame:
    """Index monitoring — the query an ops dashboard runs at a cadence:
    per cell, physical row count, live count, and tombstoned-but-
    unreclaimed count (the compaction-debt signal: when n_dead/n_rows
    crosses a threshold, schedule `ann_index_compact`).  Cell skew
    shows up directly as the n_rows spread (a hot cell bounds probe
    latency).  One pruned scan of the inverted file's (id, cell)
    columns + one broadcast tombstone join; never touches vectors."""
    base = _base(index_dir, version)
    gen, tomb_gen, _ = _state(spark, base)
    cells = spark.read.parquet(_cells_dir(base, gen)).select(
        "vec_id", F.col("cell").cast("int").alias("cell")
    )
    t = _load_tombstones(spark, base, tomb_gen)
    if t is None:
        dead = F.lit(0)
    else:
        cells = cells.join(
            F.broadcast(t.withColumn("_dead", F.lit(1))), "vec_id", "left"
        )
        dead = F.coalesce(F.col("_dead"), F.lit(0))
    return cells.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(dead).alias("n_dead"),
        (F.count(F.lit(1)) - F.sum(dead)).alias("n_live"),
    )


def _fs_list(spark: SparkSession, path: str) -> list[str]:
    """Child names of `path` through the Hadoop FileSystem API (any
    scheme); [] if the path does not exist."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]


def ann_index_gc(
    spark: SparkSession, index_dir: str, version: str = "v1"
) -> list[str]:
    """Reclaim SUPERSEDED generation directories the best-effort GC in
    `ann_index_compact` may have left behind (a crash after the
    manifest commit leaves the old generation orphaned — readers never
    see it, but it holds space).  Lists the version root through the
    Hadoop FS API, keeps exactly the directories the current manifest
    references, deletes every other cells/codes/tombstones generation.
    Safe at any time: the manifest is the single source of truth, so
    nothing referenced can be collected.  Returns the removed names."""
    import re

    base = _base(index_dir, version)
    gen, tomb_gen, _ = _state(spark, base)
    keep = {
        "centroids", "codebook", "_commits",
        _cells_dir(base, gen).rsplit("/", 1)[-1],
        _codes_dir(base, gen).rsplit("/", 1)[-1],
        _tomb_dir(base, tomb_gen).rsplit("/", 1)[-1],
    }
    collectable = re.compile(r"^(cells|codes)(_g\d+)?$|^tombstones(_t\d+)?$")
    removed = []
    for name in _fs_list(spark, base):
        if name not in keep and collectable.match(name):
            _fs_delete(spark, f"{base}/{name}")
            removed.append(name)
    return sorted(removed)


# ---------------------------------------------------------------------------
# Probe (static pruning)
# ---------------------------------------------------------------------------
def ann_index_probe(
    spark: SparkSession,
    index_dir: str,
    query_ids: list[int],
    k: int = 5,
    n_probe: int = 4,
    version: str = "v1",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF probe off the persisted index — NO rebuild: centroids and the
    inverted file are read as-is; only ``n_probe`` cell directories per
    query are scanned (static partition pruning via the collected probe
    cell list).  Result is byte-identical to ``similarity.ivf_topk`` on
    the same corpus/params."""
    base = _base(index_dir, version)
    gen, _, _ = _state(spark, base)
    cells = spark.read.parquet(_cells_dir(base, gen))
    qdf = cells.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    return ann_index_probe_vectors(
        spark, index_dir, qdf, k=k, n_probe=n_probe, version=version,
        id_col=id_col, vec_col=vec_col,
    )


def _probe_cells_df(
    qdf: DataFrame, cents: DataFrame, n_probe: int
) -> DataFrame:
    """(query_id, qv, cell) — the n_probe nearest centroids per query,
    same rounding and tie-break as the build-side assignment."""
    w_probe = Window.partitionBy("query_id").orderBy(
        F.desc("ccos"), F.asc("centroid_id")
    )
    return (
        qdf.crossJoin(F.broadcast(cents))
        .select(
            "query_id",
            "qv",
            "centroid_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("ccos"),
        )
        .withColumn("_rk", F.row_number().over(w_probe))
        .filter(F.col("_rk") <= n_probe)
        .select("query_id", "qv", F.col("centroid_id").cast("int").alias("cell"))
    )


def _rerank_topk(cand: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos", "rk")
    )


def ann_index_probe_vectors(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    version: str = "v1",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe with CALLER-SUPPLIED query vectors — ``queries`` is
    (query_id, qv) — the serving-path form: query vectors arrive from
    outside (a request stream, a batch of fresh embeddings) and never
    need to live in the index.  `ann_index_probe` is the corpus-member
    convenience wrapper.  A query whose id matches a corpus vector is
    self-excluded, so member probes stay byte-identical to the fused
    form."""
    base = _base(index_dir, version)
    gen, tomb_gen, _ = _state(spark, base)
    cents = spark.read.parquet(f"{base}/centroids")
    cells = spark.read.parquet(_cells_dir(base, gen))

    qdf = queries.select(F.col(queries.columns[0]).alias("query_id"),
                         F.col(queries.columns[1]).alias("qv"))
    probes = _probe_cells_df(qdf, cents, n_probe)
    # k-row routing metadata (|queries| x n_probe pairs): collected so the
    # inverted-file read prunes partitions STATICALLY (PartitionFilters
    # in the scan, not a post-hoc filter) — the query-router pattern
    probe_rows = probes.collect()
    probe_cells = sorted({r["cell"] for r in probe_rows})
    probes_df = spark.createDataFrame(
        [(r["query_id"], r["qv"], r["cell"]) for r in probe_rows],
        probes.schema,
    )
    pruned = _anti_tombstones(
        cells.filter(F.col("cell").isin([int(c) for c in probe_cells])),
        spark, base, id_col, tomb_gen,
    )
    cand = (
        pruned
        .join(F.broadcast(probes_df), "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine(F.col("qv"), F.col(vec_col)), 4).alias("cos"),
        )
    )
    return _rerank_topk(cand, k)


def ann_index_probe_filtered(
    spark: SparkSession,
    index_dir: str,
    query_ids: list[int],
    allowed: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    version: str = "v1",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Filtered ANN probe — metadata predicate + vector search ("top-k
    among documents WHERE <predicate>"), the most common production
    retrieval shape.  `allowed` is a one-column (vec_id) DataFrame of
    ids passing the metadata predicate; candidates from the probed
    cells semi-join it BEFORE the cosine re-rank (post-filtering, the
    standard IVF approach: cells are probed by vector geometry alone,
    then the predicate prunes candidates — recall under very selective
    predicates is recovered by raising n_probe, exactly the FAISS
    IDSelector trade).  Same rounding/tie-break as the unfiltered
    probe, so results equal the unfiltered probe's rows restricted and
    re-ranked within the allowed set.

    Scale shape: the semi-join key set is predicate-sized; for
    selective predicates it broadcasts, otherwise it is a shuffle join
    on the already cell-pruned candidate slice (n_probe/|cells| of the
    corpus), never the full index."""
    base = _base(index_dir, version)
    gen, tomb_gen, _ = _state(spark, base)
    cents = spark.read.parquet(f"{base}/centroids")
    cells = spark.read.parquet(_cells_dir(base, gen))

    qdf = cells.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    probes = _probe_cells_df(qdf, cents, n_probe)
    probe_rows = probes.collect()
    probe_cells = sorted({r["cell"] for r in probe_rows})
    probes_df = spark.createDataFrame(
        [(r["query_id"], r["qv"], r["cell"]) for r in probe_rows],
        probes.schema,
    )
    pruned = _anti_tombstones(
        cells.filter(F.col("cell").isin([int(c) for c in probe_cells])),
        spark, base, id_col, tomb_gen,
    )
    allowed_ids = allowed.select(
        F.col(allowed.columns[0]).cast("long").alias(id_col)
    ).distinct()
    cand = (
        pruned.join(allowed_ids, id_col, "semi")
        .join(F.broadcast(probes_df), "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine(F.col("qv"), F.col(vec_col)), 4).alias("cos"),
        )
    )
    return _rerank_topk(cand, k)


# ---------------------------------------------------------------------------
# Probe (dynamic partition pruning)
# ---------------------------------------------------------------------------
def ann_index_probe_dpp(
    spark: SparkSession,
    index_dir: str,
    query_ids: list[int],
    k: int = 5,
    n_probe: int = 4,
    version: str = "v1",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF probe with the probe-cell set kept as a DATAFRAME end-to-end:
    the broadcast join against the cell-partitioned inverted file lets
    Spark insert a DynamicPruningExpression on the ``cell`` partition
    column (fed by the reused broadcast of the probe side), so the scan
    still touches only the probed cell directories — with ZERO
    driver-side routing (no collect of the probe list).  Byte-identical
    to `ann_index_probe` (pinned by test + sweep); the variant for very
    large offline query batches where even |Q| x n_probe routing rows
    should not transit the driver."""
    base = _base(index_dir, version)
    gen, tomb_gen, _ = _state(spark, base)
    cents = spark.read.parquet(f"{base}/centroids")
    cells = spark.read.parquet(_cells_dir(base, gen))

    qdf = cells.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    probes = _probe_cells_df(qdf, cents, n_probe)
    live = _anti_tombstones(cells, spark, base, id_col, tomb_gen)
    cand = (
        live.join(F.broadcast(probes), "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine(F.col("qv"), F.col(vec_col)), 4).alias("cos"),
        )
    )
    return _rerank_topk(cand, k)


# ---------------------------------------------------------------------------
# Probe (PQ / ADC)
# ---------------------------------------------------------------------------
def ann_index_probe_pq(
    spark: SparkSession,
    index_dir: str,
    query_ids: list[int],
    topk: int = 5,
    version: str = "v1",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC probe off the persisted PQ codes + codebook — no re-encode.
    The per-query distance table is ONE Spark expression: quantized
    query subvectors x the broadcast codebook, exact decimal(30,12)
    zip_with/aggregate arithmetic over the round-tripped DECIMAL(9,6)
    entries — the same e12 BIGINTs as the fused
    ``similarity.pq_adc_topk`` (and as the driver-side Decimal loop
    this replaced; prec-50 vs 30,12 agree because every product is
    exactly scale-12).  Driver work is O(1): no |Q|-proportional
    Python loop, no collect of query vectors."""
    base = _base(index_dir, version)
    gen, tomb_gen, _ = _state(spark, base)
    cells = spark.read.parquet(_cells_dir(base, gen))
    codes = _anti_tombstones(
        spark.read.parquet(_codes_dir(base, gen)), spark, base, id_col, tomb_gen
    )
    cb = spark.read.parquet(f"{base}/codebook")
    m = sum(1 for c in codes.columns if c.startswith("code"))

    qquant = _pq_quantize(
        cells.filter(F.col(id_col).isin(query_ids)), id_col, vec_col
    )
    # distance table as data: |Q| x m x k_codes rows, built by a
    # broadcast nested-loop of the (tiny) codebook against the (tiny)
    # quantized query set — all exact decimal, all JVM-side
    dtable = (
        qquant.crossJoin(F.broadcast(cb))
        .select(
            F.col(id_col).alias("query_id"),
            "sub",
            "code",
            F.expr(
                "CAST(aggregate("
                "  zip_with(slice(xd, sub * size(vals) + 1, size(vals)), vals,"
                "           (a, b) -> (a - b) * (a - b)),"
                "  CAST(0 AS DECIMAL(30,12)),"
                "  (acc, x) -> CAST(acc + x AS DECIMAL(30,12))"
                ") * 1000000000000 AS BIGINT)"
            ).alias("d_e12"),
        )
    )

    encoded = codes.select(
        id_col,
        F.posexplode(F.array(*[F.col(f"code{s}") for s in range(m)])).alias(
            "sub", "code"
        ),
    )
    adc = (
        encoded.join(F.broadcast(dtable), ["sub", "code"])
        .filter(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", F.col(id_col).alias("neighbor_id"))
        .agg(F.sum("d_e12").alias("adc_e12"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_e12", "neighbor_id")
    return (
        adc.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= topk)
        .select("query_id", "neighbor_id", "adc_e12", "rk")
    )
