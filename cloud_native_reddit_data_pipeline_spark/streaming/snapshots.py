"""Versioned upsert store: append-only snapshots + time-travel reads.

The CDC/bucketed upsert sinks (`streaming/ingest.py`) keep the LATEST
state — correct for serving, but a training pipeline also needs the
question those sinks can't answer: *"read the corpus exactly as it was
when run X trained"*.  Reproducibility at 100 TB is a data-versioning
problem, and the production answer (Delta/Iceberg time travel) is a
commit log + manifest, not copies of the table.  This module is that
shape, miniaturized on parquet:

- `snapshot_commit`  — append the batch as a NEW immutable changelog
  partition ``log/snap=N/`` and COMMIT by appending one row to the
  ``_snapshots`` manifest.  The manifest row IS the commit point: a
  crash after the data write but before the manifest append leaves an
  uncommitted partition readers never select (the retried commit
  overwrites it in place).  Batches carry an optional ``batch_id`` for
  exactly-once under redelivery: a batch_id already in the manifest is
  a no-op.
- `read_as_of`       — the store's state at snapshot S: union the
  compacted base (if any) with the log partitions in (horizon, S]
  (partition-pruned on the ``snap`` directory column), resolve
  last-writer-wins per key by (snap, seq) with a deterministic
  hash tie-break, drop tombstones.  ``snap=None`` reads the latest
  COMMITTED snapshot — never a half-committed one.
- `compact_snapshots` — fold everything ≤ ``upto_snap`` into a new
  base generation ``base_g{G}`` (winners keep their ORIGINAL
  (snap, seq, op) columns, so the merge stays uniform afterwards) and
  commit via the shared generation-manifest protocol
  (`ann_index._append_commit` — one ``_commits`` append, object-store
  safe, crash leaves readers on the old generation).  Compaction SETS
  THE TIME-TRAVEL HORIZON: as-of reads below ``upto_snap`` raise, and
  the folded log partitions are GC'd best-effort.  This bounds read
  amplification exactly like Delta checkpoints / LSM levels: a reader
  touches one base + (S - horizon) tail partitions, never the full
  history.

Layout under ``{store_dir}/``::

    log/snap=N/   immutable changelog partitions (one per commit)
    _snapshots/   (snap INT, n_rows BIGINT, batch_id STRING) — THE
                  commit log; max(snap) is the current table version
    base_g{G}/    compacted prefix (created by compact_snapshots)
    _commits/     (seq, gen, tomb_gen) — generation manifest for the
                  base; ``tomb_gen`` carries the horizon (upto_snap)

Semantics: seq-authoritative last-writer-wins with persisted
tombstones, identical to `upsert_cdc_by_key_bucketed` — including
resurrect-after-delete when a later-seq upsert lands after a
tombstone.  Scale shape: a commit writes O(batch); an as-of read scans
base + pruned tail partitions; compaction is one bounded fold at a
cadence.  Cites the reference's ES upsert story (addReddit.py:63-64 —
O8) extended with the versioning ES lacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.ann_index import _append_commit, _fs_delete, _state, _try_read

# Log partitions are sub-partitioned by a key-hash bucket so point
# lookups prune on disk (the bucket is a pure key function — merge
# semantics never see it).  Fixed at store-creation time, like the CDC
# sink's n_buckets.
N_LOOKUP_BUCKETS = 16


def _manifest(spark: SparkSession, store_dir: str) -> DataFrame | None:
    return _try_read(spark, f"{store_dir}/_snapshots")


def current_snapshot(spark: SparkSession, store_dir: str) -> int:
    """Latest COMMITTED snapshot id (0 = empty store)."""
    m = _manifest(spark, store_dir)
    if m is None:
        return 0
    return int(m.agg(F.max("snap")).first()[0] or 0)


def _base_state(spark: SparkSession, store_dir: str) -> tuple[int, int]:
    """(generation, horizon): the committed compaction generation and
    the snapshot id it folded up to (0, 0) before any compaction."""
    gen, horizon, _ = _state(spark, store_dir)
    return gen, horizon


def snapshot_commit(
    batch_df: DataFrame,
    store_dir: str,
    key: str,
    seq_col: str,
    op_col: str = "op",
    batch_id: str | None = None,
) -> int:
    """Commit one changelog batch as the next snapshot; returns its id.
    Rows must carry ``key``, ``seq_col`` and ``op_col`` ('U' upsert /
    'D' tombstone).  With ``batch_id``, redelivery of an
    already-committed batch is a no-op (exactly-once under foreachBatch
    retries)."""
    spark = batch_df.sparkSession
    m = _manifest(spark, store_dir)
    if batch_id is not None and m is not None:
        if m.filter(F.col("batch_id") == batch_id).limit(1).count():
            return current_snapshot(spark, store_dir)
    for c in (key, seq_col, op_col):
        if c not in batch_df.columns:
            raise ValueError(f"snapshot_commit: batch is missing column {c!r}")
    snap = current_snapshot(spark, store_dir) + 1
    # a crashed previous attempt at this snap left an uncommitted dir;
    # overwrite installs the retried batch in its place.  The log
    # partition is sub-partitioned by a key-hash bucket so point
    # lookups (`snapshot_lookup`) prune on disk — the bucket is a pure
    # function of the key, so merge semantics are unchanged.
    (
        batch_df.withColumn(
            "bucket",
            F.pmod(F.xxhash64(F.col(key)), F.lit(N_LOOKUP_BUCKETS)).cast("int"),
        )
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{store_dir}/log/snap={snap}")
    )
    n = spark.read.parquet(f"{store_dir}/log/snap={snap}").count()
    # THE commit point: one single-row manifest append
    spark.createDataFrame(
        [(snap, n, batch_id)], "snap int, n_rows long, batch_id string"
    ).coalesce(1).write.mode("append").parquet(f"{store_dir}/_snapshots")
    return snap


def _merged_state(
    spark: SparkSession,
    store_dir: str,
    snap: int,
    key: str,
    seq_col: str,
    op_col: str,
) -> DataFrame:
    """All live-or-tombstone winner rows as of `snap` (tombstones kept —
    compaction persists them; readers filter)."""
    gen, horizon = _base_state(spark, store_dir)
    if snap < horizon:
        raise ValueError(
            f"read_as_of: snapshot {snap} is below the compaction horizon "
            f"{horizon} — its history was folded; retain a longer horizon "
            f"if older time travel is required"
        )
    parts = []
    if gen > 0:
        parts.append(spark.read.parquet(f"{store_dir}/base_g{gen}"))
    tail = _try_read(spark, f"{store_dir}/log")
    if tail is not None:
        parts.append(
            tail.filter((F.col("snap") > horizon) & (F.col("snap") <= snap))
        )
    if not parts:
        raise ValueError(f"read_as_of: empty store at {store_dir}")
    allrows = parts[0]
    for p in parts[1:]:
        allrows = allrows.unionByName(p)
    return _merge_rows(allrows, key, seq_col, op_col)


def _merge_rows(
    allrows: DataFrame, key: str, seq_col: str, op_col: str
) -> DataFrame:
    """SEQ-authoritative last-writer-wins over changelog rows: winner
    per key by (seq desc, snap desc, op, deterministic hash).  The seq
    ranks FIRST — a late-arriving old op committed in a LATER snapshot
    must still lose to a higher-seq row from an earlier one (the CDC
    sink's contract: an old upsert can never resurrect a deleted key);
    the snapshot id only breaks exact seq ties (a redelivered op
    re-committed verbatim resolves to the newer physical row, same
    content)."""
    payload = sorted(
        c
        for c in allrows.columns
        if c not in {key, seq_col, op_col, "snap", "bucket"}
    )
    row_hash = F.xxhash64(
        *[F.col(c) for c in [key, seq_col, op_col, *payload]]
    )
    w = Window.partitionBy(key).orderBy(
        F.col(seq_col).desc(),
        F.col("snap").desc(),
        F.col(op_col).asc(),
        row_hash.asc(),
    )
    return (
        allrows.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def read_as_of(
    spark: SparkSession,
    store_dir: str,
    snap: int | None = None,
    key: str = "id",
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """The table exactly as of snapshot ``snap`` (default: the latest
    COMMITTED snapshot).  Tombstoned keys are absent; a later-seq
    upsert after a tombstone resurrects the key (seq-authoritative,
    same contract as the CDC sink).  A ``snap`` above the committed
    maximum raises — a reproducibility read must never silently serve
    a different table version than the one requested."""
    committed = current_snapshot(spark, store_dir)
    if snap is not None and snap > committed:
        raise ValueError(
            f"read_as_of: snapshot {snap} is not committed (latest is "
            f"{committed}) — refusing to silently serve a different version"
        )
    s = committed if snap is None else snap
    merged = _merged_state(spark, store_dir, s, key, seq_col, op_col)
    return merged.filter(F.col(op_col) != "D").drop(op_col, "snap", "bucket")


def compact_snapshots(
    spark: SparkSession,
    store_dir: str,
    upto_snap: int,
    key: str = "id",
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Fold snapshots ≤ ``upto_snap`` into a fresh base generation and
    commit (one ``_commits`` append — readers atomically move to the
    new base + shorter tail).  Winner rows RETAIN their original
    (snap, seq, op) columns so later merges stay uniform; tombstones
    are kept in the base (a still-later upsert in the tail must lose to
    nothing, and redelivery-horizon GC of tombstones is a separate
    policy, as in the CDC sink).  Folded log partitions are GC'd
    best-effort — correctness never depends on it.  Returns a one-row
    (new_base_gen, horizon, n_rows) receipt."""
    committed = current_snapshot(spark, store_dir)
    if upto_snap > committed:
        raise ValueError(
            f"compact_snapshots: upto_snap {upto_snap} exceeds the committed "
            f"snapshot {committed}"
        )
    gen, horizon, seq = _state(spark, store_dir)
    if upto_snap < horizon:
        raise ValueError(
            f"compact_snapshots: upto_snap {upto_snap} is below the existing "
            f"horizon {horizon}"
        )
    folded = _merged_state(spark, store_dir, upto_snap, key, seq_col, op_col)
    new_gen = gen + 1
    # the base keeps the bucket sub-partitioning so point lookups prune
    # the compacted prefix exactly like the log tail
    folded.write.mode("overwrite").partitionBy("bucket").parquet(
        f"{store_dir}/base_g{new_gen}"
    )
    n = spark.read.parquet(f"{store_dir}/base_g{new_gen}").count()
    # THE commit: (gen, horizon) flip in one manifest append
    _append_commit(spark, store_dir, seq + 1, new_gen, upto_snap)
    # best-effort GC of the superseded base and the folded tail
    if gen > 0:
        _fs_delete(spark, f"{store_dir}/base_g{gen}")
    for s in range(horizon + 1, upto_snap + 1):
        _fs_delete(spark, f"{store_dir}/log/snap={s}")
    return spark.createDataFrame(
        [(new_gen, upto_snap, n)],
        "base_gen int, horizon int, n_rows long",
    )


def snapshot_lookup(
    spark: SparkSession,
    store_dir: str,
    keys: list[int],
    snap: int | None = None,
    key: str = "id",
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Point time-travel lookup — the serving-path read: resolve a
    (small) key batch at snapshot ``snap`` touching ONLY the bucket
    sub-partitions those keys hash into, in both the compacted base
    and the log tail (static partition pruning on the ``bucket``
    directory column; the routing collect is bounded by
    min(|keys|, N_LOOKUP_BUCKETS)).  Because the bucket is a pure key
    function, the within-bucket merge is exact — byte-identical to
    filtering a full `read_as_of` (pinned by test).  The Delta/Iceberg
    point-read story: scan cost per lookup is |buckets touched| /
    N_LOOKUP_BUCKETS of the state, regardless of table size."""
    committed = current_snapshot(spark, store_dir)
    if snap is not None and snap > committed:
        raise ValueError(
            f"snapshot_lookup: snapshot {snap} is not committed (latest is "
            f"{committed}) — refusing to silently serve a different version"
        )
    s = committed if snap is None else snap
    gen, horizon = _base_state(spark, store_dir)
    if s < horizon:
        raise ValueError(
            f"snapshot_lookup: snapshot {s} is below the compaction "
            f"horizon {horizon}"
        )
    kdf = spark.createDataFrame([(int(k),) for k in keys], f"{key} long")
    buckets = [
        r["b"]
        for r in kdf.select(
            F.pmod(F.xxhash64(F.col(key)), F.lit(N_LOOKUP_BUCKETS))
            .cast("int")
            .alias("b")
        )
        .distinct()
        .collect()
    ]
    parts = []
    if gen > 0:
        parts.append(
            spark.read.parquet(f"{store_dir}/base_g{gen}").filter(
                F.col("bucket").isin(buckets)
            )
        )
    tail = _try_read(spark, f"{store_dir}/log")
    if tail is not None:
        parts.append(
            tail.filter(
                (F.col("snap") > horizon)
                & (F.col("snap") <= s)
                & F.col("bucket").isin(buckets)
            )
        )
    if not parts:
        raise ValueError(f"snapshot_lookup: empty store at {store_dir}")
    allrows = parts[0]
    for p in parts[1:]:
        allrows = allrows.unionByName(p)
    allrows = allrows.filter(F.col(key).isin([int(k) for k in keys]))
    merged = _merge_rows(allrows, key, seq_col, op_col)
    return merged.filter(F.col(op_col) != "D").drop(op_col, "snap", "bucket")


def snapshot_fsck(
    spark: SparkSession,
    store_dir: str,
    key: str = "id",
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Store integrity audit — one row per COMMITTED snapshot:
    ``n_rows_manifest`` (what the commit recorded), ``n_rows_log``
    (what the log partition actually holds on disk), and ``n_state``
    (live keys as of that snapshot through `read_as_of`).  A truncated
    or double-written log partition shows up as a manifest/log
    mismatch; a merge regression shows up in n_state.  On a COMPACTED
    store only snapshots above the horizon are audited — the folded
    log partitions are gone by design (their history lives in the
    base, whose row count the per-commit manifest rows no longer
    describe).  Everything is read through the same resolvers probes
    use."""
    m = _manifest(spark, store_dir)
    if m is None:
        raise ValueError(f"snapshot_fsck: no manifest at {store_dir}")
    _, horizon = _base_state(spark, store_dir)
    rows = []
    for r in sorted(m.collect(), key=lambda r: r["snap"]):
        s = int(r["snap"])
        if s <= horizon:
            continue  # folded into the base; its log partition is GC'd
        n_log = spark.read.parquet(f"{store_dir}/log/snap={s}").count()
        n_state = read_as_of(spark, store_dir, s, key, seq_col, op_col).count()
        rows.append((s, int(r["n_rows"]), n_log, n_state))
    return spark.createDataFrame(
        rows,
        "snap int, n_rows_manifest long, n_rows_log long, n_state long",
    )


def snapshot_diff(
    spark: SparkSession,
    store_dir: str,
    from_snap: int,
    to_snap: int,
    key: str = "id",
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Row-level diff between two table versions — the audit question a
    versioned store exists to answer ("what changed between the corpus
    run A trained on and run B's?").  Returns one row per changed key:
    ``change`` ∈ {'added', 'deleted', 'updated'} plus ``<c>_before`` /
    ``<c>_after`` for every payload column c.  Derived entirely from
    two `read_as_of` views, so it sees exactly what readers see
    (including resurrect-after-delete, which surfaces as 'added').
    Scale shape: one full-outer join of the two states on the key —
    the canonical snapshot-diff plan (same as ann_index_version_diff's
    cell-transition matrix)."""
    a = read_as_of(spark, store_dir, from_snap, key, seq_col, op_col)
    b = read_as_of(spark, store_dir, to_snap, key, seq_col, op_col)
    payload = sorted(c for c in a.columns if c not in {key, seq_col})
    a = a.select(
        F.col(key).alias("_ka"),
        *[F.col(c).alias(f"{c}_before") for c in payload],
    )
    b = b.select(
        F.col(key).alias("_kb"),
        *[F.col(c).alias(f"{c}_after") for c in payload],
    )
    j = a.join(b, a["_ka"] == b["_kb"], "full_outer")
    changed = F.lit(False)
    for c in payload:
        changed = changed | ~(
            F.col(f"{c}_before").eqNullSafe(F.col(f"{c}_after"))
        )
    return (
        j.select(
            F.coalesce("_ka", "_kb").alias(key),
            F.when(F.col("_ka").isNull(), F.lit("added"))
            .when(F.col("_kb").isNull(), F.lit("deleted"))
            .when(changed, F.lit("updated"))
            .alias("change"),
            *[F.col(f"{c}_before") for c in payload],
            *[F.col(f"{c}_after") for c in payload],
        )
        .filter(F.col("change").isNotNull())
    )


def start_snapshot_stream(
    changelog_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    key: str = "id",
    seq_col: str = "seq",
    op_col: str = "op",
    available_now: bool = True,
):
    """Wire a changelog stream to the snapshot store: each micro-batch
    becomes ONE committed snapshot, with the Structured-Streaming
    batch_id as the exactly-once key — a redelivered batch (foreachBatch
    retry after a sink-side crash) finds its batch_id in the manifest
    and no-ops, so the snapshot history never forks or duplicates."""
    sink = lambda bdf, bid: snapshot_commit(  # noqa: E731
        bdf, store_dir, key, seq_col, op_col, batch_id=f"sb-{bid}"
    )
    writer = changelog_stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
