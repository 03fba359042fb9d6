"""Data sinks (reference S3/S4/S7 + T3).

The reference materializes every stage as parquet
(/root/reference/scripts/01_data_ingestion.py:26-28,
02_label_engineering.py:161-174) with tuned writer settings (snappy,
64 MB row groups, 8 MB pages — carried as session defaults in
session.py) and a ``coalesce(32)`` before writing so the output isn't
one file per shuffle partition (02:166).

Scale note: ``coalesce`` is the right pre-write shrink (narrow — no
shuffle); for SORTED or partitioned output use
``df.repartition(n, keys)`` / ``partitionBy`` instead, and let AQE
size the shuffle. File count targets ~128 MB-1 GB per file at 100 TB;
32 files is the reference's single-node number, so it's a parameter
here, not a constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    n_files: int | None = None,
    partition_by: list[str] | None = None,
) -> None:
    """Parquet sink (S3). ``n_files`` mirrors the reference's
    coalesce-pre-write (T3); ``partition_by`` adds the directory
    partitioning the reference lacks (upgrades downstream date-range
    filters from row-group skipping to partition pruning)."""
    if n_files is not None:
        df = df.coalesce(n_files)
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    n_files: int | None = None,
) -> None:
    """CSV sink (S7 — the reference exports SHAP values this way,
    05_SHAP_alert_explanation.py:164-167)."""
    if n_files is not None:
        df = df.coalesce(n_files)
    df.write.mode(mode).option("header", header).csv(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: str,
    n_buckets: int = 8,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: rows hash-partitioned into fixed
    buckets BY KEY at write time. Two tables bucketed the same way
    join WITHOUT a shuffle (the exchange disappears from the plan) —
    the pay-once-at-write layout for repeated co-located joins at
    100 TB. Requires saveAsTable (bucket metadata lives in the
    catalog)."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_by)
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table)


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """CSV source with an explicit schema — single-pass, no
    inferSchema pre-read (reference S1 minus its extra full scan,
    01_data_ingestion.py:20-21)."""
    return spark.read.option("header", True).schema(schema).csv(path)


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_by: list[str],
    n_files: int = 16,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet: attach the Morton key for
    ``zorder_by`` (functions/zorder.py), range-repartition on it so
    each output file owns a contiguous key range (= a small hyper-cube
    of the clustered dimensions), sort within partitions, drop the
    key, write. Parquet footers then carry tight min/max stats on
    EVERY clustered column, so scans with predicates on any of them
    skip most row groups — the multi-dimensional upgrade of the
    single-column sorted write."""
    from ..functions.zorder import with_zorder_key

    keyed = with_zorder_key(df, zorder_by, bits=bits)
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode(mode)
        .parquet(path)
    )


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_by: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ~target-sized files, returning the new file count. The small-file
    problem is a first-order 100 TB failure mode — a streaming or
    per-batch writer leaves thousands of KB-scale files, and every
    subsequent scan pays file-open + footer + scheduling cost per
    file (plus NameNode/object-store listing pressure). Compaction
    sizes output from the ACTUAL on-disk bytes, optionally re-sorting
    to restore clustering (min/max skipping) destroyed by
    append-order writes.

    Crash discipline: the new data is fully written to a temp dir
    before the swap, and every entry point first REPAIRS the previous
    run's leftovers (stale temp, stale backup, interrupted swap), so
    a crash at any point is recovered by simply calling again. The
    swap itself is two renames — a crash between them leaves the data
    intact under the backup name, which the repair step restores.

    Partitioned (hive-layout) directories are refused: compacting
    them as one dataset would flatten the partition directories and
    destroy pruning — run per partition directory instead."""
    import glob as _glob
    import os
    import shutil

    tmp = path.rstrip("/") + "._compacting"
    old = path.rstrip("/") + "._old"
    # repair any interrupted previous run, in dependency order
    if os.path.exists(tmp):
        shutil.rmtree(tmp)  # temp is always safe to discard
    if os.path.exists(old):
        if os.path.exists(path):
            shutil.rmtree(old)  # swap completed; backup is stale
        else:
            os.rename(old, path)  # crash mid-swap; restore backup

    entries = os.listdir(path)
    if any("=" in e for e in entries if os.path.isdir(os.path.join(path, e))):
        raise ValueError(
            f"{path} is hive-partitioned; compact each partition "
            "directory separately to preserve pruning"
        )
    files = _glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, -(-total // target_file_bytes))  # ceil
    df = spark.read.parquet(path)
    if sort_by:
        df = df.repartitionByRange(n_out, *sort_by).sortWithinPartitions(
            *sort_by
        )
    else:
        df = df.coalesce(n_out)
    df.write.mode("overwrite").parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return len(_glob.glob(os.path.join(path, "*.parquet")))


# -- Versioned snapshot table (time-travel-lite) ---------------------
#
# The capability Delta/Iceberg give a lakehouse, reduced to its
# load-bearing core on plain parquet: every write lands in an
# immutable version directory (v=N/), and a tiny JSON manifest is
# COMMITTED LAST by an atomic rename — readers either see the old
# manifest (old version) or the new one, never a half-written table.
# Reads pin a version ("time travel") or follow the manifest's
# current pointer. At 100 TB: writers never mutate live data files,
# rollback is a manifest edit, and concurrent readers are isolated
# for free — the same crash-safety discipline as compact_parquet's
# temp-then-swap, promoted to a table format.

_MANIFEST = "_manifest.json"


def _read_manifest(table_dir: str) -> dict:
    import json
    import os

    path = os.path.join(table_dir, _MANIFEST)
    if not os.path.exists(path):
        return {"current": 0, "latest": 0}
    with open(path) as f:
        return json.load(f)


def _commit_manifest(table_dir: str, manifest: dict) -> None:
    import json
    import os

    tmp = os.path.join(table_dir, f".{_MANIFEST}.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(table_dir, _MANIFEST))


def write_snapshot(
    df: DataFrame,
    table_dir: str,
    txn_app_id: str | None = None,
    txn_version: int | None = None,
) -> int:
    """Append a new immutable version of ``df`` under ``table_dir``;
    returns the new version number (0 = idempotent skip). The manifest
    flip is the commit point (os.replace — atomic on POSIX);
    ``latest`` is monotonic so a rollback never orphans committed
    versions or reuses a number. Single-writer discipline, like a
    lakehouse table without a lock service.

    Crash safety: a writer that dies after materializing ``v=N/`` but
    before the manifest flip leaves an orphaned uncommitted directory.
    The write goes to a unique temp dir first and is RENAMED into
    ``v=N`` at the last moment; if ``v=N`` already exists, the
    manifest disambiguates — ``latest < N`` means it's such an orphan
    (readers never saw it; reclaim it), ``latest >= N`` means another
    writer committed it (LOUD failure, never clobber committed data).
    A version directory present with NO manifest at all means the
    manifest was lost/deleted — also a loud failure, since everything
    on disk may be committed data.

    Exactly-once for streaming replays (the Delta txnAppId/txnVersion
    pattern): pass ``txn_app_id`` + ``txn_version`` (e.g. the
    foreachBatch ``batch_id``). The manifest records the last
    committed txn version per app id; a replayed batch with
    ``txn_version <= recorded`` is skipped, so restart-and-replay
    commits each micro-batch exactly once."""
    import glob as _g
    import os
    import shutil
    import uuid

    if (txn_app_id is None) != (txn_version is None):
        raise ValueError("txn_app_id and txn_version go together")
    os.makedirs(table_dir, exist_ok=True)
    if not os.path.exists(os.path.join(table_dir, _MANIFEST)) and _g.glob(
        os.path.join(table_dir, "v=*")
    ):
        raise RuntimeError(
            f"{table_dir} has version directories but no manifest — "
            "refusing to write into a table whose commit history is "
            "unknown (restore or remove the directory first)"
        )
    m = _read_manifest(table_dir)
    txns = dict(m.get("txns", {}))
    if txn_app_id is not None:
        last = txns.get(txn_app_id)
        if last is not None and txn_version <= last:
            return 0  # this batch already committed; replay is a no-op
        txns[txn_app_id] = txn_version
    version = m["latest"] + 1
    target = os.path.join(table_dir, f"v={version}")
    # any .tmp-* dir is uncommitted by construction (commit = rename
    # into v=N), so under single-writer discipline leftovers from
    # crashed attempts are garbage — sweep them here
    for stale in _g.glob(os.path.join(table_dir, ".tmp-v*")):
        shutil.rmtree(stale, ignore_errors=True)
    tmp = os.path.join(table_dir, f".tmp-v{version}-{uuid.uuid4().hex[:8]}")
    df.write.mode("errorifexists").parquet(tmp)
    try:
        if os.path.exists(target):
            # manifest is the source of truth: latest < version means
            # this directory was never committed (a crashed writer's
            # orphan) — reclaim it; otherwise someone committed it
            # concurrently and clobbering would destroy real data
            if _read_manifest(table_dir)["latest"] >= version:
                raise RuntimeError(
                    f"{target} was committed by a concurrent writer; "
                    "snapshot tables are single-writer"
                )
            shutil.rmtree(target)
        os.rename(tmp, target)
    except Exception:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    manifest = {"current": version, "latest": version}
    if txns:
        manifest["txns"] = txns
    _commit_manifest(table_dir, manifest)
    return version


def read_snapshot_version(table_dir: str) -> int:
    """Current committed version (0 = empty table)."""
    return int(_read_manifest(table_dir)["current"])


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read the table at ``version`` (default: current). Uncommitted
    version directories (crashed writers) are invisible because only
    the manifest names readable versions."""
    import os

    m = _read_manifest(table_dir)
    v = version if version is not None else m["current"]
    if v < 1 or v > m["latest"]:
        raise ValueError(
            f"version {v} not committed in {table_dir}"
        )
    return spark.read.parquet(os.path.join(table_dir, f"v={v}"))


def rollback_snapshot(table_dir: str, version: int) -> None:
    """Point the table back at an earlier committed version (the
    manifest flip is the whole operation — no data rewrite; every
    committed version stays pinnable)."""
    m = _read_manifest(table_dir)
    if version < 1 or version > m["latest"]:
        raise ValueError(f"cannot roll back to version {version}")
    m["current"] = version  # keep latest AND the txn ledger intact
    _commit_manifest(table_dir, m)


def vacuum_snapshots(table_dir: str, keep_last: int = 2) -> list[int]:
    """Delete data for all committed versions older than the newest
    ``keep_last``, EXCEPT the current pointer (a rolled-back current
    is never vacuumed away). Returns the removed version numbers.
    Metadata (`latest`) is untouched, so version numbers are never
    reused after a vacuum."""
    import os
    import shutil

    m = _read_manifest(table_dir)
    keep_floor = m["latest"] - keep_last + 1
    removed = []
    for v in range(1, max(keep_floor, 1)):
        if v == m["current"]:
            continue
        d = os.path.join(table_dir, f"v={v}")
        if os.path.isdir(d):
            shutil.rmtree(d)
            removed.append(v)
    return removed


def write_parquet_observed(
    df: DataFrame, path: str, observations: dict[str, "object"]
) -> dict:
    """Write parquet while collecting named metrics IN THE SAME
    ACTION via Spark's Observation API — row counts, null rates,
    sums arrive with the write, no second scan. This is how a 100 TB
    pipeline gets its data-quality ledger for free: the metrics ride
    the existing pass instead of re-reading the output. Returns
    {name: value}. ``observations`` maps metric name -> aggregate
    Column."""
    from pyspark.sql import Observation

    obs = Observation("write_metrics")
    cols = [c.alias(name) for name, c in observations.items()]
    df.observe(obs, *cols).write.mode("overwrite").parquet(path)
    return dict(obs.get)
