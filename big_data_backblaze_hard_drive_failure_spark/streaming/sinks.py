"""Production streaming sinks: foreachBatch with idempotent writes.

``foreachBatch`` is the standard production sink when the target needs
batch-only capabilities (dedup-before-write, overwrite-by-partition,
JDBC upsert): each micro-batch arrives as a regular DataFrame plus a
monotonically increasing ``batch_id``. Exactly-once discipline comes
from IDEMPOTENT writes keyed by that batch id — on restart-and-replay
the same batch id overwrites its own previous (possibly partial)
output instead of duplicating it. That is the pattern here: every
micro-batch lands in ``batch_id=<n>/`` via dynamic partition
overwrite, so replays converge to the same files.

Scale: the per-batch DataFrame is distributed like any other; the
dedup inside the batch is a normal shuffle bounded by batch size, and
the write parallelism is the batch's partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def foreach_batch_parquet_dedup(target_dir: str, key: str):
    """Returns the foreachBatch callback: dedup each micro-batch on
    ``key`` (keep the first row by key — deterministic via min struct)
    and write it idempotently under ``batch_id=<n>``."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        deduped = (
            batch_df.groupBy(key)
            .agg(
                F.min(
                    F.struct(*[c for c in batch_df.columns if c != key])
                ).alias("_row")
            )
            .select(key, "_row.*")
        )
        (
            deduped.write.mode("overwrite")
            .parquet(f"{target_dir}/batch_id={batch_id}")
        )

    return _write


def foreach_batch_snapshot(table_dir: str, app_id: str):
    """Returns the foreachBatch callback committing each micro-batch
    as a new version of the snapshot table, exactly once: the
    ``batch_id`` is recorded in the table manifest as
    (``app_id``, txn_version), so a restarted query replaying an
    already-committed batch is a no-op instead of a duplicate version
    (the Delta txnAppId/txnVersion pattern).

    ``app_id`` is REQUIRED and must be (a) stable across restarts of
    the same logical stream — it is the replay-dedup key — and (b)
    unique per logical stream writing to this table: two pipelines
    sharing an app_id would dedup against EACH OTHER's batch ids and
    silently drop data. Same rule as Delta's txnAppId, including the
    corollary: if a stream's checkpoint is deleted (its batch ids
    restart at 0), a FRESH app_id must be chosen, because a skipped
    replay is indistinguishable from a collision at this layer — a
    replayed batch 0 is perfectly normal when a query crashed between
    the batch-0 commit and the checkpoint advance. Skips are logged to
    stderr so a misconfigured pipeline is at least visible in the
    query logs."""
    import sys

    from ..sources.sinks import write_snapshot

    def _commit(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        version = write_snapshot(
            batch_df, table_dir, txn_app_id=app_id, txn_version=batch_id
        )
        if version == 0:
            print(
                f"snapshot sink {table_dir!r}: replayed batch "
                f"{batch_id} for app_id {app_id!r} skipped "
                "(already committed)",
                file=sys.stderr,
            )

    return _commit
