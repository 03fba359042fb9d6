"""Latest-wins merge/upsert (CDC apply) — MERGE INTO, Spark-first.

Applying a change stream (inserts + updates + deletes) to a base
table is the storage-management operation every long-lived 100 TB
dataset needs. Without a transactional table format the scalable
batch expression is: union the base snapshot with the change set,
rank each key's rows by (version, change-set-wins) and keep rank 1,
then drop rows whose winner is a tombstone. One shuffle on the key —
the same cost as any keyed groupBy — and no driver-side state.

Scale notes:
  * the window is ``partitionBy(keys)`` — AQE splits skewed keys;
  * if base and updates are both bucketed by the key
    (``sources/sinks.py:write_bucketed_table``) the shuffle
    disappears entirely;
  * ties (same version in base and updates) resolve to the CHANGE
    SET deterministically via the ``_src`` rank column, so replaying
    the same merge is idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    version_cols: list[str],
    tombstone: str | None = None,
) -> DataFrame:
    """Apply ``updates`` over ``base``: per key keep the row with the
    highest ``version_cols`` (updates beat base on ties); if
    ``tombstone`` names a boolean column, keys whose winning row has
    it TRUE are deleted from the result.

    Contract: the CHANGE SET must not carry two rows for the same
    (key, version) — the rank between them would be arbitrary. CDC
    feeds satisfy this by construction (version = change LSN /
    commit timestamp); pre-dedup the feed if yours doesn't."""
    tagged = base.withColumn("_src", F.lit(0)).unionByName(
        updates.withColumn("_src", F.lit(1))
    )
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in version_cols], F.col("_src").desc()
    )
    out = (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )
    if tombstone is not None:
        # NULL tombstone (e.g. a base snapshot that never tracked
        # deletes) means NOT deleted — a bare ~col would drop it
        out = out.filter(~F.coalesce(F.col(tombstone), F.lit(False)))
    return out
