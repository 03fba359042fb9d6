"""Stage boundaries: persist / checkpoint between pipeline stages
(reference T2).

The reference materializes with ``persist(); count()`` after its
pre-window repartition (/root/reference/scripts/02_label_engineering.py:98-100)
to cut lineage and reuse the exchange across later actions. The
engine wraps that pattern (plus ``localCheckpoint`` for hard lineage
cuts) so pipelines state their stage boundaries explicitly.

Scale note: prefer MEMORY_AND_DISK (the default here) — at 100 TB a
memory-only persist silently recomputes on eviction, which is worse
than spilling. ``localCheckpoint`` trades fault-tolerance for speed
(blocks live only on executors); use a reliable ``checkpoint`` dir
for multi-hour jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


def stage_boundary(
    df: DataFrame,
    materialize: bool = True,
    storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """Persist a stage output; optionally force materialization now
    (the reference's ``persist(); count()`` idiom) so downstream
    actions reuse blocks instead of racing to fill the cache."""
    out = df.persist(storage_level)
    if materialize:
        out.count()
    return out


def lineage_cut(df: DataFrame, eager: bool = True) -> DataFrame:
    """Hard lineage cut via localCheckpoint — use when an iterative
    plan (e.g. repeated self-unions) would otherwise grow without
    bound."""
    return df.localCheckpoint(eager=eager)
