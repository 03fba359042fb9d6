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

import threading
from collections import OrderedDict

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

# Live staged frames, oldest first. Spark's ContextCleaner frees
# weakly-referenced RDDs/broadcasts but NOT SQL CacheManager entries —
# a persisted DataFrame's InMemoryRelation is held until an explicit
# unpersist() or session shutdown. A long-lived session that builds
# staged plans over many inputs (daily partitions, per-round fixture
# dirs) would therefore grow executor storage without bound. This
# bounded LRU caps the number of simultaneously-live stage caches:
# past the cap the oldest is unpersisted (safe — later actions on it
# just recompute). Sized to comfortably hold every staged frame a
# single query plan needs, times a few concurrent queries.
_LIVE_STAGED: "OrderedDict[int, DataFrame]" = OrderedDict()
_MAX_LIVE_STAGED = 32
_STAGED_LOCK = threading.Lock()  # concurrent query builds share the dict


def stage_boundary(
    df: DataFrame,
    materialize: bool = True,
    storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """Persist a stage output; optionally force materialization now
    (the reference's ``persist(); count()`` idiom) so downstream
    actions reuse blocks instead of racing to fill the cache.

    Every staged frame is tracked in a bounded LRU; beyond
    ``_MAX_LIVE_STAGED`` the oldest cache is dropped so repeated
    query builds over new inputs can't leak executor storage.

    The LRU is keyed by the frame's SEMANTIC hash, not object
    identity: Spark's CacheManager deduplicates by plan, so two
    builds of the same query yield distinct Python objects sharing
    ONE cache entry — under id() keys the older twin's eviction
    unpersisted that shared entry out from under the newer build
    (observed as an order-dependent rescan-budget failure: the
    staged frame silently fell back to raw scans mid-session, with
    'Asked to cache already cached data' as the tell). Re-staging an
    equal plan now refreshes recency instead of planting a second
    entry whose eviction kills the cache."""
    out = df.persist(storage_level)
    if materialize:
        out.count()
    try:
        key = out.semanticHash()
    except Exception:  # pragma: no cover - fallback for exotic frames
        key = id(out)
    evicted = []
    with _STAGED_LOCK:
        # semanticHash is 32-bit: on a collision between two genuinely
        # different plans, silently replacing the dict value would
        # strand the displaced frame's cache outside both LRU eviction
        # and release_stage_boundaries — the exact leak this LRU
        # exists to prevent. Detect the collision with sameSemantics
        # and unpersist the displaced frame.
        displaced = _LIVE_STAGED.get(key)
        if displaced is not None:
            try:
                collision = not displaced.sameSemantics(out)
            except Exception:  # pragma: no cover - exotic frames
                collision = False  # can't compare: keep prior behavior
            if collision:
                evicted.append(displaced)
        _LIVE_STAGED[key] = out
        # True LRU: refresh recency on re-stage of a live frame
        # (OrderedDict assignment to an existing key keeps its slot).
        _LIVE_STAGED.move_to_end(key)
        while len(_LIVE_STAGED) > _MAX_LIVE_STAGED:
            _, oldest = _LIVE_STAGED.popitem(last=False)
            evicted.append(oldest)
    for frame in evicted:  # unpersist outside the lock (RPC call)
        frame.unpersist(blocking=False)
    return out


def release_stage_boundaries() -> int:
    """Unpersist every live staged frame (e.g. between bench queries
    or at pipeline teardown). Returns the number released."""
    with _STAGED_LOCK:
        frames = list(_LIVE_STAGED.values())
        _LIVE_STAGED.clear()
    for frame in frames:
        frame.unpersist(blocking=False)
    return len(frames)


def ab_off(site: str) -> bool:
    """Round-14 interleaved A/B instrument: returns True when ``site``
    is listed in ``$SPARK_GRAFT_AB_OFF`` (comma-separated), telling the
    touched query to take its PRE-change plan. Lets one session flip a
    single optimization on/off between consecutive runs — the only
    change evidence this host's ±30% session drift accepts. Default
    (unset) is the optimized plan; LOSING variants were deleted at
    round end, while each kept site retains its toggle so the
    committed A/B numbers stay reproducible (and as a production
    escape hatch, like SPARK_GRAFT_NO_FANOUT)."""
    import os

    return site in os.environ.get("SPARK_GRAFT_AB_OFF", "").split(",")


def lineage_cut(df: DataFrame, eager: bool = True) -> DataFrame:
    """Hard lineage cut via localCheckpoint — use when an iterative
    plan (e.g. repeated self-unions) would otherwise grow without
    bound."""
    return df.localCheckpoint(eager=eager)
