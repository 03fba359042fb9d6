"""Distributed global prefix sum (running total over a total order).

[beyond-reference] The reference never needs a corpus-wide running
total (its rolling windows are per-drive —
/root/reference/scripts/03_feature_engineering.py:90-143). At
engine scale the naive Spark spelling,

    F.sum(v).over(Window.orderBy(key))        # NO partitionBy

is a correctness-preserving but scale-fatal plan: an unpartitioned
window collapses the whole frame into ONE task (Spark even warns
``No Partition Defined for Window operation``). At 100 TB that task
is the job.

This module implements the classic two-level scan instead:

1. assign every row an order-preserving BUCKET id: K-1 split points
   over the first order key, computed once by a bounded
   ``percentile_approx`` aggregate and embedded as LITERALS (K ~ the
   shuffle width — a driver-side list of doubles, not data);
2. per-bucket running totals — a window PARTITIONED BY the bucket id
   (one hash exchange), so each task scans only its own slice;
3. a K-row aggregate of per-bucket totals, turned into exclusive
   offsets by a window over those K rows (trivially single-task at
   any data scale: K ~ thousands);
4. broadcast-join the offsets back and add.

Cost: one bounded boundary aggregate + one hash exchange + one
map-side pass + one K-row side plan — the same shape MPP engines use
for ORDER BY running totals, with the boundary table materialized the
way they materialize it.

Why literal boundaries instead of ``repartitionByRange`` +
``spark_partition_id()`` (the previous spelling): the data branch and
the offsets branch BOTH contain the bucketing step, and the algorithm
is only correct when both see identical bucket assignment. Spark's
range partitioner samples its boundaries with an rdd.id-seeded RNG at
exchange EXECUTION time, so the old form was correct only while AQE
stage reuse executed that exchange once — a plan-shape perturbation
that broke reuse silently corrupted the running totals (caught by the
oracle-parity gate). Boundaries materialized ONCE as literals make
both branches identical BY CONSTRUCTION: reuse is now purely a
performance optimization, never a correctness requirement. A welcome
side effect: rows that tie on the first key can never be split across
buckets (sampled range partitioning could split them).

Determinism requirement: the order key must still be UNIQUE per row —
rows that compare equal under the full ``order_by`` have
nondeterministic relative order inside the local window, making their
running totals nondeterministic. Callers with duplicate keys should
pre-aggregate per key (the usual case: a distinct-value frame) or
extend the key with a unique tie-breaker.

The first order key must be numeric (percentile boundaries); every
caller's leading key is a score/count/cents column. NULL keys bucket
to 0 and NaN doubles to the last bucket, matching Spark's ASC
NULLS-FIRST / NaN-greatest window order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# historical name: this is now a deterministic bucket id, not a
# physical partition id, but it still plays the "pid" role in plans
_PID = "__prefix_pid"
_LOCAL = "__prefix_local"
_OFFSET = "__prefix_offset"
_GUARD = "__prefix_guard"

# percentile_approx accuracy for the boundary aggregate: boundary
# placement only affects BALANCE, never correctness, so a cheap
# coarse sketch is the right trade — at accuracy A the rank error is
# ~n/A, i.e. bucket sizes off by ~n/500 per boundary, noise next to
# the n/K bucket size itself for any realistic K
_BOUNDS_ACCURACY = 500

# (semanticHash, key, k) -> tuple of split points; see use site
_BOUNDS_MEMO: dict = {}


def global_prefix_sum(
    df: DataFrame,
    order_by: Sequence[str],
    value_col: str,
    out_col: str = "running_total",
    n_partitions: int | None = None,
    exclusive: bool = False,
) -> DataFrame:
    """Add ``out_col`` = running sum of ``value_col`` over the total
    order given by ``order_by`` (ascending, keys must be unique per
    row — see module docstring) without ever forming an unpartitioned
    window over the data.

    ``exclusive=True`` yields the sum of strictly-preceding rows
    (starts at 0), the form rank statistics want.
    """
    return global_prefix_sums(
        df,
        order_by,
        {out_col: value_col},
        n_partitions=n_partitions,
        exclusive=exclusive,
    )


def global_prefix_sums(
    df: DataFrame,
    order_by: Sequence[str],
    sums: dict[str, str],
    n_partitions: int | None = None,
    exclusive: bool = False,
) -> DataFrame:
    """Multi-column form of :func:`global_prefix_sum`: every
    ``out_col: value_col`` pair in ``sums`` gets its running total over
    the SAME total order, sharing one bucket assignment, one hash
    exchange, one per-bucket scan, and one K-row offset table (a
    second independent prefix-sum pass would repeat all of it — the
    exact waste a rank statistic like a PR curve, which needs both a
    running count and a running positive count, must avoid).

    ``n_partitions`` bounds the bucket count (default: the session's
    shuffle width)."""
    if not sums:
        raise ValueError("sums must map at least one out_col: value_col")
    key0 = order_by[0]
    k = n_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    # bounded materialization: K-1 split points, a driver-side list of
    # scalars (the IVF-fit / MMR bounded-collect discipline). Embedding
    # them as literals makes bucket assignment identical in EVERY
    # branch that recomputes it — correctness no longer depends on
    # exchange reuse (see module docstring). Memoized per semantic
    # plan (the BRP-LSH fit-memoization pattern): repeated builds of
    # the same query skip the boundary job, and a stale/collided memo
    # entry can only cost BALANCE, never correctness, because whatever
    # bounds are used are applied as the same literals everywhere.
    bounds: list = []
    if k > 1:
        memo_key = (df.semanticHash(), key0, k)
        cached = _BOUNDS_MEMO.get(memo_key)
        if cached is not None:
            bounds = list(cached)
        else:
            probs = [i / k for i in range(1, k)]
            row = df.agg(
                F.percentile_approx(key0, probs, _BOUNDS_ACCURACY).alias("b")
            ).first()
            raw = row["b"] if row is not None else None
            seen = set()
            for b in raw or []:
                if b is not None and b not in seen:
                    seen.add(b)
                    bounds.append(b)
            bounds.sort()
            if len(_BOUNDS_MEMO) > 256:
                _BOUNDS_MEMO.clear()
            _BOUNDS_MEMO[memo_key] = tuple(bounds)
    if bounds:
        # count of boundaries strictly below the key as a BINARY
        # SEARCH tree of CASE WHEN over the sorted literals:
        # O(log K) comparisons per row (a linear K-term chain is an
        # O(K) hot-path cost once K is in the thousands), plain
        # expressions only (not array+filter: a higher-order
        # function's lambda variables don't canonicalize cleanly,
        # which would break branch reuse below). Monotone in the key,
        # ties share a bucket, NULL key -> 0 (NULLS FIRST: the NULL
        # comparison falls through every ELSE to the leftmost leaf),
        # NaN -> len(bounds) (Spark orders NaN greatest, and NaN > b
        # is true for every bound).
        #
        # Round 14 (guide §1/driver cost): the tree is generated as
        # ONE SQL string parsed by a single F.expr() call. The
        # previous F.when/F.otherwise spelling issued ~4 py4j
        # round-trips per tree node — ~250 ms of driver-side socket
        # chatter per prefix call at K=32 (profiled on
        # mlops_kaplan_meier, whose two prefix passes spent 0.5 s of
        # a 1.2 s plan build here); the parsed CaseWhen tree is
        # expression-identical, so canonicalization (and the branch
        # reuse it enables) is unchanged. Literal formatting is
        # exact: repr(float) is the shortest round-trip form and the
        # `D` suffix parses it as DOUBLE bit-identically (verified);
        # ints take `L` (bigint). Non-finite bounds (inf from an
        # inf-valued key column) fall back to the Column spelling —
        # SQL has no inf literal.
        def _fmt(b) -> str | None:
            if isinstance(b, bool):  # bool is int's subclass; reject
                return None
            if isinstance(b, int):
                return f"{b}L"
            if isinstance(b, float):
                import math

                return f"{b!r}D" if math.isfinite(b) else None
            return None

        lits = [_fmt(b) for b in bounds]
        key_sql = f"`{key0}`"

        from .staging import ab_off

        if not ab_off("prefix_sql_tree") and all(
            s is not None for s in lits
        ):

            def _tree_sql(lo: int, hi: int) -> str:
                # bucket index for keys known to land in [lo, hi]
                if lo == hi:
                    return str(lo)
                mid = (lo + hi) // 2
                return (
                    f"CASE WHEN {key_sql} > {lits[mid]} "
                    f"THEN {_tree_sql(mid + 1, hi)} "
                    f"ELSE {_tree_sql(lo, mid)} END"
                )

            bucket = F.expr(_tree_sql(0, len(bounds)))
        else:

            def _tree(lo: int, hi: int):
                if lo == hi:
                    return F.lit(lo)
                mid = (lo + hi) // 2
                return F.when(
                    F.col(key0) > F.lit(bounds[mid]), _tree(mid + 1, hi)
                ).otherwise(_tree(lo, mid))

            bucket = _tree(0, len(bounds))
    else:
        bucket = F.lit(0)

    # Exchange on the bucket EXPRESSION over the raw frame, then the
    # pid column is (re)computed ABOVE the exchange behind a
    # constant-zero spark_partition_id() barrier. The barrier's
    # nondeterministic flag stops Catalyst pushing column pruning down
    # through this projection, so the data branch and the K-row
    # offsets branch keep byte-identical subtrees under the exchange
    # and AQE executes the shuffle ONCE (without it, pruning
    # specializes each branch's child, the exchanges stop
    # canonicalizing equal, and the offsets branch re-scans the whole
    # input — measured 2-3x). This is exactly the barrier the old
    # repartitionByRange + spark_partition_id spelling enjoyed — minus
    # its fatal property that the VALUE was execution-dependent: here
    # the bucket id is literal-deterministic, so even if reuse ever
    # fails both branches still agree and the result is correct, just
    # slower. Reuse is performance, never correctness. (rand() would
    # not work as the barrier: its instances canonicalize UNEQUAL
    # after the self-join's attribute dedup.)
    # _PID is a PURE alias of the bucket expression so the exchange's
    # hash(bucket) partitioning propagates through the projection as
    # hash(_PID) (alias-transparent) and the window adds NO second
    # shuffle; the nondeterministic guard lives in its own throwaway
    # column of the same projection.
    ranged = df.repartition(k, bucket)
    bucketed = ranged.select(
        "*",
        bucket.alias(_PID),
        (F.spark_partition_id() * 0).alias(_GUARD),
    )

    local_w = (
        Window.partitionBy(_PID)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # all locals share local_w -> Catalyst folds them into ONE Window
    with_local = bucketed.select(
        "*",
        *[
            F.sum(val).over(local_w).alias(f"{_LOCAL}_{out}")
            for out, val in sums.items()
        ],
    )

    # K rows (one per bucket) -> exclusive offsets. The window below
    # is unpartitioned BY DESIGN: its input is the K-row per-bucket
    # total frame, not the data.
    totals = with_local.groupBy(_PID).agg(
        *[F.sum(val).alias(f"__pt_{out}") for out, val in sums.items()]
    )
    offs_w = Window.orderBy(_PID).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        _PID,
        *[
            F.coalesce(F.sum(f"__pt_{out}").over(offs_w), F.lit(0)).alias(
                f"{_OFFSET}_{out}"
            )
            for out in sums
        ],
    )

    out_df = with_local.join(F.broadcast(offsets), _PID)
    for out, val in sums.items():
        shift = F.col(val) if exclusive else F.lit(0)
        out_df = out_df.withColumn(
            out, F.col(f"{_LOCAL}_{out}") + F.col(f"{_OFFSET}_{out}") - shift
        )
    return out_df.drop(
        _PID,
        _GUARD,
        *[f"{_LOCAL}_{out}" for out in sums],
        *[f"{_OFFSET}_{out}" for out in sums],
    )
