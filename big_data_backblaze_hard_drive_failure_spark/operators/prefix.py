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

1. range-shuffle the rows by the order key (``repartitionByRange``)
   so partition *i* holds a contiguous key range, every key < every
   key of partition *i+1*;
2. per-partition running totals — a window PARTITIONED BY
   ``spark_partition_id()``, so each task scans only its own slice;
3. a K-row aggregate (K = number of range partitions) of per-partition
   totals, turned into exclusive offsets by a window over those K rows
   (trivially single-task at any data scale: K ~ thousands);
4. broadcast-join the offsets back and add.

Cost: one range exchange + one map-side pass + one K-row side plan —
the same shape MPP engines use for ORDER BY running totals.

Determinism requirement: the order key must be UNIQUE per row
(``repartitionByRange`` boundaries are sampled, so rows that compare
equal may land in different partitions, making their relative order —
and thus their running totals — nondeterministic). Callers with
duplicate keys should pre-aggregate per key (the usual case: a
distinct-value frame) or extend the key with a unique tie-breaker.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__prefix_pid"
_LOCAL = "__prefix_local"
_OFFSET = "__prefix_offset"


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
    the SAME total order, sharing one range exchange, one
    per-partition scan, and one K-row offset table (a second
    independent prefix-sum pass would repeat the exchange — the exact
    waste a rank statistic like a PR curve, which needs both a running
    count and a running positive count, must avoid)."""
    if not sums:
        raise ValueError("sums must map at least one out_col: value_col")
    # CORRECTNESS COUPLING, do not "simplify": the data branch and the
    # K-row offsets branch below both contain this range exchange, and
    # the algorithm is only correct when both see the SAME partition
    # boundaries. Spark's range partitioner samples boundaries with a
    # seed derived from the exchange RDD's id, so two independently
    # executed exchanges may split ranges differently — offsets would
    # then be added against the wrong slices. The number-less
    # REPARTITION_BY_COL form canonicalizes both branches identically
    # and AQE's stage cache executes the exchange ONCE (ReusedExchange
    # — pinned by tests/test_operators.py's shares-one-pass plan
    # assertions); forcing an explicit count here (REPARTITION_BY_NUM)
    # was observed to BREAK that reuse in real query contexts and
    # silently corrupt rank statistics (caught by the oracle-parity
    # gate). Callers passing n_partitions keep the explicit form —
    # their tests pin reuse explicitly.
    ranged = (
        df.repartitionByRange(n_partitions, *order_by)
        if n_partitions
        else df.repartitionByRange(*order_by)
    ).withColumn(_PID, F.spark_partition_id())

    local_w = (
        Window.partitionBy(_PID)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # all locals share local_w -> Catalyst folds them into ONE Window
    with_local = ranged.select(
        "*",
        *[
            F.sum(val).over(local_w).alias(f"{_LOCAL}_{out}")
            for out, val in sums.items()
        ],
    )

    # K rows (one per range partition) -> exclusive offsets. The
    # window below is unpartitioned BY DESIGN: its input is the K-row
    # per-partition total frame, not the data.
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
        *[f"{_LOCAL}_{out}" for out in sums],
        *[f"{_OFFSET}_{out}" for out in sums],
    )
