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
    with_local = ranged.withColumn(_LOCAL, F.sum(value_col).over(local_w))

    # K rows (one per range partition) -> exclusive offsets. The
    # window below is unpartitioned BY DESIGN: its input is the K-row
    # per-partition total frame, not the data.
    totals = with_local.groupBy(_PID).agg(
        F.sum(value_col).alias("__part_total")
    )
    offs_w = Window.orderBy(_PID).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        _PID,
        F.coalesce(F.sum("__part_total").over(offs_w), F.lit(0)).alias(
            _OFFSET
        ),
    )

    shift = F.col(value_col) if exclusive else F.lit(0)
    return (
        with_local.join(F.broadcast(offsets), _PID)
        .withColumn(out_col, F.col(_LOCAL) + F.col(_OFFSET) - shift)
        .drop(_PID, _LOCAL, _OFFSET)
    )
