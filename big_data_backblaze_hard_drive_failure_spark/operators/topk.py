"""Per-group top-k — the reference's acknowledged missing operator
("Top-K/day alert budget", /root/reference/readme.md:205-208).

Implemented as the idiomatic Spark pattern: window rank + filter.
Catalyst turns this into one hash exchange on the group key plus a
local sort; with AQE the exchange width tracks data size. For k << n
Spark 3.5+/4.x also applies a rank-limit pushdown (WindowGroupLimit)
so each partition keeps only k rows before the final filter — this is
what makes the operator viable at 100 TB (no full materialization of
the sorted groups).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_name: str = "rank",
    keep_rank: bool = True,
) -> DataFrame:
    """Top ``k`` rows per group. ``order`` must include a unique
    tie-breaker column for deterministic (oracle-checkable) output."""
    w = Window.partitionBy(*group).orderBy(*order)
    out = df.withColumn(rank_name, F.row_number().over(w)).filter(
        F.col(rank_name) <= k
    )
    return out if keep_rank else out.drop(rank_name)
