"""Forward-looking label engineering (reference W1 + P4/P7).

Reference semantics (/root/reference/scripts/02_label_engineering.py:106-131):
  * one row per (entity, time); window = partitionBy(entity).orderBy(time)
  * ``label = 1 if lead(flag, 1) over w == 1 else 0`` — "fails tomorrow"
  * last row per entity has lead NULL -> label 0 (otherwise(0))
  * leakage filter: drop rows where the entity is already failing today
    (``flag == 1``) so the model never sees the failure day itself.

Engine deltas from the reference:
  * order keys accept a tie-breaker (e.g. ``(ts, event_id)``) so row
    order — and therefore lead/lag — is deterministic. The reference
    orders by date alone, which is fine for daily-grain data but
    nondeterministic at finer grain.
  * no manual ``repartition(64, entity)``: Catalyst inserts the hash
    exchange the Window needs, and AQE sizes it; at 100 TB a
    hard-coded 64 would be catastrophically narrow.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def lead_label(
    df: DataFrame,
    entity: str,
    order: Sequence[str],
    flag: Column | str,
    label_name: str = "failure_next_24h",
) -> DataFrame:
    """Add a binary column: does this entity's *next* observation have
    ``flag == 1``? One hash exchange on ``entity``, one local sort."""
    flag_col = F.col(flag) if isinstance(flag, str) else flag
    w = Window.partitionBy(entity).orderBy(*order)
    return df.withColumn(
        label_name,
        F.when(F.lead(flag_col, 1).over(w) == 1, F.lit(1)).otherwise(F.lit(0)),
    )


def leakage_filter(df: DataFrame, flag: Column | str) -> DataFrame:
    """Drop rows where the entity is already failing *today*
    (reference 02_label_engineering.py:131). Must run AFTER
    ``lead_label`` so the day-before row keeps its positive label."""
    flag_col = F.col(flag) if isinstance(flag, str) else flag
    return df.filter(flag_col == 0)
