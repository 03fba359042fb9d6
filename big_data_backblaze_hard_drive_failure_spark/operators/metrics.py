"""Operational alert metrics (reference M7-M9).

The reference computes its confusion matrix as FOUR separate filtered
``count()`` jobs (/root/reference/scripts/06_deployment_code.py:147-162)
— four full scans of the scored table. The engine computes the same
cells in ONE pass with ``groupBy(alert, target).count()``: a single
scan, map-side partial aggregation, and a 4-row result. At 100 TB
that is a 4x scan reduction.

``alerts_per_day`` / ``avg_alerts_per_day`` mirror
06_deployment_code.py:177-184 (A2 + A3 two-level aggregate chain).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def alert_decision(score: Column | str, threshold: float) -> Column:
    """``alert = 1 if p >= threshold`` (reference M7, 06:137-140)."""
    s = F.col(score) if isinstance(score, str) else score
    return F.when(s >= threshold, F.lit(1)).otherwise(F.lit(0))


def confusion_matrix(
    df: DataFrame, alert: Column | str, target: Column | str
) -> DataFrame:
    """Single-pass confusion counts: columns (alert, target, n)."""
    a = F.col(alert) if isinstance(alert, str) else alert
    t = F.col(target) if isinstance(target, str) else target
    return (
        df.groupBy(a.alias("alert"), t.alias("target"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def operational_summary(cm_rows: list) -> dict[str, float]:
    """Driver-side recall/precision from the 4-row confusion matrix
    (replaces the reference's python float arithmetic, 06:167-175)."""
    cells = {(r["alert"], r["target"]): r["n"] for r in cm_rows}
    tp = cells.get((1, 1), 0)
    fp = cells.get((1, 0), 0)
    fn = cells.get((0, 1), 0)
    recall = tp / (tp + fn) if (tp + fn) else 0.0
    precision = tp / (tp + fp) if (tp + fp) else 0.0
    return {"tp": tp, "fp": fp, "fn": fn, "recall": recall, "precision": precision}


def alerts_per_day(df: DataFrame, time_col: str, alert: str) -> DataFrame:
    """Per-calendar-day alert volume (reference A2, 06:179-182)."""
    return (
        df.groupBy(F.to_date(time_col).alias("day"))
        .agg(F.sum(alert).alias("alerts"))
    )


def avg_alerts_per_day(df: DataFrame, time_col: str, alert: str) -> DataFrame:
    """Grand mean of the daily alert counts (reference A3, 06:183)."""
    return alerts_per_day(df, time_col, alert).agg(
        F.avg("alerts").alias("avg_alerts_per_day")
    )
