"""Backward-looking rolling-window feature engineering (reference W2-W7).

Reference semantics (/root/reference/scripts/03_feature_engineering.py:90-154):
  * per-entity time-ordered window; frames are ROW-based
    (``rowsBetween(-6, 0)`` = last 7 *observations*, not 7 calendar
    days — preserved deliberately, see 03:86-88 comments)
  * per metric: 7-row mean, 14-row mean, 7-row sample stddev, 7-row
    max, 1-row lag delta
  * ``row_number()`` as in-dataset entity age
  * ``fillna(0)`` for early-life NULLs (single-row stddev, first-row
    lag) — never forward-fill (03:149-152)

All expressions share one window partition/order, so Spark evaluates
the whole feature block in a single Window exec after a single hash
exchange — the plan shape the reference hand-built with
``repartition(64, serial_number)`` (03:74-78), minus the hard-coded
width. At 100 TB the exchange is sized by AQE instead.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rolling_feature_columns(
    metrics: Sequence[str],
    entity: str,
    order: Sequence[str],
    windows: Sequence[int] = (7, 14),
) -> dict[str, Column]:
    """Build the reference's feature expressions for each metric,
    matching the reference's column naming (``_mean_``, see
    03_feature_engineering.py:108-119): ``{metric}_mean_{n}d`` for
    EACH n in ``windows``, plus ``{metric}_std_{w0}d`` /
    ``{metric}_max_{w0}d`` over the SHORTEST window and
    ``{metric}_delta_1d``. All frames and suffixes derive from
    ``windows`` — non-default windows like (30, 90) produce 30-row
    std/max frames named accordingly."""
    w = Window.partitionBy(entity).orderBy(*order)
    w0 = min(windows)
    out: dict[str, Column] = {}
    for m in metrics:
        for n in windows:
            out[f"{m}_mean_{n}d"] = F.avg(m).over(w.rowsBetween(-(n - 1), 0))
        out[f"{m}_std_{w0}d"] = F.stddev(m).over(w.rowsBetween(-(w0 - 1), 0))
        out[f"{m}_max_{w0}d"] = F.max(m).over(w.rowsBetween(-(w0 - 1), 0))
        out[f"{m}_delta_1d"] = F.col(m) - F.lag(m, 1).over(w)
    return out


def add_rolling_features(
    df: DataFrame,
    metrics: Sequence[str],
    entity: str,
    order: Sequence[str],
    windows: Sequence[int] = (7, 14),
    fill: float | None = 0.0,
) -> DataFrame:
    """Attach all rolling features; ``fill`` mirrors the reference's
    ``fillna(0)`` over early-life NULLs (03:154)."""
    cols = rolling_feature_columns(metrics, entity, order, windows)
    df = df.withColumns(cols)
    if fill is not None:
        df = df.na.fill(fill, subset=list(cols))
    return df


def add_drive_age(
    df: DataFrame,
    entity: str,
    order: Sequence[str],
    name: str = "drive_age_days",
) -> DataFrame:
    """``row_number()`` age within the dataset (reference W7,
    03_feature_engineering.py:140-143)."""
    w = Window.partitionBy(entity).orderBy(*order)
    return df.withColumn(name, F.row_number().over(w))
