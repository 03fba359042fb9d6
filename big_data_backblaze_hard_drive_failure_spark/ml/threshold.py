"""Recall-targeted alert-threshold selection (reference M6).

The reference collects the positive-class scores to the driver, sorts
descending with numpy and indexes at ``floor(n_pos * recall)``
(/root/reference/scripts/05_01_model_training_xgboost_oom_fix.py:227-237),
persisting the result to models/threshold.json. That collect is fine at
250 positives but is a driver OOM at scale.

Spark-native twin: choosing the score that keeps ``recall`` of the
positives above it is exactly the ``(1 - recall)`` quantile of the
positive-score distribution — one aggregate over a filtered scan, no
driver collect. ``percentile`` (exact, linear interpolation) matches
DuckDB's ``quantile_cont`` definition, so the selection is
oracle-checkable. At 100 TB positives are rare (~0.005% per
readme.md:15), so the exact percentile's per-group sort is tiny; for
dense score columns swap in ``approx_percentile`` with a bounded
error — same call shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def threshold_at_recall(
    scored: DataFrame,
    score: str,
    label: Column | str,
    recall: float = 0.8,
    exact: bool = True,
) -> DataFrame:
    """1-row DataFrame ``(threshold, n_pos)``: alerting at
    ``score >= threshold`` captures ~``recall`` of positives."""
    lab = F.col(label) if isinstance(label, str) else label
    q = 1.0 - recall
    fn = "percentile" if exact else "approx_percentile"
    return scored.filter(lab == 1).agg(
        F.expr(f"{fn}({score}, {q!r})").alias("threshold"),
        F.count(F.lit(1)).alias("n_pos"),
    )
