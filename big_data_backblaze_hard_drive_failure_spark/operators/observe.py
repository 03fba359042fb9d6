"""In-flight pipeline metrics via ``df.observe`` (zero extra passes).

The reference audits its stages with separate ``count()`` jobs
(/root/reference/scripts/02_label_engineering.py:98-100,
06_deployment_code.py:147-160) — each a full re-execution of the
plan. Spark's Observation API attaches aggregate metrics to the ONE
action that already runs: the metrics ride along with the job, cost
nothing extra, and are exact (unlike accumulators, which double-count
on task retries). This is the scale-correct way to get "rows in /
alerts out" from a 100 TB pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_alert_metrics(
    scored: DataFrame, score: str, threshold: float
) -> tuple[DataFrame, Observation]:
    """Attach (n_rows, n_alerts, sum_score) metrics to the scored
    frame. Read ``observation.get`` AFTER an action has run the
    returned DataFrame."""
    obs = Observation("alert_metrics")
    out = scored.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col(score) >= threshold, 1).otherwise(0)
        ).alias("n_alerts"),
        F.sum(score).alias("sum_score"),
    )
    return out, obs
