"""The reference's full 8-script pipeline as one engine run.

Mirrors /root/reference/scripts/01..06 stage-for-stage on the events
fixture (drive-day telemetry ~ user-event telemetry, FIXTURES.md §3):

  01 ingestion        explicit-schema scan -> parquet stage (S1-S4)
  02 label eng.       lead() label + leakage filter (W1, P4)
  03 feature eng.     rolling mean/std/max, delta, age, fillna (W2-W7, P8)
  04 training prep    chronological split + 100:1 downsample (M1, M2)
  05 training         distributed MLlib logistic (M3) + PR-AUC (M4)
                      + threshold-at-recall (M6) + artifacts (S5/S6)
  06 deployment       score via JVM transform, alert, one-pass
                      confusion, alerts/day (M7-M9)

Differences from the reference, all deliberate (SURVEY.md §4):
explicit schemas instead of inferSchema; AQE instead of
repartition(64); stage_boundary(persist) instead of count-to-cache;
distributed training instead of toPandas+xgboost; JVM model.transform
instead of a row-wise Python UDF; a single groupBy confusion instead
of four filtered counts.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .ml.artifacts import save_threshold_artifact
from .ml.threshold import threshold_at_recall
from .ml.training import pr_auc, score_with_model, train_logistic
from .operators import (
    add_drive_age,
    add_rolling_features,
    alert_decision,
    alerts_per_day,
    chronological_split,
    confusion_matrix,
    downsample_negatives,
    lead_label,
    leakage_filter,
    operational_summary,
    stage_boundary,
)
from .sources.catalog import load
from .sources.sinks import write_parquet

FEATURES = [
    "value",
    "value_mean_7d",
    "value_mean_14d",
    "value_std_7d",
    "value_max_7d",
    "value_delta_1d",
]


def run_reference_pipeline(
    spark: SparkSession,
    sf_dir: str,
    workdir: str,
    recall_target: float = 0.8,
    negative_ratio: float = 100.0,
) -> dict[str, Any]:
    """Run all stages; returns the operational summary dict
    (tp/fp/fn/recall/precision, PR-AUC, threshold, alerts/day)."""
    os.makedirs(workdir, exist_ok=True)

    # 01 ingestion: scan + stage materialization
    raw = load(spark, sf_dir, "events").select(
        "event_id",
        "ts",
        "user_id",
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("failure"),
        F.col("value").cast("double").alias("value"),
    )
    write_parquet(raw, os.path.join(workdir, "raw"), n_files=4)
    raw = spark.read.parquet(os.path.join(workdir, "raw"))

    # 02 label engineering
    labeled = leakage_filter(
        lead_label(raw, "user_id", ["ts", "event_id"], "failure"), "failure"
    )

    # 03 feature engineering (shares one window partition/order)
    feats = add_drive_age(
        add_rolling_features(
            labeled, ["value"], "user_id", ["ts", "event_id"]
        ),
        "user_id",
        ["ts", "event_id"],
    )
    feats = stage_boundary(feats)  # reference's persist+count (T2)

    # 04 chronological split + downsample
    train, val, test = chronological_split(
        feats.withColumn("day", F.to_date("ts")),
        "day",
        "2024-01-15",
        "2024-01-25",
    )
    train_bal = downsample_negatives(
        train, "failure_next_24h", ratio=negative_ratio
    )

    # 05 training + evaluation + threshold selection
    model = train_logistic(train_bal, FEATURES, "failure_next_24h")
    val_scored = score_with_model(model, val, FEATURES)
    auc = pr_auc(val_scored, "failure_probability", "failure_next_24h")
    thr_row = threshold_at_recall(
        val_scored, "failure_probability", "failure_next_24h", recall_target
    ).first()
    threshold = float(thr_row["threshold"])
    save_threshold_artifact(
        os.path.join(workdir, "threshold.json"),
        threshold,
        recall_target,
        thr_row["n_pos"],
        extra={"pr_auc_val": auc},
    )
    model.write().overwrite().save(os.path.join(workdir, "model"))

    # 06 deployment: batch inference on the future slice
    test_scored = score_with_model(model, test, FEATURES)
    cm = confusion_matrix(
        test_scored,
        alert_decision("failure_probability", threshold),
        F.col("failure_next_24h"),
    )
    summary = operational_summary([r.asDict() for r in cm.collect()])
    daily = alerts_per_day(
        test_scored.withColumn(
            "alert", alert_decision("failure_probability", threshold)
        ),
        "ts",
        "alert",
    )
    write_parquet(daily, os.path.join(workdir, "daily_alerts"), n_files=1)
    avg_alerts = daily.agg(F.avg("alerts")).first()[0]

    feats.unpersist()
    summary.update(
        {
            "pr_auc_val": auc,
            "threshold": threshold,
            "avg_alerts_per_day": float(avg_alerts or 0.0),
        }
    )
    return summary
