"""Streaming twin must reproduce the batch answer on a bounded run.

An ``availableNow`` trigger drains the fixture directory as a stream
into a memory sink; the watermarked daily-alert rollup must equal the
batch groupBy over the same data (complete output mode — every window
closes once the source is exhausted).
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from big_data_backblaze_hard_drive_failure_spark.ml.scorer import score_column
from big_data_backblaze_hard_drive_failure_spark.plans.mlops import MODEL
from big_data_backblaze_hard_drive_failure_spark.sources.catalog import load
from big_data_backblaze_hard_drive_failure_spark.streaming import (
    daily_alert_stream,
    read_events_stream,
    score_stream,
)

THRESHOLD = 0.5


def test_streaming_daily_alerts_match_batch(spark, sf_smoke, tmp_path):
    stream = read_events_stream(spark, sf_smoke)
    assert stream.isStreaming
    scored = score_stream(stream, MODEL)
    daily = daily_alert_stream(scored, THRESHOLD)

    sink = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        daily.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["day"].isoformat(), r["alerts"])
        for r in spark.sql(f"SELECT * FROM {sink}").collect()
    }

    batch = (
        load(spark, sf_smoke, "events")
        .withColumn(
            "is_error",
            F.when(F.col("event_type") == "error", 1.0).otherwise(0.0),
        )
        .withColumn("p", score_column(MODEL))
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.when(F.col("p") >= THRESHOLD, 1).otherwise(0)).alias(
                "alerts"
            )
        )
    )
    want = {(r["day"].isoformat(), r["alerts"]) for r in batch.collect()}
    assert got == want and len(got) > 0


def test_stateful_running_alert_counts(spark, sf_smoke, tmp_path):
    """applyInPandasWithState operator: after draining the bounded
    stream, per-user cumulative alert counts equal the batch truth."""
    from big_data_backblaze_hard_drive_failure_spark.streaming.stateful import (
        running_alert_counts,
    )

    stream = read_events_stream(spark, sf_smoke)
    scored = score_stream(stream, MODEL).select(
        "user_id", "ts", "failure_probability"
    )
    counts = running_alert_counts(scored, THRESHOLD)

    sink = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        counts.writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_state"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # update mode may emit a row per micro-batch; keep the max per user
    got_rows = spark.sql(
        f"SELECT user_id, MAX(n_alerts) AS n FROM {sink} GROUP BY user_id"
    ).collect()
    got = {(r["user_id"], r["n"]) for r in got_rows}

    batch = (
        load(spark, sf_smoke, "events")
        .withColumn(
            "is_error",
            F.when(F.col("event_type") == "error", 1.0).otherwise(0.0),
        )
        .withColumn("p", score_column(MODEL))
        .filter(F.col("p") >= THRESHOLD)
        .groupBy("user_id")
        .count()
    )
    want = {(r["user_id"], r["count"]) for r in batch.collect()}
    assert got == want and len(got) > 0
