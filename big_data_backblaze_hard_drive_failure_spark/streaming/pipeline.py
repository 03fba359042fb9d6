"""Streaming pipeline stages.

Design for scale: the stream is partitioned by source file/offset;
the only stateful stage is the windowed aggregate, whose state is
bounded by the watermark (1 day late-data allowance -> ~2 windows of
state per key). Scoring is stateless column arithmetic — identical
plans to the batch engine, which is the point of Structured
Streaming's unified model.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ml.monitor import score_decile_bin
from ..ml.scorer import LinearModel, score_column
from ..sources.catalog import schema_for


def read_events_stream(
    spark: SparkSession, sf_dir: str, glob: str = "events.parquet"
) -> DataFrame:
    """File-source stream over the events fixture directory with the
    catalog's explicit schema (never inferSchema on a stream).

    ``glob`` widens the watched file set for replay harnesses (e.g.
    ``events*.parquet`` to pick up a watermark-advancing tail file
    alongside the fixture — the streaming-equals-batch parity test);
    every matched file must share the events physical schema.

    The fixture has shipped two physical layouts for ``ts``:
    TIMESTAMP(NANOS) (surfaces as bigint under ``nanosAsLong``) and
    TIMESTAMP(MICROS) (surfaces as timestamp/timestamp_ntz). A stream
    declared with the wrong one silently mangles every event time, so
    probe the surfaced dtype with a metadata-only batch read — the
    same guard sources.catalog.load applies — and declare the stream
    schema to match.
    """
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    probe = (
        spark.read.option("pathGlobFilter", glob).parquet(sf_dir)
        if glob != "events.parquet"
        else spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    )
    ts_dtype = dict(probe.dtypes).get("ts", "timestamp")
    schema = schema_for("events")
    raw_schema = ", ".join(
        f"{f.name} {ts_dtype.upper() if f.name == 'ts' else f.dataType.simpleString()}"
        for f in schema.fields
    )
    # the file stream source monitors a DIRECTORY; the fixture is a
    # single file, so watch the sf dir with a glob filter
    df = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .option("pathGlobFilter", glob)
        .load(sf_dir)
    )
    # watermarks want TIMESTAMP (an instant) — build/convert to the
    # micros instant; streaming sessions run in UTC (the engine
    # session factory pins this) so wall-clock semantics match the
    # batch NTZ reads
    if ts_dtype == "bigint":
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def score_stream(stream: DataFrame, model: LinearModel) -> DataFrame:
    """Stateless scoring — the same Column expression the batch plan
    uses (ml/scorer.py); works unchanged on a stream."""
    feats = stream.withColumn(
        "is_error",
        F.when(F.col("event_type") == "error", 1.0).otherwise(0.0),
    )
    return feats.withColumn("failure_probability", score_column(model))


def daily_alert_stream(
    scored: DataFrame, threshold: float, watermark: str = "1 day"
) -> DataFrame:
    """Watermarked tumbling-window daily alert counts — the streaming
    twin of operators.metrics.alerts_per_day (reference M9). State is
    dropped once the watermark passes a window's end."""
    alerts = scored.withColumn(
        "alert",
        F.when(F.col("failure_probability") >= threshold, 1).otherwise(0),
    )
    return (
        alerts.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.sum("alert").alias("alerts"))
        .select(F.to_date(F.col("w.start")).alias("day"), "alerts")
    )


def session_count_stream(stream: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user session aggregation ON THE STREAM: Spark's native
    ``session_window`` merges events whose gaps are < gap into one
    growing window, carried in the state store; the watermark bounds
    how long an open session can wait for a late event before it is
    finalized and evicted. The batch twin (same gap semantics as
    ``ref_session_windows``'s gaps-and-islands construction) must
    produce identical sessions on in-order data —
    ``tests/test_streaming.py::test_streaming_session_windows_match_batch``.

    Scale: state is per (user, open session); watermark eviction keeps
    it bounded by active users, not history."""
    return (
        stream.withWatermark("ts", "1 day")
        .groupBy(
            F.col("user_id"),
            F.session_window("ts", f"{gap_minutes} minutes"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )


def score_histogram_stream(
    stream: DataFrame, model: LinearModel, split: str
) -> DataFrame:
    """Streaming twin of the drift monitor's binning stage
    (plans.mlops.mlops_psi_drift): running per-bin counts of the
    scored stream, split into the reference window (ts < split) and
    the current window. ``split`` is REQUIRED — pass the same
    boundary the batch monitor uses (ml.monitor.DRIFT_SPLIT) so the
    two can never silently bin against different dates. Runs in
    COMPLETE output mode with NO watermark — correct here because
    the aggregate's state is bounded by the BIN COUNT (≤10 rows),
    not by history; this is the small-cardinality-running-aggregate
    streaming pattern, the opposite end of the spectrum from the
    watermarked per-key aggs above. Emits OBSERVED bins only (a
    stream can't left-join the static bin spine after a
    complete-mode aggregate); the batch drift_histogram densifies to
    the full spine. The histogram must equal the batch query's
    populated bins —
    tests/test_streaming.py::test_streaming_drift_histogram_matches_batch.
    """
    scored = score_stream(stream, model)
    return (
        scored.select(
            score_decile_bin("failure_probability").alias("bin"),
            F.when(
                F.col("ts") < F.lit(split).cast("timestamp"), 1
            )
            .otherwise(0)
            .alias("in_ref"),
        )
        .groupBy("bin")
        .agg(
            F.sum("in_ref").cast("long").alias("n_ref"),
            F.sum(1 - F.col("in_ref")).cast("long").alias("n_cur"),
        )
    )
