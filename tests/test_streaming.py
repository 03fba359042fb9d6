"""Streaming twin must reproduce the batch answer on a bounded run.

An ``availableNow`` trigger drains the fixture directory as a stream
into a memory sink; the watermarked daily-alert rollup must equal the
batch groupBy over the same data (complete output mode — every window
closes once the source is exhausted).
"""

from __future__ import annotations

import uuid

import pytest

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


def test_watermark_drops_late_events(spark, tmp_path):
    """Late-data policy made observable: with a 1-day watermark, an
    event arriving in a LATER micro-batch whose window closed behind
    the watermark is DROPPED — the closed window's append-mode result
    must not change, and the state operator must report the drop
    (numRowsDroppedByWatermark)."""
    import datetime as dt
    import os
    import time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "stream_src"
    src.mkdir()

    def write_batch(name, rows, mtime):
        pdf = pd.DataFrame(
            rows,
            columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
        )
        # raw INT64 nanos, matching the fixture's physical layout
        pdf["ts"] = [int(t.timestamp() * 1e9) for t in pdf["ts"]]
        table = pa.Table.from_pandas(pdf, preserve_index=False).cast(
            pa.schema(
                [
                    ("event_id", pa.int64()),
                    ("ts", pa.int64()),
                    ("user_id", pa.int64()),
                    ("event_type", pa.string()),
                    ("value", pa.float64()),
                    ("props", pa.string()),
                ]
            )
        )
        path = str(src / name)
        pq.write_table(table, path)
        os.utime(path, (mtime, mtime))

    day1 = dt.datetime(2024, 1, 1, 6, tzinfo=dt.timezone.utc)
    day5 = dt.datetime(2024, 1, 5, 6, tzinfo=dt.timezone.utc)
    now = time.time()
    # Two-watermark subtlety (verified empirically): batch N filters
    # late rows with the PREVIOUS batch's watermark but evicts state
    # with the CURRENT one — so a late row landing in the same batch
    # where its window is first evicted still merges. The drop is only
    # guaranteed once the late row arrives a full batch AFTER the
    # watermark passed its window. Hence three single-file batches:
    # batch 0: a day-1 event + the day-5 event that will advance the
    #          watermark to Jan 4 (1-day allowance)
    write_batch("a.parquet", [(1, day1, 1, "error", 9.0, "{}"),
                              (2, day5, 1, "error", 9.0, "{}")], now - 100)
    # batch 1: on-time day-5 event; watermark Jan 4 now active, the
    #          day-1 window (end Jan 2) is evicted and emitted
    write_batch("b.parquet", [(4, day5, 2, "error", 9.0, "{}")], now - 50)
    # batch 2: a LATE day-1 event — behind the active watermark and
    #          its window already closed -> must be dropped
    write_batch("c.parquet", [(3, day1, 1, "error", 9.0, "{}")], now - 10)

    raw_schema = (
        "event_id BIGINT, ts BIGINT, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING"
    )
    stream = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(src))
        .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    )
    counts = (
        stream.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.to_date(F.col("w.start")).alias("day"), "n")
    )
    sink = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        counts.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_late"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p["stateOperators"]
    )
    rows = {r["day"].isoformat(): r["n"] for r in spark.sql(
        f"SELECT * FROM {sink}").collect()}
    # the day-1 window closed with ONLY the on-time event; the late
    # arrival in batch 2 was dropped, not merged and not re-emitted
    assert rows.get("2024-01-01") == 1, rows
    assert dropped == 1


def test_foreach_batch_idempotent_dedup_sink(spark, sf_smoke, tmp_path):
    """foreachBatch production sink: each micro-batch is deduped on
    user_id and written under batch_id=<n> (dynamic overwrite =
    idempotent on replay). The union of batch outputs must hold one
    row per (batch, user) and cover exactly the users of the source."""
    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import load
    from big_data_backblaze_hard_drive_failure_spark.streaming.sinks import (
        foreach_batch_parquet_dedup,
    )

    stream = read_events_stream(spark, sf_smoke).select(
        "user_id", "event_id", "ts", "value"
    )
    target = str(tmp_path / "sink")
    q = (
        stream.writeStream.foreachBatch(
            foreach_batch_parquet_dedup(target, "user_id")
        )
        .option("checkpointLocation", str(tmp_path / "ckpt_fb"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    out = spark.read.option("basePath", target).parquet(target)
    per_batch = (
        out.groupBy("batch_id", "user_id").count().filter("count > 1").count()
    )
    assert per_batch == 0, "dedup-per-batch violated"
    got_users = {r["user_id"] for r in out.select("user_id").distinct().collect()}
    want_users = {
        r["user_id"]
        for r in load(spark, sf_smoke, "events").select("user_id").distinct().collect()
    }
    assert got_users == want_users and len(got_users) > 0

    # idempotence: replaying a batch id overwrites, never duplicates
    first = spark.read.parquet(f"{target}/batch_id=0")
    n_before = first.count()
    foreach_batch_parquet_dedup(target, "user_id")(
        spark.read.parquet(f"{target}/batch_id=0"), 0
    )
    assert spark.read.parquet(f"{target}/batch_id=0").count() == n_before


def test_observe_metrics_ride_the_action(spark, sf_smoke):
    """df.observe metrics must equal separately-computed truth while
    costing zero extra jobs (they attach to the one action)."""
    from big_data_backblaze_hard_drive_failure_spark.operators.observe import (
        observed_alert_metrics,
    )
    from big_data_backblaze_hard_drive_failure_spark.plans.mlops import (
        scored_frame,
    )

    scored = scored_frame(spark, sf_smoke, via="column")
    out, obs = observed_alert_metrics(scored, "failure_probability", 0.5)
    n_written = out.count()  # the single action the metrics ride on
    got = obs.get
    truth = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("failure_probability") >= 0.5, 1).otherwise(0)
        ).alias("a"),
    ).first()
    assert got["n_rows"] == truth["n"] == n_written
    assert got["n_alerts"] == truth["a"]
    assert got["sum_score"] > 0


def test_stream_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: duplicate event_ids arriving in
    later micro-batches within the allowance are suppressed; state is
    watermark-bounded (the operator's entire point vs dropDuplicates).
    """
    import datetime as dt
    import os
    import time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_backblaze_hard_drive_failure_spark.streaming.dedup import (
        dedup_stream_within_watermark,
    )

    src = tmp_path / "dedup_src"
    src.mkdir()

    def wb(name, rows, mtime):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        pdf["ts"] = [int(t.timestamp() * 1e9) for t in pdf["ts"]]
        table = pa.Table.from_pandas(pdf, preserve_index=False).cast(
            pa.schema(
                [
                    ("event_id", pa.int64()),
                    ("ts", pa.int64()),
                    ("user_id", pa.int64()),
                    ("event_type", pa.string()),
                    ("value", pa.float64()),
                    ("props", pa.string()),
                ]
            )
        )
        p = str(src / name)
        pq.write_table(table, p)
        os.utime(p, (mtime, mtime))

    t0 = dt.datetime(2024, 2, 1, 12, tzinfo=dt.timezone.utc)
    now = time.time()
    # batch 0: events 1 and 2
    wb("a.parquet", [(1, t0, 1, "view", 1.0, "{}"),
                     (2, t0 + dt.timedelta(minutes=5), 1, "view", 2.0, "{}")], now - 100)
    # batch 1: event 1 AGAIN (at-least-once retry, within allowance)
    # plus fresh event 3
    wb("b.parquet", [(1, t0, 1, "view", 1.0, "{}"),
                     (3, t0 + dt.timedelta(minutes=10), 2, "view", 3.0, "{}")], now - 50)

    raw = (
        "event_id BIGINT, ts BIGINT, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING"
    )
    stream = (
        spark.readStream.schema(raw)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(src))
        .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    )
    deduped = dedup_stream_within_watermark(stream, ["event_id"], "ts", "1 hour")

    sink = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.sql(f"SELECT event_id FROM {sink}").collect()
    ids = sorted(r["event_id"] for r in rows)
    assert ids == [1, 2, 3], ids  # the retry of event 1 was suppressed


def test_forest_scores_stream_equals_batch(spark, sf_smoke, tmp_path):
    """The broadcast-forest pandas_udf is batch/stream agnostic: the
    same trained GBT scoring the events STREAM must produce exactly
    the batch scores — the unified-model claim, proven for trees."""
    from big_data_backblaze_hard_drive_failure_spark.ml.forest import (
        forest_score_pandas_udf,
    )
    from big_data_backblaze_hard_drive_failure_spark.plans.mlops import (
        GBT_FEATURES,
        _gbt_forest,
    )

    forest = _gbt_forest(spark, sf_smoke)
    udf = forest_score_pandas_udf(spark, forest)

    def featurize(df):
        return df.withColumn(
            "is_error",
            F.when(F.col("event_type") == "error", 1.0).otherwise(0.0),
        ).select("event_id", *GBT_FEATURES)

    stream = featurize(read_events_stream(spark, sf_smoke)).withColumn(
        "p", udf(*GBT_FEATURES)
    )
    sink = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_forest"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["event_id"], r["p"])
        for r in spark.sql(f"SELECT event_id, p FROM {sink}").collect()
    }
    batch = featurize(load(spark, sf_smoke, "events")).withColumn(
        "p", udf(*GBT_FEATURES)
    )
    want = {(r["event_id"], r["p"]) for r in batch.collect()}
    assert got == want and len(got) > 0


def test_windowed_state_survives_restart(spark, tmp_path):
    """Checkpoint recovery for stateful aggregation: windows
    accumulated in run 1 live in the state store; a RESTARTED query
    (same checkpoint) must emit them with run-1's counts once the
    watermark passes — the production restartability contract."""
    import datetime as dt
    import os
    import time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "restart_src"
    src.mkdir()

    def wb(name, rows, mtime):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        pdf["ts"] = [int(t.timestamp() * 1e9) for t in pdf["ts"]]
        table = pa.Table.from_pandas(pdf, preserve_index=False).cast(
            pa.schema(
                [
                    ("event_id", pa.int64()),
                    ("ts", pa.int64()),
                    ("user_id", pa.int64()),
                    ("event_type", pa.string()),
                    ("value", pa.float64()),
                    ("props", pa.string()),
                ]
            )
        )
        p = str(src / name)
        pq.write_table(table, p)
        os.utime(p, (mtime, mtime))

    def day(n, hour=6):
        return dt.datetime(2024, 5, n, hour, tzinfo=dt.timezone.utc)

    raw = (
        "event_id BIGINT, ts BIGINT, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING"
    )
    out = str(tmp_path / "restart_out")
    ck = str(tmp_path / "restart_ck")

    def run_once():
        stream = (
            spark.readStream.schema(raw)
            .format("parquet")
            .load(str(src))
            .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        )
        counts = (
            stream.withWatermark("ts", "1 day")
            .groupBy(F.window("ts", "1 day").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.to_date(F.col("w.start")).alias("day"), "n")
        )
        q = (
            counts.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    now = time.time()
    # run 1: two day-1 events + one day-5 event; availableNow's single
    # batch only ACCUMULATES state (windows can't close until a later
    # batch observes the advanced watermark)
    wb("a.parquet", [(1, day(1), 1, "view", 1.0, "{}"),
                     (2, day(1, 9), 1, "view", 1.0, "{}"),
                     (3, day(5), 2, "view", 1.0, "{}")], now - 100)
    run_once()
    # run 2 = RESTART from checkpoint with a day-9 event: watermark
    # moves to day 8, so the day-1 and day-5 windows — whose counts
    # exist only in recovered state — must now be emitted
    wb("b.parquet", [(4, day(9), 3, "view", 1.0, "{}")], now - 50)
    run_once()

    rows = {
        r["day"].isoformat(): r["n"]
        for r in spark.read.parquet(out).collect()
    }
    assert rows.get("2024-05-01") == 2, rows  # run-1 state, emitted post-restart
    assert rows.get("2024-05-05") == 1, rows


def test_stream_stream_interval_join_matches_batch(spark, sf_smoke, tmp_path):
    """Stream-stream inner interval join (clicks -> purchases within
    1h per user) produces exactly the batch interval join's rows, and
    the plan is accepted in append mode (i.e. state is provably
    bounded by the two watermarks + time-bound condition)."""
    from big_data_backblaze_hard_drive_failure_spark.streaming.joins import (
        attribute_purchases_to_clicks,
    )

    stream = read_events_stream(spark, sf_smoke)
    clicks = stream.filter(F.col("event_type") == "click")
    purchases = stream.filter(F.col("event_type") == "purchase")
    joined = attribute_purchases_to_clicks(clicks, purchases)

    sink = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["click_id"], r["purchase_id"])
        for r in spark.sql(f"SELECT * FROM {sink}").collect()
    }

    ev = load(spark, sf_smoke, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("cts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    want = {
        (r["click_id"], r["purchase_id"])
        for r in c.join(
            p,
            (F.col("cu") == F.col("pu"))
            & (F.col("pts") >= F.col("cts"))
            & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 1 hour")),
        ).collect()
    }
    assert got == want and len(got) > 0


def test_stream_static_enrichment(spark, sf_smoke, tmp_path):
    """Stream-static join: per-batch broadcast of a static dim onto
    the stream; row count equals the batch join's."""
    from big_data_backblaze_hard_drive_failure_spark.streaming.joins import (
        enrich_stream_with_dim,
    )

    dim = spark.createDataFrame(
        [("click", 1), ("purchase", 5), ("error", -1)],
        "event_type string, weight int",
    )
    stream = read_events_stream(spark, sf_smoke)
    enriched = enrich_stream_with_dim(stream, dim, "event_type")

    sink = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        enriched.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(f"SELECT count(*) c FROM {sink}").collect()[0]["c"]
    want = load(spark, sf_smoke, "events").join(dim, "event_type").count()
    assert got == want and got > 0


def test_transform_with_state_running_counts(spark, sf_smoke, tmp_path):
    """transformWithStateInPandas (Spark 4 arbitrary-stateful API):
    per-user running counts equal the batch group-by. The stateful
    worker speaks protobuf to the JVM state server; environments
    without google.protobuf can't launch it, so the test gates on the
    import (the operator itself is fully implemented)."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("google.protobuf unavailable: transformWithState "
                    "worker cannot start in this container")
    from big_data_backblaze_hard_drive_failure_spark.streaming.stateful import (
        running_event_counts_tws,
    )

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    stream = read_events_stream(spark, sf_smoke)
    out = running_event_counts_tws(stream)
    sink = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["n_events"])
        for r in spark.sql(
            f"SELECT user_id, max(n_events) AS n_events FROM {sink} "
            "GROUP BY user_id"
        ).collect()
    }
    want = {
        (r["user_id"], r["n"])
        for r in load(spark, sf_smoke, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_streaming_session_windows_match_batch(spark, sf_smoke, tmp_path):
    """Native streaming session_window == the batch gaps-and-islands
    sessionization on the same (in-order) data. Append mode: only
    watermark-finalized sessions are emitted; with availableNow over a
    bounded fixture plus a 1-day watermark, every session whose end
    precedes max(ts) - 1d is final. Compare on that common prefix."""
    from big_data_backblaze_hard_drive_failure_spark.streaming.pipeline import (
        read_events_stream,
        session_count_stream,
    )

    sessions = session_count_stream(read_events_stream(spark, sf_smoke))
    sink = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        sessions.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in spark.sql(f"SELECT * FROM {sink}").collect()
    }

    ev = load(spark, sf_smoke, "events").select("user_id", "ts")
    # batch twin: strict-gap islands (same semantics session_window
    # uses on in-order data: events < 30 min apart merge)
    w = F.expr(
        "CASE WHEN lag_ts IS NULL OR ts - lag_ts >= INTERVAL 30 MINUTE "
        "THEN 1 ELSE 0 END"
    )
    from pyspark.sql import Window

    win = Window.partitionBy("user_id").orderBy("ts")
    batch = (
        ev.withColumn("lag_ts", F.lag("ts").over(win))
        .withColumn("new_sess", w)
        .withColumn(
            "sess_id",
            F.sum("new_sess").over(
                win.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "sess_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("sess_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    hi = ev.agg(F.max("ts")).collect()[0][0]
    import datetime as dt

    cutoff = hi - dt.timedelta(days=1)
    want = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in batch.collect()
        # finalized iff the session could no longer grow under the
        # watermark: its end + gap is below the final watermark
        if r["sess_end"] + dt.timedelta(minutes=30) < cutoff
    }
    assert want and want <= got, (len(want), len(got))


def test_stream_stream_left_outer_interval_join(spark, sf_smoke, tmp_path):
    """LEFT OUTER interval join: matched rows equal the inner join;
    unmatched clicks surface as null-purchase rows once the watermark
    proves no qualifying purchase can arrive. On a bounded fixture the
    final watermark can't advance past the last event, so clicks near
    the tail may stay unemitted — assert over the provably-final
    prefix and require both kinds of rows to exist there."""
    import datetime as dt

    from big_data_backblaze_hard_drive_failure_spark.streaming.joins import (
        attribute_clicks_left_outer,
    )

    stream = read_events_stream(spark, sf_smoke)
    clicks = stream.filter(F.col("event_type") == "click")
    purchases = stream.filter(F.col("event_type") == "purchase")
    joined = attribute_clicks_left_outer(clicks, purchases)

    sink = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_louter"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(f"SELECT * FROM {sink}").collect()
    got_matched = {
        (r["click_id"], r["purchase_id"])
        for r in rows
        if r["purchase_id"] is not None
    }
    got_unmatched = {r["click_id"] for r in rows if r["purchase_id"] is None}

    ev = load(spark, sf_smoke, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("cts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    batch = c.join(
        p,
        (F.col("cu") == F.col("pu"))
        & (F.col("pts") >= F.col("cts"))
        & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 1 hour")),
        "left_outer",
    ).collect()
    want_matched = {
        (r["click_id"], r["purchase_id"])
        for r in batch
        if r["purchase_id"] is not None
    }
    # matched rows: stream == batch, exactly
    assert got_matched == want_matched and got_matched

    # unmatched: sound (never a false null) and complete on the final
    # prefix — clicks whose horizon+lateness closed before the last
    # watermark MUST have been emitted
    want_unmatched_all = {
        r["click_id"] for r in batch if r["purchase_id"] is None
    }
    assert got_unmatched <= want_unmatched_all
    # the GLOBAL watermark is min over both inputs' (max ts - lateness);
    # unmatched emission needs watermark > click_ts + horizon
    hi_c = ev.filter(F.col("event_type") == "click").agg(F.max("ts")).collect()[0][0]
    hi_p = ev.filter(F.col("event_type") == "purchase").agg(F.max("ts")).collect()[0][0]
    cutoff = min(hi_c, hi_p) - dt.timedelta(hours=1, minutes=30, seconds=1)
    final_prefix = {
        r["click_id"]
        for r in batch
        if r["purchase_id"] is None and r["cts"] < cutoff
    }
    assert final_prefix and final_prefix <= got_unmatched


def test_streaming_query_listener_receives_progress(spark, sf_smoke, tmp_path):
    """Operational observability: a StreamingQueryListener sees start /
    progress / termination with real row counts — the hook a 100 TB
    deployment uses to export throughput and watermark lag to its
    metrics system without touching the query itself."""
    from pyspark.sql.streaming import StreamingQueryListener

    events = {"started": 0, "progress_rows": [], "terminated": 0}

    class _L(StreamingQueryListener):
        def onQueryStarted(self, e):
            events["started"] += 1

        def onQueryProgress(self, e):
            events["progress_rows"].append(e.progress.numInputRows)

        def onQueryIdle(self, e):
            pass

        def onQueryTerminated(self, e):
            events["terminated"] += 1

    listener = _L()
    spark.streams.addListener(listener)
    try:
        stream = read_events_stream(spark, sf_smoke)
        counts = stream.groupBy("event_type").count()
        sink = f"mem_{uuid.uuid4().hex[:8]}"
        q = (
            counts.writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt_listener"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener events are delivered asynchronously
        import time

        deadline = time.time() + 30
        n_input = load(spark, sf_smoke, "events").count()
        while time.time() < deadline:
            if events["terminated"] >= 1 and sum(events["progress_rows"]) >= n_input:
                break
            time.sleep(0.5)
        assert events["started"] == 1
        assert sum(events["progress_rows"]) == n_input
        assert events["terminated"] == 1
    finally:
        spark.streams.removeListener(listener)


def test_streaming_update_mode_counts(spark, sf_smoke, tmp_path):
    """Update output mode: each micro-batch emits only the CHANGED
    aggregate rows; the latest emission per key must equal the batch
    aggregate — the third output mode next to the complete/append
    coverage elsewhere in this suite."""
    stream = read_events_stream(spark, sf_smoke)
    counts = stream.groupBy("event_type").count()
    sink = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        counts.writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_update"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # memory sink in update mode appends each emitted change; the
    # final state per key is its LAST emission (batch ordering is
    # preserved within the sink table's insertion order)
    rows = spark.sql(f"SELECT * FROM {sink}").collect()
    final = {}
    for r in rows:
        final[r["event_type"]] = r["count"]
    want = {
        r["event_type"]: r["n"]
        for r in load(spark, sf_smoke, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert final == want


def test_streaming_observe_metrics(spark, sf_smoke, tmp_path):
    """df.observe on a STREAM: per-batch observed metrics ride the
    micro-batch (no extra pass) and surface in StreamingQueryProgress
    — the streaming face of the batch observe operator
    (operators/observe.py)."""
    stream = read_events_stream(spark, sf_smoke)
    observed = stream.observe(
        "ingest_metrics",
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents_seen"),
    )
    counts = observed.groupBy("event_type").count()
    sink = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        counts.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_observe"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows_seen = cents_seen = 0
    for prog in q.recentProgress:
        m = prog["observedMetrics"].get("ingest_metrics")
        if m:
            rows_seen += m["rows_seen"]
            cents_seen += m["cents_seen"]
    ev = load(spark, sf_smoke, "events")
    want = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("c"),
    ).collect()[0]
    assert rows_seen == want["n"] and cents_seen == want["c"]


def test_stateful_event_time_timeout_finalizes_sessions(spark, sf_smoke, tmp_path):
    """EventTimeTimeout eviction: a user's session row is emitted when
    the watermark passes last-event + gap — emit-on-silence semantics.
    On the bounded fixture, every user whose last event precedes
    final-watermark - gap must have fired exactly once with their
    total event count."""
    from big_data_backblaze_hard_drive_failure_spark.streaming.stateful import (
        session_finalize_with_timeout,
    )

    stream = read_events_stream(spark, sf_smoke).withWatermark("ts", "1 hour")
    sessions = session_finalize_with_timeout(stream, gap_minutes=30)
    sink = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        sessions.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_timeout"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["user_id"]: r["n_events"]
        for r in spark.sql(f"SELECT * FROM {sink}").collect()
    }

    import datetime as dt

    ev = load(spark, sf_smoke, "events")
    hi = ev.agg(F.max("ts")).collect()[0][0]
    # watermark = max ts - 1h; a timeout at last_ts + 30min fires if
    # it's below that — add a batch-lag margin of the gap itself
    cutoff = hi - dt.timedelta(hours=1, minutes=30, seconds=1)
    per_user = {
        r["user_id"]: (r["n"], r["last"])
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("ts").alias("last"))
        .collect()
    }
    must_fire = {
        u: n for u, (n, last) in per_user.items() if last < cutoff
    }
    assert must_fire, "fixture should contain users idle past the gap"
    for u, n in must_fire.items():
        assert got.get(u) == n, (u, n, got.get(u))
    # soundness: no user reports more events than they actually have
    for u, n in got.items():
        assert n <= per_user[u][0]


def test_streaming_drift_histogram_matches_batch(spark, sf_smoke, tmp_path):
    """The drift monitor's binning stage computed ON THE STREAM
    (complete mode, bin-bounded state) must equal the batch query's
    histogram exactly — monitoring a live scorer and auditing it
    offline give one answer."""
    from big_data_backblaze_hard_drive_failure_spark.plans.mlops import (
        DRIFT_SPLIT,
        MODEL,
        mlops_psi_drift,
    )
    from big_data_backblaze_hard_drive_failure_spark.streaming.pipeline import (
        read_events_stream,
        score_histogram_stream,
    )

    hist = score_histogram_stream(
        read_events_stream(spark, sf_smoke), MODEL, split=DRIFT_SPLIT
    )
    sink = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        hist.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_drift"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r["bin"]: (r["n_ref"], r["n_cur"])
        for r in spark.sql(f"SELECT * FROM {sink}").collect()
    }
    # the batch monitor densifies to the full bin spine; the stream
    # emits observed bins only — parity holds on the populated bins
    want = {
        r["bin"]: (r["n_ref"], r["n_cur"])
        for r in mlops_psi_drift(spark, sf_smoke).collect()
        if r["n_ref"] + r["n_cur"] > 0
    }
    assert got == want and sum(a + b for a, b in got.values()) > 0


def test_streaming_foreachbatch_snapshot_sink(spark, sf_smoke, tmp_path):
    """foreachBatch + the versioned snapshot table: every micro-batch
    commits an immutable version with an atomic manifest flip, so a
    crash mid-batch can never expose partial data, and the current
    version's row count equals the drained stream's total."""
    from big_data_backblaze_hard_drive_failure_spark.sources.sinks import (
        read_snapshot,
        read_snapshot_version,
    )
    from big_data_backblaze_hard_drive_failure_spark.streaming import (
        foreach_batch_snapshot,
    )

    tdir = str(tmp_path / "snap_stream")
    stream = read_events_stream(spark, sf_smoke)

    totals = []
    seen_ids = []
    inner = foreach_batch_snapshot(tdir, app_id="snap_stream_test")

    def _commit(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        inner(batch_df, batch_id)
        totals.append(batch_df.count())
        seen_ids.append(batch_id)

    q = (
        stream.writeStream.foreachBatch(_commit)
        .option("checkpointLocation", str(tmp_path / "ckpt_snap"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    n_versions = read_snapshot_version(tdir)
    assert n_versions == len(totals) and n_versions >= 1
    # union of all committed versions == everything the stream drained
    got = sum(
        read_snapshot(spark, tdir, version=v).count()
        for v in range(1, n_versions + 1)
    )
    batch_n = load(spark, sf_smoke, "events").count()
    assert got == sum(totals) == batch_n

    # restart-and-replay: re-running an already-committed batch id
    # through the sink is a no-op (exactly-once via the txn ledger)
    inner(load(spark, sf_smoke, "events"), seen_ids[-1])
    assert read_snapshot_version(tdir) == n_versions


def test_streaming_replay_equals_registered_batch_query(
    spark, sf_smoke, tmp_path
):
    """The round-10 equivalence harness: the streaming sessionization
    stage, replayed over a file copy of the SAME fixture, must equal
    the REGISTERED batch query ref_session_windows EXACTLY — not just
    on a finalized prefix. A sentinel tail file (one event 30 days
    past max(ts) for a user outside the fixture's id space) advances
    the watermark beyond every real session's close, so append mode
    flushes ALL real sessions; the sentinel's own still-open session
    is never emitted. This upgrades the streaming suite from 'the
    stream runs and matches an inline twin' to 'the stream reproduces
    a registry query byte-for-byte'."""
    import datetime as dt
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_backblaze_hard_drive_failure_spark.plans import QUERIES
    from big_data_backblaze_hard_drive_failure_spark.streaming.pipeline import (
        session_count_stream,
    )

    src = f"{sf_smoke}/events.parquet"
    replay = tmp_path / "replay"
    replay.mkdir()
    shutil.copy(src, replay / "events.parquet")

    # sentinel tail: identical physical schema, ts = max + 30 days,
    # user_id = -1 (outside the fixture id space)
    t = pq.read_table(src)
    one = t.slice(0, 1)
    ts_f = t.schema.field("ts")
    mx = pa.compute.max(t["ts"]).as_py()
    far = (
        mx + 30 * 86400 * 10**9
        if pa.types.is_integer(ts_f.type)
        else mx + dt.timedelta(days=30)
    )
    one = one.set_column(
        one.schema.get_field_index("ts"),
        ts_f,
        pa.array([far], type=ts_f.type),
    )
    uid_f = t.schema.field("user_id")
    one = one.set_column(
        one.schema.get_field_index("user_id"),
        uid_f,
        pa.array([-1], type=uid_f.type),
    )
    pq.write_table(one, replay / "events_tail.parquet")

    sessions = session_count_stream(
        read_events_stream(spark, str(replay), glob="events*.parquet")
    )
    sink = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        sessions.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_replay"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in spark.sql(f"SELECT * FROM {sink}").collect()
        if r["user_id"] != -1
    }

    want = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in QUERIES["ref_session_windows"](spark, sf_smoke).collect()
    }
    assert got == want, (
        f"stream != registered batch query: {len(got)} vs {len(want)} "
        f"sessions; only-stream={sorted(got - want)[:3]}, "
        f"only-batch={sorted(want - got)[:3]}"
    )
