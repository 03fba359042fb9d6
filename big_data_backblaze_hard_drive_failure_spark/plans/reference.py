"""Reference-parity queries over the ``events`` fixture table.

Column mapping (FIXTURES.md §3): the reference's drive-day telemetry
(serial_number / date / smart_* / failure) maps onto events as
user_id / ts / value / (event_type = 'error'). Every query cites the
reference operator rows from SURVEY.md §2 it covers.

All windows use the deterministic order (ts, event_id) — the
reference orders by date alone (daily grain); at event grain a
tie-breaker is required for cross-engine reproducibility.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.labeling import lead_label, leakage_filter
from ..operators.metrics import alert_decision, alerts_per_day, confusion_matrix
from ..operators.splits import deterministic_downsample_negatives
from ..sources.catalog import load
from . import query

ENTITY = "user_id"
ORDER = ["ts", "event_id"]
ALERT_THRESHOLD = 150.0  # stand-in for the reference's deployed 0.136154


def _failure() -> F.Column:
    """events analog of the reference's ``failure`` flag."""
    return F.when(F.col("event_type") == "error", F.lit(1)).otherwise(F.lit(0))


_FAILURE_SQL = "CASE WHEN event_type = 'error' THEN 1 ELSE 0 END"


# --------------------------------------------------------------------
# S1-S3 / A4: ingestion-shaped scan + count checkpoint
# (reference 01_data_ingestion.py:17-28)
# --------------------------------------------------------------------
@query(
    "ref_ingest_profile",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT user_id) AS n_users,
           MIN(CAST(ts AS DATE)) AS first_day,
           MAX(CAST(ts AS DATE)) AS last_day
    FROM events
    """,
)
def ref_ingest_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        F.min(F.to_date("ts")).alias("first_day"),
        F.max(F.to_date("ts")).alias("last_day"),
    )


# --------------------------------------------------------------------
# P1/P2: column-list projection + type normalization
# (reference 02_label_engineering.py:55-86)
# --------------------------------------------------------------------
@query(
    "ref_project_cast",
    oracle="""
    SELECT event_id,
           CAST(ts AS DATE) AS event_day,
           user_id,
           event_type,
           CAST(value AS DOUBLE) AS value
    FROM events
    """,
)
def ref_project_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events").select(
        F.col("event_id"),
        F.to_date("ts").alias("event_day"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("value").cast("double").alias("value"),
    )


# --------------------------------------------------------------------
# W1 + P7: forward-looking lead label
# (reference 02_label_engineering.py:106-123)
# --------------------------------------------------------------------
@query(
    "ref_label_lead",
    oracle=f"""
    WITH base AS (
        SELECT user_id, event_id, ts, {_FAILURE_SQL} AS failure
        FROM events
    )
    SELECT user_id, event_id, failure,
           CASE WHEN LEAD(failure, 1) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) = 1
                THEN 1 ELSE 0 END AS failure_next_24h
    FROM base
    """,
)
def ref_label_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", _failure().alias("failure")
    )
    df = lead_label(df, ENTITY, ORDER, "failure")
    return df.select("user_id", "event_id", "failure", "failure_next_24h")


# --------------------------------------------------------------------
# A1: label-distribution sanity aggregate
# (reference 02_label_engineering.py:136-138)
# --------------------------------------------------------------------
@query(
    "ref_label_distribution",
    oracle=f"""
    WITH base AS (
        SELECT user_id, event_id, ts, {_FAILURE_SQL} AS failure
        FROM events
    ), labeled AS (
        SELECT *,
               CASE WHEN LEAD(failure, 1) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id) = 1
                    THEN 1 ELSE 0 END AS failure_next_24h
        FROM base
    )
    SELECT failure_next_24h, COUNT(*) AS n
    FROM labeled GROUP BY failure_next_24h
    """,
)
def ref_label_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        ref_label_lead(spark, sf_dir)
        .groupBy("failure_next_24h")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------
# P4: leakage filter (drop already-failing rows) + survivor profile
# (reference 02_label_engineering.py:131)
# --------------------------------------------------------------------
@query(
    "ref_leakage_filter",
    oracle=f"""
    WITH base AS (
        SELECT user_id, event_id, ts, event_type, {_FAILURE_SQL} AS failure
        FROM events
    ), labeled AS (
        SELECT *,
               CASE WHEN LEAD(failure, 1) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id) = 1
                    THEN 1 ELSE 0 END AS failure_next_24h
        FROM base
    )
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(failure_next_24h) AS BIGINT) AS positives
    FROM labeled WHERE failure = 0
    GROUP BY event_type
    """,
)
def ref_leakage_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", _failure().alias("failure")
    )
    df = leakage_filter(lead_label(df, ENTITY, ORDER, "failure"), "failure")
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("failure_next_24h").alias("positives"),
    )


# --------------------------------------------------------------------
# W2-W7 + P8: the analytical core — rolling features, delta, age
# (reference 03_feature_engineering.py:90-154) — flagship query
#
# Cross-engine exactness: ``value`` is a 2-decimal double, so naive
# AVG/STDDEV accumulate different low bits in Spark vs DuckDB and the
# true mean of N two-decimal values lands EXACTLY on 4-decimal
# rounding boundaries (denominator 100*N) — rounding then diverges by
# 1 ulp. We therefore aggregate exact integer cents and derive
# mean/stddev from integer sums: both engines divide identical
# integers, yielding bit-identical doubles before ROUND. Semantics are
# unchanged (cents are exact for 2-decimal data).
# --------------------------------------------------------------------
_ROLLING_ORACLE = """
WITH base AS (
    SELECT user_id, event_id, ts, value,
           CAST(ROUND(value * 100) AS BIGINT) AS cents
    FROM events
), agg AS (
    SELECT user_id, event_id, value,
           SUM(cents) OVER w7 AS sx7,
           SUM(cents * cents) OVER w7 AS sxx7,
           COUNT(*) OVER w7 AS n7,
           SUM(cents) OVER w14 AS sx14,
           COUNT(*) OVER w14 AS n14,
           MAX(value) OVER w7 AS max7,
           value - LAG(value, 1) OVER w1 AS delta1,
           ROW_NUMBER() OVER w1 AS obs_age
    FROM base
    WINDOW
        w1 AS (PARTITION BY user_id ORDER BY ts, event_id),
        w7 AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
        w14 AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
SELECT user_id, event_id,
       sx7 / (n7 * 100.0) AS value_avg_7d,
       sx14 / (n14 * 100.0) AS value_avg_14d,
       CASE WHEN n7 > 1
            THEN SQRT((n7 * sxx7 - sx7 * sx7) * 1.0
                      / (n7 * (n7 - 1))) / 100.0
            ELSE 0.0 END AS value_std_7d,
       max7 AS value_max_7d,
       COALESCE(delta1, 0) AS value_delta_1d,
       obs_age
FROM agg
"""


@query("ref_rolling_features", oracle=_ROLLING_ORACLE)
def ref_rolling_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    w1 = Window.partitionBy(ENTITY).orderBy(*ORDER)
    w7 = w1.rowsBetween(-6, 0)
    w14 = w1.rowsBetween(-13, 0)
    cents = F.round(F.col("value") * 100).cast("long")
    df = (
        load(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", "value")
        .withColumn("cents", cents)
        .withColumns(
            {
                "sx7": F.sum("cents").over(w7),
                "sxx7": F.sum(F.col("cents") * F.col("cents")).over(w7),
                "n7": F.count(F.lit(1)).over(w7),
                "sx14": F.sum("cents").over(w14),
                "n14": F.count(F.lit(1)).over(w14),
                "max7": F.max("value").over(w7),
                "delta1": F.col("value") - F.lag("value", 1).over(w1),
                "obs_age": F.row_number().over(w1),
            }
        )
    )
    return df.select(
        "user_id",
        "event_id",
        (F.col("sx7") / (F.col("n7") * 100.0)).alias("value_avg_7d"),
        (F.col("sx14") / (F.col("n14") * 100.0)).alias("value_avg_14d"),
        F.when(
            F.col("n7") > 1,
            F.sqrt(
                (F.col("n7") * F.col("sxx7") - F.col("sx7") * F.col("sx7"))
                * 1.0
                / (F.col("n7") * (F.col("n7") - 1))
            )
            / 100.0,
        )
        .otherwise(F.lit(0.0))
        .alias("value_std_7d"),
        F.col("max7").alias("value_max_7d"),
        F.coalesce(F.col("delta1"), F.lit(0)).alias("value_delta_1d"),
        "obs_age",
    )


# --------------------------------------------------------------------
# M1 / P5: chronological 3-way split profile
# (reference 04_prepare_training_data.py:29-40)
# --------------------------------------------------------------------
@query(
    "ref_chrono_split_counts",
    oracle=f"""
    SELECT CASE WHEN CAST(ts AS DATE) < DATE '2024-01-15' THEN 'train'
                WHEN CAST(ts AS DATE) < DATE '2024-01-25' THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n,
           CAST(SUM({_FAILURE_SQL}) AS BIGINT) AS failures
    FROM events GROUP BY split
    """,
)
def ref_chrono_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    day = F.to_date("ts")
    split = (
        F.when(day < F.lit("2024-01-15").cast("date"), "train")
        .when(day < F.lit("2024-01-25").cast("date"), "val")
        .otherwise("test")
    )
    return (
        load(spark, sf_dir, "events")
        .groupBy(split.alias("split"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_failure()).alias("failures"),
        )
    )


# --------------------------------------------------------------------
# M2 / U1: deterministic downsample + union (oracle-checkable twin of
# the seeded Bernoulli sample, reference 04:44-70)
# --------------------------------------------------------------------
@query(
    "ref_union_downsample",
    oracle=f"""
    WITH base AS (
        SELECT event_id, user_id, {_FAILURE_SQL} AS label FROM events
    )
    SELECT event_id, user_id, label
    FROM base WHERE label = 1 OR event_id % 20 = 0
    """,
)
def ref_union_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "events").select(
        "event_id", "user_id", _failure().alias("label")
    )
    return deterministic_downsample_negatives(df, "label", "event_id", 20)


# --------------------------------------------------------------------
# U1: unionByName proper — positives and modulus-sampled negatives
# built as two frames and recombined (reference 04:68). Distinct
# `part` tags keep the union's provenance checkable; DuckDB twin is
# UNION ALL. (ref_union_downsample re-expresses the same semantics as
# a single-scan filter — this query checks the union operator itself.)
# --------------------------------------------------------------------
@query(
    "ref_union_by_name",
    oracle=f"""
    WITH base AS (
        SELECT event_id, user_id, {_FAILURE_SQL} AS label FROM events
    )
    SELECT 'pos' AS part, event_id, user_id, label
    FROM base WHERE label = 1
    UNION ALL
    SELECT 'neg' AS part, event_id, user_id, label
    FROM base WHERE label = 0 AND event_id % 20 = 0
    """,
)
def ref_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "events").select(
        "event_id", "user_id", _failure().alias("label")
    )
    pos = df.filter(F.col("label") == 1).select(
        F.lit("pos").alias("part"), "event_id", "user_id", "label"
    )
    neg = df.filter(
        (F.col("label") == 0) & (F.col("event_id") % 20 == 0)
    ).select(F.lit("neg").alias("part"), "event_id", "user_id", "label")
    return pos.unionByName(neg)


# --------------------------------------------------------------------
# X1: seeded Bernoulli downsample — NOT cross-engine reproducible, so
# no oracle (driver's rows-only check). Reference 04:60-66.
# --------------------------------------------------------------------
@query("ref_sample_seeded")
def ref_sample_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    # single-pass form: one scan with `label=1 OR seeded-coin` instead
    # of the reference's pos-filter + neg-sample + union double scan
    df = load(spark, sf_dir, "events").select(
        "event_id", "user_id", _failure().alias("label")
    )
    return df.filter((F.col("label") == 1) | (F.rand(seed=42) < 0.1))


# --------------------------------------------------------------------
# P6/P7 + M8: alert decision + single-pass confusion matrix
# (reference 06_deployment_code.py:137-162; engine replaces the four
# filtered count() jobs with one groupBy)
# --------------------------------------------------------------------
@query(
    "ref_confusion_matrix",
    oracle=f"""
    SELECT CASE WHEN value >= {ALERT_THRESHOLD} THEN 1 ELSE 0 END AS alert,
           {_FAILURE_SQL} AS target,
           COUNT(*) AS n
    FROM events GROUP BY alert, target
    """,
)
def ref_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "events")
    return confusion_matrix(
        df, alert_decision("value", ALERT_THRESHOLD), _failure()
    )


# --------------------------------------------------------------------
# A2: alerts per calendar day (reference 06:177-182)
# --------------------------------------------------------------------
@query(
    "ref_alerts_daily",
    oracle=f"""
    SELECT CAST(ts AS DATE) AS day,
           CAST(SUM(CASE WHEN value >= {ALERT_THRESHOLD} THEN 1 ELSE 0 END)
                AS BIGINT) AS alerts
    FROM events GROUP BY day
    """,
)
def ref_alerts_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "events").withColumn(
        "alert", alert_decision("value", ALERT_THRESHOLD)
    )
    return alerts_per_day(df, "ts", "alert")


# --------------------------------------------------------------------
# A3: grand aggregate over the daily aggregate (reference 06:183)
# --------------------------------------------------------------------
@query(
    "ref_avg_alerts_per_day",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               SUM(CASE WHEN value >= {ALERT_THRESHOLD} THEN 1 ELSE 0 END)
                   AS alerts
        FROM events GROUP BY day
    )
    SELECT AVG(alerts) AS avg_alerts_per_day FROM daily
    """,
)
def ref_avg_alerts_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "events").withColumn(
        "alert", alert_decision("value", ALERT_THRESHOLD)
    )
    daily = alerts_per_day(df, "ts", "alert")
    return daily.agg(F.avg("alerts").alias("avg_alerts_per_day"))


# --------------------------------------------------------------------
# P7: multi-branch conditional expression (when/otherwise chain)
# --------------------------------------------------------------------
@query(
    "ref_when_otherwise",
    oracle="""
    SELECT CASE WHEN value >= 180 THEN 'high'
                WHEN value >= 100 THEN 'mid'
                ELSE 'low' END AS severity,
           COUNT(*) AS n,
           SUM(CAST(ROUND(value * 100) AS BIGINT)) / (COUNT(*) * 100.0)
               AS avg_value
    FROM events GROUP BY severity
    """,
)
def ref_when_otherwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact-cents mean: see ref_rolling_features comment — group sums of
    # raw doubles are accumulation-order-sensitive across engines
    severity = (
        F.when(F.col("value") >= 180, "high")
        .when(F.col("value") >= 100, "mid")
        .otherwise("low")
    )
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        load(spark, sf_dir, "events")
        .groupBy(severity.alias("severity"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(cents) / (F.count(F.lit(1)) * 100.0)).alias("avg_value"),
        )
    )


# --------------------------------------------------------------------
# O1/O4: deterministic order-by + limit (reference 02:149-152, 05_SHAP:116)
# --------------------------------------------------------------------
@query(
    "ref_order_limit",
    oracle="""
    SELECT event_id, user_id, value
    FROM events ORDER BY value DESC, event_id LIMIT 100
    """,
)
def ref_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .orderBy(F.col("value").desc(), F.col("event_id"))
        .limit(100)
        .select("event_id", "user_id", "value")
    )


# --------------------------------------------------------------------
# X2: capped sample — deterministic twin of the reference's
# sample(fraction).limit(n) SHAP-row cap (05_SHAP:109-116): modulus
# sampling + ordered limit, exactly reproducible cross-engine.
# --------------------------------------------------------------------
@query(
    "ref_capped_sample",
    oracle="""
    SELECT event_id, user_id, value
    FROM events WHERE event_id % 7 = 0
    ORDER BY event_id LIMIT 500
    """,
)
def ref_capped_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .filter(F.col("event_id") % 7 == 0)
        .orderBy("event_id")
        .limit(500)
        .select("event_id", "user_id", "value")
    )


# --------------------------------------------------------------------
# X3: seeded rand() sort key (reference 05_01:216) — not cross-engine
# reproducible, rows-only check. Event_id tie-break keeps the Spark
# result itself deterministic run-to-run.
# --------------------------------------------------------------------
@query("ref_random_order_limit")
def ref_random_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .orderBy(F.rand(seed=42), F.col("event_id"))
        .limit(100)
        .select("event_id", "user_id", "value")
    )


# --------------------------------------------------------------------
# O3: spot-check timeline — deterministic twin of the reference's
# `limit(1).collect()` drive pick (02:142-152): the MINIMUM user_id
# with a positive label (not "whichever row wins the race"), then its
# full ordered timeline. The 1-row pick is broadcast, not collected.
# --------------------------------------------------------------------
@query(
    "ref_spot_check_timeline",
    oracle=f"""
    WITH base AS (
        SELECT user_id, event_id, ts, {_FAILURE_SQL} AS failure
        FROM events
    ), labeled AS (
        SELECT *,
               CASE WHEN LEAD(failure, 1) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id) = 1
                    THEN 1 ELSE 0 END AS failure_next_24h
        FROM base
    )
    SELECT user_id, event_id, failure, failure_next_24h
    FROM labeled
    WHERE user_id = (SELECT MIN(user_id) FROM labeled
                     WHERE failure_next_24h = 1)
    """,
)
def ref_spot_check_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", _failure().alias("failure")
    )
    labeled = lead_label(df, ENTITY, ORDER, "failure")
    target = labeled.filter(F.col("failure_next_24h") == 1).agg(
        F.min("user_id").alias("target_user")
    )
    return (
        labeled.join(
            F.broadcast(target),
            labeled.user_id == F.col("target_user"),
        )
        .select("user_id", "event_id", "failure", "failure_next_24h")
    )


# --------------------------------------------------------------------
# W3+ [beyond-reference]: TIME-based rolling frame (rangeBetween).
# The reference's frames are row-based ("last 7 observations",
# 03:86-88); a drive with gaps sees more calendar time than 7 days.
# This is the calendar-time twin: sum/count of the last 2 HOURS of
# events per user — Window.orderBy(epoch seconds).rangeBetween.
# Same single exchange + sort as any window; the frame bound is
# evaluated per-row against the sort key, no extra shuffle.
# Sort key is EXACT MICROSECONDS on both engines (unix_micros /
# epoch_us): second-resolution keys floor in Spark but round in
# DuckDB, so sub-second events near the 7200 s frame edge would be
# in-frame in one engine and not the other (same hazard
# ref_gap_detection works around).
# --------------------------------------------------------------------
@query(
    "ref_time_range_window",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT)
               AS cents_2h,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_2h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 7200000000 PRECEDING AND CURRENT ROW)
    """,
)
def ref_time_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.expr("unix_micros(to_utc_timestamp(ts, 'UTC'))"))
        .rangeBetween(-7_200_000_000, Window.currentRow)
    )
    cents = F.round(F.col("value") * 100).cast("long")
    return load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.sum(cents).over(w).alias("cents_2h"),
        F.count(F.lit(1)).over(w).alias("n_2h"),
    )


# --------------------------------------------------------------------
# Date/time scalar batch [beyond-reference, §2.9 extended surface]:
# extraction, truncation, arithmetic — portable subset with identical
# semantics in DuckDB (weekday normalized to 0=Monday on both sides;
# Spark's dayofweek and DuckDB's dayofweek disagree on the anchor).
# --------------------------------------------------------------------
@query(
    "ref_datetime_funcs",
    oracle="""
    SELECT event_id,
           EXTRACT(year FROM ts) AS y,
           EXTRACT(month FROM ts) AS mo,
           EXTRACT(day FROM ts) AS d,
           EXTRACT(hour FROM ts) AS h,
           EXTRACT(minute FROM ts) AS mi,
           EXTRACT(quarter FROM ts) AS q,
           CAST(isodow(ts) - 1 AS INT) AS wday,
           CAST(date_trunc('month', ts) AS DATE) AS month_start,
           last_day(CAST(ts AS DATE)) AS month_end,
           date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
               AS days_since_epoch_start
    FROM events
    """,
)
def ref_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ts = F.col("ts")
    return load(spark, sf_dir, "events").select(
        "event_id",
        F.year(ts).cast("long").alias("y"),
        F.month(ts).cast("long").alias("mo"),
        F.dayofmonth(ts).cast("long").alias("d"),
        F.hour(ts).cast("long").alias("h"),
        F.minute(ts).cast("long").alias("mi"),
        F.quarter(ts).cast("long").alias("q"),
        F.weekday(ts).alias("wday"),
        F.date_trunc("month", ts).cast("date").alias("month_start"),
        F.last_day(ts).alias("month_end"),
        F.datediff(F.to_date(ts), F.lit("2024-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
    )


# --------------------------------------------------------------------
# applyInPandas (grouped map) [beyond-reference, §2.11 UDAF/UDTF row]:
# per-entity z-score normalization in pandas — the shape for custom
# per-group logic Spark expressions can't say. Arrow-batched, one
# shuffle on the group key, each group processed as one pandas frame.
# The pandas arithmetic replicates the exact-cents formula so the
# result is bit-identical to the SQL oracle (see ref_rolling_features
# comment for why).
#
# Scale note: a group must fit in one worker's memory — true for
# per-entity telemetry (thousands of rows/drive), NOT for, e.g.,
# grouping by day. Pre-aggregate or window instead when groups can be
# huge.
_GROUPED_ZSCORE_SQL = """
    WITH stats AS (
        SELECT user_id, event_id, value,
               SUM(cents) OVER w AS sx,
               SUM(cents * cents) OVER w AS sxx,
               COUNT(cents) OVER w AS n
        FROM (SELECT user_id, event_id, value,
                     CAST(ROUND(value * 100) AS BIGINT) AS cents
              FROM events)
        WINDOW w AS (PARTITION BY user_id)
    )
    SELECT event_id, user_id,
           -- n*sxx / sx*sx / n*(n-1) widened before multiplying
           -- (DuckDB window SUMs are HUGEINT already; sx*sx is the
           -- BIGINT product that aborts once a power user's summed
           -- cents square past 2^63 — Spark mirrors in decimal(38,0))
           CASE WHEN value IS NULL THEN NULL
                WHEN n > 1
                     AND (n * sxx - CAST(sx AS HUGEINT) * sx) > 0
                THEN (value - sx / (n * 100.0))
                     / (SQRT((n * sxx - CAST(sx AS HUGEINT) * sx) * 1.0
                             / (CAST(n AS HUGEINT) * (n - 1)))
                        / 100.0)
                ELSE 0.0 END AS zscore
    FROM stats
"""


# --------------------------------------------------------------------
@query(
    "ref_grouped_zscore",
    oracle=_GROUPED_ZSCORE_SQL,
)
def ref_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    def _zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        # NULL values carry no statistics (SQL AVG semantics) and get
        # a NULL z-score; Float64 (nullable) turns the NaNs they
        # propagate into real NULLs through Arrow
        cents = (pdf["value"].dropna() * 100).round().astype("int64")
        n = len(cents)
        sx = int(cents.sum())
        sxx = int((cents * cents).sum())
        if n > 1 and (n * sxx - sx * sx) > 0:
            mean = sx / (n * 100.0)
            std = ((n * sxx - sx * sx) * 1.0 / (n * (n - 1))) ** 0.5 / 100.0
            z = (pdf["value"] - mean) / std
        else:
            z = pd.Series(0.0, index=pdf.index).mask(pdf["value"].isna())
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": pdf["user_id"],
                "zscore": z.astype("Float64"),
            }
        )

    return (
        load(spark, sf_dir, "events")
        .select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandas(
            _zscore, "event_id BIGINT, user_id BIGINT, zscore DOUBLE"
        )
    )


# --------------------------------------------------------------------
# The JVM twin of ref_grouped_zscore: identical semantics (same
# oracle), pure whole-partition window expressions — no Python worker,
# no group-must-fit-a-worker constraint. THIS is the plan to run at
# 100 TB; the applyInPandas variant above exists as grouped-map
# operator coverage (round-2 verdict: 7-28x slower). Keeping both
# registered makes the cost of the Python hop measurable in every
# bench run.
# --------------------------------------------------------------------
@query("ref_grouped_zscore_expr", oracle=_GROUPED_ZSCORE_SQL)
def ref_grouped_zscore_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id")
    cents = F.round(F.col("value") * 100).cast("long")
    df = (
        load(spark, sf_dir, "events")
        .select("user_id", "event_id", "value", cents.alias("cents"))
        .withColumn("sx", F.sum("cents").over(w))
        .withColumn("sxx", F.sum(F.col("cents") * F.col("cents")).over(w))
        .withColumn("n", F.count("cents").over(w))
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    # cross-products widen to decimal(38,0) before multiplying (==
    # oracle HUGEINT): n*sxx and sx*sx wrap long once a power user's
    # summed cents square past 2^63
    dd = lambda c: c.cast("decimal(38,0)")
    var_num = dd(n) * sxx - dd(sx) * sx
    z = (F.col("value") - sx / (n * 100.0)) / (
        F.sqrt(var_num * 1.0 / (dd(n) * (n - 1))) / 100.0
    )
    return df.select(
        "event_id",
        "user_id",
        # a NULL value has no z-score (stats skip it, like SQL AVG)
        F.when(F.col("value").isNull(), F.lit(None).cast("double"))
        .when((n > 1) & (var_num > 0), z)
        .otherwise(F.lit(0.0))
        .alias("zscore"),
    )


# --------------------------------------------------------------------
# pandas_udf GROUPED_AGG (custom UDAF) [beyond-reference, §2.11]: an
# exact-cents mean as a user-defined aggregate — partial aggregation
# is handled by Spark; the pandas function sees each group's values as
# one Series. Bit-identical to the SQL integer-sum mean.
# --------------------------------------------------------------------
@query(
    "ref_grouped_agg_udaf",
    oracle="""
    SELECT event_type,
           SUM(CAST(ROUND(value * 100) AS BIGINT)) / (COUNT(value) * 100.0)
               AS exact_mean
    FROM events GROUP BY event_type
    """,
)
def ref_grouped_agg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.udafs import exact_cents_mean

    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(exact_cents_mean("value").alias("exact_mean"))
    )


# --------------------------------------------------------------------
# Error-safe casts (§2.9): try_cast/try_divide return NULL instead of
# failing under ANSI mode — the production posture for dirty inputs
# (a 100 TB ingest WILL contain malformed rows; a hard cast kills the
# whole job at hour five).
# --------------------------------------------------------------------
@query(
    "ref_try_cast",
    oracle="""
    SELECT CAST(SUM(CASE WHEN TRY_CAST(event_type AS INTEGER) IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_unparseable,
           CAST(SUM(CASE WHEN TRY_CAST(props AS DOUBLE) IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_double,
           CAST(SUM(CASE WHEN TRY_CAST(CAST(event_id AS VARCHAR) AS BIGINT)
                         IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_good_roundtrip,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM events
    """,
)
def ref_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    bad_int = F.col("event_type").try_cast("int").isNull()
    bad_dbl = F.col("props").try_cast("double").isNull()
    good_rt = (
        F.col("event_id").cast("string").try_cast("bigint").isNotNull()
    )
    return load(spark, sf_dir, "events").agg(
        F.sum(F.when(bad_int, 1).otherwise(0)).alias("n_unparseable"),
        F.sum(F.when(bad_dbl, 1).otherwise(0)).alias("n_bad_double"),
        F.sum(F.when(good_rt, 1).otherwise(0)).alias("n_good_roundtrip"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --------------------------------------------------------------------
# Session windows [beyond-reference, §2.10 batch twin]: per-user
# sessions with a 30-minute inactivity gap — Spark's session_window
# in a plain batch groupBy. The DuckDB oracle is the classic
# gaps-and-islands rewrite (lag -> new-session flag -> running sum),
# which is also exactly what Spark's operator computes, so starts and
# counts match exactly.
# --------------------------------------------------------------------
@query(
    "ref_session_windows",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               -- <= on purpose: Spark's session_window MERGES an event
               -- arriving EXACTLY gap after the previous one (window
               -- end is inclusive for the merge test; only gap+epsilon
               -- starts a new session) — verified empirically and
               -- pinned by tests/test_advice_fixes.py
               CASE WHEN ts - LAG(ts) OVER w <= INTERVAL 30 MINUTE
                    THEN 0 ELSE 1 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        -- the running sum must repeat the flag window's (ts, event_id)
        -- total order: with ts alone, peer order among equal-ts rows
        -- is unspecified, so a tie row can be summed BEFORE its
        -- flag=1 peer and land in the previous session — a
        -- nondeterministic oracle diverging from Spark's
        -- session_window, which merges all equal-ts events.
        SELECT user_id, ts,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
)
def ref_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .groupBy(
            F.session_window("ts", "30 minutes").alias("w"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
        )
    )


# --------------------------------------------------------------------
# Funnel analysis [beyond-reference]: per-user ordered conversion
# view -> click -> purchase, each step's first timestamp required to
# follow the previous step's. One conditional-min window pass per
# user (single exchange), then a global funnel rollup.
# --------------------------------------------------------------------
@query(
    "ref_funnel",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END)
                   AS t_purchase
        FROM events GROUP BY user_id
    ),
    steps AS (
        SELECT user_id,
               CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS s1,
               CASE WHEN t_view IS NOT NULL AND t_click > t_view
                    THEN 1 ELSE 0 END AS s2,
               CASE WHEN t_view IS NOT NULL AND t_click > t_view
                         AND t_purchase > t_click
                    THEN 1 ELSE 0 END AS s3
        FROM firsts
    )
    SELECT CAST(SUM(s1) AS BIGINT) AS n_viewed,
           CAST(SUM(s2) AS BIGINT) AS n_clicked_after_view,
           CAST(SUM(s3) AS BIGINT) AS n_purchased_after_click,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM steps
    """,
)
def ref_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    et = F.col("event_type")
    firsts = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.min(F.when(et == "view", F.col("ts"))).alias("t_view"),
            F.min(F.when(et == "click", F.col("ts"))).alias("t_click"),
            F.min(F.when(et == "purchase", F.col("ts"))).alias("t_purchase"),
        )
    )
    s1 = F.when(F.col("t_view").isNotNull(), 1).otherwise(0)
    s2 = F.when(
        F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view")), 1
    ).otherwise(0)
    s3 = F.when(
        F.col("t_view").isNotNull()
        & (F.col("t_click") > F.col("t_view"))
        & (F.col("t_purchase") > F.col("t_click")),
        1,
    ).otherwise(0)
    return firsts.agg(
        F.sum(s1).alias("n_viewed"),
        F.sum(s2).alias("n_clicked_after_view"),
        F.sum(s3).alias("n_purchased_after_click"),
        F.count(F.lit(1)).alias("n_users"),
    )


# --------------------------------------------------------------------
# Sessionized funnel conversion [beyond-reference]: ref_funnel over
# SESSIONS instead of whole user histories — the metric product teams
# actually report ("did this visit convert", not "did this user ever
# convert"). Composes the two existing primitives: per-user 30-minute
# session_window grouping (ref_session_windows) carries the
# conditional first-step timestamps of ref_funnel in the SAME
# aggregate, so sessionize + funnel is still one exchange on user_id
# and one rollup — no join between a session table and an event
# table, the session IS the group. Oracle: the gaps-and-islands
# rewrite (lag -> flag -> running sum, <= gap merges exactly like
# Spark's session_window) feeding identical conditional mins.
# --------------------------------------------------------------------
@query(
    "ref_session_funnel",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN ts - LAG(ts) OVER w <= INTERVAL 30 MINUTE
                    THEN 0 ELSE 1 END AS new_session
        FROM events WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        -- (ts, event_id) repeats the flag window's total order so the
        -- running sum is deterministic on equal-ts ties (see
        -- ref_session_windows for the failure mode with ts alone)
        SELECT user_id, event_type, ts,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    ),
    firsts AS (
        SELECT user_id, session_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END)
                   AS t_purchase
        FROM sess GROUP BY user_id, session_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_viewed,
           CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clicked_after_view,
           CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                              AND t_purchase > t_click
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS n_purchased_after_click
    FROM firsts
    """,
)
def ref_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    et = F.col("event_type")
    firsts = (
        load(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .groupBy(
            F.session_window("ts", "30 minutes").alias("w"),
            F.col("user_id"),
        )
        .agg(
            F.min(F.when(et == "view", F.col("ts"))).alias("t_view"),
            F.min(F.when(et == "click", F.col("ts"))).alias("t_click"),
            F.min(F.when(et == "purchase", F.col("ts"))).alias(
                "t_purchase"
            ),
        )
    )
    s1 = F.col("t_view").isNotNull()
    s2 = s1 & (F.col("t_click") > F.col("t_view"))
    s3 = s2 & (F.col("t_purchase") > F.col("t_click"))
    as_int = lambda c: F.sum(F.when(c, 1).otherwise(0))
    return firsts.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        as_int(s1).alias("n_viewed"),
        as_int(s2).alias("n_clicked_after_view"),
        as_int(s3).alias("n_purchased_after_click"),
    )


# --------------------------------------------------------------------
# Telemetry gap detection [beyond-reference]: the reference's row
# frames assume contiguous daily rows (03:86-88); real fleets have
# gaps. Per-entity lag + epoch arithmetic finds them — exact integer
# seconds, one window pass.
# --------------------------------------------------------------------
@query(
    "ref_gap_detection",
    oracle="""
    WITH gaps AS (
        SELECT user_id,
               epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS gap_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(SUM(CASE WHEN gap_us > 7200000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_gaps_over_2h,
           MAX(gap_us) AS max_gap_us,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM gaps GROUP BY user_id
    """,
)
def ref_gap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact integer MICROseconds on both sides: second-level epoch
    # differs cross-engine on sub-second timestamps (floor vs round)
    us = F.expr("unix_micros(to_utc_timestamp(ts, 'UTC'))")
    gap = us - F.expr(
        "unix_micros(to_utc_timestamp(lag(ts, 1) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id), 'UTC'))"
    )
    return (
        load(spark, sf_dir, "events")
        .withColumn("gap_us", gap)
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("gap_us") > 7_200_000_000, 1).otherwise(0)
            ).alias("n_gaps_over_2h"),
            F.max("gap_us").alias("max_gap_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# --------------------------------------------------------------------
# min_by / max_by aggregates [beyond-reference]: per-entity argmax —
# the row that set the extreme, without a window or self-join.
# Tie-break: max_by on a composite struct would be engine-ambiguous;
# values here are (value, event_id) pairs made unique via cents*2^20.
# --------------------------------------------------------------------
@query(
    "ref_argmax_event",
    oracle="""
    SELECT user_id,
           arg_max(event_id, CAST(ROUND(value * 100) AS BIGINT) * 1048576
                             + event_id % 1048576) AS peak_event_id,
           MAX(value) AS peak_value
    FROM events GROUP BY user_id
    """,
)
def ref_argmax_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    # unique ordering key: cents in the high bits, event_id low bits
    key = (
        F.round(F.col("value") * 100).cast("long") * 1048576
        + F.col("event_id") % 1048576
    )
    return (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.expr(
                "max_by(event_id, round(value * 100) * 1048576 "
                "+ event_id % 1048576)"
            ).alias("peak_event_id"),
            F.max("value").alias("peak_value"),
        )
    )


# --------------------------------------------------------------------
# W+ [beyond-reference]: SLIDING time window (hypertable-style rollup).
# F.window(ts, "7 days", "1 day") assigns each event to its 7
# overlapping epoch-aligned windows — Spark plans this as an internal
# explode + ONE hash aggregate (no self-join, no window-function sort).
# The oracle replicates the alignment arithmetic: window starts are
# day(ts) - k for k in 0..6. Cents-exact sums; counts as BIGINT.
# At scale this is the pre-aggregation shape for any "last-7-days"
# dashboard: shuffle carries one partial per (window, partition) —
# map-side combine keeps it O(windows), not O(events).
# --------------------------------------------------------------------
@query(
    "ref_sliding_window_daily",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) - CAST(k AS INT) AS win_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events CROSS JOIN range(0, 7) AS t(k)
    GROUP BY win_start
    """,
)
def ref_sliding_window_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "7 days", "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents).alias("cents"),
        )
        .select(
            F.to_date(F.col("w.start")).alias("win_start"),
            "n_events",
            "cents",
        )
    )


@query(
    "ref_grouped_arrow_stats",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents,
           CAST(MIN(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS min_cents,
           CAST(MAX(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS max_cents
    FROM events
    GROUP BY user_id
    """,
)
def ref_grouped_arrow_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped map via ``applyInArrow`` — the pyarrow-native grouped
    UDF surface (Spark 4): the group arrives as an Arrow Table, stats
    are computed with ``pyarrow.compute`` kernels (no pandas
    conversion), and the result goes back as an Arrow Table. All
    arithmetic is exact int64 cents, so the DuckDB oracle matches
    bit-for-bit.

    Scale: same contract as applyInPandas — one shuffle on the group
    key, each group must fit a worker — but skips the Arrow->pandas
    materialization both ways, the cheapest possible Python grouped
    hop. The JVM twin is a plain groupBy (the oracle); this query
    exists to pin the operator, like ref_grouped_zscore does for the
    pandas path."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(table: "pa.Table") -> "pa.Table":
        # round_mode matters: pyarrow defaults to half-to-even, but
        # DuckDB/Spark ROUND on doubles is half away from zero
        cents = pc.cast(
            pc.round(
                pc.multiply(table.column("value"), 100.0),
                options=pc.RoundOptions(round_mode="half_towards_infinity"),
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "user_id": pa.array([table.column("user_id")[0].as_py()], pa.int64()),
                "n_events": pa.array([table.num_rows], pa.int64()),
                "sum_cents": pa.array([pc.sum(cents).as_py()], pa.int64()),
                "min_cents": pa.array([pc.min(cents).as_py()], pa.int64()),
                "max_cents": pa.array([pc.max(cents).as_py()], pa.int64()),
            }
        )

    return (
        load(spark, sf_dir, "events")
        .select("user_id", "value")
        .groupBy("user_id")
        .applyInArrow(
            stats,
            schema=(
                "user_id long, n_events long, sum_cents long, "
                "min_cents long, max_cents long"
            ),
        )
    )


# --------------------------------------------------------------------
# ANSI-safe arithmetic family (try_add / try_subtract / try_multiply /
# try_divide / try_sum / try_avg): under ANSI mode (the engine
# default) plain operators THROW on overflow and division-by-zero;
# the try_* forms return NULL instead — the right semantics for
# dirty-data aggregation where one bad row must not kill a 100 TB
# job. Pins NULL-on-edge behavior and try_sum == sum equivalence on
# clean data. Extends ref_try_cast (P-family error safety).
# --------------------------------------------------------------------
@query(
    "ref_try_arithmetic",
    oracle="""
    SELECT CAST(NULL AS BIGINT) AS div_zero,
           CAST(NULL AS BIGINT) AS mul_overflow,
           CAST(NULL AS BIGINT) AS add_overflow,
           (SELECT CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
            FROM events) AS try_sum_cents,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM events
            WHERE value / 1.0 IS NOT NULL) AS n_clean_div
    """,
)
def ref_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    agg = ev.agg(
        F.try_sum(F.round(F.col("value") * 100).cast("long")).alias(
            "try_sum_cents"
        ),
        # count-if, not sum(when): SUM over zero rows is NULL where
        # the oracle's COUNT(*) is 0 (empty-corpus parity sweep)
        F.count(
            F.when(
                F.try_divide(F.col("value"), F.lit(1.0)).isNotNull(), 1
            )
        ).alias("n_clean_div"),
    )
    return agg.select(
        F.try_divide(F.lit(1).cast("long"), F.lit(0).cast("long"))
        .cast("long")
        .alias("div_zero"),
        F.try_multiply(
            F.lit(9223372036854775807).cast("long"), F.lit(2).cast("long")
        ).alias("mul_overflow"),
        F.try_add(
            F.lit(9223372036854775807).cast("long"), F.lit(1).cast("long")
        ).alias("add_overflow"),
        "try_sum_cents",
        "n_clean_div",
    )


# --------------------------------------------------------------------
# W+ [beyond-reference]: exponentially weighted moving average per
# entity, closed form. The recursive definition
#     s_1 = x_1 ;  s_i = a*x_i + (1-a)*s_{i-1}
# is not directly expressible as a Spark window aggregate (no
# recursive frames), but the closed form
#     s_n = (1-a)^(n-1) * x_1  +  a * sum_{i=2..n} (1-a)^(n-i) * x_i
# is a plain weighted sum: one window pass (row_number + partition
# count share a single hash exchange on user_id) followed by a
# group-by on the SAME key — Catalyst reuses the partitioning, so
# the whole query is one shuffle. At 100 TB this is the per-entity
# smoothing shape you want: no iteration, no driver loop, no UDF.
# Weights underflow to exact 0.0 identically in both engines for
# long histories (IEEE 754), so cross-engine parity holds at any
# partition length.
# --------------------------------------------------------------------
_EWMA_ALPHA = 0.3


@query(
    "ref_ewma_smoothing",
    oracle=f"""
    SELECT user_id,
           CAST(MAX(n) AS BIGINT) AS n_events,
           ROUND(SUM(CASE WHEN rn = 1
                          THEN power({1 - _EWMA_ALPHA}, n - 1)
                          ELSE {_EWMA_ALPHA}
                               * power({1 - _EWMA_ALPHA}, n - rn)
                     END * value), 6) AS ewma
    FROM (SELECT user_id, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn,
                 COUNT(*) OVER (PARTITION BY user_id) AS n
          FROM events)
    GROUP BY user_id
    """,
)
def ref_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final EWMA state per user (alpha=0.3) via the closed-form
    weighted sum — window + same-key group-by, one shuffle total."""
    w = Window.partitionBy(ENTITY).orderBy(*ORDER)
    wp = Window.partitionBy(ENTITY)
    a = _EWMA_ALPHA
    rows = load(spark, sf_dir, "events").select(
        ENTITY,
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    weight = F.when(
        F.col("rn") == 1, F.pow(F.lit(1 - a), F.col("n") - 1)
    ).otherwise(F.lit(a) * F.pow(F.lit(1 - a), F.col("n") - F.col("rn")))
    return rows.groupBy(ENTITY).agg(
        F.max("n").cast("long").alias("n_events"),
        F.round(F.sum(weight * F.col("value")), 6).alias("ewma"),
    )


# --------------------------------------------------------------------
# Gap-fill by linear interpolation over the densified daily series.
# The reference's telemetry has exactly this problem — drives miss
# snapshot days and its rolling features silently shrink their window
# (03_feature_engineering.py:90-143 never densifies); here the gap is
# repaired explicitly: per-entity day spine (sequence + explode), the
# observed daily value joined on, and missing days filled as
#   prev + (next - prev) * elapsed/gap_len
# with edge days carried from the nearest observation.
#
# Determinism discipline: the daily series is MAX(value) (order-
# insensitive — a SUM would depend on accumulation order across
# engines), and the interpolation arithmetic mirrors the oracle's
# operation order exactly. Scale shape: one exchange on user_id for
# the spine windows; the spine explode is bounded by the date range,
# not the event count.
# --------------------------------------------------------------------
@query(
    "ref_linear_interpolate",
    oracle="""
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day, MAX(value) AS v
        FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    bounds AS (
        SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
        FROM daily GROUP BY user_id
    ),
    spine AS (
        SELECT user_id,
               CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
                    AS DATE) AS day
        FROM bounds
    ),
    j AS (
        SELECT s.user_id, s.day, d.v
        FROM spine s LEFT JOIN daily d USING (user_id, day)
    ),
    w AS (
        SELECT user_id, day, v,
               last_value(v IGNORE NULLS) OVER
                   (PARTITION BY user_id ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS pv,
               last_value(CASE WHEN v IS NOT NULL THEN day END
                          IGNORE NULLS) OVER
                   (PARTITION BY user_id ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS pd,
               first_value(v IGNORE NULLS) OVER
                   (PARTITION BY user_id ORDER BY day
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS nv,
               first_value(CASE WHEN v IS NOT NULL THEN day END
                           IGNORE NULLS) OVER
                   (PARTITION BY user_id ORDER BY day
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS nd
        FROM j
    )
    SELECT user_id, day, v IS NOT NULL AS is_observed,
           ROUND(CASE WHEN v IS NOT NULL THEN v
                      WHEN pv IS NULL THEN nv
                      WHEN nv IS NULL THEN pv
                      ELSE pv + (nv - pv)
                           * (CAST(day - pd AS DOUBLE)
                              / CAST(nd - pd AS DOUBLE))
                 END, 6) AS v_filled
    FROM w
    """,
)
def ref_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.max("value").alias("v"))
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(
                F.sequence("d0", "d1", F.expr("interval 1 day"))
            ).alias("day"),
        )
    )
    # shuffle_hash hint: daily is O(user-days) — the spine join must
    # shuffle at scale, not broadcast-build from a pruned estimate
    j = spine.join(daily.hint("shuffle_hash"), ["user_id", "day"], "left")
    wb = Window.partitionBy("user_id").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wf = Window.partitionBy("user_id").orderBy("day").rowsBetween(
        0, Window.unboundedFollowing
    )
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    pv = F.last("v", ignorenulls=True).over(wb)
    pd_ = F.last(obs_day, ignorenulls=True).over(wb)
    nv = F.first("v", ignorenulls=True).over(wf)
    nd = F.first(obs_day, ignorenulls=True).over(wf)
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(pv.isNull(), nv)
        .when(nv.isNull(), pv)
        .otherwise(
            pv
            + (nv - pv)
            * (
                F.datediff(F.col("day"), pd_).cast("double")
                / F.datediff(nd, pd_).cast("double")
            )
        )
    )
    return j.select(
        "user_id",
        "day",
        F.col("v").isNotNull().alias("is_observed"),
        F.round(filled, 6).alias("v_filled"),
    )


# --------------------------------------------------------------------
# W+ [beyond-reference]: seasonal-naive forecast evaluation (MASE,
# Hyndman & Koehler 2006) over the daily per-type series — the
# standard scale-free answer to "is this telemetry forecastable, and
# does weekly seasonality help". Numerator: MAE of the 7-day
# seasonal-naive forecast; denominator: MAE of the 1-day naive.
# The daily means are identical double expressions over exact cents,
# lags are per-type windows (partitioned — one hash exchange shared
# by both lags), and each MAE sums O(days) values. At 100 TB the
# daily reduce is the only corpus-sized stage.
# --------------------------------------------------------------------
@query(
    "ref_mase_seasonal_eval",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               (CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE)
                / 100.0) / COUNT(*) AS m
        FROM events GROUP BY event_type, day
    ),
    lagged AS (
        SELECT event_type,
               m,
               LAG(m, 7) OVER (PARTITION BY event_type ORDER BY day)
                   AS m7,
               LAG(m, 1) OVER (PARTITION BY event_type ORDER BY day)
                   AS m1
        FROM daily
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(CASE WHEN m7 IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_seasonal,
           ROUND(SUM(CASE WHEN m7 IS NOT NULL THEN abs(m - m7) END)
                 / SUM(CASE WHEN m7 IS NOT NULL THEN 1 END), 6)
               AS mae_seasonal,
           ROUND(SUM(CASE WHEN m1 IS NOT NULL THEN abs(m - m1) END)
                 / SUM(CASE WHEN m1 IS NOT NULL THEN 1 END), 6)
               AS mae_naive,
           ROUND((SUM(CASE WHEN m7 IS NOT NULL THEN abs(m - m7) END)
                  / SUM(CASE WHEN m7 IS NOT NULL THEN 1 END))
                 / (SUM(CASE WHEN m1 IS NOT NULL THEN abs(m - m1) END)
                    / SUM(CASE WHEN m1 IS NOT NULL THEN 1 END)), 6)
               AS mase
    FROM lagged
    GROUP BY event_type
    """,
)
def ref_mase_seasonal_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            (
                (
                    F.sum(
                        F.round(F.col("value") * 100).cast("long")
                    ).cast("double")
                    / F.lit(100.0)
                )
                / F.count(F.lit(1))
            ).alias("m")
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "m",
        F.lag("m", 7).over(w).alias("m7"),
        F.lag("m", 1).over(w).alias("m1"),
    )
    d7 = F.when(F.col("m7").isNotNull(), F.abs(F.col("m") - F.col("m7")))
    d1 = F.when(F.col("m1").isNotNull(), F.abs(F.col("m") - F.col("m1")))
    c7 = F.when(F.col("m7").isNotNull(), F.lit(1))
    c1 = F.when(F.col("m1").isNotNull(), F.lit(1))
    mae7 = F.sum(d7) / F.sum(c7)
    mae1 = F.sum(d1) / F.sum(c1)
    return lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        # count(m7), not sum(when(...)): a series shorter than the
        # season has ZERO seasonal comparisons, not NULL (sum over an
        # all-NULL when() loses the oracle's ELSE 0)
        F.count("m7").alias("n_seasonal"),
        F.round(mae7, 6).alias("mae_seasonal"),
        F.round(mae1, 6).alias("mae_naive"),
        F.round(mae7 / mae1, 6).alias("mase"),
    )


# --------------------------------------------------------------------
# W+ [beyond-reference]: gaps-and-islands — longest consecutive
# error-day streak per user, the classic "consecutive days" SQL
# pattern (row_number-minus-date constant-group trick) and the
# operational question the reference's alerting actually raises
# ("how long has this drive been flagging?"). Two windows share one
# user_id exchange; the island key is exact integer day arithmetic.
# --------------------------------------------------------------------
@query(
    "ref_longest_error_streak",
    oracle="""
    WITH ed AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        FROM events WHERE event_type = 'error'
    ),
    isl AS (
        SELECT user_id, day,
               CAST(day - ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY day
               ) * INTERVAL 1 DAY AS DATE) AS island
        FROM ed
    ),
    runs AS (
        SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS streak,
               MIN(day) AS streak_start
        FROM isl GROUP BY user_id, island
    ),
    best AS (
        SELECT user_id, streak, streak_start,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id
                   ORDER BY streak DESC, streak_start
               ) AS rn
        FROM runs
    )
    SELECT user_id, streak AS longest_streak, streak_start
    FROM best WHERE rn = 1
    """,
)
def ref_longest_error_streak(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ed = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    isl = ed.withColumn(
        "island",
        F.date_sub(F.col("day"), F.row_number().over(w)),
    )
    runs = isl.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("streak"),
        F.min("day").alias("streak_start"),
    )
    wb = Window.partitionBy("user_id").orderBy(
        F.desc("streak"), "streak_start"
    )
    return (
        runs.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("streak").alias("longest_streak"),
            "streak_start",
        )
    )


# --------------------------------------------------------------------
# W+ [beyond-reference]: burstiness (Fano factor) of per-user
# inter-arrival times — var/mean of the gaps QUANTIZED TO WHOLE
# SECONDS (integer division, identical in both engines; keeps the
# sum-of-squares inside BIGINT at any realistic gap), the
# telemetry-health probe that separates steady heartbeats (Fano ~
# small) from bursty error storms. Variance via the sum/sum-of-
# squares identity on integers, one division at the end, so
# cross-engine parity is exact. One user_id exchange shared by the
# lag window and the group-by.
# --------------------------------------------------------------------
@query(
    "ref_interarrival_burstiness",
    oracle="""
    WITH gaps AS (
        SELECT user_id,
               CAST(date_diff('microseconds', LAG(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ), ts) AS BIGINT) // 1000000 AS gap_s
        FROM events
    ),
    s AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
               CAST(SUM(gap_s) AS BIGINT) AS s1,
               CAST(SUM(gap_s * gap_s) AS BIGINT) AS s2
        FROM gaps WHERE gap_s IS NOT NULL
        GROUP BY user_id
        HAVING COUNT(*) >= 2 AND SUM(gap_s) > 0
    )
    SELECT user_id, n_gaps,
           ROUND((CAST(s2 AS DOUBLE) / n_gaps
                  - (CAST(s1 AS DOUBLE) / n_gaps)
                    * (CAST(s1 AS DOUBLE) / n_gaps))
                 / (CAST(s1 AS DOUBLE) / n_gaps), 6)
               AS fano_seconds
    FROM s
    """,
)
def ref_interarrival_burstiness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        load(spark, sf_dir, "events")
        .withColumn("prev_ts", F.lag("ts").over(w))
        .select(
            "user_id",
            F.expr(
                "timestampdiff(MICROSECOND, prev_ts, ts) div 1000000"
            ).alias("gap_s"),
        )
    )
    s = (
        gaps.filter(F.col("gap_s").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum("gap_s").alias("s1"),
            F.sum(F.col("gap_s") * F.col("gap_s")).alias("s2"),
        )
        .filter((F.col("n_gaps") >= 2) & (F.col("s1") > 0))
    )
    mean = F.col("s1").cast("double") / F.col("n_gaps")
    return s.select(
        "user_id",
        "n_gaps",
        F.round(
            (F.col("s2").cast("double") / F.col("n_gaps") - mean * mean)
            / mean,
            6,
        ).alias("fano_seconds"),
    )
