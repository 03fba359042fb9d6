"""ML-pipeline queries (reference M3-M9, F1-F3, S5/S6, A5).

The reference's deliverable is train -> score -> threshold -> alert
(/root/reference/scripts/05_01_model_training_xgboost_oom_fix.py,
06_deployment_code.py). Here that capability is re-expressed
Spark-first over the ``events`` fixture:

  * positive class    = ``event_type = 'error'`` (stand-in for
    ``failure``; same 0/1 contract)
  * model             = deployed ``LinearModel`` scoring features
    ``(value, is_error)`` — stands in for the reference's booster
    artifact; scored BOTH via Arrow pandas_udf (broadcast model,
    F1/F2 replacement) and via a pure JVM column expression, each
    checked against the same DuckDB oracle
  * threshold         = exact (1 - recall) percentile of positive
    scores (M6 Spark-native twin of 05_01:227-237)
  * alerting/metrics  = single-pass confusion + PR curve (M8/M5)

Determinism: the scorer uses the softsign sigmoid (see ml/scorer.py)
so scores are bit-identical across Spark, pandas/numpy, and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..ml.monitor import DRIFT_SPLIT, N_SCORE_BINS, drift_histogram, score_decile_bin
from ..ml.scorer import LinearModel, score_column, score_pandas_udf
from ..ml.threshold import threshold_at_recall
from ..sources.catalog import load
from . import query

# Deployed model stand-in (reference models/xgboost_backblaze.json):
# z = -2.5 + 0.02*value + 0.3*is_error, p = softsign_sigmoid(z)
MODEL = LinearModel(
    features=("value", "is_error"),
    weights=(0.02, 0.3),
    intercept=-2.5,
)
RECALL_TARGET = 0.8

# Exact same arithmetic, same evaluation order, in ANSI SQL. Explicit
# DOUBLE casts keep DuckDB from doing DECIMAL arithmetic on literals.
_Z_SQL = (
    "CAST(-2.5 AS DOUBLE) + CAST(0.02 AS DOUBLE) * value "
    "+ CAST(0.3 AS DOUBLE) * is_error"
)
_SCORED_SQL = f"""
    SELECT event_id, user_id, ts, value, is_error,
           0.5 * (1.0 + z / (1.0 + ABS(z))) AS failure_probability
    FROM (
        SELECT *, {_Z_SQL} AS z
        FROM (
            SELECT event_id, user_id, ts, value,
                   CAST(CASE WHEN event_type = 'error' THEN 1 ELSE 0
                        END AS DOUBLE) AS is_error
            FROM events
        )
    )
"""


def _features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature frame the deployed model consumes (reference
    06_deployment_code.py:89-100 FEATURES contract)."""
    return load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.when(F.col("event_type") == "error", 1.0)
        .otherwise(0.0)
        .alias("is_error"),
    )


def scored_frame(
    spark: SparkSession, sf_dir: str, via: str = "pandas_udf"
) -> DataFrame:
    """events scored by the deployed model; ``via`` picks the
    pandas_udf (broadcast model) or JVM column-expression plan."""
    df = _features(spark, sf_dir)
    if via == "pandas_udf":
        udf = score_pandas_udf(spark, MODEL)
        return df.withColumn("failure_probability", udf(*MODEL.features))
    return df.withColumn("failure_probability", score_column(MODEL))


# --------------------------------------------------------------------
# F1/F2: vectorized model scoring via pandas_udf (broadcast model).
# Replaces the reference's per-row UDF (05_01:135-139, 06:110-124).
# --------------------------------------------------------------------
@query(
    "mlops_score_pandas_udf",
    oracle=f"""
    SELECT event_id, user_id, is_error, failure_probability
    FROM ({_SCORED_SQL})
    """,
)
def mlops_score_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scored_frame(spark, sf_dir, via="pandas_udf").select(
        "event_id", "user_id", "is_error", "failure_probability"
    )


# --------------------------------------------------------------------
# Same semantics as a pure JVM column expression (whole-stage codegen,
# no Python worker) — the plan a linear model should actually use.
# Shares the oracle with the pandas_udf path: three-way agreement.
# --------------------------------------------------------------------
@query(
    "mlops_score_column_expr",
    oracle=f"""
    SELECT event_id, user_id, is_error, failure_probability
    FROM ({_SCORED_SQL})
    """,
)
def mlops_score_column_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scored_frame(spark, sf_dir, via="column").select(
        "event_id", "user_id", "is_error", "failure_probability"
    )


# --------------------------------------------------------------------
# A5: scale_pos_weight ratio in ONE conditional-aggregation pass
# (reference 05_01:103 runs two count() jobs).
# --------------------------------------------------------------------
@query(
    "mlops_scale_pos_weight",
    oracle="""
    SELECT CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pos,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 0 ELSE 1 END)
                AS BIGINT) AS n_neg,
           SUM(CASE WHEN event_type = 'error' THEN 0 ELSE 1 END) * 1.0
               / SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               AS scale_pos_weight
    FROM events
    """,
)
def mlops_scale_pos_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    is_err = F.when(F.col("event_type") == "error", 1).otherwise(0)
    return load(spark, sf_dir, "events").agg(
        F.sum(is_err).alias("n_pos"),
        F.sum(1 - is_err).alias("n_neg"),
        (F.sum(1 - is_err) * 1.0 / F.sum(is_err)).alias("scale_pos_weight"),
    )


# --------------------------------------------------------------------
# M6: threshold-at-recall — exact percentile on positives, no driver
# collect (Spark-native twin of 05_01:227-237).
# --------------------------------------------------------------------
@query(
    "mlops_threshold_at_recall",
    oracle=f"""
    SELECT quantile_cont(failure_probability, {1.0 - RECALL_TARGET})
               AS threshold,
           COUNT(*) AS n_pos
    FROM ({_SCORED_SQL}) WHERE is_error = 1
    """,
)
def mlops_threshold_at_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = scored_frame(spark, sf_dir, via="column")
    return threshold_at_recall(
        scored, "failure_probability", "is_error", RECALL_TARGET
    )


# --------------------------------------------------------------------
# End-to-end M6+M7+M8: score -> select threshold -> alert -> one-pass
# confusion matrix. The 1-row threshold is broadcast into the scored
# frame (a crossJoin of a 1-row frame — scale-free). Threshold is
# rounded to 6dp on BOTH sides so interpolation ulp noise cannot flip
# boundary rows differently per engine.
# --------------------------------------------------------------------
@query(
    "mlops_alert_confusion",
    oracle=f"""
    WITH scored AS ({_SCORED_SQL}),
    thr AS (
        SELECT ROUND(quantile_cont(failure_probability,
                                   {1.0 - RECALL_TARGET}), 6) AS threshold
        FROM scored WHERE is_error = 1
    )
    SELECT CASE WHEN failure_probability >= threshold THEN 1 ELSE 0
           END AS alert,
           CAST(is_error AS INT) AS target,
           COUNT(*) AS n
    FROM scored, thr
    GROUP BY alert, target
    """,
)
def mlops_alert_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.staging import stage_boundary

    # scored feeds the threshold selection and the confusion regroup —
    # unstaged, the events scan + scoring ran twice (round-13 scan
    # sweep: events x2). Staged, one pass. Round 14: only the two
    # columns both consumers read are persisted (guide §2.3 — the
    # round-13 version cached all six).
    from ..operators.staging import ab_off

    scored = scored_frame(spark, sf_dir, via="column")
    if not ab_off("alert_narrow_stage"):
        scored = scored.select("is_error", "failure_probability")
    scored = stage_boundary(scored, materialize=False)
    thr = (
        threshold_at_recall(
            scored, "failure_probability", "is_error", RECALL_TARGET
        )
        .select(F.round("threshold", 6).alias("threshold"))
    )
    return (
        scored.crossJoin(F.broadcast(thr))
        .groupBy(
            F.when(F.col("failure_probability") >= F.col("threshold"), 1)
            .otherwise(0)
            .alias("alert"),
            F.col("is_error").cast("int").alias("target"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------
# M5: full precision-recall curve, Spark-native (reference computes it
# in sklearn on a driver-side sample, Appendix:130-162). Cumulative
# TP/alert counts in score-descending order give precision/recall at
# every cut point. All-integer cumulative counts -> exact division ->
# cross-engine reproducible.
#
# Scale: BOTH running counts (alerts and true positives) come from one
# shared pass of the distributed two-level prefix sum
# (operators/prefix.py:global_prefix_sums) — literal bucket
# boundaries over (-score, event_id), per-bucket scans, a K-row
# offset table — never an unpartitioned window, so the exact curve
# survives 100x.
# The K-threshold twin (mlops_pr_at_thresholds) remains the cheaper
# fixed-size-output summary when the full curve isn't needed.
# --------------------------------------------------------------------
@query(
    "mlops_pr_curve",
    oracle=f"""
    WITH scored AS ({_SCORED_SQL}),
    ranked AS (
        SELECT is_error,
               ROW_NUMBER() OVER w AS n_alerts,
               CAST(SUM(is_error) OVER w AS BIGINT) AS n_tp
        FROM scored
        WINDOW w AS (ORDER BY failure_probability DESC, event_id)
    )
    SELECT n_alerts,
           n_tp * 1.0 / n_alerts AS precision,
           n_tp * 1.0 / (SELECT SUM(is_error) FROM scored) AS recall
    FROM ranked
    WHERE n_alerts % 100 = 0 OR n_alerts = 1
    """,
)
def mlops_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import global_prefix_sums
    from ..operators.staging import ab_off, stage_boundary

    # the scored frame feeds three consumers (total-pos aggregate,
    # the prefix-sum data branch, and the prefix operator's boundary
    # percentile aggregate) — unstaged, the events scan + feature +
    # scoring pipeline ran three times (round-13 scan sweep: events
    # x3 in this plan). Staged: one pass (guide §2.4).
    #
    # Round 14: stage only the three columns the consumers read
    # (event_id, is_error, failure_probability) — user_id, ts and
    # value were cached too in round 13, doubling the persisted bytes
    # for nothing (guide §2.3 "project before you materialize"; the
    # driver bench read the wide persist at 0.89x).
    scored = scored_frame(spark, sf_dir, via="column")
    if not ab_off("pr_curve_narrow_stage"):
        scored = scored.select("event_id", "is_error", "failure_probability")
    scored = stage_boundary(scored, materialize=False)
    total_pos = scored.agg(
        F.sum("is_error").cast("long").alias("total_pos")
    )
    # descending score == ascending negated score; event_id makes the
    # order key unique (the prefix-sum determinism requirement)
    ranked = global_prefix_sums(
        scored.select(
            (-F.col("failure_probability")).alias("neg_score"),
            "event_id",
            F.lit(1).cast("long").alias("one"),
            F.col("is_error").cast("long").alias("pos"),
        ),
        ["neg_score", "event_id"],
        {"n_alerts": "one", "n_tp": "pos"},
    )
    return (
        ranked.filter((F.col("n_alerts") % 100 == 0) | (F.col("n_alerts") == 1))
        .crossJoin(F.broadcast(total_pos))
        .select(
            "n_alerts",
            (F.col("n_tp") * 1.0 / F.col("n_alerts")).alias("precision"),
            (F.col("n_tp") * 1.0 / F.col("total_pos")).alias("recall"),
        )
    )


def run_deployment_pipeline(
    spark: SparkSession, sf_dir: str, artifact_dir: str
) -> dict:
    """The reference's full deployment loop (05_01 + 06) end-to-end:
    score -> select threshold at recall -> persist JSON threshold +
    model artifacts (S5/S6) -> reload -> alert -> one-pass confusion ->
    operational summary. Returns the summary dict."""
    import os

    from ..ml.artifacts import (
        load_model_artifact,
        load_threshold_artifact,
        save_model_artifact,
        save_threshold_artifact,
    )
    from ..operators.metrics import (
        alert_decision,
        confusion_matrix,
        operational_summary,
    )

    scored = scored_frame(spark, sf_dir, via="column")
    thr_row = threshold_at_recall(
        scored, "failure_probability", "is_error", RECALL_TARGET
    ).first()
    thr_path = os.path.join(artifact_dir, "threshold.json")
    model_path = os.path.join(artifact_dir, "model.json")
    save_threshold_artifact(
        thr_path, thr_row["threshold"], RECALL_TARGET, thr_row["n_pos"]
    )
    save_model_artifact(model_path, MODEL)

    # deployment side: reload artifacts, score fresh, alert (06:73-140)
    model = load_model_artifact(model_path)
    threshold = load_threshold_artifact(thr_path)["threshold"]
    fresh = _features(spark, sf_dir).withColumn(
        "failure_probability", score_column(model)
    )
    cm = confusion_matrix(
        fresh,
        alert_decision("failure_probability", threshold),
        F.col("is_error").cast("int"),
    )
    summary = operational_summary([r.asDict() for r in cm.collect()])
    summary["threshold"] = threshold
    return summary


# --------------------------------------------------------------------
# M10: alert explanations. The reference runs SHAP TreeExplainer on a
# <=5k driver-side sample of alerted rows (05_SHAP:109-167). For a
# linear model the exact Shapley value has a closed form —
# w_i * (x_i - mean(x_i)) — so the explanation becomes a pure
# DataFrame computation: no collect, no Python, oracle-checkable, and
# it scales to every alerted row rather than a 5k sample. Means use
# the exact-cents trick so both engines divide identical integers.
# --------------------------------------------------------------------
_CONTRIB_THRESHOLD = 0.6


@query(
    "mlops_feature_contributions",
    oracle=f"""
    WITH alerted AS (
        SELECT * FROM ({_SCORED_SQL})
        WHERE failure_probability >= {_CONTRIB_THRESHOLD}
    ), stats AS (
        SELECT SUM(CAST(ROUND(value * 100) AS BIGINT)) AS sum_cents,
               SUM(is_error) AS sum_err,
               COUNT(*) AS n
        FROM alerted
    )
    SELECT event_id, failure_probability,
           CAST(0.02 AS DOUBLE) * (value - sum_cents / (n * 100.0))
               AS contrib_value,
           CAST(0.3 AS DOUBLE) * (is_error - sum_err / (n * 1.0))
               AS contrib_is_error
    FROM alerted, stats
    ORDER BY failure_probability DESC, event_id
    LIMIT 20
    """,
)
def mlops_feature_contributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = scored_frame(spark, sf_dir, via="column").filter(
        F.col("failure_probability") >= _CONTRIB_THRESHOLD
    )
    stats = scored.agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
        F.sum("is_error").alias("sum_err"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        scored.crossJoin(F.broadcast(stats))
        .select(
            "event_id",
            "failure_probability",
            (
                F.lit(0.02)
                * (F.col("value") - F.col("sum_cents") / (F.col("n") * 100.0))
            ).alias("contrib_value"),
            (
                F.lit(0.3)
                * (F.col("is_error") - F.col("sum_err") / (F.col("n") * 1.0))
            ).alias("contrib_is_error"),
        )
        .orderBy(F.col("failure_probability").desc(), F.col("event_id"))
        .limit(20)
    )


# --------------------------------------------------------------------
# M10/S8: the SHAP SUMMARY aggregate — mean |contribution| per feature
# over the alerted set, i.e. exactly the quantity the reference's
# summary_plot PNG visualizes (05_SHAP:139-149) before matplotlib gets
# involved. Distributed end to end; the 2-row result is what
# sources/report_png.py:write_feature_importance_png renders.
#
# Cross-engine exactness: |contrib_i| sums are order-dependent in
# floats, so sum the INTEGER quantity instead —
#   |w*(x - sum/n)| = w/(scale*n) * |x*scale*n - sum*scale| —
# the |cents*n - sum_cents| term is an exact BIGINT per row, its sum
# is exact, and one identical final division per engine yields
# bit-identical doubles (the package's standard exact-cents move, one
# level deeper). Spark SUM(BIGINT) and DuckDB CAST(SUM AS BIGINT)
# agree on the exact integer; past ~2^53 (very large alerted sets)
# the int->double conversion rounds, but BOTH engines round the SAME
# integer the same way, so cross-engine parity holds at any scale —
# only the (already sub-ulp) statistical precision degrades.
# --------------------------------------------------------------------
@query(
    "mlops_feature_importance",
    oracle=f"""
    WITH alerted AS (
        SELECT * FROM ({_SCORED_SQL})
        WHERE failure_probability >= {_CONTRIB_THRESHOLD}
    ), stats AS (
        SELECT SUM(CAST(ROUND(value * 100) AS BIGINT)) AS sum_cents,
               SUM(is_error) AS sum_err,
               COUNT(*) AS n
        FROM alerted
    ), su AS (
        SELECT CAST(SUM(ABS(CAST(ROUND(value * 100) AS BIGINT) * n
                            - sum_cents)) AS BIGINT) AS s_val,
               CAST(SUM(ABS(is_error * n - sum_err)) AS BIGINT) AS s_err,
               MAX(n) AS n
        FROM alerted, stats
    )
    SELECT feature, mean_abs_contribution FROM (
        SELECT 'contrib_value' AS feature,
               CAST(0.02 AS DOUBLE) * s_val
                   / (CAST(100 AS DOUBLE) * n * n)
                   AS mean_abs_contribution
        FROM su
        UNION ALL
        SELECT 'contrib_is_error' AS feature,
               CAST(0.3 AS DOUBLE) * s_err / (CAST(n AS DOUBLE) * n)
        FROM su
    ) ORDER BY mean_abs_contribution DESC, feature
    """,
)
def mlops_feature_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = scored_frame(spark, sf_dir, via="column").filter(
        F.col("failure_probability") >= _CONTRIB_THRESHOLD
    )
    stats = scored.agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
        F.sum("is_error").alias("sum_err"),
        F.count(F.lit(1)).alias("n"),
    )
    su = (
        scored.crossJoin(F.broadcast(stats))
        .agg(
            F.sum(
                F.abs(
                    F.round(F.col("value") * 100).cast("long") * F.col("n")
                    - F.col("sum_cents")
                )
            ).alias("s_val"),
            F.sum(
                F.abs(F.col("is_error") * F.col("n") - F.col("sum_err"))
            ).alias("s_err"),
            F.max("n").alias("n"),
        )
    )
    return (
        su.selectExpr(
            "stack(2, "
            "  'contrib_value',"
            "  CAST(0.02 AS DOUBLE) * s_val / (CAST(100 AS DOUBLE) * n * n),"
            "  'contrib_is_error',"
            "  CAST(0.3 AS DOUBLE) * s_err / (CAST(n AS DOUBLE) * n)"
            ") AS (feature, mean_abs_contribution)"
        )
        .orderBy(F.col("mean_abs_contribution").desc(), "feature")
    )


# --------------------------------------------------------------------
# M3/M4: distributed MLlib training + PR-AUC. Cross-engine training is
# not SQL-expressible -> rows-only check (driver records the weaker
# gate; SURVEY §2.8 note). Kept cheap: logistic regression on the
# model features at the given scale factor.
# --------------------------------------------------------------------
@query("mlops_train_eval")
def mlops_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.training import pr_auc, score_with_model, train_logistic

    df = _features(spark, sf_dir).withColumn(
        "label", F.col("is_error").cast("double")
    )
    model = train_logistic(df, ["value"], "label", max_iter=10)
    scored = score_with_model(model, df, ["value"])
    auc = pr_auc(scored, "failure_probability", "label")
    n = df.count()
    return spark.createDataFrame(
        [(n, round(auc, 4))], "n_train BIGINT, pr_auc DOUBLE"
    )


# --------------------------------------------------------------------
# M5 scale path: precision/recall at K fixed thresholds in ONE
# conditional-aggregation pass — no global sort, no window; the shape
# that replaces mlops_pr_curve at 100 TB. Exact integer counts.
# --------------------------------------------------------------------
_PR_THRESHOLDS = [round(0.1 * i, 1) for i in range(1, 10)]


@query(
    "mlops_pr_at_thresholds",
    oracle=f"""
    WITH scored AS ({_SCORED_SQL}),
    t(threshold) AS (
        VALUES {', '.join(f'(CAST({t} AS DOUBLE))' for t in _PR_THRESHOLDS)}
    )
    SELECT threshold,
           CAST(SUM(CASE WHEN failure_probability >= threshold
                         AND is_error = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS tp,
           CAST(SUM(CASE WHEN failure_probability >= threshold
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_alerts,
           SUM(CASE WHEN failure_probability >= threshold
                    AND is_error = 1 THEN 1 ELSE 0 END) * 1.0
               / NULLIF(SUM(CASE WHEN failure_probability >= threshold
                                 THEN 1 ELSE 0 END), 0) AS precision,
           SUM(CASE WHEN failure_probability >= threshold
                    AND is_error = 1 THEN 1 ELSE 0 END) * 1.0
               / SUM(is_error) AS recall
    FROM scored, t
    GROUP BY threshold
    """,
)
def mlops_pr_at_thresholds(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = scored_frame(spark, sf_dir, via="column")
    thresholds = spark.createDataFrame(
        [(t,) for t in _PR_THRESHOLDS], "threshold DOUBLE"
    )
    hit = F.when(
        (F.col("failure_probability") >= F.col("threshold"))
        & (F.col("is_error") == 1),
        1,
    ).otherwise(0)
    alert = F.when(
        F.col("failure_probability") >= F.col("threshold"), 1
    ).otherwise(0)
    return (
        scored.crossJoin(F.broadcast(thresholds))
        .groupBy("threshold")
        .agg(
            F.sum(hit).alias("tp"),
            F.sum(alert).alias("n_alerts"),
            (
                F.sum(hit) * 1.0
                / F.nullif(F.sum(alert), F.lit(0))
            ).alias("precision"),
            (F.sum(hit) * 1.0 / F.sum("is_error")).alias("recall"),
        )
    )


# --------------------------------------------------------------------
# Score calibration: decile bins vs observed positive rate — the
# standard reliability diagram input, one conditional-aggregation
# pass. Bin edge arithmetic is exact (floor of score*10 on identical
# doubles).
# --------------------------------------------------------------------
@query(
    "mlops_calibration_bins",
    oracle=f"""
    SELECT CAST(LEAST(FLOOR(failure_probability * 10), 9) AS BIGINT)
               AS score_decile,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(is_error) AS BIGINT) AS n_pos,
           SUM(is_error) * 1.0 / COUNT(*) AS observed_rate
    FROM ({_SCORED_SQL})
    GROUP BY score_decile
    """,
)
def mlops_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = scored_frame(spark, sf_dir, via="column")
    return (
        scored.groupBy(
            score_decile_bin("failure_probability").alias("score_decile")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("is_error").cast("long").alias("n_pos"),
            (F.sum("is_error") * 1.0 / F.count(F.lit(1))).alias(
                "observed_rate"
            ),
        )
    )


# ====================================================================
# Tree-model end-to-end (reference M3/M10 tree parity):
# 05_01_model_training_xgboost_oom_fix.py:110-155 trains a depth-6
# boosted ensemble and scores it inside Spark via a broadcast-model
# UDF; 05_SHAP_alert_explanation.py:132-167 explains the alerted rows.
# Here: MLlib GBT trained DISTRIBUTED on the downsampled chronological
# train split, persisted as a model artifact (S6), read back as DATA
# (the saved forest is parquet), and scored via an Arrow pandas_udf
# with the forest broadcast — ml/forest.py. Training is seeded and the
# downsample deterministic, so the rows-only driver check is stable.
# The extracted forest is memoized per sf_dir (model-sized, like the
# IVF centroids): the train cost is paid once per process, not per
# registered query.
# ====================================================================
GBT_FEATURES = ("value", "is_error")
_GBT_FORESTS: dict[str, "object"] = {}


def _gbt_split(spark: SparkSession, sf_dir: str):
    """(train, test): chronological split at the reference's val/test
    dates with deterministically downsampled train negatives."""
    from ..operators.splits import (
        chronological_split,
        deterministic_downsample_negatives,
    )

    df = _features(spark, sf_dir).withColumn(
        "label", F.col("is_error").cast("double")
    )
    train, _val, test = chronological_split(df, "ts", "2024-01-15", "2024-01-25")
    train = deterministic_downsample_negatives(train, "label", "event_id", 3)
    return train, test


def _gbt_forest(spark: SparkSession, sf_dir: str):
    """Train (or reuse) the GBT and return its portable PyForest."""
    import os

    from ..ml.forest import extract_forest
    from ..ml.training import train_gbt
    from .io import scratch_dir

    key = os.path.realpath(sf_dir)
    if key in _GBT_FORESTS:
        return _GBT_FORESTS[key]
    train, _ = _gbt_split(spark, sf_dir)
    model = train_gbt(train, list(GBT_FEATURES), "label", max_depth=3, max_iter=8)
    import hashlib as _hl

    # artifact path: realpath-derived (same-basename dirs must not
    # share it) + pid (concurrent pytest/bench processes must not
    # read each other's half-written node tables)
    path = scratch_dir(
        f"gbt_model_{os.path.basename(key)}"
        f"_{_hl.md5(key.encode()).hexdigest()[:8]}_{os.getpid()}"
    )
    model.write().overwrite().save(path)
    _GBT_FORESTS[key] = extract_forest(spark, path, GBT_FEATURES)
    return _GBT_FORESTS[key]


@query("mlops_gbt_score")
def mlops_gbt_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deploy-shaped tree pipeline: score the held-out test split with
    the broadcast forest pandas_udf, pick the threshold at the recall
    target (M6, exact percentile — no driver collect), alert, and
    emit the single-pass confusion matrix (M7/M8). Scoring is one
    map-only pass; the confusion agg is the only shuffle."""
    from ..ml.forest import score_forest
    from ..operators.metrics import alert_decision, confusion_matrix

    forest = _gbt_forest(spark, sf_dir)
    _, test = _gbt_split(spark, sf_dir)
    scored = score_forest(forest, spark, test, "failure_probability")
    thr = threshold_at_recall(
        scored, "failure_probability", "label", RECALL_TARGET
    ).first()["threshold"]
    cm = confusion_matrix(
        scored.withColumn(
            "alert", alert_decision("failure_probability", float(thr))
        ),
        "alert",
        F.col("label").cast("int"),
    )
    return cm.orderBy("alert", "target").select(
        F.col("alert").cast("int").alias("alert"),
        F.col("target").cast("int").alias("target"),
        F.col("n").cast("long").alias("n"),
    )


@query("mlops_gbt_contributions")
def mlops_gbt_contributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """05_SHAP twin for the TREE model: per-row path (Saabas)
    contributions on the top-20 alerted test rows. The explanation
    pandas_udf runs AFTER the top-k cut, so the Python stage sees 20
    rows regardless of corpus size — the reference's explain-alerts
    sampling discipline (05_SHAP:96-104) made exact. base + contribs
    sums to the margin exactly (pinned by tests/test_ml.py)."""
    from ..ml.forest import forest_contrib_pandas_udf, score_forest

    forest = _gbt_forest(spark, sf_dir)
    _, test = _gbt_split(spark, sf_dir)
    scored = score_forest(forest, spark, test, "failure_probability")
    top = (
        scored.orderBy(F.col("failure_probability").desc(), F.col("event_id"))
        .limit(20)
    )
    contrib = forest_contrib_pandas_udf(spark, forest)
    return top.select(
        "event_id",
        "failure_probability",
        contrib(*GBT_FEATURES).alias("c"),
    ).select(
        "event_id",
        "failure_probability",
        F.col("c.contrib_value").alias("contrib_value"),
        F.col("c.contrib_is_error").alias("contrib_is_error"),
        F.col("c.base").alias("base"),
        F.col("c.margin").alias("margin"),
    )


@query("mlops_train_early_stop")
def mlops_train_early_stop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Appendix parity (Appendix_model_training_xgboost.py:119-162):
    collected-sample boosting with validation-based EARLY STOPPING and
    a classification report at the recall-targeted threshold. The
    collect goes through the guarded_to_pandas row cap — this is the
    documented driver-side track; the distributed twin is
    mlops_gbt_score. Deterministic (greedy splits, no subsampling), so
    the rows-only driver check is stable. Output: per-class report
    rows + the round the validation metric chose."""
    import numpy as np

    from ..ml.early_stopping import (
        classification_report_rows,
        fit_boosted_stumps,
        threshold_for_recall,
    )
    from ..ml.training import guarded_to_pandas

    df = _features(spark, sf_dir).withColumn(
        "label", F.col("is_error").cast("double")
    )
    from ..operators.splits import chronological_split

    train, val, test = chronological_split(df, "ts", "2024-01-15", "2024-01-25")
    cols = [*GBT_FEATURES, "label"]

    def xy(part: DataFrame):
        pdf = guarded_to_pandas(part.select(*cols))
        return (
            pdf[list(GBT_FEATURES)].to_numpy(dtype=float),
            pdf["label"].to_numpy(dtype=float),
        )

    X_tr, y_tr = xy(train)
    X_va, y_va = xy(val)
    X_te, y_te = xy(test)
    model = fit_boosted_stumps(
        X_tr, y_tr, X_va, y_va, max_rounds=50, patience=5
    )
    probs = model.predict_proba(X_te)
    thr = threshold_for_recall(y_te, probs, RECALL_TARGET)
    report = classification_report_rows(y_te, (probs >= thr).astype(int))
    return spark.createDataFrame(
        [(*row, model.best_round) for row in report],
        "label STRING, precision DOUBLE, recall DOUBLE, f1 DOUBLE, "
        "support BIGINT, best_round BIGINT",
    )


# --------------------------------------------------------------------
# Pearson correlation between the model feature and the label, from
# EXACT integer sums (cents x is_error): both engines aggregate
# identical int64s, then perform the identical double arithmetic, so
# the correlation is bit-reproducible — unlike naive corr()/covar(),
# whose fp accumulation order differs across engines. One pass,
# map-side combinable. The n*sxx / sx*sx cross-products are widened
# to decimal(38,0) == HUGEINT BEFORE multiplying — in 64-bit long,
# n * sum(cents^2) overflows already at sf1 (~5.6e23 vs 2^63 ~
# 9.2e18; caught by the round-10 sf1 parity rotation, where ANSI
# Spark aborted loudly). The int64 SUMs themselves hold to ~sf100
# (sum(cents^2) ~ 3.75e18 at sf100); the decimal casts on the sums
# keep even that safe. F.corr agreement is pinned by tests/test_ml.py.
# --------------------------------------------------------------------
@query(
    "mlops_value_error_corr",
    oracle="""
    WITH s AS (
        SELECT COUNT(*) AS n,
               SUM(cents) AS sx,
               SUM(cents * cents) AS sxx,
               SUM(err) AS sy,
               SUM(err * err) AS syy,
               SUM(cents * err) AS sxy
        FROM (
            SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
                   CAST(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
                        AS BIGINT) AS err
            FROM events
        )
    )
    SELECT n,
           CAST(n * sxy - sx * sy AS DOUBLE) /
           (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
            sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr_value_error
    FROM s
    """,
)
def mlops_value_error_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    cents = F.round(F.col("value") * 100).cast("long")
    err = F.when(F.col("event_type") == "error", 1).otherwise(0).cast("long")
    # product-sums accumulate as decimal(38,0) (DuckDB SUM(BIGINT) is
    # HUGEINT natively); per-row products stay in long (cents^2 ~
    # 2.5e9, exact)
    d = lambda c: c.cast("decimal(38,0)")
    s = load(spark, sf_dir, "events").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).alias("sx"),
        F.sum(d(cents * cents)).alias("sxx"),
        F.sum(err).alias("sy"),
        F.sum(err * err).alias("syy"),
        F.sum(d(cents * err)).alias("sxy"),
    )
    # widen BEFORE the cross-products: n * sxx overflows long at sf1
    num = (d(F.col("n")) * F.col("sxy") - d(F.col("sx")) * F.col("sy")).cast(
        "double"
    )
    den = F.sqrt(
        (d(F.col("n")) * F.col("sxx") - d(F.col("sx")) * F.col("sx")).cast(
            "double"
        )
    ) * F.sqrt(
        (d(F.col("n")) * F.col("syy") - d(F.col("sy")) * F.col("sy")).cast(
            "double"
        )
    )
    # try_divide: zero variance on either axis makes corr undefined —
    # NULL on both engines (DuckDB /0 is NULL; ANSI Spark would throw)
    return s.select("n", F.try_divide(num, den).alias("corr_value_error"))


# --------------------------------------------------------------------
# Deployment drift monitoring (extends reference 06_deployment_code.py
# metrics): compare the score distribution of the CURRENT serving
# window against the REFERENCE (training-era) window.
#
# Both detectors bin failure_probability into the shared fixed-width
# decile bins (ml/monitor.py — ONE definition for batch, streaming,
# and calibration) — fixed edges (not quantiles) keep the result
# deterministic and make the whole computation one
# conditional-aggregation pass: map-side combinable, a 10-row
# shuffle, scale-free tail. At 100 TB this is the same plan; nothing
# grows with the data but the scan.
# --------------------------------------------------------------------

# bin = least(floor(p*10), 9); smoothing (+0.5 / +5.0 = bins/2 * 0.5)
# keeps empty bins finite (standard Laplace PSI practice), identically
# on both engines. The range() spine keeps bins empty in BOTH windows
# in the output — without it their smoothed psi_terms silently vanish
# and "total PSI = sum of psi_term" understates for degenerate score
# distributions (ml/monitor.py:drift_histogram mirrors this).
_PSI_BINS_SQL = f"""
    SELECT s.bin,
           COALESCE(b.n_ref, 0) AS n_ref,
           COALESCE(b.n_cur, 0) AS n_cur
    FROM (SELECT unnest(range(0, {N_SCORE_BINS})) AS bin) s
    LEFT JOIN (
        SELECT LEAST(CAST(FLOOR(failure_probability * 10) AS BIGINT), 9)
                   AS bin,
               CAST(SUM(CASE WHEN ts < TIMESTAMP '{DRIFT_SPLIT}'
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
               CAST(SUM(CASE WHEN ts >= TIMESTAMP '{DRIFT_SPLIT}'
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
        FROM ({_SCORED_SQL})
        GROUP BY bin
    ) b ON s.bin = b.bin
"""


@query(
    "mlops_psi_drift",
    oracle=f"""
    WITH bins AS ({_PSI_BINS_SQL}),
    tot AS (
        SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur FROM bins
    )
    SELECT bin, n_ref, n_cur,
           ROUND((n_cur + 0.5) / (t_cur + 5.0)
                 - (n_ref + 0.5) / (t_ref + 5.0), 6) AS p_delta,
           ROUND(((n_cur + 0.5) / (t_cur + 5.0)
                  - (n_ref + 0.5) / (t_ref + 5.0))
                 * ln(((n_cur + 0.5) / (t_cur + 5.0))
                      / ((n_ref + 0.5) / (t_ref + 5.0))), 6) AS psi_term
    FROM bins, tot
    ORDER BY bin
    """,
)
def mlops_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index, per score-decile bin.

    The total PSI is the sum of ``psi_term``; per-bin rows are
    returned so the monitor can also SAY which deciles moved. One
    scan, one 10-row shuffle, 1-row totals broadcast back.
    """
    scored = scored_frame(spark, sf_dir, via="column")
    bins = drift_histogram(scored, DRIFT_SPLIT)
    tot = bins.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )  # 1-row, broadcast
    p_ref = (F.col("n_ref") + 0.5) / (F.col("t_ref") + 5.0)
    p_cur = (F.col("n_cur") + 0.5) / (F.col("t_cur") + 5.0)
    return (
        bins.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_ref",
            "n_cur",
            F.round(p_cur - p_ref, 6).alias("p_delta"),
            F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias(
                "psi_term"
            ),
        )
        .orderBy("bin")
    )


@query(
    "mlops_ks_drift",
    oracle=f"""
    WITH bins AS ({_PSI_BINS_SQL}),
    tot AS (
        SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur FROM bins
    ),
    cdf AS (
        SELECT bin,
               SUM(n_ref) OVER (ORDER BY bin) * 1.0 / t_ref AS cdf_ref,
               SUM(n_cur) OVER (ORDER BY bin) * 1.0 / t_cur AS cdf_cur
        FROM bins, tot
    )
    SELECT CAST(t_ref AS BIGINT) AS n_ref,
           CAST(t_cur AS BIGINT) AS n_cur,
           ROUND(MAX(ABS(cdf_ref - cdf_cur)), 6) AS ks_stat
    FROM cdf, tot
    GROUP BY t_ref, t_cur
    """,
)
def mlops_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov–Smirnov distance between the two windows' score
    CDFs, computed on the shared 10-bin histogram (binned KS — the
    streaming-monitor standard; exact KS would need a global sort of
    distinct scores, the known-weak mlops_pr_curve shape).

    The cumulative window runs over AT MOST 10 rows — bounded by the
    bin count, not the data — so the unpartitioned window is
    scale-free.
    """
    scored = scored_frame(spark, sf_dir, via="column")
    bins = drift_histogram(scored, DRIFT_SPLIT)
    tot = bins.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # nullif: on real data t_ref/t_cur > 0 and the division is
    # unchanged; on a zero-row day the totals are 0 and ANSI mode
    # would raise DIVIDE_BY_ZERO — NULL CDFs degrade to a NULL
    # ks_stat instead of crashing the monitoring pipeline
    cdf = bins.crossJoin(F.broadcast(tot)).select(
        "t_ref",
        "t_cur",
        (F.sum("n_ref").over(w) * 1.0 / F.nullif(F.col("t_ref"), F.lit(0)))
        .alias("cdf_ref"),
        (F.sum("n_cur").over(w) * 1.0 / F.nullif(F.col("t_cur"), F.lit(0)))
        .alias("cdf_cur"),
    )
    return cdf.groupBy("t_ref", "t_cur").agg(
        F.round(F.max(F.abs(F.col("cdf_ref") - F.col("cdf_cur"))), 6).alias(
            "ks_stat"
        )
    ).select(
        F.col("t_ref").cast("long").alias("n_ref"),
        F.col("t_cur").cast("long").alias("n_cur"),
        "ks_stat",
    )


@query(
    "mlops_lift_gain",
    oracle=f"""
    WITH bins AS (
        SELECT LEAST(CAST(FLOOR(failure_probability * 10) AS BIGINT), 9)
                   AS bin,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(is_error AS BIGINT)) AS BIGINT) AS n_pos
        FROM ({_SCORED_SQL})
        GROUP BY bin
    ),
    tot AS (SELECT SUM(n) AS t_n, SUM(n_pos) AS t_pos FROM bins),
    cum AS (
        SELECT bin, n, n_pos,
               SUM(n) OVER (ORDER BY bin DESC) AS cum_n,
               SUM(n_pos) OVER (ORDER BY bin DESC) AS cum_pos
        FROM bins
    )
    SELECT bin, n, n_pos,
           ROUND(cum_pos * 1.0 / t_pos, 6) AS gain,
           ROUND((cum_pos * 1.0 / t_pos) / (cum_n * 1.0 / t_n), 6)
               AS lift
    FROM cum, tot
    ORDER BY bin DESC
    """,
)
def mlops_lift_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift table by score bin (reference
    06_deployment_code.py metric family, extended): walking the bins
    from the highest score down, ``gain`` = share of all positives
    captured so far, ``lift`` = gain over the share of traffic
    alerted. Uses the same FIXED decile bins as the drift detectors
    (equal-population ntile would need a global sort; fixed bins keep
    it one conditional-agg pass + a window over ≤10 rows).
    """
    scored = scored_frame(spark, sf_dir, via="column")
    bins = (
        scored.select(
            score_decile_bin("failure_probability").alias("bin"),
            F.col("is_error").cast("long").alias("pos"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("pos").alias("n_pos"),
        )
    )
    tot = bins.agg(
        F.sum("n").alias("t_n"), F.sum("n_pos").alias("t_pos")
    )  # 1-row, broadcast
    w = Window.orderBy(F.col("bin").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = bins.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n",
        "n_pos",
        F.sum("n").over(w).alias("cum_n"),
        F.sum("n_pos").over(w).alias("cum_pos"),
        "t_n",
        "t_pos",
    )
    return cum.select(
        "bin",
        "n",
        "n_pos",
        F.round(F.col("cum_pos") * 1.0 / F.col("t_pos"), 6).alias("gain"),
        F.round(
            (F.col("cum_pos") * 1.0 / F.col("t_pos"))
            / (F.col("cum_n") * 1.0 / F.col("t_n")),
            6,
        ).alias("lift"),
    ).orderBy(F.col("bin").desc())


# --------------------------------------------------------------------
# ROC-AUC, exact, via the Mann-Whitney rank statistic —
# [beyond-reference] the reference evaluates with PR-AUC only
# (05_01_model_training_xgboost_oom_fix.py:188-196); ROC-AUC is the
# other evaluator a deployment would report.
#
#   AUC = ( #{(p,n): s_p > s_n} + 0.5 * #{(p,n): s_p = s_n} ) / (P*N)
#
# computed WITHOUT materializing the P*N pair space and WITHOUT an
# unpartitioned window over the scored rows (mlops_pr_curve's
# documented weakness): scores are first reduced to the distinct-score
# frame (map-side-combinable groupBy), then the cumulative
# negatives-below count comes from operators.prefix.global_prefix_sum
# — a range-shuffled two-level scan whose only unpartitioned window
# runs over K per-partition totals, not data. Everything stays in
# exact integer arithmetic (doubled win counts) until the one final
# division, so partial-agg order cannot move a bit.
# --------------------------------------------------------------------
@query(
    "mlops_roc_auc_rank",
    oracle=f"""
    WITH by_score AS (
        SELECT failure_probability AS score,
               CAST(SUM(is_error) AS BIGINT) AS n_pos,
               CAST(SUM(1.0 - is_error) AS BIGINT) AS n_neg
        FROM ({_SCORED_SQL})
        GROUP BY score
    ),
    cum AS (
        SELECT n_pos, n_neg,
               CAST(SUM(n_neg) OVER (ORDER BY score) - n_neg AS BIGINT)
                   AS neg_below
        FROM by_score
    ),
    tot AS (
        -- wins2 ~ 2*P*N outgrows BIGINT around 3e9 positives at
        -- 100 TB: widen the products to HUGEINT BEFORE multiplying
        -- (Spark side mirrors with decimal(38,0))
        SELECT CAST(SUM(n_pos) AS BIGINT) AS n_pos,
               CAST(SUM(n_neg) AS BIGINT) AS n_neg,
               SUM(2 * CAST(n_pos AS HUGEINT) * neg_below
                   + CAST(n_pos AS HUGEINT) * n_neg) AS wins2
        FROM cum
    )
    SELECT n_pos, n_neg,
           ROUND(wins2 / (2.0 * n_pos * n_neg), 6) AS roc_auc
    FROM tot
    """,
)
def mlops_roc_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import global_prefix_sum

    scored = scored_frame(spark, sf_dir, via="column")
    by_score = (
        scored.select(
            F.col("failure_probability").alias("score"),
            F.col("is_error").cast("long").alias("pos"),
        )
        .groupBy("score")
        .agg(
            F.sum("pos").alias("n_pos"),
            F.sum(F.lit(1) - F.col("pos")).alias("n_neg"),
        )
    )
    cum = global_prefix_sum(
        by_score,
        order_by=["score"],
        value_col="n_neg",
        out_col="neg_below",
        exclusive=True,
    )
    # wins2 ~ 2*P*N wraps long around 3e9 positives: widen to
    # decimal(38,0) before the multiply (== oracle HUGEINT)
    dp = F.col("n_pos").cast("decimal(38,0)")
    tot = cum.agg(
        F.sum("n_pos").alias("n_pos"),
        F.sum("n_neg").alias("n_neg"),
        F.sum(
            2 * dp * F.col("neg_below") + dp * F.col("n_neg")
        ).alias("wins2"),
    )
    return tot.select(
        "n_pos",
        "n_neg",
        # try_divide: a single-class day has no ranking to measure —
        # NULL AUC on both engines instead of an ANSI abort
        F.round(
            F.try_divide(F.col("wins2"), 2.0 * F.col("n_pos") * F.col("n_neg")),
            6,
        ).alias("roc_auc"),
    )


# --------------------------------------------------------------------
# CUSUM change-point scan per entity — the monitoring-family
# complement to PSI/KS drift (those compare two windows; CUSUM finds
# WHERE a stream's level shifted). Peak statistic: max over t of
# |S_t| with S_t = sum_{i<=t}(x_i - mean). [beyond-reference]
#
# Exactness discipline: everything stays integer. Values become
# exact cents; instead of S_t = cum_t - t*mean (float, accumulation-
# order-sensitive), we scale by n: n*S_t = cum_t*n - t*total, an
# exact BIGINT, and divide by n*100 only once at the end. The window
# is per-entity (hash exchange on user_id, bounded partitions) — no
# global sort anywhere.
# --------------------------------------------------------------------
@query(
    "mlops_cusum_changepoint",
    oracle="""
    WITH e AS (
        SELECT user_id,
               CAST(ROUND(value * 100) AS BIGINT) AS cents,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ),
    c AS (
        SELECT user_id, rn,
               SUM(cents) OVER (PARTITION BY user_id ORDER BY rn) AS cum,
               SUM(cents) OVER (PARTITION BY user_id) AS total,
               COUNT(*) OVER (PARTITION BY user_id) AS n
        FROM e
    )
    SELECT user_id,
           CAST(MAX(n) AS BIGINT) AS n_events,
           ROUND(MAX(ABS(cum * n - rn * total))
                 / (MAX(n) * 100.0), 6) AS peak_cusum
    FROM c GROUP BY user_id
    """,
)
def mlops_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_all = Window.partitionBy("user_id")
    e = load(spark, sf_dir, "events").select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.row_number().over(w_ord).alias("rn"),
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .over(w_all)
        .alias("total"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    ).withColumn(
        "cum",
        F.sum("cents").over(
            Window.partitionBy("user_id")
            .orderBy("rn")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    # cum*n and rn*total widen to decimal(38,0) before the multiply —
    # a heavy entity (bot/service account) can push total*n past 2^63;
    # the oracle is already safe (DuckDB window SUMs are HUGEINT)
    dd = lambda c: c.cast("decimal(38,0)")
    dev = F.abs(
        dd(F.col("cum")) * F.col("n") - dd(F.col("rn")) * F.col("total")
    )
    return e.groupBy("user_id").agg(
        F.max("n").cast("long").alias("n_events"),
        F.round(
            F.max(dev) / (F.max("n") * 100.0), 6
        ).alias("peak_cusum"),
    )


# --------------------------------------------------------------------
# Poisson-bootstrap confidence interval for a deployment metric — the
# standard way to put error bars on an eval statistic at cluster
# scale (resampling-with-replacement is a shuffle of the whole eval
# set; Poisson(1) weights approximate it with a PURE MAP: each row
# draws an independent per-replicate weight, so no resample
# materializes). The draw is a deterministic md5-uniform pushed
# through the exact Poisson(1) inverse CDF at 1/65536 granularity —
# integer thresholds shared verbatim with the oracle, so both engines
# draw identical weights. Per-replicate means use exact cents; the
# final 2.5/97.5 percentiles interpolate over R=32 bit-identical
# doubles. Scale: O(N*R) map work, partial aggregation reduces each
# task to <= R rows, final state is R rows on one reducer —
# error bars on a 100 TB eval cost one scan.
# [beyond-reference] eval statistics; reference reports point
# metrics only (06_deployment_code.py:137-209).
# --------------------------------------------------------------------
_BOOT_R = 32
# floor(CDF_Poisson1(k) * 65536): P(0)=e^-1, P(k)=e^-1/k!
# (generated by math.floor(sum(exp(-1)/i! for i<=k) * 65536))
_POIS_T = (24109, 48218, 60273, 64291, 65296, 65497)


def _boot_w_sql(u16: str) -> str:
    cases = " ".join(
        f"WHEN {u16} < {t} THEN {k}" for k, t in enumerate(_POIS_T)
    )
    return f"(CASE {cases} ELSE {len(_POIS_T)} END)"


def _boot_u16_sql(cast_t: str) -> str:
    expr = (
        f"'bs|' || CAST(event_id AS {cast_t}) || '|' || "
        f"CAST(r AS {cast_t})"
    )
    terms = [
        f"(instr('0123456789abcdef', substring(md5({expr}), {j + 1}, 1)) - 1)"
        f" * {16 ** (3 - j)}"
        for j in range(4)
    ]
    return "(" + " + ".join(terms) + ")"


@query(
    "mlops_bootstrap_ci",
    oracle=f"""
    WITH reps AS (
        SELECT e.event_id, CAST(t.r AS BIGINT) AS r,
               CAST(ROUND(e.value * 100) AS BIGINT) AS cents
        FROM events e, range(0, {_BOOT_R}) t(r)
        WHERE e.event_type = 'error'
    ), means AS (
        SELECT r,
               SUM({_boot_w_sql(_boot_u16_sql("VARCHAR"))} * cents)
                 / (CAST(100 AS DOUBLE)
                    * SUM({_boot_w_sql(_boot_u16_sql("VARCHAR"))}))
                 AS mean_r
        FROM reps GROUP BY r
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_replicates,
           ROUND(AVG(mean_r), 6) AS boot_mean,
           ROUND(quantile_cont(mean_r, 0.025), 6) AS ci_lo,
           ROUND(quantile_cont(mean_r, 0.975), 6) AS ci_hi
    FROM means
    """,
)
def mlops_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .select(
            "event_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .withColumn(
            "r", F.explode(F.sequence(F.lit(0), F.lit(_BOOT_R - 1)))
        )
        .withColumn("r", F.col("r").cast("long"))
    )
    w = F.expr(_boot_w_sql(_boot_u16_sql("STRING")))
    means = ev.groupBy("r").agg(
        # try_divide: a replicate can draw Poisson weight 0 for every
        # row of a tiny day — its mean is NULL on both engines
        F.try_divide(
            F.sum(w * F.col("cents")),
            F.lit(100).cast("double") * F.sum(w),
        ).alias("mean_r")
    )
    return means.agg(
        F.count(F.lit(1)).alias("n_replicates"),
        F.round(F.avg("mean_r"), 6).alias("boot_mean"),
        F.round(F.expr("percentile(mean_r, 0.025)"), 6).alias("ci_lo"),
        F.round(F.expr("percentile(mean_r, 0.975)"), 6).alias("ci_hi"),
    )


# --------------------------------------------------------------------
# Two-proportion z-test (A/B guardrail): is the error rate of cohort
# A (even user_id — the canary) different from cohort B? The whole
# test is ONE conditional-aggregation pass over the events table —
# four integer counts — followed by closed-form scalar arithmetic
# (pooled rate, standard error, z), written identically in both
# engines so the doubles match bit-for-bit before the final ROUND.
# Scale: map-side-combinable counts, 1-row result; the canonical
# "guardrail metric over 100 TB of logs" shape. p-values are a
# monotone transform of |z| (erf differs across engines — the
# decision threshold belongs on z). [beyond-reference] experiment
# analysis; reference reports unpaired point metrics only.
# --------------------------------------------------------------------
@query(
    "mlops_ab_proportion_ztest",
    oracle="""
    WITH c AS (
        SELECT
            CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_a,
            CAST(SUM(CASE WHEN user_id % 2 = 0
                           AND event_type = 'error' THEN 1 ELSE 0 END)
                 AS BIGINT) AS x_a,
            CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_b,
            CAST(SUM(CASE WHEN user_id % 2 = 1
                           AND event_type = 'error' THEN 1 ELSE 0 END)
                 AS BIGINT) AS x_b
        FROM events
    )
    SELECT n_a, x_a, n_b, x_b,
           ROUND(CAST(x_a AS DOUBLE) / n_a
                 - CAST(x_b AS DOUBLE) / n_b, 6) AS rate_diff,
           ROUND((CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b)
                 / sqrt((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)), 6) AS z_stat
    FROM c
    """,
)
def mlops_ab_proportion_ztest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    is_a = F.col("user_id") % 2 == 0
    is_err = F.col("event_type") == "error"
    c = ev.agg(
        F.sum(is_a.cast("long")).alias("n_a"),
        F.sum((is_a & is_err).cast("long")).alias("x_a"),
        F.sum((~is_a).cast("long")).alias("n_b"),
        F.sum((~is_a & is_err).cast("long")).alias("x_b"),
    )
    # try_divide throughout: a single-arm day (n_a or n_b = 0) makes
    # the rates/z undefined — NULL on both engines (DuckDB /0 is
    # NULL), not an ANSI abort
    p_a = F.try_divide(F.col("x_a").cast("double"), F.col("n_a"))
    p_b = F.try_divide(F.col("x_b").cast("double"), F.col("n_b"))
    pool = (F.col("x_a") + F.col("x_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    se = F.sqrt(
        pool
        * (F.lit(1.0) - pool)
        * (
            F.try_divide(F.lit(1.0), F.col("n_a"))
            + F.try_divide(F.lit(1.0), F.col("n_b"))
        )
    )
    return c.select(
        "n_a",
        "x_a",
        "n_b",
        "x_b",
        F.round(p_a - p_b, 6).alias("rate_diff"),
        F.round(F.try_divide(p_a - p_b, se), 6).alias("z_stat"),
    )


# --------------------------------------------------------------------
# Mann-Whitney U (Wilcoxon rank-sum) between the A/B cohorts — the
# NONPARAMETRIC twin of mlops_ab_proportion_ztest for a continuous
# metric: no normality assumption on `value`, just ranks. The rank
# statistics are computed the scale-correct way: reduce to DISTINCT
# value groups first (one combinable group-by), then a prefix sum
# over the reduced frame gives every group's exclusive rank offset —
# average ranks and the tie-correction term stay EXACT INTEGERS
# (doubled-rank trick: 2·R_A = Σ n_a·(2·cum_before + t + 1)) until
# the closed-form z at the end. Same discipline as
# mlops_roc_auc_rank. Oracle mirrors with a plain window.
# [beyond-reference] experiment analysis.
# --------------------------------------------------------------------
@query(
    "mlops_mann_whitney_u",
    oracle="""
    WITH g AS (
        SELECT CAST(ROUND(value * 100) AS BIGINT) AS v,
               CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS na,
               CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS nb
        FROM events GROUP BY 1
    ),
    p AS (
        SELECT na, nb, na + nb AS t,
               COALESCE(SUM(na + nb) OVER (
                   ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS cum_before
        FROM g
    ),
    s AS (
        -- rank-sum and tie products widened to HUGEINT BEFORE the
        -- multiply (r2_a ~ 2N^2 and tie3 ~ N^3 pass 2^63 around 3e9
        -- ranked rows — reachable at 100 TB); Spark mirrors with
        -- decimal(38,0)
        SELECT CAST(SUM(na) AS BIGINT) AS n_a,
               CAST(SUM(nb) AS BIGINT) AS n_b,
               SUM(CAST(na AS HUGEINT)
                   * (2 * CAST(cum_before AS HUGEINT) + t + 1)) AS r2_a,
               SUM(CAST(t AS HUGEINT) * t * t - t) AS tie3
        FROM p
    )
    SELECT n_a, n_b,
           -- the U STATISTIC itself outgrows BIGINT only past ~6e9
           -- rows; this cast then aborts loudly on both engines
           -- (HUGEINT->BIGINT error / ANSI decimal->long error)
           -- instead of wrapping
           CAST(r2_a - CAST(n_a AS HUGEINT) * (n_a + 1) AS BIGINT)
               AS u2_a,
           ROUND(((CAST(r2_a AS DOUBLE)
                   - CAST(CAST(n_a AS HUGEINT) * (n_a + 1) AS DOUBLE))
                      / 2.0
                  - CAST(n_a AS DOUBLE) * n_b / 2.0)
                 / sqrt((CAST(n_a AS DOUBLE) * n_b / 12.0)
                        * ((n_a + n_b + 1)
                           - CAST(tie3 AS DOUBLE)
                             / ((n_a + n_b)
                                * CAST(n_a + n_b - 1 AS DOUBLE)))),
                 6) AS z_stat
    FROM s
    """,
)
def mlops_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import global_prefix_sum

    g = (
        load(spark, sf_dir, "events")
        .groupBy(
            F.round(F.col("value") * 100).cast("long").alias("v")
        )
        .agg(
            F.sum((F.col("user_id") % 2 == 0).cast("long")).alias("na"),
            F.sum((F.col("user_id") % 2 == 1).cast("long")).alias("nb"),
        )
        .withColumn("t", F.col("na") + F.col("nb"))
    )
    p = global_prefix_sum(
        g, ["v"], "t", "cum_before", exclusive=True
    )
    # rank-sum / tie products widen to decimal(38,0) BEFORE the
    # multiply (== oracle HUGEINT): r2_a ~ 2N^2 and tie3 ~ N^3 wrap
    # long around 3e9 ranked rows
    dd = lambda c: c.cast("decimal(38,0)")
    s = p.agg(
        F.sum("na").alias("n_a"),
        F.sum("nb").alias("n_b"),
        F.sum(
            dd(F.col("na"))
            * (2 * dd(F.col("cum_before")) + F.col("t") + 1)
        ).alias("r2_a"),
        F.sum(
            dd(F.col("t")) * F.col("t") * F.col("t") - F.col("t")
        ).alias("tie3"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    prod = dd(n_a) * (n_a + 1)
    u_a = (F.col("r2_a").cast("double") - prod.cast("double")) / F.lit(2.0)
    # try_divide: one observation total zeroes the tie-correction
    # denominator; all-tied values zero the variance — NULL z on
    # both engines in either degenerate case
    var = (n_a.cast("double") * n_b / F.lit(12.0)) * (
        (n_a + n_b + 1)
        - F.try_divide(
            F.col("tie3").cast("double"),
            (n_a + n_b) * (n_a + n_b - 1).cast("double"),
        )
    )
    return s.select(
        "n_a",
        "n_b",
        # the U statistic outgrows long only past ~6e9 rows; ANSI
        # decimal->long then aborts loudly instead of wrapping
        (F.col("r2_a") - prod).cast("long").alias("u2_a"),
        F.round(
            F.try_divide(
                u_a - n_a.cast("double") * n_b / F.lit(2.0), F.sqrt(var)
            ),
            6,
        ).alias("z_stat"),
    )


# --------------------------------------------------------------------
# Split-conformal prediction interval + empirical coverage — the
# distribution-free way to put guarantees on a deployed regressor.
# Calibration half (even event_id) fits the per-type mean predictor
# and takes the q95 of absolute residuals; eval half (odd event_id)
# measures how often truth lands inside ±q. Every residual is an
# identically-written double expression over exact cents, so the
# quantile interpolates over bit-identical inputs and COVERAGE IS AN
# EXACT INTEGER COUNT. Scale: two combinable aggs + one broadcast
# join of per-type constants; no global sort (percentile agg).
# [beyond-reference] uncertainty quantification.
# --------------------------------------------------------------------
@query(
    "mlops_conformal_interval",
    oracle="""
    WITH base AS (
        SELECT event_type, event_id,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    pred AS (
        SELECT event_type,
               (CAST(SUM(cents) AS DOUBLE) / 100.0) / COUNT(*) AS mu,
               CAST(COUNT(*) AS BIGINT) AS n_cal
        FROM base WHERE event_id % 2 = 0 GROUP BY event_type
    ),
    q AS (
        SELECT b.event_type,
               quantile_cont(abs(b.cents / 100.0 - p.mu), 0.95) AS q_hat
        FROM base b JOIN pred p USING (event_type)
        WHERE b.event_id % 2 = 0
        GROUP BY b.event_type
    )
    SELECT b.event_type, MIN(p.n_cal) AS n_cal,
           ROUND(MIN(q.q_hat), 6) AS q_hat,
           CAST(COUNT(*) AS BIGINT) AS n_eval,
           CAST(SUM(CASE WHEN abs(b.cents / 100.0 - p.mu) <= q.q_hat
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
           ROUND(SUM(CASE WHEN abs(b.cents / 100.0 - p.mu) <= q.q_hat
                          THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS coverage
    FROM base b JOIN pred p USING (event_type) JOIN q USING (event_type)
    WHERE b.event_id % 2 = 1
    GROUP BY b.event_type
    """,
)
def mlops_conformal_interval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.staging import stage_boundary

    # base feeds the calibration mean, the calibration quantile AND
    # the eval half — unstaged, events scanned three times (round-13
    # scan sweep). Staged (three narrow columns), one pass.
    base = stage_boundary(
        load(spark, sf_dir, "events").select(
            "event_type",
            "event_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        ),
        materialize=False,
    )
    cal = base.filter(F.col("event_id") % 2 == 0)
    # O(event_types) boundary: the per-type calibration means feed
    # the quantile pass and the eval join — staged, the calibration
    # half scans once for them instead of per consumer
    pred = stage_boundary(
        cal.groupBy("event_type").agg(
            (
                (F.sum("cents").cast("double") / F.lit(100.0))
                / F.count(F.lit(1))
            ).alias("mu"),
            F.count(F.lit(1)).alias("n_cal"),
        ),
        materialize=False,
    )
    resid = F.abs(F.col("cents") / F.lit(100.0) - F.col("mu"))
    q = (
        cal.join(F.broadcast(pred), "event_type")
        .groupBy("event_type")
        .agg(
            F.expr(
                "percentile(abs(cents / 100.0D - mu), 0.95)"
            ).alias("q_hat")
        )
    )
    ev = (
        base.filter(F.col("event_id") % 2 == 1)
        .join(F.broadcast(pred), "event_type")
        .join(F.broadcast(q), "event_type")
    )
    covered = (resid <= F.col("q_hat")).cast("long")
    return ev.groupBy("event_type").agg(
        F.min("n_cal").alias("n_cal"),
        F.round(F.min("q_hat"), 6).alias("q_hat"),
        F.count(F.lit(1)).alias("n_eval"),
        F.sum(covered).alias("n_covered"),
        F.round(
            F.sum(covered) / F.count(F.lit(1)).cast("double"), 6
        ).alias("coverage"),
    )


# --------------------------------------------------------------------
# Kaplan-Meier survival estimator — THE time-to-event statistic for
# the reference's own domain (drive-days until failure,
# 02_label_generation's lead label is the 1-day special case).
# Subjects are users; "failure" is the first error event; users with
# no error are right-censored at the corpus end. The life table is
# built scale-correctly: one per-user reduce, one group-by on the
# integer duration, then the at-risk counts and the cumulative
# log-survival both come from the distributed prefix-sum operator —
# S(t) = exp(Σ ln((n_j - d_j)/n_j)) so the product never needs an
# ordered multiply. Oracle mirrors with plain windows; both engines
# sum the identical ln terms (round-6 slack absorbs association
# order). [beyond-reference capability twin: survival analysis.]
# --------------------------------------------------------------------
@query(
    "mlops_kaplan_meier",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               MIN(ts) AS first_ts,
               MIN(CASE WHEN event_type = 'error' THEN ts END) AS err_ts
        FROM events GROUP BY user_id
    ),
    horizon AS (SELECT MAX(ts) AS end_ts FROM events),
    dur AS (
        SELECT CASE WHEN err_ts IS NOT NULL
                    THEN date_diff('day', CAST(first_ts AS DATE),
                                   CAST(err_ts AS DATE))
                    ELSE date_diff('day', CAST(first_ts AS DATE),
                                   CAST(end_ts AS DATE)) END AS t,
               CASE WHEN err_ts IS NOT NULL THEN 1 ELSE 0 END AS failed
        FROM per_user CROSS JOIN horizon
    ),
    grp AS (
        SELECT t, CAST(COUNT(*) AS BIGINT) AS n_all,
               CAST(SUM(failed) AS BIGINT) AS n_fail
        FROM dur GROUP BY t
    ),
    lt AS (
        SELECT t, n_fail,
               (SELECT COUNT(*) FROM dur)
                 - COALESCE(SUM(n_all) OVER (
                       ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS n_risk
        FROM grp
    ),
    km AS (
        SELECT t, n_risk, n_fail,
               SUM(CASE WHEN n_fail < n_risk
                        THEN ln((CAST(n_risk AS DOUBLE) - n_fail)
                                / n_risk)
                        ELSE 0.0 END)
                   OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS ln_s
        FROM lt WHERE n_fail > 0
    )
    SELECT CAST(t AS BIGINT) AS t_days,
           CAST(n_risk AS BIGINT) AS n_risk, n_fail,
           CASE WHEN n_fail = n_risk THEN 0.0
                ELSE ROUND(exp(ln_s), 6) END AS survival
    FROM km
    """,
)
def mlops_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import global_prefix_sum
    from ..operators.staging import stage_boundary

    ev = load(spark, sf_dir, "events")
    # ONE corpus pass (was two): the per-user reduce also carries
    # max(ts), so the censoring horizon is max-over-user-maxes off
    # the STAGED per-user frame — identically the global MAX(ts)
    # (max distributes over the user partition; the NULL-user group
    # participates like any other, and max ignores NULL ts on both
    # paths) — instead of the old separate `ev.agg(max(ts))` full
    # events scan (round-13 scan sweep: events x2 in this plan).
    #
    # Round 14, examined with interleaved A/B and left in the
    # round-13 shape: dropping the second (dur) persist lost 0.89x
    # (each of dur's four consumers re-ran the crossJoin + broadcast
    # horizon build from the per-user cache, costing more than the
    # one cache write it saved), and narrowing this staged reduce by
    # dropping user_id lost 0.92x (the extra Project under the
    # InMemoryRelation outweighed the saved column at this scale).
    # Numbers in OPTIMIZATION_r14.md. The round-13 driver-bench
    # regression (0.68x) is attributed to the warm-cache bench
    # artifact fixed this round plus session drift — this round's
    # cache-clean A/B shows the r13 plan at parity or better than
    # both structural alternatives, and the prefix.py SQL-tree fix
    # below cuts ~0.5s of this query's plan-build time regardless.
    per_user = stage_boundary(
        ev.groupBy("user_id").agg(
            F.min("ts").alias("first_ts"),
            F.min(
                F.when(F.col("event_type") == "error", F.col("ts"))
            ).alias("err_ts"),
            F.max("ts").alias("_user_max_ts"),
        ),
        materialize=False,
    )
    horizon = per_user.agg(F.max("_user_max_ts").alias("end_ts"))
    dur = per_user.crossJoin(F.broadcast(horizon)).select(
        F.when(
            F.col("err_ts").isNotNull(),
            F.datediff(F.to_date("err_ts"), F.to_date("first_ts")),
        )
        .otherwise(
            F.datediff(F.to_date("end_ts"), F.to_date("first_ts"))
        )
        .cast("long")
        .alias("t"),
        F.col("err_ts").isNotNull().cast("long").alias("failed"),
    )
    # stage boundary at the per-user duration frame (O(users) rows):
    # both prefix passes, the life table and the total count branch
    # from here — kept after the round-14 A/B (see note above).
    dur = stage_boundary(dur, materialize=False)
    grp = dur.groupBy("t").agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum("failed").alias("n_fail"),
    )
    total = dur.agg(F.count(F.lit(1)).alias("n_total"))
    lt = (
        global_prefix_sum(grp, ["t"], "n_all", "cum_before", exclusive=True)
        .crossJoin(F.broadcast(total))
        .select(
            "t",
            "n_fail",
            (F.col("n_total") - F.col("cum_before")).alias("n_risk"),
        )
        .filter(F.col("n_fail") > 0)
        .withColumn(
            "ln_term",
            # the final step can absorb everyone at risk (n_fail ==
            # n_risk): survival is exactly 0 there, and ln(0) must
            # never enter the accumulation (DuckDB raises on it)
            F.when(
                F.col("n_fail") < F.col("n_risk"),
                F.log(
                    (F.col("n_risk").cast("double") - F.col("n_fail"))
                    / F.col("n_risk")
                ),
            ).otherwise(F.lit(0.0)),
        )
    )
    km = global_prefix_sum(lt, ["t"], "ln_term", "ln_s")
    return km.select(
        F.col("t").alias("t_days"),
        "n_risk",
        "n_fail",
        F.when(F.col("n_fail") == F.col("n_risk"), F.lit(0.0))
        .otherwise(F.round(F.exp("ln_s"), 6))
        .alias("survival"),
    )


# --------------------------------------------------------------------
# Expanding-window backtest folds — temporal cross-validation over
# the event stream (the multi-fold generalization of the reference's
# single chronological split, 04:29-70). Days are bucketed into 5
# contiguous folds by ntile over the DISTINCT-day frame (O(days)
# rows — the only ordered pass); each fold k tests on its own days
# and trains on every earlier day, so train counts are an exclusive
# prefix sum over per-fold totals. All integers.
# --------------------------------------------------------------------
@query(
    "mlops_backtest_folds",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY day
    ),
    folds AS (
        SELECT day, n, NTILE(5) OVER (ORDER BY day) AS fold
        FROM daily
    ),
    per_fold AS (
        SELECT fold, CAST(COUNT(*) AS BIGINT) AS test_days,
               CAST(SUM(n) AS BIGINT) AS test_rows,
               MIN(day) AS fold_start, MAX(day) AS fold_end
        FROM folds GROUP BY fold
    )
    SELECT fold, fold_start, fold_end, test_days, test_rows,
           CAST(COALESCE(SUM(test_days) OVER (
                    ORDER BY fold ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS BIGINT) AS train_days,
           CAST(COALESCE(SUM(test_rows) OVER (
                    ORDER BY fold ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS BIGINT) AS train_rows
    FROM per_fold
    """,
)
def mlops_backtest_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    folds = daily.select(
        "day", "n", F.ntile(5).over(Window.orderBy("day")).alias("fold")
    )
    per_fold = folds.groupBy("fold").agg(
        F.count(F.lit(1)).alias("test_days"),
        F.sum("n").alias("test_rows"),
        F.min("day").alias("fold_start"),
        F.max("day").alias("fold_end"),
    )
    w = (
        Window.orderBy("fold")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return per_fold.select(
        "fold",
        "fold_start",
        "fold_end",
        "test_days",
        "test_rows",
        F.coalesce(F.sum("test_days").over(w), F.lit(0)).alias(
            "train_days"
        ),
        F.coalesce(F.sum("test_rows").over(w), F.lit(0)).alias(
            "train_rows"
        ),
    )


# --------------------------------------------------------------------
# Isotonic score calibration (distributed pool-adjacent-violators):
# the monotone-nonparametric upgrade of mlops_calibration_bins — fit
# the best monotone map score -> P(error) with MLlib's
# IsotonicRegression (per-partition PAV + merge, the scalable
# formulation). Deterministic input (JVM column-expression scores),
# deterministic greedy fit -> stable boundary/prediction table, but
# the fit itself is not one SQL statement: rows-only by design, with
# pytest pinning monotonicity + a hand-rolled PAV parity check.
# --------------------------------------------------------------------
@query("mlops_isotonic_calibration")
def mlops_isotonic_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import IsotonicRegression

    scored = _features(spark, sf_dir).select(
        score_column(MODEL).alias("score"),
        F.col("is_error").alias("label"),
    )
    # skip: a row with a null score/label carries nothing to calibrate
    vec = VectorAssembler(
        inputCols=["score"], outputCol="features", handleInvalid="skip"
    )
    scored = scored.filter(F.col("label").isNotNull())
    iso = IsotonicRegression(
        featuresCol="features", labelCol="label", isotonic=True
    )
    model = iso.fit(vec.transform(scored))
    b = [float(x) for x in model.boundaries]
    p = [float(x) for x in model.predictions]
    rows = [
        (i, round(b[i], 6), round(p[i], 6)) for i in range(len(b))
    ]
    return spark.createDataFrame(
        rows, "knot_idx int, boundary double, calibrated double"
    )


# --------------------------------------------------------------------
# Deployment-ops daily mart (capstone): the one table an on-call
# engineer reads — per day: volume, error count, alert count at the
# deployed threshold, exact-cents value total, 7-day trailing alert
# mean, and day-over-day alert delta. ONE pass over events builds
# the daily grain (conditional aggs, combinable); the rolling mean
# and lag share a single ordered window over the O(days) frame.
# Mirrors reference 06_deployment_code.py:137-209's daily rollup,
# fused with the scoring path. Scores are the bit-exact softsign
# scorer, so the alert count is integral and hash-stable.
# --------------------------------------------------------------------
@query(
    "mlops_daily_ops_mart",
    oracle=f"""
    WITH scored AS ({_SCORED_SQL}),
    daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN is_error = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_errors,
               CAST(SUM(CASE WHEN failure_probability >= 0.5
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_alerts,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS value_cents
        FROM scored GROUP BY day
    )
    SELECT day, n_events, n_errors, n_alerts, value_cents,
           ROUND(AVG(CAST(n_alerts AS DOUBLE)) OVER (
               ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           ), 6) AS alerts_7d_mean,
           n_alerts - LAG(n_alerts, 1, CAST(0 AS BIGINT))
               OVER (ORDER BY day) AS alerts_dod_delta
    FROM daily
    """,
)
def mlops_daily_ops_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = scored_frame(spark, sf_dir, via="column")
    daily = (
        scored.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("is_error") == 1.0).cast("long")).alias(
                "n_errors"
            ),
            F.sum(
                (F.col("failure_probability") >= 0.5).cast("long")
            ).alias("n_alerts"),
            F.sum(
                F.round(F.col("value") * 100).cast("long")
            ).alias("value_cents"),
        )
    )
    w7 = Window.orderBy("day").rowsBetween(-6, 0)
    wl = Window.orderBy("day")
    return daily.select(
        "day",
        "n_events",
        "n_errors",
        "n_alerts",
        "value_cents",
        F.round(
            F.avg(F.col("n_alerts").cast("double")).over(w7), 6
        ).alias("alerts_7d_mean"),
        (
            F.col("n_alerts")
            - F.lag("n_alerts", 1, 0).over(wl)
        ).alias("alerts_dod_delta"),
    )


# --------------------------------------------------------------------
# A/B effect sizes — the "is it big enough to matter" companion to
# the significance pair (z-test / Mann-Whitney): odds ratio with its
# 95% log-normal CI, relative risk, and Cohen's d for the continuous
# metric (pooled-SD standardized mean difference, exact integer
# sums/sumsq in cents). Still ONE conditional-aggregation pass over
# events — every statistic is closed-form scalar arithmetic on the
# eight integers it produces, written identically in both engines.
# [beyond-reference] experiment analysis.
# --------------------------------------------------------------------
@query(
    "mlops_ab_effect_sizes",
    oracle="""
    WITH c AS (
        SELECT
            CAST(SUM(CASE WHEN user_id % 2 = 0
                           AND event_type = 'error' THEN 1 ELSE 0 END)
                 AS BIGINT) AS a,
            CAST(SUM(CASE WHEN user_id % 2 = 0
                           AND event_type <> 'error' THEN 1 ELSE 0 END)
                 AS BIGINT) AS b,
            CAST(SUM(CASE WHEN user_id % 2 = 1
                           AND event_type = 'error' THEN 1 ELSE 0 END)
                 AS BIGINT) AS cc,
            CAST(SUM(CASE WHEN user_id % 2 = 1
                           AND event_type <> 'error' THEN 1 ELSE 0 END)
                 AS BIGINT) AS d,
            CAST(SUM(CASE WHEN user_id % 2 = 0
                          THEN CAST(ROUND(value * 100) AS BIGINT)
                          ELSE 0 END) AS BIGINT) AS sa,
            CAST(SUM(CASE WHEN user_id % 2 = 0
                          THEN CAST(ROUND(value * 100) AS BIGINT)
                               * CAST(ROUND(value * 100) AS BIGINT)
                          ELSE 0 END) AS BIGINT) AS qa,
            CAST(SUM(CASE WHEN user_id % 2 = 1
                          THEN CAST(ROUND(value * 100) AS BIGINT)
                          ELSE 0 END) AS BIGINT) AS sb,
            CAST(SUM(CASE WHEN user_id % 2 = 1
                          THEN CAST(ROUND(value * 100) AS BIGINT)
                               * CAST(ROUND(value * 100) AS BIGINT)
                          ELSE 0 END) AS BIGINT) AS qb
        FROM events
    )
    SELECT a, b, cc AS c, d,
           ROUND(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * cc), 6)
               AS odds_ratio,
           ROUND(exp(ln(CAST(a AS DOUBLE) * d
                        / (CAST(b AS DOUBLE) * cc))
                     - 1.96 * sqrt(1.0 / a + 1.0 / b
                                   + 1.0 / cc + 1.0 / d)), 6)
               AS or_ci_lo,
           ROUND(exp(ln(CAST(a AS DOUBLE) * d
                        / (CAST(b AS DOUBLE) * cc))
                     + 1.96 * sqrt(1.0 / a + 1.0 / b
                                   + 1.0 / cc + 1.0 / d)), 6)
               AS or_ci_hi,
           ROUND((CAST(a AS DOUBLE) / (a + b))
                 / (CAST(cc AS DOUBLE) / (cc + d)), 6)
               AS relative_risk,
           ROUND(((CAST(sa AS DOUBLE) / (a + b)
                   - CAST(sb AS DOUBLE) / (cc + d)) / 100.0)
                 / sqrt((((CAST(qa AS DOUBLE)
                           - CAST(sa AS DOUBLE) * sa / (a + b))
                          + (CAST(qb AS DOUBLE)
                             - CAST(sb AS DOUBLE) * sb / (cc + d)))
                         / 10000.0)
                        / (a + b + cc + d - 2)), 6)
               AS cohens_d
    FROM c
    """,
)
def mlops_ab_effect_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    is_a = F.col("user_id") % 2 == 0
    is_err = F.col("event_type") == "error"
    cents = F.round(F.col("value") * 100).cast("long")
    c = load(spark, sf_dir, "events").agg(
        F.sum((is_a & is_err).cast("long")).alias("a"),
        F.sum((is_a & ~is_err).cast("long")).alias("b"),
        F.sum((~is_a & is_err).cast("long")).alias("c"),
        F.sum((~is_a & ~is_err).cast("long")).alias("d"),
        F.sum(F.when(is_a, cents).otherwise(F.lit(0))).alias("sa"),
        F.sum(F.when(is_a, cents * cents).otherwise(F.lit(0))).alias(
            "qa"
        ),
        F.sum(F.when(~is_a, cents).otherwise(F.lit(0))).alias("sb"),
        F.sum(F.when(~is_a, cents * cents).otherwise(F.lit(0))).alias(
            "qb"
        ),
    )
    A, B, C, D = (F.col(x).cast("double") for x in "abcd")
    n_a, n_b = F.col("a") + F.col("b"), F.col("c") + F.col("d")
    # try_divide throughout: any empty contingency cell / single-arm
    # day makes the effect sizes undefined — NULL on both engines
    # (DuckDB /0 is NULL), never an ANSI abort
    or_ = F.try_divide(A * F.col("d"), B * F.col("c"))
    half = F.lit(1.96) * F.sqrt(
        F.try_divide(F.lit(1.0), A)
        + F.try_divide(F.lit(1.0), B)
        + F.try_divide(F.lit(1.0), C)
        + F.try_divide(F.lit(1.0), D)
    )
    mean_diff = (
        F.try_divide(F.col("sa").cast("double"), n_a)
        - F.try_divide(F.col("sb").cast("double"), n_b)
    ) / F.lit(100.0)
    pooled = F.sqrt(
        F.try_divide(
            (
                (
                    F.col("qa").cast("double")
                    - F.try_divide(
                        F.col("sa").cast("double") * F.col("sa"), n_a
                    )
                )
                + (
                    F.col("qb").cast("double")
                    - F.try_divide(
                        F.col("sb").cast("double") * F.col("sb"), n_b
                    )
                )
            )
            / F.lit(10000.0),
            (n_a + n_b - 2).cast("double"),
        )
    )
    return c.select(
        "a",
        "b",
        "c",
        "d",
        F.round(or_, 6).alias("odds_ratio"),
        F.round(F.exp(F.log(or_) - half), 6).alias("or_ci_lo"),
        F.round(F.exp(F.log(or_) + half), 6).alias("or_ci_hi"),
        F.round(
            F.try_divide(F.try_divide(A, n_a), F.try_divide(C, n_b)), 6
        ).alias("relative_risk"),
        F.round(F.try_divide(mean_diff, pooled), 6).alias("cohens_d"),
    )


# --------------------------------------------------------------------
# Log-rank test — the inferential companion to mlops_kaplan_meier:
# do the even- and odd-user cohorts have the SAME time-to-first-
# failure distribution? At every failure time the observed cohort-A
# failures are compared to the hypergeometric expectation given the
# at-risk counts; z = Σ(O−E)/sqrt(ΣV). At-risk counts per cohort
# come from the same distributed prefix-sum discipline as the KM
# life table (one shared bucketed pass over the
# O(distinct durations) frame); every O/E/V term is an identically-
# written double over exact integers. [beyond-reference] survival
# inference.
# --------------------------------------------------------------------
@query(
    "mlops_logrank_test",
    oracle="""
    WITH per_user AS (
        SELECT user_id, user_id % 2 AS grp,
               MIN(ts) AS first_ts,
               MIN(CASE WHEN event_type = 'error' THEN ts END) AS err_ts
        FROM events GROUP BY user_id
    ),
    horizon AS (SELECT MAX(ts) AS end_ts FROM events),
    dur AS (
        SELECT grp,
               CASE WHEN err_ts IS NOT NULL
                    THEN date_diff('day', CAST(first_ts AS DATE),
                                   CAST(err_ts AS DATE))
                    ELSE date_diff('day', CAST(first_ts AS DATE),
                                   CAST(end_ts AS DATE)) END AS t,
               CASE WHEN err_ts IS NOT NULL THEN 1 ELSE 0 END AS failed
        FROM per_user CROSS JOIN horizon
    ),
    g AS (
        SELECT t,
               CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS all_a,
               CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS all_b,
               CAST(SUM(CASE WHEN grp = 0 THEN failed ELSE 0 END)
                    AS BIGINT) AS d_a,
               CAST(SUM(CASE WHEN grp = 1 THEN failed ELSE 0 END)
                    AS BIGINT) AS d_b
        FROM dur GROUP BY t
    ),
    r AS (
        SELECT t, d_a, d_b,
               (SELECT SUM(all_a) FROM g)
                 - COALESCE(SUM(all_a) OVER (
                       ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS n_a,
               (SELECT SUM(all_b) FROM g)
                 - COALESCE(SUM(all_b) OVER (
                       ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS n_b
        FROM g
    ),
    terms AS (
        SELECT CAST(d_a AS DOUBLE) AS o_a,
               CAST(d_a + d_b AS DOUBLE) * n_a / (n_a + n_b) AS e_a,
               CASE WHEN n_a + n_b > 1 THEN
                   CAST(d_a + d_b AS DOUBLE)
                   * (CAST(n_a AS DOUBLE) / (n_a + n_b))
                   * (CAST(n_b AS DOUBLE) / (n_a + n_b))
                   * (n_a + n_b - d_a - d_b)
                   / (n_a + n_b - 1)
               ELSE 0.0 END AS v
        FROM r WHERE d_a + d_b > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_failure_times,
           ROUND(SUM(o_a), 6) AS observed_a,
           ROUND(SUM(e_a), 6) AS expected_a,
           ROUND((SUM(o_a) - SUM(e_a)) / sqrt(SUM(v)), 6) AS z_logrank
    FROM terms
    """,
)
def mlops_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import global_prefix_sums
    from ..operators.staging import stage_boundary

    ev = load(spark, sf_dir, "events")
    # same one-corpus-pass restructure as mlops_kaplan_meier: the
    # censoring horizon is max-over-user-maxes off the staged
    # per-user frame (= global MAX(ts) exactly), not a second full
    # events scan (round-13 scan sweep: events x2 in this plan).
    per_user = stage_boundary(
        ev.groupBy("user_id").agg(
            F.min("ts").alias("first_ts"),
            F.min(
                F.when(F.col("event_type") == "error", F.col("ts"))
            ).alias("err_ts"),
            F.max("ts").alias("_user_max_ts"),
        ),
        materialize=False,
    )
    horizon = per_user.agg(F.max("_user_max_ts").alias("end_ts"))
    dur = per_user.crossJoin(F.broadcast(horizon)).select(
        (F.col("user_id") % 2).alias("grp"),
        F.when(
            F.col("err_ts").isNotNull(),
            F.datediff(F.to_date("err_ts"), F.to_date("first_ts")),
        )
        .otherwise(
            F.datediff(F.to_date("end_ts"), F.to_date("first_ts"))
        )
        .cast("long")
        .alias("t"),
        F.col("err_ts").isNotNull().cast("long").alias("failed"),
    )
    # same O(users) stage boundary as mlops_kaplan_meier: without it
    # the plan scans events six times (cohort life table, cohort
    # totals, and the shared prefix pass each recompute it)
    dur = stage_boundary(dur, materialize=False)
    g = dur.groupBy("t").agg(
        F.sum((F.col("grp") == 0).cast("long")).alias("all_a"),
        F.sum((F.col("grp") == 1).cast("long")).alias("all_b"),
        F.sum(F.when(F.col("grp") == 0, F.col("failed")).otherwise(0)).alias(
            "d_a"
        ),
        F.sum(F.when(F.col("grp") == 1, F.col("failed")).otherwise(0)).alias(
            "d_b"
        ),
    )
    tot = g.agg(
        F.sum("all_a").alias("tot_a"), F.sum("all_b").alias("tot_b")
    )
    r = (
        # both running totals share ONE prefix pass + offset table
        global_prefix_sums(
            g, ["t"], {"cb_a": "all_a", "cb_b": "all_b"}, exclusive=True
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "t",
            "d_a",
            "d_b",
            (F.col("tot_a") - F.col("cb_a")).alias("n_a"),
            (F.col("tot_b") - F.col("cb_b")).alias("n_b"),
        )
        .filter(F.col("d_a") + F.col("d_b") > 0)
    )
    n_t = F.col("n_a") + F.col("n_b")
    d_t = (F.col("d_a") + F.col("d_b")).cast("double")
    o_a = F.col("d_a").cast("double")
    e_a = d_t * F.col("n_a") / n_t
    v = F.when(
        n_t > 1,
        d_t
        * (F.col("n_a").cast("double") / n_t)
        * (F.col("n_b").cast("double") / n_t)
        * (n_t - F.col("d_a") - F.col("d_b"))
        / (n_t - 1),
    ).otherwise(F.lit(0.0))
    return r.select(
        o_a.alias("o_a"), e_a.alias("e_a"), v.alias("v")
    ).agg(
        F.count(F.lit(1)).alias("n_failure_times"),
        F.round(F.sum("o_a"), 6).alias("observed_a"),
        F.round(F.sum("e_a"), 6).alias("expected_a"),
        # try_divide: a day with V = 0 (no at-risk variance) has no
        # test statistic — NULL on both engines
        F.round(
            F.try_divide(F.sum("o_a") - F.sum("e_a"), F.sqrt(F.sum("v"))),
            6,
        ).alias("z_logrank"),
    )


# --------------------------------------------------------------------
# Difference-in-differences — the rollout-analysis design: cohort A
# (even users, "treated") vs cohort B, before vs after the midpoint
# date, estimate = (A_post − A_pre) − (B_post − B_pre) on the value
# metric, with the classical four-cell pooled SE. The cut date is
# the corpus midpoint day (computed from min/max, broadcast); the
# whole estimator is ONE conditional-aggregation pass producing
# eight exact integers (cents sums + counts) and four sumsq terms,
# then closed-form scalar arithmetic. [beyond-reference] causal
# rollout analytics.
# --------------------------------------------------------------------
@query(
    "mlops_diff_in_diff",
    oracle="""
    WITH span AS (
        SELECT CAST(MIN(ts) AS DATE) AS d0,
               date_diff('day', CAST(MIN(ts) AS DATE),
                         CAST(MAX(ts) AS DATE)) // 2 AS half
        FROM events
    ),
    cells AS (
        SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS treated,
               CASE WHEN date_diff('day', span.d0, CAST(ts AS DATE))
                         > span.half THEN 1 ELSE 0 END AS post,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events CROSS JOIN span
    ),
    s AS (
        SELECT treated, post, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS s1,
               CAST(SUM(cents * cents) AS BIGINT) AS s2
        FROM cells GROUP BY treated, post
    ),
    w AS (
        SELECT
          MAX(CASE WHEN treated = 1 AND post = 1 THEN CAST(s1 AS DOUBLE) / n END) AS m_tp,
          MAX(CASE WHEN treated = 1 AND post = 0 THEN CAST(s1 AS DOUBLE) / n END) AS m_t0,
          MAX(CASE WHEN treated = 0 AND post = 1 THEN CAST(s1 AS DOUBLE) / n END) AS m_cp,
          MAX(CASE WHEN treated = 0 AND post = 0 THEN CAST(s1 AS DOUBLE) / n END) AS m_c0,
          MAX(CASE WHEN treated = 1 AND post = 1 THEN
              (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1) / n END) AS v_tp,
          MAX(CASE WHEN treated = 1 AND post = 0 THEN
              (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1) / n END) AS v_t0,
          MAX(CASE WHEN treated = 0 AND post = 1 THEN
              (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1) / n END) AS v_cp,
          MAX(CASE WHEN treated = 0 AND post = 0 THEN
              (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1) / n END) AS v_c0,
          CAST(SUM(n) AS BIGINT) AS n_events
        FROM s
    )
    SELECT n_events,
           ROUND(((m_tp - m_t0) - (m_cp - m_c0)) / 100.0, 6) AS did_estimate,
           ROUND(sqrt(v_tp + v_t0 + v_cp + v_c0) / 100.0, 6) AS did_se,
           ROUND(((m_tp - m_t0) - (m_cp - m_c0))
                 / sqrt(v_tp + v_t0 + v_cp + v_c0), 6) AS t_stat
    FROM w
    """,
)
def mlops_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round 14, examined and reverted: staging this shared 3-column
    # projection (so the span aggregate and the cell assignment share
    # one scan) A/B'd 0.87x at sf0.1 — the O(events) persist costs
    # more than the second column-pruned scan, and the span (a global
    # min/max) cannot be derived from the per-cell aggregate because
    # the cells themselves depend on it. The hoisted projection is
    # kept (same expressions, one place); events x2 stays.
    base = load(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        (F.col("user_id") % 2 == 0).cast("int").alias("treated"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    span = base.agg(
        F.min("day").alias("d0"),
        (F.datediff(F.max("day"), F.min("day")) / 2)
        .cast("long")
        .alias("half"),
    )
    cells = base.crossJoin(F.broadcast(span)).select(
        "treated",
        (F.datediff(F.col("day"), F.col("d0")) > F.col("half"))
        .cast("int")
        .alias("post"),
        "cents",
    )
    s = cells.groupBy("treated", "post").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    # try_divide on the n-1 factor: a single-observation cell has no
    # variance estimate — NULL on both engines, not an ANSI abort
    sem2 = F.try_divide(
        F.try_divide(
            (
                F.col("s2").cast("double")
                - F.col("s1").cast("double") * F.col("s1") / F.col("n")
            ),
            (F.col("n") - 1).cast("double"),
        ),
        F.col("n").cast("double"),
    )

    def cell(t, p, c):
        return F.max(
            F.when((F.col("treated") == t) & (F.col("post") == p), c)
        )

    w = s.agg(
        cell(1, 1, mean).alias("m_tp"),
        cell(1, 0, mean).alias("m_t0"),
        cell(0, 1, mean).alias("m_cp"),
        cell(0, 0, mean).alias("m_c0"),
        cell(1, 1, sem2).alias("v_tp"),
        cell(1, 0, sem2).alias("v_t0"),
        cell(0, 1, sem2).alias("v_cp"),
        cell(0, 0, sem2).alias("v_c0"),
        F.sum("n").alias("n_events"),
    )
    did = (F.col("m_tp") - F.col("m_t0")) - (
        F.col("m_cp") - F.col("m_c0")
    )
    se = F.sqrt(
        F.col("v_tp") + F.col("v_t0") + F.col("v_cp") + F.col("v_c0")
    )
    return w.select(
        "n_events",
        F.round(did / F.lit(100.0), 6).alias("did_estimate"),
        F.round(se / F.lit(100.0), 6).alias("did_se"),
        F.round(F.try_divide(did, se), 6).alias("t_stat"),
    )


# --------------------------------------------------------------------
# Quantile drift — the distributional complement to the fixed-bin
# PSI/KS monitors: compare the ref/cur value distributions per event
# type at four quantiles and report the mean absolute quantile shift
# (the "quantile drift distance" used when binning is too coarse).
# Exact percentile() here is the oracle-checkable truth; the
# mergeable-sketch scale path is mlops_quantile_drift_sketch below.
#
# Scale shape: one scan, one groupBy(event_type) with conditional
# aggregates — percentile over CASE WHEN ignores the other window's
# rows as NULLs on both engines. percentile() itself holds per-group
# sorted state, which is exactly why the sketch twin exists.
# --------------------------------------------------------------------
_QD_PROBS = (0.25, 0.5, 0.75, 0.9)


@query(
    "mlops_quantile_drift",
    oracle=f"""
    SELECT event_type,
           CAST(SUM(CASE WHEN ts < TIMESTAMP '{DRIFT_SPLIT}'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
           CAST(SUM(CASE WHEN ts >= TIMESTAMP '{DRIFT_SPLIT}'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_cur,
           {", ".join(
               f"quantile_cont(CASE WHEN ts < TIMESTAMP '{DRIFT_SPLIT}' "
               f"THEN value END, {p}) AS ref_p{int(p * 100)}, "
               f"quantile_cont(CASE WHEN ts >= TIMESTAMP '{DRIFT_SPLIT}' "
               f"THEN value END, {p}) AS cur_p{int(p * 100)}"
               for p in _QD_PROBS
           )},
           ({" + ".join(
               f"abs(quantile_cont(CASE WHEN ts >= TIMESTAMP "
               f"'{DRIFT_SPLIT}' THEN value END, {p})"
               f" - quantile_cont(CASE WHEN ts < TIMESTAMP "
               f"'{DRIFT_SPLIT}' THEN value END, {p}))"
               for p in _QD_PROBS
           )}) / {len(_QD_PROBS)}.0 AS qdrift
    FROM events
    GROUP BY event_type
    """,
)
def mlops_quantile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_type", "value", "ts")
    split = F.lit(DRIFT_SPLIT).cast("timestamp")
    # The conditional percentiles are built via expr with the same
    # CASE text as the oracle so op order (and bits) match exactly.
    ref_case = f"CASE WHEN ts < TIMESTAMP '{DRIFT_SPLIT}' THEN value END"
    cur_case = f"CASE WHEN ts >= TIMESTAMP '{DRIFT_SPLIT}' THEN value END"
    aggs = [
        F.sum(F.when(F.col("ts") < split, 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("ts") >= split, 1).otherwise(0)).alias("n_cur"),
    ]
    for p in _QD_PROBS:
        aggs.append(
            F.expr(f"percentile({ref_case}, {p})").alias(
                f"ref_p{int(p * 100)}"
            )
        )
        aggs.append(
            F.expr(f"percentile({cur_case}, {p})").alias(
                f"cur_p{int(p * 100)}"
            )
        )
    drift = F.expr(
        "("
        + " + ".join(
            f"abs(percentile({cur_case}, {p})"
            f" - percentile({ref_case}, {p}))"
            for p in _QD_PROBS
        )
        + f") / {len(_QD_PROBS)}.0"
    ).alias("qdrift")
    return ev.groupBy("event_type").agg(*aggs, drift)


# --------------------------------------------------------------------
# Quantile drift, sketch scale path: the same ref/cur quantile-shift
# report computed through the mergeable compress/merge centroid
# sketch (operators/qsketch.py) instead of exact percentile(). At
# 100 TB exact per-group percentiles hold whole groups in sorted
# state; the sketch caps every task at K centroids and merges
# associatively — the KLL/t-digest contract. rows-only by design (a
# sketch has no SQL twin); the rank-error bound vs the exact twin is
# pinned in tests/test_qsketch.py, and determinism comes from
# position-bucketing sorted values (rerun sweep covers it).
# --------------------------------------------------------------------
@query("mlops_quantile_drift_sketch")
def mlops_quantile_drift_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.qsketch import sketch_quantiles

    ev = load(spark, sf_dir, "events").select("event_type", "value", "ts")
    split = F.lit(DRIFT_SPLIT).cast("timestamp")
    tagged = ev.withColumn(
        "grp",
        F.concat(
            "event_type",
            F.lit("|"),
            F.when(F.col("ts") < split, F.lit("ref")).otherwise(
                F.lit("cur")
            ),
        ),
    )
    sk = sketch_quantiles(
        tagged, "grp", "value", probs=(0.5, 0.95), k=64, n_shards=32
    ).select(
        F.split("g", "\\|")[0].alias("event_type"),
        F.split("g", "\\|")[1].alias("period"),
        "n",
        "q500",
        "q950",
    )
    side = lambda c, p: F.max(F.when(F.col("period") == p, F.col(c)))
    return sk.groupBy("event_type").agg(
        side("n", "ref").cast("long").alias("n_ref"),
        side("n", "cur").cast("long").alias("n_cur"),
        F.round(side("q500", "ref"), 6).alias("ref_p50"),
        F.round(side("q500", "cur"), 6).alias("cur_p50"),
        F.round(side("q950", "ref"), 6).alias("ref_p95"),
        F.round(side("q950", "cur"), 6).alias("cur_p95"),
        F.round(
            (
                F.abs(side("q500", "cur") - side("q500", "ref"))
                + F.abs(side("q950", "cur") - side("q950", "ref"))
            )
            / 2.0,
            6,
        ).alias("qdrift_est"),
    )


# --------------------------------------------------------------------
# Cohen's kappa — chance-corrected inter-annotator agreement, the
# metric quality pipelines use to accept/reject labeling runs (two
# human raters, or model-vs-heuristic). Two deterministic "raters"
# over events stand in for label columns: rater A fires on value,
# rater B on time-of-day. One pass: the four confusion cells are
# conditional sums, po/pe/kappa are closed-form scalars — at 100 TB
# this is a single map-side-combinable aggregate, no shuffle wider
# than one row.
# --------------------------------------------------------------------
@query(
    "mlops_cohens_kappa",
    oracle="""
    WITH r AS (
        SELECT CASE WHEN value > 50 THEN 1 ELSE 0 END AS a,
               CASE WHEN EXTRACT(hour FROM ts) < 12 THEN 1 ELSE 0 END AS b
        FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
    ),
    c AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(a * b) AS BIGINT) AS n11,
               CAST(SUM(a * (1 - b)) AS BIGINT) AS n10,
               CAST(SUM((1 - a) * b) AS BIGINT) AS n01,
               CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n00
        FROM r
    )
    SELECT n, n11, n10, n01, n00,
           ROUND((n11 + n00) * 1.0 / NULLIF(n, 0), 6) AS po,
           ROUND(((n11 + n10) * 1.0 / NULLIF(n, 0))
                   * ((n11 + n01) * 1.0 / NULLIF(n, 0))
                 + ((n01 + n00) * 1.0 / NULLIF(n, 0))
                   * ((n10 + n00) * 1.0 / NULLIF(n, 0)), 6) AS pe,
           ROUND(((n11 + n00) * 1.0 / NULLIF(n, 0)
                  - (((n11 + n10) * 1.0 / NULLIF(n, 0))
                       * ((n11 + n01) * 1.0 / NULLIF(n, 0))
                     + ((n01 + n00) * 1.0 / NULLIF(n, 0))
                       * ((n10 + n00) * 1.0 / NULLIF(n, 0))))
                 / NULLIF(1.0
                    - (((n11 + n10) * 1.0 / NULLIF(n, 0))
                         * ((n11 + n01) * 1.0 / NULLIF(n, 0))
                       + ((n01 + n00) * 1.0 / NULLIF(n, 0))
                         * ((n10 + n00) * 1.0 / NULLIF(n, 0))), 0), 6)
               AS kappa
    FROM c
    """,
)
def mlops_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & F.col("ts").isNotNull())
        .select(
            F.when(F.col("value") > 50, 1).otherwise(0).alias("a"),
            F.when(F.hour("ts") < 12, 1).otherwise(0).alias("b"),
        )
    )
    c = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("a") * F.col("b")).alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).alias("n00"),
    )
    # NULLIF guards (mirrored in the oracle): zero usable rows makes
    # every rate undefined, and pe == 1 (a constant rater on a tiny /
    # degenerate corpus — the fuzz shrank to a single event) makes
    # kappa's 1-pe denominator zero. NULL, not an ANSI abort.
    n = F.nullif(F.col("n"), F.lit(0))
    po = (F.col("n11") + F.col("n00")) * 1.0 / n
    pe = ((F.col("n11") + F.col("n10")) * 1.0 / n) * (
        (F.col("n11") + F.col("n01")) * 1.0 / n
    ) + ((F.col("n01") + F.col("n00")) * 1.0 / n) * (
        (F.col("n10") + F.col("n00")) * 1.0 / n
    )
    return c.select(
        "n", "n11", "n10", "n01", "n00",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round(
            (po - pe) / F.nullif(1.0 - pe, F.lit(0.0)), 6
        ).alias("kappa"),
    )


# --------------------------------------------------------------------
# Propensity-score matching (nearest-neighbor-below within exact
# strata) — the causal-inference op next to mlops_diff_in_diff: each
# treated unit is matched to the control with the LARGEST score <=
# its own inside the same stratum, then the average treated-minus-
# matched outcome difference estimates the ATT. "Nearest below in a
# sorted axis" is exactly the as-of join, applied to the SCORE axis
# instead of time; the oracle says it natively (DuckDB ASOF JOIN),
# the engine uses the same union + sort + last_value(ignorenulls)
# mechanics as star_asof_join. Controls are deduped to one per
# (stratum, score) (max (outcome, event_id) struct wins — the same
# composite ordering on both engines, never packed-integer arithmetic
# that could cross outcome boundaries at large event_ids) so the
# match is deterministic on both engines.
#
# Scale shape — the round-8 parallelism cliff, fixed: stratum =
# hour(ts) has 24 values forever, so Window.partitionBy("stratum")
# sorts every hour's whole population in ONE task at any data size.
# The engine now runs the two-level boundary hand-off pattern
# (operators/prefix.py's trick applied to windows): partition the
# running last-control window by (stratum, score-range bucket) —
# floor(score / 2.0), literal width, cardinality grows with the score
# domain — then compute each bucket's LAST control in a tiny
# O(strata x buckets) aggregate, carry it across bucket edges with a
# window over that tiny frame, and coalesce. Identical answer (floor
# is monotone in score: every prior-bucket control scores strictly
# below every current-bucket row, and within-bucket order is the old
# (score, tag, eid) order), but the big sort now spreads over
# hundreds of (stratum, bucket) tasks; pinned >24-way by
# tests/test_plans.py::test_propensity_match_parallelism.
# --------------------------------------------------------------------
@query(
    "mlops_propensity_match",
    oracle="""
    WITH ctr AS (
        SELECT EXTRACT(hour FROM ts) AS stratum, value AS score,
               (MAX(struct_pack(o := length(props), e := event_id))).o
                   AS outcome_c
        FROM events
        WHERE event_type = 'view' AND value IS NOT NULL
          AND ts IS NOT NULL AND props IS NOT NULL
        GROUP BY stratum, score
    ),
    trt AS (
        SELECT EXTRACT(hour FROM ts) AS stratum, value AS score,
               length(props) AS outcome_t
        FROM events
        WHERE event_type = 'purchase' AND value IS NOT NULL
          AND ts IS NOT NULL AND props IS NOT NULL
    ),
    m AS (
        SELECT t.outcome_t, c.outcome_c
        FROM trt t
        ASOF LEFT JOIN ctr c
          ON t.stratum = c.stratum AND t.score >= c.score
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_treated,
           CAST(COUNT(outcome_c) AS BIGINT) AS n_matched,
           ROUND(SUM(CASE WHEN outcome_c IS NOT NULL
                          THEN outcome_t - outcome_c END) * 1.0
                 / NULLIF(COUNT(outcome_c), 0), 6) AS att
    FROM m
    """,
)
def mlops_propensity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load(spark, sf_dir, "events")
        .filter(
            F.col("value").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("props").isNotNull()
        )
        .select(
            "event_id",
            "event_type",
            F.hour("ts").alias("stratum"),
            F.col("value").alias("score"),
            F.length("props").alias("outcome"),
        )
    )
    # Round 14 (§2.4): the control branch and the treated branch each
    # filtered their OWN events scan under the union — staging the
    # shared 5-column projection makes it one corpus pass.
    from ..operators.staging import ab_off, stage_boundary

    if not ab_off("propensity_ev_stage"):
        ev = stage_boundary(ev, materialize=False)
    ctr = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("stratum", "score")
        .agg(
            F.max(F.struct("outcome", "event_id"))["outcome"].alias(
                "outcome_c"
            )
        )
        .select(
            "stratum", "score",
            F.lit("c").alias("tag"),
            F.lit(None).cast("long").alias("eid"),
            F.col("outcome_c").alias("oc"),
            F.lit(None).cast("int").alias("ot"),
        )
    )
    trt = ev.filter(F.col("event_type") == "purchase").select(
        "stratum", "score",
        F.lit("t").alias("tag"),
        F.col("event_id").alias("eid"),
        F.lit(None).cast("int").alias("oc"),
        F.col("outcome").alias("ot"),
    )
    # score-range sub-buckets: the literal width keeps floor() a pure
    # map-side expression, and (stratum, bucket) cardinality grows
    # with the score domain instead of freezing at 24 strata
    u = ctr.unionByName(trt).withColumn(
        "bucket", F.floor(F.col("score") / F.lit(2.0))
    )
    # 'c' < 't': an equal-score control sorts before the treated row,
    # so score >= (closed bound) matches it
    w_local = (
        Window.partitionBy("stratum", "bucket")
        .orderBy("score", "tag", "eid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("mc_local", F.last("oc", ignorenulls=True).over(w_local))
    # staged: both the bucket-frame aggregate and the join-back read
    # u — without the boundary each branch re-runs the union + window
    from ..operators.staging import stage_boundary

    u = stage_boundary(u, materialize=False)
    # boundary hand-off: each bucket's LAST control (controls are
    # unique per (stratum, score), so max score among controls is the
    # last one) -> carried forward across bucket edges by a window
    # over the O(strata x buckets) bucket frame, never the row frame
    bucket_last = u.groupBy("stratum", "bucket").agg(
        F.max(
            F.when(F.col("tag") == "c", F.struct("score", "oc"))
        )["oc"].alias("blast")
    )
    w_carry = (
        Window.partitionBy("stratum")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carries = bucket_last.select(
        "stratum",
        "bucket",
        F.last("blast", ignorenulls=True).over(w_carry).alias("carry"),
    )
    # shuffle_hash hint: carries is O(strata x buckets) — tiny for
    # bounded score domains but the bucket count grows with the score
    # DOMAIN, not a literal, so it is not bounded by construction.
    # Round 11's broadcast audit (after teaching the scanner
    # SortAggregate's `key=` spelling) caught the static planner
    # broadcasting this frame at sf1, falsifying the previous "AQE
    # sizes it" comment — same eager-broadcast-build trap as the
    # round-10 class: a static broadcast cannot be AQE-demoted, a
    # hinted shuffle can still be AQE-upgraded from runtime stats.
    matched = (
        u.join(carries.hint("shuffle_hash"), ["stratum", "bucket"], "left")
        .filter(F.col("tag") == "t")
        .select("ot", F.coalesce("mc_local", "carry").alias("mc"))
    )
    return matched.agg(
        F.count(F.lit(1)).alias("n_treated"),
        F.count("mc").alias("n_matched"),
        F.round(
            F.sum(F.when(F.col("mc").isNotNull(), F.col("ot") - F.col("mc")))
            * 1.0
            / F.nullif(F.count("mc"), F.lit(0)),  # zero matches -> NULL
            6,
        ).alias("att"),
    )


# --------------------------------------------------------------------
# Leave-one-out target encoding — the standard high-cardinality
# categorical encoder for tabular models: each row's category is
# replaced by the target mean of the OTHER rows in that category,
# (sum - own) / (n - 1), so the encoding never leaks the row's own
# label. One groupBy to the per-category (sum, n) + one broadcastable
# join back: at 100 TB the encoder table is O(categories), the fact
# side never shuffles. Integer sums make the division bit-identical
# across engines.
# --------------------------------------------------------------------
@query(
    "mlops_target_encoding_loo",
    oracle="""
    WITH r AS (
        SELECT event_id, event_type,
               CASE WHEN value > 50 THEN 1 ELSE 0 END AS y
        FROM events WHERE value IS NOT NULL
    ),
    enc AS (
        SELECT event_type, CAST(SUM(y) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM r GROUP BY event_type
    )
    SELECT r.event_id, r.event_type, r.y,
           CASE WHEN enc.n > 1
                THEN ROUND((enc.s - r.y) * 1.0 / (enc.n - 1), 6) END
               AS loo_encoding
    FROM r JOIN enc USING (event_type)
    """,
)
def mlops_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            "event_type",
            F.when(F.col("value") > 50, 1).otherwise(0).alias("y"),
        )
    )
    # Round 14, examined and reverted: staging r (the 3-column
    # O(events) projection) to collapse the encoder aggregate and the
    # join-back into one scan A/B'd 0.76x at sf0.1 — the O(events)
    # persist costs more than the second column-pruned scan, and
    # unlike the woe totals the LOO output needs every row, so
    # nothing can be derived from the aggregate. The events x2 stays
    # as the better plan locally; at 100 TB the trade reverses only
    # if a corpus re-read costs more than an O(corpus) cache write
    # (numbers in OPTIMIZATION_r14.md).
    enc = r.groupBy("event_type").agg(
        F.sum("y").alias("s"), F.count(F.lit(1)).alias("n")
    )
    return r.join(F.broadcast(enc), "event_type").select(
        "event_id",
        "event_type",
        "y",
        F.when(
            F.col("n") > 1,
            F.round((F.col("s") - F.col("y")) * 1.0 / (F.col("n") - 1), 6),
        ).alias("loo_encoding"),
    )


# --------------------------------------------------------------------
# McNemar's test — PAIRED classifier comparison on one eval set (the
# statistically-correct way to claim "model B beats model A" when
# both scored the same rows; an unpaired z-test overstates
# significance because the predictions are correlated). Only the
# discordant cells matter: b = A right / B wrong, c = A wrong /
# B right; the continuity-corrected statistic (|b-c|-1)^2/(b+c) is
# chi-square(1) under H0. Two deterministic rule "models" stand in
# for scored columns. One conditional-sum pass, map-side combinable.
# --------------------------------------------------------------------
@query(
    "mlops_mcnemar_test",
    oracle="""
    WITH r AS (
        SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
               CASE WHEN value > 100 THEN 1 ELSE 0 END AS pa,
               CASE WHEN length(props) > 8 THEN 1 ELSE 0 END AS pb
        FROM events
        WHERE value IS NOT NULL AND props IS NOT NULL
          AND event_type IS NOT NULL
    ),
    c AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN pa = y AND pb <> y THEN 1 ELSE 0 END)
                    AS BIGINT) AS b,
               CAST(SUM(CASE WHEN pa <> y AND pb = y THEN 1 ELSE 0 END)
                    AS BIGINT) AS c_
        FROM r
    )
    SELECT n, b, c_ AS c,
           -- (|b-c|-1)^2 widened to HUGEINT before the square: the
           -- discordant counts are O(rows), so the square passes 2^63
           -- around 3e9 discordant pairs (Spark: decimal(38,0))
           ROUND(CAST(abs(b - c_) - 1 AS HUGEINT) * (abs(b - c_) - 1)
                 * 1.0 / NULLIF(b + c_, 0), 6) AS mcnemar_chi2
    FROM c
    """,
)
def mlops_mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = (
        load(spark, sf_dir, "events")
        .filter(
            F.col("value").isNotNull()
            & F.col("props").isNotNull()
            & F.col("event_type").isNotNull()
        )
        .select(
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("y"),
            F.when(F.col("value") > 100, 1).otherwise(0).alias("pa"),
            F.when(F.length("props") > 8, 1).otherwise(0).alias("pb"),
        )
    )
    c = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(
                (F.col("pa") == F.col("y")) & (F.col("pb") != F.col("y")), 1
            ).otherwise(0)
        ).alias("b"),
        F.sum(
            F.when(
                (F.col("pa") != F.col("y")) & (F.col("pb") == F.col("y")), 1
            ).otherwise(0)
        ).alias("c"),
    )
    d = F.abs(F.col("b") - F.col("c"))
    # (|b-c|-1)^2 widens to decimal(38,0) before the square (== oracle
    # HUGEINT): discordant counts are O(rows), the square wraps long
    # around 3e9 discordant pairs
    return c.select(
        "n", "b", "c",
        F.round(
            (d - 1).cast("decimal(38,0)") * (d - 1) * 1.0
            / F.nullif(F.col("b") + F.col("c"), F.lit(0)),
            6,
        ).alias("mcnemar_chi2"),
    )


# --------------------------------------------------------------------
# CUPED variance reduction (Deng/Xu/Kohavi/Walker WSDM'13) — the
# experimentation-platform staple: adjust each unit's experiment
# metric Y by its PRE-period covariate X, Y' = Y - theta(X - mean X)
# with theta = cov(X,Y)/var(X), shrinking metric variance without
# biasing the treatment effect. Everything reduces to five integer
# sums (n, Sx, Sy, Sxy, Sxx, Syy) over per-user cent totals — one
# groupBy(user) + one grand aggregate; theta and the variance
# reduction are closed-form scalars from exact integers, so both
# engines agree bitwise. (At petabyte user counts the int64 product
# sums need DECIMAL headroom — the shape stays one pass.)
# --------------------------------------------------------------------
@query(
    "mlops_cuped_adjustment",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN ts < TIMESTAMP '{DRIFT_SPLIT}'
                        THEN CAST(ROUND(value * 100) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS x,
               CAST(SUM(CASE WHEN ts >= TIMESTAMP '{DRIFT_SPLIT}'
                        THEN CAST(ROUND(value * 100) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS y
        FROM events
        WHERE value IS NOT NULL AND ts IS NOT NULL
        GROUP BY user_id
    ),
    s AS (
        -- per-user products and every cross-product widened to
        -- HUGEINT BEFORE multiplying: x*y in BIGINT aborts once a
        -- power user's cent totals square past 2^63 (the round-10
        -- agg-product hygiene sweep's class; Spark side matches with
        -- decimal(38,0))
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               SUM(CAST(x AS HUGEINT) * y) AS sxy,
               SUM(CAST(x AS HUGEINT) * x) AS sxx,
               SUM(CAST(y AS HUGEINT) * y) AS syy
        FROM per_user
    ),
    c AS (
        SELECT n,
               CAST(CAST(n AS HUGEINT) * sxy
                    - CAST(sx AS HUGEINT) * sy AS DOUBLE) AS cxy,
               CAST(NULLIF(CAST(n AS HUGEINT) * sxx
                           - CAST(sx AS HUGEINT) * sx, 0) AS DOUBLE)
                   AS cxx,
               CAST(CAST(n AS HUGEINT) * syy
                    - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS cyy,
               CAST(NULLIF(CAST(n AS HUGEINT) * n, 0) AS DOUBLE) AS nn
        FROM s
    )
    -- NO ROUND on any output (round-13 fuzz catch): the inputs are
    -- exact decimals, so the divisions/products below are the same
    -- IEEE ops on bit-identical operands in both engines — already
    -- bit-exact. ROUND(x, 6) itself is what DIVERGED: at var_y
    -- magnitudes ~3e11 six decimals are BELOW one ULP, and Spark
    -- (BigDecimal HALF_UP on the exact expansion) vs DuckDB
    -- (multiply-then-round in double space) legitimately pick
    -- adjacent representable doubles.
    SELECT n,
           cxy / cxx AS theta,
           cyy / nn AS var_y,
           (cyy / nn)
                 - (cxy / cxx) * (cxy / cxx) * (cxx / nn)
               AS var_y_adj,
           (cxy / cxx) * (cxy / cxx) * (cxx / nn)
                 / NULLIF(cyy / nn, 0)
               AS var_reduction_frac
    FROM c
    """,
)
def mlops_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    split = F.lit(DRIFT_SPLIT).cast("timestamp")
    cents = F.round(F.col("value") * 100).cast("long")
    per_user = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & F.col("ts").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("ts") < split, cents).otherwise(0)).alias(
                "x"
            ),
            F.sum(F.when(F.col("ts") >= split, cents).otherwise(0)).alias(
                "y"
            ),
        )
    )
    # per-user products and every cross-product widen to decimal(38,0)
    # BEFORE multiplying (== DuckDB HUGEINT): x*y wraps silently in
    # long once a power user's cent totals square past 2^63 — the
    # round-10 agg-product hygiene sweep's class
    d = lambda c: c.cast("decimal(38,0)")
    s = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(d(F.col("x")) * F.col("y")).alias("sxy"),
        F.sum(d(F.col("x")) * F.col("x")).alias("sxx"),
        F.sum(d(F.col("y")) * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    zero = F.lit(0).cast("decimal(38,0)")
    # NULLIF guards: a degenerate corpus (zero covariate variance —
    # every user's pre-period X identical, e.g. all activity in one
    # instant — or zero rows) makes CUPED undefined; emit NULL rather
    # than an ANSI divide-by-zero abort. Same NULLIFs in the oracle.
    cxy = (d(n) * sxy - d(sx) * sy).cast("double")
    cxx = F.nullif(d(n) * sxx - d(sx) * sx, zero).cast("double")
    cyy = (d(n) * syy - d(sy) * sy).cast("double")
    nn = F.nullif(d(n) * n, zero).cast("double")
    theta = cxy / cxx
    var_y = cyy / nn
    var_x = cxx / nn
    # unrounded on purpose (round-13 fuzz catch, mirrored in the
    # oracle): the divisions are identical IEEE ops on bit-identical
    # exact-decimal operands — already bit-exact across engines —
    # while ROUND(x, 6) at var_y magnitudes ~3e11 asks for sub-ULP
    # precision and the two engines' rounding algorithms pick
    # adjacent doubles (found by the 100-example singleton deck;
    # theorem corpus in the deck's shrunk example)
    return s.select(
        "n",
        theta.alias("theta"),
        var_y.alias("var_y"),
        (var_y - theta * theta * var_x).alias("var_y_adj"),
        (
            theta * theta * var_x / F.nullif(var_y, F.lit(0.0))
        ).alias("var_reduction_frac"),
    )


# --------------------------------------------------------------------
# Qini / uplift curve — the evaluation curve for uplift models
# (Radcliffe's Qini): units ranked by score into fixed deciles, and
# per cumulative prefix the incremental responders
# resp_t - resp_c * (n_t / n_c) — how many conversions the model's
# targeting earned over random. Treatment assignment is the
# deterministic user-hash split; fixed VALUE bins (not ntile) keep the
# ranking map-side at any scale, and the cumulative sums run over the
# 10-row bin frame — the same K-row-window pattern as the PSI/lift
# tables, with exact integer ratios.
# --------------------------------------------------------------------
@query(
    "mlops_qini_uplift",
    oracle="""
    WITH r AS (
        SELECT LEAST(CAST(FLOOR(value / 50) AS BIGINT), 9) AS bin,
               user_id % 2 AS treated,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events
        WHERE value IS NOT NULL AND user_id IS NOT NULL
          AND event_type IS NOT NULL
    ),
    per_bin AS (
        SELECT bin,
               CAST(SUM(treated) AS BIGINT) AS n_t,
               CAST(SUM(1 - treated) AS BIGINT) AS n_c,
               CAST(SUM(treated * y) AS BIGINT) AS resp_t,
               CAST(SUM((1 - treated) * y) AS BIGINT) AS resp_c
        FROM r GROUP BY bin
    ),
    cum AS (
        SELECT bin,
               SUM(n_t) OVER w AS c_nt, SUM(n_c) OVER w AS c_nc,
               SUM(resp_t) OVER w AS c_rt, SUM(resp_c) OVER w AS c_rc
        FROM per_bin
        WINDOW w AS (ORDER BY bin DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT bin,
           CAST(c_nt AS BIGINT) AS cum_treated,
           CAST(c_nc AS BIGINT) AS cum_control,
           CAST(c_rt AS BIGINT) AS cum_resp_t,
           CAST(c_rc AS BIGINT) AS cum_resp_c,
           ROUND(c_rt - c_rc * 1.0 * c_nt / NULLIF(c_nc, 0), 6)
               AS qini
    FROM cum
    """,
)
def mlops_qini_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = (
        load(spark, sf_dir, "events")
        .filter(
            F.col("value").isNotNull()
            & F.col("user_id").isNotNull()
            & F.col("event_type").isNotNull()
        )
        .select(
            F.least(F.floor(F.col("value") / 50), F.lit(9))
            .cast("long")
            .alias("bin"),
            (F.col("user_id") % 2).alias("treated"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("y"),
        )
    )
    per_bin = r.groupBy("bin").agg(
        F.sum("treated").alias("n_t"),
        F.sum(1 - F.col("treated")).alias("n_c"),
        F.sum(F.col("treated") * F.col("y")).alias("resp_t"),
        F.sum((1 - F.col("treated")) * F.col("y")).alias("resp_c"),
    )
    w = Window.orderBy(F.col("bin").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_bin.select(
        "bin",
        F.sum("n_t").over(w).alias("c_nt"),
        F.sum("n_c").over(w).alias("c_nc"),
        F.sum("resp_t").over(w).alias("c_rt"),
        F.sum("resp_c").over(w).alias("c_rc"),
    )
    return cum.select(
        "bin",
        F.col("c_nt").cast("long").alias("cum_treated"),
        F.col("c_nc").cast("long").alias("cum_control"),
        F.col("c_rt").cast("long").alias("cum_resp_t"),
        F.col("c_rc").cast("long").alias("cum_resp_c"),
        F.round(
            F.col("c_rt")
            - F.col("c_rc") * 1.0 * F.col("c_nt")
            / F.nullif(F.col("c_nc"), F.lit(0)),
            6,
        ).alias("qini"),
    )


# --------------------------------------------------------------------
# Group-aware k-fold assignment — the split that PREVENTS entity
# leakage: every event of a user lands in the SAME fold (fold =
# hash(user) % 5), so cross-validation never trains on one half of a
# user's history and evaluates on the other (the leakage class the
# reference's chronological split also guards against, reference
# 04:29-70). Deterministic hash assignment = reproducible without a
# stored assignment table at any scale; the output audits fold
# balance AND proves the no-straddle property (each user appears in
# exactly one fold) as a checkable aggregate: sum of per-fold
# distinct users == global distinct users.
# --------------------------------------------------------------------
def _fold_sql(key_expr: str) -> str:
    h = f"md5(concat('fold', {key_expr}))"
    return (
        f"(((instr('0123456789abcdef', substring({h}, 1, 1)) - 1) * 16"
        f" + instr('0123456789abcdef', substring({h}, 2, 1)) - 1) % 5)"
    )


@query(
    "mlops_group_kfold",
    oracle=f"""
    WITH t AS (
        SELECT {_fold_sql("CAST(user_id AS VARCHAR)")} AS fold,
               user_id,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events WHERE user_id IS NOT NULL
    )
    SELECT CAST(fold AS BIGINT) AS fold,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(y) AS BIGINT) AS n_pos,
           ROUND(SUM(y) * 1.0 / COUNT(*), 6) AS pos_rate
    FROM t GROUP BY fold
    """,
)
def mlops_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select(
            F.expr(_fold_sql("CAST(user_id AS STRING)")).alias("fold"),
            "user_id",
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("y"),
        )
    )
    return ev.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum("y").alias("n_pos"),
        F.round(F.sum("y") * 1.0 / F.count(F.lit(1)), 6).alias("pos_rate"),
    ).select(F.col("fold").cast("long").alias("fold"), "n_rows", "n_users", "n_pos", "pos_rate")


# --------------------------------------------------------------------
# Weight-of-evidence (WoE) binning + information value — the credit-
# scoring standard for encoding a binned numeric feature against a
# binary target: WoE(bin) = ln((good_share)/(bad_share)), IV =
# sum (good_share - bad_share) * WoE. Complements the LOO target
# encoder: LOO encodes categories row-wise, WoE encodes BINS with a
# likelihood-ratio scale and gives the feature-screening IV for
# free. Exactness: shares are integer-count divisions (bit-identical
# doubles), ln of identical doubles is bit-identical (the A-ES
# precedent), WoE is shipped in integer micro-nats, and degenerate
# bins (no goods or no bads anywhere, or an empty class) NULL out
# through NULLIF instead of producing infinities. One grand
# aggregate for the class totals (broadcast scalar) + one bounded
# group-by: two map-side passes at any scale.
# --------------------------------------------------------------------
@query(
    "mlops_woe_binning",
    oracle="""
    WITH r AS (
        SELECT CAST(FLOOR(value / 10.0) AS BIGINT) AS bin,
               CASE WHEN event_type IN ('purchase', 'signup')
                    THEN 1 ELSE 0 END AS y
        FROM events WHERE value IS NOT NULL
    ),
    tot AS (
        SELECT CAST(SUM(y) AS BIGINT) AS g,
               CAST(SUM(1 - y) AS BIGINT) AS b
        FROM r
    ),
    bins AS (
        SELECT bin,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS good,
               CAST(SUM(1 - y) AS BIGINT) AS bad
        FROM r GROUP BY bin
    )
    SELECT bin, n, good, bad,
           CAST(ROUND(ln((NULLIF(good, 0) * 1.0 / NULLIF(tot.g, 0))
                         / NULLIF(bad * 1.0 / NULLIF(tot.b, 0), 0))
                      * 1000000) AS BIGINT) AS woe_micro,
           (good * 1.0 / NULLIF(tot.g, 0)
            - bad * 1.0 / NULLIF(tot.b, 0))
               * ln((NULLIF(good, 0) * 1.0 / NULLIF(tot.g, 0))
                    / NULLIF(bad * 1.0 / NULLIF(tot.b, 0), 0))
               AS iv_term
    FROM bins, tot
    """,
)
def mlops_woe_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.floor(F.col("value") / 10.0).cast("long").alias("bin"),
            F.when(
                F.col("event_type").isin("purchase", "signup"), 1
            )
            .otherwise(0)
            .alias("y"),
        )
    )
    # Round 14, examined and reverted (three variants, numbers in
    # OPTIMIZATION_r14.md): (1) staging the O(events) (bin, y)
    # projection so totals + bins share one scan — 0.81x, the persist
    # costs more than the second column-pruned scan; (2) staging the
    # O(bins) rollup and deriving tot = column sums over it — 0.83x,
    # the InMemoryTableScan boundary costs more than the ~40-row
    # recompute; (3) deriving tot from bins WITHOUT a persist — no
    # win available: column pruning drops `n` from the totals branch,
    # the two bins exchanges stop canonicalizing equal, and the
    # executed adaptive plan shows no ReusedExchange (verified), i.e.
    # still two corpus passes but with a heavier second aggregate.
    # The r13 shape (independent 1-column totals scan) stays.
    tot = r.agg(
        F.sum("y").alias("g"), F.sum(1 - F.col("y")).alias("b")
    )
    bins = r.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("good"),
        F.sum(1 - F.col("y")).alias("bad"),
    )
    # NULLIF on the zero-good numerator too: DuckDB ln(0) ABORTS the
    # query (Spark's log(0) quietly NULLs) — a bin with no goods or no
    # bads has undefined WoE on both engines, as NULL
    gs = F.nullif(F.col("good"), F.lit(0)) * 1.0 / F.nullif(
        F.col("g"), F.lit(0)
    )
    bs = F.col("bad") * 1.0 / F.nullif(F.col("b"), F.lit(0))
    lr = F.log(gs / F.nullif(bs, F.lit(0.0)))
    return bins.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n",
        "good",
        "bad",
        F.round(lr * 1000000).cast("long").alias("woe_micro"),
        ((gs - bs) * lr).alias("iv_term"),
    )
