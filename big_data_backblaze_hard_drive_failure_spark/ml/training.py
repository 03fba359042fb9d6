"""Distributed model training + PR-AUC evaluation (reference M3/M4/M5).

The reference trains XGBoost on a pandas sample collected to the
driver (/root/reference/scripts/05_01_model_training_xgboost_oom_fix.py:79,110-126)
— workable only because downsampling shrank the data first, and a
hard wall at scale. The engine's primary path is Spark-native MLlib
(``LogisticRegression`` / ``GBTClassifier``): training is distributed,
and scoring via ``model.transform`` stays entirely JVM-side — zero
Python workers in the hot path, strictly faster than any UDF.

xgboost-on-collected-sample (the reference-faithful track) is gated
behind an import-try since xgboost isn't in this container; the
collect is guarded by a row cap either way (reference F3 boundary).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.ml.classification import (
    GBTClassifier,
    LogisticRegression,
)
from pyspark.ml.evaluation import BinaryClassificationEvaluator
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOPANDAS_ROW_CAP = 1_000_000


def assemble_features(
    df: DataFrame,
    features: Sequence[str],
    out: str = "features_vec",
    handle_invalid: str = "skip",
) -> DataFrame:
    """Column list -> MLlib vector column. By default rows with a
    null/NaN feature are DROPPED (handleInvalid="skip"): a row with
    missing features carries no usable signal, and silently imputing
    here would hide upstream gaps — the caller fills deliberately
    (reference P8 ``fillna(0)``) when imputation is the intent.
    Callers that must not lose rows (scoring a fixed population) pass
    ``handle_invalid="error"`` / ``"keep"`` explicitly."""
    asm = VectorAssembler(
        inputCols=list(features), outputCol=out, handleInvalid=handle_invalid
    )
    return asm.transform(df)


def _fit_or_explain_empty(estimator, vec: DataFrame, op: str):
    """Run the MLlib fit; if it dies AND the input turns out to be
    empty, replace the internal error ("Nothing has been added to this
    summarizer" / "DecisionTree requires size of input RDD > 0") with
    the pipeline-level reason. The emptiness probe runs ONLY on the
    failure path, so the happy path pays zero extra jobs (an eager
    isEmpty() pre-check re-ran the feature pipeline once per fit —
    measurably 1.8x on gbt queries)."""
    try:
        return estimator.fit(vec)
    except Exception as ex:
        # The probe itself can fail (executor/session death killed the
        # fit AND the cluster) — never let the probe's error mask the
        # original fit exception.
        try:
            empty = vec.isEmpty()
        except Exception:
            raise ex from None
        if empty:
            raise ValueError(
                f"{op}: training input has no rows — a model cannot be "
                "fit on an empty frame (empty split, over-tight filter, "
                "or a no-data day upstream)"
            ) from ex
        raise


def train_logistic(
    df: DataFrame,
    features: Sequence[str],
    label: str,
    max_iter: int = 20,
    reg_param: float = 0.0,
):
    """Distributed logistic regression (Spark-native twin of the
    reference's binary:logistic XGBoost objective, 05_01:110-121).
    Unlabeled rows can't train: null labels are dropped alongside
    assemble_features' null-feature skip."""
    vec = assemble_features(df.filter(F.col(label).isNotNull()), features)
    lr = LogisticRegression(
        featuresCol="features_vec",
        labelCol=label,
        maxIter=max_iter,
        regParam=reg_param,
        standardization=True,
    )
    return _fit_or_explain_empty(lr, vec, "train_logistic")


def train_gbt(
    df: DataFrame,
    features: Sequence[str],
    label: str,
    max_depth: int = 6,
    max_iter: int = 20,
    seed: int = 42,
):
    """Gradient-boosted trees — the closest MLlib analog of the
    reference's XGBoost config (depth 6, hist; 05_01:110-121).
    Null labels dropped — see train_logistic."""
    vec = assemble_features(df.filter(F.col(label).isNotNull()), features)
    gbt = GBTClassifier(
        featuresCol="features_vec",
        labelCol=label,
        maxDepth=max_depth,
        maxIter=max_iter,
        seed=seed,
    )
    return _fit_or_explain_empty(gbt, vec, "train_gbt")


def score_with_model(
    model,
    df: DataFrame,
    features: Sequence[str],
    handle_invalid: str = "skip",
) -> DataFrame:
    """JVM-side scoring: ``model.transform`` + positive-class
    probability extracted as a plain double column
    (``failure_probability``, matching the reference's column name at
    05_01:144-155). No Python workers anywhere in this plan.

    Row-drop contract: with the default ``handle_invalid="skip"``,
    rows with a null/NaN feature are silently dropped BEFORE scoring —
    the scored output (and any metric denominator computed from it,
    e.g. pr_auc) covers only fully-featured rows. Pass ``"error"`` to
    fail loudly on missing features, or ``"keep"`` (NaN-padded
    vectors) when the model tolerates them and every input row must
    appear in the output."""
    vec = assemble_features(df, features, handle_invalid=handle_invalid)
    scored = model.transform(vec)
    return scored.withColumn(
        "failure_probability",
        vector_to_array(F.col("probability")).getItem(1),
    ).drop("features_vec", "rawPrediction", "probability", "prediction")


def pr_auc(scored: DataFrame, score: str, label: str) -> float:
    """Area under the precision-recall curve (reference M4,
    05_01:161-170 — same evaluator class)."""
    ev = BinaryClassificationEvaluator(
        rawPredictionCol=score,  # plain double column is accepted
        labelCol=label,
        metricName="areaUnderPR",
    )
    return float(ev.evaluate(scored))


def guarded_to_pandas(df: DataFrame, cap: int = TOPANDAS_ROW_CAP):
    """Reference F3 boundary with the engine's row-cap guard: refuse to
    collect unbounded data to the driver (the reference's silent
    ``toPandas()`` on 17M rows is exactly the OOM its filename
    commemorates)."""
    n = df.count()
    if n > cap:
        raise ValueError(
            f"refusing toPandas() of {n} rows (cap {cap}); "
            "downsample or aggregate first"
        )
    return df.toPandas()
