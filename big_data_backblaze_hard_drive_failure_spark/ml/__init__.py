"""ML layer: model scoring, threshold selection, training, artifacts.

Reference capability (SURVEY.md §2.13): train -> score -> threshold ->
alert. The reference scores with a row-at-a-time Python UDF
(/root/reference/scripts/05_01_model_training_xgboost_oom_fix.py:135-139,
06_deployment_code.py:110-124) — its biggest perf bug. This engine
scores with Arrow-vectorized ``pandas_udf`` (small models) or MLlib
``model.transform`` (fully JVM-side), both of which scale to a
1000-executor cluster with the model broadcast once per executor
instead of pickled per row.
"""

from .scorer import LinearModel, score_column, score_pandas_udf, score_row_udf
from .threshold import threshold_at_recall
from .artifacts import (
    load_model_artifact,
    load_threshold_artifact,
    save_model_artifact,
    save_threshold_artifact,
)
from .training import (
    guarded_to_pandas,
    pr_auc,
    score_with_model,
    train_gbt,
    train_logistic,
)

__all__ = [
    "LinearModel",
    "score_column",
    "score_pandas_udf",
    "score_row_udf",
    "threshold_at_recall",
    "save_threshold_artifact",
    "load_threshold_artifact",
    "save_model_artifact",
    "load_model_artifact",
    "train_logistic",
    "train_gbt",
    "score_with_model",
    "pr_auc",
    "guarded_to_pandas",
]
