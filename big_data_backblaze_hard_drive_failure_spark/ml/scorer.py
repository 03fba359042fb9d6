"""Vectorized model scoring (reference F1/F2 replacement).

The reference captures an XGBoost booster in a row-wise ``F.udf``
closure and calls ``predict_proba`` on a 1-row numpy array per record
(/root/reference/scripts/05_01_model_training_xgboost_oom_fix.py:135-139);
``06_deployment_code.py:110-124`` even leaves the UDF untyped (implicit
StringType). The engine replaces both with a typed, Arrow-batched
``pandas_udf(DoubleType())``: the model ships to executors ONCE via a
Spark broadcast, and each Python worker scores a whole Arrow batch of
rows with one vectorized numpy call — the ~10-100x fix over per-row
pickling.

Determinism note (why softsign, not exp): the oracle gate demands
bit-reproducible scores across Spark and DuckDB. ``exp()`` may differ
by 1 ulp between libm builds, so the oracle-checked scorer uses the
rational sigmoid ``0.5 * (1 + z / (1 + |z|))`` (softsign) — pure IEEE
add/mul/div that both engines evaluate identically. It is monotone in
``z`` like the logistic, so thresholding/ranking semantics match. A
true logistic variant is provided for the MLlib training path (where
correctness is rows-only by design).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


@dataclass(frozen=True)
class LinearModel:
    """A tiny linear scorer: ``z = intercept + sum(w_i * x_i)``,
    ``p = sigmoid(z)``. Stands in for the reference's deployed model
    artifact (models/xgboost_backblaze.json — 500 trees over 6
    features); the engine's contract is the same: named features in a
    fixed order, one probability out."""

    features: tuple[str, ...]
    weights: tuple[float, ...]
    intercept: float = 0.0
    sigmoid: str = "softsign"  # "softsign" (bit-deterministic) | "logistic"

    def __post_init__(self) -> None:
        if len(self.features) != len(self.weights):
            raise ValueError("features and weights must align")

    def to_dict(self) -> dict:
        return {
            "features": list(self.features),
            "weights": list(self.weights),
            "intercept": self.intercept,
            "sigmoid": self.sigmoid,
        }

    @staticmethod
    def from_dict(d: dict) -> "LinearModel":
        return LinearModel(
            features=tuple(d["features"]),
            weights=tuple(d["weights"]),
            intercept=float(d["intercept"]),
            sigmoid=d.get("sigmoid", "softsign"),
        )


def _z_column(model: LinearModel) -> Column:
    z = F.lit(float(model.intercept))
    # left-to-right accumulation — identical op order to the numpy and
    # DuckDB evaluations so doubles agree bitwise
    for feat, w in zip(model.features, model.weights):
        z = z + F.lit(float(w)) * F.col(feat)
    return z


def score_column(model: LinearModel) -> Column:
    """JVM-native scoring expression (whole-stage-codegen path).

    For a linear model the score is a closed-form column expression —
    no Python worker at all. This is the fastest possible plan; the
    pandas_udf twin below exists to exercise/benchmark the general
    broadcast-model path that a real (tree/NN) model needs.
    """
    z = _z_column(model)
    if model.sigmoid == "logistic":
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    else:
        p = F.lit(0.5) * (F.lit(1.0) + z / (F.lit(1.0) + F.abs(z)))
    return p


def score_row_udf(model: LinearModel):
    """Typed row-wise UDF (reference F2 shape — but TYPED, fixing the
    implicit-StringType wart at 06_deployment_code.py:124). Exists for
    parity/benchmark comparison ONLY: every row round-trips through
    pickle, ~10-100x slower than score_pandas_udf. Never use in a hot
    path."""
    from pyspark.sql.functions import udf

    d = model.to_dict()

    @udf(DoubleType())
    def _score(*xs: float) -> float:
        m = LinearModel.from_dict(d)
        z = float(m.intercept)
        for w, x in zip(m.weights, xs):
            z = z + float(w) * float(x)
        if m.sigmoid == "logistic":
            import math

            return 1.0 / (1.0 + math.exp(-z))
        return 0.5 * (1.0 + z / (1.0 + abs(z)))

    return _score


def score_arrow_udf(model: LinearModel):
    """Row-wise UDF with ``useArrow=True``: Arrow batches replace the
    pickle transfer but the Python function still runs PER ROW —
    quantifies how much of the row-UDF penalty is serialization
    (recovered here) vs the per-row interpreter loop (not). Benchmark
    rung between score_row_udf and score_pandas_udf."""
    from pyspark.sql.functions import udf

    d = model.to_dict()

    @udf(DoubleType(), useArrow=True)
    def _score(*xs: float) -> float:
        m = LinearModel.from_dict(d)
        z = float(m.intercept)
        for w, x in zip(m.weights, xs):
            z = z + float(w) * float(x)
        if m.sigmoid == "logistic":
            import math

            return 1.0 / (1.0 + math.exp(-z))
        return 0.5 * (1.0 + z / (1.0 + abs(z)))

    return _score


def score_pandas_udf(spark: SparkSession, model: LinearModel):
    """Arrow-vectorized scorer with the model broadcast to executors.

    Usage: ``df.withColumn("p", udf(*model.features))``. Each executor
    unpickles the broadcast once; each call scores a whole Arrow batch
    via vectorized pandas/numpy ops (replaces reference F1/F2 per-row
    ``np.array(...).reshape(1, -1)`` calls).
    """
    bc = spark.sparkContext.broadcast(model.to_dict())

    @pandas_udf(DoubleType())
    def _score(*cols: pd.Series) -> pd.Series:
        m = LinearModel.from_dict(bc.value)
        # accumulate intercept-first, left-to-right — the SAME op order
        # as score_column and the DuckDB oracle, so doubles agree bitwise
        z = float(m.intercept)
        for w, x in zip(m.weights, cols):
            z = z + float(w) * x.astype("float64")
        if not isinstance(z, pd.Series):
            z = pd.Series(z, dtype="float64")
        if m.sigmoid == "logistic":
            import numpy as np

            p = 1.0 / (1.0 + np.exp(-z))
        else:
            p = 0.5 * (1.0 + z / (1.0 + z.abs()))
        return pd.Series(p, dtype="float64")

    return _score
