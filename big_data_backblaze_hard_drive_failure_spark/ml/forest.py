"""Tree-ensemble model-as-data: portable forest scoring + explanations.

The reference's deliverable is a trained booster scored inside Spark
and SHAP-explained on alerted rows
(/root/reference/scripts/05_01_model_training_xgboost_oom_fix.py:110-155,
/root/reference/scripts/05_SHAP_alert_explanation.py:132-167). The
Spark-first re-expression exploits a property the reference's pickled
booster lacks: an MLlib GBT artifact IS a table. ``model.save(path)``
writes every tree node to ``path/data`` (parquet: treeID + nodeData
struct) and per-tree weights to ``path/treesMetadata`` — so the engine
reads the forest back as data, holds it as plain numpy arrays
(O(model), driver-held like the IVF centroids), and ships it to
executors inside a pandas_udf closure: the broadcast-model scoring
pattern of reference F1, but Arrow-batched and fully vectorized — each
Python worker advances ALL rows of a batch one tree level per step
instead of walking row-at-a-time.

Explanations are path contributions (Saabas / treeinterpreter — the
classic decomposition TreeSHAP generalizes): every split on the
root->leaf path attributes ``prediction(child) - prediction(parent)``
to the split feature, so ``base + sum(contribs) == margin`` holds
EXACTLY per row — an identity the tests pin, where SHAP's sampling
variants only approximate.

Scale: the forest is O(trees * nodes), independent of data size; the
scoring pass is map-only (no shuffle); contributions are computed only
on the alerted subset, mirroring 05_SHAP's "explain alerts, not the
corpus" discipline.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PyForest:
    """A GBT ensemble as flat per-node arrays, indexed by node id.

    ``feature``/``left``/``right`` are -1 at leaves; continuous splits
    route ``x[feature] <= threshold`` to ``left`` (MLlib convention).
    ``prediction`` is populated at EVERY node (the impurity-stats mean),
    which is what makes path contributions well-defined.
    """

    features: tuple[str, ...]
    weights: tuple[float, ...]  # per-tree (1.0, stepSize, stepSize, ...)
    feature_idx: tuple[np.ndarray, ...]
    threshold: tuple[np.ndarray, ...]
    left: tuple[np.ndarray, ...]
    right: tuple[np.ndarray, ...]
    prediction: tuple[np.ndarray, ...]

    @property
    def n_trees(self) -> int:
        return len(self.weights)


def extract_forest(
    spark: SparkSession, model_path: str, features: tuple[str, ...]
) -> PyForest:
    """Read a saved GBTClassificationModel back as data.

    Bounded collect: O(trees * nodes) rows — model-sized, not
    data-sized (the same boundary contract as guarded_to_pandas)."""
    nodes = (
        spark.read.parquet(f"{model_path}/data")
        .select(
            "treeID",
            F.col("nodeData.id").alias("id"),
            F.col("nodeData.prediction").alias("prediction"),
            F.col("nodeData.leftChild").alias("left"),
            F.col("nodeData.rightChild").alias("right"),
            F.col("nodeData.split.featureIndex").alias("feature"),
            F.try_element_at(
                "nodeData.split.leftCategoriesOrThreshold", F.lit(1)
            ).alias("threshold"),
            F.col("nodeData.split.numCategories").alias("num_categories"),
        )
        .collect()
    )
    weights_rows = (
        spark.read.parquet(f"{model_path}/treesMetadata")
        .select(F.col("_1").alias("treeID"), F.col("_3").alias("weight"))
        .collect()
    )
    weights = {r["treeID"]: float(r["weight"]) for r in weights_rows}

    by_tree: dict[int, list] = {}
    for r in nodes:
        if (r["left"] >= 0) and (r["num_categories"] or -1) >= 0:
            raise NotImplementedError(
                "categorical splits not supported by the portable scorer"
            )
        by_tree.setdefault(r["treeID"], []).append(r)

    fi, th, lf, rt, pr = [], [], [], [], []
    for tid in sorted(by_tree):
        rows = sorted(by_tree[tid], key=lambda r: r["id"])
        n = len(rows)
        assert [r["id"] for r in rows] == list(range(n)), "non-dense node ids"
        fi.append(np.array([r["feature"] for r in rows], dtype=np.int64))
        th.append(
            np.array(
                [
                    r["threshold"] if r["threshold"] is not None else np.nan
                    for r in rows
                ],
                dtype=np.float64,
            )
        )
        lf.append(np.array([r["left"] for r in rows], dtype=np.int64))
        rt.append(np.array([r["right"] for r in rows], dtype=np.int64))
        pr.append(np.array([r["prediction"] for r in rows], dtype=np.float64))
    return PyForest(
        features=tuple(features),
        weights=tuple(weights[tid] for tid in sorted(by_tree)),
        feature_idx=tuple(fi),
        threshold=tuple(th),
        left=tuple(lf),
        right=tuple(rt),
        prediction=tuple(pr),
    )


def _walk_tree(
    forest: PyForest, t: int, X: np.ndarray, contrib: np.ndarray | None
) -> np.ndarray:
    """Level-synchronous vectorized descent: all rows advance one tree
    level per iteration. Returns each row's leaf prediction; if
    ``contrib`` is given, adds the weighted Saabas deltas in place."""
    feat, thr = forest.feature_idx[t], forest.threshold[t]
    left, right, pred = forest.left[t], forest.right[t], forest.prediction[t]
    w = forest.weights[t]
    n = len(X)
    idx = np.zeros(n, dtype=np.int64)
    rows = np.arange(n)
    while True:
        at_leaf = left[idx] < 0
        if at_leaf.all():
            break
        f = np.where(at_leaf, 0, feat[idx])
        go_left = X[rows, f] <= thr[idx]
        nxt = np.where(go_left, left[idx], right[idx])
        new_idx = np.where(at_leaf, idx, nxt)
        if contrib is not None:
            moved = ~at_leaf
            np.add.at(
                contrib,
                (rows[moved], feat[idx][moved]),
                w * (pred[new_idx][moved] - pred[idx][moved]),
            )
        idx = new_idx
    return pred[idx]


def forest_margin(forest: PyForest, X: np.ndarray) -> np.ndarray:
    """sum_i w_i * tree_i(x) — the GBT raw score."""
    out = np.zeros(len(X), dtype=np.float64)
    for t in range(forest.n_trees):
        out += forest.weights[t] * _walk_tree(forest, t, X, None)
    return out


def forest_probability(forest: PyForest, X: np.ndarray) -> np.ndarray:
    """MLlib GBTClassificationModel probability: logistic on TWICE the
    margin (trees are fit to label in {-1, +1}, so the margin is half
    the log-odds) — pinned against model.transform by tests."""
    return 1.0 / (1.0 + np.exp(-2.0 * forest_margin(forest, X)))


def forest_contributions(
    forest: PyForest, X: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(base, contribs[n, n_features], margin) with the exact identity
    ``margin == base + contribs.sum(axis=1)`` per row."""
    base = float(
        sum(forest.weights[t] * forest.prediction[t][0] for t in range(forest.n_trees))
    )
    contrib = np.zeros((len(X), len(forest.features)), dtype=np.float64)
    margin = np.zeros(len(X), dtype=np.float64)
    for t in range(forest.n_trees):
        margin += forest.weights[t] * _walk_tree(forest, t, X, contrib)
    return np.full(len(X), base), contrib, margin


def forest_score_pandas_udf(spark: SparkSession, forest: PyForest):
    """Arrow-vectorized forest scorer; the forest ships to executors
    ONCE as a Spark broadcast (reference F1's broadcast-model pattern,
    minus its per-row reshape(1, -1) calls)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    bc = spark.sparkContext.broadcast(forest)

    @pandas_udf(DoubleType())
    def _score(*cols):
        import pandas as pd

        f = bc.value
        X = np.column_stack([c.astype("float64").to_numpy() for c in cols])
        return pd.Series(forest_probability(f, X), dtype="float64")

    return _score


def forest_contrib_pandas_udf(spark: SparkSession, forest: PyForest):
    """Struct-returning pandas_udf: per-row path contributions for each
    feature plus the base/margin decomposition (05_SHAP twin)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(
        [StructField(f"contrib_{f}", DoubleType()) for f in forest.features]
        + [StructField("base", DoubleType()), StructField("margin", DoubleType())]
    )
    bc = spark.sparkContext.broadcast(forest)

    @pandas_udf(schema)
    def _contrib(*cols):
        import pandas as pd

        f = bc.value
        X = np.column_stack([c.astype("float64").to_numpy() for c in cols])
        base, contrib, margin = forest_contributions(f, X)
        data = {
            f"contrib_{name}": contrib[:, i] for i, name in enumerate(f.features)
        }
        data["base"] = base
        data["margin"] = margin
        return pd.DataFrame(data)

    return _contrib


def score_forest(
    forest: PyForest, spark: SparkSession, df: DataFrame, out: str
) -> DataFrame:
    """df + probability column via the broadcast pandas_udf scorer."""
    udf = forest_score_pandas_udf(spark, forest)
    return df.withColumn(out, udf(*forest.features))
