"""Collected-sample boosting with validation early stopping (Appendix twin).

The reference's appendix trains XGBoost on a driver-side sample with
``early_stopping_rounds`` against a validation set and prints a
classification report at the recall-targeted threshold
(/root/reference/scripts/Appendix_model_training_xgboost.py:119-162).
xgboost isn't available here, so the twin implements the same public
algorithm directly: gradient boosting of depth-1 regression trees
(histogram candidate splits, like ``tree_method="hist"``) on logistic
loss with Newton leaf values, stopping when validation average
precision stops improving for ``patience`` rounds.

This is deliberately the DRIVER-SIDE track (reference-faithful), so
every entry point goes through the ``guarded_to_pandas`` row cap: at
100 TB you downsample first (M2) or use the distributed MLlib /
forest path (ml/training.py, ml/forest.py); this path exists because
"train on the collected sample with early stopping" is published
capability of the reference, and its boundary must be explicit.

Everything is deterministic: no subsampling, greedy split selection
with fixed tie-breaking (first feature, lowest threshold wins).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

_EPS = 1e-12


@dataclass(frozen=True)
class Stump:
    feature: int
    threshold: float
    left_value: float
    right_value: float

    def predict(self, X: np.ndarray) -> np.ndarray:
        go_left = X[:, self.feature] <= self.threshold
        return np.where(go_left, self.left_value, self.right_value)


@dataclass(frozen=True)
class BoostedStumps:
    base: float  # initial log-odds
    stumps: tuple[Stump, ...]
    learning_rate: float
    best_round: int  # rounds actually used after early stop
    history: tuple[float, ...]  # per-round validation average precision

    def margin(self, X: np.ndarray, n_rounds: int | None = None) -> np.ndarray:
        n = self.best_round if n_rounds is None else n_rounds
        out = np.full(len(X), self.base)
        for s in self.stumps[:n]:
            out += self.learning_rate * s.predict(X)
        return out

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        return 1.0 / (1.0 + np.exp(-self.margin(X)))


def average_precision(y_true: np.ndarray, scores: np.ndarray) -> float:
    """sklearn-definition average precision: sum over positives of
    (recall step * precision at that rank), scores sorted descending
    (ties broken by stable sort => deterministic)."""
    order = np.argsort(-scores, kind="stable")
    y = y_true[order]
    n_pos = y.sum()
    if n_pos == 0:
        return 0.0
    tp = np.cumsum(y)
    ranks = np.arange(1, len(y) + 1)
    precision = tp / ranks
    return float((precision * y).sum() / n_pos)


def _histogram_thresholds(x: np.ndarray, max_bins: int = 32) -> np.ndarray:
    """Candidate split points at histogram quantile edges — the
    ``hist`` strategy, bounded work per feature per round."""
    qs = np.quantile(x, np.linspace(0.0, 1.0, max_bins + 1)[1:-1])
    return np.unique(qs)


def _fit_stump(
    X: np.ndarray, grad: np.ndarray, hess: np.ndarray, max_bins: int
) -> Stump:
    """Best single split by exact gain over histogram candidates;
    leaf values are Newton steps sum(grad)/sum(hess)."""
    best = None
    g_tot, h_tot = grad.sum(), hess.sum()
    for f in range(X.shape[1]):
        for thr in _histogram_thresholds(X[:, f], max_bins):
            mask = X[:, f] <= thr
            g_l, h_l = grad[mask].sum(), hess[mask].sum()
            g_r, h_r = g_tot - g_l, h_tot - h_l
            if h_l < _EPS or h_r < _EPS:
                continue
            gain = g_l * g_l / (h_l + _EPS) + g_r * g_r / (h_r + _EPS)
            if best is None or gain > best[0] + _EPS:
                best = (gain, f, thr, g_l / (h_l + _EPS), g_r / (h_r + _EPS))
    if best is None:  # degenerate: no valid split, emit a zero stump
        return Stump(0, float("inf"), 0.0, 0.0)
    _, f, thr, lv, rv = best
    return Stump(int(f), float(thr), float(lv), float(rv))


def fit_boosted_stumps(
    X_train: np.ndarray,
    y_train: np.ndarray,
    X_val: np.ndarray,
    y_val: np.ndarray,
    max_rounds: int = 50,
    patience: int = 5,
    learning_rate: float = 0.3,
    max_bins: int = 32,
) -> BoostedStumps:
    """Boost until validation average precision stops improving for
    ``patience`` rounds (the appendix's early_stopping_rounds
    semantics); ``best_round`` rewinds to the best validation score."""
    if len(X_train) == 0 or len(X_val) == 0:
        raise ValueError(
            "fit_boosted_stumps: empty training or validation split — "
            "boosting cannot start (no-data day or over-tight split "
            "upstream)"
        )
    p0 = min(max(y_train.mean(), _EPS), 1 - _EPS)
    base = float(np.log(p0 / (1 - p0)))
    margin_tr = np.full(len(X_train), base)
    margin_va = np.full(len(X_val), base)
    stumps: list[Stump] = []
    history: list[float] = []
    best_score, best_round = -np.inf, 0
    for rnd in range(1, max_rounds + 1):
        p = 1.0 / (1.0 + np.exp(-margin_tr))
        grad = y_train - p  # negative gradient of logloss
        hess = p * (1.0 - p)
        stump = _fit_stump(X_train, grad, hess, max_bins)
        stumps.append(stump)
        margin_tr += learning_rate * stump.predict(X_train)
        margin_va += learning_rate * stump.predict(X_val)
        score = average_precision(y_val, margin_va)
        history.append(score)
        if score > best_score + _EPS:
            best_score, best_round = score, rnd
        elif rnd - best_round >= patience:
            break
    return BoostedStumps(
        base=base,
        stumps=tuple(stumps),
        learning_rate=learning_rate,
        best_round=best_round,
        history=tuple(history),
    )


def classification_report_rows(
    y_true: np.ndarray, y_pred: np.ndarray
) -> list[tuple[str, float, float, float, int]]:
    """(label, precision, recall, f1, support) per class — the
    appendix's sklearn classification_report as data rows."""
    rows = []
    for cls in (0, 1):
        pred_c = y_pred == cls
        true_c = y_true == cls
        tp = int((pred_c & true_c).sum())
        precision = tp / pred_c.sum() if pred_c.sum() else 0.0
        recall = tp / true_c.sum() if true_c.sum() else 0.0
        f1 = (
            2 * precision * recall / (precision + recall)
            if precision + recall
            else 0.0
        )
        rows.append(
            (str(cls), float(precision), float(recall), float(f1), int(true_c.sum()))
        )
    return rows


def threshold_for_recall(
    y_true: np.ndarray, scores: np.ndarray, target_recall: float
) -> float:
    """Smallest threshold whose recall >= target (the appendix's
    precision_recall_curve walk, Appendix:146-155)."""
    pos_scores = np.sort(scores[y_true == 1])
    if len(pos_scores) == 0:
        return float("inf")
    k = int(np.floor((1.0 - target_recall) * len(pos_scores)))
    return float(pos_scores[min(k, len(pos_scores) - 1)])
