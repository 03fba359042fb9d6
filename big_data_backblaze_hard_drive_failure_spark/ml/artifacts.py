"""Model / threshold artifact sinks and sources (reference S5/S6).

The reference persists the selected threshold + metadata as plain JSON
(/root/reference/scripts/05_01_model_training_xgboost_oom_fix.py:243-256,
read back at 06_deployment_code.py:79-86) and the booster as a JSON
model file (05_01:261). These are driver-side policy artifacts, not
data-plane tables, so plain files are the right tool at any scale —
the artifact is O(model), not O(data).
"""

from __future__ import annotations

import json
import os
from typing import Any

from .scorer import LinearModel


def save_threshold_artifact(
    path: str,
    threshold: float,
    recall_target: float,
    n_pos: int,
    extra: dict[str, Any] | None = None,
) -> None:
    """JSON threshold artifact (reference 05_01:243-256 shape)."""
    payload = {
        "threshold": float(threshold),
        "target_recall": float(recall_target),
        "n_validation_positives": int(n_pos),
        **(extra or {}),
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)


def load_threshold_artifact(path: str) -> dict[str, Any]:
    """Read back the deployed threshold (reference 06:79-86)."""
    with open(path) as f:
        return json.load(f)


def save_model_artifact(path: str, model: LinearModel) -> None:
    """Engine model artifact: JSON, like the reference's booster file
    (models/xgboost_backblaze.json)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(model.to_dict(), f, indent=2)


def load_model_artifact(path: str) -> LinearModel:
    with open(path) as f:
        return LinearModel.from_dict(json.load(f))


def save_ann_index_artifact(
    path: str,
    centroids: "list[list[float]]",
    metric: str = "l2",
    extra: dict[str, Any] | None = None,
) -> None:
    """ANN index artifact: IVF centroids as JSON — O(k * dim), a
    driver-side policy artifact like the model file. Build the index
    once, ship the artifact, and any later job (batch scoring, online
    lookup) assigns cells with a pure JVM expression instead of
    re-running k-means over the corpus."""
    payload = {
        "kind": "ivf_centroids",
        "metric": metric,
        "k_cells": len(centroids),
        "dim": len(centroids[0]) if centroids else 0,
        "centroids": [[float(v) for v in c] for c in centroids],
        **(extra or {}),
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(payload, f)


def load_ann_index_artifact(path: str) -> dict[str, Any]:
    with open(path) as f:
        payload = json.load(f)
    if payload.get("kind") != "ivf_centroids":
        raise ValueError(f"not an ANN index artifact: {path}")
    return payload
