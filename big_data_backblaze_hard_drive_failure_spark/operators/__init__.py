from .labeling import leakage_filter, lead_label
from .features import add_drive_age, add_rolling_features, rolling_feature_columns
from .splits import (
    chronological_split,
    deterministic_downsample_negatives,
    downsample_negatives,
)
from .staging import lineage_cut, stage_boundary
from .topk import top_k_per_group
from .metrics import (
    alert_decision,
    alerts_per_day,
    avg_alerts_per_day,
    confusion_matrix,
    operational_summary,
)

__all__ = [
    "lead_label",
    "leakage_filter",
    "add_rolling_features",
    "add_drive_age",
    "rolling_feature_columns",
    "chronological_split",
    "downsample_negatives",
    "deterministic_downsample_negatives",
    "stage_boundary",
    "lineage_cut",
    "top_k_per_group",
    "alert_decision",
    "confusion_matrix",
    "operational_summary",
    "alerts_per_day",
    "avg_alerts_per_day",
]
