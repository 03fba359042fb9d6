from .labeling import leakage_filter, lead_label
from .features import add_drive_age, add_rolling_features
from .splits import chronological_split, downsample_negatives
from .topk import top_k_per_group
from .metrics import alerts_per_day, avg_alerts_per_day, confusion_matrix

__all__ = [
    "lead_label",
    "leakage_filter",
    "add_rolling_features",
    "add_drive_age",
    "chronological_split",
    "downsample_negatives",
    "top_k_per_group",
    "confusion_matrix",
    "alerts_per_day",
    "avg_alerts_per_day",
]
