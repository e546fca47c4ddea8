from .labels import (
    assign_interval_labels,
    daily_labels,
    daily_participants,
    epoch_to_date,
    export_label_files,
    match_names,
    prediction_metrics,
)

__all__ = [
    "assign_interval_labels",
    "daily_labels",
    "daily_participants",
    "epoch_to_date",
    "export_label_files",
    "match_names",
    "prediction_metrics",
]
