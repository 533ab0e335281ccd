from .metrics import (
    query_pose_error,
    add_metric,
    projection_2d_error,
    model_diameter_from_bbox,
    aggregate_metrics,
    batched_pose_errors,
    SYMMETRIC_OBJ_IDS,
)
