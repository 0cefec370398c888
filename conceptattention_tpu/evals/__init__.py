from conceptattention_tpu.evals.metrics import (
    batch_pix_accuracy,
    batch_intersection_union,
    average_precision,
    get_ap_scores,
)

__all__ = [
    "batch_pix_accuracy",
    "batch_intersection_union",
    "average_precision",
    "get_ap_scores",
]
