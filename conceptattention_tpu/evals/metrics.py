"""Zero-shot segmentation metrics: pixel accuracy, histogram IoU, AP.

Behavior parity with the reference's metric definitions
(`concept_attention/utils.py:48-108` in manuragkhullar/ConceptAttention):
  - pixel accuracy counts predictions over labeled (target >= 0) pixels after
    a +1 shift;
  - IoU is histogram-based over class bins 1..nclass;
  - AP is sklearn-style average precision of the (flattened) soft prediction
    against the one-hot target, NaNs mapped to 0.

Pure numpy — these run on host over small mask arrays; device time is spent
in the model, not here.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def _pix_accuracy_np(predict: np.ndarray, target: np.ndarray) -> Tuple[int, int]:
    predict = np.asarray(predict).astype(np.int64) + 1
    target = np.asarray(target).astype(np.int64) + 1
    labeled = int(np.sum(target > 0))
    correct = int(np.sum((predict == target) * (target > 0)))
    assert correct <= labeled, "Correct area must be <= labeled area"
    return correct, labeled


def batch_pix_accuracy(predict: np.ndarray, target: np.ndarray) -> Tuple[int, int]:
    """(correct, labeled) pixel counts; inputs are integer class maps.

    Delegates to the native C++ kernel (native/eval_ops.cpp) when the
    library is built; numpy otherwise (identical counts either way —
    tests/test_native.py)."""
    from conceptattention_tpu import native

    if native.get_lib() is not None:
        return native.pix_acc(predict, target)
    return _pix_accuracy_np(predict, target)


def _intersection_union_np(
    predict: np.ndarray, target: np.ndarray, nclass: int
) -> Tuple[np.ndarray, np.ndarray]:
    predict = np.asarray(predict).astype(np.int64) + 1
    target = np.asarray(target).astype(np.int64) + 1
    predict = predict * (target > 0)
    intersection = predict * (predict == target)
    area_inter, _ = np.histogram(intersection, bins=nclass, range=(1, nclass))
    area_pred, _ = np.histogram(predict, bins=nclass, range=(1, nclass))
    area_lab, _ = np.histogram(target, bins=nclass, range=(1, nclass))
    area_union = area_pred + area_lab - area_inter
    assert (area_inter <= area_union).all(), "Intersection must be <= union"
    return area_inter, area_union


def batch_intersection_union(
    predict: np.ndarray, target: np.ndarray, nclass: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-class (intersection, union) histograms over bins 1..nclass.
    Native C++ fast path when available (see batch_pix_accuracy)."""
    from conceptattention_tpu import native

    if native.get_lib() is not None:
        return native.hist_iou(predict, target, nclass)
    return _intersection_union_np(predict, target, nclass)


def average_precision(target: np.ndarray, predict: np.ndarray) -> float:
    """Binary average precision (area under the precision-recall curve,
    computed with the step-wise interpolation sklearn uses)."""
    target = np.asarray(target).reshape(-1).astype(np.float64)
    predict = np.nan_to_num(np.asarray(predict).reshape(-1).astype(np.float64))
    n_pos = target.sum()
    if n_pos == 0:
        return 0.0
    order = np.argsort(-predict, kind="stable")
    target = target[order]
    scores = predict[order]
    tp = np.cumsum(target)
    fp = np.cumsum(1.0 - target)
    precision = tp / np.maximum(tp + fp, 1e-12)
    recall = tp / n_pos
    # Only count threshold boundaries (distinct score values).
    distinct = np.where(np.diff(scores))[0]
    idx = np.concatenate([distinct, [len(scores) - 1]])
    precision = precision[idx]
    recall = recall[idx]
    recall_prev = np.concatenate([[0.0], recall[:-1]])
    return float(np.sum((recall - recall_prev) * precision))


def get_ap_scores(
    predict: np.ndarray, target: np.ndarray, ignore_index: int = -1
) -> List[float]:
    """Per-sample AP: predict [B, K, H, W] soft maps, target [B, H, W] class
    indices. Builds the K-channel one-hot and flattens (reference
    utils.py:48-66)."""
    out = []
    for pred, tgt in zip(np.asarray(predict), np.asarray(target)):
        k = pred.shape[0]
        tgt_clamped = np.clip(tgt, 0, None).astype(np.int64)
        one_hot = np.zeros_like(pred)
        np.put_along_axis(one_hot, tgt_clamped[None], 1.0, axis=0)
        valid = np.broadcast_to(tgt[None], pred.shape).reshape(-1) != ignore_index
        p = np.nan_to_num(pred.reshape(-1)[valid])
        t = one_hot.reshape(-1)[valid]
        out.append(float(np.nan_to_num(average_precision(t, p))))
    return out
