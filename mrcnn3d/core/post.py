"""Detection post-processing: multi-class NMS (static shapes).

Port of reference mmdet/core/post_processing/bbox_nms.py:57-107
(multiclass_nms_3d): per foreground class — score threshold, hard NMS,
label assembly — then global top `max_num` by score.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.nms3d import nms_3d_mask


def multiclass_nms_3d(
    multi_bboxes,
    multi_scores,
    valid,
    score_thr,
    iou_thr,
    max_num,
):
    """Class-wise NMS over padded detection arrays.

    Args:
      multi_bboxes: (N, 6) or (N, C*6).
      multi_scores: (N, C) softmax scores (class 0 = background).
      valid: (N,) bool padding mask.
      score_thr, iou_thr: python floats; max_num: python int.

    Returns:
      det_bboxes: (max_num, 7) [x1,y1,x2,y2,z1,z2,score] (padded rows 0),
      det_labels: (max_num,) int32 0-based class labels,
      det_valid: (max_num,) bool.
    """
    num_classes = multi_scores.shape[1]
    n = multi_scores.shape[0]
    per_class_boxes = []
    per_class_scores = []
    per_class_keep = []
    per_class_label = []
    for i in range(1, num_classes):
        scores_i = multi_scores[:, i]
        if multi_bboxes.shape[1] == 6:
            boxes_i = multi_bboxes
        else:
            boxes_i = multi_bboxes[:, i * 6 : (i + 1) * 6]
        sel = valid & (scores_i > score_thr)
        keep = nms_3d_mask(boxes_i, scores_i, sel, iou_thr)
        per_class_boxes.append(boxes_i)
        per_class_scores.append(scores_i)
        per_class_keep.append(keep)
        per_class_label.append(
            jnp.full((n,), i - 1, jnp.int32)
        )

    boxes = jnp.concatenate(per_class_boxes, axis=0)
    scores = jnp.concatenate(per_class_scores, axis=0)
    keep = jnp.concatenate(per_class_keep, axis=0)
    labels = jnp.concatenate(per_class_label, axis=0)

    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    masked = jnp.where(keep, scores, neg_inf)
    k = min(max_num, masked.shape[0])
    top_scores, top_idx = jax.lax.top_k(masked, k)
    det_valid = top_scores > neg_inf
    det_boxes = jnp.where(det_valid[:, None], boxes[top_idx], 0.0)
    det_scores = jnp.where(det_valid, top_scores, 0.0)
    det_labels = jnp.where(det_valid, labels[top_idx], 0)
    # source row of each kept det in the input arrays (for carrying
    # auxiliary per-proposal data, e.g. parcellation scores — reference
    # multiclass_nms_3d_parcel keeps them aligned through NMS)
    src_idx = jnp.where(det_valid, top_idx % n, 0)
    if k < max_num:
        pad = max_num - k
        det_boxes = jnp.pad(det_boxes, ((0, pad), (0, 0)))
        det_scores = jnp.pad(det_scores, ((0, pad),))
        det_labels = jnp.pad(det_labels, ((0, pad),))
        det_valid = jnp.pad(det_valid, ((0, pad),))
        src_idx = jnp.pad(src_idx, ((0, pad),))
    dets = jnp.concatenate([det_boxes, det_scores[:, None]], axis=-1)
    return dets, det_labels, det_valid, src_idx
