"""VOC-style mean AP for 6-DoF detections (reference mean_ap.py parity).

The reference carries the classic VOC evaluation alongside the COCO fork
(mmdet/core/evaluation/mean_ap.py); this is the 3-D equivalent: greedy
per-image matching at a single IoU threshold, 11-point or continuous AP.
"""
from __future__ import annotations

import numpy as np

from .coco_eval3d import iou3d_xywhzd


def _to_xywhzd(b):
    b = np.asarray(b, np.float32).reshape(-1, 6)
    return np.stack(
        [
            b[:, 0],
            b[:, 1],
            b[:, 2] - b[:, 0] + 1,
            b[:, 3] - b[:, 1] + 1,
            b[:, 4],
            b[:, 5] - b[:, 4] + 1,
        ],
        axis=-1,
    )


def average_precision(recalls, precisions, mode="area"):
    """AP from a recall/precision curve ('area' = continuous, '11points')."""
    recalls = np.asarray(recalls)
    precisions = np.asarray(precisions)
    if mode == "area":
        mrec = np.concatenate([[0.0], recalls, [1.0]])
        mpre = np.concatenate([[0.0], precisions, [0.0]])
        for i in range(len(mpre) - 2, -1, -1):
            mpre[i] = max(mpre[i], mpre[i + 1])
        idx = np.where(mrec[1:] != mrec[:-1])[0]
        return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))
    ap = 0.0
    for thr in np.arange(0, 1.1, 0.1):
        p = precisions[recalls >= thr]
        ap += (p.max() if p.size else 0.0) / 11.0
    return float(ap)


def eval_map_3d(det_results, gt_boxes_list, iou_thr=0.5, mode="area"):
    """VOC-style mAP over one class.

    det_results: per-image (n, 7) xyxyzz+score arrays.
    gt_boxes_list: per-image (g, 6) xyxyzz arrays.
    Returns (ap, recall_curve, precision_curve).
    """
    all_scores, all_tp = [], []
    total_gts = 0
    for dets, gts in zip(det_results, gt_boxes_list):
        dets = np.asarray(dets, np.float32).reshape(-1, 7)
        gts = np.asarray(gts, np.float32).reshape(-1, 6)
        total_gts += len(gts)
        if len(dets) == 0:
            continue
        order = np.argsort(-dets[:, 6], kind="stable")
        dets = dets[order]
        matched = np.zeros(len(gts), bool)
        for det in dets:
            all_scores.append(det[6])
            if len(gts) == 0:
                all_tp.append(0)
                continue
            ious = iou3d_xywhzd(
                _to_xywhzd(det[None, :6]), _to_xywhzd(gts)
            )[0]
            j = int(np.argmax(ious))
            if ious[j] >= iou_thr and not matched[j]:
                matched[j] = True
                all_tp.append(1)
            else:
                all_tp.append(0)
    if not all_scores or total_gts == 0:
        return 0.0, np.zeros(0), np.zeros(0)
    order = np.argsort(-np.asarray(all_scores), kind="stable")
    tp = np.asarray(all_tp)[order]
    tp_cum = np.cumsum(tp)
    fp_cum = np.cumsum(1 - tp)
    recalls = tp_cum / total_gts
    precisions = tp_cum / np.maximum(tp_cum + fp_cum, 1)
    return average_precision(recalls, precisions, mode), recalls, precisions
