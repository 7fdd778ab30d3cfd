#!/usr/bin/env python
"""VOC-style mean-AP evaluation of saved results (reference
tools/voc_eval.py).

  python tools/voc_eval.py results.pkl <ann_list> <voc_root> [--iou-thr 0.5]

`results.pkl` holds per-image per-class detection lists (the format
tools/test.py --out writes); ground truth is parsed from the VOC XML
tree by VOCDataset.
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("result_file")
    p.add_argument("ann_list")
    p.add_argument("voc_root")
    p.add_argument("--iou-thr", type=float, default=0.5)
    args = p.parse_args()

    from mrcnn3d.data.legacy2d import VOCDataset
    from mrcnn3d.eval.mean_ap import eval_map

    norm = dict(mean=[0, 0, 0], std=[1, 1, 1], to_rgb=True)
    ds = VOCDataset(args.ann_list, args.voc_root, norm)
    with open(args.result_file, "rb") as f:
        det_results = pickle.load(f)

    gt_bboxes, gt_labels, gt_ignore = [], [], None
    for i in range(len(ds)):
        ann = ds.get_ann_info(i)
        bboxes, labels = ann["bboxes"], ann["labels"]
        if ann.get("bboxes_ignore") is not None and len(
            ann["bboxes_ignore"]
        ):
            # VOC 'difficult' boxes join the gt pool flagged ignored
            # (reference tools/voc_eval.py:26-35)
            if gt_ignore is None:
                gt_ignore = [
                    np.zeros(len(b), np.int32) for b in gt_bboxes
                ]
            ign = np.concatenate([
                np.zeros(len(bboxes), np.int32),
                np.ones(len(ann["bboxes_ignore"]), np.int32),
            ])
            bboxes = np.vstack([bboxes, ann["bboxes_ignore"]])
            labels = np.concatenate(
                [labels, ann.get("labels_ignore", np.ones(
                    len(ann["bboxes_ignore"]), np.int64))]
            )
            gt_ignore.append(ign)
        elif gt_ignore is not None:
            gt_ignore.append(np.zeros(len(bboxes), np.int32))
        gt_bboxes.append(bboxes)
        gt_labels.append(labels)

    # legacy result files may carry 7-wide (xyxyzz+score) dets with
    # degenerate z from the depth-1 pipeline — slice to VOC's 2-D
    # (x1,y1,x2,y2,score) so eval_map's dim inference follows the gt
    def to_2d(d):
        d = np.asarray(d, np.float32)
        if d.ndim == 2 and d.shape[-1] == 7:
            return d[:, [0, 1, 2, 3, 6]]
        return d.reshape(-1, 5)

    det_results = [
        [to_2d(d) for d in per_img] for per_img in det_results
    ]

    dataset_name = "voc07" if "VOC2007" in args.ann_list else "voc"
    mean_ap, results = eval_map(
        det_results,
        gt_bboxes,
        gt_labels,
        gt_ignore=gt_ignore,
        iou_thr=args.iou_thr,
        dataset=dataset_name,
        print_summary=True,
    )
    # legacy per-class lines (original tool output contract)
    for name, r in zip(VOCDataset.CLASSES, results):
        ap = float(np.array(r["ap"], ndmin=1)[0])
        print(f"{name:16s} AP@{args.iou_thr}: {ap:.4f}")
    print(f"{'mAP':16s}: {float(np.mean([mean_ap])):.4f}")


if __name__ == "__main__":
    main()
