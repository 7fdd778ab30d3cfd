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
    from mrcnn3d.eval.mean_ap import eval_map_3d

    norm = dict(mean=[0, 0, 0], std=[1, 1, 1], to_rgb=True)
    ds = VOCDataset(args.ann_list, args.voc_root, norm)
    with open(args.result_file, "rb") as f:
        det_results = pickle.load(f)

    num_classes = len(VOCDataset.CLASSES)
    aps = []
    for c in range(num_classes):
        gts, dets = [], []
        for i in range(len(ds)):
            ann = ds.get_ann_info(i)
            sel = ann["labels"] == c + 1
            b = ann["bboxes"][sel]
            z = np.zeros((b.shape[0], 2), np.float32)
            gts.append(np.concatenate([b, z], axis=1))
            dets.append(np.asarray(det_results[i][c], np.float32))
        ap, _, _ = eval_map_3d(dets, gts, iou_thr=args.iou_thr)
        aps.append(ap)
        print(f"{VOCDataset.CLASSES[c]:16s} AP@{args.iou_thr}: {ap:.4f}")
    print(f"{'mAP':16s}: {float(np.mean(aps)):.4f}")


if __name__ == "__main__":
    main()
