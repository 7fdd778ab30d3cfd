#!/usr/bin/env python
"""Standalone 3-D COCO evaluation of saved results (reference
tools/coco_eval.py parity).

  python tools/coco_eval.py results.pkl gt_annotations.json
  python tools/coco_eval.py results.json gt_annotations.json
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("results", nargs="+",
                   help="one or more results pickles (per-image per-class "
                        "arrays) or COCO dt jsons; multiple files are "
                        "merged before the global NMS (reference "
                        "results2json3DMulti)")
    p.add_argument("ann_file", help="ground-truth COCO-3D json")
    p.add_argument("--no-merge", action="store_true",
                   help="skip the patch-merge NMS")
    args = p.parse_args()

    from mrcnn3d.eval.coco_eval3d import CocoEval3D
    from mrcnn3d.eval.results import results2json3d

    gt = json.load(open(args.ann_file))
    entries = []
    for path in args.results:
        if path.endswith(".json"):
            entries.extend(json.load(open(path)))
        else:
            with open(path, "rb") as f:
                results = pickle.load(f)
            infos = gt["images"][: len(results)]
            entries.extend(results2json3d(results, infos, merge=False))
    if not args.no_merge:
        from mrcnn3d.eval.results import merge_patch_detections

        entries = merge_patch_detections(entries)

    evaluator = CocoEval3D(gt, entries)
    for k, v in evaluator.named_stats().items():
        print(f"{k}: {v:.4f}")


if __name__ == "__main__":
    main()
