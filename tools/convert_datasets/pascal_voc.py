#!/usr/bin/env python
"""Convert a Pascal-VOC tree into the framework's list files (reference
tools/convert_datasets/pascal_voc.py role).

The reference converter rewrites VOC XML annotations into mmdet pkl
files; here the XMLDataset/VOCDataset classes parse XML directly, so
conversion reduces to emitting the split list files the dataset ctor
consumes (one image id per line).

  python tools/convert_datasets/pascal_voc.py VOCdevkit/VOC2007 out/
"""
from __future__ import annotations

import argparse
import os
import os.path as osp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("voc_root", help="e.g. VOCdevkit/VOC2007")
    p.add_argument("out_dir")
    args = p.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    split_dir = osp.join(args.voc_root, "ImageSets", "Main")
    for split in ("train", "val", "trainval", "test"):
        src = osp.join(split_dir, f"{split}.txt")
        if not osp.exists(src):
            continue
        with open(src) as f:
            ids = [ln.split()[0] for ln in f if ln.strip()]
        dst = osp.join(args.out_dir, f"{split}.txt")
        with open(dst, "w") as f:
            f.write("\n".join(ids) + "\n")
        print(f"{split}: {len(ids)} ids -> {dst}")


if __name__ == "__main__":
    main()
