#!/usr/bin/env python
"""Host data-loader benchmark: thread vs process workers, samples/sec.

Builds a synthetic COCO-3D dataset at the reference crop geometry and
measures end-to-end Prefetcher throughput (np.load + crop + normalize +
pad_gt + collate) for both worker modes, against which the device
step-time (bench.py train_step_s) can be compared to decide whether the
host pipeline is the training-throughput limiter.

  python tools/bench_loader.py [--volumes 24] [--workers 1 2 4 8]
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--volumes", type=int, default=24)
    p.add_argument("--workers", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--hw", type=int, default=512)
    p.add_argument("--depth", type=int, default=64)
    args = p.parse_args()

    from mrcnn3d.data.coco3d import Coco3D2ScalesDataset
    from mrcnn3d.data.loader import Prefetcher
    from mrcnn3d.data.synthetic import make_synthetic_coco3d

    root = tempfile.mkdtemp(prefix="bench_loader_")
    ann_file, img_dir = make_synthetic_coco3d(
        root, num_volumes=args.volumes, hw=args.hw, depth=args.depth,
        seed=0,
    )
    norm = dict(
        mean=[123.675, 116.28, 103.53],
        std=[58.395, 57.12, 57.375],
        to_rgb=True,
    )
    ds = Coco3D2ScalesDataset(
        ann_file, img_dir, norm, max_gt=16,
        extra_aug=dict(random_crop_3d=dict(min_ious=(0.1,))),
        seed=0,
    )

    print(f"{args.volumes} volumes of {args.hw}^2 x {args.depth}")
    for mode in ("thread", "process"):
        for nw in args.workers:
            t0 = time.perf_counter()
            n = 0
            for b in Prefetcher(
                ds, batch_size=1, epoch=0, shuffle=False,
                device_put=False, num_workers=nw, mode=mode,
            ):
                n += b["imgs"].shape[0]
            dt = time.perf_counter() - t0
            print(
                f"{mode:8s} x{nw}: {n / dt:6.2f} samples/s "
                f"({dt / n * 1000:7.1f} ms/sample)",
                flush=True,
            )


if __name__ == "__main__":
    main()
