#!/usr/bin/env python
"""Training CLI (same flags as the reference tools/train.py).

Examples:
  python tools/train.py configs/mask_rcnn_3d_2scales.py --validate
  python tools/train.py configs/mask_rcnn_3d_2scales.py --synthetic \
      --max-iters 50   # smoke run on generated data
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def parse_args():
    p = argparse.ArgumentParser(description="Train a 3D detector")
    p.add_argument("config", help="config file path")
    p.add_argument("--work_dir", help="dir to save logs and checkpoints")
    p.add_argument("--resume_from", help="checkpoint to resume from")
    p.add_argument(
        "--validate", action="store_true", help="eval every k epochs"
    )
    p.add_argument("--gpus", type=int, default=1,
                   help="accepted for reference-CLI parity (devices come "
                        "from the jax mesh)")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--launcher", default="none",
                   help="accepted for parity; single-controller jax needs "
                        "no launcher")
    p.add_argument("--local_rank", type=int, default=0)
    p.add_argument("--max-iters", type=int, default=None,
                   help="stop after N iterations (smoke runs)")
    p.add_argument("--synthetic", action="store_true",
                   help="train on a generated synthetic COCO-3D dataset")
    return p.parse_args()


def main():
    args = parse_args()
    if args.launcher not in ("none", None):
        # multi-host pod: single-controller jax distributed runtime
        # (replaces the reference's torch.distributed/NCCL init,
        # mmdet/apis/env.py:13-50)
        import jax

        jax.distributed.initialize()
    from mrcnn3d.apis.train_api import train_detector
    from mrcnn3d.data.coco3d import Coco3D2ScalesDataset, Coco3DDataset
    from mrcnn3d.utils.config import Config

    cfg = Config.fromfile(args.config)
    if args.work_dir:
        cfg.work_dir = args.work_dir
    if args.resume_from:
        cfg.resume_from = args.resume_from

    tr = cfg.data["train"]
    max_gt = cfg.get("static_shapes", {}).get("max_gt", 16)
    two_scale = "rpn_head_2" in cfg.model

    if args.synthetic:
        import tempfile

        from mrcnn3d.data.synthetic import make_synthetic_coco3d

        root = os.path.join(
            tempfile.gettempdir(), "mrcnn3d_synth_train"
        )
        ann_file, img_dir = make_synthetic_coco3d(
            root, num_volumes=8, hw=128, depth=32, seed=0
        )
    else:
        ann_file, img_dir = tr["ann_file"], tr["img_prefix"]

    kwargs = dict(
        img_norm_cfg=tr["img_norm_cfg"],
        size_divisor=tr.get("size_divisor", 32),
        with_mask=tr.get("with_mask", True),
        max_gt=max_gt,
        extra_aug=tr.get("extra_aug"),
        seed=args.seed or 0,
    )
    if two_scale:
        dataset = Coco3D2ScalesDataset(
            ann_file,
            img_dir,
            upscale_factor=cfg.get("upscale_factor", 1.5),
            **kwargs,
        )
    else:
        dataset = Coco3DDataset(ann_file, img_dir, **kwargs)

    val_dataset = None
    if args.validate:
        if args.synthetic:
            val_dataset = type(dataset)(
                ann_file, img_dir, test_mode=True,
                **{k: v for k, v in kwargs.items()
                   if k not in ("extra_aug",)},
            )
        else:
            v = cfg.data["val"]
            val_dataset = type(dataset)(
                v["ann_file"],
                v["img_prefix"],
                img_norm_cfg=v["img_norm_cfg"],
                size_divisor=v.get("size_divisor", 32),
                with_mask=False,
                test_mode=True,
                max_gt=max_gt,
            )

    train_detector(
        cfg,
        dataset,
        work_dir=cfg.get("work_dir"),
        seed=args.seed or 0,
        validate=args.validate,
        val_dataset=val_dataset,
        max_iters=args.max_iters,
    )


if __name__ == "__main__":
    main()
