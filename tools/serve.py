#!/usr/bin/env python
"""Serving CLI: persistent compiled-program inference over a directory.

  python tools/serve.py CONFIG CHECKPOINT --in-dir volumes/ \
      --out-dir results/ [--once]

Keeps the jitted whole-volume programs resident across volumes
(shape-bucketed) and overlaps host IO with device compute.  `--once`
processes the current directory contents and exits; default watches
for new volumes forever.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint", help="orbax checkpoint dir (work_dir)")
    p.add_argument("--in-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--once", action="store_true")
    p.add_argument("--score-thr", type=float, default=0.05)
    p.add_argument("--poll-s", type=float, default=1.0)
    args = p.parse_args()

    import jax.numpy as jnp

    from mrcnn3d.apis.serve import watch
    from mrcnn3d.apis.test_api import InferenceRunner
    from mrcnn3d.detectors.build import build_detector
    from mrcnn3d.train import checkpoint as ckpt
    from mrcnn3d.utils.config import Config

    cfg = Config.fromfile(args.config)
    model = build_detector(cfg, dtype=jnp.bfloat16)
    manager = ckpt.make_manager(args.checkpoint)
    restored = ckpt.restore_params(manager)
    if restored is None:
        raise SystemExit(f"no checkpoint under {args.checkpoint}")
    variables = {"params": restored["params"]}
    if restored["batch_stats"]:
        variables["batch_stats"] = restored["batch_stats"]
    runner = InferenceRunner(cfg, model, variables)

    norm = cfg.data["test"]["img_norm_cfg"] if "data" in cfg else dict(
        mean=[123.675, 116.28, 103.53],
        std=[58.395, 57.12, 57.375],
        to_rgb=True,
    )
    n_before = len(
        [f for f in os.listdir(args.in_dir) if f.endswith(".npy")]
    )
    watch(
        runner,
        args.in_dir,
        args.out_dir,
        norm,
        size_divisor=cfg.data.get("size_divisor", 32)
        if "data" in cfg else 32,
        num_classes=model.num_classes,
        poll_s=args.poll_s,
        stop_after=n_before if args.once else None,
        score_thr=args.score_thr,
    )


if __name__ == "__main__":
    main()
