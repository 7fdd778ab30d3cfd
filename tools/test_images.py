#!/usr/bin/env python
"""Qualitative whole-volume evaluation with per-slice overlays.

Equivalent of the reference's standalone test_images.py: runs 2-scale (or
single-scale) inference over volumes and writes per-slice PNGs with
predicted boxes (red, scored) and ground-truth boxes (dashed green).

  python tools/test_images.py configs/mask_rcnn_3d_2scales.py ckpt_dir \
      --synthetic --out-dir viz/
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint")
    p.add_argument("--out-dir", default="viz")
    p.add_argument("--score-thr", type=float, default=0.2)
    p.add_argument("--synthetic", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mrcnn3d.apis.test_api import run_inference
    from mrcnn3d.apis.inference import show_result_3d
    from mrcnn3d.data.coco3d import Coco3D2ScalesDataset, Coco3DDataset
    from mrcnn3d.detectors.build import build_detector
    from mrcnn3d.train import checkpoint as ckpt
    from mrcnn3d.train.optim import make_optimizer, step_lr_schedule
    from mrcnn3d.train.step import create_train_state
    from mrcnn3d.utils.config import Config

    cfg = Config.fromfile(args.config)
    model = build_detector(cfg)
    te = cfg.data["test"]
    if args.synthetic:
        import tempfile

        from mrcnn3d.data.synthetic import make_synthetic_coco3d

        root = os.path.join(tempfile.gettempdir(), "mrcnn3d_synth_viz")
        ann_file, img_dir = make_synthetic_coco3d(
            root, num_volumes=2, hw=128, depth=32, seed=11
        )
    else:
        ann_file, img_dir = te["ann_file"], te["img_prefix"]

    ds_cls = (
        Coco3D2ScalesDataset if "rpn_head_2" in cfg.model else Coco3DDataset
    )
    dataset = ds_cls(
        ann_file,
        img_dir,
        img_norm_cfg=te["img_norm_cfg"],
        size_divisor=te.get("size_divisor", 32),
        with_mask=False,
        test_mode=True,
    )

    tx = make_optimizer(
        cfg.optimizer,
        cfg.optimizer_config.get("grad_clip"),
        step_lr_schedule(1e-3, [], 100),
    )
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 8, 32, 32, 3)), tx
    )
    restored = ckpt.restore(ckpt.make_manager(args.checkpoint), state)
    if restored is not None:
        state = restored
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats

    results, infos = run_inference(cfg, model, variables, dataset)
    for per_class, info in zip(results, infos):
        vol = dataset.load_volume(info)
        gt = np.array(
            [
                [
                    a["bbox"][0],
                    a["bbox"][1],
                    a["bbox"][0] + a["bbox"][2] - 1,
                    a["bbox"][1] + a["bbox"][3] - 1,
                    a["bbox"][4],
                    a["bbox"][4] + a["bbox"][5] - 1,
                ]
                for a in dataset.anns_by_img.get(info["id"], [])
            ],
            np.float32,
        )
        out = show_result_3d(
            vol,
            per_class,
            os.path.join(args.out_dir, os.path.splitext(info["file_name"])[0]),
            score_thr=args.score_thr,
            gt_boxes=gt if len(gt) else None,
        )
        print(f"{info['file_name']}: wrote {len(out)} slice overlays")


if __name__ == "__main__":
    main()
