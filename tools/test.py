#!/usr/bin/env python
"""Offline test/eval CLI (reference tools/test.py flags).

  python tools/test.py configs/mask_rcnn_3d_2scales.py ckpt_dir \
      --out results.pkl --eval bbox

When the config carries a `data2` block (the dual-resolution offline
protocol, reference tools/test.py:38-73 `double_test`), a second pass
runs over the 1.5x test set with `test_cfg2` and both result sets are
merged via the results2json3DMulti path (coco_utils.py:480-574) before
the global NMS and a single evaluation against the 1.0x ground truth.
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def parse_args():
    p = argparse.ArgumentParser(description="Test a 3D detector")
    p.add_argument("config")
    p.add_argument("checkpoint", help="orbax checkpoint dir (work_dir)")
    p.add_argument("--out", help="output result pickle")
    p.add_argument("--eval", nargs="+", default=["bbox"],
                   choices=["bbox", "segm"])
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--gpu_collect", action="store_true",
                   help="accepted for reference-CLI parity")
    p.add_argument(
        "--double",
        action="store_true",
        help="force the dual-dataset double_test protocol (implied when "
        "the config has a data2 block; with --synthetic, pass 2 runs a "
        "1.5x twin of the synthetic set)",
    )
    return p.parse_args()


def main():
    args = parse_args()
    import jax.numpy as jnp

    from mrcnn3d.apis.test_api import run_inference
    from mrcnn3d.data.coco3d import Coco3D2ScalesDataset, Coco3DDataset
    from mrcnn3d.detectors.build import build_detector
    from mrcnn3d.eval.coco_eval3d import CocoEval3D
    from mrcnn3d.eval.results import results2json3d
    from mrcnn3d.train import checkpoint as ckpt
    from mrcnn3d.utils.config import Config

    cfg = Config.fromfile(args.config)
    if "segm" in args.eval:
        # the mask path only runs when bbox-only mode is off
        cfg.test_cfg["return_bbox_only"] = False
    model = build_detector(cfg)

    te = cfg.data["test"]
    if args.synthetic:
        import tempfile

        from mrcnn3d.data.synthetic import make_synthetic_coco3d

        root = os.path.join(tempfile.gettempdir(), "mrcnn3d_synth_test")
        ann_file, img_dir = make_synthetic_coco3d(
            root, num_volumes=4, hw=128, depth=32, seed=7
        )
    else:
        ann_file, img_dir = te["ann_file"], te["img_prefix"]

    two_scale = "rpn_head_2" in cfg.model
    ds_cls = Coco3D2ScalesDataset if two_scale else Coco3DDataset
    dataset = ds_cls(
        ann_file,
        img_dir,
        img_norm_cfg=te["img_norm_cfg"],
        size_divisor=te.get("size_divisor", 32),
        with_mask=False,
        test_mode=True,
    )

    # params-only restore: eval never rebuilds the training optimizer
    import jax

    manager = ckpt.make_manager(args.checkpoint)
    restored = ckpt.restore_params(manager)
    if restored is not None:
        print(f"loaded checkpoint at step {restored['step']}")
        variables = {"params": restored["params"]}
        if restored["batch_stats"]:
            variables["batch_stats"] = restored["batch_stats"]
    else:
        print("WARNING: no checkpoint found, using random init")
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 32, 32, 3))
        )
    out = run_inference(cfg, model, variables, dataset)
    results, infos = out[0], out[1]
    segms = out[2] if len(out) > 2 else None

    # double_test: second pass over the 1.5x dataset with test_cfg2
    # (reference tools/test.py:38-73,123-139)
    results2 = infos2 = None
    # reference cfg names the twin block `data2_2scales` and aliases it
    # as cfg.data2 (configs/3d-multi-resolution-rcnn.py:149,204); accept
    # either spelling
    data2_cfg = cfg.get("data2", None) or cfg.get("data2_2scales", None)
    use_double = args.double or data2_cfg is not None
    scale2 = 1.0 / cfg.get("upscale_factor", 1.5)
    if use_double:
        import copy

        if args.synthetic:
            from mrcnn3d.data.synthetic import make_synthetic_coco3d_scaled

            ann2, img_dir2 = make_synthetic_coco3d_scaled(
                ann_file, img_dir, root + "_1dot5x", 1.0 / scale2
            )
            te2 = te
        else:
            if data2_cfg is None:
                raise SystemExit(
                    "--double needs a data2/data2_2scales config block"
                )
            te2 = data2_cfg["test"]
            ann2, img_dir2 = te2["ann_file"], te2["img_prefix"]
        dataset2 = ds_cls(
            ann2,
            img_dir2,
            img_norm_cfg=te2["img_norm_cfg"],
            size_divisor=te2.get("size_divisor", 32),
            with_mask=False,
            test_mode=True,
        )
        cfg2 = copy.deepcopy(cfg)
        cfg2["test_cfg"] = cfg2.get("test_cfg2", cfg2["test_cfg"])
        results2, infos2 = run_inference(cfg2, model, variables, dataset2)[:2]

    if args.out:
        with open(args.out, "wb") as f:
            pickle.dump(
                results if results2 is None else results + results2, f
            )

    if "bbox" in args.eval:
        if results2 is not None:
            from mrcnn3d.eval.results import results2json3d_multi

            entries = results2json3d_multi(
                results, infos, results2, infos2, scale2=scale2
            )
        else:
            entries = results2json3d(results, infos)
        evaluator = CocoEval3D(dataset.coco, entries)
        for k, v in evaluator.named_stats().items():
            print(f"{k}: {v:.4f}")
    if "segm" in args.eval and segms is not None:
        from mrcnn3d.eval.masks import segm_entries

        entries = []
        for cls_segms, per_class, info in zip(segms, results, infos):
            entries.extend(segm_entries(cls_segms, per_class, info))
        evaluator = CocoEval3D(dataset.coco, entries, iou_type="segm")
        for k, v in evaluator.named_stats(prefix="segm").items():
            print(f"{k}: {v:.4f}")


if __name__ == "__main__":
    main()
