#!/usr/bin/env python
"""Phase-level timing of the whole-volume tiled driver (bench config 3).

BENCH_r04 measured wholevol_e2e_s = 107 s for a sweep whose device work
is ~5 tiles x 0.51 s — the other ~100 s is host-side.  This script runs
the same 512^2x240 sweep as bench.py with per-phase timers: volume
prep/upload, per-tile device step, per-tile det/mask fetch, host
box-mask resize, merge NMS.

  python tools/profile_tiled.py            # real chip, bench geometry
  python tools/profile_tiled.py --smoke    # tiny, any backend
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

T = {}


def tic():
    return time.perf_counter()


def toc(key, t0):
    T[key] = T.get(key, 0.0) + (time.perf_counter() - t0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--smoke", action="store_true")
    args = p.parse_args()

    from mrcnn3d.apis import tiled as tl
    from mrcnn3d.detectors import pipeline as pl
    from mrcnn3d.detectors.build import build_detector
    from mrcnn3d.eval.masks import get_box_masks_3d
    from mrcnn3d.eval.results import det_entries, merge_patch_detections
    from mrcnn3d.utils.config import Config

    here = os.path.join(os.path.dirname(__file__), "..")
    cfg = Config.fromfile(
        os.path.join(here, "configs", "mask_rcnn_3d_2scales.py")
    )
    cfg.test_cfg["return_bbox_only"] = False
    # bf16 like bench.py: the f32 program OOMs the v5e at this geometry
    model = build_detector(cfg, dtype=jnp.bfloat16)

    if args.smoke:
        wv_d, wv_h = 48, 64
        d, hw = 16, 32
    else:
        wv_d, wv_h = 240, 512
        d, hw = 64, 512

    rng = jax.random.PRNGKey(0)
    t0 = tic()
    variables = jax.jit(model.init)(
        rng, jnp.zeros((1, 8, 64, 64, 3), jnp.bfloat16)
    )
    jax.block_until_ready(variables)
    toc("init", t0)

    t0 = tic()
    wv1 = np.asarray(
        jax.random.normal(
            jax.random.PRNGKey(16), (wv_d, wv_h, wv_h, 3), jnp.bfloat16
        ),
        np.float32,
    )
    wv2 = np.asarray(
        jax.random.normal(
            jax.random.PRNGKey(17),
            (int(wv_d * 1.5), int(wv_h * 1.5), int(wv_h * 1.5), 3),
            jnp.bfloat16,
        ),
        np.float32,
    )
    toc("make host volumes (f32)", t0)
    vol_sample = {"imgs": wv1, "imgs_2": wv2}

    # --- phase-instrumented replica of tiled_inference ---
    img = vol_sample["imgs"]
    mask_thr = cfg.test_cfg["rcnn"].get("mask_thr_binary", 0.25)
    patch_d, patch_hw = d, hw
    stride_d = max(int(patch_d * 0.75), 1)
    stride_hw = max(int(patch_hw * 0.75), 1)
    zs = tl.tile_starts(wv_d, patch_d, stride_d)
    ys = tl.tile_starts(wv_h, patch_hw, stride_hw)
    xs = tl.tile_starts(wv_h, patch_hw, stride_hw)
    print(f"tiles: {len(zs)}x{len(ys)}x{len(xs)}")

    up = 1.5
    pd2, ph2 = int(round(patch_d * up)), int(round(patch_hw * up))
    dtype = getattr(model, "dtype", jnp.float32)

    t0 = tic()
    img = tl._pad_to(img, (max(wv_d, patch_d), max(wv_h, patch_hw),
                           max(wv_h, patch_hw)))
    vol = jax.device_put(jnp.asarray(img, dtype))
    z2s = [int(round(z * up)) for z in zs]
    y2s = [int(round(y * up)) for y in ys]
    x2s = [int(round(x * up)) for x in xs]
    img2 = tl._pad_to(
        vol_sample["imgs_2"],
        (max(z2s) + pd2, max(y2s) + ph2, max(x2s) + ph2),
    )
    vol2 = jax.device_put(jnp.asarray(img2, dtype))
    jax.block_until_ready((vol, vol2))
    toc("pad+cast+upload", t0)

    t0 = tic()
    tiler = tl.DeviceTiler(
        cfg, model, variables, (patch_d, patch_hw, patch_hw),
        (pd2, ph2, ph2),
    )
    toc("tiler ctor", t0)

    entries = []
    first = True
    for iz, z0 in enumerate(zs):
        for iy, y0 in enumerate(ys):
            for ix, x0 in enumerate(xs):
                o2 = (z2s[iz], y2s[iy], x2s[ix])
                t0 = tic()
                out = tiler._fn(
                    vol, vol2,
                    jnp.asarray((z0, y0, x0), jnp.int32),
                    jnp.asarray(o2, jnp.int32),
                )
                jax.block_until_ready(out)
                toc("tile compile+first" if first else "tile device step",
                    t0)
                t0 = tic()
                dets = np.asarray(out[0][0])
                labels = np.asarray(out[1][0])
                valid = np.asarray(out[2][0])
                toc("fetch dets", t0)
                t0 = tic()
                masks = np.asarray(out[3], np.float32)
                toc("fetch masks", t0)
                first = False

                t0 = tic()
                per_class = pl.bbox2result3d(
                    dets, labels, valid, model.num_classes
                )
                info = dict(id=0, pos_left=x0, pos_top=y0, pos_front=z0)
                patch_entries = det_entries(per_class, info)
                toc("det entries", t0)
                t0 = tic()
                bms = get_box_masks_3d(masks, dets, labels, valid,
                                       mask_thr)
                toc("box-mask resize", t0)
                T["n_masks"] = T.get("n_masks", 0) + len(bms)
                cls_masks = [[] for _ in range(model.num_classes - 1)]
                for bm in bms:
                    cls_masks[bm["label"] - 1].append(bm)
                flat = [bm for cm in cls_masks for bm in cm]
                shift = np.array([x0, y0, x0, y0, z0, z0], np.int32)
                for e, bm in zip(patch_entries, flat):
                    e["segmentation"] = dict(
                        box=bm["box"] + shift, mask=bm["mask"],
                        shape=(wv_d, wv_h, wv_h),
                    )
                entries.extend(patch_entries)

    t0 = tic()
    merged = merge_patch_detections(entries, 0.1)
    toc("merge NMS", t0)
    T["n_entries"] = len(entries)
    T["n_merged"] = len(merged)

    for k, v in T.items():
        if k.startswith("n_"):
            print(f"{k:24s} {v}")
        else:
            print(f"{k:24s} {v:8.2f} s")


if __name__ == "__main__":
    main()
