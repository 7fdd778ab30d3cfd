#!/usr/bin/env python
"""Per-component timing of the flagship inference step on one chip.

Times each stage as its own jitted program at BASELINE config-1 patch
geometry (512x512x64 @1.0x + 768x768x96 @1.5x, bf16, 2000-proposal test
budget).  CAVEAT (TECHNICAL_DETAILS.md "Benchmark methodology"): the
volume-input stages regenerate inputs with in-graph threefry, which
adds ~136 ms at the 1.5x geometry — treat extract_feat rows as upper
bounds and prefer device-resident-input + synchronous-fetch timing
(see tools/bench_ops.py and /tmp-style sync probes) when precision
matters.

  python tools/bench_pipeline.py [--iters 6]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/mrcnn3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass


def bench(name, fn, keys, iters):
    out = fn(keys[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(keys[1 + (i % (len(keys) - 1))])
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:34s}: {dt:8.2f} ms", flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=6)
    args = p.parse_args()

    from mrcnn3d.detectors import pipeline as pl
    from mrcnn3d.detectors.build import anchor_cfgs, build_detector
    from mrcnn3d.utils.config import Config

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = Config.fromfile(
        os.path.join(here, "configs", "mask_rcnn_3d_2scales.py")
    )
    for k in ("nms_pre", "nms_post", "max_num"):
        cfg.test_cfg["rpn"][k] = 2000
    cfg.test_cfg["rcnn"]["max_per_img"] = 2000

    model = build_detector(cfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(
        rng, jnp.zeros((1, 8, 64, 64, 3), jnp.bfloat16)
    )
    acs = anchor_cfgs(cfg)

    geoms = [(64, 512, 512), (96, 768, 768)]
    sets = []
    feat_shapes = []
    for (d, h, w), ac in zip(geoms, acs):
        x = jnp.zeros((1, d, h, w, 3), jnp.bfloat16)
        feats = jax.eval_shape(
            lambda v: model.apply(variables, v, method=model.extract_feat),
            x,
        )
        feat_shapes.append([f.shape for f in feats])
        sets.append(
            pl.build_anchor_set(
                [f.shape[1:4] for f in feats], (h, w, 3, d), ac
            )
        )

    keys = [jax.random.fold_in(jax.random.PRNGKey(3), i) for i in range(4)]
    iters = args.iters
    total = 0.0

    # ---- backbone+FPN per scale ----
    for s, (d, h, w) in enumerate(geoms):
        fn = jax.jit(
            lambda key, d=d, h=h, w=w: jax.tree.map(
                lambda t: t.astype(jnp.float32).sum(),
                model.apply(
                    variables,
                    jax.random.normal(key, (1, d, h, w, 3), jnp.bfloat16),
                    method=model.extract_feat,
                ),
            )
        )
        total += bench(f"extract_feat {s} ({h}x{w}x{d})", fn, keys, iters)

    # backbone stages only (no neck) for the 1.5x pathway
    fn = jax.jit(
        lambda key: jax.tree.map(
            lambda t: t.astype(jnp.float32).sum(),
            model.apply(
                variables,
                jax.random.normal(key, (1, 96, 768, 768, 3), jnp.bfloat16),
                method=lambda m, x: m.backbone(x),
            ),
        )
    )
    bench("  backbone only 1.5x", fn, keys, iters)

    # ---- RPN heads + proposal generation per scale ----
    rpn_means, rpn_stds = pl.rpn_codec(cfg)
    for s, (d, h, w) in enumerate(geoms):
        shapes = feat_shapes[s]

        def rpn_fn(key, s=s, shapes=shapes):
            feats = [
                jax.random.normal(jax.random.fold_in(key, i), sh,
                                  jnp.bfloat16)
                for i, sh in enumerate(shapes)
            ]
            outs = model.apply(variables, feats, s, method=model.rpn)
            return sum(
                o[0].astype(jnp.float32).sum()
                + o[1].astype(jnp.float32).sum()
                for o in outs
            )

        total += bench(f"rpn head {s}", jax.jit(rpn_fn), keys, iters)

        def prop_fn(key, s=s, shapes=shapes, geom=geoms[s]):
            d, h, w = geom
            cls_outs, reg_outs = [], []
            for i, sh in enumerate(shapes):
                k1 = jax.random.fold_in(key, 100 + i)
                cls_outs.append(
                    jax.random.normal(
                        k1, sh[:-1] + (model.num_anchors,), jnp.bfloat16
                    )
                )
                reg_outs.append(
                    jax.random.normal(
                        k1, sh[:-1] + (model.num_anchors * 6,),
                        jnp.bfloat16,
                    )
                    * 0.1
                )
            boxes, scores, valid = pl.gen_proposals(
                cls_outs, reg_outs, sets[s], (h, w, 3, d),
                cfg.test_cfg["rpn"], means=rpn_means, stds=rpn_stds,
            )
            return boxes.astype(jnp.float32).sum() + scores.sum()

        total += bench(f"proposals {s} (decode+NMS)", jax.jit(prop_fn),
                       keys, iters)

    # ---- roi align + bbox head (2000 rois, both scales share head) ----
    roi_cfg = cfg.model["bbox_roi_extractor"]
    shapes0 = feat_shapes[0][: len(roi_cfg["featmap_strides"])]

    def bbox_fn(key):
        feats = [
            jax.random.normal(jax.random.fold_in(key, i), sh, jnp.bfloat16)
            for i, sh in enumerate(shapes0)
        ]
        r = jax.random.uniform(key, (2000, 7), minval=0, maxval=400)
        rois = jnp.concatenate(
            [jnp.zeros((2000, 1)), r[:, 1:3], r[:, 1:3] + 40,
             r[:, 5:6] % 40, r[:, 5:6] % 40 + 10], axis=1,
        )
        rf = pl._roi_align_cfg(feats, rois, roi_cfg)
        out = model.apply(variables, rf, 0, method=model.bbox_forward)
        return out[0].astype(jnp.float32).sum()

    total += bench("roi align + bbox head (2000)", jax.jit(bbox_fn),
                   keys, iters)
    print(f"{'sum of stages':34s}: {total:8.2f} ms")


if __name__ == "__main__":
    main()
