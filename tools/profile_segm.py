#!/usr/bin/env python
"""Break down the segm (mask-path) inference step at the full det budget.

Times, on the real chip at BASELINE config-1 whole-patch geometry:
  * bbox-only simple_test (the round-2 headline)
  * full segm simple_test (scan/cond mask stage)
  * mask RoIAlign alone at N=2000 rois (corner-gather chunked path)
  * one mask-head forward alone at N=2000 rois
so the mask-stage optimization is profile-guided (VERDICT r2 item 2).
"""
from __future__ import annotations

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


def timeit(fn, *args, iters=4):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from mrcnn3d.detectors import pipeline as pl
    from mrcnn3d.detectors.build import anchor_cfgs, build_detector
    from mrcnn3d.utils.config import Config

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = Config.fromfile(
        os.path.join(here, "configs", "mask_rcnn_3d_2scales.py")
    )
    d, h, w = 64, 512, 512
    d2, h2, w2 = 96, 768, 768
    for k in ("nms_pre", "nms_post", "max_num"):
        cfg.test_cfg["rpn"][k] = 2000
    cfg.test_cfg["rcnn"]["max_per_img"] = 2000

    model = build_detector(cfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(
        rng, jnp.zeros((1, 8, 64, 64, 3), jnp.bfloat16)
    )

    acs = anchor_cfgs(cfg)
    sets = []
    for (dd, hh, ww), ac in zip([(d, h, w), (d2, h2, w2)], acs):
        x = jnp.zeros((1, dd, hh, ww, 3), jnp.bfloat16)
        feats = jax.eval_shape(
            lambda v: model.apply(variables, v, method=model.extract_feat), x
        )
        fs = [f.shape[1:4] for f in feats]
        sets.append(pl.build_anchor_set(fs, (hh, ww, 3, dd), ac))

    base1 = jax.device_put(jax.random.normal(
        jax.random.PRNGKey(11), (1, d, h, w, 3), jnp.bfloat16))
    base2 = jax.device_put(jax.random.normal(
        jax.random.PRNGKey(12), (1, d2, h2, w2, 3), jnp.bfloat16))
    jax.block_until_ready((base1, base2))

    import copy
    scfg = copy.deepcopy(cfg)
    scfg.test_cfg["return_bbox_only"] = False

    @jax.jit
    def infer_bbox(key, b1, b2):
        eps = jax.random.normal(key, (), jnp.bfloat16) * 0.01
        out = pl.simple_test(model, variables,
                             dict(imgs=b1 + eps, imgs_2=b2 + eps), cfg, sets)
        return out["dets"], out["valid"]

    @jax.jit
    def infer_segm(key, b1, b2):
        eps = jax.random.normal(key, (), jnp.bfloat16) * 0.01
        out = pl.simple_test(model, variables,
                             dict(imgs=b1 + eps, imgs_2=b2 + eps), scfg, sets)
        return out["valid"], out["mask_logits"]

    dt_bbox = timeit(lambda k: infer_bbox(k, base1, base2),
                     jax.random.PRNGKey(1), iters=6)
    vv, mm = infer_segm(jax.random.PRNGKey(1), base1, base2)
    n_valid = int(jnp.sum(vv))
    dt_segm = timeit(lambda k: infer_segm(k, base1, base2),
                     jax.random.PRNGKey(2), iters=4)
    print(f"bbox-only step:        {dt_bbox*1e3:8.1f} ms")
    print(f"segm step:             {dt_segm*1e3:8.1f} ms  "
          f"(valid dets {n_valid}/2000)")

    # ---- components at a fixed 2000-roi all-valid budget ----
    feats1 = jax.jit(
        lambda v: model.apply(variables, v, method=model.extract_feat)
    )(base1)
    jax.block_until_ready(feats1)
    mask_roi_cfg = cfg.model["mask_roi_extractor"]
    nroi = 2000
    rs = np.random.RandomState(0)
    x1 = rs.uniform(0, w - 80, nroi)
    y1 = rs.uniform(0, h - 80, nroi)
    z1 = rs.uniform(0, d - 20, nroi)
    sz = rs.uniform(8, 72, (3, nroi))
    rois = jnp.asarray(np.stack(
        [np.zeros(nroi), x1, y1, x1 + sz[0], y1 + sz[1], z1,
         z1 + np.minimum(sz[2], 18)], axis=-1), jnp.float32)
    valid = jnp.ones((nroi,), bool)

    from mrcnn3d.ops.roi_align3d import (
        multi_level_roi_align_3d_chunked, pack_feature_table)
    packed = pack_feature_table(list(feats1))

    # features/packed table are jit ARGUMENTS — closed-over hundred-MB
    # arrays become compile-time constants and blow the remote compile
    # payload limit (HTTP 413)
    import functools

    # packed = (table, pack_x, pack_y, pack_z): the flags are STATIC —
    # only the table array travels as a traced argument
    _, px, py, pz = packed

    @functools.partial(jax.jit, static_argnums=(2, 3, 4))
    def align_only(fts, table, px_, py_, pz_, r, v):
        return multi_level_roi_align_3d_chunked(
            list(fts), r,
            mask_roi_cfg["roi_layer"]["out_size"],
            mask_roi_cfg["roi_layer"]["out_size_depth"],
            mask_roi_cfg["featmap_strides"],
            mask_roi_cfg["featmap_strides_depth"],
            mask_roi_cfg["roi_layer"]["sample_num"],
            valid=v, chunk=64, prepacked=(table, px_, py_, pz_),
        )  # chunk matches the pipeline's ~1 GB slab budget at mask
        # geometry (pipeline.py mask stage: (1<<30)//per_roi = 64)
    dt_align = timeit(
        align_only, tuple(feats1), packed[0], px, py, pz, rois, valid
    )
    mf = align_only(tuple(feats1), packed[0], px, py, pz, rois, valid)
    print(f"mask align 2000 rois:  {dt_align*1e3:8.1f} ms  out {mf.shape}")

    @jax.jit
    def head_only(x):
        return model.apply(variables, x, 0, method=model.mask_forward)
    dt_head = timeit(head_only, mf)
    print(f"mask head 2000 rois:   {dt_head*1e3:8.1f} ms")

    @jax.jit
    def ref_head_only(x):
        return model.apply(variables, x, method=model.refinement_mask_forward)
    dt_rhead = timeit(ref_head_only, mf)
    print(f"ref mask head:         {dt_rhead*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
