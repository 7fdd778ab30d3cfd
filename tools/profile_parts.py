"""Per-component timing of the flagship 2-scale inference step on TPU.

Times each stage of the pipeline separately at the bench geometry to
locate hot spots. Every timed call takes a fresh PRNG key and generates
its inputs on-device: the remote-execution stack caches results of
repeated identical executions, which would fake the timing otherwise.
Developer tool; not part of the test suite.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/mrcnn3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass

KEY = jax.random.PRNGKey(7)


def timeit(fn, name="", iters=8):
    """fn: key -> outputs (jitted). Fresh key per call defeats caching."""
    out = fn(jax.random.fold_in(KEY, 999))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(jax.random.fold_in(KEY, i))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:45s} {dt:9.2f} ms", flush=True)
    return dt


def main():
    from mrcnn3d.detectors import pipeline as pl
    from mrcnn3d.detectors.build import anchor_cfgs, build_detector
    from mrcnn3d.utils.config import Config

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = Config.fromfile(os.path.join(here, "configs", "mask_rcnn_3d_2scales.py"))
    for k in ("nms_pre", "nms_post", "max_num"):
        cfg.test_cfg["rpn"][k] = 2000
    cfg.test_cfg["rcnn"]["max_per_img"] = 2000

    d, h, w = 64, 512, 512
    d2, h2, w2 = 96, 768, 768

    model = build_detector(cfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, 8, 64, 64, 3), jnp.bfloat16))

    acs = anchor_cfgs(cfg)
    sets = []
    feat_shapes = []
    for (dd, hh, ww), ac in zip([(d, h, w), (d2, h2, w2)], acs):
        x = jnp.zeros((1, dd, hh, ww, 3), jnp.bfloat16)
        feats = jax.eval_shape(
            lambda v: model.apply(variables, v, method=model.extract_feat), x
        )
        feat_shapes.append([f.shape for f in feats])
        fs = [f.shape[1:4] for f in feats]
        sets.append(pl.build_anchor_set(fs, (hh, ww, 3, dd), ac))

    def rand(key, shape):
        return jax.random.normal(key, shape, jnp.bfloat16)

    @jax.jit
    def ef1(key):
        return model.apply(variables, rand(key, (1, d, h, w, 3)),
                           method=model.extract_feat)

    @jax.jit
    def ef2(key):
        return model.apply(variables, rand(key, (1, d2, h2, w2, 3)),
                           method=model.extract_feat)

    @jax.jit
    def bb1(key):
        return model.apply(variables, rand(key, (1, d, h, w, 3)),
                           method=lambda m, x: m.backbone(x))

    @jax.jit
    def bb2(key):
        return model.apply(variables, rand(key, (1, d2, h2, w2, 3)),
                           method=lambda m, x: m.backbone(x))

    timeit(ef1, "extract_feat 1.0x (512^2x64)")
    timeit(ef2, "extract_feat 1.5x (768^2x96)")
    timeit(bb1, "  backbone 1.0x")
    timeit(bb2, "  backbone 1.5x")

    # RPN heads on random features of the right shapes
    def mk_rpn(shapes, scale):
        @jax.jit
        def f(key):
            fs = tuple(rand(jax.random.fold_in(key, i), s)
                       for i, s in enumerate(shapes))
            return model.apply(variables, fs,
                               method=lambda m, f: m.rpn(f, scale))
        return f

    rpn1 = mk_rpn(feat_shapes[0], 0)
    rpn2 = mk_rpn(feat_shapes[1], 1 if model.num_scales > 1 else 0)
    timeit(rpn1, "rpn_head 1.0x")
    timeit(rpn2, "rpn_head 1.5x")

    # proposals (decode + NMS) per pathway, from random rpn outputs
    @jax.jit
    def props1(key):
        fs = tuple(rand(jax.random.fold_in(key, i), s)
                   for i, s in enumerate(feat_shapes[0]))
        outs = model.apply(variables, fs,
                           method=lambda m, f: m.rpn(f, 0))
        cls = [o[0] for o in outs]
        reg = [o[1] for o in outs]
        return pl.gen_proposals(
            cls, reg, sets[0], (h, w, 3, d), cfg.test_cfg["rpn"])

    timeit(props1, "rpn head+proposals+NMS 1.0x")

    @jax.jit
    def props2(key):
        fs = tuple(rand(jax.random.fold_in(key, i), s)
                   for i, s in enumerate(feat_shapes[1]))
        outs = model.apply(
            variables, fs,
            method=lambda m, f: m.rpn(f, 1 if m.num_scales > 1 else 0))
        cls = [o[0] for o in outs]
        reg = [o[1] for o in outs]
        return pl.gen_proposals(
            cls, reg, sets[1], (h2, w2, 3, d2), cfg.test_cfg["rpn"])

    timeit(props2, "rpn head+proposals+NMS 1.5x")

    # RCNN stage pieces at the 2000-proposal budget
    from mrcnn3d.core.post import multiclass_nms_3d

    roi_cfg = cfg.model.get("bbox_roi_extractor")
    n_roi = cfg.test_cfg["rpn"]["max_num"]

    def rand_rois(key, n, hh, ww, dd):
        k1, k2 = jax.random.split(key)
        c = jax.random.uniform(
            k1, (n, 3), minval=0.0,
            maxval=jnp.array([ww - 40.0, hh - 40.0, dd - 10.0]))
        sz = jax.random.uniform(
            k2, (n, 3), minval=2.0, maxval=jnp.array([40.0, 40.0, 10.0]))
        boxes = jnp.concatenate(
            [c[:, :2], c[:, :2] + sz[:, :2], c[:, 2:], c[:, 2:] + sz[:, 2:]],
            axis=-1)[:, [0, 1, 2, 3, 4, 5]]
        # x1 y1 x2 y2 z1 z2
        boxes = jnp.stack(
            [c[:, 0], c[:, 1], c[:, 0] + sz[:, 0], c[:, 1] + sz[:, 1],
             c[:, 2], c[:, 2] + sz[:, 2]], axis=-1)
        return jnp.concatenate(
            [jnp.zeros((n, 1), boxes.dtype), boxes], axis=-1)

    @jax.jit
    def roi_align_bench(key):
        fs = tuple(rand(jax.random.fold_in(key, i), s)
                   for i, s in enumerate(feat_shapes[0]))
        rois = rand_rois(key, n_roi, h, w, d)
        rvalid = jnp.ones((n_roi,), bool)
        return pl._roi_align_cfg(fs, rois, roi_cfg, rvalid)

    timeit(roi_align_bench, f"roi_align {n_roi} rois 1.0x feats")

    @jax.jit
    def bbox_head_bench(key):
        rf = rand(key, (n_roi, 3, 7, 7, model.fpn_channels))
        return model.apply(variables, rf, 0, method=model.bbox_forward)

    timeit(bbox_head_bench, f"bbox_head {n_roi} rois")

    @jax.jit
    def refinement_bench(key):
        rf = rand(key, (n_roi, 3, 7, 7, model.fpn_channels))
        return model.apply(variables, rf, method=model.refinement_forward)

    timeit(refinement_bench, f"refinement_head {n_roi} rois")

    n_all = n_roi * 2

    @jax.jit
    def nms_bench(key):
        boxes = rand_rois(key, n_all, h, w, d)[:, 1:]
        k = jax.random.fold_in(key, 1)
        scores = jax.random.uniform(k, (n_all, 2))
        vd = jnp.ones((n_all,), bool)
        return multiclass_nms_3d(
            boxes, scores, vd,
            cfg.test_cfg["rcnn"]["score_thr"],
            cfg.test_cfg["rcnn"]["nms"]["iou_thr"],
            cfg.test_cfg["rcnn"]["max_per_img"])

    timeit(nms_bench, f"multiclass_nms {n_all} boxes")

    @jax.jit
    def mask_bench(key):
        rf = rand(key, (n_roi, 10, 14, 14, model.fpn_channels))
        return model.apply(variables, rf, 0, method=model.mask_forward)

    timeit(mask_bench, f"mask_head {n_roi} rois")

    @jax.jit
    def full(key):
        k1, k2 = jax.random.split(key)
        out = pl.simple_test(
            model, variables,
            dict(imgs=rand(k1, (1, d, h, w, 3)),
                 imgs_2=rand(k2, (1, d2, h2, w2, 3))),
            cfg, sets)
        return out["dets"], out["valid"]

    timeit(full, "FULL simple_test", iters=6)


if __name__ == "__main__":
    main()
