#!/usr/bin/env python
"""Profile the whole-patch bbox-only simple_test step (bench headline's
bbox half) and print top HLO ops + a category rollup.

Same capture machinery as tools/profile_train.py (jax.profiler trace ->
xprof hlo_stats); geometry matches bench.py: 512x512x64 @1.0x +
768x768x96 @1.5x, full 2000-proposal reference budget, bf16.

  python tools/profile_infer.py [--iters 4] [--top 25] [--segm]
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

from profile_train import hlo_stats, summarize  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--segm", action="store_true",
                   help="profile the segm (mask-path) step instead")
    p.add_argument("--logdir", default="/tmp/mrcnn3d_profile_infer")
    args = p.parse_args()

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
    if args.segm:
        cfg.test_cfg["return_bbox_only"] = False

    model = build_detector(cfg, dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 64, 64, 3), jnp.bfloat16)
    )
    acs = anchor_cfgs(cfg)
    sets = []
    for (dd, hh, ww), ac in zip([(d, h, w), (d2, h2, w2)], acs):
        feats = jax.eval_shape(
            lambda v: model.apply(variables, v, method=model.extract_feat),
            jnp.zeros((1, dd, hh, ww, 3), jnp.bfloat16),
        )
        sets.append(pl.build_anchor_set(
            [f.shape[1:4] for f in feats], (hh, ww, 3, dd), ac))

    base1 = jax.device_put(jax.random.normal(
        jax.random.PRNGKey(11), (1, d, h, w, 3), jnp.bfloat16))
    base2 = jax.device_put(jax.random.normal(
        jax.random.PRNGKey(12), (1, d2, h2, w2, 3), jnp.bfloat16))
    np.asarray(base1.ravel()[0]); np.asarray(base2.ravel()[0])  # scalar sync

    @jax.jit
    def infer(key, b1, b2):
        eps = jax.random.normal(key, (), jnp.bfloat16) * 0.01
        out = pl.simple_test(
            model, variables, dict(imgs=b1 + eps, imgs_2=b2 + eps),
            cfg, sets,
        )
        keep = (out["dets"], out["valid"])
        if args.segm:
            keep = keep + (out["mask_logits"],)
        return keep

    t0 = time.perf_counter()
    out = infer(jax.random.PRNGKey(1), base1, base2)
    np.asarray(out[0].ravel()[0])  # scalar sync (block_until_ready lies)
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    for i in range(args.iters):
        out = infer(jax.random.fold_in(jax.random.PRNGKey(2), i),
                    base1, base2)
    np.asarray(out[0].ravel()[0])  # same-stream ordering: syncs all iters
    dt = (time.perf_counter() - t0) / args.iters
    print(f"step: {dt*1e3:.1f} ms", file=sys.stderr)

    os.makedirs(args.logdir, exist_ok=True)
    jax.profiler.start_trace(args.logdir)
    for i in range(args.iters):
        out = infer(jax.random.fold_in(jax.random.PRNGKey(3), i),
                    base1, base2)
    np.asarray(out[0].ravel()[0])  # scalar sync before stopping trace
    jax.profiler.stop_trace()

    obj = hlo_stats(args.logdir)
    rows = summarize(obj)
    if not rows:
        print("no hlo_stats rows parsed")
        return

    def g(r, *names, default=0.0):
        for n in names:
            if n in r and r[n] is not None:
                return r[n]
        return default

    key_t = ("Total self time (us)", "self_time_us",
             "Avg. self time (us)")
    total = sum(float(g(r, *key_t)) for r in rows)
    by_cat = {}
    for r in rows:
        cat = g(r, "HLO op category", "HLO category", "category",
                default="?")
        by_cat[cat] = by_cat.get(cat, 0.0) + float(g(r, *key_t))
    print(f"\n== device self-time sum: {total/args.iters/1e3:.1f} ms/step "
          f"vs wall {dt*1e3:.1f} ms/step "
          f"(gap {dt*1e3 - total/args.iters/1e3:.1f} ms = dispatch/host) ==")
    print("\n== category rollup ==")
    for cat, us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{us/total*100:6.2f}%  {us/args.iters/1e3:9.2f} ms/step  {cat}")
    rows.sort(key=lambda r: -float(g(r, *key_t)))
    print("\n== top ops by self time ==")
    for r in rows[: args.top]:
        us = float(g(r, *key_t))
        name = str(g(r, "HLO op name", "HLO name", "hlo_name",
                     default="?"))[:60]
        src = str(g(r, "Source Info", "Source info", default=""))[-50:]
        print(f"{us/total*100:6.2f}%  {us/args.iters/1e3:8.2f} ms  "
              f"{name}  {src}")


if __name__ == "__main__":
    main()
