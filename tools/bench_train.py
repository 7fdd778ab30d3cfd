#!/usr/bin/env python
"""Train-step cost split on one chip: forward-only vs forward+backward.

Runs at the reference crop geometry (128x128x64 @1.0x + 192x192x96
@1.5x, batch 1, bf16) and prints forward_train loss-eval time, full
train-step time, and their per-section deltas.

  python tools/bench_train.py [--iters 6]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--batch", type=int, default=1)
    args = p.parse_args()

    from mrcnn3d.detectors import pipeline as pl
    from mrcnn3d.detectors.build import anchor_cfgs, build_detector
    from mrcnn3d.train.optim import make_optimizer, step_lr_schedule
    from mrcnn3d.train.step import create_train_state, make_train_step
    from mrcnn3d.utils.config import Config

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = Config.fromfile(
        os.path.join(here, "configs", "mask_rcnn_3d_2scales.py")
    )
    model = build_detector(cfg, dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 64, 64, 3), jnp.bfloat16)
    )
    acs = anchor_cfgs(cfg)

    ch, cw, cd = cfg.static_shapes["crop_size"]
    c2 = (int(ch * 1.5), int(cw * 1.5), int(cd * 1.5))
    max_gt = cfg.static_shapes["max_gt"]
    sets = []
    for (hh, ww, dd), ac in zip([(ch, cw, cd), c2], acs):
        x = jnp.zeros((1, dd, hh, ww, 3), jnp.bfloat16)
        feats = jax.eval_shape(
            lambda v: model.apply(variables, v, method=model.extract_feat),
            x,
        )
        sets.append(
            pl.build_anchor_set(
                [f.shape[1:4] for f in feats], (hh, ww, 3, dd), ac
            )
        )

    B = args.batch

    def make_batch(key):
        ks = jax.random.split(key, 4)
        batch = {}
        for s, (hh, ww, dd) in enumerate([(ch, cw, cd), c2]):
            sfx = "" if s == 0 else "_2"
            f = 1.5 ** s
            batch["imgs" + sfx] = jax.random.normal(
                ks[s], (B, dd, hh, ww, 3), jnp.bfloat16
            )
            x1 = jax.random.uniform(ks[2], (B, max_gt, 1), minval=4,
                                    maxval=hh * 0.6) * f
            wsz = jax.random.uniform(ks[3], (B, max_gt, 1), minval=8,
                                     maxval=hh * 0.3) * f
            batch["gt_boxes" + sfx] = jnp.concatenate(
                [x1, x1, x1 + wsz, x1 + wsz,
                 jnp.full_like(x1, 2.0 * f), jnp.full_like(x1, 14.0 * f)],
                axis=-1,
            )
            batch["gt_valid" + sfx] = jnp.ones((B, max_gt), bool)
            batch["gt_labels" + sfx] = jnp.ones((B, max_gt), jnp.int32)
        batch["gt_masks"] = jnp.ones((B, max_gt, cd, ch, cw), jnp.uint8)
        return batch

    def bench(name, fn, mk, iters):
        out = fn(mk(jax.random.PRNGKey(1)), jax.random.PRNGKey(2))
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(iters):
            out = fn(
                mk(jax.random.fold_in(jax.random.PRNGKey(3), i)),
                jax.random.fold_in(jax.random.PRNGKey(4), i),
            )
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f"{name:30s}: {dt:8.2f} ms", flush=True)
        return dt

    # forward-only (loss eval)
    fwd = jax.jit(
        lambda batch, rng: pl.forward_train(
            model, variables, batch, rng, cfg, sets
        )[0]
    )
    bench("forward_train (loss only)", fwd, make_batch, args.iters)

    # full step
    sched = step_lr_schedule(cfg.optimizer["lr"], [], 100)
    tx = make_optimizer(
        cfg.optimizer, cfg.optimizer_config.get("grad_clip"), sched
    )
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        jnp.zeros((1, 8, 64, 64, 3), jnp.bfloat16), tx,
    )
    step = make_train_step(model, tx, cfg, sets)
    holder = {"state": state}

    def run_step(batch, rng):
        holder["state"], m = step(holder["state"], batch, rng)
        return m["loss"]

    bench("train step (fwd+bwd+SGD)", run_step, make_batch, args.iters)

    # gradient-only over the backbone input path: isolates conv bwd cost
    def loss_of_imgs(imgs, imgs2, batch, rng):
        b = dict(batch)
        b["imgs"] = imgs
        b["imgs_2"] = imgs2
        return pl.forward_train(model, variables, b, rng, cfg, sets)[0]

    g = jax.jit(
        lambda batch, rng: jax.grad(loss_of_imgs, argnums=(0, 1))(
            batch["imgs"], batch["imgs_2"], batch, rng
        )[0].astype(jnp.float32).sum()
    )
    bench("grad wrt inputs (conv bwd)", g, make_batch, args.iters)


if __name__ == "__main__":
    main()
