#!/usr/bin/env python
"""Train-batch sweep on the real chip: step time + throughput + MFU at
per-chip batch 1/2/4 (VERDICT r3 item 2 / r4 item 5).

The reference trains at imgs_per_gpu=1 (configs/
3d-multi-resolution-rcnn.py data block); a larger per-chip batch
amortises the fixed per-step work (RPN target gen, NMS, optimizer) over
more volumes.  Only the train phase depends on the batch, so this
sweeps JUST the jitted train step at the reference crop geometry
(128x128x64 @1.0x + 192x192x96 @1.5x, bf16) in one process — one extra
compile per batch size instead of a full bench.py re-run each.

  python tools/bench_sweep.py [--batches 1,2,4] [--out SWEEP.json]

The winner (volumes/s) should be promoted to bench.py's train phase
default (MRCNN3D_BENCH_TRAIN_BATCH).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/mrcnn3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass

PEAK_FLOPS = 197e12  # v5e bf16 peak per chip


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="1,2,4")
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--out", default=None)
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
    float(jnp.sum(jax.tree_util.tree_leaves(variables)[0]))  # scalar-fetch sync
    print("init done", file=sys.stderr, flush=True)

    ch, cw, cd = cfg.static_shapes["crop_size"]
    c2 = (int(ch * 1.5), int(cw * 1.5), int(cd * 1.5))
    max_gt = cfg.static_shapes["max_gt"]
    acs = anchor_cfgs(cfg)
    tsets = []
    for (hh, ww, dd), ac in zip([(ch, cw, cd), c2], acs):
        feats = jax.eval_shape(
            lambda v: model.apply(variables, v, method=model.extract_feat),
            jnp.zeros((1, dd, hh, ww, 3), jnp.bfloat16),
        )
        tsets.append(pl.build_anchor_set(
            [f.shape[1:4] for f in feats], (hh, ww, 3, dd), ac))
    sched = step_lr_schedule(cfg.optimizer["lr"], [], 100)
    tx = make_optimizer(
        cfg.optimizer, cfg.optimizer_config.get("grad_clip"), sched
    )
    train_step = make_train_step(model, tx, cfg, tsets)

    def make_batch(key, tb):
        ks = jax.random.split(key, 4)
        batch = {}
        for s, (hh, ww, dd) in enumerate([(ch, cw, cd), c2]):
            sfx = "" if s == 0 else "_2"
            f = 1.5 ** s
            batch["imgs" + sfx] = jax.random.normal(
                ks[s], (tb, dd, hh, ww, 3), jnp.bfloat16
            )
            x1 = jax.random.uniform(ks[2], (tb, max_gt, 1), minval=4,
                                    maxval=hh * 0.6) * f
            wsz = jax.random.uniform(ks[3], (tb, max_gt, 1), minval=8,
                                     maxval=hh * 0.3) * f
            batch["gt_boxes" + sfx] = jnp.concatenate(
                [x1, x1, x1 + wsz, x1 + wsz,
                 jnp.full_like(x1, 2.0 * f), jnp.full_like(x1, 14.0 * f)],
                axis=-1,
            )
            batch["gt_valid" + sfx] = jnp.ones((tb, max_gt), bool)
            batch["gt_labels" + sfx] = jnp.ones((tb, max_gt), jnp.int32)
        batch["gt_masks"] = jnp.ones((tb, max_gt, cd, ch, cw), jnp.uint8)
        return batch

    results = []
    for tb in [int(x) for x in args.batches.split(",")]:
        # fresh state per batch size: train_step donates the state
        # buffers, so reusing one state across sweep points dereferences
        # deleted arrays
        state = create_train_state(
            model, jax.random.PRNGKey(0),
            jnp.zeros((1, 8, 64, 64, 3), jnp.bfloat16), tx,
        )
        batch0 = make_batch(jax.random.PRNGKey(7), tb)
        t0 = time.time()
        try:
            compiled = train_step.lower(
                state, batch0, jax.random.PRNGKey(8)
            ).compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0))
        except Exception as e:
            rec = dict(train_batch=tb, error=str(e)[:300])
            results.append(rec)
            print(json.dumps(rec), flush=True)
            continue
        compile_s = time.time() - t0
        state, m0 = train_step(state, batch0, jax.random.PRNGKey(8))
        float(m0["loss"])  # blocking scalar-fetch sync
        batches = [
            make_batch(jax.random.fold_in(jax.random.PRNGKey(9), i), tb)
            for i in range(args.iters)
        ]
        np.asarray(jax.tree_util.tree_leaves(batches)[0].ravel()[0])  # sync
        ts = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            state, metrics = train_step(
                state, batches[i],
                jax.random.fold_in(jax.random.PRNGKey(10), i),
            )
            # blocking SCALAR fetch: on the axon remote stack
            # block_until_ready returns without awaiting completion
            # (measured 5 ms for the 140 ms train step) — fetching a
            # scalar is the only reliable sync (see bench_convs.time_fn)
            float(metrics["loss"])
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        rec = dict(
            train_batch=tb,
            step_s=round(dt, 4),
            vols_per_s=round(tb / dt, 4),
            mfu=round(flops / dt / PEAK_FLOPS, 4) if flops else None,
            compile_s=round(compile_s, 1),
            min_s=round(float(np.min(ts)), 4),
            max_s=round(float(np.max(ts)), 4),
        )
        results.append(rec)
        print(json.dumps(rec), flush=True)

    ok = [r for r in results if "step_s" in r]
    if ok:
        win = max(ok, key=lambda r: r["vols_per_s"])
        summary = dict(
            sweep=results,
            winner_batch=win["train_batch"],
            winner_vols_per_s=win["vols_per_s"],
            device_kind=jax.devices()[0].device_kind,
        )
        print(json.dumps(summary))
        if args.out:
            json.dump(summary, open(args.out, "w"), indent=1)


if __name__ == "__main__":
    main()
