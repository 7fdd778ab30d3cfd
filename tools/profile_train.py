#!/usr/bin/env python
"""Capture a jax.profiler trace of the train step and print top HLO ops.

Profiles the flagship two-scale train step at the reference crop
geometry (128x128x64 @1.0x + 192x192x96 @1.5x, batch configurable) on
the attached chip, converts the captured XSpace with xprof's hlo_stats
tool, and prints the top ops by self time plus a category rollup.

The reference has no profiler at all (SURVEY.md section 5 "Tracing /
profiling — none"); this is the TPU-native observability equivalent.

  python tools/profile_train.py [--iters 4] [--batch 1] [--top 25]
  python tools/profile_train.py --infer       # profile simple_test too
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
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


def build(cfg_name="mask_rcnn_3d_2scales.py", batch=1):
    from mrcnn3d.detectors import pipeline as pl
    from mrcnn3d.detectors.build import anchor_cfgs, build_detector
    from mrcnn3d.train.optim import make_optimizer, step_lr_schedule
    from mrcnn3d.train.step import create_train_state, make_train_step
    from mrcnn3d.utils.config import Config

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = Config.fromfile(os.path.join(here, "configs", cfg_name))
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
            lambda v: model.apply(variables, v, method=model.extract_feat), x
        )
        fs = [f.shape[1:4] for f in feats]
        sets.append(pl.build_anchor_set(fs, (hh, ww, 3, dd), ac))
    sched = step_lr_schedule(cfg.optimizer["lr"], [], 100)
    tx = make_optimizer(
        cfg.optimizer, cfg.optimizer_config.get("grad_clip"), sched
    )
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        jnp.zeros((1, 8, 64, 64, 3), jnp.bfloat16), tx,
    )
    train_step = make_train_step(model, tx, cfg, sets)

    def make_batch(key):
        ks = jax.random.split(key, 4)
        b = {}
        for s, (hh, ww, dd) in enumerate([(ch, cw, cd), c2]):
            sfx = "" if s == 0 else "_2"
            f = 1.5 ** s
            b["imgs" + sfx] = jax.random.normal(
                ks[s], (batch, dd, hh, ww, 3), jnp.bfloat16
            )
            x1 = jax.random.uniform(
                ks[2], (batch, max_gt, 1), minval=4, maxval=hh * 0.6
            ) * f
            wsz = jax.random.uniform(
                ks[3], (batch, max_gt, 1), minval=8, maxval=hh * 0.3
            ) * f
            b["gt_boxes" + sfx] = jnp.concatenate(
                [x1, x1, x1 + wsz, x1 + wsz,
                 jnp.full_like(x1, 2.0 * f), jnp.full_like(x1, 14.0 * f)],
                axis=-1,
            )
            b["gt_valid" + sfx] = jnp.ones((batch, max_gt), bool)
            b["gt_labels" + sfx] = jnp.ones((batch, max_gt), jnp.int32)
        b["gt_masks"] = jnp.ones((batch, max_gt, cd, ch, cw), jnp.uint8)
        return b

    return train_step, state, make_batch


def hlo_stats(logdir):
    """Convert the captured xspace into per-op rows (name, cat, self_us)."""
    from xprof.convert import raw_to_tool_data

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        raise RuntimeError(f"no xplane.pb under {logdir}")
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [paths[-1]], "hlo_stats", {}
    )
    if isinstance(data, bytes):
        data = data.decode("utf-8")
    obj = json.loads(data)
    return obj


def summarize(obj, top=25):
    # hlo_stats JSON: list with one table - has 'p' (columns) in gviz
    # format or a flat record list; handle gviz DataTable layout.
    rows = []
    if isinstance(obj, list):
        obj = obj[0]
    cols = [c.get("label", c.get("id", "")) for c in obj.get("cols", [])]
    for r in obj.get("rows", []):
        vals = [c.get("v") for c in r.get("c", [])]
        rows.append(dict(zip(cols, vals)))
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--logdir", default="/tmp/mrcnn3d_profile")
    p.add_argument("--json-out", default=None,
                   help="dump the raw hlo_stats rows as json")
    args = p.parse_args()

    train_step, state, make_batch = build(batch=args.batch)
    b0 = make_batch(jax.random.PRNGKey(7))
    t0 = time.perf_counter()
    state, _ = train_step(state, b0, jax.random.PRNGKey(8))
    jax.block_until_ready(state.params)
    print(f"compile+first step: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    # timed, untraced
    t0 = time.perf_counter()
    for i in range(args.iters):
        state, _ = train_step(
            state, make_batch(jax.random.fold_in(jax.random.PRNGKey(9), i)),
            jax.random.fold_in(jax.random.PRNGKey(10), i),
        )
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / args.iters
    print(f"train_step: {dt*1e3:.1f} ms  ({args.batch} vol-pairs/step, "
          f"{args.batch/dt:.2f} vol-pairs/s)", file=sys.stderr)

    os.makedirs(args.logdir, exist_ok=True)
    jax.profiler.start_trace(args.logdir)
    for i in range(args.iters):
        state, _ = train_step(
            state, make_batch(jax.random.fold_in(jax.random.PRNGKey(11), i)),
            jax.random.fold_in(jax.random.PRNGKey(12), i),
        )
    jax.block_until_ready(state.params)
    jax.profiler.stop_trace()

    obj = hlo_stats(args.logdir)
    rows = summarize(obj)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(rows, f)
    if not rows:
        print("no hlo_stats rows parsed; raw keys:",
              obj if isinstance(obj, dict) else type(obj))
        return

    # normalize keys across xprof versions
    def g(r, *names, default=0.0):
        for n in names:
            if n in r and r[n] is not None:
                return r[n]
        return default

    total = sum(float(g(r, "Total self time (us)", "self_time_us",
                        "Avg. self time (us)")) for r in rows)
    by_cat = {}
    for r in rows:
        cat = g(r, "HLO category", "category", default="?")
        by_cat[cat] = by_cat.get(cat, 0.0) + float(
            g(r, "Total self time (us)", "self_time_us",
              "Avg. self time (us)"))
    print("\n== category rollup ==")
    for cat, us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{us/total*100:6.2f}%  {us/args.iters/1e3:9.2f} ms/step  {cat}")

    rows.sort(key=lambda r: -float(
        g(r, "Total self time (us)", "self_time_us",
          "Avg. self time (us)")))
    print(f"\n== top {args.top} ops by self time ==")
    for r in rows[: args.top]:
        us = float(g(r, "Total self time (us)", "self_time_us",
                     "Avg. self time (us)"))
        cat = g(r, "HLO category", "category", default="?")
        name = str(g(r, "HLO op expression", "HLO op name", "hlo_op_name",
                     "program_id", default="?"))[:140]
        print(f"{us/total*100:6.2f}%  {us/args.iters/1e3:9.3f} ms/step  "
              f"[{cat}]  {name}")


if __name__ == "__main__":
    main()
