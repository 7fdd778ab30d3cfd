#!/usr/bin/env python
"""Phase-level timing of the whole-volume tiled driver (bench config 3).

Drives the REAL `apis.tiled.tiled_inference` with its `timers` hook, so
the phase table cannot drift from the shipping driver (the previous
version replicated the internals by hand and went stale the first time
the driver changed).  Reports cold (upload + sweep compile) and warm
(cached device volume + compiled sweep) runs, per-phase.

  python tools/profile_tiled.py            # real chip, bench geometry
  python tools/profile_tiled.py --smoke    # tiny, any backend
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--max-dets", type=int, default=256)
    args = p.parse_args()

    from mrcnn3d.apis.tiled import tiled_inference
    from mrcnn3d.detectors.build import build_detector
    from mrcnn3d.utils.config import Config

    here = os.path.join(os.path.dirname(__file__), "..")
    cfg = Config.fromfile(
        os.path.join(here, "configs", "mask_rcnn_3d_2scales.py")
    )
    cfg.test_cfg["return_bbox_only"] = False

    if args.smoke:
        wv_d, wv_h = 48, 64
        d, hw = 16, 32
        # narrow model + trimmed budget: the flagship-width 2000-slot
        # program is a multi-minute compile on a 1-core CPU box and
        # proves nothing extra about the driver phases
        cfg.model["backbone"]["depth"] = 18
        cfg.model["backbone"]["base_width"] = 8
        cfg.model["neck"]["out_channels"] = 16
        for hk in ("bbox_head", "refinement_head"):
            cfg.model[hk]["fc_out_channels"] = 64
        for hk in ("mask_head", "refinement_mask_head"):
            cfg.model[hk]["num_convs"] = 1
        for k in ("nms_pre", "nms_post", "max_num"):
            cfg.test_cfg["rpn"][k] = 64
        cfg.test_cfg["rcnn"]["max_per_img"] = 64
        args.max_dets = min(args.max_dets, 32)
    else:
        wv_d, wv_h = 240, 512
        d, hw = 64, 512

    # bf16 like bench.py: the f32 program OOMs the v5e at this geometry
    model = build_detector(cfg, dtype=jnp.bfloat16)

    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(
        rng, jnp.zeros((1, 8, 64, 64, 3), jnp.bfloat16)
    )
    jax.block_until_ready(variables)
    print("init done", flush=True)

    # host float32 volume as loaded from disk; twin derived on device
    wv1 = np.asarray(
        jax.random.normal(
            jax.random.PRNGKey(16), (wv_d, wv_h, wv_h, 3), jnp.bfloat16
        ),
        np.float32,
    )
    sample = {"imgs": wv1}

    for label in ("cold", "warm"):
        T = {}
        t0 = time.perf_counter()
        tiled_inference(
            cfg, model, variables, sample, patch_hw=hw, patch_d=d,
            max_dets_per_tile=args.max_dets, timers=T,
        )
        total = time.perf_counter() - t0
        print(f"--- {label} run: total {total:.2f} s ---", flush=True)
        accounted = 0.0
        for k, v in T.items():
            if k.startswith("n_"):
                print(f"{k:28s} {v}")
            else:
                print(f"{k:28s} {v:8.2f} s")
                accounted += v
        print(f"{'(unaccounted)':28s} {total - accounted:8.2f} s")
        T["total"] = round(total, 2)
        print(json.dumps({f"{label}_{k}": (round(v, 3)
                          if isinstance(v, float) else v)
                          for k, v in T.items()}), flush=True)


if __name__ == "__main__":
    main()
