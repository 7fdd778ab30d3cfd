#!/usr/bin/env python
"""Op-level micro-benchmarks (NMS, RoIAlign XLA vs Pallas, stem conv).

Each op runs on freshly-keyed on-device inputs every iteration — the
remote-execution stack can serve repeated identical executions from a
cache, which fakes timings (see TECHNICAL_DETAILS.md).

  python tools/bench_ops.py [--n-rois 1024] [--iters 8]
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

# the axon sitecustomize pins jax_platforms to "axon,cpu" regardless of
# env; honor an explicit JAX_PLATFORMS (CPU smoke runs) like conftest
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def bench(name, fn, inputs, iters):
    out = fn(*inputs[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*inputs[i % len(inputs)])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name}: {dt:.2f} ms")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-rois", type=int, default=1024)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--hw", type=int, default=512,
                   help="input H=W for the multi-level section "
                        "(shrink for CPU smoke tests)")
    p.add_argument("--ml-rois", type=int, default=2000)
    args = p.parse_args()

    from mrcnn3d.models.resnet3d import stem_conv_s2d
    from mrcnn3d.ops.nms3d import nms_3d_mask
    from mrcnn3d.ops.nms3d_pallas import nms_3d_mask_pallas
    from mrcnn3d.ops.roi_align3d import roi_align_3d
    from mrcnn3d.ops.roi_align3d_pallas import roi_align_3d_pallas

    rng = np.random.RandomState(0)
    n = args.n_rois

    # ---- NMS @ 2000 boxes ----
    def make_dets(seed):
        r = np.random.RandomState(seed)
        x1 = r.uniform(0, 400, 2000)
        y1 = r.uniform(0, 400, 2000)
        z1 = r.uniform(0, 50, 2000)
        boxes = np.stack(
            [x1, y1, x1 + r.uniform(4, 40, 2000),
             y1 + r.uniform(4, 40, 2000), z1,
             z1 + r.uniform(2, 12, 2000)], -1,
        ).astype(np.float32)
        return (
            jnp.asarray(boxes),
            jnp.asarray(r.uniform(0, 1, 2000).astype(np.float32)),
            jnp.ones(2000, bool),
        )

    dets = [make_dets(i) for i in range(3)]
    bench(
        "nms xla fixed-point (2000)",
        jax.jit(lambda b, s, v: nms_3d_mask(b, s, v, 0.7)),
        dets,
        args.iters,
    )
    bench(
        "nms pallas scan (2000)",
        jax.jit(lambda b, s, v: nms_3d_mask_pallas(
            b, s, v, 0.7, interpret=jax.default_backend() != "tpu"
        )),
        dets,
        args.iters,
    )

    # ---- RoIAlign @ level-0 geometry ----
    feats = [
        jnp.asarray(rng.randn(1, 32, 256, 256, 64), jnp.bfloat16)
        for _ in range(2)
    ]
    x1 = rng.uniform(0, 400, n)
    y1 = rng.uniform(0, 400, n)
    z1 = rng.uniform(0, 40, n)
    rois = jnp.asarray(
        np.stack(
            [np.zeros(n), x1, y1, x1 + rng.uniform(8, 100, n),
             y1 + rng.uniform(8, 100, n), z1,
             z1 + rng.uniform(4, 20, n)], -1,
        ).astype(np.float32)
    )
    bench(
        f"roi_align xla gather ({n} rois)",
        jax.jit(lambda f: roi_align_3d(f, rois, 7, 3, 0.25, 0.5, 2)),
        [(f,) for f in feats],
        args.iters,
    )
    bench(
        f"roi_align pallas crop ({n} rois)",
        jax.jit(
            lambda f: roi_align_3d_pallas(
                f, rois, 7, 3, 0.25, 0.5, 2, max_d=16, max_hw=32,
                interpret=jax.default_backend() != "tpu",
            )
        ),
        [(f,) for f in feats],
        args.iters,
    )

    # ---- multi-level RoIAlign at the REAL bbox/mask stage geometry ----
    # (512x512x64 input -> 4 FPN levels, strides [4,8,16,32] /
    # depth [2,4,8,16], C=64 bf16, full 2000-roi budget): the three
    # backends the pipeline can dispatch to.
    from mrcnn3d.ops.roi_align3d import (
        multi_level_roi_align_3d_chunked,
        multi_level_roi_align_3d_xfirst_chunked,
    )
    from mrcnn3d.ops.roi_align3d_pallas import (
        multi_level_roi_align_3d_pallas,
    )

    strides = [4, 8, 16, 32]
    dstrides = [2, 4, 8, 16]
    hw = args.hw
    dep = max(hw // 8, 16)
    lv = [
        jnp.asarray(
            rng.randn(1, max(dep // dz, 1), max(hw // s, 4),
                      max(hw // s, 4), 64),
            jnp.bfloat16,
        )
        for s, dz in zip(strides, dstrides)
    ]
    m = args.ml_rois
    x1 = rng.uniform(0, hw * 0.94, m)
    y1 = rng.uniform(0, hw * 0.94, m)
    z1 = rng.uniform(0, dep * 0.8, m)
    sz = rng.uniform(4, 60, m)  # mostly level-0/1 rois, like microbleeds
    mrois = jnp.asarray(
        np.stack(
            [np.zeros(m), x1, y1, x1 + sz, y1 + sz, z1,
             z1 + rng.uniform(2, 12, m)], -1,
        ).astype(np.float32)
    )
    mvalid = jnp.ones(m, bool)
    for tag, (osz, odz) in (("bbox 7x7x3", (7, 3)),
                            ("mask 14x14x10", (14, 10))):
        bench(
            f"mlroi gather-chunked {tag} ({m} rois)",
            jax.jit(
                lambda f, o=osz, z=odz: multi_level_roi_align_3d_chunked(
                    list(f), mrois, o, z, strides, dstrides, 2,
                    valid=mvalid, chunk=256,
                )
            ),
            [(tuple(lv),)],
            args.iters,
        )
        bench(
            f"mlroi xfirst {tag} ({m} rois)",
            jax.jit(
                # chunked as in the product path: the unchunked (m, out,
                # D, H, C) t1 intermediate OOMs HBM at mask geometry
                lambda f, o=osz, z=odz:
                multi_level_roi_align_3d_xfirst_chunked(
                    list(f), mrois, o, z, strides, dstrides, 2,
                    valid=mvalid, chunk=256,
                )
            ),
            [(tuple(lv),)],
            args.iters,
        )
        bench(
            f"mlroi pallas-crop {tag} ({m} rois)",
            jax.jit(
                lambda f, o=osz, z=odz: multi_level_roi_align_3d_pallas(
                    list(f), mrois, o, z, strides, dstrides, 2,
                    valid=mvalid, max_d=16, max_hw=32,
                    interpret=jax.default_backend() != "tpu",
                )
            ),
            [(tuple(lv),)],
            args.iters,
        )

    # ---- stem conv ----
    xs = [
        jnp.asarray(rng.randn(1, 64, 512, 512, 3), jnp.bfloat16)
        for _ in range(2)
    ]
    w7 = jnp.asarray(rng.randn(7, 7, 7, 3, 16) * 0.01, jnp.bfloat16)
    bench(
        "stem s2d 7^3 s(1,2,2) @64x512x512",
        jax.jit(lambda x: stem_conv_s2d(x, w7)),
        [(x,) for x in xs],
        args.iters,
    )


if __name__ == "__main__":
    main()
