#!/usr/bin/env python
"""Multi-level RoIAlign bench: corner-gather vs row-slab formulation.

Pipeline geometry: 4 FPN levels of a 512x512x96 volume, C=64,
strides xy [4,8,16,32] / depth [2,4,8,16], 2000 rois (test budget),
out 7x7x3 (bbox) and 14x14x10 (mask).  Fresh-keyed inputs per iter;
timing via blocking scalar fetch (remote-exec cache safe).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mrcnn3d.ops.roi_align3d import (
    multi_level_roi_align_3d,
    multi_level_roi_align_3d_chunked,
    multi_level_roi_align_3d_rowslab,
)

STRIDES = [4, 8, 16, 32]
DSTRIDES = [2, 4, 8, 16]
H = W = 512
D = 96
C = 64
N = 2000


def make_inputs(seed):
    r = np.random.RandomState(seed)
    feats = [
        jnp.asarray(
            r.randn(1, D // ds, H // s, W // s, C), jnp.bfloat16
        )
        for s, ds in zip(STRIDES, DSTRIDES)
    ]
    x1 = r.uniform(0, W - 110, N)
    y1 = r.uniform(0, H - 110, N)
    z1 = r.uniform(0, D - 24, N)
    rois = jnp.asarray(
        np.stack(
            [np.zeros(N), x1, y1,
             x1 + r.uniform(8, 100, N), y1 + r.uniform(8, 100, N),
             z1, z1 + r.uniform(4, 20, N)], -1,
        ).astype(np.float32)
    )
    valid = jnp.asarray(r.uniform(0, 1, N) < 0.9)
    return feats, rois, valid


def bench(name, fn, inputs, iters=6):
    s = fn(*inputs[0])
    s.block_until_ready()
    t0 = time.perf_counter()
    for i in range(iters):
        s = fn(*inputs[(i % (len(inputs) - 1)) + 1])
        float(s)  # blocking scalar fetch -> real execution
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name}: {dt:.2f} ms", flush=True)
    return dt


def main():
    print("device:", jax.devices()[0])
    inputs = [make_inputs(i) for i in range(4)]

    for (osz, odz, tag) in [(7, 3, "bbox 7x7x3"), (14, 10, "mask 14x14x10")]:
        # mask geometry needs the memory-bounded chunked path (the raw
        # 2000-roi slab with 512-lane packing is ~8 GB)
        gfn = (
            multi_level_roi_align_3d if odz < 10
            else multi_level_roi_align_3d_chunked
        )
        g = jax.jit(
            lambda f, r, v, osz=osz, odz=odz, gfn=gfn: gfn(
                f, r, osz, odz, STRIDES, DSTRIDES, 2, valid=v,
                **({} if gfn is multi_level_roi_align_3d else
                   {"chunk": 64})
            ).astype(jnp.float32).sum()
        )
        rs = jax.jit(
            lambda f, r, v, osz=osz, odz=odz: multi_level_roi_align_3d_rowslab(
                f, r, osz, odz, STRIDES, DSTRIDES, 2, valid=v
            ).astype(jnp.float32).sum()
        )
        # correctness cross-check on one input set (jitted scalar diff)
        f, r, v = inputs[0]
        try:
            err = float(
                jax.jit(
                    lambda f, r, v, osz=osz, odz=odz: jnp.max(jnp.abs(
                        multi_level_roi_align_3d(
                            f, r, osz, odz, STRIDES, DSTRIDES, 2, valid=v
                        ).astype(jnp.float32)
                        - multi_level_roi_align_3d_rowslab(
                            f, r, osz, odz, STRIDES, DSTRIDES, 2, valid=v
                        ).astype(jnp.float32)
                    ))
                )(f, r, v)
            )
            print(f"[{tag}] max |gather - rowslab| = {err:.4f}", flush=True)
        except Exception as e:
            print(f"[{tag}] cross-check failed: {type(e).__name__}", flush=True)
        for name, fn in [("gather", g), ("rowslab", rs)]:
            try:
                bench(f"  {name:7s} {tag}", fn, inputs)
            except Exception as e:
                print(f"  {name:7s} {tag}: FAILED {type(e).__name__}",
                      flush=True)


if __name__ == "__main__":
    main()
