#!/usr/bin/env python
"""Per-conv MXU-efficiency shootout for the flagship backbone+FPN.

The round-4 inference profile (PROFILE.md) put the convolution core at
46% of the bbox step after the Pallas-align dispatch, at ~11% MXU
efficiency — the width-16 reference backbone underfills the 128-lane
MXU.  This tool answers, with real-chip numbers, *which* convs burn the
time and whether a space-to-depth (s2d) reformulation — fold 2x2 xy
blocks into channels, quartering the grid and 4x-ing the channel count,
the standard TPU recipe for narrow-channel conv nets — would pay.

Usage:
  python tools/bench_convs.py            # real chip
  python tools/bench_convs.py --smoke    # tiny shapes, any backend

Outputs one line per conv shape found in the flagship jaxpr:
  grid Cin Cout kernel stride  ms  GFLOP  eff%
plus an s2d-equivalent timing for the dominant 3x3x3 stage convs.
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

# the axon sitecustomize pins jax_platforms regardless of env; honor an
# explicit JAX_PLATFORMS (CPU smoke runs) like conftest does
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def conv_inventory(fn, *args):
    """All conv_general_dilated calls in fn's jaxpr: (lhs, rhs, window
    strides, padding, counts)."""
    jaxpr = jax.make_jaxpr(fn)(*args)
    out = {}

    def walk(jx):
        for eqn in jx.eqns:
            if eqn.primitive.name == "conv_general_dilated":
                lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
                key = (
                    tuple(lhs.shape), tuple(rhs.shape),
                    tuple(eqn.params["window_strides"]),
                    str(lhs.dtype),
                )
                out[key] = out.get(key, 0) + 1
            for sub in eqn.params.values():
                if hasattr(sub, "jaxpr"):
                    walk(sub.jaxpr)
                elif isinstance(sub, (list, tuple)):
                    for s in sub:
                        if hasattr(s, "jaxpr"):
                            walk(s.jaxpr)
    walk(jaxpr.jaxpr)
    return out


def time_fn(f, *xs, iters=6):
    """Per-iter timing via a BLOCKING SCALAR FETCH of a sum over f's
    output.  Three remote-exec pitfalls this works around, all measured
    on the axon stack: (1) repeated identical executions are served
    from a result cache (unique eps per iter, large enough to survive
    bf16 rounding — 1e-6 on ~N(0,1) rounds back bit-identical); (2)
    jax.block_until_ready returns without awaiting remote completion
    (0.02 ms for a 1.37 TFLOP conv); (3) back-to-back async launches
    queue without executing.  float(scalar) is the only sync primitive
    observed to reliably wait here.  The added reduce costs one
    bandwidth pass — fine for relative comparisons."""
    g = jax.jit(lambda *a: jnp.sum(f(*a).astype(jnp.float32)))
    variants = []
    for i in range(4):
        eps = jnp.asarray(0.01 * (i + 1), xs[0].dtype)
        variants.append((xs[0] + eps,) + xs[1:])
    jax.block_until_ready(variants)
    float(g(*variants[0]))  # compile + warm
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(g(*variants[i % len(variants)]))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def conv_flops(lhs, rhs, strides):
    # NDHWC x DHWIO
    n, d, h, w, cin = lhs
    kd, kh, kw, _, cout = rhs
    od = -(-d // strides[0])
    oh = -(-h // strides[1])
    ow = -(-w // strides[2])
    return 2 * n * od * oh * ow * cout * kd * kh * kw * cin


PEAK = {"bfloat16": 197e12, "float32": 49e12}


def bench_conv(lhs, rhs, strides, dtype, iters=10):
    pad = [((k - 1) // 2, (k - 1) // 2) for k in rhs[:3]]
    x = jax.random.normal(jax.random.PRNGKey(0), lhs, dtype)
    k = jax.random.normal(jax.random.PRNGKey(1), rhs, dtype)

    @jax.jit
    def f(x, k):
        return jax.lax.conv_general_dilated(
            x, k, strides, pad,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32,
        )

    t = time_fn(f, x, k, iters=iters)
    fl = conv_flops(lhs, rhs, strides)
    return t, fl


def s2d_pack(x):
    """(N, D, H, W, C) -> (N, D, H/2, W/2, 4C): fold 2x2 xy blocks."""
    n, d, h, w, c = x.shape
    x = x.reshape(n, d, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)
    return x.reshape(n, d, h // 2, w // 2, 4 * c)


def s2d_kernel(k):
    """Exact s2d twin of a stride-1 3x3x3 kernel: (3,3,3,I,O) ->
    (3,2,2,4I,4O) in block space.  Output phase (py,px) at block (by,bx)
    reads input phase (py+dy)%2 at block by+(py+dy)//2 — fold the phase
    into channels and scatter taps into a 2-wide block kernel per
    output phase (plus one block offset, absorbed by using a 2-tap
    kernel with asymmetric padding per phase; here we emit the padded
    3-tap form with zero taps for simplicity/exactness)."""
    kd, kh, kw, ci, co = k.shape
    assert (kh, kw) == (3, 3)
    out = np.zeros((kd, 3, 3, 4 * ci, 4 * co), k.dtype)
    for py in range(2):
        for px in range(2):
            for dy in range(-1, 2):
                for dx in range(-1, 2):
                    sy, sx = py + dy, px + dx
                    by, iy = sy // 2 + 1, sy % 2
                    bx, ix = sx // 2 + 1, sx % 2
                    # input channel block (iy,ix), output block (py,px)
                    out[:, by, bx,
                        (iy * 2 + ix) * ci:(iy * 2 + ix + 1) * ci,
                        (py * 2 + px) * co:(py * 2 + px + 1) * co] = (
                        k[:, dy + 1, dx + 1]
                    )
    return jnp.asarray(out)


def bench_s2d_equiv(lhs, rhs, dtype, iters=10, check=False):
    """Time the s2d twin of a stride-1 3x3x3 conv and (optionally)
    verify exactness against the plain conv."""
    x = jax.random.normal(jax.random.PRNGKey(0), lhs, dtype)
    k = jax.random.normal(jax.random.PRNGKey(1), rhs, dtype)
    k2 = s2d_kernel(np.asarray(k))

    @jax.jit
    def f2(xp, k2):
        return jax.lax.conv_general_dilated(
            xp, k2, (1, 1, 1),
            [(1, 1), (1, 1), (1, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32,
        )

    xp = s2d_pack(x)
    t = time_fn(f2, xp, k2, iters=iters)
    if check:
        @jax.jit
        def f1(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1, 1), [(1, 1), (1, 1), (1, 1)],
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.float32,
            )
        ref = s2d_pack(f1(x, k))
        got = f2(xp, k2)
        err = float(jnp.max(jnp.abs(ref - got)))
        scale = float(jnp.max(jnp.abs(ref))) or 1.0
        assert err / scale < 2e-2, (err, scale)
    return t


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    from mrcnn3d.detectors.build import build_detector
    from mrcnn3d.utils.config import Config

    cfg = Config.fromfile(
        os.path.join(os.path.dirname(__file__), "..",
                     "configs", "mask_rcnn_3d_2scales.py")
    )
    # bf16 like bench.py — the inventory must match the benched program
    model = build_detector(cfg, dtype=jnp.bfloat16)
    if args.smoke:
        shapes = [(1, 16, 64, 64, 3), (1, 24, 96, 96, 3)]
    else:
        shapes = [(1, 64, 512, 512, 3), (1, 96, 768, 768, 3)]

    rng = jax.random.PRNGKey(0)
    xs = [jnp.zeros(s, jnp.bfloat16) for s in shapes]
    variables = jax.jit(model.init)(rng, xs[0][:, :8, :64, :64, :])

    def fwd(x1, x2):
        return [
            model.apply(variables, x, method=model.extract_feat)
            for x in (x1, x2)
        ]

    inv = conv_inventory(fwd, xs[0], xs[1])
    rows = []
    for (lhs, rhs, strides, dtype), count in sorted(
        inv.items(), key=lambda kv: -conv_flops(*kv[0][:3]) * kv[1]
    ):
        t, fl = bench_conv(lhs, rhs, strides, dtype, iters=args.iters)
        eff = fl / t / PEAK.get(dtype, 197e12)
        rows.append((lhs, rhs, strides, dtype, count, t, fl, eff))
        print(
            f"{count:2d}x grid={lhs[1:]} k={rhs[:3]} io={rhs[3]}->"
            f"{rhs[4]} s={strides} {dtype}: {t*1e3:7.2f} ms  "
            f"{fl/1e9:7.1f} GF  eff {eff*100:5.1f}%"
        )
    tot_t = sum(r[4] * r[5] for r in rows)
    tot_f = sum(r[4] * r[6] for r in rows)
    print(f"TOTAL conv (both pathways, serial-isolated): "
          f"{tot_t*1e3:.1f} ms, {tot_f/1e9:.0f} GFLOP, "
          f"agg eff {tot_f/tot_t/197e12*100:.1f}%")

    # s2d candidates: the stride-1 3x3x3 stage convs
    print("\n-- s2d twins (fold 2x2 xy into channels, exact) --")
    for (lhs, rhs, strides, dtype), count in sorted(
        inv.items(), key=lambda kv: -conv_flops(*kv[0][:3]) * kv[1]
    ):
        if rhs[:3] != (3, 3, 3) or strides != (1, 1, 1):
            continue
        if lhs[2] % 2 or lhs[3] % 2:
            continue
        t1, fl = bench_conv(lhs, rhs, strides, dtype, iters=args.iters)
        t2 = bench_s2d_equiv(lhs, rhs, dtype, iters=args.iters,
                             check=args.smoke)
        print(
            f"{count:2d}x grid={lhs[1:]} io={rhs[3]}->{rhs[4]}: "
            f"plain {t1*1e3:7.2f} ms vs s2d {t2*1e3:7.2f} ms "
            f"({t1/t2:.2f}x)  [s2d FLOPs 4x: kernel 3x3x3 half-zero "
            f"taps over 4x channels]"
        )


if __name__ == "__main__":
    main()
