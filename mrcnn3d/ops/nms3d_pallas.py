"""Pallas TPU kernel for greedy 3-D NMS.

The XLA formulation (ops/nms3d.nms_3d_mask) materialises the K x K IoU
matrix in HBM and re-reads it on every fixed-point sweep.  This kernel
keeps everything in VMEM: boxes live as an (8, K) coordinate-major tile,
and a single sequential scan over score-sorted boxes updates an alive
vector in place — the exact greedy semantics of the reference CUDA kernel
(mmdet/ops/nms/src/nms_kernel.cu devIoU3d + host scan) in one kernel
launch with zero HBM round-trips.

Sorting by score and un-permuting the keep mask happen outside (XLA
top-k/argsort are fine there).  Falls back transparently when Pallas is
unavailable (CPU tests run the interpreter).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_scan_kernel(boxes_s_ref, boxes_ref, valid_ref, thr_ref, keep_ref):
    """boxes_ref: (8, K) VMEM [x1,y1,x2,y2,z1,z2,pad,pad]; boxes_s_ref:
    the same array in SMEM (dynamic per-box scalar reads); valid (1, K)
    f32; thr (1, 1) f32 SMEM; keep (1, K) f32 out (the alive vector)."""
    k = boxes_ref.shape[1]
    thr = thr_ref[0, 0]

    x1 = boxes_ref[0, :]
    y1 = boxes_ref[1, :]
    x2 = boxes_ref[2, :]
    y2 = boxes_ref[3, :]
    z1 = boxes_ref[4, :]
    z2 = boxes_ref[5, :]
    vol = (x2 - x1 + 1.0) * (y2 - y1 + 1.0) * (z2 - z1 + 1.0)
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)[0]

    keep_ref[0, :] = valid_ref[0, :]

    def body(i, _):
        bx1 = boxes_s_ref[0, i]
        by1 = boxes_s_ref[1, i]
        bx2 = boxes_s_ref[2, i]
        by2 = boxes_s_ref[3, i]
        bz1 = boxes_s_ref[4, i]
        bz2 = boxes_s_ref[5, i]
        bvol = (bx2 - bx1 + 1.0) * (by2 - by1 + 1.0) * (bz2 - bz1 + 1.0)

        ix = jnp.minimum(bx2, x2) - jnp.maximum(bx1, x1) + 1.0
        iy = jnp.minimum(by2, y2) - jnp.maximum(by1, y1) + 1.0
        iz = jnp.minimum(bz2, z2) - jnp.maximum(bz1, z1) + 1.0
        inter = (
            jnp.maximum(ix, 0.0) * jnp.maximum(iy, 0.0) * jnp.maximum(iz, 0.0)
        )
        iou = inter / (bvol + vol - inter)

        alive = keep_ref[0, :]
        # alive[i] via masked reduce (dynamic lane reads don't lower)
        is_alive = jnp.max(jnp.where(idx == i, alive, 0.0)) > 0.5
        suppress = is_alive & (iou > thr) & (idx > i)
        keep_ref[0, :] = jnp.where(suppress, 0.0, alive)
        return 0

    jax.lax.fori_loop(0, k, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def nms_3d_mask_pallas(boxes, scores, valid, iou_thr, interpret=False):
    """Drop-in equivalent of ops.nms3d.nms_3d_mask via the Pallas kernel.

    boxes (K, 6), scores (K,), valid (K,) bool -> keep (K,) bool in input
    order.  K is padded to a multiple of 128 internally.
    """
    k = boxes.shape[0]
    kp = -(-k // 128) * 128
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    masked = jnp.where(valid, scores, neg_inf)
    order = jnp.argsort(-masked)
    sboxes = boxes[order].astype(jnp.float32)
    svalid = valid[order]

    boxes_t = jnp.zeros((8, kp), jnp.float32)
    boxes_t = boxes_t.at[:6, :k].set(sboxes.T)
    valid_f = jnp.zeros((1, kp), jnp.float32).at[0, :k].set(
        svalid.astype(jnp.float32)
    )
    thr = jnp.asarray(iou_thr, jnp.float32).reshape(1, 1)

    keep_f = pl.pallas_call(
        _nms_scan_kernel,
        out_shape=jax.ShapeDtypeStruct((1, kp), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(boxes_t, boxes_t, valid_f, thr)

    alive = keep_f[0, :k] > 0.5
    return jnp.zeros((k,), bool).at[order].set(alive)
