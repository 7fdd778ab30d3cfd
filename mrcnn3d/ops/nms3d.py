"""3-D NMS for TPU.

Two variants exist in the reference with *different* overlap definitions:

1. `nms_3d` — the train/inference-path NMS (reference CUDA kernel
   mmdet/ops/nms/src/nms_kernel.cu:23-33 `devIoU3d` + :196-257
   `nms_cuda_3d`): boxes sorted by score descending, greedy suppression of
   boxes with symmetric volume IoU (+1 extents) > thr.  The GPU 64-bit
   bitmask + host scan is GPU-specific; the TPU-idiomatic formulation is
   an exact fixed-point iteration of the greedy prefix recurrence (see
   nms_3d_mask) — fully jit-compatible, static shapes.

2. `nms_3d_overlap_numpy` — the eval-time patch-merge NMS (reference
   mmdet/ops/nms/nms_wrapper.py:84-140 `nms_3d_python`, duplicated at
   mmdet/core/evaluation/coco_utils.py:245-282): overlap is intersection /
   volume-of-the-*other* box (asymmetric), used at thr 0.1 to merge
   predictions across patches/scales.  Host-side numpy, exact port of
   semantics (not code).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .box3d import bbox_overlaps_3d


def nms_3d_mask(boxes, scores, valid, iou_thr):
    """Greedy hard NMS over a fixed-size box array — exact, TPU-parallel.

    Greedy NMS is the unique fixed point of the prefix recurrence
      kept[i] = valid[i] and not exists j < i : kept[j] and iou[j,i] > thr.
    Instead of the GPU bitmask + host scan (reference nms_kernel.cu:81-129,
    :238-249) or a K-step sequential loop, we Jacobi-iterate the
    recurrence: each sweep is one K x K masked matrix-vector product on
    the VPU, and sweep t fixes all boxes whose suppression-chain depth is
    <= t, so the while_loop converges to the exact greedy solution in
    chain-depth iterations (single digits in practice, bounded by K).

    Args:
      boxes: (K, 6) [x1,y1,x2,y2,z1,z2].
      scores: (K,) float.
      valid: (K,) bool — padding mask; invalid boxes never kept.
      iou_thr: python float.

    Returns:
      keep: (K,) bool mask in the *input* order.
    """
    k = boxes.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    masked_scores = jnp.where(valid, scores, neg_inf)
    order = jnp.argsort(-masked_scores)
    sboxes = boxes[order]
    svalid = valid[order]

    iou = bbox_overlaps_3d(sboxes, sboxes)
    idx = jnp.arange(k)
    # suppress[j, i]: earlier box j can suppress later box i
    suppress = (iou > iou_thr) & (idx[:, None] < idx[None, :])
    suppress_f = suppress.astype(jnp.float32)

    def cond(state):
        alive, prev, it = state
        return jnp.any(alive != prev) & (it < k)

    def body(state):
        alive, _, it = state
        hit = (
            jnp.einsum(
                "ji,j->i", suppress_f, alive.astype(jnp.float32)
            )
            > 0.0
        )
        return svalid & ~hit, alive, it + 1

    first = svalid & ~(
        jnp.einsum("ji,j->i", suppress_f, svalid.astype(jnp.float32)) > 0.0
    )
    alive, _, _ = jax.lax.while_loop(
        cond, body, (first, svalid, jnp.asarray(1))
    )
    keep = jnp.zeros((k,), bool).at[order].set(alive)
    return keep


@functools.partial(jax.jit, static_argnames=("iou_thr", "max_out"))
def nms_3d(boxes, scores, valid, iou_thr, max_out):
    """NMS returning top `max_out` survivors sorted by score descending.

    Returns (boxes (max_out, 6), scores (max_out,), valid (max_out,) bool).
    Padded entries have score -inf and zero boxes.
    """
    keep = nms_3d_mask(boxes, scores, valid, iou_thr)
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    kept_scores = jnp.where(keep, scores, neg_inf)
    topk_scores, topk_idx = jax.lax.top_k(kept_scores, max_out)
    out_valid = topk_scores > neg_inf
    out_boxes = jnp.where(out_valid[:, None], boxes[topk_idx], 0.0)
    return out_boxes, topk_scores, out_valid


def nms_3d_overlap_numpy(dets, iou_thr):
    """Eval-merge NMS: asymmetric overlap = inter / vol(other).

    dets: (N, 7) numpy [x1,y1,x2,y2,z1,z2,score].
    Returns list of kept indices (highest score first), matching the
    reference `nms_3d_python` pick order.
    """
    dets = np.asarray(dets)
    if dets.shape[0] == 0:
        return []
    x1, y1, x2, y2, z1, z2, probs = (dets[:, i] for i in range(7))
    idxs = np.argsort(probs)
    areas = (x2 - x1 + 1) * (y2 - y1 + 1) * (z2 - z1 + 1)
    pick = []
    while len(idxs) > 0:
        last = len(idxs) - 1
        i = idxs[last]
        pick.append(int(i))
        rest = idxs[:last]
        xx1 = np.maximum(x1[i], x1[rest])
        yy1 = np.maximum(y1[i], y1[rest])
        zz1 = np.maximum(z1[i], z1[rest])
        xx2 = np.minimum(x2[i], x2[rest])
        yy2 = np.minimum(y2[i], y2[rest])
        zz2 = np.minimum(z2[i], z2[rest])
        w = np.maximum(0, xx2 - xx1 + 1)
        h = np.maximum(0, yy2 - yy1 + 1)
        d = np.maximum(0, zz2 - zz1 + 1)
        overlap = (w * h * d) / areas[rest]
        idxs = np.delete(
            idxs, np.concatenate(([last], np.where(overlap > iou_thr)[0]))
        )
    return pick


def nms_3d_numpy(dets, iou_thr):
    """Symmetric-IoU greedy NMS oracle (matches `nms_3d` / CUDA semantics).

    dets: (N, 7) numpy. Returns kept indices in descending-score order.
    Used as the test oracle for the jit kernel.
    """
    dets = np.asarray(dets, np.float32)
    if dets.shape[0] == 0:
        return []
    order = np.argsort(-dets[:, 6], kind="stable")
    boxes = dets[order, :6]
    w = boxes[:, 2] - boxes[:, 0] + 1
    h = boxes[:, 3] - boxes[:, 1] + 1
    d = boxes[:, 5] - boxes[:, 4] + 1
    vol = w * h * d
    n = len(order)
    alive = np.ones(n, bool)
    keep = []
    for i in range(n):
        if not alive[i]:
            continue
        keep.append(int(order[i]))
        xx1 = np.maximum(boxes[i, 0], boxes[i + 1:, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[i + 1:, 1])
        zz1 = np.maximum(boxes[i, 4], boxes[i + 1:, 4])
        xx2 = np.minimum(boxes[i, 2], boxes[i + 1:, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[i + 1:, 3])
        zz2 = np.minimum(boxes[i, 5], boxes[i + 1:, 5])
        inter = (
            np.maximum(0, xx2 - xx1 + 1)
            * np.maximum(0, yy2 - yy1 + 1)
            * np.maximum(0, zz2 - zz1 + 1)
        )
        iou = inter / (vol[i] + vol[i + 1:] - inter)
        alive[i + 1:] &= ~(iou > iou_thr)
    return keep


def soft_nms_3d_numpy(dets, iou_thr=0.3, method="linear", sigma=0.5,
                      min_score=1e-3):
    """Soft-NMS with linear/gaussian score decay (host-side numpy).

    Capability parity with the reference's Cython soft_nms_cpu
    (mmdet/ops/nms/src/soft_nms_cpu.pyx, gated behind a breakpoint and
    2-D only there) — here implemented for 6-DoF boxes with symmetric
    volume IoU.  dets (N, 7); returns (new_dets, kept_original_indices).
    """
    dets = np.asarray(dets, np.float32).copy()
    n = dets.shape[0]
    idxs = np.arange(n)
    out, out_idx = [], []
    while len(dets):
        top = int(np.argmax(dets[:, 6]))
        best = dets[top].copy()
        out.append(best)
        out_idx.append(int(idxs[top]))
        dets = np.delete(dets, top, axis=0)
        idxs = np.delete(idxs, top)
        if not len(dets):
            break
        xa = np.maximum(best[0], dets[:, 0])
        ya = np.maximum(best[1], dets[:, 1])
        za = np.maximum(best[4], dets[:, 4])
        xb = np.minimum(best[2], dets[:, 2])
        yb = np.minimum(best[3], dets[:, 3])
        zb = np.minimum(best[5], dets[:, 5])
        inter = (
            np.maximum(0, xb - xa + 1)
            * np.maximum(0, yb - ya + 1)
            * np.maximum(0, zb - za + 1)
        )
        va = (best[2] - best[0] + 1) * (best[3] - best[1] + 1) * (
            best[5] - best[4] + 1
        )
        vb = (
            (dets[:, 2] - dets[:, 0] + 1)
            * (dets[:, 3] - dets[:, 1] + 1)
            * (dets[:, 5] - dets[:, 4] + 1)
        )
        iou = inter / (va + vb - inter)
        if method == "linear":
            decay = np.where(iou > iou_thr, 1.0 - iou, 1.0)
        elif method == "gaussian":
            decay = np.exp(-(iou**2) / sigma)
        else:  # naive -> hard nms
            decay = (iou <= iou_thr).astype(np.float32)
        dets[:, 6] *= decay
        keep = dets[:, 6] >= min_score
        dets = dets[keep]
        idxs = idxs[keep]
    return np.stack(out) if out else np.zeros((0, 7), np.float32), out_idx
