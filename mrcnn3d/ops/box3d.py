"""6-DoF box geometry and delta codecs (pure jnp, jit/vmap friendly).

Semantics match the reference implementation bit-for-bit where it matters:
  * legacy "+1 extent" box convention: w = x2 - x1 + 1 (reference
    mmdet/core/bbox/transforms.py:34-65, geometry.py:49-60)
  * z is encoded as (center, log-depth) exactly like x/y
    (reference transforms.py:43-44: pzmin = (z1+z2)/2, pzmax = z2-z1+1)
  * delta clamping reuses the xy wh_ratio_clip for depth
    (reference transforms.py:124: max_d_ratio = |log(wh_ratio_clip)|)

Boxes are (..., 6) arrays laid out [x1, y1, x2, y2, z1, z2].
Deltas are (..., 6) arrays laid out [dx, dy, dw, dh, dz, dd].
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Default codec normalisation (reference config target_means/target_stds).
DELTA_MEANS = (0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
DELTA_STDS = (1.0, 1.0, 1.0, 1.0, 1.0, 1.0)


def box_volume(boxes):
    """Volume with +1 extents; boxes (..., 6)."""
    w = boxes[..., 2] - boxes[..., 0] + 1.0
    h = boxes[..., 3] - boxes[..., 1] + 1.0
    d = boxes[..., 5] - boxes[..., 4] + 1.0
    return w * h * d


def bbox2delta3d(proposals, gt, means=DELTA_MEANS, stds=DELTA_STDS):
    """Encode gt boxes as regression deltas w.r.t. proposals.

    Reference: mmdet/core/bbox/transforms.py:34-65 (bbox2delta3d).
    proposals, gt: (..., 6).  Returns (..., 6) deltas.
    """
    proposals = proposals.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = proposals[..., 2] - proposals[..., 0] + 1.0
    ph = proposals[..., 3] - proposals[..., 1] + 1.0
    pz = (proposals[..., 4] + proposals[..., 5]) * 0.5
    pd = proposals[..., 5] - proposals[..., 4] + 1.0

    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    gw = gt[..., 2] - gt[..., 0] + 1.0
    gh = gt[..., 3] - gt[..., 1] + 1.0
    gz = (gt[..., 4] + gt[..., 5]) * 0.5
    gd = gt[..., 5] - gt[..., 4] + 1.0

    deltas = jnp.stack(
        [
            (gx - px) / pw,
            (gy - py) / ph,
            jnp.log(gw / pw),
            jnp.log(gh / ph),
            (gz - pz) / pd,
            jnp.log(gd / pd),
        ],
        axis=-1,
    )
    means = jnp.asarray(means, jnp.float32)
    stds = jnp.asarray(stds, jnp.float32)
    return (deltas - means) / stds


def delta2bbox3d(
    rois,
    deltas,
    means=DELTA_MEANS,
    stds=DELTA_STDS,
    max_shape=None,
    wh_ratio_clip=16.0 / 1000.0,
):
    """Decode regression deltas into boxes.

    Reference: mmdet/core/bbox/transforms.py:105-160 (delta2bbox3D).
    rois: (N, 6); deltas: (N, 6*K) for K classes.  Returns (N, 6*K).
    max_shape: (H, W, ?, D) — xy clamped to [0, max_shape[1|0]-1], z to
    [0, max_shape[3]-1], mirroring the reference's img_shape indexing.
    """
    k = deltas.shape[-1] // 6
    means = jnp.tile(jnp.asarray(means, jnp.float32), k)
    stds = jnp.tile(jnp.asarray(stds, jnp.float32), k)
    den = deltas * stds + means
    dx, dy = den[..., 0::6], den[..., 1::6]
    dw, dh = den[..., 2::6], den[..., 3::6]
    dz, dd = den[..., 4::6], den[..., 5::6]

    max_ratio = float(np.abs(np.log(wh_ratio_clip)))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)
    dz = jnp.clip(dz, -max_ratio, max_ratio)
    dd = jnp.clip(dd, -max_ratio, max_ratio)

    px = ((rois[..., 0] + rois[..., 2]) * 0.5)[..., None]
    py = ((rois[..., 1] + rois[..., 3]) * 0.5)[..., None]
    pz = ((rois[..., 4] + rois[..., 5]) * 0.5)[..., None]
    pw = (rois[..., 2] - rois[..., 0] + 1.0)[..., None]
    ph = (rois[..., 3] - rois[..., 1] + 1.0)[..., None]
    pd = (rois[..., 5] - rois[..., 4] + 1.0)[..., None]

    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    gd = pd * jnp.exp(dd)
    gx = px + pw * dx
    gy = py + ph * dy
    gz = pz + pd * dz

    x1 = gx - gw * 0.5 + 0.5
    y1 = gy - gh * 0.5 + 0.5
    x2 = gx + gw * 0.5 - 0.5
    y2 = gy + gh * 0.5 - 0.5
    z1 = gz - gd * 0.5 + 0.5
    z2 = gz + gd * 0.5 - 0.5

    if max_shape is not None:
        x1 = jnp.clip(x1, 0, max_shape[1] - 1)
        y1 = jnp.clip(y1, 0, max_shape[0] - 1)
        x2 = jnp.clip(x2, 0, max_shape[1] - 1)
        y2 = jnp.clip(y2, 0, max_shape[0] - 1)
        z1 = jnp.clip(z1, 0, max_shape[3] - 1)
        z2 = jnp.clip(z2, 0, max_shape[3] - 1)

    out = jnp.stack([x1, y1, x2, y2, z1, z2], axis=-1)
    return out.reshape(deltas.shape)


def bbox_overlaps_3d(boxes1, boxes2, mode="iou"):
    """Pairwise volume IoU (or IoF) with +1 extents.

    Reference: mmdet/core/bbox/geometry.py:49-62 (6-col branch).
    boxes1 (m, 6), boxes2 (n, 6) -> (m, n) float32.
    """
    xa = jnp.maximum(boxes1[:, None, 0], boxes2[None, :, 0])
    ya = jnp.maximum(boxes1[:, None, 1], boxes2[None, :, 1])
    xb = jnp.minimum(boxes1[:, None, 2], boxes2[None, :, 2])
    yb = jnp.minimum(boxes1[:, None, 3], boxes2[None, :, 3])
    za = jnp.maximum(boxes1[:, None, 4], boxes2[None, :, 4])
    zb = jnp.minimum(boxes1[:, None, 5], boxes2[None, :, 5])

    inter = (
        jnp.clip(xb - xa + 1.0, 0)
        * jnp.clip(yb - ya + 1.0, 0)
        * jnp.clip(zb - za + 1.0, 0)
    )
    vol1 = box_volume(boxes1)
    if mode == "iof":
        return (inter / vol1[:, None]).astype(jnp.float32)
    vol2 = box_volume(boxes2)
    return (inter / (vol1[:, None] + vol2[None, :] - inter)).astype(jnp.float32)


def bbox_overlaps_aligned_3d(boxes1, boxes2):
    """Elementwise IoU between aligned box arrays of identical shape (..., 6)."""
    xa = jnp.maximum(boxes1[..., 0], boxes2[..., 0])
    ya = jnp.maximum(boxes1[..., 1], boxes2[..., 1])
    xb = jnp.minimum(boxes1[..., 2], boxes2[..., 2])
    yb = jnp.minimum(boxes1[..., 3], boxes2[..., 3])
    za = jnp.maximum(boxes1[..., 4], boxes2[..., 4])
    zb = jnp.minimum(boxes1[..., 5], boxes2[..., 5])
    inter = (
        jnp.clip(xb - xa + 1.0, 0)
        * jnp.clip(yb - ya + 1.0, 0)
        * jnp.clip(zb - za + 1.0, 0)
    )
    union = box_volume(boxes1) + box_volume(boxes2) - inter
    return (inter / union).astype(jnp.float32)


def clip_boxes(boxes, img_shape):
    """Clip boxes to volume extents. img_shape = (H, W, C, D) reference layout."""
    h, w, d = img_shape[0], img_shape[1], img_shape[3]
    return jnp.stack(
        [
            jnp.clip(boxes[..., 0], 0, w - 1),
            jnp.clip(boxes[..., 1], 0, h - 1),
            jnp.clip(boxes[..., 2], 0, w - 1),
            jnp.clip(boxes[..., 3], 0, h - 1),
            jnp.clip(boxes[..., 4], 0, d - 1),
            jnp.clip(boxes[..., 5], 0, d - 1),
        ],
        axis=-1,
    )


def xyxyzz_to_xywhzd(boxes):
    """COCO-3D json bbox format used by the eval fork.

    Reference: mmdet/core/evaluation/coco_utils.py:233-242 (xyxyzz2xywhzd):
    [x1, y1, w+1, h+1, z1, d+1].
    """
    boxes = np.asarray(boxes)
    return np.stack(
        [
            boxes[..., 0],
            boxes[..., 1],
            boxes[..., 2] - boxes[..., 0] + 1,
            boxes[..., 3] - boxes[..., 1] + 1,
            boxes[..., 4],
            boxes[..., 5] - boxes[..., 4] + 1,
        ],
        axis=-1,
    )
