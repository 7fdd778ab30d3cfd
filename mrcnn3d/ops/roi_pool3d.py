"""RoIPool 3D (and 2-D via depth-1) — legacy parity op.

Exact semantic port of the reference CUDA kernel
(mmdet/ops/roi_pool/src/roi_pool_kernel.cu ROIPoolForward): rounded roi
corners at `spatial_scale`, per-bin boundaries
floor/ceil(b * ext / out), boundaries clamped to the map, max over the
bin (empty bin -> 0).  The reference marks RoIPool legacy (RoIAlign3D is
the shipped extractor); it exists here for capability parity and the
2-D family.

TPU formulation: the 3-D bin max is separable (max over a box = max per
axis), and the bin mapping is per-axis independent — so each roi
dynamic-slices a fixed-size window (static shapes) and applies three
masked max-reductions (bin one-hot in max-plus algebra) instead of a
scatter.  vmapped over rois; feats stay resident, no host round-trip.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _axis_bins(start, ext, dim, origin, out, win):
    """Per-axis bin bounds (CUDA :24-37): bin b covers
    [start + floor(b*ext/out), start + ceil((b+1)*ext/out)) clamped to
    [0, dim], where `start` is the UNCLAMPED rounded roi corner.
    Returned window-relative to `origin` and clamped to [0, win]."""
    ext = jnp.maximum(ext, 1).astype(jnp.float32)
    b = jnp.arange(out, dtype=jnp.float32)
    lo = start + jnp.floor(b * ext / out).astype(jnp.int32)
    hi = start + jnp.ceil((b + 1) * ext / out).astype(jnp.int32)
    lo = jnp.clip(jnp.clip(lo, 0, dim) - origin, 0, win)
    hi = jnp.clip(jnp.clip(hi, 0, dim) - origin, 0, win)
    return lo, hi


def _axis_max(v, lo, hi, axis, win):
    """Masked bin max along `axis`: out[b] = max_{lo[b] <= w < hi[b]} v[w]
    (empty bin -> -inf, resolved to 0 by the caller)."""
    idx = jnp.arange(win)
    mask = (idx[None, :] >= lo[:, None]) & (idx[None, :] < hi[:, None])
    v = jnp.moveaxis(v, axis, 0)  # (win, ...)
    neg = jnp.asarray(-jnp.inf, v.dtype)
    sel = jnp.where(
        mask.reshape(mask.shape + (1,) * (v.ndim - 1)), v[None], neg
    )  # (out, win, ...)
    return jnp.moveaxis(sel.max(axis=1), 0, axis)


def roi_pool_3d(
    feats,
    rois,
    out_size,
    out_size_depth,
    spatial_scale,
    depth_scale,
    max_hw=64,
    max_d=16,
    valid=None,
):
    """feats (B, D, H, W, C); rois (N, 7) [b, x1, y1, x2, y2, z1, z2].

    Returns (N, out_size_depth, out_size, out_size, C).  Rois whose
    scaled extent exceeds the static window (max_hw cells in x/y, max_d
    in z) clamp to the window.
    """
    fb, fd, fh, fw, c = feats.shape

    def one(roi):
        bi = roi[0].astype(jnp.int32)
        # CUDA :18-23 rounds the scaled corners; ext = end - start + 1
        x1 = jnp.round(roi[1] * spatial_scale).astype(jnp.int32)
        y1 = jnp.round(roi[2] * spatial_scale).astype(jnp.int32)
        x2 = jnp.round(roi[3] * spatial_scale).astype(jnp.int32)
        y2 = jnp.round(roi[4] * spatial_scale).astype(jnp.int32)
        z1 = jnp.round(roi[5] * depth_scale).astype(jnp.int32)
        z2 = jnp.round(roi[6] * depth_scale).astype(jnp.int32)
        # clamp the window origin so the static slice fits (dynamic_slice
        # would silently shift it otherwise, breaking relative offsets)
        wd_s, wh_s, ww_s = min(max_d, fd), min(max_hw, fh), min(max_hw, fw)
        x0 = jnp.clip(x1, 0, fw - ww_s)
        y0 = jnp.clip(y1, 0, fh - wh_s)
        z0 = jnp.clip(z1, 0, fd - wd_s)
        win = jax.lax.dynamic_slice(
            feats[bi], (z0, y0, x0, 0), (wd_s, wh_s, ww_s, c)
        )
        wd, wh, ww = win.shape[:3]
        lo_x, hi_x = _axis_bins(x1, x2 - x1 + 1, fw, x0, out_size, ww)
        lo_y, hi_y = _axis_bins(y1, y2 - y1 + 1, fh, y0, out_size, wh)
        lo_z, hi_z = _axis_bins(
            z1, z2 - z1 + 1, fd, z0, out_size_depth, wd
        )
        out = _axis_max(win, lo_z, hi_z, 0, wd)
        out = _axis_max(out, lo_y, hi_y, 1, wh)
        out = _axis_max(out, lo_x, hi_x, 2, ww)
        return jnp.where(jnp.isfinite(out), out, 0.0)

    out = jax.vmap(one)(rois)
    if valid is not None:
        out = jnp.where(valid[:, None, None, None, None], out, 0.0)
    return out


def roi_pool_3d_numpy(
    feats, rois, out_size, out_size_depth, spatial_scale, depth_scale
):
    """Scalar numpy oracle of the CUDA kernel (for tests)."""
    fb, fd, fh, fw, c = feats.shape
    n = rois.shape[0]
    out = np.zeros((n, out_size_depth, out_size, out_size, c), np.float32)
    for i, roi in enumerate(np.asarray(rois)):
        bi = int(roi[0])
        x1 = int(round(roi[1] * spatial_scale))
        y1 = int(round(roi[2] * spatial_scale))
        x2 = int(round(roi[3] * spatial_scale))
        y2 = int(round(roi[4] * spatial_scale))
        z1 = int(round(roi[5] * depth_scale))
        z2 = int(round(roi[6] * depth_scale))
        w = max(x2 - x1 + 1, 1)
        h = max(y2 - y1 + 1, 1)
        d = max(z2 - z1 + 1, 1)
        for oz in range(out_size_depth):
            zs = max(min(z1 + int(np.floor(oz * d / out_size_depth)), fd), 0)
            ze = max(min(z1 + int(np.ceil((oz + 1) * d / out_size_depth)), fd), 0)
            for oy in range(out_size):
                ys = max(min(y1 + int(np.floor(oy * h / out_size)), fh), 0)
                ye = max(min(y1 + int(np.ceil((oy + 1) * h / out_size)), fh), 0)
                for ox in range(out_size):
                    xs = max(min(x1 + int(np.floor(ox * w / out_size)), fw), 0)
                    xe = max(min(x1 + int(np.ceil((ox + 1) * w / out_size)), fw), 0)
                    if zs >= ze or ys >= ye or xs >= xe:
                        continue
                    out[i, oz, oy, ox] = feats[
                        bi, zs:ze, ys:ye, xs:xe
                    ].max(axis=(0, 1, 2))
    return out
