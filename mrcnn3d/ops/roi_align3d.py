"""RoIAlign3D — trilinear RoI feature pooling on TPU.

Exact semantic port of the reference CUDA kernel
(mmdet/ops/roi_align/src/roi_align_kernel.cu:215-291 `ROIAlignForward3D`,
:64-149 `bilinear_interpolate_3d`):

  * roi_start = coord * scale, roi_end = (coord + 1) * scale  (+1 extent)
  * extents clamped to >= 0, bin = extent / pooled
  * `sample_num` sample points per bin per axis at
    start + p*bin + (i + .5) * bin / sample_num, averaged
  * trilinear interpolation with the kernel's edge rules:
    out-of-range (< -1 or > dim) contributes 0; coords <= 0 clamp to 0;
    low index >= dim-1 collapses to the edge voxel
  * separate spatial_scale for xy vs depth

Rather than a scalar CUDA loop, this is one fused XLA computation: all
sample coordinates for all RoIs are computed as arrays, the 8 trilinear
corners become 8 batched gathers from the flattened feature volume, and the
sample average is a reshape+mean. Gradients flow through gather→scatter-add
automatically (replacing the atomicAdd backward kernel :520-636).

Layout: features are channel-last (B, D, H, W, C); rois are (N, 7)
[batch, x1, y1, x2, y2, z1, z2] in input-volume coordinates.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _axis_samples(lo, ln, pooled, sample_num):
    """Per-roi 1-D sample coordinates along one axis.

    lo: (N,) bin origin; ln: (N,) roi extent in feature coords.
    Returns (N, pooled * sample_num) coords.
    """
    bin_size = ln / pooled  # (N,)
    p = jnp.arange(pooled, dtype=jnp.float32)  # (pooled,)
    s = (jnp.arange(sample_num, dtype=jnp.float32) + 0.5) / sample_num
    # coord[p, i] = lo + p*bin + s_i*bin
    offs = p[:, None] + s[None, :]  # (pooled, sample_num)
    coords = lo[:, None, None] + bin_size[:, None, None] * offs[None]
    return coords.reshape(coords.shape[0], pooled * sample_num)


def _interp_1d(coord, dim):
    """Trilinear 1-D components with CUDA edge rules.

    Returns (idx_low, idx_high, w_low, w_high, in_range) for coords (N, S).
    """
    in_range = (coord >= -1.0) & (coord <= dim)
    c = jnp.maximum(coord, 0.0)
    low = jnp.floor(c).astype(jnp.int32)
    at_edge = low >= dim - 1
    low = jnp.where(at_edge, dim - 1, low)
    high = jnp.where(at_edge, dim - 1, low + 1)
    c = jnp.where(at_edge, low.astype(jnp.float32), c)
    l = c - low.astype(jnp.float32)
    return low, high, 1.0 - l, l, in_range


@functools.partial(
    jax.jit,
    static_argnames=(
        "out_size",
        "out_size_depth",
        "spatial_scale",
        "spatial_scale_depth",
        "sample_num",
    ),
)
def roi_align_3d(
    features,
    rois,
    out_size,
    out_size_depth,
    spatial_scale,
    spatial_scale_depth,
    sample_num=2,
):
    """RoIAlign3D forward.

    Args:
      features: (B, D, H, W, C) float.
      rois: (N, 7) float [batch, x1, y1, x2, y2, z1, z2].
      out_size: pooled H and W; out_size_depth: pooled D.
      spatial_scale / spatial_scale_depth: 1/stride for xy / depth.
      sample_num: samples per bin per axis (reference config: 2).

    Returns:
      (N, out_size_depth, out_size, out_size, C) pooled features.
    """
    b, d, h, w, c = features.shape
    n = rois.shape[0]
    compute_dtype = features.dtype

    batch_idx = rois[:, 0].astype(jnp.int32)
    start_w = rois[:, 1] * spatial_scale
    start_h = rois[:, 2] * spatial_scale
    end_w = (rois[:, 3] + 1.0) * spatial_scale
    end_h = (rois[:, 4] + 1.0) * spatial_scale
    start_d = rois[:, 5] * spatial_scale_depth
    end_d = (rois[:, 6] + 1.0) * spatial_scale_depth

    roi_w = jnp.maximum(end_w - start_w, 0.0)
    roi_h = jnp.maximum(end_h - start_h, 0.0)
    roi_d = jnp.maximum(end_d - start_d, 0.0)

    sn = sample_num
    xs = _axis_samples(start_w, roi_w, out_size, sn)  # (N, Sw)
    ys = _axis_samples(start_h, roi_h, out_size, sn)  # (N, Sh)
    zs = _axis_samples(start_d, roi_d, out_size_depth, sn)  # (N, Sd)

    xl, xh, wxl, wxh, xin = _interp_1d(xs, w)
    yl, yh, wyl, wyh, yin = _interp_1d(ys, h)
    zl, zh, wzl, wzh, zin = _interp_1d(zs, d)

    sd, sh_, sw = zs.shape[1], ys.shape[1], xs.shape[1]

    # flatten features to (B*D*H*W, C) for one-axis gathers
    flat = features.reshape(b * d * h * w, c)
    zoff = (batch_idx * d)[:, None]  # (N, 1)

    def corner(zi, yi, xi, wz, wy, wx):
        # zi (N,Sd) yi (N,Sh) xi (N,Sw) -> (N, Sd, Sh, Sw)
        idx = (
            ((zoff + zi)[:, :, None, None] * h + yi[:, None, :, None]) * w
            + xi[:, None, None, :]
        )
        # keep index math out of the gather fusion (see fetch() below)
        idx = jax.lax.optimization_barrier(idx)
        vals = jnp.take(flat, idx.reshape(-1), axis=0).reshape(
            n, sd, sh_, sw, c
        )
        wgt = (
            wz[:, :, None, None]
            * wy[:, None, :, None]
            * wx[:, None, None, :]
        ).astype(compute_dtype)
        return vals * wgt[..., None]

    acc = corner(zl, yl, xl, wzl, wyl, wxl)
    acc += corner(zl, yl, xh, wzl, wyl, wxh)
    acc += corner(zl, yh, xl, wzl, wyh, wxl)
    acc += corner(zl, yh, xh, wzl, wyh, wxh)
    acc += corner(zh, yl, xl, wzh, wyl, wxl)
    acc += corner(zh, yl, xh, wzh, wyl, wxh)
    acc += corner(zh, yh, xl, wzh, wyh, wxl)
    acc += corner(zh, yh, xh, wzh, wyh, wxh)

    # zero out samples whose (unclamped) coords fall outside the volume
    valid = (
        zin[:, :, None, None] & yin[:, None, :, None] & xin[:, None, None, :]
    )
    acc = jnp.where(valid[..., None], acc, 0.0)

    # average the sample_num^3 samples per bin
    acc = acc.reshape(
        n, out_size_depth, sn, out_size, sn, out_size, sn, c
    )
    return acc.mean(axis=(2, 4, 6))


def map_roi_levels(rois, num_levels, finest_scale=56):
    """Per-roi FPN level: floor(log2(sqrt(w*h*d)/finest + 1e-6)), clamped
    (reference single_level.py:73-81)."""
    scale = jnp.sqrt(
        (rois[:, 3] - rois[:, 1] + 1)
        * (rois[:, 4] - rois[:, 2] + 1)
        * (rois[:, 6] - rois[:, 5] + 1)
    )
    target = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    return jnp.clip(target, 0, num_levels - 1).astype(jnp.int32)


def multi_level_roi_align_3d_reference(
    feats,
    rois,
    out_size,
    out_size_depth,
    featmap_strides,
    featmap_strides_depth,
    sample_num=2,
    finest_scale=56,
    valid=None,
):
    """Naive level dispatch: run every level over all rois and select.

    Kept as the oracle for the fused version below (4x the gather work).
    """
    num_levels = len(feats)
    target = map_roi_levels(rois, num_levels, finest_scale)
    out = None
    for i in range(num_levels):
        pooled = roi_align_3d(
            feats[i],
            rois,
            out_size,
            out_size_depth,
            1.0 / featmap_strides[i],
            1.0 / featmap_strides_depth[i],
            sample_num,
        )
        sel = target == i
        if valid is not None:
            sel = sel & valid
        pooled = jnp.where(sel[:, None, None, None, None], pooled, 0.0)
        out = pooled if out is None else out + pooled
    return out


def pack_feature_table(feats):
    """Build the corner-packed flat gather table for a feature pyramid.

    TPU gathers of rows narrower than the 128-lane tile fall off a
    performance cliff (measured ~300x slower than 128-lane rows on
    v5e), and the per-ROW cost then amortizes with width: measured
    marginal rates 6.3 / 8.3 / 12.3 ns per row at 128 / 256 / 512
    lanes — i.e. 3.15 -> 1.54 ns per trilinear CORNER as x, then y,
    then z neighbors fold into the row.  Pack neighbors until rows
    reach 512 lanes, so each gather row delivers up to all 8 corners at
    once.  Edge rows pack a zero neighbor; the CUDA edge rule already
    gives the high corner weight 0 there (interp collapses to the edge
    voxel), so the zeros are never read with nonzero weight.

    Returns (flat (rows, packedC), pack_x, pack_y, pack_z); build ONCE
    per feature set and reuse across align calls (the chunked mask path
    would otherwise rebuild the 8x table per chunk).
    """
    c = feats[0].shape[-1]
    width = c
    pack_x = width <= 256
    width *= 2 if pack_x else 1
    pack_y = width <= 256
    width *= 2 if pack_y else 1
    pack_z = width <= 256
    width *= 2 if pack_z else 1

    def shift_cat(fp, axis):
        pad = [(0, 0)] * 5
        pad[axis] = (0, 1)
        idx = [slice(None)] * 5
        idx[axis] = slice(1, None)
        return jnp.concatenate(
            [fp, jnp.pad(fp[tuple(idx)], pad)], axis=-1
        )

    packed = []
    for f in feats:
        fp = f
        if pack_x:
            fp = shift_cat(fp, 3)
        if pack_y:
            fp = shift_cat(fp, 2)
        if pack_z:
            fp = shift_cat(fp, 1)
        packed.append(fp)
    cp = packed[0].shape[-1]
    flat = jnp.concatenate(
        [f.reshape(-1, cp) for f in packed], axis=0
    )  # (sum(B*D*H*W), packed C)
    # materialize the packed table: if XLA fuses the pad/concat into the
    # gather, the gather reads a computed operand and falls off the fast
    # path (measured ~100x slower)
    flat = jax.lax.optimization_barrier(flat)
    return flat, pack_x, pack_y, pack_z


def multi_level_roi_align_3d(
    feats,
    rois,
    out_size,
    out_size_depth,
    featmap_strides,
    featmap_strides_depth,
    sample_num=2,
    finest_scale=56,
    valid=None,
    prepacked=None,
):
    """FPN-level-dispatched RoIAlign — fused single pass (corner gathers).

    Same semantics as the reference's per-level scatter-gather
    (single_level.py:84-104), but instead of aligning every roi against
    every level (4x gather traffic), all levels are flattened into one
    (sum(B*Dl*Hl*Wl), C) buffer and each roi gathers through its own
    level's offset with per-roi scales — one gather pass total.

    This corner-gather formulation serves the CPU / GSPMD-sharded 1.5x
    bbox align (PROFILE.md "formulation roster"): on v5e at pipeline
    geometry (4 levels of 512x512x96, C=64, 2000 rois, out 7x7x3) it
    measured 114 ms vs 161 ms for the row-slab/MXU experiment (pruned
    in round 5 — it never won a product geometry).

    feats: list of (B, D, H, W, C); rois (N, 7) [b, x1..z2];
    valid (N,) bool or None.  Returns (N, out_d, out, out, C).
    """
    num_levels = len(feats)
    b = feats[0].shape[0]
    c = feats[0].shape[-1]
    n = rois.shape[0]
    compute_dtype = feats[0].dtype

    target = map_roi_levels(rois, num_levels, finest_scale)
    if valid is not None:
        # invalid rois -> level 0 (cheap, masked out at the end)
        target = jnp.where(valid, target, 0)

    # static level metadata
    dims = np.array([f.shape[1:4] for f in feats], np.int32)  # (L, 3)
    sizes = np.array(
        [b * int(np.prod(f.shape[1:4])) for f in feats], np.int64
    )
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int32)
    inv_xy = np.array([1.0 / s for s in featmap_strides], np.float32)
    inv_d = np.array(
        [1.0 / s for s in featmap_strides_depth], np.float32
    )

    if prepacked is None:
        prepacked = pack_feature_table(feats)
    flat, pack_x, pack_y, pack_z = prepacked
    cp = flat.shape[-1]

    # per-roi level params
    t = target
    dim_d = jnp.asarray(dims[:, 0])[t]
    dim_h = jnp.asarray(dims[:, 1])[t]
    dim_w = jnp.asarray(dims[:, 2])[t]
    sc_xy = jnp.asarray(inv_xy)[t]
    sc_d = jnp.asarray(inv_d)[t]
    off = jnp.asarray(offsets)[t]
    batch_idx = rois[:, 0].astype(jnp.int32)

    start_w = rois[:, 1] * sc_xy
    start_h = rois[:, 2] * sc_xy
    end_w = (rois[:, 3] + 1.0) * sc_xy
    end_h = (rois[:, 4] + 1.0) * sc_xy
    start_d = rois[:, 5] * sc_d
    end_d = (rois[:, 6] + 1.0) * sc_d

    roi_w = jnp.maximum(end_w - start_w, 0.0)
    roi_h = jnp.maximum(end_h - start_h, 0.0)
    roi_d = jnp.maximum(end_d - start_d, 0.0)

    sn = sample_num
    xs = _axis_samples(start_w, roi_w, out_size, sn)  # (N, Sw)
    ys = _axis_samples(start_h, roi_h, out_size, sn)
    zs = _axis_samples(start_d, roi_d, out_size_depth, sn)

    def interp(coord, dim):
        # per-roi dim: dim (N,) broadcast against coord (N, S)
        dimf = dim[:, None].astype(coord.dtype)
        in_range = (coord >= -1.0) & (coord <= dimf)
        cc = jnp.maximum(coord, 0.0)
        low = jnp.floor(cc).astype(jnp.int32)
        at_edge = low >= dim[:, None] - 1
        low = jnp.where(at_edge, dim[:, None] - 1, low)
        high = jnp.where(at_edge, dim[:, None] - 1, low + 1)
        cc = jnp.where(at_edge, low.astype(coord.dtype), cc)
        frac = cc - low.astype(coord.dtype)
        return low, high, 1.0 - frac, frac, in_range

    xl, xh, wxl, wxh, xin = interp(xs, dim_w)
    yl, yh, wyl, wyh, yin = interp(ys, dim_h)
    zl, zh, wzl, wzh, zin = interp(zs, dim_d)

    sd, sh_, sw = zs.shape[1], ys.shape[1], xs.shape[1]
    base = off + batch_idx * dim_d * dim_h * dim_w  # (N,)

    def fetch(zi, yi, xi):
        idx = (
            base[:, None, None, None]
            + (
                zi[:, :, None, None] * dim_h[:, None, None, None]
                + yi[:, None, :, None]
            )
            * dim_w[:, None, None, None]
            + xi[:, None, None, :]
        )
        # materialize the indices: if XLA fuses the index arithmetic into
        # the gather, the gather leaves its fast path (measured ~250x
        # slower on v5e for this exact op)
        idx = jax.lax.optimization_barrier(idx)
        return jnp.take(flat, idx.reshape(-1), axis=0).reshape(
            n, sd, sh_, sw, cp
        )

    def bx(wx):
        return wx[:, None, None, :, None].astype(compute_dtype)

    def by(wy):
        return wy[:, None, :, None, None].astype(compute_dtype)

    def bz(wz):
        return wz[:, :, None, None, None].astype(compute_dtype)

    # One fetch per UNpacked corner combination; packed dims unfold from
    # the row lanes.  Slice layout (units of c) after packing x, then y,
    # then z: idx = zi * (px2 * py2) + yi * px2 + xi.
    px2 = 2 if pack_x else 1
    py2 = 2 if pack_y else 1
    z_fetch = [(zl, wzl), (zh, wzh)] if not pack_z else [(zl, None)]
    y_fetch = [(yl, wyl), (yh, wyh)] if not pack_y else [(yl, None)]
    x_fetch = [(xl, wxl), (xh, wxh)] if not pack_x else [(xl, None)]
    acc = None
    for zi, wz_f in z_fetch:
        for yi, wy_f in y_fetch:
            for xi, wx_f in x_fetch:
                v = fetch(zi, yi, xi)
                for zp in range(2 if pack_z else 1):
                    wz = (wzl, wzh)[zp] if pack_z else wz_f
                    for yp in range(2 if pack_y else 1):
                        wy = (wyl, wyh)[yp] if pack_y else wy_f
                        for xp in range(2 if pack_x else 1):
                            wx = (wxl, wxh)[xp] if pack_x else wx_f
                            s = (zp * py2 + yp) * px2 + xp
                            term = v[..., s * c:(s + 1) * c] * (
                                bz(wz) * by(wy) * bx(wx)
                            )
                            acc = term if acc is None else acc + term

    ok = zin[:, :, None, None] & yin[:, None, :, None] & xin[:, None, None, :]
    if valid is not None:
        ok = ok & valid[:, None, None, None]
    acc = jnp.where(ok[..., None], acc, 0.0)

    acc = acc.reshape(n, out_size_depth, sn, out_size, sn, out_size, sn, c)
    return acc.mean(axis=(2, 4, 6))


def _axis_matrix(coords, dim, out, sn):
    """Dense (N, out, dim) interpolation matrix for one axis.

    Exact CUDA-kernel semantics (roi_align_kernel.cu:64-149
    bilinear_interpolate_3d, same rules as `_interp_1d`): out-of-range
    (< -1 or > dim) samples contribute 0; coords clamp to 0; low index
    >= dim-1 collapses to the edge voxel — with the sample_num bin
    average folded in.  coords is (N, out*sn) float32.
    """
    in_range = (coords >= -1.0) & (coords <= float(dim))
    c = jnp.maximum(coords, 0.0)
    low = jnp.floor(c).astype(jnp.int32)
    at_edge = low >= dim - 1
    low = jnp.where(at_edge, dim - 1, low)
    high = jnp.where(at_edge, dim - 1, low + 1)
    c = jnp.where(at_edge, low.astype(c.dtype), c)
    frac = (c - low.astype(c.dtype))[..., None]
    cols = jax.lax.broadcasted_iota(jnp.int32, coords.shape + (dim,), 2)
    mat = (cols == low[..., None]) * (1.0 - frac) + (
        cols == high[..., None]
    ) * frac
    mat = mat * in_range[..., None]
    n = coords.shape[0]
    return mat.reshape(n, out, sn, dim).sum(axis=2) / sn


def multi_level_roi_align_3d_dense(
    feats,
    rois,
    out_size,
    out_size_depth,
    featmap_strides,
    featmap_strides_depth,
    sample_num=2,
    finest_scale=56,
    valid=None,
):
    """FPN-level-dispatched RoIAlign as dense separable MXU contractions.

    The training-path formulation.  Profiling round 2 (PROFILE.md)
    showed the corner-gather version's backward — a multi-million-row
    scatter-add into the packed feature table (the transpose of
    `jnp.take`) — consuming ~60% of the whole train step, because
    scatter is the one op shape TPUs cannot run fast.  Here the
    trilinear interpolation (CUDA rules, in-range mask and sample-bin
    average included — see `_axis_matrix`) is expressed per axis as a
    dense (N, out, dim) matrix over the ENTIRE level extent and applied
    as three einsums (z with the batch one-hot folded in, then y, then
    x).  Forward is ~10 GFLOP per level set at crop geometry — noise on
    the MXU — and the backward is einsum transposes: no gather, no
    scatter, no data-formatting copies.

    Level dispatch: each level contracts all rois with its own dense
    matrices, with rois not assigned to the level (and invalid rois)
    zeroed via the z matrix; level outputs sum.  Levels shrink 8x per
    step so the total is ~1.5x the finest level.

    Intended for training geometry (small feature maps, <=1k rois);
    whole-volume inference keeps the corner-gather path, which has no
    backward and wins when dim products are huge.

    Semantics match `multi_level_roi_align_3d` exactly (oracle-tested).
    feats: list of (B, D, H, W, C); rois (N, 7); valid (N,) bool/None.
    Returns (N, out_d, out, out, C).
    """
    num_levels = len(feats)
    b = feats[0].shape[0]
    c = feats[0].shape[-1]
    n = rois.shape[0]
    compute_dtype = feats[0].dtype

    target = map_roi_levels(rois, num_levels, finest_scale)
    sel_all = (
        valid if valid is not None else jnp.ones((n,), bool)
    )
    batch_idx = rois[:, 0].astype(jnp.int32)
    onehot_b = (
        batch_idx[:, None] == jnp.arange(b, dtype=jnp.int32)[None]
    )

    sn = sample_num
    out = None
    for lvl in range(num_levels):
        d_l, h_l, w_l = (int(s) for s in feats[lvl].shape[1:4])
        sc_xy = 1.0 / featmap_strides[lvl]
        sc_d = 1.0 / featmap_strides_depth[lvl]

        start_w = rois[:, 1] * sc_xy
        start_h = rois[:, 2] * sc_xy
        end_w = (rois[:, 3] + 1.0) * sc_xy
        end_h = (rois[:, 4] + 1.0) * sc_xy
        start_d = rois[:, 5] * sc_d
        end_d = (rois[:, 6] + 1.0) * sc_d
        roi_w = jnp.maximum(end_w - start_w, 0.0)
        roi_h = jnp.maximum(end_h - start_h, 0.0)
        roi_d = jnp.maximum(end_d - start_d, 0.0)

        xm = _axis_matrix(
            _axis_samples(start_w, roi_w, out_size, sn), w_l, out_size, sn
        )
        ym = _axis_matrix(
            _axis_samples(start_h, roi_h, out_size, sn), h_l, out_size, sn
        )
        zm = _axis_matrix(
            _axis_samples(start_d, roi_d, out_size_depth, sn),
            d_l,
            out_size_depth,
            sn,
        )

        sel = (target == lvl) & sel_all
        # fold level/validity mask + batch one-hot into z: (N, Od, B*D)
        zmb = (
            zm[:, :, None, :]
            * (sel[:, None] & onehot_b)[:, None, :, None]
        ).reshape(n, out_size_depth, b * d_l)

        # Contraction structure is chosen for the MXU, not FLOP
        # minimality: the z and y matrices join into one (N, Od*Oh,
        # B*D*H) operand so the feature contraction is a single flat
        # 2-D GEMM with a large K — batched small-K dots measured
        # ~10x slower (layout-bound), and the flat GEMM also shrinks
        # the live intermediate from N*Od*H*W*C to N*Od*Oh*W*C.
        # Everything runs in the features' dtype (MXU accumulates f32
        # internally); forcing f32 outputs measured +25 ms/step of
        # convert traffic.
        zy = (
            zmb.astype(compute_dtype)[:, :, None, :, None]
            * ym.astype(compute_dtype)[:, None, :, None, :]
        )
        q = b * d_l * h_l
        flat = feats[lvl].reshape(q, w_l * c)
        t = (
            zy.reshape(n * out_size_depth * out_size, q) @ flat
        ).reshape(n, out_size_depth, out_size, w_l, c)
        t3 = jnp.einsum(
            "nxw,noywc->noyxc", xm.astype(compute_dtype), t
        )
        out = t3 if out is None else out + t3
    return out


def multi_level_roi_align_3d_chunked(
    feats,
    rois,
    out_size,
    out_size_depth,
    featmap_strides,
    featmap_strides_depth,
    sample_num=2,
    finest_scale=56,
    valid=None,
    chunk=512,
    prepacked=None,
):
    """Memory-bounded multi-level RoIAlign: `lax.map` over roi chunks.

    At mask geometry (out 14x14x10, sample_num 2) the per-roi corner
    slab is (20,28,28,C) — 2000 rois materialize ~4 GB of bf16
    intermediates in one shot, which OOMs next to whole-volume features.
    Mapping over fixed-size chunks caps the live intermediate at
    chunk/N of that with a single compiled body (the remainder is
    padded to a full chunk, so every chunk has identical shapes).
    """
    n = rois.shape[0]
    if n <= chunk:
        return multi_level_roi_align_3d(
            feats, rois, out_size, out_size_depth, featmap_strides,
            featmap_strides_depth, sample_num, finest_scale, valid,
            prepacked=prepacked,
        )
    if valid is None:
        valid = jnp.ones((n,), bool)
    pad = (-n) % chunk
    if pad:
        rois = jnp.concatenate([rois, jnp.zeros((pad, 7), rois.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
    k = (n + pad) // chunk
    if prepacked is None:
        prepacked = pack_feature_table(feats)  # ONCE, not per chunk

    def body(args):
        r, v = args
        return multi_level_roi_align_3d(
            feats, r, out_size, out_size_depth, featmap_strides,
            featmap_strides_depth, sample_num, finest_scale, v,
            prepacked=prepacked,
        )

    out = jax.lax.map(
        body,
        (rois.reshape(k, chunk, 7), valid.reshape(k, chunk)),
    )
    out = out.reshape((k * chunk,) + out.shape[2:])
    return out[:n]


def xfirst_flat_features(feats):
    """Per-level (W, D*H*C)-flat single-volume feature maps for
    `multi_level_roi_align_3d_xfirst`.  Build ONCE per feature set and
    share across align calls (bbox/refinement/mask) — inside a scan the
    transpose would otherwise be re-materialized per chunk (lax.while
    bodies don't hoist loop-invariant transposes)."""
    assert feats[0].shape[0] == 1, "xfirst path is single-volume"
    return [
        f[0].transpose(2, 0, 1, 3).reshape(f.shape[3], -1)
        for f in feats
    ]


def multi_level_roi_align_3d_xfirst(
    feats,
    rois,
    out_size,
    out_size_depth,
    featmap_strides,
    featmap_strides_depth,
    sample_num=2,
    finest_scale=56,
    valid=None,
    flats=None,
):
    """Whole-volume inference RoIAlign as x-first separable einsums.

    The inference twin of `multi_level_roi_align_3d_dense` (exact same
    `_axis_matrix` CUDA semantics, same level dispatch masked into the
    final contraction), restructured for HUGE feature maps:

      * The corner-gather path issues out_vox*sn^3 gather rows per roi
        — 31M scattered rows for 2000 rois at mask geometry, measured
        910 ms of the 1.42 s segm step at 512x512x64 (PROFILE.md r3).
      * The train-path dense form joins z*y into one GEMM whose K is
        B*D*H — fine at crop geometry, petaFLOPs at whole-volume.
      * Here the x matrix contracts FIRST as one flat GEMM per level
        whose shared RHS is the (W, D*H*C)-flat feature map: x is the
        only contraction that touches the full map, and its cost scales
        with the product of the OTHER axes — contracting the pooled
        x axis down to out_size before y and z shrinks that product
        ~10x.  Total ~2 TFLOP at 2000 rois/512^2x64 vs the gather
        path's 31M scattered rows.

    Single-volume (B == 1) only — the caller chunks rois (the (m, Ox,
    D, H, C) intermediate is ~7 MB/roi at mask geometry on the finest
    level).  `flats`: optional precomputed `xfirst_flat_features`.

    Reference parity: mmdet/ops/roi_align/src/roi_align_kernel.cu
    bilinear_interpolate_3d + single_level.py:73-81 dispatch.
    """
    num_levels = len(feats)
    assert feats[0].shape[0] == 1, "xfirst path is single-volume"
    n = rois.shape[0]
    compute_dtype = feats[0].dtype
    target = map_roi_levels(rois, num_levels, finest_scale)
    sel_all = valid if valid is not None else jnp.ones((n,), bool)
    if flats is None:
        flats = xfirst_flat_features(feats)

    out = None
    for lvl in range(num_levels):
        d_l, h_l, w_l = (int(s) for s in feats[lvl].shape[1:4])
        c = int(feats[lvl].shape[-1])
        sc_xy = 1.0 / featmap_strides[lvl]
        sc_d = 1.0 / featmap_strides_depth[lvl]

        start_w = rois[:, 1] * sc_xy
        start_h = rois[:, 2] * sc_xy
        end_w = (rois[:, 3] + 1.0) * sc_xy
        end_h = (rois[:, 4] + 1.0) * sc_xy
        start_d = rois[:, 5] * sc_d
        end_d = (rois[:, 6] + 1.0) * sc_d
        roi_w = jnp.maximum(end_w - start_w, 0.0)
        roi_h = jnp.maximum(end_h - start_h, 0.0)
        roi_d = jnp.maximum(end_d - start_d, 0.0)

        sn = sample_num
        xm = _axis_matrix(
            _axis_samples(start_w, roi_w, out_size, sn), w_l, out_size, sn
        )
        ym = _axis_matrix(
            _axis_samples(start_h, roi_h, out_size, sn), h_l, out_size, sn
        )
        zm = _axis_matrix(
            _axis_samples(start_d, roi_d, out_size_depth, sn),
            d_l,
            out_size_depth,
            sn,
        )
        sel = (target == lvl) & sel_all
        zm = zm * sel[:, None, None]

        # x: one flat GEMM, shared RHS (W, D*H*C)
        t1 = (
            xm.reshape(n * out_size, w_l).astype(compute_dtype)
            @ flats[lvl]
        ).reshape(n, out_size, d_l, h_l, c)
        # y: batched over rois, contract h
        t2 = jnp.einsum(
            "myh,mxdhc->mdyxc", ym.astype(compute_dtype), t1
        )
        # z (level/validity folded in): contract d
        t3 = jnp.einsum(
            "mzd,mdyxc->mzyxc", zm.astype(compute_dtype), t2
        )
        out = t3 if out is None else out + t3
    return out


def multi_level_roi_align_3d_xfirst_chunked(
    feats,
    rois,
    out_size,
    out_size_depth,
    featmap_strides,
    featmap_strides_depth,
    sample_num=2,
    finest_scale=56,
    valid=None,
    chunk=128,
    flats=None,
):
    """`lax.map` roi-chunked wrapper around the xfirst path (the (m,
    Ox, D, H, C) level-0 intermediate is what bounds the chunk)."""
    n = rois.shape[0]
    if flats is None:
        flats = xfirst_flat_features(feats)
    if n <= chunk:
        return multi_level_roi_align_3d_xfirst(
            feats, rois, out_size, out_size_depth, featmap_strides,
            featmap_strides_depth, sample_num, finest_scale, valid,
            flats=flats,
        )
    if valid is None:
        valid = jnp.ones((n,), bool)
    pad = (-n) % chunk
    if pad:
        rois = jnp.concatenate([rois, jnp.zeros((pad, 7), rois.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
    k = (n + pad) // chunk

    def body(args):
        r, v = args
        return multi_level_roi_align_3d_xfirst(
            feats, r, out_size, out_size_depth, featmap_strides,
            featmap_strides_depth, sample_num, finest_scale, v,
            flats=flats,
        )

    out = jax.lax.map(
        body,
        (rois.reshape(k, chunk, 7), valid.reshape(k, chunk)),
    )
    return out.reshape((k * chunk,) + out.shape[2:])[:n]
