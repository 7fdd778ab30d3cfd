"""Deformable convolution (DCN v1/v2) — legacy 2-D parity op.

Semantic port of the reference CUDA ops (mmdet/ops/dcn/src/
deform_conv_cuda_kernel.cu deformable_im2col + modulated variant):
each kernel tap k of output position p samples the input bilinearly at

    p*stride - pad + k*dilation + offset[p, k]

(zero outside the map), v2 additionally scales each tap by a sigmoid
mask.  The reference ships it disabled in the 3-D config (resnet3d has
no DCN stage); it exists here for capability parity with upstream
mmdet's ResNet/ResNeXt DCN stages.

TPU formulation: offsets make the gather data-dependent, so the im2col
becomes one batched 4-corner bilinear gather over a (B, Ho*Wo*K) index
set followed by a dense (K*Cin, Cout) matmul on the MXU — no scalar
loops, fully jittable and differentiable through both data and offsets.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def deform_conv2d(
    x, offset, weight, stride=1, padding=1, dilation=1, mask=None
):
    """x (B, H, W, C); offset (B, Ho, Wo, K*2) in (dy, dx) pairs per tap
    (reference channel order); weight (kh, kw, C, Cout);
    mask (B, Ho, Wo, K) or None (v2 modulation).
    Returns (B, Ho, Wo, Cout)."""
    b, h, w, c = x.shape
    kh, kw, _, cout = weight.shape
    k = kh * kw
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    # base sampling grid per tap
    py = jnp.arange(ho) * stride - padding
    px = jnp.arange(wo) * stride - padding
    ky, kx = jnp.meshgrid(
        jnp.arange(kh) * dilation, jnp.arange(kw) * dilation,
        indexing="ij",
    )
    base_y = py[:, None, None] + ky.reshape(-1)[None, None, :]
    base_x = px[None, :, None] + kx.reshape(-1)[None, None, :]
    off = offset.reshape(b, ho, wo, k, 2)
    sy = base_y[None] + off[..., 0]
    sx = base_x[None] + off[..., 1]

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    fy = sy - y0
    fx = sx - x0

    def gather(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        flat = x.reshape(b, h * w, c)
        idx = yc * w + xc  # (B, Ho, Wo, K)
        v = jnp.take_along_axis(
            flat, idx.reshape(b, -1)[..., None], axis=1
        ).reshape(b, ho, wo, k, c)
        return v * inb[..., None]

    v = (
        gather(y0, x0) * ((1 - fy) * (1 - fx))[..., None]
        + gather(y0, x0 + 1) * ((1 - fy) * fx)[..., None]
        + gather(y0 + 1, x0) * (fy * (1 - fx))[..., None]
        + gather(y0 + 1, x0 + 1) * (fy * fx)[..., None]
    )
    if mask is not None:
        v = v * mask[..., None]
    return jnp.einsum(
        "bhwkc,kco->bhwo",
        v,
        weight.reshape(k, c, cout),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def deform_conv2d_numpy(
    x, offset, weight, stride=1, padding=1, dilation=1, mask=None
):
    """Scalar oracle of the CUDA deformable_im2col (for tests)."""
    b, h, w, c = x.shape
    kh, kw, _, cout = weight.shape
    k = kh * kw
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    out = np.zeros((b, ho, wo, cout), np.float32)
    off = offset.reshape(b, ho, wo, k, 2)

    def sample(bi, sy, sx):
        if sy <= -1 or sy >= h or sx <= -1 or sx >= w:
            return np.zeros(c, np.float32)
        y0, x0 = int(np.floor(sy)), int(np.floor(sx))
        fy, fx = sy - y0, sx - x0
        v = np.zeros(c, np.float32)
        for dy, wy in ((0, 1 - fy), (1, fy)):
            for dx, wx in ((0, 1 - fx), (1, fx)):
                yy, xx = y0 + dy, x0 + dx
                if 0 <= yy < h and 0 <= xx < w:
                    v += wy * wx * x[bi, yy, xx]
        return v

    for bi in range(b):
        for oy in range(ho):
            for ox in range(wo):
                for ki in range(k):
                    kyy, kxx = ki // kw, ki % kw
                    sy = oy * stride - padding + kyy * dilation + off[
                        bi, oy, ox, ki, 0
                    ]
                    sx = ox * stride - padding + kxx * dilation + off[
                        bi, oy, ox, ki, 1
                    ]
                    v = sample(bi, float(sy), float(sx))
                    if mask is not None:
                        v = v * mask[bi, oy, ox, ki]
                    out[bi, oy, ox] += v @ weight[kyy, kxx]
    return out


class DeformConv2dPack(nn.Module):
    """DCN with a learned offset branch (reference dcn/deform_conv.py
    DeformConvPack): offsets from a standard conv initialised to zero,
    so the layer starts as a plain conv.  `modulated=True` = DCNv2
    (ModulatedDeformConvPack): extra sigmoid mask channels."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    modulated: bool = False
    dtype: any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, 1, H, W, C) depth-1 volume or (B, H, W, C)
        squeeze = x.ndim == 5
        if squeeze:
            assert x.shape[1] == 1, "DCN is a 2-D (depth-1) op"
            x = x[:, 0]
        k = self.kernel_size * self.kernel_size
        off_ch = k * 3 if self.modulated else k * 2
        raw = nn.Conv(
            off_ch,
            (self.kernel_size, self.kernel_size),
            strides=self.stride,
            padding=self.padding,
            kernel_dilation=self.dilation,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="conv_offset",
        )(x)
        if self.modulated:
            offset = raw[..., : 2 * k]
            mask = jax.nn.sigmoid(raw[..., 2 * k:])
        else:
            offset, mask = raw, None
        weight = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, self.kernel_size, x.shape[-1],
             self.features),
        )
        out = deform_conv2d(
            x, offset, weight.astype(x.dtype),
            stride=self.stride, padding=self.padding,
            dilation=self.dilation, mask=mask,
        )
        return out[:, None] if squeeze else out


# ---------------------------------------------------------------------------
# Deformable RoI pooling (reference mmdet/ops/dcn/src/deform_pool_cuda.cpp
# + deform_pool_cuda_kernel.cu DeformablePSROIPoolForwardKernel, wrappers
# modules/deform_pool.py) — the pooling half of the DCN package.
# ---------------------------------------------------------------------------


def deform_roi_pool(
    feats,
    rois,
    offsets=None,
    spatial_scale=1.0,
    out_size=7,
    sample_per_part=4,
    trans_std=0.0,
    group_size=1,
    part_size=None,
):
    """Deformable (PS-)RoI pooling, channel-last.

    feats: (B, H, W, C_in) with C_in = out_channels * group_size**2;
    rois: (N, 5) [batch_idx, x1, y1, x2, y2]; offsets: (N, 2, part, part)
    normalized bin shifts (dx plane 0, dy plane 1) or None (no_trans).
    Returns (N, out_size, out_size, out_channels).

    Kernel semantics preserved: rounded roi corners shifted by -0.5,
    minimum 0.1 extent, per-bin offset scaled by trans_std * roi extent,
    sample_per_part**2 bilinear samples per bin, samples outside
    (-0.5, size-0.5) dropped from the average, in-range samples clamped
    to the border, position-sensitive channel groups.
    """
    b, h, w, c_in = feats.shape
    n = rois.shape[0]
    gs = int(group_size)
    out_channels = c_in // (gs * gs)
    part = int(part_size) if part_size is not None else int(out_size)
    sp = int(sample_per_part)
    os_ = int(out_size)

    batch_idx = rois[:, 0].astype(jnp.int32)
    x1 = jnp.round(rois[:, 1]) * spatial_scale - 0.5
    y1 = jnp.round(rois[:, 2]) * spatial_scale - 0.5
    x2 = (jnp.round(rois[:, 3]) + 1.0) * spatial_scale - 0.5
    y2 = (jnp.round(rois[:, 4]) + 1.0) * spatial_scale - 0.5
    roi_w = jnp.maximum(x2 - x1, 0.1)
    roi_h = jnp.maximum(y2 - y1, 0.1)
    bin_w = roi_w / os_
    bin_h = roi_h / os_
    sub_w = bin_w / sp
    sub_h = bin_h / sp

    ph = jnp.arange(os_)
    pw = jnp.arange(os_)
    if offsets is None:
        tx = jnp.zeros((n, os_, os_))
        ty = jnp.zeros((n, os_, os_))
    else:
        part_h = jnp.floor(ph.astype(jnp.float32) / os_ * part).astype(
            jnp.int32
        )
        part_w = jnp.floor(pw.astype(jnp.float32) / os_ * part).astype(
            jnp.int32
        )
        tx = offsets[:, 0][:, part_h][:, :, part_w] * trans_std
        ty = offsets[:, 1][:, part_h][:, :, part_w] * trans_std

    # bin start + offset (N, os, os)
    wstart = (
        pw[None, None, :] * bin_w[:, None, None]
        + x1[:, None, None]
        + tx * roi_w[:, None, None]
    )
    hstart = (
        ph[None, :, None] * bin_h[:, None, None]
        + y1[:, None, None]
        + ty * roi_h[:, None, None]
    )
    # sample grid (N, os, os, sp, sp)
    sx = wstart[..., None, None] + jnp.arange(sp)[None, None, None, None, :] \
        * sub_w[:, None, None, None, None]
    sy = hstart[..., None, None] + jnp.arange(sp)[None, None, None, :, None] \
        * sub_h[:, None, None, None, None]
    valid = (
        (sx >= -0.5) & (sx <= w - 0.5) & (sy >= -0.5) & (sy <= h - 0.5)
    )
    sx = jnp.clip(sx, 0.0, w - 1.0)
    sy = jnp.clip(sy, 0.0, h - 1.0)

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    x1c = jnp.ceil(sx)
    y1c = jnp.ceil(sy)
    fx = sx - x0
    fy = sy - y0

    # position-sensitive channel regroup: channel c of output bin
    # (ph, pw) reads input channel (c*gs + gh)*gs + gw
    gh = jnp.clip((ph * gs) // os_, 0, gs - 1)
    gw = jnp.clip((pw * gs) // os_, 0, gs - 1)
    # (os, os, out_channels) input-channel index table
    cidx = (
        (jnp.arange(out_channels)[None, None, :] * gs + gh[:, None, None])
        * gs
        + gw[None, :, None]
    )

    flat = feats.reshape(b, h * w, c_in)

    def corner(yi, xi):
        idx = (yi.astype(jnp.int32) * w + xi.astype(jnp.int32))
        # (N, os*os*sp*sp) gather rows from each roi's batch image
        v = flat[batch_idx[:, None], idx.reshape(n, -1)]
        return v.reshape(n, os_, os_, sp, sp, c_in)

    val = (
        corner(y0, x0) * ((1 - fy) * (1 - fx))[..., None]
        + corner(y1c, x0) * (fy * (1 - fx))[..., None]
        + corner(y0, x1c) * ((1 - fy) * fx)[..., None]
        + corner(y1c, x1c) * (fy * fx)[..., None]
    )
    val = val * valid[..., None]
    count = jnp.sum(valid, axis=(3, 4))  # (N, os, os)
    pooled = jnp.sum(val, axis=(3, 4)) / jnp.maximum(count, 1)[..., None]
    pooled = jnp.where(count[..., None] > 0, pooled, 0.0)
    # select the position-sensitive group per output channel
    return jnp.take_along_axis(
        pooled, cidx[None].repeat(n, 0), axis=-1
    ) if gs > 1 else pooled[..., :out_channels]


def deform_roi_pool_numpy(
    feats,
    rois,
    offsets=None,
    spatial_scale=1.0,
    out_size=7,
    sample_per_part=4,
    trans_std=0.0,
    group_size=1,
    part_size=None,
):
    """Scalar oracle of DeformablePSROIPoolForwardKernel (for tests)."""
    b, h, w, c_in = feats.shape
    gs = int(group_size)
    out_channels = c_in // (gs * gs)
    part = int(part_size) if part_size is not None else int(out_size)
    sp = int(sample_per_part)
    os_ = int(out_size)
    n = rois.shape[0]
    out = np.zeros((n, os_, os_, out_channels), np.float32)
    for i in range(n):
        bi = int(rois[i, 0])
        x1 = round(float(rois[i, 1])) * spatial_scale - 0.5
        y1 = round(float(rois[i, 2])) * spatial_scale - 0.5
        x2 = (round(float(rois[i, 3])) + 1.0) * spatial_scale - 0.5
        y2 = (round(float(rois[i, 4])) + 1.0) * spatial_scale - 0.5
        roi_w = max(x2 - x1, 0.1)
        roi_h = max(y2 - y1, 0.1)
        bin_w, bin_h = roi_w / os_, roi_h / os_
        sub_w, sub_h = bin_w / sp, bin_h / sp
        for phi in range(os_):
            for pwi in range(os_):
                if offsets is None:
                    tx = ty = 0.0
                else:
                    p_h = int(np.floor(phi / os_ * part))
                    p_w = int(np.floor(pwi / os_ * part))
                    tx = float(offsets[i, 0, p_h, p_w]) * trans_std
                    ty = float(offsets[i, 1, p_h, p_w]) * trans_std
                ws = pwi * bin_w + x1 + tx * roi_w
                hs = phi * bin_h + y1 + ty * roi_h
                gh = min(max(phi * gs // os_, 0), gs - 1)
                gw = min(max(pwi * gs // os_, 0), gs - 1)
                for c in range(out_channels):
                    cin = (c * gs + gh) * gs + gw
                    acc, cnt = 0.0, 0
                    for ih in range(sp):
                        for iw in range(sp):
                            sxx = ws + iw * sub_w
                            syy = hs + ih * sub_h
                            if (
                                sxx < -0.5 or sxx > w - 0.5
                                or syy < -0.5 or syy > h - 0.5
                            ):
                                continue
                            sxx = min(max(sxx, 0.0), w - 1.0)
                            syy = min(max(syy, 0.0), h - 1.0)
                            xf, yf = int(np.floor(sxx)), int(np.floor(syy))
                            xc, yc = int(np.ceil(sxx)), int(np.ceil(syy))
                            dx, dy = sxx - xf, syy - yf
                            v = (
                                (1 - dx) * (1 - dy) * feats[bi, yf, xf, cin]
                                + (1 - dx) * dy * feats[bi, yc, xf, cin]
                                + dx * (1 - dy) * feats[bi, yf, xc, cin]
                                + dx * dy * feats[bi, yc, xc, cin]
                            )
                            acc += float(v)
                            cnt += 1
                    out[i, phi, pwi, c] = acc / cnt if cnt else 0.0
    return out


class DeformRoIPoolingPack(nn.Module):
    """Deformable RoI pooling with a learned offset branch (reference
    modules/deform_pool.py DeformRoIPoolingPack): a no-trans pooling
    pass feeds `num_offset_fcs` FC layers (last zero-initialised) that
    predict per-bin offsets for the deformable pass.  `modulated=True`
    (ModulatedDeformRoIPoolingPack) adds `num_mask_fcs` FC layers
    producing a sigmoid per-bin mask multiplied into the output."""

    out_size: int = 7
    out_channels: int = 256
    spatial_scale: float = 1.0 / 16
    sample_per_part: int = 4
    trans_std: float = 0.1
    group_size: int = 1
    num_offset_fcs: int = 3
    num_mask_fcs: int = 2
    deform_fc_channels: int = 1024
    no_trans: bool = False
    modulated: bool = False
    dtype: any = jnp.float32

    @nn.compact
    def __call__(self, feats, rois):
        kw = dict(
            spatial_scale=self.spatial_scale,
            out_size=self.out_size,
            sample_per_part=self.sample_per_part,
            trans_std=self.trans_std,
            group_size=self.group_size,
        )
        if self.no_trans:
            return deform_roi_pool(feats, rois, None, **kw)
        n = rois.shape[0]
        x = deform_roi_pool(feats, rois, None, **kw)
        y = x.reshape(n, -1)
        for i in range(self.num_offset_fcs):
            last = i == self.num_offset_fcs - 1
            y = nn.Dense(
                self.out_size * self.out_size * 2
                if last
                else self.deform_fc_channels,
                kernel_init=nn.initializers.zeros
                if last
                else nn.initializers.lecun_normal(),
                dtype=self.dtype,
                name=f"offset_fc_{i}",
            )(y)
            if not last:
                y = nn.relu(y)
        # (N, 2, out, out): plane 0 = dx, plane 1 = dy (kernel order)
        offsets = y.reshape(n, 2, self.out_size, self.out_size)
        out = deform_roi_pool(feats, rois, offsets, **kw)
        if self.modulated:
            m = x.reshape(n, -1)
            for i in range(self.num_mask_fcs):
                last = i == self.num_mask_fcs - 1
                m = nn.Dense(
                    self.out_size * self.out_size
                    if last
                    else self.deform_fc_channels,
                    kernel_init=nn.initializers.zeros
                    if last
                    else nn.initializers.lecun_normal(),
                    dtype=self.dtype,
                    name=f"mask_fc_{i}",
                )(m)
                m = nn.sigmoid(m) if last else nn.relu(m)
            out = out * m.reshape(
                n, self.out_size, self.out_size, 1
            )
        return out
