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
