"""FPN3D neck (flax, channel-last).

Parity with reference mmdet/models/necks/fpn3d.py:10-134:
  * 1×1×1 lateral convs (bias, no norm) + top-down *nearest* interpolation
    to the explicit lateral size (handles odd depths, :107-108)
  * 3×3×3 output convs
  * extra pyramid levels via stride-2 subsampling — the reference's
    max_pool3d(kernel=1, stride=2) (:123) is exactly x[::2, ::2, ::2]
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _nearest_resize(x, size):
    """Nearest-neighbour resize of (B, D, H, W, C) to spatial `size`.

    torch F.interpolate(mode='nearest') maps output index i to input index
    floor(i * in/out); jax.image.resize('nearest') matches this for integer
    upscale factors used here (2× with possible odd-size truncation).
    """
    b, sd, sh, sw, c = x.shape
    d, h, w = size
    if d % sd == 0 and h % sh == 0 and w % sw == 0:
        # exact integer upscale: floor(i * in/out) == i // k, so nearest
        # == k-fold repeat — a broadcast instead of three chained
        # gathers over the full map (one memory pass, no gather)
        fd, fh, fw = d // sd, h // sh, w // sw
        x = jnp.broadcast_to(
            x[:, :, None, :, None, :, None, :],
            (b, sd, fd, sh, fh, sw, fw, c),
        )
        return x.reshape(b, d, h, w, c)
    # explicit gather — bit-exact torch 'nearest' semantics
    di = (jnp.arange(d) * (sd / d)).astype(jnp.int32)
    hi = (jnp.arange(h) * (sh / h)).astype(jnp.int32)
    wi = (jnp.arange(w) * (sw / w)).astype(jnp.int32)
    return x[:, di][:, :, hi][:, :, :, wi]


class FPN3D(nn.Module):
    out_channels: int = 64
    num_outs: int = 5
    start_level: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]):
        used = len(inputs) - self.start_level
        laterals = [
            nn.Conv(
                self.out_channels,
                (1, 1, 1),
                use_bias=True,
                dtype=self.dtype,
                name=f"lateral_{i}",
            )(inputs[i + self.start_level])
            for i in range(used)
        ]
        for i in range(used - 1, 0, -1):
            target = laterals[i - 1].shape[1:4]
            laterals[i - 1] = laterals[i - 1] + _nearest_resize(
                laterals[i], target
            )
        outs = [
            nn.Conv(
                self.out_channels,
                (3, 3, 3),
                padding=1,
                use_bias=True,
                dtype=self.dtype,
                name=f"fpn_{i}",
            )(laterals[i])
            for i in range(used)
        ]
        while len(outs) < self.num_outs:
            outs.append(outs[-1][:, ::2, ::2, ::2, :])
        return tuple(outs)


class FPN3D2Scales(nn.Module):
    """Fused two-resolution FPN (reference necks/fpn3d_2scales.py:10-188).

    The two pathways' backbone stages are INTERLEAVED into a single
    top-down chain ordered coarse-to-fine by actual resolution:
    [lat2_0, lat_0, lat2_1, lat_1, ...] where lat2_i comes from the 1.5x
    inputs (even slots, :153-161) — so information flows from each 1.0x
    level into the next-finer 1.5x level.  Per-slot 1x1x1 laterals and
    3x3x3 output convs (2 per backbone stage, :76-115); nearest top-down
    resize to the explicit next-lateral size (the reference precomputes
    those sizes from input1_size/input2_size; static shapes make them
    directly readable here); extra levels subsample outs[-2] —
    the reference's max_pool3d(1, stride 2) on outs[-2], not outs[-1]
    (:187).  Returns 2*L (+extras) maps, finest last-interleaved order
    preserved.
    """

    out_channels: int = 64
    num_outs: int = 8
    start_level: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, inputs_2):
        used = len(inputs) - self.start_level
        laterals = []
        for i in range(used):
            src2 = inputs_2[i + self.start_level]
            src1 = inputs[i + self.start_level]
            laterals.append(
                nn.Conv(
                    self.out_channels, (1, 1, 1), use_bias=True,
                    dtype=self.dtype, name=f"lateral_{2 * i}",
                )(src2)
            )
            laterals.append(
                nn.Conv(
                    self.out_channels, (1, 1, 1), use_bias=True,
                    dtype=self.dtype, name=f"lateral_{2 * i + 1}",
                )(src1)
            )
        n = len(laterals)
        for i in range(n - 1, 0, -1):
            target = laterals[i - 1].shape[1:4]
            laterals[i - 1] = laterals[i - 1] + _nearest_resize(
                laterals[i], target
            )
        outs = [
            nn.Conv(
                self.out_channels, (3, 3, 3), padding=1, use_bias=True,
                dtype=self.dtype, name=f"fpn_{i}",
            )(laterals[i])
            for i in range(n)
        ]
        while len(outs) < self.num_outs:
            outs.append(outs[-2][:, ::2, ::2, ::2, :])
        return tuple(outs)
