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
    b, _, _, _, c = x.shape
    d, h, w = size
    # explicit gather — bit-exact torch 'nearest' semantics
    di = (jnp.arange(d) * (x.shape[1] / d)).astype(jnp.int32)
    hi = (jnp.arange(h) * (x.shape[2] / h)).astype(jnp.int32)
    wi = (jnp.arange(w) * (x.shape[3] / w)).astype(jnp.int32)
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
