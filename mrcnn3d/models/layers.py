"""Shared NN building blocks (flax.linen, channel-last NDHWC).

The reference stacks torch NCDHW Conv3d + BatchNorm3d modules
(mmdet/models/utils/conv_module3d.py, norm.py); here everything is
channel-last for TPU conv efficiency and BatchNorm is implemented as
"frozen" normalisation: the reference trains with `norm_eval=True`
(resnet3d.py:480-486) so running statistics are *never updated* during
training — on TPU that collapses to an affine transform with stored
(mean, var) buffers, which also removes any cross-device batch-stat
synchronisation from the train step.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class FrozenBatchNorm(nn.Module):
    """BatchNorm evaluated with stored statistics (never updated).

    Matches the reference's BN3D-with-norm_eval semantics: scale/bias are
    trainable params, mean/var live in the `batch_stats` collection and are
    only modified by checkpoint loading.
    """

    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        mean = self.variable(
            "batch_stats", "mean", nn.initializers.zeros, None, (features,)
        )
        var = self.variable(
            "batch_stats", "var", nn.initializers.ones, None, (features,)
        )
        inv = jax.lax.rsqrt(var.value + self.epsilon) * scale
        y = (x - mean.value) * inv + bias
        return y.astype(self.dtype)


class ConvModule3D(nn.Module):
    """conv3d [+ frozen BN] [+ ReLU] (reference conv_module3d.py:139-220)."""

    features: int
    kernel_size: Sequence[int] | int = 3
    strides: Sequence[int] | int = 1
    padding: Any = "SAME"
    use_bias: bool = True
    use_norm: bool = False
    activation: Callable | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        ks = self.kernel_size
        if isinstance(ks, int):
            ks = (ks, ks, ks)
        st = self.strides
        if isinstance(st, int):
            st = (st, st, st)
        x = nn.Conv(
            self.features,
            ks,
            strides=st,
            padding=self.padding,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.use_norm:
            x = FrozenBatchNorm(dtype=self.dtype, name="bn")(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


def _norm_pad(padding, window):
    if isinstance(padding, str):
        if padding.upper() == "VALID":
            return ((0, 0),) * len(window)
        raise ValueError(f"unsupported padding {padding}")
    return tuple((int(lo), int(hi)) for lo, hi in padding)


def _max_pool_fwd_raw(x, window, strides, pad):
    neg = jnp.asarray(-jnp.inf, x.dtype)
    return jax.lax.reduce_window(
        x,
        neg,
        jax.lax.max,
        (1,) + tuple(window) + (1,),
        (1,) + tuple(strides) + (1,),
        ((0, 0),) + tuple(pad) + ((0, 0),),
    )


def max_pool_3d(x, window, strides, padding):
    """Channel-last 3-D max pool with -inf padding (torch semantics).

    Custom VJP: XLA's default max-pool transpose is select-and-scatter,
    which profiled at 16.6 ms/step on v5e — 12% of the whole train step
    (PROFILE.md).  The backward here replicates its first-match routing
    (gradient to the first maximal element in window scan order, the
    same rule as the torch CUDA kernel) with dense ops only: per window
    offset, compare the strided input slice against the pooled output,
    claim unmatched wins, and accumulate the output grad into the input
    via interior-padded (dilated) adds.  27 dense passes for the stem's
    3x3x3 window instead of one serial scatter.
    """
    return _max_pool_3d_cv(
        x, tuple(window), tuple(strides), _norm_pad(padding, window)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _max_pool_3d_cv(x, window, strides, pad):
    return _max_pool_fwd_raw(x, window, strides, pad)


def _max_pool_3d_fwd(x, window, strides, pad):
    y = _max_pool_fwd_raw(x, window, strides, pad)
    return y, (x, y)


def _max_pool_3d_bwd(window, strides, pad, res, g):
    """Dense first-match max-pool backward in phase (space-to-depth) space.

    Strided slices / interior-dilated pads lower to TPU gathers and
    full-size pad buffers (measured 78 ms/step); splitting each spatial
    axis into `stride` phases turns every window offset into a UNIT
    slice of the phase tensor and every grad accumulation into a
    block-sized unit pad — all dense, layout-friendly ops.
    """
    x, y = res
    b, d, h, w, c = x.shape
    od, oh, ow = y.shape[1:4]
    outs = (od, oh, ow)
    neg = jnp.asarray(-jnp.inf, x.dtype)

    # per-axis phase geometry: offset k -> (block k//s, phase k%s);
    # padded length rounded up to a multiple of s covering every block
    nblk, padded = [], []
    for i in range(3):
        s = strides[i]
        need = (window[i] - 1) // s + outs[i]  # blocks required
        nblk.append(need)
        padded.append(need * s)
    # lax.pad: the high edge may be negative (trims VALID-mode leftovers)
    xp = jax.lax.pad(
        x,
        neg,
        [(0, 0, 0)]
        + [
            (pad[i][0], padded[i] - pad[i][0] - (d, h, w)[i], 0)
            for i in range(3)
        ]
        + [(0, 0, 0)],
    )
    # (b, zb, sz, yb, sy, xb, sx, c)
    x8 = xp.reshape(
        b,
        nblk[0], strides[0],
        nblk[1], strides[1],
        nblk[2], strides[2],
        c,
    )

    matched = jnp.zeros(y.shape, bool)
    # accumulate grads per phase combination: dict keyed by phases,
    # value shaped (b, zb, yb, xb, c)
    acc = {}
    for kz in range(window[0]):
        for ky in range(window[1]):
            for kx in range(window[2]):
                oz, pz = kz // strides[0], kz % strides[0]
                oy, py = ky // strides[1], ky % strides[1]
                ox, px = kx // strides[2], kx % strides[2]
                xw = x8[
                    :, oz : oz + od, pz, oy : oy + oh, py,
                    ox : ox + ow, px, :,
                ]
                eq = xw == y
                use = eq & ~matched
                matched = matched | eq
                contrib = jnp.where(use, g, 0)
                blockpad = jax.lax.pad(
                    contrib,
                    jnp.asarray(0, g.dtype),
                    [
                        (0, 0, 0),
                        (oz, nblk[0] - oz - od, 0),
                        (oy, nblk[1] - oy - oh, 0),
                        (ox, nblk[2] - ox - ow, 0),
                        (0, 0, 0),
                    ],
                )
                key = (pz, py, px)
                acc[key] = (
                    blockpad if key not in acc else acc[key] + blockpad
                )
    zero_blocks = jnp.zeros(
        (b, nblk[0], nblk[1], nblk[2], c), g.dtype
    )
    phases = [
        acc.get((pz, py, px), zero_blocks)
        for pz in range(strides[0])
        for py in range(strides[1])
        for px in range(strides[2])
    ]
    # (b, zb, yb, xb, sz*sy*sx, c) -> (b, zb, sz, yb, sy, xb, sx, c)
    dx8 = jnp.stack(phases, axis=4).reshape(
        b, nblk[0], nblk[1], nblk[2],
        strides[0], strides[1], strides[2], c,
    )
    dx8 = jnp.transpose(dx8, (0, 1, 4, 2, 5, 3, 6, 7))
    dxp = dx8.reshape(b, padded[0], padded[1], padded[2], c)
    # undo the input padding: negative low/high trim the -inf borders,
    # positive high re-extends a VALID-mode trim with zeros
    dx = jax.lax.pad(
        dxp,
        jnp.asarray(0, g.dtype),
        [(0, 0, 0)]
        + [
            (
                -pad[i][0],
                (d, h, w)[i] - (padded[i] - pad[i][0]),
                0,
            )
            for i in range(3)
        ]
        + [(0, 0, 0)],
    )
    return (dx,)


_max_pool_3d_cv.defvjp(_max_pool_3d_fwd, _max_pool_3d_bwd)
