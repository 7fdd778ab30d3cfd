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


def max_pool_3d(x, window, strides, padding):
    """Channel-last 3-D max pool with -inf padding (torch semantics)."""
    return nn.max_pool(
        x,
        window_shape=window,
        strides=strides,
        padding=padding,
    )
