"""ResNet3D backbone (flax, channel-last).

Architecture parity with the reference `ResNet3D`
(mmdet/models/backbones/resnet3d.py:313-486):
  * width-16 base (not 64): stage planes 16/32/64/128, Bottleneck ×4
    expansion → stage outputs 64/128/256/512 channels (:358,:369)
  * stem Conv3d(3→16, k7, stride (1,2,2)) — no depth downsampling (:398)
  * isotropic MaxPool3d(3, stride 2, pad 1) (:409)
  * pytorch-style Bottleneck (stride on the 3×3×3 conv) (resnet3d.py:112)
  * frozen BatchNorm (norm_eval=True, :480-486)
  * feature strides: xy {4, 8, 16, 32}, depth {2, 4, 8, 16}

Optional `remat` wraps each residual stage in jax.checkpoint — the TPU
equivalent of the reference's unused `with_cp` torch.utils.checkpoint
plumbing (:228-231), here a first-class memory/compute trade-off for
whole-volume inference and large-crop training.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import FrozenBatchNorm, max_pool_3d

ARCH_SETTINGS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class Bottleneck3D(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    with_downsample: bool = False
    dtype: Any = jnp.float32

    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        identity = x
        s = self.stride
        out = nn.Conv(
            self.planes, (1, 1, 1), use_bias=False, dtype=self.dtype,
            name="conv1",
        )(x)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.planes,
            (3, 3, 3),
            strides=(s, s, s),
            padding=self.dilation,
            kernel_dilation=self.dilation,
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(out)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.planes * self.expansion,
            (1, 1, 1),
            use_bias=False,
            dtype=self.dtype,
            name="conv3",
        )(out)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn3")(out)
        if self.with_downsample:
            identity = nn.Conv(
                self.planes * self.expansion,
                (1, 1, 1),
                strides=(s, s, s),
                use_bias=False,
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            identity = FrozenBatchNorm(
                dtype=self.dtype, name="downsample_bn"
            )(identity)
        return nn.relu(out + identity)


class BasicBlock3D(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    with_downsample: bool = False
    dtype: Any = jnp.float32

    expansion: int = 1

    @nn.compact
    def __call__(self, x):
        identity = x
        s = self.stride
        out = nn.Conv(
            self.planes,
            (3, 3, 3),
            strides=(s, s, s),
            padding=self.dilation,
            kernel_dilation=self.dilation,
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.planes, (3, 3, 3), use_bias=False, dtype=self.dtype,
            name="conv2",
        )(out)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn2")(out)
        if self.with_downsample:
            identity = nn.Conv(
                self.planes,
                (1, 1, 1),
                strides=(s, s, s),
                use_bias=False,
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            identity = FrozenBatchNorm(
                dtype=self.dtype, name="downsample_bn"
            )(identity)
        return nn.relu(out + identity)


class ResNet3D(nn.Module):
    """ResNet3D backbone returning a tuple of stage feature maps.

    Args mirror the reference ctor (depth/num_stages/strides/dilations/
    out_indices); input is (B, D, H, W, 3) channel-last.
    """

    depth: int = 50
    num_stages: int = 4
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    base_width: int = 16
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        block_name, stage_blocks = ARCH_SETTINGS[self.depth]
        stage_blocks = stage_blocks[: self.num_stages]
        block_cls = Bottleneck3D if block_name == "bottleneck" else BasicBlock3D
        if self.remat:
            block_cls = nn.remat(block_cls)

        x = x.astype(self.dtype)
        x = nn.Conv(
            self.base_width,
            (7, 7, 7),
            strides=(1, 2, 2),
            padding=3,
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        x = FrozenBatchNorm(dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = max_pool_3d(
            x, (3, 3, 3), (2, 2, 2), [(1, 1), (1, 1), (1, 1)]
        )

        outs = []
        in_ch = self.base_width
        for i, num_blocks in enumerate(stage_blocks):
            planes = self.base_width * 2**i
            stride = self.strides[i]
            dilation = self.dilations[i]
            expansion = 4 if block_name == "bottleneck" else 1
            for j in range(num_blocks):
                x = block_cls(
                    planes=planes,
                    stride=stride if j == 0 else 1,
                    dilation=dilation,
                    with_downsample=(
                        j == 0
                        and (stride != 1 or in_ch != planes * expansion)
                    ),
                    dtype=self.dtype,
                    name=f"layer{i + 1}_{j}",
                )(x)
                in_ch = planes * expansion
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)
