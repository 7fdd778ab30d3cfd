"""Alternative backbones: UNet3D and ResNeXt3D.

Capability parity with the reference's secondary backbones:
  * UNet3D — 4-level 3-D U-Net returning FPN-compatible multi-scale maps
    (reference mmdet/models/backbones/unet3d.py returns a single fused
    map; here the decoder taps are exposed per scale so the same FPN3D /
    head stack applies).
  * ResNeXt3D — ResNet3D with grouped 3x3x3 convs (reference
    resnext3d.py mirrors resnet3d with groups); flax `feature_group_count`
    maps directly onto the grouped conv.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import FrozenBatchNorm, max_pool_3d
from .resnet3d import ARCH_SETTINGS


class UNet3D(nn.Module):
    base_channels: int = 16
    num_levels: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        skips = []
        c = self.base_channels
        for i in range(self.num_levels):
            for j in range(2):
                x = nn.Conv(
                    c * 2**i,
                    (3, 3, 3),
                    padding=1,
                    dtype=self.dtype,
                    name=f"enc{i}_conv{j}",
                )(x)
                x = nn.relu(x)
            skips.append(x)
            if i < self.num_levels - 1:
                x = max_pool_3d(x, (2, 2, 2), (2, 2, 2), "VALID")
        outs = [skips[-1]]
        for i in range(self.num_levels - 2, -1, -1):
            b, d, h, w, _ = skips[i].shape
            up = jnp.repeat(
                jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2), 2, axis=3
            )[:, :d, :h, :w]
            x = jnp.concatenate([up, skips[i]], axis=-1)
            for j in range(2):
                x = nn.Conv(
                    c * 2**i,
                    (3, 3, 3),
                    padding=1,
                    dtype=self.dtype,
                    name=f"dec{i}_conv{j}",
                )(x)
                x = nn.relu(x)
            outs.append(x)
        # coarse -> fine decoder taps, reordered fine -> coarse for FPN
        return tuple(reversed(outs))


class BottleneckX3D(nn.Module):
    planes: int
    stride: int = 1
    groups: int = 32
    base_width: int = 4
    with_downsample: bool = False
    two_d: bool = False  # depth-1 mode: (1,k,k) kernels == 2-D ResNeXt
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        s = self.stride
        st = (1, s, s) if self.two_d else (s, s, s)
        k3 = (1, 3, 3) if self.two_d else (3, 3, 3)
        p3 = [(0, 0), (1, 1), (1, 1)] if self.two_d else 1
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        width = max(width, self.groups)
        out = nn.Conv(
            width, (1, 1, 1), use_bias=False, dtype=self.dtype, name="conv1"
        )(x)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(
            width,
            k3,
            strides=st,
            padding=p3,
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(out)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.planes * 4,
            (1, 1, 1),
            use_bias=False,
            dtype=self.dtype,
            name="conv3",
        )(out)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn3")(out)
        if self.with_downsample:
            identity = nn.Conv(
                self.planes * 4,
                (1, 1, 1),
                strides=st,
                use_bias=False,
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            identity = FrozenBatchNorm(
                dtype=self.dtype, name="downsample_bn"
            )(identity)
        return nn.relu(out + identity)


class ResNeXt3D(nn.Module):
    depth: int = 50
    groups: int = 32
    base_width: int = 4
    width: int = 16
    out_indices: Sequence[int] = (0, 1, 2, 3)
    two_d: bool = False  # depth-1 mode: the 2-D legacy ResNeXt
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        _, stage_blocks = ARCH_SETTINGS[self.depth]
        x = x.astype(self.dtype)
        k7 = (1, 7, 7) if self.two_d else (7, 7, 7)
        p7 = [(0, 0), (3, 3), (3, 3)] if self.two_d else 3
        x = nn.Conv(
            self.width,
            k7,
            strides=(1, 2, 2),
            padding=p7,
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        x = FrozenBatchNorm(dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        if self.two_d:
            x = max_pool_3d(
                x, (1, 3, 3), (1, 2, 2), [(0, 0), (1, 1), (1, 1)]
            )
        else:
            x = max_pool_3d(
                x, (3, 3, 3), (2, 2, 2), [(1, 1), (1, 1), (1, 1)]
            )
        outs = []
        in_ch = self.width
        strides = (1, 2, 2, 2)
        for i, nblocks in enumerate(stage_blocks[:4]):
            planes = self.width * 2**i
            for j in range(nblocks):
                x = BottleneckX3D(
                    planes=planes,
                    stride=strides[i] if j == 0 else 1,
                    groups=self.groups,
                    base_width=self.base_width,
                    two_d=self.two_d,
                    with_downsample=(
                        j == 0 and (strides[i] != 1 or in_ch != planes * 4)
                    ),
                    dtype=self.dtype,
                    name=f"layer{i + 1}_{j}",
                )(x)
                in_ch = planes * 4
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)


class L2Norm(nn.Module):
    """Per-channel L2 normalisation with learned scale (reference
    ssd_vgg.py:119-134, init scale 20)."""

    scale: float = 20.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weight",
            lambda k, s: jnp.full(s, self.scale, jnp.float32),
            (x.shape[-1],),
        )
        norm = jnp.sqrt(
            jnp.sum(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
            + 1e-10
        )
        return (x / norm.astype(x.dtype)) * w.astype(x.dtype)


# extra-layer channel plans per input size (reference ssd_vgg.py:16-17)
_SSD_EXTRA = {
    300: (256, "S", 512, 128, "S", 256, 128, 256, 128, 256),
    512: (256, "S", 512, 128, "S", 256, 128, "S", 256, 128, "S", 256),
}
_VGG16_PLAN = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))


class SSDVGG(nn.Module):
    """SSD's VGG16 backbone, evaluated in depth-1 (2-D family) mode
    (reference mmdet/models/backbones/ssd_vgg.py:13-117).

    Structure: VGG16 convs with ceil-mode 2x2 pools, pool5 3x3 stride 1,
    dilated fc6 (3x3, dilation 6, 1024ch) + fc7 (1x1, 1024ch), then the
    SSD extra pyramid (alternating 1x1 / stride-2 3x3 convs).  Outputs:
    L2Norm(conv4_3), fc7, and every second extra layer — 6 maps for
    input 300 (38/19/10/5/3/1), 7 for input 512.
    """

    input_size: int = 300
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        outs = []
        li = 0
        for si, (n_convs, ch) in enumerate(_VGG16_PLAN):
            for _ in range(n_convs):
                x = nn.relu(
                    nn.Conv(
                        ch,
                        (1, 3, 3),
                        padding=[(0, 0), (1, 1), (1, 1)],
                        dtype=self.dtype,
                        name=f"features_{li}",
                    )(x)
                )
                li += 2  # conv + relu in the torch indexing
            if si == 3:
                outs.append(x)  # conv4_3 (pre-pool), stride 8
            if si < 4:
                # ceil-mode 2x2 pool: pad odd extents with -inf on the right
                h, w = x.shape[2], x.shape[3]
                x = max_pool_3d(
                    x,
                    (1, 2, 2),
                    (1, 2, 2),
                    [(0, 0), (0, h % 2), (0, w % 2)],
                )
                li += 1
            else:
                # pool5: 3x3 stride 1 pad 1 (ssd_vgg.py:35-37)
                x = max_pool_3d(
                    x, (1, 3, 3), (1, 1, 1), [(0, 0), (1, 1), (1, 1)]
                )
        # fc6 (dilated) + fc7 (ssd_vgg.py:38-46)
        x = nn.relu(
            nn.Conv(
                1024,
                (1, 3, 3),
                padding=[(0, 0), (6, 6), (6, 6)],
                kernel_dilation=(1, 6, 6),
                dtype=self.dtype,
                name="fc6",
            )(x)
        )
        x = nn.relu(
            nn.Conv(1024, (1, 1, 1), dtype=self.dtype, name="fc7")(x)
        )
        outs.append(x)
        # extra pyramid (ssd_vgg.py:92-117)
        plan = _SSD_EXTRA[self.input_size]
        i = 0
        ei = 0
        while i < len(plan):
            if plan[i] == "S":
                x = nn.relu(
                    nn.Conv(
                        plan[i + 1],
                        (1, 3, 3),
                        strides=(1, 2, 2),
                        padding=[(0, 0), (1, 1), (1, 1)],
                        dtype=self.dtype,
                        name=f"extra_{ei}",
                    )(x)
                )
                i += 2
            else:
                k = 1 if ei % 2 == 0 else 3
                x = nn.relu(
                    nn.Conv(
                        plan[i],
                        (1, k, k),
                        padding=[(0, 0), (0, 0), (0, 0)],
                        dtype=self.dtype,
                        name=f"extra_{ei}",
                    )(x)
                )
                i += 1
            if ei % 2 == 1:
                outs.append(x)
            ei += 1
        if self.input_size == 512:
            x = nn.relu(
                nn.Conv(
                    256,
                    (1, 4, 4),
                    padding=[(0, 0), (1, 1), (1, 1)],
                    dtype=self.dtype,
                    name=f"extra_{ei}",
                )(x)
            )
            outs.append(x)
        outs[0] = L2Norm(dtype=self.dtype, name="l2_norm")(outs[0])
        return tuple(outs)
