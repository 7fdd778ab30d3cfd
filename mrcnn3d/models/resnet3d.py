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
import numpy as np
from flax import linen as nn

from .layers import FrozenBatchNorm, max_pool_3d

ARCH_SETTINGS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


def stem_conv_s2d(x, kernel):
    """7x7x7 stride-(1,2,2) stem conv via space-to-depth — bit-exact.

    The naive lowering of a 3-in/16-out 7^3 conv over a 512^2 x D volume
    is catastrophically memory-bound on TPU (measured ~148 ms vs ~28 ms
    for this formulation at 64x512x512).  Folding the 2x2 xy stride into
    channels turns it into a stride-1 (7,4,4) conv on 4x fewer spatial
    positions with 4x the input channels:

      out[o] = sum_k x[2o + k - 3] w[k]   (stride 2, pad 3)
             = sum_{u,p} x2[u, p] wf[u - o + 2, p]
      with x2[u, p] = x[2u + p] and wf[du, p] = w[2*du + p - 1]
      (zero when out of [0, 6]); u spans o-2..o+1 -> kernel 4, pad (2, 1).

    `kernel` keeps the original (7, 7, 7, 3, C) shape so checkpoints
    replay; the fold happens at trace time.
    """
    b, d, h, w, c = x.shape
    kd, kh, kw, cin, cout = kernel.shape
    assert (kd, kh, kw) == (7, 7, 7) and h % 2 == 0 and w % 2 == 0

    # fold input 2x2 xy blocks into channels: (b, d, h/2, w/2, 4c).
    # The transpose works on a (pw*c)-FUSED last axis — identical
    # element order, but its minor dim is 2c instead of c: the remote
    # backend 128-lane-pads any volume-scale tensor whose minor dim is
    # the raw 3-wide channel axis at layout-sensitive ops (42.7x bytes
    # — a whole-volume stem OOMs outright; PROFILE.md r5 follow-ups)
    x2 = x.reshape(b, d, h // 2, 2, w // 2, 2 * c)
    x2 = jnp.transpose(x2, (0, 1, 2, 4, 3, 5)).reshape(
        b, d, h // 2, w // 2, 4 * c
    )

    # fold kernel: wf[kd, uh, uw, (ph*2+pw)*c + cc, co]
    #            = w[kd, 2uh+ph-1, 2uw+pw-1, cc, co]
    wpad = jnp.pad(kernel, ((0, 0), (1, 0), (1, 0), (0, 0), (0, 0)))
    # wpad[kd, k+1, ...] == w[kd, k, ...]; index 2uh+ph maps into wpad
    wf = wpad.reshape(kd, 4, 2, 4, 2, cin, cout)
    wf = jnp.transpose(wf, (0, 1, 3, 2, 4, 5, 6)).reshape(
        kd, 4, 4, 4 * cin, cout
    )
    return jax.lax.conv_general_dilated(
        x2,
        wf,
        (1, 1, 1),
        [(3, 3), (2, 1), (2, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def stem_conv_s2d4(x, kernel):
    """7x7x7 stride-(1,2,2) stem conv via 4x4 space-to-depth — bit-exact.

    Deeper fold than `stem_conv_s2d`: 4x4 xy input blocks fold into 48
    channels and BOTH output phases of each block fold into 64 output
    channels, so the conv runs as (7,3,3) x (48 -> 64) on 16x fewer
    spatial positions — 48/64 channels use the MXU lanes ~4x better
    than the 12 -> 16 of the 2x2 fold (measured 73 ms -> see
    tools/bench_ops.py at 768^2x96).

      out[z, 2i+a, 2j+b, o]
        = sum_{kz,ky,kx,c} x[z+kz-3, 4i+(2a+ky-3), 4j+(2b+kx-3), c] w[...]
      with 2a+ky-3 = 4*du + py  (du in {-1,0,1}, py in 0..3)

    `kernel` keeps the original (7, 7, 7, 3, C) shape so checkpoints
    replay; the fold happens at trace time.
    """
    b, d, h, w, c = x.shape
    kd, kh, kw, cin, cout = kernel.shape
    assert (kd, kh, kw) == (7, 7, 7) and h % 4 == 0 and w % 4 == 0

    # fused (pw*c) last axis: same element order, minor dim 4c not c —
    # avoids the remote backend's 128-lane padding of volume-scale
    # minor-dim-3 transpose operands (see stem_conv_s2d)
    x4 = x.reshape(b, d, h // 4, 4, w // 4, 4 * c)
    x4 = jnp.transpose(x4, (0, 1, 2, 4, 3, 5)).reshape(
        b, d, h // 4, w // 4, 16 * c
    )

    # constant one-hot fold matrix M[(ky,kx), (du,dv,py,px,a,bb)] built
    # in numpy, applied as one tensordot (tracing 392 scatters is slow)
    m = np.zeros((kh * kw, 3, 3, 4, 4, 2, 2), np.float32)
    for a in range(2):
        for bb in range(2):
            for ky in range(kh):
                vy = 2 * a + ky - 3 + 4
                du, py = vy // 4, vy % 4
                for kx in range(kw):
                    vx = 2 * bb + kx - 3 + 4
                    dv, px = vx // 4, vx % 4
                    m[ky * kw + kx, du, dv, py, px, a, bb] = 1.0
    m = jnp.asarray(m.reshape(kh * kw, -1), kernel.dtype)
    wf = jnp.tensordot(
        kernel.reshape(kd, kh * kw, cin, cout), m, axes=(1, 0)
    )  # (kd, cin, cout, 3*3*4*4*2*2)
    wf = wf.reshape(kd, cin, cout, 3, 3, 4, 4, 2, 2)
    wf = jnp.transpose(wf, (0, 3, 4, 5, 6, 1, 7, 8, 2)).reshape(
        kd, 3, 3, 16 * cin, 4 * cout
    )
    out = jax.lax.conv_general_dilated(
        x4,
        wf,
        (1, 1, 1),
        [(3, 3), (1, 1), (1, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )  # (b, d, h/4, w/4, 4*cout), phases folded
    out = out.reshape(b, d, h // 4, w // 4, 2, 2, cout)
    out = jnp.transpose(out, (0, 1, 2, 4, 3, 5, 6)).reshape(
        b, d, h // 2, w // 2, cout
    )
    return out


class Bottleneck3D(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    with_downsample: bool = False
    two_d: bool = False
    dtype: Any = jnp.float32

    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        identity = x
        s = self.stride
        st = (1, s, s) if self.two_d else (s, s, s)
        k3 = (1, 3, 3) if self.two_d else (3, 3, 3)
        p3 = [(0, 0), (self.dilation, self.dilation),
              (self.dilation, self.dilation)] if self.two_d else self.dilation
        out = nn.Conv(
            self.planes, (1, 1, 1), use_bias=False, dtype=self.dtype,
            name="conv1",
        )(x)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.planes,
            k3,
            strides=st,
            padding=p3,
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
                strides=st,
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
    two_d: bool = False
    dtype: Any = jnp.float32

    expansion: int = 1

    @nn.compact
    def __call__(self, x):
        identity = x
        s = self.stride
        st = (1, s, s) if self.two_d else (s, s, s)
        k3 = (1, 3, 3) if self.two_d else (3, 3, 3)
        p3 = [(0, 0), (self.dilation, self.dilation),
              (self.dilation, self.dilation)] if self.two_d else self.dilation
        out = nn.Conv(
            self.planes,
            k3,
            strides=st,
            padding=p3,
            kernel_dilation=self.dilation,
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.planes, k3, padding=p3 if self.two_d else "SAME",
            use_bias=False, dtype=self.dtype, name="conv2",
        )(out)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn2")(out)
        if self.with_downsample:
            identity = nn.Conv(
                self.planes,
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


class _StemConv(nn.Module):
    """Stem 7^3 stride-(1,2,2) conv, evaluated via space-to-depth.

    Parameter layout matches nn.Conv (kernel (7,7,7,cin,cout) under
    'kernel'), so checkpoint conversion is unchanged.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, 7, x.shape[-1], self.features),
        )
        k = kernel.astype(self.dtype)
        if x.shape[2] % 4 == 0 and x.shape[3] % 4 == 0:
            # 4x4 fold: measured 2.1x faster than the 2x2 fold at the
            # 1.5x pathway geometry (72 -> 35 ms at 768^2x96 on v5e)
            return stem_conv_s2d4(x, k)
        return stem_conv_s2d(x, k)


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
    two_d: bool = False  # depth-1 mode: (1,k,k) kernels == exact 2-D convs
    # (Mesh, axis_name) to depth-shard the volume across chips: each
    # stage output is constrained to P(None, axis) while its depth axis
    # still divides the mesh axis, and explicitly replicated once it
    # shrinks below it.  The explicit fallback matters: leaving XLA's
    # SPMD partitioner to propagate a depth sharding onto stages with
    # fewer depth slices than shards miscompiles strided convs (empty
    # shards) — observed as >1e1 output error on the 8-device CPU mesh.
    spatial_shard: Any = None
    dtype: Any = jnp.float32

    def _constrain_depth(self, x, min_depth=None):
        """Constrain x to depth-sharded iff `min_depth` (the smallest
        depth any op consuming x will produce — i.e. x.shape[1] //
        next-stage stride) still divides the mesh axis; else replicate
        BEFORE the shrinking op runs."""
        if self.spatial_shard is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        # (mesh, depth_axis) or (mesh, depth_axis, batch_axis) — the
        # 3-tuple form keeps the batch dim sharded over `batch_axis`
        # (hybrid DP x depth over a 2-D mesh); the depth fallback must
        # then replicate only the spatial axes, never undo DP
        mesh, axis = self.spatial_shard[:2]
        baxis = (
            self.spatial_shard[2]
            if len(self.spatial_shard) > 2
            else None
        )
        n = mesh.shape[axis]
        depth = min_depth if min_depth is not None else x.shape[1]
        spec = (
            P(baxis, axis)
            if depth >= n and depth % n == 0 and x.shape[1] % n == 0
            else P(baxis)
        )
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, spec)
        )

    @nn.compact
    def __call__(self, x):
        block_name, stage_blocks = ARCH_SETTINGS[self.depth]
        stage_blocks = stage_blocks[: self.num_stages]
        block_cls = Bottleneck3D if block_name == "bottleneck" else BasicBlock3D
        if self.remat:
            block_cls = nn.remat(block_cls)
        kd = 1 if self.two_d else None  # None = isotropic 3-D

        x = x.astype(self.dtype)
        if self.two_d:
            # (1,7,7) stride (1,2,2) stem — the standard 2-D ResNet stem
            # evaluated on (B, 1, H, W, C) volumes (reference resnet.py)
            x = nn.Conv(
                self.base_width,
                (1, 7, 7),
                strides=(1, 2, 2),
                padding=[(0, 0), (3, 3), (3, 3)],
                use_bias=False,
                dtype=self.dtype,
                name="conv1",
            )(x)
        else:
            x = _StemConv(
                features=self.base_width, dtype=self.dtype, name="conv1"
            )(x)
        x = FrozenBatchNorm(dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        if self.two_d:
            x = max_pool_3d(
                x, (1, 3, 3), (1, 2, 2), [(0, 0), (1, 1), (1, 1)]
            )
        else:
            x = self._constrain_depth(x, min_depth=x.shape[1] // 2)
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
            x = self._constrain_depth(
                x,
                min_depth=x.shape[1] // (1 if self.two_d else stride),
            )
            for j in range(num_blocks):
                x = block_cls(
                    planes=planes,
                    stride=stride if j == 0 else 1,
                    dilation=dilation,
                    with_downsample=(
                        j == 0
                        and (stride != 1 or in_ch != planes * expansion)
                    ),
                    two_d=self.two_d,
                    dtype=self.dtype,
                    name=f"layer{i + 1}_{j}",
                )(x)
                in_ch = planes * expansion
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)
