"""Detection heads (flax, channel-last).

  * RPNHead3D — reference mmdet/models/anchor_heads/rpn_head_3d.py:15-35:
    3×3×3 conv + ReLU, then 1×1×1 cls (A*1 sigmoid) and reg (A*6) convs.
  * SharedFCBBoxHead3D — reference convfc_bbox_head_3d.py (SharedFC
    variant): flatten RoI features, 2× fc(1024)+ReLU, fc_cls(num_classes),
    fc_reg(6*num_classes).
  * SharedFCBBoxHead3DRefinement — regression-only twin (reference
    bbox_head_3d_refinement.py / convfc_bbox_head_3d_refinement_head.py).
  * FCNMaskHead3D — reference fcn_mask_head_3d.py:16-98: 4× 3×3×3 conv
    (+bias +ReLU), 2× deconv upsample + ReLU, 1×1×1 per-class logits.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class RPNHead3D(nn.Module):
    feat_channels: int = 64
    num_anchors: int = 1
    cls_out_channels: int = 1  # sigmoid cls
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.feat_channels,
            (3, 3, 3),
            padding=1,
            dtype=self.dtype,
            name="rpn_conv",
        )(x)
        x = nn.relu(x)
        cls = nn.Conv(
            self.num_anchors * self.cls_out_channels,
            (1, 1, 1),
            dtype=self.dtype,
            name="rpn_cls",
        )(x)
        reg = nn.Conv(
            self.num_anchors * 6, (1, 1, 1), dtype=self.dtype, name="rpn_reg"
        )(x)
        return cls, reg


class SharedFCBBoxHead3D(nn.Module):
    """Shared-FC bbox head; `num_parcellations > 0` adds the 15-way
    brain-region branch (reference bbox_head_3d_parcel.py:52,72-73)."""

    num_fcs: int = 2
    fc_out_channels: int = 1024
    num_classes: int = 2
    reg_class_agnostic: bool = False
    with_cls: bool = True
    num_parcellations: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (N, Dp, Hp, Wp, C) pooled RoI features
        x = x.reshape(x.shape[0], -1)
        for i in range(self.num_fcs):
            x = nn.Dense(
                self.fc_out_channels, dtype=self.dtype, name=f"shared_fc_{i}"
            )(x)
            x = nn.relu(x)
        cls_score = (
            nn.Dense(self.num_classes, dtype=self.dtype, name="fc_cls")(x)
            if self.with_cls
            else None
        )
        out_reg = 6 if self.reg_class_agnostic else 6 * self.num_classes
        bbox_pred = nn.Dense(out_reg, dtype=self.dtype, name="fc_reg")(x)
        if self.num_parcellations > 0:
            parcel = nn.Dense(
                self.num_parcellations,
                dtype=self.dtype,
                name="fc_parcellations",
            )(x)
            return cls_score, bbox_pred, parcel
        return cls_score, bbox_pred


class SharedFCBBoxHead3DRefinement(nn.Module):
    """Regression-only refinement head (no classification branch)."""

    num_fcs: int = 2
    fc_out_channels: int = 1024
    num_classes: int = 2
    reg_class_agnostic: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        for i in range(self.num_fcs):
            x = nn.Dense(
                self.fc_out_channels, dtype=self.dtype, name=f"shared_fc_{i}"
            )(x)
            x = nn.relu(x)
        out_reg = 6 if self.reg_class_agnostic else 6 * self.num_classes
        return nn.Dense(out_reg, dtype=self.dtype, name="fc_reg")(x)


class FCNMaskHead3D(nn.Module):
    num_convs: int = 4
    conv_out_channels: int = 64
    num_classes: int = 2
    upsample_ratio: int = 2
    two_d: bool = False  # depth-1 mode: (1,k,k) convs, (1,r,r) deconv
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (N, Dp, Hp, Wp, C)
        k3 = (1, 3, 3) if self.two_d else (3, 3, 3)
        p3 = [(0, 0), (1, 1), (1, 1)] if self.two_d else 1
        for i in range(self.num_convs):
            x = nn.Conv(
                self.conv_out_channels,
                k3,
                padding=p3,
                use_bias=True,
                dtype=self.dtype,
                name=f"conv_{i}",
            )(x)
            x = nn.relu(x)
        r = self.upsample_ratio
        kr = (1, r, r) if self.two_d else (r, r, r)
        x = nn.ConvTranspose(
            self.conv_out_channels,
            kr,
            strides=kr,
            dtype=self.dtype,
            name="upsample",
        )(x)
        x = nn.relu(x)
        logits = nn.Conv(
            self.num_classes, (1, 1, 1), dtype=self.dtype, name="conv_logits"
        )(x)
        # (N, Dm, Hm, Wm, num_classes) -> (N, num_classes, Dm, Hm, Wm)
        return jnp.moveaxis(logits, -1, 1)


class HTCMaskHead3D(nn.Module):
    """HTC mask head with mask-information flow (reference
    mmdet/models/mask_heads/htc_mask_head.py:7-38): an FCN mask head whose
    input can be fused with the previous stage's mask features through a
    1x1x1 `conv_res`.  Returns (logits, stage_feat); logits is None when
    `return_logits` is False (info-flow-only forward).
    """

    num_convs: int = 4
    conv_out_channels: int = 64
    num_classes: int = 2
    upsample_ratio: int = 2
    two_d: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, res_feat=None, return_logits=True):
        k3 = (1, 3, 3) if self.two_d else (3, 3, 3)
        p3 = [(0, 0), (1, 1), (1, 1)] if self.two_d else 1
        if res_feat is not None:
            x = x + nn.Conv(
                self.conv_out_channels,
                (1, 1, 1),
                dtype=self.dtype,
                name="conv_res",
            )(res_feat)
        for i in range(self.num_convs):
            x = nn.Conv(
                self.conv_out_channels,
                k3,
                padding=p3,
                use_bias=True,
                dtype=self.dtype,
                name=f"conv_{i}",
            )(x)
            x = nn.relu(x)
        feat = x
        if not return_logits:
            return None, feat
        r = self.upsample_ratio
        kr = (1, r, r) if self.two_d else (r, r, r)
        x = nn.ConvTranspose(
            self.conv_out_channels,
            kr,
            strides=kr,
            dtype=self.dtype,
            name="upsample",
        )(x)
        x = nn.relu(x)
        logits = nn.Conv(
            self.num_classes, (1, 1, 1), dtype=self.dtype, name="conv_logits"
        )(x)
        return jnp.moveaxis(logits, -1, 1), feat


class FusedSemanticHead3D(nn.Module):
    """Multi-level fused semantic branch (reference fused_semantic_head.py):
    per-level 1x1x1 laterals summed at `fusion_level` resolution (others
    trilinearly resized), num_convs 3x3x3 convs, then a 1x1x1 class-logit
    conv and a 1x1x1 embedding conv whose output is the fusion feature.
    """

    num_ins: int = 5
    fusion_level: int = 1
    num_convs: int = 4
    conv_out_channels: int = 64
    num_classes: int = 2
    two_d: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        k3 = (1, 3, 3) if self.two_d else (3, 3, 3)
        p3 = [(0, 0), (1, 1), (1, 1)] if self.two_d else 1
        fl = self.fusion_level
        x = nn.Conv(
            feats[fl].shape[-1],
            (1, 1, 1),
            dtype=self.dtype,
            name=f"lateral_{fl}",
        )(feats[fl])
        size = x.shape[1:4]
        for i, f in enumerate(feats[: self.num_ins]):
            if i == fl:
                continue
            lat = nn.Conv(
                f.shape[-1], (1, 1, 1), dtype=self.dtype, name=f"lateral_{i}"
            )(f)
            lat = jax.image.resize(
                lat,
                (lat.shape[0],) + size + (lat.shape[-1],),
                method="trilinear",
            )
            x = x + lat
        for i in range(self.num_convs):
            x = nn.relu(
                nn.Conv(
                    self.conv_out_channels,
                    k3,
                    padding=p3,
                    dtype=self.dtype,
                    name=f"conv_{i}",
                )(x)
            )
        logits = nn.Conv(
            self.num_classes, (1, 1, 1), dtype=self.dtype, name="conv_logits"
        )(x)
        embedding = nn.Conv(
            self.conv_out_channels,
            (1, 1, 1),
            dtype=self.dtype,
            name="conv_embedding",
        )(x)
        return logits, embedding


class SSDHead(nn.Module):
    """SSD multi-level predictor (reference anchor_heads/ssd_head.py:14-47):
    per-level 3x3 cls/reg convs with per-level anchor counts and softmax
    classification over `num_classes` (background included).  Operates on
    depth-1 volumes in the 2-D family; `num_anchors` lists anchors per
    level.  The loss (softmax CE + 3:1 ranked hard-negative mining) lives
    in detectors/pipeline.ssd_loss.
    """

    num_anchors: Sequence[int] = (4, 6, 6, 6, 4, 4)
    num_classes: int = 2
    two_d: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        k3 = (1, 3, 3) if self.two_d else (3, 3, 3)
        p3 = [(0, 0), (1, 1), (1, 1)] if self.two_d else 1
        outs = []
        for i, (f, a) in enumerate(zip(feats, self.num_anchors)):
            cls = nn.Conv(
                a * self.num_classes,
                k3,
                padding=p3,
                dtype=self.dtype,
                name=f"cls_conv_{i}",
            )(f)
            reg = nn.Conv(
                a * 6, k3, padding=p3, dtype=self.dtype, name=f"reg_conv_{i}"
            )(f)
            outs.append((cls, reg))
        return tuple(outs)


class RetinaHead3D(nn.Module):
    """Single-stage anchor head (reference retina_head.py, lifted to 6-DoF):
    4-conv cls/reg towers + per-anchor class-aware sigmoid logits."""

    feat_channels: int = 64
    stacked_convs: int = 4
    num_anchors: int = 1
    cls_out_channels: int = 1  # num_classes - 1 (sigmoid, focal loss)
    two_d: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k3 = (1, 3, 3) if self.two_d else (3, 3, 3)
        p3 = [(0, 0), (1, 1), (1, 1)] if self.two_d else 1
        c = x
        r = x
        for i in range(self.stacked_convs):
            c = nn.relu(
                nn.Conv(self.feat_channels, k3, padding=p3,
                        dtype=self.dtype, name=f"cls_conv_{i}")(c)
            )
            r = nn.relu(
                nn.Conv(self.feat_channels, k3, padding=p3,
                        dtype=self.dtype, name=f"reg_conv_{i}")(r)
            )
        cls = nn.Conv(
            self.num_anchors * self.cls_out_channels, k3, padding=p3,
            dtype=self.dtype, name="retina_cls",
        )(c)
        reg = nn.Conv(
            self.num_anchors * 6, k3, padding=p3, dtype=self.dtype,
            name="retina_reg",
        )(r)
        return cls, reg
