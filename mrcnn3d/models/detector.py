"""Unified 3-D detector module (flax).

One parameterised module covers the reference's detector family
(mmdet/models/detectors/__init__.py) instead of six copy-pasted classes —
the variants differ only in pathway count and head sharing, which is
configuration, not code (SURVEY.md section 7):

  * RPN3D                     — with_bbox=False, with_mask=False
  * FasterRCNN3D              — with_mask=False
  * MaskRCNN3D                — single resolution
  * MaskRCNN3D2Scales         — shared heads + second RPN + refinement
    (reference two_stage_3d_2scales.py:22-89)
  * ...2ScalesHeads           — share_heads=False (separate per-scale heads,
    reference two_stage_3d_2scales_heads.py:64,82)
  * ...3ScalesHeads           — num_scales=3

The module owns *parameters only*; orchestration (proposal generation,
assignment, sampling, losses, NMS) lives in mrcnn3d/detectors/pipeline.py
as pure functions.
"""
from __future__ import annotations

from dataclasses import field
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .fpn3d import FPN3D
from .heads import (
    FCNMaskHead3D,
    FusedSemanticHead3D,
    HTCMaskHead3D,
    RetinaHead3D,
    RPNHead3D,
    SharedFCBBoxHead3D,
    SharedFCBBoxHead3DRefinement,
)
from .resnet3d import ResNet3D


class Detector3D(nn.Module):
    """Backbone + FPN + per-scale RPN/bbox/mask heads + refinement head."""

    depth: int = 50
    backbone_type: str = "ResNet3D"
    base_width: int = 16
    two_d: bool = False  # depth-1 mode: the 2-D legacy detector family
    fpn_channels: int = 64
    num_outs: int = 5
    num_classes: int = 2
    num_anchors: int = 1
    num_scales: int = 1
    share_heads: bool = True  # one bbox/mask head across scales
    one_rpn: bool = False  # one RPN head across scales (reference
    # two_stage_3d_onepathway_onerpn.py:142-143: the same rpn_head runs
    # on both pathways' features)
    with_bbox: bool = True
    with_mask: bool = True
    with_refinement: bool = False
    with_refinement_mask: bool = False
    num_parcellations: int = 0  # >0 adds the brain-region branch
    single_stage: bool = False  # RetinaNet-style head (focal loss, no RCNN)
    cascade_stages: int = 0  # >0: Cascade R-CNN iterative bbox heads
    htc: bool = False  # HybridTaskCascade: per-stage mask heads w/ info flow
    with_semantic: bool = False  # HTC fused semantic branch
    semantic_num_classes: int = 2
    semantic_fusion_level: int = 1
    ssd: bool = False  # SSD: VGG backbone, no neck, per-level anchor counts
    ssd_input_size: int = 300
    ssd_num_anchors: Sequence[int] = ()
    # RGB 2.5-D family (reference two_stage_rgb.py): ONE 2-D image whose
    # channels are adjacent volume slices, with a separate head set per
    # slice — structurally num_scales=3 + share_heads=False over shared
    # features; `rgb` switches the pipeline to per-slice gt plumbing
    rgb: bool = False
    stacked_convs: int = 4
    fc_out_channels: int = 1024
    mask_convs: int = 4
    roi_size: int = 7
    roi_size_depth: int = 3
    mask_roi_size: int = 14
    mask_roi_size_depth: int = 10
    remat: bool = False
    # (Mesh, axis_name): depth-shard the backbone volume across chips
    # (see ResNet3D.spatial_shard); set via model.clone(spatial_shard=..)
    # by parallel/spatial.py — adds no parameters, so variables from an
    # unsharded twin are interchangeable
    spatial_shard: Any = None
    dtype: Any = jnp.float32

    def setup(self):
        if self.ssd:
            from .backbones_extra import SSDVGG
            from .heads import SSDHead

            self.backbone = SSDVGG(
                input_size=self.ssd_input_size, dtype=self.dtype
            )
            self.ssd_head = SSDHead(
                num_anchors=tuple(self.ssd_num_anchors),
                num_classes=self.num_classes,
                two_d=self.two_d,
                dtype=self.dtype,
            )
            return
        if self.backbone_type == "ResNeXt3D":
            from .backbones_extra import ResNeXt3D

            self.backbone = ResNeXt3D(
                depth=self.depth,
                width=self.base_width,
                two_d=self.two_d,
                dtype=self.dtype,
            )
        elif self.backbone_type == "UNet3D":
            from .backbones_extra import UNet3D

            self.backbone = UNet3D(dtype=self.dtype)
        else:
            self.backbone = ResNet3D(
                depth=self.depth,
                base_width=self.base_width,
                two_d=self.two_d,
                remat=self.remat,
                spatial_shard=self.spatial_shard,
                dtype=self.dtype,
            )
        self.neck = FPN3D(
            out_channels=self.fpn_channels,
            num_outs=self.num_outs,
            dtype=self.dtype,
        )
        if self.single_stage:
            self.rpn_heads = [
                RetinaHead3D(
                    feat_channels=self.fpn_channels,
                    stacked_convs=self.stacked_convs,
                    num_anchors=self.num_anchors,
                    cls_out_channels=self.num_classes - 1,
                    two_d=self.two_d,
                    dtype=self.dtype,
                    name=f"rpn_head_{s}",
                )
                for s in range(self.num_scales)
            ]
        else:
            self.rpn_heads = [
                RPNHead3D(
                    feat_channels=self.fpn_channels,
                    num_anchors=self.num_anchors,
                    dtype=self.dtype,
                    name=f"rpn_head_{s}",
                )
                for s in range(1 if self.one_rpn else self.num_scales)
            ]
        if self.with_bbox:
            if self.cascade_stages > 0:
                # one class-agnostic-regression head per cascade stage
                # (reference cascade_rcnn.py convention)
                n_bbox_heads = self.cascade_stages
                reg_agnostic = True
            else:
                n_bbox_heads = 1 if self.share_heads else self.num_scales
                reg_agnostic = False
            self.bbox_heads = [
                SharedFCBBoxHead3D(
                    fc_out_channels=self.fc_out_channels,
                    num_classes=self.num_classes,
                    reg_class_agnostic=reg_agnostic,
                    num_parcellations=self.num_parcellations,
                    dtype=self.dtype,
                    name=f"bbox_head_{s}",
                )
                for s in range(n_bbox_heads)
            ]
        if self.with_refinement:
            self.refinement_head = SharedFCBBoxHead3DRefinement(
                fc_out_channels=self.fc_out_channels,
                num_classes=self.num_classes,
                dtype=self.dtype,
            )
        if self.with_mask:
            if self.htc and self.cascade_stages > 0:
                # HTC: one mask head per cascade stage, each with the
                # info-flow conv_res (reference htc_mask_head.py:7-38)
                self.mask_heads = [
                    HTCMaskHead3D(
                        num_convs=self.mask_convs,
                        conv_out_channels=self.fpn_channels,
                        num_classes=self.num_classes,
                        two_d=self.two_d,
                        dtype=self.dtype,
                        name=f"mask_head_{s}",
                    )
                    for s in range(self.cascade_stages)
                ]
            else:
                n_mask_heads = 1 if self.share_heads else self.num_scales
                self.mask_heads = [
                    FCNMaskHead3D(
                        num_convs=self.mask_convs,
                        conv_out_channels=self.fpn_channels,
                        num_classes=self.num_classes,
                        two_d=self.two_d,
                        dtype=self.dtype,
                        name=f"mask_head_{s}",
                    )
                    for s in range(n_mask_heads)
                ]
        if self.with_semantic:
            self.semantic_head = FusedSemanticHead3D(
                fusion_level=self.semantic_fusion_level,
                num_ins=self.num_outs,
                conv_out_channels=self.fpn_channels,
                num_classes=self.semantic_num_classes,
                two_d=self.two_d,
                dtype=self.dtype,
            )
        if self.with_refinement_mask:
            self.refinement_mask_head = FCNMaskHead3D(
                num_convs=self.mask_convs,
                conv_out_channels=self.fpn_channels,
                num_classes=self.num_classes,
                dtype=self.dtype,
            )

    def extract_feat(self, x):
        """(B, D, H, W, 3) -> tuple of FPN levels (B, d, h, w, C)."""
        if self.ssd:
            return self.backbone(x)  # SSD: no neck (single_stage.py)
        return self.neck(self.backbone(x))

    def rpn(self, feats, scale: int = 0):
        if self.ssd:
            return self.ssd_head(feats)
        head = self.rpn_heads[0 if self.one_rpn else scale]
        return tuple(head(f) for f in feats)

    def bbox_forward(self, roi_feats, scale: int = 0):
        if self.cascade_stages > 0:
            head = self.bbox_heads[scale]  # scale == cascade stage
        else:
            head = self.bbox_heads[0 if self.share_heads else scale]
        return head(roi_feats)

    def refinement_forward(self, roi_feats):
        return self.refinement_head(roi_feats)

    def mask_forward(self, roi_feats, scale: int = 0):
        if self.htc:
            logits, _ = self.mask_heads[scale](roi_feats)
            return logits
        head = self.mask_heads[0 if self.share_heads else scale]
        return head(roi_feats)

    def htc_mask_forward(
        self, roi_feats, res_feat, stage: int, return_logits: bool = True
    ):
        """HTC per-stage mask forward with mask-information flow
        (reference htc.py:98-105,141-154).  Returns (logits|None, feat)."""
        return self.mask_heads[stage](
            roi_feats, res_feat, return_logits=return_logits
        )

    def semantic_forward(self, feats):
        """(logits, embedding) of the fused semantic branch."""
        return self.semantic_head(feats)

    def refinement_mask_forward(self, roi_feats):
        return self.refinement_mask_head(roi_feats)

    def __call__(self, x):
        """Default apply: features + first-scale RPN outputs (for init)."""
        feats = self.extract_feat(x)
        outs = [self.rpn(feats, s) for s in range(self.num_scales)]
        extras = {}
        bbox_dummy = jnp.zeros(
            (1, self.roi_size_depth, self.roi_size, self.roi_size,
             self.fpn_channels),
            self.dtype,
        )
        mask_dummy = jnp.zeros(
            (1, self.mask_roi_size_depth, self.mask_roi_size,
             self.mask_roi_size, self.fpn_channels),
            self.dtype,
        )
        if self.with_bbox:
            n = (
                self.cascade_stages
                if self.cascade_stages > 0
                else (1 if self.share_heads else self.num_scales)
            )
            for s in range(n):
                extras[f"bbox_{s}"] = self.bbox_forward(bbox_dummy, s)
        if self.with_refinement:
            extras["refinement"] = self.refinement_forward(bbox_dummy)
        if self.with_mask:
            if self.htc and self.cascade_stages > 0:
                # pass a res_feat to stages > 0 so conv_res params exist
                # (stage 0 never receives info flow, reference htc.py:99-103)
                last = None
                for s in range(self.cascade_stages):
                    extras[f"mask_{s}"], last = self.htc_mask_forward(
                        mask_dummy, last, s
                    )
            else:
                n = 1 if self.share_heads else self.num_scales
                for s in range(n):
                    extras[f"mask_{s}"] = self.mask_forward(mask_dummy, s)
        if self.with_semantic:
            extras["semantic"] = self.semantic_forward(feats)
        if self.with_refinement_mask:
            extras["refinement_mask"] = self.refinement_mask_forward(
                mask_dummy
            )
        return feats, outs, extras
