"""Detector builder: reference config dict -> Detector3D module.

Replaces the reference's registry recursion (mmdet/models/builder.py:24-72)
with a direct mapping from `model.type` strings to Detector3D flags — the
reference's 30 detector classes differ only in pathway count and head
sharing (SURVEY.md section 2.4), which is configuration here.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..models.detector import Detector3D

# model.type -> (num_scales, share_heads, with_bbox, with_mask,
#                with_refinement)
_TYPES = {
    "RPN3D": dict(num_scales=1, with_bbox=False, with_mask=False),
    "MaskRCNN3DParcel": dict(num_scales=1),
    # 2-D legacy family (reference mmdet originals): evaluated as
    # depth-1 volumes with (1,k,k) kernels == exact 2-D convs
    "RPN": dict(num_scales=1, with_bbox=False, with_mask=False,
                two_d=True),
    "FasterRCNN": dict(num_scales=1, with_mask=False, two_d=True),
    "FastRCNN": dict(num_scales=1, with_mask=False, two_d=True),
    "MaskRCNN": dict(num_scales=1, two_d=True),
    "RetinaNet": dict(num_scales=1, with_bbox=False, with_mask=False,
                      single_stage=True, two_d=True),
    "RetinaNet3D": dict(num_scales=1, with_bbox=False, with_mask=False,
                        single_stage=True),
    "CascadeRCNN": dict(num_scales=1, with_mask=False, two_d=True,
                        cascade=True),
    "CascadeRCNN3D": dict(num_scales=1, with_mask=False, cascade=True),
    # HTC (reference mmdet/models/detectors/htc.py): cascade with
    # interleaved per-stage mask heads (info flow) + fused semantic branch
    "HybridTaskCascade": dict(num_scales=1, with_mask=True, two_d=True,
                              cascade=True, htc=True),
    "HybridTaskCascade3D": dict(num_scales=1, with_mask=True,
                                cascade=True, htc=True),
    # SSD (reference single_stage.py + ssd_head.py): VGG backbone, no
    # neck, per-level anchor counts, softmax cls + hard-negative mining
    "SSD": dict(num_scales=1, with_bbox=False, with_mask=False,
                single_stage=True, two_d=True, ssd=True),
    # RGB 2.5-D family (reference mask_rcnn_rgb.py / mask_rcnn_rgb_2.py):
    # one 2-D RGB image of adjacent slices, per-slice head sets
    "MaskRCNNRGB": dict(num_scales=3, share_heads=False, two_d=True,
                        rgb=True),
    "MaskRCNNRGB2": dict(num_scales=3, share_heads=False, two_d=True,
                         rgb=True),
    "FasterRCNN3D": dict(num_scales=1, with_mask=False),
    "MaskRCNN3D": dict(num_scales=1),
    "MaskRCNN3D2Scales": dict(num_scales=2, with_refinement=True),
    "MaskRCNN3D2ScalesHeads": dict(num_scales=2, share_heads=False),
    "MaskRCNN3D2ScalesHeadsRefinementHead": dict(
        num_scales=2, share_heads=False, with_refinement=True, with_mask=False
    ),
    "MaskRCNN3D3ScalesHeads": dict(num_scales=3, share_heads=False),
    "MaskRCNN3D3ScalesOnePathway": dict(num_scales=3, share_heads=True),
    "MaskRCNN3D2ScalesOnePathwayOneRPN": dict(
        num_scales=2, share_heads=True, with_refinement=True, one_rpn=True
    ),
}


def build_detector(cfg, dtype=jnp.float32):
    """cfg: full ConfigDict (uses cfg.model).  Returns Detector3D."""
    m = cfg.model
    kind = m["type"]
    if kind not in _TYPES:
        raise KeyError(f"unknown detector type {kind!r}")
    flags = dict(_TYPES[kind])
    flags.setdefault("with_bbox", True)
    flags.setdefault("with_mask", "mask_head" in m)
    flags.setdefault("share_heads", True)
    flags.setdefault("with_refinement", False)
    flags["with_refinement_mask"] = (
        flags["with_refinement"] and "refinement_mask_head" in m
    )

    bbox_head = m.get("bbox_head", {})
    rpn_head = m.get("rpn_head", {})
    num_anchors = max(
        1,
        len(rpn_head.get("anchor_scales", [1]))
        * len(rpn_head.get("anchor_ratios", [1.0])),
    )
    num_parcellations = bbox_head.get("num_parcellations", 0)
    if kind == "MaskRCNN3DParcel" and not num_parcellations:
        num_parcellations = 15
    two_d = flags.pop("two_d", False)
    single_stage = flags.pop("single_stage", False)
    cascade = flags.pop("cascade", False)
    htc = flags.pop("htc", False)
    ssd = flags.pop("ssd", False)
    cascade_stages = 0
    if cascade:
        rcnn = cfg.train_cfg.get("rcnn") if "train_cfg" in cfg else None
        cascade_stages = len(rcnn) if isinstance(rcnn, (list, tuple)) else 3
    sem = m.get("semantic_head")
    extra = {}
    if htc:
        extra["htc"] = True
        extra["with_semantic"] = sem is not None
        if sem is not None:
            extra["semantic_num_classes"] = sem.get("num_classes", 2)
            extra["semantic_fusion_level"] = sem.get("fusion_level", 1)
    if ssd:
        extra["ssd"] = True
        bb = m["backbone"]
        extra["ssd_input_size"] = bb.get("input_size", 300)
        extra["ssd_num_anchors"] = tuple(
            len(r) * 2 + 2 for r in m["bbox_head"]["anchor_ratios"]
        )
    base_width = m["backbone"].get(
        "base_width", 64 if two_d else 16
    )
    bbox_roi = m.get("bbox_roi_extractor", {}).get("roi_layer", {})
    mask_roi = m.get("mask_roi_extractor", {}).get("roi_layer", {})
    neck = m.get("neck") or {}
    return Detector3D(
        roi_size=bbox_roi.get("out_size", 7),
        roi_size_depth=bbox_roi.get("out_size_depth", 3),
        mask_roi_size=mask_roi.get("out_size", 14),
        mask_roi_size_depth=mask_roi.get("out_size_depth", 10),
        depth=m["backbone"].get("depth", 50),
        backbone_type=m["backbone"].get("type", "ResNet3D"),
        base_width=base_width,
        two_d=two_d,
        single_stage=single_stage,
        cascade_stages=cascade_stages,
        num_parcellations=num_parcellations,
        fpn_channels=neck.get("out_channels", 64),
        num_outs=neck.get("num_outs", 5),
        num_classes=bbox_head.get("num_classes", 2),
        num_anchors=num_anchors,
        fc_out_channels=bbox_head.get("fc_out_channels", 1024),
        mask_convs=m.get("mask_head", {}).get("num_convs", 4),
        remat=m.get("backbone", {}).get("with_cp", False),
        dtype=dtype,
        **extra,
        **flags,
    )


def anchor_cfgs(cfg):
    """Per-scale anchor config dicts (rpn_head, rpn_head_2, rpn_head_3;
    single-stage heads living under bbox_head, e.g. SSD)."""
    out = [cfg.model.get("rpn_head") or cfg.model["bbox_head"]]
    for key in ("rpn_head_2", "rpn_head_3"):
        if key in cfg.model:
            out.append(cfg.model[key])
    # pad to the detector's scale count with the last given cfg: the
    # one-RPN variant configures a single rpn_head that runs on every
    # pathway (reference two_stage_3d_onepathway_onerpn.py:142-143);
    # the RGB family is one image, not multi-scale inputs
    t = _TYPES.get(cfg.model.get("type"), {})
    if not t.get("rgb"):
        while len(out) < t.get("num_scales", 1):
            out.append(out[-1])
    return out
