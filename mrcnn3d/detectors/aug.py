"""Test-time augmentation: aug_test + merge_augs equivalents.

Re-implements the reference's TTA path for the TPU pipeline
(mmdet/models/detectors/base.py:60-86 aug_test dispatch,
mmdet/core/post_processing/merge_augs.py merge_aug_{proposals,bboxes,
scores,masks}, mmdet/models/detectors/test_mixins.py aug_test_rpn /
aug_test_bboxes / aug_test_mask): each augmented view (rescaled and/or
W-flipped) produces proposals that are mapped back to the original
frame and NMS-merged; the merged proposal set is then scored by the
bbox head on EVERY view (mapped into that view's frame), box/score
averaged across views, and multiclass-NMS'd; masks are predicted per
view, flip-corrected, and probability-averaged.

TPU-first differences: everything is padded/static-shape (fixed
proposal and detection budgets with validity masks) and batched, so the
whole aug_test jits as one program per augmentation-set signature.
Augmentation metadata (scale_factor, flip) is static Python, matching
the reference's per-view img_meta.

Like the reference (aug_test exists on the 2-D/`two_stage.py` family
only; the 3-D multi-scale detectors never implement it), this drives
single-pathway models: num_scales == 1, two-stage, with_bbox.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.post import multiclass_nms_3d
from ..ops.box3d import delta2bbox3d
from ..ops.nms3d import nms_3d
from . import pipeline as pl


def bbox_flip_3d(boxes, img_shape):
    """W-axis flip of xyxyzz boxes (reference bbox_flip,
    mmdet/core/bbox/transforms.py:54-66).  img_shape: (H, W, C, D)."""
    w = img_shape[1]
    return jnp.stack(
        [
            w - boxes[..., 2] - 1,
            boxes[..., 1],
            w - boxes[..., 0] - 1,
            boxes[..., 3],
            boxes[..., 4],
            boxes[..., 5],
        ],
        axis=-1,
    )


def bbox_mapping_3d(boxes, img_shape, scale_factor, flip):
    """Original frame -> augmented view frame (reference bbox_mapping):
    scale all axes then flip."""
    out = boxes * scale_factor
    return bbox_flip_3d(out, img_shape) if flip else out


def bbox_mapping_back_3d(boxes, img_shape, scale_factor, flip):
    """Augmented view frame -> original frame (reference
    bbox_mapping_back): un-flip then un-scale."""
    out = bbox_flip_3d(boxes, img_shape) if flip else boxes
    return out / scale_factor


def merge_aug_proposals(aug_boxes, aug_scores, aug_valid, metas, rpn_cfg):
    """NMS-merge per-view proposals mapped to the original frame
    (reference merge_augs.py:9-38).

    aug_*: per-view (M, 6) boxes / (M,) scores / (M,) valid (one image).
    metas: per-view dicts with img_shape, scale_factor, flip.
    Returns (max_num, 6) boxes, (max_num,) scores, (max_num,) valid.
    """
    recovered = [
        bbox_mapping_back_3d(
            b, m["img_shape"], m["scale_factor"], m["flip"]
        )
        for b, m in zip(aug_boxes, metas)
    ]
    boxes = jnp.concatenate(recovered, axis=0)
    scores = jnp.concatenate(aug_scores, axis=0)
    valid = jnp.concatenate(aug_valid, axis=0)
    # fixed output budget = min(max_num, total views' proposals)
    # (reference merge_augs.py:35 num = min(max_num, merged.shape[0]))
    return nms_3d(
        boxes,
        scores,
        valid,
        float(rpn_cfg["nms_thr"]),
        min(int(rpn_cfg["max_num"]), int(boxes.shape[0])),
    )


def merge_aug_bboxes(aug_boxes, aug_scores, metas):
    """Mean of per-view decoded boxes mapped back (reference
    merge_augs.py:41-66).  aug_boxes: per-view (N, C*6) in view frame."""
    recovered = []
    for b, m in zip(aug_boxes, metas):
        per_cls = b.reshape(b.shape[0], -1, 6)
        per_cls = bbox_mapping_back_3d(
            per_cls, m["img_shape"], m["scale_factor"], m["flip"]
        )
        recovered.append(per_cls.reshape(b.shape[0], -1))
    boxes = jnp.mean(jnp.stack(recovered), axis=0)
    scores = jnp.mean(jnp.stack(aug_scores), axis=0)
    return boxes, scores


def merge_aug_scores(aug_scores):
    """Mean of per-view score arrays (reference merge_augs.py:69-74)."""
    return jnp.mean(jnp.stack(aug_scores), axis=0)


def merge_aug_masks(aug_masks, metas, weights=None):
    """Flip-corrected (weighted) mean of per-view mask probabilities
    (reference merge_augs.py:77-96).  aug_masks: per-view
    (N, d, h, w, C) sigmoid outputs."""
    recovered = [
        m[..., :, ::-1, :] if meta["flip"] else m
        for m, meta in zip(aug_masks, metas)
    ]
    if weights is None:
        return jnp.mean(jnp.stack(recovered), axis=0)
    w = jnp.asarray(weights, jnp.float32)
    w = w / jnp.sum(w)
    return jnp.tensordot(w, jnp.stack(recovered), axes=1)


def aug_test(model, variables, aug_batches, metas, cfg, aug_anchor_sets):
    """TTA inference over augmented views of ONE volume batch.

    aug_batches: per-view dict with imgs (B, D, H, W, 3); metas:
    per-view dict(scale_factor=float, flip=bool) — img_shape is derived
    from each view's array.  aug_anchor_sets: per-view anchor set for
    the view's feature geometry.  Returns the simple_test dict (dets in
    the ORIGINAL frame).
    """
    assert model.num_scales == 1 and model.with_bbox, (
        "aug_test drives single-pathway two-stage models (reference "
        "two_stage.py:226; the multi-scale 3-D family has no aug_test)"
    )
    test_cfg = cfg.test_cfg
    rcnn_test = test_cfg["rcnn"]
    apply = functools.partial(model.apply, variables)
    rpn_means, rpn_stds = pl.rpn_codec(cfg)
    roi_cfg = cfg.model["bbox_roi_extractor"]
    num_classes = model.num_classes

    metas = [
        dict(
            m,
            img_shape=(
                ab["imgs"].shape[2],
                ab["imgs"].shape[3],
                3,
                ab["imgs"].shape[1],
            ),
        )
        for m, ab in zip(metas, aug_batches)
    ]
    b = aug_batches[0]["imgs"].shape[0]

    # ---- per-view features + proposals (aug_test_rpn) ----
    feats_v, pb_v, ps_v, pv_v = [], [], [], []
    for ab, meta, aset in zip(aug_batches, metas, aug_anchor_sets):
        feats = apply(ab["imgs"], method=model.extract_feat)
        rpn_outs = apply(feats, 0, method=model.rpn)
        pboxes, pscores, pvalid = pl.gen_proposals(
            [o[0] for o in rpn_outs],
            [o[1] for o in rpn_outs],
            aset,
            meta["img_shape"],
            test_cfg["rpn"],
            means=rpn_means,
            stds=rpn_stds,
        )
        feats_v.append(feats)
        pb_v.append(pboxes)
        ps_v.append(pscores)
        pv_v.append(pvalid)

    def merge_one(i):
        return merge_aug_proposals(
            [pb[i] for pb in pb_v],
            [ps[i] for ps in ps_v],
            [pv[i] for pv in pv_v],
            metas,
            test_cfg["rpn"],
        )

    merged = [merge_one(i) for i in range(b)]
    mboxes = jnp.stack([m[0] for m in merged])  # (B, M, 6) original frame
    mvalid = jnp.stack([m[2] for m in merged])

    # ---- per-view bbox head on the merged proposals (aug_test_bboxes) ----
    aug_boxes, aug_scores = [], []
    for feats, meta in zip(feats_v, metas):
        view_props = bbox_mapping_3d(
            mboxes, meta["img_shape"], meta["scale_factor"], meta["flip"]
        )
        rois, rvalid = pl.flat_rois(view_props, mvalid)
        roi_feats = pl._roi_align_cfg(feats, rois, roi_cfg, rvalid)
        head_out = apply(roi_feats, 0, method=model.bbox_forward)
        cls_score, bbox_pred = head_out[0], head_out[1]
        boxes = delta2bbox3d(
            rois[:, 1:],
            bbox_pred,
            tuple(cfg.model["bbox_head"]["target_means"]),
            tuple(cfg.model["bbox_head"]["target_stds"]),
            meta["img_shape"],
        )
        aug_boxes.append(boxes)
        aug_scores.append(jax.nn.softmax(cls_score, axis=-1))

    boxes_m, scores_m = merge_aug_bboxes(aug_boxes, aug_scores, metas)
    m = mboxes.shape[1]
    boxes_m = boxes_m.reshape(b, m, -1)
    scores_m = scores_m.reshape(b, m, -1)

    dets, labels, dvalid, _ = jax.vmap(
        lambda bx, sc, vd: multiclass_nms_3d(
            bx,
            sc,
            vd,
            rcnn_test["score_thr"],
            rcnn_test["nms"]["iou_thr"],
            rcnn_test["max_per_img"],
        )
    )(boxes_m, scores_m, mvalid)
    out = dict(dets=dets, labels=labels, valid=dvalid)

    # ---- per-view mask heads on the final boxes (aug_test_mask) ----
    if model.with_mask and not test_cfg.get("return_bbox_only", False):
        mask_roi_cfg = cfg.model["mask_roi_extractor"]
        aug_masks = []
        for feats, meta in zip(feats_v, metas):
            view_boxes = bbox_mapping_3d(
                dets[..., :6],
                meta["img_shape"],
                meta["scale_factor"],
                meta["flip"],
            )
            rois, rvalid = pl.flat_rois(view_boxes, dvalid)
            mf = pl._roi_align_cfg(feats, rois, mask_roi_cfg, rvalid)
            logits = apply(mf, 0, method=model.mask_forward)
            aug_masks.append(jax.nn.sigmoid(logits))
        out["mask_probs"] = merge_aug_masks(aug_masks, metas)
    return out
