"""Detector orchestration: proposals, training losses, inference.

Pure-function equivalents of the reference's detector classes
(mmdet/models/detectors/two_stage_3d.py, two_stage_3d_2scales.py) —
everything here is jit-compatible with static padded shapes:

  * proposal generation — reference rpn_head_3d.py:72-149 get_bboxes_single
  * RPN losses          — reference anchor_head_3d.py:127-230 (flattened
    across levels; per-level sums with a shared avg_factor are identical
    to one flat sum)
  * R-CNN stage         — reference two_stage_3d_2scales.py:180-257
  * refinement stage    — reference two_stage_3d_2scales.py:259-298, but
    fully in-graph (the reference round-trips GPU→numpy→GPU, :263-267)
  * mask stage          — reference two_stage_3d_2scales.py:301-327
  * simple_test         — reference two_stage_3d_2scales.py:335-434

The batch layout is channel-last volumes (B, D, H, W, 3) plus padded GT:
gt_boxes (B, G, 6), gt_labels (B, G), gt_valid (B, G), gt_masks
(B, G, D, H, W) uint8.
"""
from __future__ import annotations

import functools
import os
from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.anchors import (
    AnchorGenerator3D,
    anchor_inside_flags,
    ssd_anchor_generators,
)
from ..core.post import multiclass_nms_3d
from ..core.targets import (
    anchor_target_focal_single,
    anchor_target_single,
    mask_target_single,
    sample_rcnn_single,
)
from ..ops.box3d import delta2bbox3d
from ..ops.losses import (
    accuracy,
    expand_binary_labels,
    mask_cross_entropy,
    weighted_binary_cross_entropy,
    weighted_cross_entropy,
    weighted_sigmoid_focal_loss,
    weighted_smoothl1,
)
from ..ops.nms3d import nms_3d
from ..ops.roi_align3d import (
    multi_level_roi_align_3d,
    multi_level_roi_align_3d_chunked,
    multi_level_roi_align_3d_dense,
    multi_level_roi_align_3d_xfirst,
    multi_level_roi_align_3d_xfirst_chunked,
    pack_feature_table,
    xfirst_flat_features,
)

RPN_MEANS = (0.0,) * 6
RPN_STDS = (1.0,) * 6


def rpn_codec(cfg):
    """RPN/anchor-head box-codec (means, stds) from the model config
    (reference cfg.model.rpn_head.target_means/stds); identity codec
    when unspecified."""
    head = cfg.model.get("rpn_head", {}) if hasattr(cfg, "model") else {}
    if not head and hasattr(cfg, "model"):
        # single-stage heads named bbox_head (reference SSD/RetinaNet
        # configs put the anchor codec there)
        head = cfg.model.get("bbox_head", {})
    means = tuple(head.get("target_means", RPN_MEANS))
    stds = tuple(head.get("target_stds", RPN_STDS))
    return means, stds


class AnchorSet(NamedTuple):
    """Static per-level anchors + inside-image flags (numpy constants)."""

    anchors: Sequence[np.ndarray]  # per level (Nl, 6)
    inside: Sequence[np.ndarray]  # per level (Nl,) bool


def build_anchor_set(featmap_sizes, img_shape, anchor_cfg, allowed_border=0):
    """Build the per-level anchor lattice for static feature sizes.

    featmap_sizes: list of (d, h, w); img_shape: (H, W, C, D) reference
    layout; anchor_cfg: dict with anchor_scales / anchor_depth_scales /
    anchor_ratios / anchor_strides / anchor_strides_depth (reference
    config keys, configs/3d-multi-resolution-rcnn.py:16-28).
    """
    strides = anchor_cfg["anchor_strides"]
    dstrides = anchor_cfg.get(
        "anchor_strides_depth", [1] * len(strides)
    )
    if "basesize_ratio_range" in anchor_cfg:
        gens = ssd_anchor_generators(anchor_cfg)
    else:
        gens = [
            AnchorGenerator3D(
                base_size=strides[lvl],
                scales=anchor_cfg["anchor_scales"],
                depth_scales=anchor_cfg["anchor_depth_scales"],
                ratios=anchor_cfg["anchor_ratios"],
                anchor_depth_base=dstrides[lvl],
            )
            for lvl in range(len(featmap_sizes))
        ]
    anchors, inside = [], []
    for lvl, (d, h, w) in enumerate(featmap_sizes):
        gen = gens[lvl]
        a = gen.grid_anchors((d, h, w), strides[lvl], dstrides[lvl])
        flags = gen.valid_flags((d, h, w), (d, h, w))
        ins = anchor_inside_flags(a, flags, img_shape, allowed_border)
        anchors.append(a)
        inside.append(np.asarray(ins))
    return AnchorSet(anchors, inside)


# ---------------------------------------------------------------------------
# proposals
# ---------------------------------------------------------------------------


def gen_proposals_single(
    cls_list, reg_list, anchor_set, img_shape, cfg,
    means=RPN_MEANS, stds=RPN_STDS,
):
    """RPN proposals for one image (reference get_bboxes_single).

    cls_list[l]: (d, h, w, A); reg_list[l]: (d, h, w, A*6).
    Returns (boxes (M, 6), scores (M,), valid (M,)) with M = max_num.
    """
    nms_pre = cfg["nms_pre"]
    nms_post = cfg["nms_post"]
    max_num = cfg["max_num"]
    nms_thr = cfg["nms_thr"]

    lvl_boxes, lvl_scores, lvl_valid = [], [], []
    for lvl in range(len(cls_list)):
        scores = jax.nn.sigmoid(cls_list[lvl].reshape(-1))
        deltas = reg_list[lvl].reshape(-1, 6)
        anchors = jnp.asarray(anchor_set.anchors[lvl])
        n = scores.shape[0]
        if n > nms_pre:
            # inside-image pre-filter parity (reference :96-106 pos_indices)
            inside = jnp.asarray(anchor_set.inside[lvl])
            neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
            masked = jnp.where(inside, scores, neg_inf)
            top_s, top_i = jax.lax.top_k(masked, nms_pre)
            anchors = anchors[top_i]
            deltas = deltas[top_i]
            valid = top_s > neg_inf
            scores = jnp.where(valid, top_s, 0.0)
        else:
            valid = jnp.ones((n,), bool)
        boxes = delta2bbox3d(
            anchors, deltas, means, stds, img_shape
        )
        k_out = min(nms_post, boxes.shape[0])
        b, s, v = nms_3d(boxes, scores, valid, nms_thr, k_out)
        lvl_boxes.append(b)
        lvl_scores.append(jnp.where(v, s, -jnp.inf))
        lvl_valid.append(v)

    boxes = jnp.concatenate(lvl_boxes, axis=0)
    scores = jnp.concatenate(lvl_scores, axis=0)
    valid = jnp.concatenate(lvl_valid, axis=0)
    num = min(max_num, boxes.shape[0])
    top_s, top_i = jax.lax.top_k(scores, num)
    out_valid = (top_s > -jnp.inf) & valid[top_i]
    out_boxes = jnp.where(out_valid[:, None], boxes[top_i], 0.0)
    out_scores = jnp.where(out_valid, top_s, 0.0)
    return out_boxes, out_scores, out_valid


def gen_proposals(cls_outs, reg_outs, anchor_set, img_shape, cfg,
                  means=RPN_MEANS, stds=RPN_STDS):
    """Batched proposals. cls_outs[l]: (B, d, h, w, A)."""

    def single(cls_l, reg_l):
        return gen_proposals_single(
            cls_l, reg_l, anchor_set, img_shape, cfg, means, stds)

    return jax.vmap(single)(cls_outs, reg_outs)


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------


def rpn_loss(
    cls_outs,
    reg_outs,
    anchor_set,
    gt_boxes,
    gt_valid,
    rng,
    cfg_rpn,
    suffix="",
    means=RPN_MEANS,
    stds=RPN_STDS,
):
    """RPN cls+reg loss over the flat multi-level anchor set (batched).

    cls_outs[l]: (B, d, h, w, A); reg_outs[l]: (B, d, h, w, A*6).
    """
    b = cls_outs[0].shape[0]
    cls_flat = jnp.concatenate(
        [c.reshape(b, -1) for c in cls_outs], axis=1
    )  # (B, A)
    reg_flat = jnp.concatenate(
        [r.reshape(b, -1, 6) for r in reg_outs], axis=1
    )  # (B, A, 6)
    anchors = jnp.asarray(np.concatenate(anchor_set.anchors, axis=0))
    inside = jnp.asarray(np.concatenate(anchor_set.inside, axis=0))

    keys = jax.random.split(rng, b)
    tgt = jax.vmap(
        lambda k, gb, gv: anchor_target_single(
            k, anchors, inside, gb, gv, cfg_rpn, means, stds
        )
    )(keys, gt_boxes, gt_valid)

    num_total = jnp.sum(tgt["num_pos"]) + jnp.sum(tgt["num_neg"])
    num_total = num_total.astype(jnp.float32)

    loss_cls = weighted_binary_cross_entropy(
        cls_flat.reshape(-1),
        tgt["labels"].reshape(-1),
        tgt["label_weights"].reshape(-1),
        num_total,
    )
    loss_reg = weighted_smoothl1(
        reg_flat.reshape(-1, 6),
        tgt["bbox_targets"].reshape(-1, 6),
        tgt["bbox_weights"].reshape(-1, 6),
        cfg_rpn.get("smoothl1_beta", 1.0 / 9.0),
        num_total,
    )
    return {f"loss_rpn_cls{suffix}": loss_cls, f"loss_rpn_reg{suffix}": loss_reg}


def single_stage_loss(
    cls_outs,
    reg_outs,
    anchor_set,
    gt_boxes,
    gt_valid,
    gt_labels,
    cfg_ss,
    num_classes,
    means=RPN_MEANS,
    stds=RPN_STDS,
):
    """Focal-loss single-stage head loss (reference anchor_head.py focal
    path + retina_head.py): no sampling, every assigned anchor counts,
    avg_factor = total positives.

    cls_outs[l]: (B, d, h, w, A*(C-1)); reg_outs[l]: (B, d, h, w, A*6).
    """
    b = cls_outs[0].shape[0]
    c_out = num_classes - 1
    cls_flat = jnp.concatenate(
        [c.reshape(b, -1, c_out) for c in cls_outs], axis=1
    )
    reg_flat = jnp.concatenate(
        [r.reshape(b, -1, 6) for r in reg_outs], axis=1
    )
    anchors = jnp.asarray(np.concatenate(anchor_set.anchors, axis=0))
    inside = jnp.asarray(np.concatenate(anchor_set.inside, axis=0))

    tgt = jax.vmap(
        lambda gb, gv, gl: anchor_target_focal_single(
            anchors, inside, gb, gv, gl, cfg_ss, means, stds
        )
    )(gt_boxes, gt_valid, gt_labels)

    num_pos = jnp.sum(tgt["num_pos"]).astype(jnp.float32)
    labels = tgt["labels"].reshape(-1)
    weights = tgt["label_weights"].reshape(-1)
    bin_labels, bin_w = expand_binary_labels(labels, weights, c_out)
    loss_cls = weighted_sigmoid_focal_loss(
        cls_flat.reshape(-1, c_out),
        bin_labels,
        weights[:, None],
        num_pos,
        gamma=cfg_ss.get("gamma", 2.0),
        alpha=cfg_ss.get("alpha", 0.25),
    )
    loss_reg = weighted_smoothl1(
        reg_flat.reshape(-1, 6),
        tgt["bbox_targets"].reshape(-1, 6),
        tgt["bbox_weights"].reshape(-1, tgt["bbox_weights"].shape[-1]),
        cfg_ss.get("smoothl1_beta", 1.0 / 9.0),
        num_pos,
    )
    return {"loss_cls": loss_cls, "loss_reg": loss_reg}


def single_stage_test_single(
    cls_list, reg_list, anchor_set, img_shape, cfg, num_classes,
    means=RPN_MEANS, stds=RPN_STDS,
):
    """RetinaNet-style decode: per-level top-k by best class score,
    decode, then multi-class NMS across levels."""
    nms_pre = cfg["rpn"]["nms_pre"] if "rpn" in cfg else 1000
    rcnn = cfg["rcnn"]
    c_out = num_classes - 1
    lvl_boxes, lvl_scores, lvl_valid = [], [], []
    for lvl in range(len(cls_list)):
        scores = jax.nn.sigmoid(cls_list[lvl].reshape(-1, c_out))
        deltas = reg_list[lvl].reshape(-1, 6)
        anchors = jnp.asarray(anchor_set.anchors[lvl])
        n = scores.shape[0]
        if n > nms_pre:
            best = scores.max(axis=1)
            top_s, top_i = jax.lax.top_k(best, nms_pre)
            anchors = anchors[top_i]
            deltas = deltas[top_i]
            scores = scores[top_i]
            valid = jnp.ones((nms_pre,), bool)
        else:
            valid = jnp.ones((n,), bool)
        boxes = delta2bbox3d(anchors, deltas, means, stds, img_shape)
        lvl_boxes.append(boxes)
        lvl_scores.append(scores)
        lvl_valid.append(valid)
    boxes = jnp.concatenate(lvl_boxes, axis=0)
    scores = jnp.concatenate(lvl_scores, axis=0)
    valid = jnp.concatenate(lvl_valid, axis=0)
    # background column 0 then per-class sigmoid scores
    multi_scores = jnp.concatenate(
        [jnp.zeros((scores.shape[0], 1), scores.dtype), scores], axis=1
    )
    return multiclass_nms_3d(
        boxes,
        multi_scores,
        valid,
        rcnn["score_thr"],
        rcnn["nms"]["iou_thr"],
        rcnn["max_per_img"],
    )


def ssd_loss(
    cls_outs,
    reg_outs,
    anchor_set,
    gt_boxes,
    gt_valid,
    gt_labels,
    cfg_ss,
    num_classes,
    means=RPN_MEANS,
    stds=RPN_STDS,
):
    """SSD MultiBox loss (reference ssd_head.py:109-191): softmax CE per
    anchor with ranked hard-negative mining at neg_pos_ratio, smooth-L1
    regression, both averaged by the total positive count.  No sampling
    (anchor_target sampling=False), no unmapping.

    cls_outs[l]: (B, d, h, w, A_l*C); reg_outs[l]: (B, d, h, w, A_l*6).
    """
    b = cls_outs[0].shape[0]
    cls_flat = jnp.concatenate(
        [c.reshape(b, -1, num_classes) for c in cls_outs], axis=1
    )  # (B, A, C)
    reg_flat = jnp.concatenate(
        [r.reshape(b, -1, 6) for r in reg_outs], axis=1
    )
    anchors = jnp.asarray(np.concatenate(anchor_set.anchors, axis=0))
    inside = jnp.asarray(np.concatenate(anchor_set.inside, axis=0))

    tgt = jax.vmap(
        lambda gb, gv, gl: anchor_target_focal_single(
            anchors, inside, gb, gv, gl, cfg_ss, means, stds
        )
    )(gt_boxes, gt_valid, gt_labels)
    num_total_pos = jnp.sum(
        jnp.sum((tgt["labels"] > 0) & (tgt["label_weights"] > 0), axis=1)
    ).astype(jnp.float32)
    num_total_pos = jnp.maximum(num_total_pos, 1.0)

    logp = jax.nn.log_softmax(cls_flat.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(
        logp, tgt["labels"][..., None], axis=-1
    )[..., 0] * tgt["label_weights"]  # (B, A)

    is_pos = (tgt["labels"] > 0) & (tgt["label_weights"] > 0)
    is_neg = (tgt["labels"] == 0) & (tgt["label_weights"] > 0)
    num_pos = jnp.sum(is_pos, axis=1)  # (B,)
    num_neg_avail = jnp.sum(is_neg, axis=1)
    ratio = float(cfg_ss.get("neg_pos_ratio", 3))
    k_neg = jnp.minimum(
        (ratio * num_pos).astype(jnp.int32), num_neg_avail
    )  # (B,)

    # ranked hard negatives with a dynamic per-image count: sort the
    # negative losses descending (static shape) and keep rank < k_neg
    neg_losses = jnp.where(is_neg, ce, -jnp.inf)
    neg_sorted = -jnp.sort(-neg_losses, axis=1)
    rank = jnp.arange(ce.shape[1])[None, :]
    keep = (rank < k_neg[:, None]) & jnp.isfinite(neg_sorted)
    loss_cls = (
        jnp.sum(jnp.where(is_pos, ce, 0.0))
        + jnp.sum(jnp.where(keep, neg_sorted, 0.0))
    ) / num_total_pos

    loss_reg = weighted_smoothl1(
        reg_flat.reshape(-1, 6),
        tgt["bbox_targets"].reshape(-1, 6),
        tgt["bbox_weights"].reshape(-1, tgt["bbox_weights"].shape[-1]),
        float(cfg_ss.get("smoothl1_beta", 1.0)),
        num_total_pos,
    )
    return {"loss_cls": loss_cls, "loss_reg": loss_reg}


def ssd_test_single(
    cls_list, reg_list, anchor_set, img_shape, cfg, num_classes,
    means=RPN_MEANS, stds=RPN_STDS,
):
    """SSD decode for one image (reference anchor_head.get_bboxes with
    use_sigmoid_cls=False): softmax scores over all anchors of every
    level (no pre-NMS top-k at SSD scale), then multi-class NMS."""
    rcnn = cfg["rcnn"] if "rcnn" in cfg else cfg
    lvl_boxes, lvl_scores = [], []
    for lvl in range(len(cls_list)):
        scores = jax.nn.softmax(
            cls_list[lvl].reshape(-1, num_classes).astype(jnp.float32),
            axis=-1,
        )
        deltas = reg_list[lvl].reshape(-1, 6)
        anchors = jnp.asarray(anchor_set.anchors[lvl])
        lvl_boxes.append(
            delta2bbox3d(anchors, deltas, means, stds, img_shape)
        )
        lvl_scores.append(scores)
    boxes = jnp.concatenate(lvl_boxes, axis=0)
    scores = jnp.concatenate(lvl_scores, axis=0)
    valid = jnp.ones((boxes.shape[0],), bool)
    return multiclass_nms_3d(
        boxes,
        scores,
        valid,
        rcnn["score_thr"],
        rcnn["nms"]["iou_thr"],
        rcnn["max_per_img"],
    )


def flat_rois(boxes, valid=None):
    """(B, R, 6) -> (B*R, 7) [batch, x1..z2] (reference bbox2roi3D)."""
    b, r, _ = boxes.shape
    batch_idx = jnp.repeat(jnp.arange(b, dtype=boxes.dtype), r)
    flat = boxes.reshape(b * r, 6)
    rois = jnp.concatenate([batch_idx[:, None], flat], axis=1)
    if valid is None:
        return rois
    return rois, valid.reshape(b * r)


def bbox_stage_loss(
    cls_score,
    bbox_pred,
    samples,
    num_classes,
    pos_weight,
    suffix="",
    reg_class_agnostic=False,
):
    """R-CNN bbox head loss (reference bbox_head_3d.py:86-135).

    cls_score (N, C), bbox_pred (N, 6C) — or (N, 6) when
    reg_class_agnostic — over flattened batch samples; `samples` is the
    vmapped RcnnSample pytree (leading batch dim).
    """
    labels = samples.labels.reshape(-1)
    roi_valid = samples.roi_valid.reshape(-1)
    is_pos = samples.is_pos.reshape(-1)
    bbox_targets = samples.bbox_targets.reshape(-1, 6)

    pw = 1.0 if pos_weight <= 0 else float(pos_weight)
    label_weights = jnp.where(
        roi_valid, jnp.where(is_pos, pw, 1.0), 0.0
    )
    avg_cls = jnp.maximum(jnp.sum(label_weights > 0), 1.0)
    loss_cls = weighted_cross_entropy(
        cls_score, labels, label_weights, avg_cls
    )
    acc = accuracy(cls_score, labels, roi_valid)

    # class-specific delta slice (reference loss :108-113); agnostic
    # heads predict one 6-dim delta shared by all classes
    if reg_class_agnostic:
        pred = bbox_pred.reshape(bbox_pred.shape[0], 6)
    else:
        per_class = bbox_pred.reshape(bbox_pred.shape[0], num_classes, 6)
        pred = jnp.take_along_axis(
            per_class, labels[:, None, None].astype(jnp.int32), axis=1
        )[:, 0]
    reg_w = jnp.where(is_pos[:, None], 1.0, 0.0)
    avg_reg = (
        jnp.sum(samples.pos_count) + jnp.sum(samples.neg_count)
    ).astype(jnp.float32)
    loss_reg = weighted_smoothl1(
        pred, bbox_targets, reg_w, 1.0, avg_reg
    )
    return {
        f"loss_cls{suffix}": loss_cls,
        f"acc{suffix}": acc,
        f"loss_reg{suffix}": loss_reg,
    }


# ---------------------------------------------------------------------------
# full train forward
# ---------------------------------------------------------------------------


def forward_train(model, variables, batch, rng, cfg, anchor_sets):
    """Full training forward returning the named loss dict.

    Args:
      model: Detector3D; variables: flax variables dict.
      batch: dict with per-scale entries:
        imgs: (B, D, H, W, 3); gt_boxes (B, G, 6); gt_labels (B, G);
        gt_valid (B, G); gt_masks (B, G, D, H, W) if with_mask;
        imgs_2 / gt_boxes_2 / ... when num_scales == 2.
      cfg: ConfigDict with train_cfg (rpn/rpn_proposal/rcnn) + model keys.
      anchor_sets: list of AnchorSet per scale (static).

    Returns (total_loss, loss_dict).
    """
    if getattr(model, "rgb", False):
        return rgb_forward_train(
            model, variables, batch, rng, cfg, anchor_sets
        )
    if getattr(model, "cascade_stages", 0) > 0:
        return cascade_forward_train(
            model, variables, batch, rng, cfg, anchor_sets
        )
    train_cfg = cfg.train_cfg
    rcnn_cfg = train_cfg.get("rcnn", {})
    num_classes = model.num_classes
    apply = functools.partial(model.apply, variables)
    rpn_means, rpn_stds = rpn_codec(cfg)

    scales = range(model.num_scales)
    suffixes = ["", "_2", "_3"][: model.num_scales]
    rngs = jax.random.split(rng, 8)

    losses = {}
    feats_s, samples_s = [], []
    for s in scales:
        sfx = suffixes[s]
        imgs = batch["imgs" + sfx]
        gtb = batch["gt_boxes" + sfx]
        gtv = batch["gt_valid" + sfx]
        gtl = batch["gt_labels" + sfx]
        img_shape = (
            imgs.shape[2],
            imgs.shape[3],
            3,
            imgs.shape[1],
        )  # (H, W, C, D)

        feats = apply(imgs, method=model.extract_feat)
        rpn_outs = apply(feats, s, method=model.rpn)
        cls_outs = [o[0] for o in rpn_outs]
        reg_outs = [o[1] for o in rpn_outs]

        if model.single_stage:
            ss_loss = (
                ssd_loss if getattr(model, "ssd", False)
                else single_stage_loss
            )
            losses.update(
                ss_loss(
                    cls_outs,
                    reg_outs,
                    anchor_sets[s],
                    gtb,
                    gtv,
                    gtl,
                    train_cfg["rpn"],
                    model.num_classes,
                    means=rpn_means,
                    stds=rpn_stds,
                )
            )
            feats_s.append(feats)
            continue

        losses.update(
            rpn_loss(
                cls_outs,
                reg_outs,
                anchor_sets[s],
                gtb,
                gtv,
                rngs[s],
                train_cfg["rpn"],
                suffix=sfx,
                means=rpn_means,
                stds=rpn_stds,
            )
        )

        if not model.with_bbox:
            # RPN-only detector (reference rpn_3d.py) — no R-CNN stage
            feats_s.append(feats)
            continue

        pboxes, pscores, pvalid = gen_proposals(
            cls_outs,
            reg_outs,
            anchor_sets[s],
            img_shape,
            train_cfg["rpn_proposal"],
            means=rpn_means,
            stds=rpn_stds,
        )
        # proposals feed assignment but carry no gradient (reference
        # get_bboxes operates on .detach()ed tensors)
        pboxes = jax.lax.stop_gradient(pboxes)
        pscores = jax.lax.stop_gradient(pscores)

        b = imgs.shape[0]
        keys = jax.random.split(rngs[3 + s], b)
        samples = jax.vmap(
            lambda k, pb, pv, gb, gv, gl, ps: sample_rcnn_single(
                k,
                pb,
                pv,
                gb,
                gv,
                gl,
                rcnn_cfg,
                tuple(cfg.model["bbox_head"]["target_means"]),
                tuple(cfg.model["bbox_head"]["target_stds"]),
                num_classes=num_classes,
                proposal_scores=ps,
            )
        )(keys, pboxes, pvalid, gtb, gtv, gtl, pscores)

        feats_s.append(feats)
        samples_s.append(samples)

    if not model.with_bbox or model.single_stage:
        total = sum(v for k, v in losses.items() if "loss" in k)
        return total, losses

    # ---- shared bbox head over all scales (reference :239-257) ----
    roi_cfg = cfg.model["bbox_roi_extractor"]
    cls_all, pred_all, parcel_all = [], [], []
    for s in scales:
        rois, rvalid = flat_rois(
            samples_s[s].rois, samples_s[s].roi_valid
        )
        roi_feats = _roi_align_cfg(
            feats_s[s], rois, roi_cfg, rvalid, dense=True
        )
        out = apply(roi_feats, s, method=model.bbox_forward)
        cls_all.append(out[0])
        pred_all.append(out[1])
        if model.num_parcellations > 0:
            parcel_all.append(out[2])

    if model.share_heads:
        cls_cat = jnp.concatenate(cls_all, axis=0)
        pred_cat = jnp.concatenate(pred_all, axis=0)
        samples_cat = jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0), *samples_s
        )
        losses.update(
            bbox_stage_loss(
                cls_cat,
                pred_cat,
                samples_cat,
                num_classes,
                rcnn_cfg.get("pos_weight", -1),
            )
        )
    else:
        for s in scales:
            losses.update(
                bbox_stage_loss(
                    cls_all[s],
                    pred_all[s],
                    samples_s[s],
                    num_classes,
                    rcnn_cfg.get("pos_weight", -1),
                    suffix=suffixes[s],
                )
            )

    # ---- parcellation branch (reference bbox_head_3d_parcel.py:123-126,
    # targets bbox_target.py:152-181: pos -> gt brain_region @ pos_weight,
    # neg -> class 0 @ weight 1) ----
    if model.num_parcellations > 0 and "gt_bregions" in batch:
        parcel_cat = jnp.concatenate(parcel_all, axis=0)
        pw = float(rcnn_cfg.get("pos_weight", -1))
        pw = 1.0 if pw <= 0 else pw
        breg_list, w_list = [], []
        for s in scales:
            sfx = suffixes[s]
            gt_breg = batch.get("gt_bregions" + sfx, batch["gt_bregions"])
            smp = samples_s[s]
            breg = jnp.take_along_axis(gt_breg, smp.gt_idx, axis=1)
            breg = jnp.where(smp.is_pos, breg, 0)
            w = jnp.where(
                smp.roi_valid, jnp.where(smp.is_pos, pw, 1.0), 0.0
            )
            breg_list.append(breg.reshape(-1))
            w_list.append(w.reshape(-1))
        bregions = jnp.concatenate(breg_list)
        bw = jnp.concatenate(w_list)
        avg = jnp.maximum(jnp.sum(bw > 0), 1.0)
        losses["loss_parcellation_cls"] = weighted_cross_entropy(
            parcel_cat, bregions, bw, avg
        )
        losses["acc_parcellation"] = accuracy(
            parcel_cat, bregions, bw > 0
        )

    # ---- refinement head (reference :259-298, kept in-graph) ----
    if model.with_refinement:
        upscale = cfg.get("upscale_factor", 1.5)
        imgs2 = batch["imgs_2"]
        img_shape2 = (imgs2.shape[2], imgs2.shape[3], 3, imgs2.shape[1])
        rois2, _ = flat_rois(samples_s[1].rois, samples_s[1].roi_valid)
        decoded = delta2bbox3d(
            rois2[:, 1:],
            jax.lax.stop_gradient(pred_all[1]),
            tuple(cfg.model["bbox_head"]["target_means"]),
            tuple(cfg.model["bbox_head"]["target_stds"]),
            img_shape2,
        )
        b = batch["imgs"].shape[0]
        r = samples_s[1].rois.shape[1]
        # class-1 boxes scaled back to the 1.0x frame (reference :263-267)
        pred_boxes = decoded.reshape(b, r, num_classes * 6)[..., 6:12] / upscale
        ref_valid = samples_s[1].roi_valid

        keys = jax.random.split(rngs[6], b)
        ref_samples = jax.vmap(
            lambda k, pb, pv, gb, gv, gl: sample_rcnn_single(
                k,
                pb,
                pv,
                gb,
                gv,
                gl,
                rcnn_cfg,
                tuple(cfg.model["bbox_head"]["target_means"]),
                tuple(cfg.model["bbox_head"]["target_stds"]),
                num_classes=num_classes,
            )
        )(
            keys,
            pred_boxes,
            ref_valid,
            batch["gt_boxes"],
            batch["gt_valid"],
            batch["gt_labels"],
        )
        rrois, rvalid = flat_rois(ref_samples.rois, ref_samples.roi_valid)
        ref_feats = _roi_align_cfg(
            feats_s[0], rrois, roi_cfg, rvalid, dense=True
        )
        ref_pred = apply(ref_feats, method=model.refinement_forward)
        labels = ref_samples.labels.reshape(-1)
        per_class = ref_pred.reshape(ref_pred.shape[0], num_classes, 6)
        pred_sel = jnp.take_along_axis(
            per_class, labels[:, None, None].astype(jnp.int32), axis=1
        )[:, 0]
        is_pos = ref_samples.is_pos.reshape(-1)
        avg = (
            jnp.sum(ref_samples.pos_count) + jnp.sum(ref_samples.neg_count)
        ).astype(jnp.float32)
        losses["loss_refinement_reg"] = weighted_smoothl1(
            pred_sel,
            ref_samples.bbox_targets.reshape(-1, 6),
            jnp.where(is_pos[:, None], 1.0, 0.0),
            1.0,
            avg,
        )

    # ---- mask heads (reference :301-327) ----
    if model.with_mask:
        mask_roi_cfg = cfg.model["mask_roi_extractor"]
        losses["loss_mask"] = _mask_branch_loss(
            list(feats_s[0]), samples_s[0], batch["gt_masks"],
            mask_roi_cfg, rcnn_cfg,
            lambda f: apply(f, 0, method=model.mask_forward),
        )
        if model.with_refinement_mask and model.with_refinement:
            losses["loss_mask_refinement"] = _mask_branch_loss(
                list(feats_s[0]), ref_samples, batch["gt_masks"],
                mask_roi_cfg, rcnn_cfg,
                lambda f: apply(f, method=model.refinement_mask_forward),
            )

    # total = sum of entries whose key contains 'loss' (reference
    # apis/train.py:17-34 parse_losses)
    total = sum(v for k, v in losses.items() if "loss" in k)
    return total, losses


# ---------------------------------------------------------------------------
# inference
# ---------------------------------------------------------------------------


def _use_pallas_infer(feats, roi_cfg):
    """True when the inference align should run the Pallas crop kernel
    (ops/roi_align3d_pallas.py): one double-buffered window DMA + VPU
    lerps per roi.  Real-chip shootout at 2000 rois (PROFILE.md r4):
    bbox 7x7x3 23.7 ms vs xfirst 58 / gather 75; mask 14x14x10 51.6 ms
    vs xfirst 138 / gather 925.  TPU-only (Mosaic kernel; CPU tests and
    the GSPMD-sharded paths keep the einsum/gather formulations —
    parallel/spatial.py force-disables the flag), 3-D volumes only
    (depth-1 2-D windows are below the sublane tile).  Exactness
    machinery (whole-axis z windows + cond-skipped xfirst fallback for
    oversized rois) lives in multi_level_roi_align_3d_pallas."""
    layer = roi_cfg.get("roi_layer", {}) if roi_cfg else {}
    return (
        bool(roi_cfg)
        and layer.get("use_pallas_infer", True)
        and not layer.get("use_pallas", False)  # legacy opt-in branch
        and jax.default_backend() == "tpu"
        and int(feats[0].shape[1]) >= 8
    )


def _use_xfirst(feats, roi_cfg):
    """Pick the cheaper inference align per call site: corner-gather vs
    the x-first separable-einsum path (multi_level_roi_align_3d_xfirst).

    Cost model calibrated on v5e against the round-4 tools/bench_ops.py
    shootout at 2000 rois (PROFILE.md):
      * gather: ~29 ns per 512-lane packed row, out_vox*sn^3 rows/roi —
        predicts 68/909 ms at bbox/mask geometry vs measured 75/925 ms
      * xfirst: scales with the finest-level (out, D, H, C) contraction
        at ~270 GB/s effective — predicts 55/110 ms at bbox/mask
        geometry on (32, 128, 128, 64) 1.0x features vs measured
        55/~154 ms
    Crossovers at the product geometries: xfirst wins BOTH the mask
    stage (14x14x10: 55 vs 455 us/roi) and the 1.0x bbox/refinement
    stages (7x7x3: 27 vs 34 us/roi — measured 55 vs 75 ms at 2000
    rois); gather keeps the 1.5x pathway (48x192 level-0 features tip
    xfirst to ~62 us/roi, and forcing xfirst there measured +115 ms in
    round 3).  Single-volume only; opt out via
    roi_layer.use_xfirst_infer=False.
    """
    layer = roi_cfg.get("roi_layer", {}) if roi_cfg else {}
    if not (
        bool(roi_cfg)
        and feats[0].shape[0] == 1
        and layer.get("use_xfirst_infer", True)
        and not layer.get("use_pallas", False)
    ):
        return False
    out = int(layer.get("out_size", 7))
    out_d = int(layer.get("out_size_depth", 3))
    sn = int(layer.get("sample_num", 2))
    gather_per_roi = out * out * out_d * sn**3 * 29e-9
    d0, h0 = int(feats[0].shape[1]), int(feats[0].shape[2])
    c = int(feats[0].shape[-1])
    xfirst_per_roi = out * d0 * h0 * c * 4 / 2.7e11
    return xfirst_per_roi < gather_per_roi


def _xfirst_chunk(feats, roi_cfg, n=None):
    """Roi chunk for the xfirst align.

    When `n` (the roi count) is given and the FULL-budget (n, out, D,
    H, C) finest-level intermediate estimate stays under ~8 GiB,
    return n so the chunked wrapper falls through to ONE unchunked
    call: XLA fuses the intermediate into the einsum chain and never
    materializes it (bbox geometry: 7.3 GiB estimate compiles fine and
    the fused program runs the 55 ms the standalone shootout measured,
    where the 7-chunk lax.map regressed the bbox step 0.41->0.47 s).
    Above the threshold (mask geometry: 14.6 GiB estimate, real OOM)
    bound the live chunk intermediate to ~1 GB instead.
    """
    layer = roi_cfg["roi_layer"]
    d0, h0 = int(feats[0].shape[1]), int(feats[0].shape[2])
    c = int(feats[0].shape[-1])
    bytes_ = jnp.dtype(feats[0].dtype).itemsize
    per_roi = int(layer.get("out_size", 7)) * d0 * h0 * c * bytes_
    if n is not None and n * per_roi < (8 << 30):
        return int(n)
    return max(32, min(512, (1 << 30) // max(per_roi, 1)))


def _roi_align_cfg(feats, rois, roi_cfg, valid=None, chunk=0,
                   prepacked=None, dense=False, flats=None):
    layer0 = roi_cfg.get("roi_layer", {})
    if not dense and _use_pallas_infer(feats, roi_cfg):
        from ..ops.roi_align3d_pallas import (
            multi_level_roi_align_3d_pallas,
        )

        if os.environ.get("MRCNN3D_ALIGN_BARRIER") == "1":
            # A/B probe (r5): pin the feature maps at the align boundary
            # so XLA cannot fold the custom-call operand formatting into
            # the producing conv fusions.  MEASURED NEUTRAL on the real
            # chip (bbox step medians, same session: off 0.380 / on
            # 0.395 / off-again 0.395 s — within drift): the conv-fusion
            # entanglement is not separable from outside the compiler,
            # corroborating PROFILE.md r5's ~0.35 s device-limited floor
            # for this program shape.  Kept (default-off) as the probe
            # for future libtpu/XLA versions.
            feats = jax.lax.optimization_barrier(tuple(feats))

        # z-window default: bbox/refinement aligns (shallow out_depth)
        # take a 16-slice sliding window — the deep 1.5x level-0 axis
        # (48) costs 50% more DMA per roi as a whole-axis window
        # (measured 33 vs 22 ms / 2000 rois), and rois deeper than the
        # window fall back exactly; mask aligns keep whole-axis windows
        # (20 z samples per roi want the exact global clamp everywhere)
        d_default = 16 if int(layer0["out_size_depth"]) <= 4 else 48
        return multi_level_roi_align_3d_pallas(
            list(feats[: len(roi_cfg["featmap_strides"])]),
            rois,
            layer0["out_size"],
            layer0["out_size_depth"],
            roi_cfg["featmap_strides"],
            roi_cfg["featmap_strides_depth"],
            layer0["sample_num"],
            valid=valid,
            max_d=int(layer0.get("pallas_max_d", d_default)),
            max_hw=int(layer0.get("pallas_max_hw", 32)),
            fallback_k=int(layer0.get("pallas_fallback_k", 64)),
            flats=flats,
        )
    if not dense and _use_xfirst(feats, roi_cfg):
        return multi_level_roi_align_3d_xfirst_chunked(
            list(feats[: len(roi_cfg["featmap_strides"])]),
            rois,
            layer0["out_size"],
            layer0["out_size_depth"],
            roi_cfg["featmap_strides"],
            roi_cfg["featmap_strides_depth"],
            layer0["sample_num"],
            valid=valid,
            chunk=_xfirst_chunk(feats, roi_cfg, n=rois.shape[0]),
            flats=flats,
        )
    fn = multi_level_roi_align_3d
    kw = {}
    if prepacked is not None:
        # shared corner-packed table (see pack_feature_table): the bbox,
        # refinement and mask paths align against the SAME 1.0x features
        # within one program, so the caller builds the 8x table once
        kw["prepacked"] = prepacked
    layer = roi_cfg.get("roi_layer", {})
    # dense (the training path) takes precedence over use_pallas: the
    # Pallas crop kernel has no VJP, so routing loss_fn through it
    # would fail at the first jax.grad — use_pallas is inference-only
    if dense and layer.get("use_dense_train", True):
        # training path: dense separable MXU formulation — the
        # corner-gather backward is a multi-million-row scatter-add that
        # dominated the round-2 train step (PROFILE.md)
        return multi_level_roi_align_3d_dense(
            list(feats[: len(roi_cfg["featmap_strides"])]),
            rois,
            roi_cfg["roi_layer"]["out_size"],
            roi_cfg["roi_layer"]["out_size_depth"],
            roi_cfg["featmap_strides"],
            roi_cfg["featmap_strides_depth"],
            roi_cfg["roi_layer"]["sample_num"],
            valid=valid,
        )
    if layer.get("use_pallas", False) and not dense:
        # opt-in Pallas crop kernel (window DMA + MXU interpolation);
        # config flag mirrors the roi_layer type switch upstream.
        # Inference-only (`not dense`): the kernel has no VJP
        from ..ops.roi_align3d_pallas import (
            multi_level_roi_align_3d_pallas,
        )

        fn = multi_level_roi_align_3d_pallas
        kw.pop("prepacked", None)  # crop kernel reads raw features
        kw["max_d"] = int(layer.get("pallas_max_d", 16))
        kw["max_hw"] = int(layer.get("pallas_max_hw", 32))
        kw["interpret"] = jax.default_backend() != "tpu"
    elif chunk and rois.shape[0] > chunk:
        # bound the live gather slab: with full corner packing each roi
        # materializes out_vox * sn^3 rows of up to 512 lanes (bf16) —
        # 16 MB/roi at mask geometry — so scale the chunk to a ~1 GB
        # slab instead of trusting the caller's roi count
        layer_sn = int(layer.get("sample_num", 2))
        out_vox = (
            int(layer.get("out_size", 7)) ** 2
            * int(layer.get("out_size_depth", 3))
            * layer_sn ** 3
        )
        per_roi = out_vox * 512 * 2
        chunk = max(32, min(chunk, (1 << 30) // per_roi))
        fn = multi_level_roi_align_3d_chunked
        kw["chunk"] = chunk
    return fn(
        list(feats[: len(roi_cfg["featmap_strides"])]),
        rois,
        roi_cfg["roi_layer"]["out_size"],
        roi_cfg["roi_layer"]["out_size_depth"],
        roi_cfg["featmap_strides"],
        roi_cfg["featmap_strides_depth"],
        roi_cfg["roi_layer"]["sample_num"],
        valid=valid,
        **kw,
    )


def _chunked_cond_map(fn, chunk, valid, *arrays):
    """Scan `fn` over fixed-size row-chunks, skipping padding chunks.

    NMS emits detections score-sorted with padding last, so chunks past
    the last real row are pure padding: each chunk is lax.cond-skipped
    (zeros out) when its `valid` slice is all-False — cost scales with
    REAL rows while shapes stay static.  `fn(*array_chunks, valid_chunk)`
    must return one array with the chunk as its leading dim; rows of
    skipped chunks come back as zeros (callers mask by validity anyway).
    """
    n = valid.shape[0]
    chunk = min(max(1, chunk), n)
    pad = (-n) % chunk
    k = (n + pad) // chunk

    def padded(a):
        if not pad:
            return a
        z = jnp.zeros((pad,) + a.shape[1:], a.dtype)
        return jnp.concatenate([a, z])

    operands = arrays + (valid,)
    xs = tuple(
        padded(a).reshape((k, chunk) + a.shape[1:]) for a in operands
    )
    out_sds = jax.eval_shape(
        fn,
        *(
            jax.ShapeDtypeStruct((chunk,) + a.shape[1:], a.dtype)
            for a in operands
        ),
    )

    def body(carry, x):
        o = jax.lax.cond(
            jnp.any(x[-1]),
            lambda: fn(*x),
            lambda: jnp.zeros(out_sds.shape, out_sds.dtype),
        )
        return carry, o

    _, out = jax.lax.scan(body, None, xs)
    return out.reshape((k * chunk,) + out.shape[2:])[:n]


def simple_test(
    model,
    variables,
    batch,
    cfg,
    anchor_sets,
    rescale=True,
):
    """Whole-volume inference (reference simple_test, two_stage_3d_2scales.py:335-434).

    batch: dict with imgs (B, D, H, W, 3) and, for 2-scale models, imgs_2.
    Returns dict with dets (B, max_per_img, 7), labels (B, max_per_img),
    valid (B, max_per_img) in the 1.0x (original) coordinate frame when
    rescale=True.
    """
    if getattr(model, "rgb", False):
        return rgb_simple_test(model, variables, batch, cfg, anchor_sets)
    if getattr(model, "cascade_stages", 0) > 0:
        return cascade_simple_test(model, variables, batch, cfg, anchor_sets)
    test_cfg = cfg.test_cfg
    rcnn_test = test_cfg["rcnn"]
    num_classes = model.num_classes
    apply = functools.partial(model.apply, variables)
    roi_cfg = cfg.model.get("bbox_roi_extractor")
    upscale = cfg.get("upscale_factor", 1.5)
    suffixes = ["", "_2", "_3"][: model.num_scales]
    rpn_means, rpn_stds = rpn_codec(cfg)

    if model.single_stage:
        imgs = batch["imgs"]
        img_shape = (imgs.shape[2], imgs.shape[3], 3, imgs.shape[1])
        feats = apply(imgs, method=model.extract_feat)
        rpn_outs = apply(feats, 0, method=model.rpn)
        cls_outs = [o[0] for o in rpn_outs]
        reg_outs = [o[1] for o in rpn_outs]

        ss_test = (
            ssd_test_single if getattr(model, "ssd", False)
            else single_stage_test_single
        )

        def one(cls_i, reg_i):
            return ss_test(
                cls_i, reg_i, anchor_sets[0], img_shape, test_cfg,
                model.num_classes, means=rpn_means, stds=rpn_stds,
            )

        dets, labels, dvalid, _ = jax.vmap(one)(cls_outs, reg_outs)
        return dict(dets=dets, labels=labels, valid=dvalid)

    if not model.with_bbox:
        # RPN-only inference: proposals ARE the detections (reference
        # rpn_3d.py simple_test)
        imgs = batch["imgs"]
        img_shape = (imgs.shape[2], imgs.shape[3], 3, imgs.shape[1])
        feats = apply(imgs, method=model.extract_feat)
        rpn_outs = apply(feats, 0, method=model.rpn)
        pboxes, pscores, pvalid = gen_proposals(
            [o[0] for o in rpn_outs],
            [o[1] for o in rpn_outs],
            anchor_sets[0],
            img_shape,
            test_cfg["rpn"],
            means=rpn_means,
            stds=rpn_stds,
        )
        dets = jnp.concatenate([pboxes, pscores[..., None]], axis=-1)
        return dict(
            dets=dets,
            labels=jnp.zeros(pboxes.shape[:2], jnp.int32),
            valid=pvalid,
        )

    feats_s, boxes_s, scores_s, valid_s, parcel_s = [], [], [], [], []
    packed0 = None  # shared packed table for every 1.0x-feature align
    flats0 = None  # shared xfirst flat features (same role)
    n_lvl = len(roi_cfg["featmap_strides"]) if roi_cfg else 0
    for s in range(model.num_scales):
        sfx = suffixes[s]
        imgs = batch["imgs" + sfx]
        b = imgs.shape[0]
        img_shape = (imgs.shape[2], imgs.shape[3], 3, imgs.shape[1])
        feats = apply(imgs, method=model.extract_feat)
        if ("proposals" + sfx) in batch:
            # precomputed proposals (reference pp/pp_2,
            # coco_3d_2scales.py:317-324 + proposals= path): padded
            # (B, M, 6) boxes + (B, M) validity replace the RPN decode
            pboxes = batch["proposals" + sfx]
            pvalid = batch.get(
                "proposals_valid" + sfx,
                jnp.ones(pboxes.shape[:2], bool),
            )
        else:
            rpn_outs = apply(feats, s, method=model.rpn)
            cls_outs = [o[0] for o in rpn_outs]
            reg_outs = [o[1] for o in rpn_outs]
            pboxes, pscores, pvalid = gen_proposals(
                cls_outs, reg_outs, anchor_sets[s], img_shape,
                test_cfg["rpn"], means=rpn_means, stds=rpn_stds,
            )
        rois, rvalid = flat_rois(pboxes, pvalid)
        if s == 0 and not _use_pallas_infer(feats, roi_cfg):
            if _use_xfirst(feats, roi_cfg):
                # shared (W, D*C*H)-flat 1.0x features for the bbox,
                # refinement and mask aligns of this program
                flats0 = xfirst_flat_features(list(feats[:n_lvl]))
            elif not roi_cfg["roi_layer"].get("use_pallas", False):
                packed0 = pack_feature_table(list(feats[:n_lvl]))
        roi_feats = _roi_align_cfg(
            feats, rois, roi_cfg, rvalid,
            prepacked=packed0 if s == 0 else None,
            flats=flats0 if s == 0 else None,
        )
        head_out = apply(roi_feats, s, method=model.bbox_forward)
        cls_score, bbox_pred = head_out[0], head_out[1]
        if model.num_parcellations > 0:
            parcel_s.append(
                jax.nn.softmax(head_out[2], axis=-1).reshape(
                    b, -1, model.num_parcellations
                )
            )
        scores = jax.nn.softmax(cls_score, axis=-1)
        boxes = delta2bbox3d(
            rois[:, 1:],
            bbox_pred,
            tuple(cfg.model["bbox_head"]["target_means"]),
            tuple(cfg.model["bbox_head"]["target_stds"]),
            img_shape,
        )
        scale_factor = 1.0 if s == 0 else upscale ** s
        if rescale and scale_factor != 1.0:
            boxes = boxes / scale_factor
        m = pboxes.shape[1]
        feats_s.append(feats)
        boxes_s.append(boxes.reshape(b, m, -1))
        scores_s.append(scores.reshape(b, m, -1))
        valid_s.append(rvalid.reshape(b, m))

    if model.with_refinement and model.num_scales >= 2:
        # refine scale-2 class-1 boxes on 1.0x features (reference
        # :360-364 + test_mixins_3d.py:102-128)
        imgs = batch["imgs"]
        b = imgs.shape[0]
        img_shape = (imgs.shape[2], imgs.shape[3], 3, imgs.shape[1])
        ref_in = boxes_s[1][..., 6:12]
        rois, rvalid = flat_rois(ref_in, valid_s[1])
        roi_feats = _roi_align_cfg(
            feats_s[0], rois, roi_cfg, rvalid, prepacked=packed0,
            flats=flats0,
        )
        ref_pred = apply(roi_feats, method=model.refinement_forward)
        ref_boxes = delta2bbox3d(
            rois[:, 1:],
            ref_pred,
            tuple(cfg.model["bbox_head"]["target_means"]),
            tuple(cfg.model["bbox_head"]["target_stds"]),
            img_shape,
        )
        m = ref_in.shape[1]
        boxes_s[1] = ref_boxes.reshape(b, m, -1)

    boxes_all = jnp.concatenate(boxes_s, axis=1)
    scores_all = jnp.concatenate(scores_s, axis=1)
    valid_all = jnp.concatenate(valid_s, axis=1)

    def nms_one(bx, sc, vd):
        return multiclass_nms_3d(
            bx,
            sc,
            vd,
            rcnn_test["score_thr"],
            rcnn_test["nms"]["iou_thr"],
            rcnn_test["max_per_img"],
        )

    dets, labels, dvalid, src_idx = jax.vmap(nms_one)(
        boxes_all, scores_all, valid_all
    )
    out = dict(dets=dets, labels=labels, valid=dvalid)
    if model.num_parcellations > 0 and parcel_s:
        # carry parcellation scores through NMS by source row (reference
        # multiclass_nms_3d_parcel, bbox_nms.py:108-159)
        parcel_all = jnp.concatenate(parcel_s, axis=1)
        out["parcellations"] = jax.vmap(
            lambda p, i: p[i]
        )(parcel_all, src_idx)

    if model.with_mask and not test_cfg.get("return_bbox_only", False):
        # mask heads on the 1.0x features for all surviving detections;
        # with a refinement mask head, each detection uses the head
        # matching its provenance (reference :385-434 splits dets by
        # resolution via box equality; src_idx makes that exact here).
        #
        # NMS emits detections score-sorted with padding last (top_k on
        # -inf-masked scores), so under the static B*max_per_img budget
        # every chunk past the last real detection is pure padding: the
        # WHOLE mask stage (align + mask head(s)) runs as a lax.scan
        # whose body lax.cond-skips all-invalid chunks.  Cost scales
        # with real detections — the reference's dynamic-count mask pass
        # (fcn_mask_head_3d.py:126-191) — while shapes stay static.
        mask_roi_cfg = cfg.model["mask_roi_extractor"]
        det_boxes = dets[..., :6]
        rois, rvalid = flat_rois(det_boxes, dvalid)
        same_lvls = len(mask_roi_cfg["featmap_strides"]) == n_lvl
        mask_pack = packed0 if same_lvls else None
        use_pl_mask = _use_pallas_infer(feats_s[0], mask_roi_cfg)
        use_xf_mask = (
            not use_pl_mask and _use_xfirst(feats_s[0], mask_roi_cfg)
        )
        if use_xf_mask:
            mask_flats = (
                flats0
                if same_lvls and flats0 is not None
                else xfirst_flat_features(
                    list(
                        feats_s[0][
                            : len(mask_roi_cfg["featmap_strides"])
                        ]
                    )
                )
            )
        with_ref_mask = (
            model.with_refinement_mask and model.num_scales >= 2
        )
        if with_ref_mask:
            m1 = boxes_s[0].shape[1]  # rows < m1 came from the 1.0x path
            refined = (src_idx >= m1).reshape(-1)
        else:
            refined = jnp.zeros((rois.shape[0],), bool)

        def align_stage(rois_c, rvalid_c):
            # the ALIGN is what needs roi chunking (its live
            # intermediate is GBs); its output is ~25 KB/roi, so the
            # mask heads run ONCE on the full detection budget below —
            # running them inside the per-chunk scan measured 223 ms vs
            # 84 ms batched (small-batch conv launches, PROFILE.md r3)
            if use_xf_mask:
                layer0 = mask_roi_cfg["roi_layer"]
                return multi_level_roi_align_3d_xfirst(
                    list(
                        feats_s[0][
                            : len(mask_roi_cfg["featmap_strides"])
                        ]
                    ),
                    rois_c,
                    layer0["out_size"],
                    layer0["out_size_depth"],
                    mask_roi_cfg["featmap_strides"],
                    mask_roi_cfg["featmap_strides_depth"],
                    layer0["sample_num"],
                    valid=rvalid_c,
                    flats=mask_flats,
                )
            return _roi_align_cfg(
                feats_s[0], rois_c, mask_roi_cfg, rvalid_c,
                prepacked=mask_pack,
            )

        n = rois.shape[0]
        # chunk bounded so the live align intermediate stays ~1 GB:
        # xfirst — the (m, out, D, H, C) finest-level tensor;
        # gather — the corner slab (out_vox * sn^3 rows of 512 lanes)
        layer = mask_roi_cfg["roi_layer"]
        if use_pl_mask:
            # the crop kernel streams one window per roi (VMEM-bounded)
            # and skips inactive rois itself — no chunking needed
            chunk = n
        elif use_xf_mask:
            per_roi_chunk = _xfirst_chunk(feats_s[0], mask_roi_cfg)
            chunk = min(
                int(test_cfg.get("mask_roi_chunk", 512)),
                per_roi_chunk,
            )
        else:
            per_roi = (
                int(layer.get("out_size", 14)) ** 2
                * int(layer.get("out_size_depth", 10))
                * int(layer.get("sample_num", 2)) ** 3
                * 512 * 2
            )
            chunk = min(
                int(test_cfg.get("mask_roi_chunk", 512)),
                (1 << 30) // per_roi,
            )
        chunk = min(max(32, chunk), n)
        mfeat = _chunked_cond_map(align_stage, chunk, rvalid, rois)

        # mask heads: batched in launch-efficient chunks (512 rois keeps
        # the convs large; per-align-chunk heads measured 223 ms vs
        # 84 ms batched) but still cond-skipped on pure-padding chunks
        # so head cost scales with REAL detections, not the static
        # 2000-det budget
        def head_stage(mf_c, refined_c, _valid_c):
            mp = apply(mf_c, 0, method=model.mask_forward)
            if with_ref_mask:
                mr = apply(mf_c, method=model.refinement_mask_forward)
                mp = jnp.where(
                    refined_c[:, None, None, None, None], mr, mp
                )
            return mp

        mpred = _chunked_cond_map(
            head_stage, min(512, n), rvalid, mfeat, refined
        )
        out["mask_logits"] = mpred
    return out


def bbox2result3d(dets, labels, valid, num_classes):
    """Per-class numpy result lists (reference transforms.py:274-292).

    dets (M, 7), labels (M,), valid (M,) -> list of (n_c, 7) float32
    arrays for classes 0..num_classes-2 (background excluded).
    """
    dets = np.asarray(dets)
    labels = np.asarray(labels)
    valid = np.asarray(valid).astype(bool)
    return [
        dets[valid & (labels == c)] for c in range(num_classes - 1)
    ]


# ---------------------------------------------------------------------------
# Cascade R-CNN (reference mmdet/models/detectors/cascade_rcnn.py, lifted
# to 6-DoF): iterative bbox heads at increasing IoU thresholds, each
# stage re-assigning/sampling against the previous stage's decoded boxes.
# Regression is class-agnostic per stage; test-time scores average the
# per-stage classifiers on the final boxes.
# ---------------------------------------------------------------------------


def _semantic_roi_feats(sem_feat, rois, rvalid, cfg, out, out_d):
    """RoI-align the fused semantic feature and pool to the target roi
    grid (reference htc.py:57-63: semantic_roi_extractor + adaptive
    avg-pool when sizes differ).  Pooling requires integer ratios, which
    covers the reference configs (14 -> 7 = 2x2 mean)."""
    scfg = cfg.model.get("semantic_roi_extractor", {})
    layer = scfg.get("roi_layer", {})
    s_out = layer.get("out_size", out)
    s_out_d = layer.get("out_size_depth", out_d)
    strides = scfg.get("featmap_strides", [8])
    strides_d = scfg.get("featmap_strides_depth", [4])
    x = multi_level_roi_align_3d(
        [sem_feat], rois, s_out, s_out_d, strides, strides_d,
        layer.get("sample_num", 2), valid=rvalid,
    )
    if s_out != out or s_out_d != out_d:
        # adaptive average pooling: static per-axis (out, in) averaging
        # matrices reproduce torch adaptive_avg_pool bin semantics for
        # any size ratio (bin o covers [floor(o*I/O), ceil((o+1)*I/O)))
        def pool_mat(o_sz, i_sz):
            m = np.zeros((o_sz, i_sz), np.float32)
            for o in range(o_sz):
                s0 = (o * i_sz) // o_sz
                s1 = -((-(o + 1) * i_sz) // o_sz)  # ceil
                m[o, s0:s1] = 1.0 / (s1 - s0)
            return jnp.asarray(m, x.dtype)

        x = jnp.einsum("ndhwc,zd->nzhwc", x, pool_mat(out_d, s_out_d))
        x = jnp.einsum("ndhwc,yh->ndywc", x, pool_mat(out, s_out))
        x = jnp.einsum("ndhwc,xw->ndhxc", x, pool_mat(out, s_out))
    return x


def _mask_branch_loss(
    feats, samples, gt_masks, mask_roi_cfg, rc, fwd, fuse=None
):
    """Shared positive-roi mask branch (reference :301-327 /
    htc.py:72-111 / two_stage_rgb.py:203-238): pos-quota slice ->
    roi align (+optional feature fusion) -> `fwd` logits -> on-device
    mask targets -> mask BCE.  Serves the standard, refinement, HTC and
    RGB train paths."""
    pos_quota = int(
        round(rc["sampler"]["num"] * rc["sampler"]["pos_fraction"])
    )
    pos_rois = samples.rois[:, :pos_quota]
    pos_mask = samples.is_pos[:, :pos_quota]
    pos_gt = samples.gt_idx[:, :pos_quota]
    pos_labels = samples.labels[:, :pos_quota]

    rois, rvalid = flat_rois(pos_rois, pos_mask)
    mfeats = _roi_align_cfg(feats, rois, mask_roi_cfg, rvalid, dense=True)
    if fuse is not None:
        mfeats = mfeats + fuse(rois, rvalid)
    mpred = fwd(mfeats)
    mtargets = jax.vmap(
        lambda pr, pm, pgi, gm: mask_target_single(
            pr, pm, pgi, gm, rc["mask_size"], rc["mask_size_depth"]
        )
    )(pos_rois, pos_mask, pos_gt, gt_masks)
    flat_targets = mtargets.reshape(
        -1, rc["mask_size_depth"], rc["mask_size"], rc["mask_size"]
    )
    return mask_cross_entropy(
        mpred, flat_targets, pos_labels.reshape(-1), valid=rvalid
    )


def _htc_mask_stage_loss(
    model, apply, feats, sem_feat, samples, stage, batch, cfg, rc
):
    """One HTC mask stage: the shared mask branch with semantic fusion
    and info-flow through heads 0..stage-1 (reference htc.py:72-111)."""
    mask_roi_cfg = cfg.model["mask_roi_extractor"]
    fusion = tuple(cfg.model.get("semantic_fusion", ("bbox", "mask")))
    fuse = None
    if sem_feat is not None and "mask" in fusion:
        fuse = lambda rois, rvalid: _semantic_roi_feats(  # noqa: E731
            sem_feat, rois, rvalid, cfg,
            mask_roi_cfg["roi_layer"]["out_size"],
            mask_roi_cfg["roi_layer"]["out_size_depth"],
        )

    def fwd(mfeats):
        last = None
        if cfg.model.get("mask_info_flow", True):
            for i in range(stage):
                # gradients flow through earlier heads, as in the
                # reference (htc.py:98-103 runs them in-graph)
                _, last = apply(
                    mfeats, last, i, False, method=model.htc_mask_forward
                )
        mpred, _ = apply(
            mfeats, last, stage, method=model.htc_mask_forward
        )
        return mpred

    return _mask_branch_loss(
        feats, samples, batch["gt_masks"], mask_roi_cfg, rc, fwd,
        fuse=fuse,
    )


def cascade_forward_train(model, variables, batch, rng, cfg, anchor_sets):
    """Training losses for CascadeRCNN(3D) and HybridTaskCascade(3D).

    HTC additions (reference htc.py:156-264): fused semantic branch
    (+CE loss, feature fused into bbox/mask roi feats), interleaved
    mask stages trained on the CURRENT stage's regressed boxes, and
    mask-information flow through the previous stages' mask heads.
    """
    train_cfg = cfg.train_cfg
    num_classes = model.num_classes
    apply = functools.partial(model.apply, variables)
    rcnn_cfgs = train_cfg["rcnn"]
    if not isinstance(rcnn_cfgs, (list, tuple)):
        rcnn_cfgs = [rcnn_cfgs] * model.cascade_stages
    stage_weights = cfg.get(
        "stage_loss_weights", [1.0, 0.5, 0.25][: model.cascade_stages]
    )
    means = tuple(cfg.model["bbox_head"]["target_means"])
    stds = tuple(cfg.model["bbox_head"]["target_stds"])

    imgs = batch["imgs"]
    b = imgs.shape[0]
    img_shape = (imgs.shape[2], imgs.shape[3], 3, imgs.shape[1])
    gtb, gtv, gtl = (
        batch["gt_boxes"],
        batch["gt_valid"],
        batch["gt_labels"],
    )

    losses = {}
    rngs = jax.random.split(rng, 2 + 2 * model.cascade_stages)
    feats = apply(imgs, method=model.extract_feat)
    rpn_outs = apply(feats, 0, method=model.rpn)
    cls_outs = [o[0] for o in rpn_outs]
    reg_outs = [o[1] for o in rpn_outs]
    rpn_means, rpn_stds = rpn_codec(cfg)
    losses.update(
        rpn_loss(
            cls_outs, reg_outs, anchor_sets[0], gtb, gtv, rngs[0],
            train_cfg["rpn"], means=rpn_means, stds=rpn_stds,
        )
    )
    pboxes, pscores, pvalid = gen_proposals(
        cls_outs, reg_outs, anchor_sets[0], img_shape,
        train_cfg["rpn_proposal"], means=rpn_means, stds=rpn_stds,
    )
    pboxes = jax.lax.stop_gradient(pboxes)
    roi_cfg = cfg.model["bbox_roi_extractor"]

    # ---- HTC fused semantic branch (reference htc.py:183-190) ----
    sem_feat = None
    fusion = tuple(cfg.model.get("semantic_fusion", ("bbox", "mask")))
    if getattr(model, "with_semantic", False):
        sem_cfg = cfg.model.get("semantic_head", {})
        sem_logits, sem_feat = apply(feats, method=model.semantic_forward)
        if "gt_semantic_seg" in batch:
            gt_seg = batch["gt_semantic_seg"].astype(jnp.int32)
            if gt_seg.shape[1:4] != sem_logits.shape[1:4]:
                # accept full-resolution seg maps: nearest-downsample to
                # the fusion-level grid (the reference dataset ships 1/8
                # maps; doing it in-graph removes that coupling)
                gt_seg = jax.image.resize(
                    gt_seg, gt_seg.shape[:1] + sem_logits.shape[1:4],
                    method="nearest",
                )
            ignore = int(sem_cfg.get("ignore_label", 255))
            lw = float(sem_cfg.get("loss_weight", 0.2))
            logp = jax.nn.log_softmax(
                sem_logits.astype(jnp.float32), axis=-1
            )
            keep = (gt_seg != ignore) & (gt_seg >= 0)
            safe = jnp.where(keep, gt_seg, 0)
            nll = -jnp.take_along_axis(
                logp, safe[..., None], axis=-1
            )[..., 0]
            denom = jnp.maximum(jnp.sum(keep), 1.0)
            losses["loss_semantic_seg"] = lw * jnp.sum(
                jnp.where(keep, nll, 0.0)
            ) / denom

    for t, rc in enumerate(rcnn_cfgs[: model.cascade_stages]):
        keys = jax.random.split(rngs[2 + t], b)
        samples = jax.vmap(
            lambda k, pb, pv, gb, gv, gl: sample_rcnn_single(
                k, pb, pv, gb, gv, gl, rc, means, stds,
                num_classes=num_classes, reg_class_agnostic=True,
            )
        )(keys, pboxes, pvalid, gtb, gtv, gtl)
        rois, rvalid = flat_rois(samples.rois, samples.roi_valid)
        roi_feats = _roi_align_cfg(feats, rois, roi_cfg, rvalid, dense=True)
        if sem_feat is not None and "bbox" in fusion:
            roi_feats = roi_feats + _semantic_roi_feats(
                sem_feat, rois, rvalid, cfg,
                roi_cfg["roi_layer"]["out_size"],
                roi_cfg["roi_layer"]["out_size_depth"],
            )
        cls_score, bbox_pred = apply(roi_feats, t, method=model.bbox_forward)

        labels = samples.labels.reshape(-1)
        roi_valid = samples.roi_valid.reshape(-1)
        is_pos = samples.is_pos.reshape(-1)
        pw = float(rc.get("pos_weight", -1))
        pw = 1.0 if pw <= 0 else pw
        lw = jnp.where(roi_valid, jnp.where(is_pos, pw, 1.0), 0.0)
        avg_cls = jnp.maximum(jnp.sum(lw > 0), 1.0)
        w = float(stage_weights[t])
        losses[f"s{t}.loss_cls"] = w * weighted_cross_entropy(
            cls_score, labels, lw, avg_cls
        )
        avg_reg = (
            jnp.sum(samples.pos_count) + jnp.sum(samples.neg_count)
        ).astype(jnp.float32)
        losses[f"s{t}.loss_reg"] = w * weighted_smoothl1(
            bbox_pred,
            samples.bbox_targets.reshape(-1, 6),
            jnp.where(is_pos[:, None], 1.0, 0.0),
            1.0,
            avg_reg,
        )

        # next stage proposals: decoded class-agnostic boxes (detached)
        decoded = delta2bbox3d(
            rois[:, 1:],
            jax.lax.stop_gradient(bbox_pred),
            means,
            stds,
            img_shape,
        )
        pboxes = decoded.reshape(b, -1, 6)
        pvalid = samples.roi_valid

        # ---- HTC interleaved mask stage (reference htc.py:228-255) ----
        if model.with_mask and getattr(model, "htc", False):
            if cfg.model.get("interleaved", True):
                # re-assign/sample against THIS stage's regressed boxes
                mkeys = jax.random.split(
                    rngs[2 + model.cascade_stages + t], b
                )
                msamples = jax.vmap(
                    lambda k, pb, pv, gb, gv, gl: sample_rcnn_single(
                        k, pb, pv, gb, gv, gl, rc, means, stds,
                        num_classes=num_classes, reg_class_agnostic=True,
                    )
                )(mkeys, pboxes, pvalid, gtb, gtv, gtl)
            else:
                msamples = samples
            losses[f"s{t}.loss_mask"] = float(
                stage_weights[t]
            ) * _htc_mask_stage_loss(
                model, apply, feats, sem_feat, msamples, t,
                batch, cfg, rc,
            )

    total = sum(v for k, v in losses.items() if "loss" in k)
    return total, losses


RGB_SUFFIXES = ("_r", "_g", "_b")


def rgb_forward_train(model, variables, batch, rng, cfg, anchor_sets):
    """Training losses for the RGB 2.5-D family (reference
    two_stage_rgb.py:114-238): ONE shared feature extraction, then a
    full rpn/bbox/mask pass per channel slice with that slice's heads
    and gt.  The reference skips a slice when any batch image has no gt
    for it (:140-149); with static shapes that becomes a 0/1 loss weight.
    """
    train_cfg = cfg.train_cfg
    rcnn_cfg = train_cfg["rcnn"]
    num_classes = model.num_classes
    apply = functools.partial(model.apply, variables)
    means = tuple(cfg.model["bbox_head"]["target_means"])
    stds = tuple(cfg.model["bbox_head"]["target_stds"])
    rpn_means, rpn_stds = rpn_codec(cfg)
    roi_cfg = cfg.model["bbox_roi_extractor"]

    imgs = batch["imgs"]
    b = imgs.shape[0]
    img_shape = (imgs.shape[2], imgs.shape[3], 3, imgs.shape[1])
    feats = apply(imgs, method=model.extract_feat)

    losses = {}
    rngs = jax.random.split(rng, 2 * len(RGB_SUFFIXES))
    for s, sfx in enumerate(RGB_SUFFIXES):
        gtb = batch["gt_boxes" + sfx]
        gtv = batch["gt_valid" + sfx]
        gtl = batch["gt_labels" + sfx]
        # reference slice skip: all-or-nothing across the batch
        w_slice = jnp.all(jnp.any(gtv, axis=1)).astype(jnp.float32)

        rpn_outs = apply(feats, s, method=model.rpn)
        cls_outs = [o[0] for o in rpn_outs]
        reg_outs = [o[1] for o in rpn_outs]
        rl = rpn_loss(
            cls_outs, reg_outs, anchor_sets[0], gtb, gtv, rngs[2 * s],
            train_cfg["rpn"], suffix=sfx,
            means=rpn_means, stds=rpn_stds,
        )
        losses.update({k: w_slice * v for k, v in rl.items()})

        pboxes, pscores, pvalid = gen_proposals(
            cls_outs, reg_outs, anchor_sets[0], img_shape,
            train_cfg["rpn_proposal"], means=rpn_means, stds=rpn_stds,
        )
        pboxes = jax.lax.stop_gradient(pboxes)
        keys = jax.random.split(rngs[2 * s + 1], b)
        samples = jax.vmap(
            lambda k, pb, pv, gb, gv, gl: sample_rcnn_single(
                k, pb, pv, gb, gv, gl, rcnn_cfg, means, stds,
                num_classes=num_classes,
            )
        )(keys, pboxes, pvalid, gtb, gtv, gtl)
        rois, rvalid = flat_rois(samples.rois, samples.roi_valid)
        roi_feats = _roi_align_cfg(feats, rois, roi_cfg, rvalid, dense=True)
        out = apply(roi_feats, s, method=model.bbox_forward)
        bl = bbox_stage_loss(
            out[0], out[1], samples, num_classes,
            rcnn_cfg.get("pos_weight", -1), suffix=sfx,
        )
        losses.update({k: w_slice * v for k, v in bl.items()})

        if model.with_mask and ("gt_masks" + sfx) in batch:
            losses["loss_mask" + sfx] = w_slice * _mask_branch_loss(
                feats, samples, batch["gt_masks" + sfx],
                cfg.model["mask_roi_extractor"], rcnn_cfg,
                lambda f, s=s: apply(f, s, method=model.mask_forward),
            )

    total = sum(v for k, v in losses.items() if "loss" in k)
    return total, losses


def rgb_simple_test(model, variables, batch, cfg, anchor_sets):
    """RGB 2.5-D inference: one feature pass, per-slice head sets; each
    slice's detections are returned under its suffix (the reference
    selects one via slice_num, test_mixins_rgb.py)."""
    test_cfg = cfg.test_cfg
    rcnn_test = test_cfg["rcnn"]
    apply = functools.partial(model.apply, variables)
    means = tuple(cfg.model["bbox_head"]["target_means"])
    stds = tuple(cfg.model["bbox_head"]["target_stds"])
    rpn_means, rpn_stds = rpn_codec(cfg)
    roi_cfg = cfg.model["bbox_roi_extractor"]

    imgs = batch["imgs"]
    b = imgs.shape[0]
    img_shape = (imgs.shape[2], imgs.shape[3], 3, imgs.shape[1])
    feats = apply(imgs, method=model.extract_feat)

    out = {}
    for s, sfx in enumerate(RGB_SUFFIXES):
        rpn_outs = apply(feats, s, method=model.rpn)
        pboxes, pscores, pvalid = gen_proposals(
            [o[0] for o in rpn_outs], [o[1] for o in rpn_outs],
            anchor_sets[0], img_shape, test_cfg["rpn"],
            means=rpn_means, stds=rpn_stds,
        )
        rois, rvalid = flat_rois(pboxes, pvalid)
        roi_feats = _roi_align_cfg(feats, rois, roi_cfg, rvalid)
        head_out = apply(roi_feats, s, method=model.bbox_forward)
        scores = jax.nn.softmax(head_out[0], axis=-1)
        boxes = delta2bbox3d(
            rois[:, 1:], head_out[1], means, stds, img_shape
        )
        m = pboxes.shape[1]
        dets, labels, dvalid, _ = jax.vmap(
            lambda bx, sc, vd: multiclass_nms_3d(
                bx, sc, vd, rcnn_test["score_thr"],
                rcnn_test["nms"]["iou_thr"], rcnn_test["max_per_img"],
            )
        )(
            boxes.reshape(b, m, -1),
            scores.reshape(b, m, -1),
            rvalid.reshape(b, m),
        )
        out["dets" + sfx] = dets
        out["labels" + sfx] = labels
        out["valid" + sfx] = dvalid
        if model.with_mask and not test_cfg.get("return_bbox_only", False):
            mask_roi_cfg = cfg.model["mask_roi_extractor"]
            mrois, mrvalid = flat_rois(dets[..., :6], dvalid)
            mfeats = _roi_align_cfg(
                feats, mrois, mask_roi_cfg, mrvalid,
                chunk=int(test_cfg.get("mask_roi_chunk", 512)),
            )
            out["mask_logits" + sfx] = apply(
                mfeats, s, method=model.mask_forward
            )
    # default keys mirror slice r (reference tools default slice_num=-1
    # picks a single slice's heads)
    out["dets"] = out["dets_r"]
    out["labels"] = out["labels_r"]
    out["valid"] = out["valid_r"]
    return out


def cascade_simple_test(model, variables, batch, cfg, anchor_sets):
    """Inference for CascadeRCNN(3D) / HTC: iterate heads, average stage
    scores; HTC fuses the semantic feature into every roi pass and
    ensembles the per-stage mask heads with info flow
    (reference htc.py:266-389)."""
    test_cfg = cfg.test_cfg
    rcnn_test = test_cfg["rcnn"]
    apply = functools.partial(model.apply, variables)
    means = tuple(cfg.model["bbox_head"]["target_means"])
    stds = tuple(cfg.model["bbox_head"]["target_stds"])
    roi_cfg = cfg.model["bbox_roi_extractor"]

    imgs = batch["imgs"]
    b = imgs.shape[0]
    img_shape = (imgs.shape[2], imgs.shape[3], 3, imgs.shape[1])
    feats = apply(imgs, method=model.extract_feat)
    rpn_outs = apply(feats, 0, method=model.rpn)
    rpn_means, rpn_stds = rpn_codec(cfg)
    pboxes, pscores, pvalid = gen_proposals(
        [o[0] for o in rpn_outs],
        [o[1] for o in rpn_outs],
        anchor_sets[0],
        img_shape,
        test_cfg["rpn"],
        means=rpn_means,
        stds=rpn_stds,
    )
    sem_feat = None
    fusion = tuple(cfg.model.get("semantic_fusion", ("bbox", "mask")))
    if getattr(model, "with_semantic", False):
        _, sem_feat = apply(feats, method=model.semantic_forward)

    boxes = pboxes
    score_sum = None
    for t in range(model.cascade_stages):
        rois, rvalid = flat_rois(boxes, pvalid)
        roi_feats = _roi_align_cfg(feats, rois, roi_cfg, rvalid)
        if sem_feat is not None and "bbox" in fusion:
            roi_feats = roi_feats + _semantic_roi_feats(
                sem_feat, rois, rvalid, cfg,
                roi_cfg["roi_layer"]["out_size"],
                roi_cfg["roi_layer"]["out_size_depth"],
            )
        cls_score, bbox_pred = apply(roi_feats, t, method=model.bbox_forward)
        sc = jax.nn.softmax(cls_score, axis=-1)
        score_sum = sc if score_sum is None else score_sum + sc
        decoded = delta2bbox3d(rois[:, 1:], bbox_pred, means, stds, img_shape)
        boxes = decoded.reshape(b, -1, 6)
    m = boxes.shape[1]
    scores = (score_sum / model.cascade_stages).reshape(b, m, -1)

    def nms_one(bx, sc, vd):
        return multiclass_nms_3d(
            bx, sc, vd,
            rcnn_test["score_thr"],
            rcnn_test["nms"]["iou_thr"],
            rcnn_test["max_per_img"],
        )

    dets, labels, dvalid, _ = jax.vmap(nms_one)(boxes, scores, pvalid)
    out = dict(dets=dets, labels=labels, valid=dvalid)

    if model.with_mask and getattr(model, "htc", False) and not (
        test_cfg.get("return_bbox_only", False)
    ):
        # per-stage mask ensemble with info flow (reference htc.py:340-371:
        # merge_aug_masks averages sigmoid scores across stages)
        mask_roi_cfg = cfg.model["mask_roi_extractor"]
        mrois, mrvalid = flat_rois(dets[..., :6], dvalid)
        mfeats = _roi_align_cfg(
            feats, mrois, mask_roi_cfg, mrvalid,
            chunk=int(test_cfg.get("mask_roi_chunk", 512)),
        )
        if sem_feat is not None and "mask" in fusion:
            mfeats = mfeats + _semantic_roi_feats(
                sem_feat, mrois, mrvalid, cfg,
                mask_roi_cfg["roi_layer"]["out_size"],
                mask_roi_cfg["roi_layer"]["out_size_depth"],
            )
        last = None
        prob_sum = None
        for t in range(model.cascade_stages):
            if cfg.model.get("mask_info_flow", True):
                logits, last = apply(
                    mfeats, last, t, method=model.htc_mask_forward
                )
            else:
                logits, _ = apply(
                    mfeats, None, t, method=model.htc_mask_forward
                )
            p = jax.nn.sigmoid(logits.astype(jnp.float32))
            prob_sum = p if prob_sum is None else prob_sum + p
        mean_p = jnp.clip(
            prob_sum / model.cascade_stages, 1e-6, 1.0 - 1e-6
        )
        # return as logits so downstream sigmoid recovers the ensemble
        # probability exactly (eval/masks.py applies sigmoid)
        out["mask_logits"] = jnp.log(mean_p) - jnp.log1p(-mean_p)
    return out
