"""Assignment, sampling and target encoding — vectorized, static shapes.

The reference does all of this with dynamic-shape torch ops
(`torch.nonzero`, boolean indexing, per-image python loops); the TPU-native
formulation below keeps every array at a static padded size with boolean
validity masks, so the whole train step jit-compiles into one XLA program.

Ground truth is padded to a fixed `max_gt` with a `gt_valid` mask; sampled
indices are fixed-size arrays with slot masks; invalid scatter slots are
routed to an out-of-bounds index (JAX drops OOB scatter updates).

Semantics ported from:
  * MaxIoUAssigner 4-step rule —
    mmdet/core/bbox/assigners/max_iou_assigner.py:130-223
  * RandomSampler (samples WITH replacement above quota via
    np.random.randint) — mmdet/core/bbox/samplers/random_sampler.py:36-59
  * anchor_target_single — mmdet/core/anchor/anchor_target.py:126-201
  * bbox_target_3d — mmdet/core/bbox/bbox_target.py:34-58,130-182
  * mask_target — mmdet/core/mask/mask_target.py:17-51
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.box3d import bbox2delta3d, bbox_overlaps_3d


def max_iou_assign(
    boxes,
    box_valid,
    gt_boxes,
    gt_valid,
    pos_iou_thr,
    neg_iou_thr,
    min_pos_iou,
    gt_max_assign_all=True,
):
    """4-step max-IoU assignment.

    Args:
      boxes: (N, 6) candidate boxes (anchors or proposals).
      box_valid: (N,) bool — invalid boxes are forced to assignment -1.
      gt_boxes: (G, 6) padded ground truth; gt_valid (G,) bool.

    Returns:
      assigned: (N,) int32 — -1 ignore, 0 negative, i+1 → gt i.
      max_overlaps: (N,) float32 best IoU per box (over valid gts).
      argmax: (N,) int32 index of best gt per box.
    """
    g = gt_boxes.shape[0]
    overlaps = bbox_overlaps_3d(gt_boxes, boxes)  # (G, N)
    pair_valid = gt_valid[:, None] & box_valid[None, :]
    overlaps = jnp.where(pair_valid, overlaps, -1.0)

    max_overlaps = overlaps.max(axis=0)
    argmax = overlaps.argmax(axis=0).astype(jnp.int32)
    gt_max = overlaps.max(axis=1)  # (G,)

    assigned = jnp.full(boxes.shape[0], -1, jnp.int32)
    # step 2: negatives
    assigned = jnp.where(
        (max_overlaps >= 0) & (max_overlaps < neg_iou_thr), 0, assigned
    )
    # step 3: positives above pos_iou_thr
    assigned = jnp.where(max_overlaps >= pos_iou_thr, argmax + 1, assigned)
    # step 4: per-gt best proposal (sequential loop in the reference —
    # later gts override earlier, reproduced via last-eligible-gt argmax)
    eligible = (
        (overlaps == gt_max[:, None])
        & (gt_max >= min_pos_iou)[:, None]
        & gt_valid[:, None]
        & (gt_max > -1.0)[:, None]
    )
    if not gt_max_assign_all:
        # only the single argmax anchor per gt
        is_argmax = (
            jnp.arange(overlaps.shape[1])[None, :]
            == overlaps.argmax(axis=1)[:, None]
        )
        eligible = eligible & is_argmax
    any_elig = eligible.any(axis=0)
    gt_idx = jnp.arange(g, dtype=jnp.int32)[:, None]
    last_elig = jnp.max(jnp.where(eligible, gt_idx, -1), axis=0)
    assigned = jnp.where(any_elig, last_elig + 1, assigned)
    assigned = jnp.where(box_valid, assigned, -1)
    return assigned, max_overlaps, argmax


class SampleResult(NamedTuple):
    """Fixed-size sampling result (padded with slot masks)."""

    pos_inds: jnp.ndarray  # (P,) int32 indices into the candidate array
    pos_mask: jnp.ndarray  # (P,) bool
    neg_inds: jnp.ndarray  # (Q,) int32
    neg_mask: jnp.ndarray  # (Q,) bool
    pos_count: jnp.ndarray  # () int32
    neg_count: jnp.ndarray  # () int32


def _unique_compact(draws, valid, sentinel):
    """torch `.unique()` of a masked draw array, static shapes.

    draws: (K,) int32; valid: (K,) bool — invalid slots are ignored.
    Returns (inds (K,), mask (K,), count ()) with the DISTINCT valid
    values sorted ascending first (torch.unique returns sorted values),
    masked-out slots zeroed.
    """
    k = draws.shape[0]
    x = jnp.where(valid, draws, sentinel)
    sx = jnp.sort(x)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sx[1:] != sx[:-1]]
    ) & (sx < sentinel)
    perm = jnp.argsort(~first, stable=True)
    out = sx[perm].astype(jnp.int32)
    count = jnp.sum(first)
    mask = jnp.arange(k) < count
    return jnp.where(mask, out, 0), mask, count


def random_sample(key, assigned, num, pos_fraction):
    """RandomSampler with exact reference semantics, static shapes.

    Above-quota classes draw WITH replacement (reference
    random_sampler.py:36-39 np.random.randint) and are then deduped and
    sorted (base_sampler.py `.unique()` on both pos_inds and neg_inds),
    so the realised count can fall below quota — and the negative quota
    itself is `num - num_sampled_pos` with the DEDUPED positive count
    (base_sampler.py:77-79).  Below quota, all candidates are taken in
    ascending index order (torch.nonzero order).  The in-jit dedup is a
    sort + first-occurrence compaction (`_unique_compact`).

    Returns SampleResult with P = round(num * pos_fraction), Q = num.
    """
    num_expected_pos = int(round(num * pos_fraction))
    kp, kn = jax.random.split(key)

    is_pos = assigned > 0
    is_neg = assigned == 0
    n_pos = jnp.sum(is_pos)
    n_neg = jnp.sum(is_neg)
    n_all = assigned.shape[0]

    def take(order, k):
        # order[:k], zero-padded when fewer candidates than slots exist
        if order.shape[0] >= k:
            return order[:k]
        pad = jnp.zeros((k - order.shape[0],), order.dtype)
        return jnp.concatenate([order, pad])

    # positives first (ascending index), stable
    pos_order = jnp.argsort(~is_pos, stable=True).astype(jnp.int32)
    r = jax.random.randint(
        kp, (num_expected_pos,), 0, jnp.maximum(n_pos, 1)
    )
    pos_draws = pos_order[jnp.clip(r, 0, pos_order.shape[0] - 1)]
    pos_uniq, pos_uniq_mask, pos_uniq_cnt = _unique_compact(
        pos_draws, jnp.ones((num_expected_pos,), bool), n_all
    )
    pos_seq = take(pos_order, num_expected_pos)
    over = n_pos > num_expected_pos
    pos_inds = jnp.where(over, pos_uniq, pos_seq)
    pos_mask = jnp.where(
        over, pos_uniq_mask, jnp.arange(num_expected_pos) < n_pos
    )
    pos_count = jnp.where(over, pos_uniq_cnt, n_pos)

    num_expected_neg = num - pos_count  # dynamic scalar, bounded by num
    neg_order = jnp.argsort(~is_neg, stable=True).astype(jnp.int32)
    # draw `num` iid ints and treat the first num_expected_neg as the
    # reference's dynamic-size draw (an iid prefix IS that draw)
    rn = jax.random.randint(kn, (num,), 0, jnp.maximum(n_neg, 1))
    neg_draws = neg_order[jnp.clip(rn, 0, neg_order.shape[0] - 1)]
    draw_valid = jnp.arange(num) < num_expected_neg
    neg_uniq, neg_uniq_mask, neg_uniq_cnt = _unique_compact(
        neg_draws, draw_valid, n_all
    )
    over_n = n_neg > num_expected_neg
    under_cnt = jnp.minimum(n_neg, num_expected_neg)
    neg_inds = jnp.where(over_n, neg_uniq, take(neg_order, num))
    neg_count = jnp.where(over_n, neg_uniq_cnt, under_cnt)
    neg_mask = jnp.where(
        over_n, neg_uniq_mask, jnp.arange(num) < under_cnt
    )

    return SampleResult(
        pos_inds, pos_mask, neg_inds, neg_mask, pos_count, neg_count
    )


def hard_negative_sample(
    key, assigned, num, pos_fraction, neg_rank_key
):
    """Sampler with ranked negative selection — the vectorized stand-in
    for the reference's OHEM / IoU-balanced negative samplers
    (mmdet/core/bbox/samplers/ohem_sampler.py, iou_balanced_neg_sampler.py,
    present but unused there).

    Positives: as `random_sample`.  Negatives: the top
    (num - pos_count) candidates by `neg_rank_key` (e.g. proposal
    objectness for hard negatives, or negated |IoU - 0.25| for an
    IoU-balanced flavour) instead of uniform sampling.
    """
    base = random_sample(key, assigned, num, pos_fraction)
    is_neg = assigned == 0
    neg_inf = jnp.asarray(-jnp.inf, jnp.float32)
    ranked = jnp.where(is_neg, neg_rank_key.astype(jnp.float32), neg_inf)
    top_vals, top_idx = jax.lax.top_k(ranked, num)
    n_neg = jnp.sum(is_neg)
    num_expected_neg = num - base.pos_count
    neg_count = jnp.minimum(n_neg, num_expected_neg)
    neg_mask = (jnp.arange(num) < neg_count) & (top_vals > neg_inf)
    return SampleResult(
        base.pos_inds,
        base.pos_mask,
        top_idx.astype(jnp.int32),
        neg_mask,
        base.pos_count,
        neg_count,
    )


def _oob(inds, mask, size):
    """Route masked-out slots to an out-of-bounds index (dropped on scatter)."""
    return jnp.where(mask, inds, size)


def anchor_target_single(
    key,
    anchors,
    inside,
    gt_boxes,
    gt_valid,
    cfg,
    target_means,
    target_stds,
):
    """RPN anchor targets for one image over the flat multi-level anchor set.

    Reference anchor_target_single (anchor_target.py:126-201).  gt_labels is
    None in the RPN path so positives get label 1.

    Args:
      anchors: (A, 6); inside: (A,) bool inside-image flags.
      cfg: dict with assigner/sampler/pos_weight keys (train_cfg.rpn).

    Returns dict of labels (A,), label_weights (A,), bbox_targets (A, 6),
    bbox_weights (A, 6), num_pos, num_neg (scalars, clamped >= 1).
    """
    a = anchors.shape[0]
    assigner = cfg["assigner"]
    sampler = cfg["sampler"]
    assigned, _, _ = max_iou_assign(
        anchors,
        inside,
        gt_boxes,
        gt_valid,
        assigner["pos_iou_thr"],
        assigner["neg_iou_thr"],
        assigner["min_pos_iou"],
    )
    res = random_sample(key, assigned, sampler["num"], sampler["pos_fraction"])

    pos_anchor = anchors[res.pos_inds]
    pos_gt_idx = jnp.maximum(assigned[res.pos_inds] - 1, 0)
    pos_gt = gt_boxes[pos_gt_idx]
    pos_deltas = bbox2delta3d(pos_anchor, pos_gt, target_means, target_stds)

    pos_w = float(cfg.get("pos_weight", -1))
    pos_label_w = 1.0 if pos_w <= 0 else pos_w

    pos_scatter = _oob(res.pos_inds, res.pos_mask, a)
    neg_scatter = _oob(res.neg_inds, res.neg_mask, a)

    labels = jnp.zeros((a,), jnp.int32).at[pos_scatter].set(1)
    label_weights = (
        jnp.zeros((a,), jnp.float32)
        .at[neg_scatter]
        .set(1.0)
        .at[pos_scatter]
        .set(pos_label_w)
    )
    bbox_targets = (
        jnp.zeros((a, 6), jnp.float32).at[pos_scatter].set(pos_deltas)
    )
    bbox_weights = jnp.zeros((a, 6), jnp.float32).at[pos_scatter].set(1.0)

    num_pos = jnp.maximum(res.pos_count, 1)
    num_neg = jnp.maximum(res.neg_count, 1)
    return dict(
        labels=labels,
        label_weights=label_weights,
        bbox_targets=bbox_targets,
        bbox_weights=bbox_weights,
        num_pos=num_pos,
        num_neg=num_neg,
    )


class RcnnSample(NamedTuple):
    """Packed fixed-size RoI sample for the R-CNN stage (one image).

    rois: (R, 6) sampled boxes (image coords); roi_valid (R,) bool;
    is_pos (R,) bool; labels (R,) int32 (gt class for pos, 0 for neg);
    gt_idx (R,) int32 assigned gt index for positives (0 otherwise);
    bbox_targets (R, 6) encoded deltas; bbox_weights (R, 6);
    pos_count / neg_count scalars.
    """

    rois: jnp.ndarray
    roi_valid: jnp.ndarray
    is_pos: jnp.ndarray
    labels: jnp.ndarray
    gt_idx: jnp.ndarray
    bbox_targets: jnp.ndarray
    bbox_weights: jnp.ndarray
    pos_count: jnp.ndarray
    neg_count: jnp.ndarray


def sample_rcnn_single(
    key,
    proposals,
    proposal_valid,
    gt_boxes,
    gt_valid,
    gt_labels,
    cfg,
    target_means,
    target_stds,
    num_classes=2,
    reg_class_agnostic=False,
    add_gt_as_proposals=True,
    proposal_scores=None,
):
    """Assign + sample proposals and build R-CNN bbox-head targets.

    Mirrors TwoStageDetector3D.forward_train's per-image assign/sample +
    bbox_target_3d (two_stage_3d.py:181-257) with static shapes.  The
    output is packed to R = sampler.num slots: positives first (ascending),
    then negatives, then padding.

    proposals: (Np, 6); gt prepended when add_gt_as_proposals (reference
    base_sampler.py:110-126).
    """
    sampler = cfg["sampler"]
    assigner = cfg["assigner"]
    num = sampler["num"]

    if add_gt_as_proposals:
        cand = jnp.concatenate([gt_boxes, proposals], axis=0)
        cand_valid = jnp.concatenate([gt_valid, proposal_valid], axis=0)
    else:
        cand = proposals
        cand_valid = proposal_valid

    assigned, _, _ = max_iou_assign(
        cand,
        cand_valid,
        gt_boxes,
        gt_valid,
        assigner["pos_iou_thr"],
        assigner["neg_iou_thr"],
        assigner["min_pos_iou"],
    )
    if add_gt_as_proposals:
        # reference assign_result.add_gt_: gt i assigns to itself
        g = gt_boxes.shape[0]
        self_assign = jnp.where(
            gt_valid, jnp.arange(1, g + 1, dtype=jnp.int32), -1
        )
        assigned = assigned.at[:g].set(self_assign)

    sampler_type = sampler.get("type", "RandomSampler")
    if sampler_type in ("OHEMSampler", "HardNegativeSampler") and (
        proposal_scores is not None
    ):
        g = gt_boxes.shape[0] if add_gt_as_proposals else 0
        scores = proposal_scores
        if add_gt_as_proposals:
            scores = jnp.concatenate(
                [jnp.zeros((g,), scores.dtype), scores]
            )
        res = hard_negative_sample(
            key, assigned, num, sampler["pos_fraction"], scores
        )
    else:
        res = random_sample(key, assigned, num, sampler["pos_fraction"])

    p = res.pos_inds.shape[0]  # quota of positive slots
    # pack [pos slots | neg slots] then keep the first `num` valid slots
    all_inds = jnp.concatenate([res.pos_inds, res.neg_inds])
    all_mask = jnp.concatenate([res.pos_mask, res.neg_mask])
    all_is_pos = jnp.concatenate(
        [
            jnp.ones((p,), bool),
            jnp.zeros((num,), bool),
        ]
    )
    pack = jnp.argsort(~all_mask, stable=True)[:num]
    inds = all_inds[pack]
    roi_valid = all_mask[pack]
    is_pos = all_is_pos[pack] & roi_valid

    rois = jnp.where(roi_valid[:, None], cand[inds], 0.0)
    assigned_s = assigned[inds]
    gt_idx = jnp.where(is_pos, jnp.maximum(assigned_s - 1, 0), 0)
    labels = jnp.where(is_pos, gt_labels[gt_idx], 0)

    deltas = bbox2delta3d(rois, gt_boxes[gt_idx], target_means, target_stds)
    # targets are packed per-roi (6-dim) regardless of reg_class_agnostic:
    # the class-specific column expansion of the reference bbox_target
    # (bbox_target.py expand dims to 6*C) is done equivalently at the loss
    # by gathering the labeled class's prediction slice
    # (pipeline.bbox_stage_loss); agnostic heads skip that gather.
    bbox_targets = jnp.where(is_pos[:, None], deltas, 0.0)
    bbox_weights = jnp.where(is_pos[:, None], 1.0, 0.0)

    return RcnnSample(
        rois=rois,
        roi_valid=roi_valid,
        is_pos=is_pos,
        labels=labels.astype(jnp.int32),
        gt_idx=gt_idx.astype(jnp.int32),
        bbox_targets=bbox_targets,
        bbox_weights=bbox_weights,
        pos_count=jnp.maximum(res.pos_count, 1),
        neg_count=jnp.maximum(res.neg_count, 1),
    )


def mask_target_single(
    pos_rois,
    pos_mask,
    pos_gt_idx,
    gt_masks,
    mask_size,
    mask_size_depth,
):
    """On-device voxel mask targets (replaces the reference's per-proposal
    CPU skimage.resize loop, mask_target.py:17-51).

    The reference crops the gt mask to the int-truncated box, linearly
    resizes to (mask_size_depth, mask_size, mask_size), scales by 255,
    casts to uint8 and binarizes `> 0` — i.e. any sample with interpolated
    occupancy >= 1/255 becomes foreground.  We reproduce that with an
    on-device trilinear sample of the binary mask at skimage's grid-center
    coordinates and a >= 1/255 threshold.

    Args:
      pos_rois: (P, 6) positive proposal boxes (image coords).
      pos_gt_idx: (P,) assigned gt per positive.
      gt_masks: (G, D, H, W) binary {0,1} volumes.

    Returns (P, mask_size_depth, mask_size, mask_size) float32 targets.
    """
    g, d, h, w = gt_masks.shape
    bbox = jnp.floor(pos_rois).astype(jnp.int32)  # trunc matches astype(int32)
    x1, y1, z1 = bbox[:, 0], bbox[:, 1], bbox[:, 4]
    bw = jnp.maximum(bbox[:, 2] - x1 + 1, 1)
    bh = jnp.maximum(bbox[:, 3] - y1 + 1, 1)
    bd = jnp.maximum(bbox[:, 5] - z1 + 1, 1)

    def axis_coords(start, extent, out):
        # skimage.resize maps output i -> input (i + .5) * scale - .5
        scale = extent.astype(jnp.float32) / out
        i = jnp.arange(out, dtype=jnp.float32)
        return start[:, None].astype(jnp.float32) + (
            (i[None, :] + 0.5) * scale[:, None] - 0.5
        )

    zc = axis_coords(z1, bd, mask_size_depth)  # (P, Dm)
    yc = axis_coords(y1, bh, mask_size)  # (P, Hm)
    xc = axis_coords(x1, bw, mask_size)  # (P, Wm)

    def interp_axis(c, dim):
        c = jnp.clip(c, 0.0, dim - 1.0)
        lo = jnp.floor(c).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, dim - 1)
        frac = c - lo
        return lo, hi, 1.0 - frac, frac

    zl, zh, wzl, wzh = interp_axis(zc, d)
    yl, yh, wyl, wyh = interp_axis(yc, h)
    xl, xh, wxl, wxh = interp_axis(xc, w)

    # Separable trilinear sampling as three per-roi interpolation-matrix
    # contractions on the MXU.  The previous per-corner formulation
    # gathered SCALAR elements (the mask has no channel dim), which on
    # TPU runs ~128x under the gather fast path's row rate — measured
    # 580 ms for 256 positives at crop geometry vs ~8 ms for this form.
    # The trilinear weighted sum is mathematically identical (the 2-tap
    # matrices are exactly the corner weights).
    def axis_matrix(lo, hi, wl, wh, dim):
        cols = jax.lax.broadcasted_iota(
            jnp.int32, lo.shape + (dim,), 2
        )
        return (
            (cols == lo[..., None]).astype(jnp.float32) * wl[..., None]
            + (cols == hi[..., None]).astype(jnp.float32) * wh[..., None]
        )

    mz = axis_matrix(zl, zh, wzl, wzh, d)  # (P, Dm, D)
    my = axis_matrix(yl, yh, wyl, wyh, h)  # (P, Hm, H)
    mx = axis_matrix(xl, xh, wxl, wxh, w)  # (P, Wm, W)

    # fold the per-roi gt selection into the z matrix (one-hot over G):
    # the first contraction then reads the G gt masks ONCE instead of
    # materializing a (P, D, H, W) per-roi copy (1 GB at crop geometry)
    onehot = (
        jnp.arange(g)[None, :] == pos_gt_idx[:, None]
    ).astype(jnp.float32)  # (P, G)
    mzg = jnp.einsum("pg,pzd->pzgd", onehot, mz)
    acc = jnp.einsum(
        "gdhw,pzgd->pzhw",
        gt_masks.astype(jnp.float32),
        mzg,
        preferred_element_type=jnp.float32,
    )
    acc = jnp.einsum(
        "pzhw,pyh->pzyw", acc, my, preferred_element_type=jnp.float32
    )
    acc = jnp.einsum(
        "pzyw,pxw->pzyx", acc, mx, preferred_element_type=jnp.float32
    )

    targets = (acc >= 1.0 / 255.0).astype(jnp.float32)
    return jnp.where(pos_mask[:, None, None, None], targets, 0.0)


def anchor_target_focal_single(
    anchors,
    inside,
    gt_boxes,
    gt_valid,
    gt_labels,
    cfg,
    target_means,
    target_stds,
):
    """Anchor targets for focal-loss single-stage heads (no sampling —
    the reference uses PseudoSampler when use_focal_loss, anchor_head
    path): every assigned anchor contributes; labels carry the gt class.

    Returns labels (A,) int32 (0 bg, c fg), label_weights (A,),
    bbox_targets/weights (A, 6), num_pos scalar (>= 1).
    """
    assigner = cfg["assigner"]
    assigned, _, argmax = max_iou_assign(
        anchors,
        inside,
        gt_boxes,
        gt_valid,
        assigner["pos_iou_thr"],
        assigner["neg_iou_thr"],
        assigner["min_pos_iou"],
    )
    is_pos = assigned > 0
    is_neg = assigned == 0
    gt_idx = jnp.maximum(assigned - 1, 0)
    labels = jnp.where(is_pos, gt_labels[gt_idx], 0).astype(jnp.int32)
    pw = float(cfg.get("pos_weight", -1))
    pos_label_w = 1.0 if pw <= 0 else pw
    label_weights = jnp.where(
        is_pos, pos_label_w, jnp.where(is_neg, 1.0, 0.0)
    )
    deltas = bbox2delta3d(
        anchors, gt_boxes[gt_idx], target_means, target_stds
    )
    bbox_targets = jnp.where(is_pos[:, None], deltas, 0.0)
    bbox_weights = jnp.where(is_pos[:, None], 1.0, 0.0)
    num_pos = jnp.maximum(jnp.sum(is_pos), 1)
    return dict(
        labels=labels,
        label_weights=label_weights,
        bbox_targets=bbox_targets,
        bbox_weights=bbox_weights,
        num_pos=num_pos,
    )
