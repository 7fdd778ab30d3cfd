"""Anchor generation ordering/content and assign/sample target tests."""
import numpy as np
import jax
import jax.numpy as jnp

from mrcnn3d.core.anchors import AnchorGenerator3D, anchor_inside_flags
from mrcnn3d.core.targets import (
    anchor_target_single,
    max_iou_assign,
    random_sample,
    sample_rcnn_single,
    mask_target_single,
)


class TestAnchorGenerator:
    def test_base_anchors_single_scale(self):
        # base_size=4 (stride), scale 2, depth base 2 scale 2, ratio 1
        gen = AnchorGenerator3D(4, [2], [2], [1.0], 2)
        base = gen.base_anchors
        assert base.shape == (1, 6)
        # w = h = 4*2 = 8, centered at 1.5 -> [-2, 5]; z: 2*2=4 at 0.5 -> [-1, 2]
        np.testing.assert_allclose(base[0], [-2, -2, 5, 5, -1, 2])

    def test_grid_count_and_set_equality(self):
        gen = AnchorGenerator3D(4, [2], [2], [1.0], 2)
        ours = gen.grid_anchors((3, 4, 5), stride=4, depth_stride=2)
        ref = gen.grid_anchors((3, 4, 5), stride=4, depth_stride=2,
                               order="ref")
        assert ours.shape == (60, 6)
        # same anchor *set*, different flattening order
        s1 = {tuple(a) for a in ours.tolist()}
        s2 = {tuple(a) for a in ref.tolist()}
        assert s1 == s2

    def test_dhw_ordering_matches_reshape(self):
        gen = AnchorGenerator3D(4, [2], [2], [1.0], 2)
        anchors = gen.grid_anchors((2, 3, 4), stride=4, depth_stride=2)
        a = anchors.reshape(2, 3, 4, 1, 6)
        # moving along w changes x by stride
        np.testing.assert_allclose(
            a[0, 0, 1, 0, 0] - a[0, 0, 0, 0, 0], 4.0
        )
        # moving along h changes y
        np.testing.assert_allclose(
            a[0, 1, 0, 0, 1] - a[0, 0, 0, 0, 1], 4.0
        )
        # moving along d changes z
        np.testing.assert_allclose(
            a[1, 0, 0, 0, 4] - a[0, 0, 0, 0, 4], 2.0
        )

    def test_valid_flags(self):
        gen = AnchorGenerator3D(4, [2], [2], [1.0], 2)
        flags = gen.valid_flags((2, 3, 4), (2, 2, 2))
        assert flags.shape == (24,)
        f = flags.reshape(2, 3, 4)
        assert f[:, :2, :2].all() and not f[:, 2:, :].any()

    def test_inside_flags(self):
        anchors = np.array(
            [
                [0, 0, 10, 10, 0, 5],
                [-4, 0, 10, 10, 0, 5],
                [0, 0, 10, 10, 0, 40],
            ],
            np.float32,
        )
        valid = np.ones(3, bool)
        inside = anchor_inside_flags(anchors, valid, (32, 32, 3, 20), 0)
        assert inside.tolist() == [True, False, False]


class TestAssigner:
    def _gt(self):
        gt = jnp.asarray(
            [
                [10, 10, 30, 30, 2, 8],
                [50, 50, 90, 90, 5, 15],
                [0, 0, 0, 0, 0, 0],  # padding
            ],
            jnp.float32,
        )
        gt_valid = jnp.asarray([True, True, False])
        return gt, gt_valid

    def test_four_step_rule(self):
        gt, gt_valid = self._gt()
        boxes = jnp.asarray(
            [
                [10, 10, 30, 30, 2, 8],  # IoU 1 with gt0 -> pos
                [100, 100, 120, 120, 0, 5],  # no overlap -> neg
                [52, 52, 88, 88, 6, 14],  # high IoU gt1 -> pos
                [12, 14, 33, 35, 3, 9],  # moderate IoU gt0
            ],
            jnp.float32,
        )
        assigned, max_ov, _ = max_iou_assign(
            boxes, jnp.ones(4, bool), gt, gt_valid, 0.7, 0.3, 0.3
        )
        assigned = np.asarray(assigned)
        assert assigned[0] == 1
        assert assigned[1] == 0
        assert assigned[2] == 2

    def test_step4_rescues_low_iou_best_anchor(self):
        # gt whose best anchor IoU is below pos_thr but above min_pos_iou
        gt = jnp.asarray([[0, 0, 20, 20, 0, 10]], jnp.float32)
        boxes = jnp.asarray(
            [
                [0, 0, 20, 20, 5, 15],  # partial overlap, best for gt
                [200, 200, 220, 220, 0, 10],
            ],
            jnp.float32,
        )
        assigned, _, _ = max_iou_assign(
            boxes, jnp.ones(2, bool), gt, jnp.asarray([True]), 0.9, 0.3, 0.1
        )
        assert int(assigned[0]) == 1

    def test_invalid_boxes_ignored(self):
        gt, gt_valid = self._gt()
        boxes = jnp.asarray([[10, 10, 30, 30, 2, 8]], jnp.float32)
        assigned, _, _ = max_iou_assign(
            boxes, jnp.zeros(1, bool), gt, gt_valid, 0.7, 0.3, 0.3
        )
        assert int(assigned[0]) == -1


class TestSampler:
    def test_under_quota_takes_all(self):
        assigned = jnp.asarray([1, 0, 0, 2, -1, 0, 1, -1], jnp.int32)
        res = random_sample(jax.random.PRNGKey(0), assigned, 8, 0.5)
        # 3 positives (idx 0,3,6), quota 4
        assert int(res.pos_count) == 3
        got = set(np.asarray(res.pos_inds)[np.asarray(res.pos_mask)].tolist())
        assert got == {0, 3, 6}
        # negatives: quota 8-3=5, available 3 -> all of 1,2,5
        assert int(res.neg_count) == 3
        gotn = set(np.asarray(res.neg_inds)[np.asarray(res.neg_mask)].tolist())
        assert gotn == {1, 2, 5}

    def test_over_quota_samples_positive_indices(self):
        assigned = jnp.asarray([1] * 20 + [0] * 30, jnp.int32)
        res = random_sample(jax.random.PRNGKey(1), assigned, 16, 0.25)
        assert int(res.pos_count) == 4
        assert np.asarray(res.pos_mask).all()
        pos = np.asarray(res.pos_inds)
        assert ((0 <= pos) & (pos < 20)).all()
        neg = np.asarray(res.neg_inds)[np.asarray(res.neg_mask)]
        assert ((20 <= neg) & (neg < 50)).all()
        assert len(neg) == 12


RPN_CFG = dict(
    assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3),
    sampler=dict(num=16, pos_fraction=0.5),
    pos_weight=3,
)

RCNN_CFG = dict(
    assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.5),
    sampler=dict(num=16, pos_fraction=0.25),
    pos_weight=3,
)


class TestAnchorTarget:
    def test_end_to_end(self):
        gen = AnchorGenerator3D(4, [2], [2], [1.0], 2)
        anchors = jnp.asarray(gen.grid_anchors((4, 8, 8), 4, 2))
        inside = jnp.asarray(
            anchor_inside_flags(
                np.asarray(anchors), np.ones(len(anchors), bool),
                (32, 32, 3, 8), 0
            )
        )
        gt = jnp.asarray([[8, 8, 16, 16, 1, 5]], jnp.float32)
        out = anchor_target_single(
            jax.random.PRNGKey(0),
            anchors,
            inside,
            gt,
            jnp.asarray([True]),
            RPN_CFG,
            (0.0,) * 6,
            (1.0,) * 6,
        )
        labels = np.asarray(out["labels"])
        lw = np.asarray(out["label_weights"])
        bw = np.asarray(out["bbox_weights"])
        assert labels.sum() >= 1  # step-4 guarantees >= 1 positive
        # positive labels get pos_weight 3
        assert (lw[labels == 1] == 3.0).all()
        # bbox weights only on positives
        assert set(np.flatnonzero(bw[:, 0]).tolist()) == set(
            np.flatnonzero(labels).tolist()
        )
        # some negatives got weight 1
        assert (lw == 1.0).sum() > 0


class TestRcnnSampling:
    def test_pack_and_targets(self):
        props = jnp.asarray(
            [
                [10, 10, 30, 30, 2, 8],  # = gt0
                [12, 12, 32, 32, 3, 9],  # near gt0
                [100, 100, 140, 140, 0, 10],  # background
                [200, 200, 240, 240, 0, 10],  # background
            ],
            jnp.float32,
        )
        gt = jnp.asarray(
            [[10, 10, 30, 30, 2, 8], [0, 0, 0, 0, 0, 0]], jnp.float32
        )
        gt_valid = jnp.asarray([True, False])
        gt_labels = jnp.asarray([1, 0], jnp.int32)
        s = sample_rcnn_single(
            jax.random.PRNGKey(0),
            props,
            jnp.ones(4, bool),
            gt,
            gt_valid,
            gt_labels,
            RCNN_CFG,
            (0.0,) * 6,
            (0.1, 0.1, 0.2, 0.2, 0.1, 0.1),
        )
        rois = np.asarray(s.rois)
        is_pos = np.asarray(s.is_pos)
        labels = np.asarray(s.labels)
        # positives come first and carry gt label 1
        assert is_pos[0]
        assert (labels[is_pos] == 1).all()
        assert (labels[~is_pos] == 0).all()
        # all valid rois precede invalid ones
        rv = np.asarray(s.roi_valid)
        if (~rv).any():
            assert not rv[np.argmax(~rv):].any()
        # positive deltas decode back to the gt box
        from mrcnn3d.ops.box3d import delta2bbox3d

        pos_i = np.flatnonzero(is_pos)[0]
        decoded = delta2bbox3d(
            s.rois[pos_i : pos_i + 1],
            s.bbox_targets[pos_i : pos_i + 1],
            (0.0,) * 6,
            (0.1, 0.1, 0.2, 0.2, 0.1, 0.1),
        )
        np.testing.assert_allclose(
            np.asarray(decoded)[0], np.asarray(gt[0]), atol=1e-3
        )


class TestMaskTarget:
    def test_full_box_identity(self):
        g, d, h, w = 1, 8, 16, 16
        masks = np.zeros((g, d, h, w), np.float32)
        masks[0, 2:6, 4:12, 4:12] = 1
        rois = jnp.asarray([[4, 4, 11, 11, 2, 5]], jnp.float32)
        t = mask_target_single(
            rois,
            jnp.asarray([True]),
            jnp.asarray([0]),
            jnp.asarray(masks),
            mask_size=8,
            mask_size_depth=4,
        )
        t = np.asarray(t)
        assert t.shape == (1, 4, 8, 8)
        # roi == mask support -> everything foreground
        assert t.mean() == 1.0

    def test_empty_region(self):
        masks = np.zeros((1, 8, 16, 16), np.float32)
        masks[0, 0, 0, 0] = 1
        rois = jnp.asarray([[10, 10, 14, 14, 5, 7]], jnp.float32)
        t = mask_target_single(
            rois,
            jnp.asarray([True]),
            jnp.asarray([0]),
            jnp.asarray(masks),
            8,
            4,
        )
        assert np.asarray(t).sum() == 0


class TestHardNegativeSampler:
    def test_ranked_negatives(self):
        from mrcnn3d.core.targets import hard_negative_sample

        assigned = jnp.asarray([1, 0, 0, 0, 0, -1], jnp.int32)
        scores = jnp.asarray([0.9, 0.1, 0.8, 0.3, 0.6, 0.99])
        res = hard_negative_sample(
            jax.random.PRNGKey(0), assigned, 4, 0.25, scores
        )
        assert int(res.pos_count) == 1
        # 3 negative slots -> highest-scoring negatives 2 (0.8), 4 (0.6),
        # 3 (0.3); index 5 is ignore and must not appear
        neg = np.asarray(res.neg_inds)[np.asarray(res.neg_mask)]
        assert set(neg.tolist()) == {2, 4, 3}

    def test_sampler_type_dispatch(self):
        from mrcnn3d.core.targets import sample_rcnn_single

        props = jnp.asarray(
            [
                [10, 10, 30, 30, 2, 8],
                [100, 100, 140, 140, 0, 10],
                [200, 200, 240, 240, 0, 10],
            ],
            jnp.float32,
        )
        gt = jnp.asarray([[10, 10, 30, 30, 2, 8]], jnp.float32)
        cfg = dict(
            assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.5),
            sampler=dict(type="OHEMSampler", num=4, pos_fraction=0.25),
            pos_weight=-1,
        )
        s = sample_rcnn_single(
            jax.random.PRNGKey(0),
            props,
            jnp.ones(3, bool),
            gt,
            jnp.asarray([True]),
            jnp.asarray([1], jnp.int32),
            cfg,
            (0.0,) * 6,
            (0.1, 0.1, 0.2, 0.2, 0.1, 0.1),
            proposal_scores=jnp.asarray([0.9, 0.7, 0.2]),
        )
        assert bool(s.is_pos.any())


def test_ssd_anchor_values():
    """SSD base anchors reproduce the reference set (ssd_head.py:72-88
    with scale_major=False): [min square, sqrt(min*max) square, then the
    min-size anchor at each extra aspect ratio]."""
    from mrcnn3d.core.anchors import ssd_anchor_generators

    cfg = dict(
        input_size=300,
        anchor_strides=[8, 16, 32, 64, 100, 300],
        anchor_ratios=([2], [2, 3], [2, 3], [2, 3], [2], [2]),
        basesize_ratio_range=(0.15, 0.9),
    )
    gens = ssd_anchor_generators(cfg)
    assert [g.base_anchors.shape[0] for g in gens] == [4, 6, 6, 6, 4, 4]

    def wh(b):
        return b[:, 2] - b[:, 0] + 1, b[:, 3] - b[:, 1] + 1

    # level 0: min 21, max 45 (300*7/100, 300*15/100)
    w, h = wh(gens[0].base_anchors)
    aspect = w / h
    size = np.sqrt(w * h)
    # anchor 0: min square; anchor 1: geomean square
    np.testing.assert_allclose(aspect[0], 1.0, atol=0.1)
    np.testing.assert_allclose(size[0], 21, atol=1.0)
    np.testing.assert_allclose(aspect[1], 1.0, atol=0.1)
    np.testing.assert_allclose(size[1], np.sqrt(21 * 45), atol=1.5)
    # anchors 2, 3: min-size at aspect 2 and 1/2 (torch w/h = 1/ratio)
    got = sorted(round(float(a), 1) for a in aspect[2:])
    assert got[0] < 0.6 and got[1] > 1.8, got
    np.testing.assert_allclose(size[2:], 21, atol=1.5)

    # level 1 (ratios [2,3]): aspects must include ~1/3 and ~3
    w, h = wh(gens[1].base_anchors)
    aspect = sorted(float(a) for a in (w / h))
    assert aspect[0] < 0.4 and aspect[-1] > 2.5, aspect
