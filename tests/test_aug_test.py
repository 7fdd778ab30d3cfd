"""TTA: bbox mapping round trips, merge_augs semantics, aug_test e2e
(reference merge_augs.py + test_mixins.py aug_test_*)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrcnn3d.detectors import aug as tta
from mrcnn3d.detectors import pipeline as pl
from mrcnn3d.detectors.build import anchor_cfgs, build_detector
from mrcnn3d.utils.config import Config

SHAPE = (64, 64, 3, 16)  # (H, W, C, D)


def test_bbox_mapping_round_trip():
    rng = np.random.RandomState(0)
    boxes = jnp.asarray(
        np.sort(rng.rand(10, 6).astype(np.float32) * 30, axis=-1)
    )
    for flip in (False, True):
        for sf in (1.0, 1.5):
            fwd = tta.bbox_mapping_3d(boxes, SHAPE, sf, flip)
            back = tta.bbox_mapping_back_3d(fwd, SHAPE, sf, flip)
            np.testing.assert_allclose(
                np.asarray(back), np.asarray(boxes), atol=1e-4
            )


def test_bbox_flip_preserves_extent_and_order():
    b = jnp.asarray([[10.0, 5.0, 20.0, 15.0, 2.0, 6.0]])
    f = tta.bbox_flip_3d(b, SHAPE)
    # x1 < x2 preserved, width preserved, y/z untouched
    assert float(f[0, 0]) == 64 - 20 - 1 and float(f[0, 2]) == 64 - 10 - 1
    np.testing.assert_allclose(np.asarray(f[0, [1, 3, 4, 5]]),
                               [5.0, 15.0, 2.0, 6.0])


def test_merge_aug_proposals_maps_back():
    # view 2 is a 1.5x rescale of view 1: after mapping back both views
    # contain the SAME box, so the merge NMS-dedupes to one proposal
    box = jnp.asarray([[8.0, 8.0, 20.0, 20.0, 2.0, 8.0]])
    metas = [
        dict(img_shape=SHAPE, scale_factor=1.0, flip=False),
        dict(img_shape=(96, 96, 3, 24), scale_factor=1.5, flip=False),
    ]
    boxes, scores, valid = tta.merge_aug_proposals(
        [box, box * 1.5],
        [jnp.asarray([0.9]), jnp.asarray([0.8])],
        [jnp.asarray([True]), jnp.asarray([True])],
        metas,
        dict(nms_thr=0.7, max_num=4),
    )
    assert int(valid.sum()) == 1
    i = int(jnp.argmax(valid))
    np.testing.assert_allclose(
        np.asarray(boxes[i]), np.asarray(box[0]), atol=1e-4
    )
    assert abs(float(scores[i]) - 0.9) < 1e-6


def test_merge_aug_masks_flip():
    rng = np.random.RandomState(1)
    m = jnp.asarray(rng.rand(2, 4, 6, 8, 1).astype(np.float32))
    metas = [dict(flip=False), dict(flip=True)]
    merged = tta.merge_aug_masks([m, m[..., :, ::-1, :]], metas)
    # the flipped view un-flips to the identical array -> mean == m
    np.testing.assert_allclose(np.asarray(merged), np.asarray(m), atol=1e-6)
    # weighted mean
    merged_w = tta.merge_aug_masks(
        [m, jnp.zeros_like(m)], [dict(flip=False), dict(flip=False)],
        weights=[3.0, 1.0],
    )
    np.testing.assert_allclose(
        np.asarray(merged_w), np.asarray(m) * 0.75, atol=1e-6
    )


@pytest.mark.slow
def test_aug_test_e2e_identity_plus_flip():
    cfg = Config.fromfile("configs/mask_rcnn_3d_2scales.py")
    cfg.model["type"] = "MaskRCNN3D"
    cfg.model["backbone"]["depth"] = 18
    cfg.model.pop("rpn_head_2", None)
    for k in ("nms_pre", "nms_post", "max_num"):
        cfg.train_cfg["rpn_proposal"][k] = 16
        cfg.test_cfg["rpn"][k] = 16
    cfg.test_cfg["rcnn"]["max_per_img"] = 8
    cfg.test_cfg["return_bbox_only"] = False
    model = build_detector(cfg)
    d, h, w = 8, 32, 32
    rng = np.random.RandomState(2)
    vol = rng.rand(1, d, h, w, 3).astype(np.float32)
    imgs = jnp.asarray(vol)
    variables = model.init(jax.random.PRNGKey(0), imgs)
    feats = jax.eval_shape(
        lambda v: model.apply(variables, v, method=model.extract_feat), imgs
    )
    aset = pl.build_anchor_set(
        [f.shape[1:4] for f in feats], (h, w, 3, d), anchor_cfgs(cfg)[0]
    )
    flipped = jnp.asarray(vol[:, :, :, ::-1, :])
    out = tta.aug_test(
        model,
        variables,
        [dict(imgs=imgs), dict(imgs=flipped)],
        [dict(scale_factor=1.0, flip=False),
         dict(scale_factor=1.0, flip=True)],
        cfg,
        [aset, aset],
    )
    assert out["dets"].shape == (1, 8, 7)
    assert out["labels"].shape == (1, 8)
    dets = np.asarray(out["dets"])
    valid = np.asarray(out["valid"])
    assert np.isfinite(dets).all()
    # merged detections live in the ORIGINAL frame
    if valid.any():
        v = dets[valid]
        assert (v[:, 0] >= -1).all()
        assert (v[:, [0, 2]] <= w).all() and (v[:, [1, 3]] <= h).all()
    assert "mask_probs" in out
    assert out["mask_probs"].shape[0] == 8
