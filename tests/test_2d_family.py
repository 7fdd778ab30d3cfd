"""2-D legacy detector family (depth-1 volumes, (1,k,k) kernels)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrcnn3d.detectors import pipeline as pl
from mrcnn3d.detectors.build import anchor_cfgs, build_detector
from mrcnn3d.utils.config import Config


def test_two_d_backbone_is_exact_2d_conv():
    """(1,k,k) conv on D=1 == rank-2 conv (numerical check vs torch)."""
    torch = pytest.importorskip("torch")
    from mrcnn3d.compat.torch_convert import _conv_w

    tconv = torch.nn.Conv2d(3, 8, 3, padding=1, bias=False)
    x = torch.randn(1, 3, 12, 12)
    want = tconv(x).detach().numpy()

    from flax import linen as nn

    conv3 = nn.Conv(8, (1, 3, 3), padding=[(0, 0), (1, 1), (1, 1)],
                    use_bias=False)
    w2d = tconv.weight.detach().numpy()  # (O, I, kh, kw)
    w3d = w2d[:, :, None]  # (O, I, 1, kh, kw)
    params = {"kernel": _conv_w(w3d)}
    x_cl = jnp.asarray(
        np.transpose(x.numpy(), (0, 2, 3, 1))[:, None]
    )  # (1, 1, H, W, 3)
    got = conv3.apply({"params": params}, x_cl)
    got = np.transpose(np.asarray(got)[:, 0], (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.fixture(scope="module")
def cfg2d():
    cfg = Config.fromfile("configs/faster_rcnn_2d.py")
    cfg.model["backbone"]["depth"] = 18
    cfg.model["backbone"]["base_width"] = 8
    cfg.model["neck"]["out_channels"] = 32
    cfg.model["bbox_head"]["fc_out_channels"] = 64
    cfg.model["bbox_head"]["num_classes"] = 3
    for k in ("nms_pre", "nms_post", "max_num"):
        cfg.train_cfg["rpn_proposal"][k] = 32
        cfg.test_cfg["rpn"][k] = 32
    cfg.train_cfg["rpn"]["sampler"]["num"] = 64
    cfg.train_cfg["rcnn"]["sampler"]["num"] = 16
    cfg.test_cfg["rcnn"]["max_per_img"] = 16
    return cfg


@pytest.mark.slow
def test_faster_rcnn_2d_train_and_test(cfg2d):
    model = build_detector(cfg2d)
    assert model.two_d and not model.with_mask
    assert model.num_anchors == 3  # 1 scale x 3 ratios

    h = w = 64
    imgs = jnp.asarray(
        np.random.RandomState(0).randn(1, 1, h, w, 3), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), imgs)
    feats = jax.eval_shape(
        lambda v: model.apply(variables, v, method=model.extract_feat), imgs
    )
    fs = [f.shape[1:4] for f in feats]
    assert all(f[0] == 1 for f in fs)  # depth stays 1 at every level
    aset = pl.build_anchor_set(fs, (h, w, 3, 1), anchor_cfgs(cfg2d)[0])
    # anchors have degenerate z extent
    a0 = aset.anchors[0]
    np.testing.assert_allclose(a0[:, 4], 0)
    np.testing.assert_allclose(a0[:, 5], 0)

    gtb = np.zeros((1, 4, 6), np.float32)
    gtb[:, 0] = [10, 10, 25, 25, 0, 0]
    gtb[:, 1] = [40, 35, 55, 50, 0, 0]
    gtv = np.zeros((1, 4), bool)
    gtv[:, :2] = True
    gtl = np.zeros((1, 4), np.int32)
    gtl[:, 0] = 1
    gtl[:, 1] = 2
    batch = dict(
        imgs=imgs,
        gt_boxes=jnp.asarray(gtb),
        gt_valid=jnp.asarray(gtv),
        gt_labels=jnp.asarray(gtl),
    )
    total, losses = pl.forward_train(
        model, variables, batch, jax.random.PRNGKey(1), cfg2d, [aset]
    )
    assert {"loss_rpn_cls", "loss_rpn_reg", "loss_cls", "loss_reg"} <= set(
        k for k in losses if "loss" in k or k == "acc"
    ) | {"acc"}
    assert np.isfinite(float(total))

    out = pl.simple_test(model, variables, batch, cfg2d, [aset])
    dets = np.asarray(out["dets"])
    valid = np.asarray(out["valid"])
    # detections stay in the z = [0, 0] plane
    if valid.any():
        assert np.abs(dets[valid][:, 4:6]).max() < 1.0


def test_coco2d_dataset(tmp_path):
    import json

    from mrcnn3d.data.coco3d import Coco2DDataset

    img = np.random.RandomState(0).rand(64, 64).astype(np.float32)
    np.save(tmp_path / "img1.npy", img)
    coco = dict(
        images=[dict(id=1, file_name="img1.npy", width=64, height=64)],
        annotations=[
            dict(id=1, image_id=1, category_id=1, iscrowd=0,
                 bbox=[10, 12, 8, 9], area=72)
        ],
        categories=[dict(id=1, name="thing")],
    )
    ann_file = tmp_path / "ann.json"
    json.dump(coco, open(ann_file, "w"))
    ds = Coco2DDataset(
        str(ann_file),
        str(tmp_path),
        dict(mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375]),
        with_mask=False,
        max_gt=4,
    )
    s = ds[0]
    assert s["imgs"].shape == (1, 64, 64, 3)
    np.testing.assert_allclose(
        s["gt_boxes"][0], [10, 12, 17, 20, 0, 0]
    )


@pytest.mark.slow
def test_mask_rcnn_2d_mask_path(cfg2d):
    cfg = Config.fromfile("configs/faster_rcnn_2d.py")
    cfg.model["type"] = "MaskRCNN"
    cfg.model["backbone"]["depth"] = 18
    cfg.model["backbone"]["base_width"] = 8
    cfg.model["neck"]["out_channels"] = 16
    cfg.model["bbox_head"]["fc_out_channels"] = 32
    cfg.model["bbox_head"]["num_classes"] = 2
    cfg.model["mask_roi_extractor"] = dict(
        roi_layer=dict(out_size=14, out_size_depth=1, sample_num=2),
        out_channels=16,
        featmap_strides=[4, 8, 16, 32],
        featmap_strides_depth=[1, 1, 1, 1],
    )
    cfg.model["mask_head"] = dict(num_convs=2, conv_out_channels=16,
                                  num_classes=2)
    for k in ("nms_pre", "nms_post", "max_num"):
        cfg.train_cfg["rpn_proposal"][k] = 16
    cfg.train_cfg["rcnn"]["sampler"]["num"] = 8
    model = build_detector(cfg)
    assert model.two_d and model.with_mask

    h = w = 64
    imgs = jnp.zeros((1, 1, h, w, 3))
    variables = model.init(jax.random.PRNGKey(0), imgs)
    feats = jax.eval_shape(
        lambda v: model.apply(variables, v, method=model.extract_feat), imgs
    )
    aset = pl.build_anchor_set(
        [f.shape[1:4] for f in feats], (h, w, 3, 1), anchor_cfgs(cfg)[0]
    )
    gtb = np.zeros((1, 2, 6), np.float32)
    gtb[:, 0] = [10, 10, 25, 25, 0, 0]
    gtv = np.zeros((1, 2), bool)
    gtv[:, 0] = True
    gtl = np.zeros((1, 2), np.int32)
    gtl[:, 0] = 1
    gtm = np.zeros((1, 2, 1, h, w), np.uint8)
    gtm[:, 0, 0, 10:26, 10:26] = 1
    batch = dict(
        imgs=imgs,
        gt_boxes=jnp.asarray(gtb),
        gt_valid=jnp.asarray(gtv),
        gt_labels=jnp.asarray(gtl),
        gt_masks=jnp.asarray(gtm),
    )
    total, losses = pl.forward_train(
        model, variables, batch, jax.random.PRNGKey(1), cfg, [aset]
    )
    assert "loss_mask" in losses and np.isfinite(float(total))
