"""Detector family variants: train losses + inference smoke.

Covers the reference's variant classes as config permutations
(SURVEY.md section 2.4): separate-heads 2-scale with refinement, and the
RPN-only proposal pretrainer.  (The shared-head flagship is exercised by
test_integration.py and the smoke suite.)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrcnn3d.detectors import pipeline as pl
from mrcnn3d.detectors.build import anchor_cfgs, build_detector
from mrcnn3d.utils.config import Config


def _tiny_cfg(type_name):
    cfg = Config.fromfile("configs/mask_rcnn_3d_2scales.py")
    cfg.model["type"] = type_name
    cfg.model["backbone"]["depth"] = 18
    if type_name in (
        "RPN3D", "FasterRCNN3D", "MaskRCNN3D", "MaskRCNN3DParcel"
    ):
        cfg.model.pop("rpn_head_2", None)
    if type_name == "MaskRCNN3D2ScalesHeadsRefinementHead":
        cfg.model.pop("mask_head", None)
        cfg.model.pop("refinement_mask_head", None)
    if type_name in ("RPN3D", "FasterRCNN3D"):
        cfg.model.pop("mask_head", None)
        cfg.model.pop("refinement_head", None)
        cfg.model.pop("refinement_mask_head", None)
    for k in ("nms_pre", "nms_post", "max_num"):
        cfg.train_cfg["rpn_proposal"][k] = 16
        cfg.test_cfg["rpn"][k] = 16
    cfg.train_cfg["rcnn"]["sampler"]["num"] = 8
    cfg.test_cfg["rcnn"]["max_per_img"] = 8
    return cfg


def _setup(cfg):
    model = build_detector(cfg)
    shapes = [(8, 32, 32), (12, 48, 48), (18, 64, 64)][: model.num_scales]
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1,) + shapes[0] + (3,))
    )
    sets = []
    for (d, h, w), ac in zip(shapes, anchor_cfgs(cfg)):
        feats = jax.eval_shape(
            lambda v: model.apply(variables, v, method=model.extract_feat),
            jnp.zeros((1, d, h, w, 3)),
        )
        sets.append(
            pl.build_anchor_set(
                [f.shape[1:4] for f in feats], (h, w, 3, d), ac
            )
        )
    batch = {}
    sfx = ["", "_2", "_3"]
    for s, (d, h, w) in enumerate(shapes):
        gtb = np.zeros((1, 3, 6), np.float32)
        gtb[:, 0] = [4, 4, 14, 14, 1, 5]
        gtv = np.zeros((1, 3), bool)
        gtv[:, 0] = True
        gtl = np.zeros((1, 3), np.int32)
        gtl[:, 0] = 1
        f = 1.5**s
        batch["imgs" + sfx[s]] = jnp.zeros((1, d, h, w, 3))
        batch["gt_boxes" + sfx[s]] = jnp.asarray(gtb * f)
        batch["gt_valid" + sfx[s]] = jnp.asarray(gtv)
        batch["gt_labels" + sfx[s]] = jnp.asarray(gtl)
        if s == 0:
            gtm = np.zeros((1, 3, d, h, w), np.uint8)
            gtm[:, 0, 1:6, 4:15, 4:15] = 1
            batch["gt_masks"] = jnp.asarray(gtm)
    return model, variables, sets, batch


@pytest.mark.slow
def test_two_scales_heads_refinement():
    cfg = _tiny_cfg("MaskRCNN3D2ScalesHeadsRefinementHead")
    model, variables, sets, batch = _setup(cfg)
    assert not model.share_heads and model.with_refinement
    total, losses = pl.forward_train(
        model, variables, batch, jax.random.PRNGKey(1), cfg, sets
    )
    keys = {k for k in losses if "loss" in k}
    # per-scale suffixed keys + refinement, no mask (force-disabled,
    # reference two_stage_3d_2scales_heads_refinement_head.py:73)
    assert {
        "loss_rpn_cls",
        "loss_rpn_cls_2",
        "loss_cls",
        "loss_cls_2",
        "loss_refinement_reg",
    } <= keys
    assert "loss_mask" not in keys
    assert np.isfinite(float(total))
    out = pl.simple_test(model, variables, batch, cfg, sets)
    assert out["dets"].shape == (1, 8, 7)


def test_rpn_only():
    cfg = _tiny_cfg("RPN3D")
    model, variables, sets, batch = _setup(cfg)
    total, losses = pl.forward_train(
        model, variables, batch, jax.random.PRNGKey(1), cfg, sets
    )
    assert set(k for k in losses if "loss" in k) == {
        "loss_rpn_cls",
        "loss_rpn_reg",
    }
    out = pl.simple_test(model, variables, batch, cfg, sets)
    assert out["dets"].shape == (1, 16, 7)
    # proposal scores are sigmoid probabilities
    v = np.asarray(out["valid"])
    s = np.asarray(out["dets"])[..., 6]
    assert ((s[v] >= 0) & (s[v] <= 1)).all()


def test_retinanet_3d_single_stage():
    cfg = Config.fromfile("configs/retinanet_3d.py")
    cfg.model["backbone"]["depth"] = 18
    cfg.test_cfg["rpn"]["nms_pre"] = 64
    cfg.test_cfg["rcnn"]["max_per_img"] = 16
    model = build_detector(cfg)
    assert model.single_stage and model.num_anchors == 2

    d, h, w = 8, 32, 32
    imgs = jnp.zeros((1, d, h, w, 3))
    variables = model.init(jax.random.PRNGKey(0), imgs)
    feats = jax.eval_shape(
        lambda v: model.apply(variables, v, method=model.extract_feat), imgs
    )
    aset = pl.build_anchor_set(
        [f.shape[1:4] for f in feats], (h, w, 3, d),
        anchor_cfgs(cfg)[0], allowed_border=-1,
    )
    gtb = np.zeros((1, 3, 6), np.float32)
    gtb[:, 0] = [4, 4, 14, 14, 1, 5]
    gtv = np.zeros((1, 3), bool)
    gtv[:, 0] = True
    gtl = np.zeros((1, 3), np.int32)
    gtl[:, 0] = 1
    batch = dict(
        imgs=imgs,
        gt_boxes=jnp.asarray(gtb),
        gt_valid=jnp.asarray(gtv),
        gt_labels=jnp.asarray(gtl),
    )
    total, losses = pl.forward_train(
        model, variables, batch, jax.random.PRNGKey(1), cfg, [aset]
    )
    assert set(k for k in losses) == {"loss_cls", "loss_reg"}
    assert np.isfinite(float(total))
    out = pl.simple_test(model, variables, batch, cfg, [aset])
    assert out["dets"].shape == (1, 16, 7)


@pytest.mark.slow  # 50 s compile: 3-stage cascade; r5 fast-tier trim
def test_cascade_rcnn_3d():
    cfg = _tiny_cfg("FasterRCNN3D")
    cfg.model["type"] = "CascadeRCNN3D"
    # per-stage rcnn configs at increasing IoU (cascade convention)
    base = dict(cfg.train_cfg["rcnn"])
    stages = []
    for thr in (0.4, 0.5, 0.6):
        st = dict(base)
        st["assigner"] = dict(base["assigner"])
        st["assigner"]["pos_iou_thr"] = thr
        st["assigner"]["neg_iou_thr"] = thr
        st["assigner"]["min_pos_iou"] = thr
        stages.append(st)
    cfg.train_cfg["rcnn"] = stages
    model, variables, sets, batch = _setup(cfg)
    assert model.cascade_stages == 3
    total, losses = pl.forward_train(
        model, variables, batch, jax.random.PRNGKey(1), cfg, sets
    )
    keys = {k for k in losses if "loss" in k}
    assert {"s0.loss_cls", "s1.loss_cls", "s2.loss_cls",
            "s0.loss_reg"} <= keys
    assert np.isfinite(float(total))
    out = pl.simple_test(model, variables, batch, cfg, sets)
    assert out["dets"].shape == (1, 8, 7)


@pytest.mark.slow
def test_htc_3d():
    """HybridTaskCascade3D: semantic branch + interleaved per-stage mask
    heads with info flow (reference mmdet/models/detectors/htc.py)."""
    cfg = _tiny_cfg("MaskRCNN3D")
    cfg.model["type"] = "HybridTaskCascade3D"
    base = dict(cfg.train_cfg["rcnn"])
    stages = []
    for thr in (0.4, 0.5, 0.6):
        st = dict(base)
        st["assigner"] = dict(base["assigner"])
        st["assigner"]["pos_iou_thr"] = thr
        st["assigner"]["neg_iou_thr"] = thr
        st["assigner"]["min_pos_iou"] = thr
        stages.append(st)
    cfg.train_cfg["rcnn"] = stages
    cfg.model["semantic_head"] = dict(
        type="FusedSemanticHead",
        num_ins=5,
        fusion_level=1,
        num_convs=2,
        num_classes=3,
        ignore_label=255,
        loss_weight=0.2,
    )
    cfg.model["semantic_roi_extractor"] = dict(
        roi_layer=dict(out_size=14, out_size_depth=10, sample_num=2),
        featmap_strides=[8],
        featmap_strides_depth=[4],
    )
    cfg.test_cfg["return_bbox_only"] = False
    model, variables, sets, batch = _setup(cfg)
    assert model.htc and model.with_semantic and model.cascade_stages == 3
    d, h, w = batch["imgs"].shape[1:4]
    seg = np.zeros((1, d, h, w), np.int32)
    seg[:, 1:6, 4:15, 4:15] = 1
    batch["gt_semantic_seg"] = jnp.asarray(seg)
    total, losses = pl.forward_train(
        model, variables, batch, jax.random.PRNGKey(1), cfg, sets
    )
    keys = {k for k in losses if "loss" in k}
    assert {
        "loss_semantic_seg",
        "s0.loss_cls", "s1.loss_cls", "s2.loss_cls",
        "s0.loss_mask", "s1.loss_mask", "s2.loss_mask",
    } <= keys
    assert np.isfinite(float(total))
    out = pl.simple_test(model, variables, batch, cfg, sets)
    assert out["dets"].shape == (1, 8, 7)
    assert "mask_logits" in out
    # ensemble logits recover a probability in (0, 1)
    p = jax.nn.sigmoid(out["mask_logits"])
    assert np.isfinite(np.asarray(p)).all()


@pytest.mark.slow
def test_ssd_2d():
    """SSD300 (reference ssd_head.py + ssd_vgg.py), depth-1 volumes."""
    cfg = Config.fromfile("configs/ssd300_2d.py")
    model = build_detector(cfg)
    assert model.ssd and model.single_stage

    # the SSD300 extra pyramid needs the design input size (the last two
    # unpadded 3x3 convs bottom out below ~300): levels 38/19/10/5/3/1
    d, h, w = 1, 300, 300
    imgs = jnp.zeros((1, d, h, w, 3))
    variables = model.init(jax.random.PRNGKey(0), imgs)
    feats = jax.eval_shape(
        lambda v: model.apply(variables, v, method=model.extract_feat), imgs
    )
    assert len(feats) == 6  # SSD300: 6 pyramid levels
    aset = pl.build_anchor_set(
        [f.shape[1:4] for f in feats], (h, w, 3, d),
        anchor_cfgs(cfg)[0], allowed_border=-1,
    )
    # per-level anchor counts 4/6/6/6/4/4 (ratios [2],[2,3],...)
    na = [a.shape[0] // int(np.prod(f.shape[1:4]))
          for a, f in zip(aset.anchors, feats)]
    assert na == [4, 6, 6, 6, 4, 4]
    gtb = np.zeros((1, 3, 6), np.float32)
    gtb[:, 0] = [4, 4, 30, 30, 0, 0]
    gtv = np.zeros((1, 3), bool)
    gtv[:, 0] = True
    gtl = np.zeros((1, 3), np.int32)
    gtl[:, 0] = 1
    batch = dict(
        imgs=imgs,
        gt_boxes=jnp.asarray(gtb),
        gt_valid=jnp.asarray(gtv),
        gt_labels=jnp.asarray(gtl),
    )
    total, losses = pl.forward_train(
        model, variables, batch, jax.random.PRNGKey(1), cfg, [aset]
    )
    assert set(losses) == {"loss_cls", "loss_reg"}
    assert np.isfinite(float(total))
    out = pl.simple_test(model, variables, batch, cfg, [aset])
    assert out["dets"].shape == (1, 16, 7)


@pytest.mark.slow
def test_mask_rcnn_rgb():
    """RGB 2.5-D family: shared features, per-slice head sets, per-slice
    gt with all-or-nothing slice skip (reference two_stage_rgb.py)."""
    cfg = Config.fromfile("configs/faster_rcnn_2d.py")
    cfg.model["type"] = "MaskRCNNRGB"
    cfg.model["backbone"]["depth"] = 18
    cfg.model["mask_head"] = dict(
        type="FCNMaskHead", num_convs=2, conv_out_channels=256,
        num_classes=cfg.model["bbox_head"]["num_classes"],
    )
    cfg.model["mask_roi_extractor"] = dict(
        roi_layer=dict(out_size=14, out_size_depth=1, sample_num=2),
        featmap_strides=[4, 8, 16, 32],
        featmap_strides_depth=[1, 1, 1, 1],
    )
    cfg.train_cfg["rcnn"]["mask_size"] = 28
    cfg.train_cfg["rcnn"]["mask_size_depth"] = 1
    for k in ("nms_pre", "nms_post", "max_num"):
        cfg.train_cfg["rpn_proposal"][k] = 16
        cfg.test_cfg["rpn"][k] = 16
    cfg.train_cfg["rcnn"]["sampler"]["num"] = 8
    cfg.test_cfg["rcnn"]["max_per_img"] = 8
    cfg.test_cfg["return_bbox_only"] = False
    model = build_detector(cfg)
    assert model.rgb and model.num_scales == 3 and not model.share_heads

    d, h, w = 1, 64, 64
    imgs = jnp.zeros((1, d, h, w, 3))
    variables = model.init(jax.random.PRNGKey(0), imgs)
    feats = jax.eval_shape(
        lambda v: model.apply(variables, v, method=model.extract_feat), imgs
    )
    aset = pl.build_anchor_set(
        [f.shape[1:4] for f in feats], (h, w, 3, d), anchor_cfgs(cfg)[0]
    )
    batch = {"imgs": imgs}
    for i, sfx in enumerate(("_r", "_g", "_b")):
        gtb = np.zeros((1, 3, 6), np.float32)
        gtb[:, 0] = [4 + 2 * i, 4, 30, 30, 0, 0]
        gtv = np.zeros((1, 3), bool)
        gtv[:, 0] = sfx != "_b"  # blue slice has NO gt -> skipped
        gtl = np.zeros((1, 3), np.int32)
        gtl[:, 0] = 1
        batch["gt_boxes" + sfx] = jnp.asarray(gtb)
        batch["gt_valid" + sfx] = jnp.asarray(gtv)
        batch["gt_labels" + sfx] = jnp.asarray(gtl)
        gtm = np.zeros((1, 3, d, h, w), np.uint8)
        gtm[:, 0, :, 4:31, 4:31] = 1
        batch["gt_masks" + sfx] = jnp.asarray(gtm)
    total, losses = pl.forward_train(
        model, variables, batch, jax.random.PRNGKey(1), cfg, [aset]
    )
    assert {"loss_rpn_cls_r", "loss_cls_g", "loss_mask_r"} <= set(losses)
    # empty blue slice contributes zero loss (reference :140-149 skip)
    assert float(losses["loss_rpn_cls_b"]) == 0.0
    assert float(losses["loss_cls_b"]) == 0.0
    assert float(losses["loss_rpn_cls_r"]) > 0.0
    assert np.isfinite(float(total))
    out = pl.simple_test(model, variables, batch, cfg, [aset])
    for sfx in ("_r", "_g", "_b"):
        assert out["dets" + sfx].shape == (1, 8, 7)
        assert "mask_logits" + sfx in out


def test_precomputed_proposals():
    """simple_test accepts precomputed proposals (reference pp/pp_2,
    coco_3d_2scales.py:317-324) instead of running the RPN decode."""
    cfg = _tiny_cfg("FasterRCNN3D")
    model, variables, sets, batch = _setup(cfg)
    props = np.zeros((1, 16, 6), np.float32)
    props[:, 0] = [4, 4, 14, 14, 1, 5]
    props[:, 1] = [8, 8, 20, 20, 2, 6]
    batch["proposals"] = jnp.asarray(props)
    batch["proposals_valid"] = jnp.asarray(
        np.arange(16)[None, :] < 2
    )
    out = pl.simple_test(model, variables, batch, cfg, sets)
    assert out["dets"].shape == (1, 8, 7)
    # with only 2 valid proposals, at most 2 detections survive
    assert int(np.asarray(out["valid"]).sum()) <= 2


def test_htc_3d_config_builds():
    """The shipped configs/htc_3d.py translates into an HTC model."""
    cfg = Config.fromfile("configs/htc_3d.py")
    model = build_detector(cfg)
    assert model.htc and model.with_semantic and model.with_mask
    assert model.cascade_stages == 3
    assert len(cfg.train_cfg["rcnn"]) == 3
    # per-stage IoU ladder
    thrs = [st["assigner"]["pos_iou_thr"] for st in cfg.train_cfg["rcnn"]]
    assert thrs == [0.3, 0.4, 0.5]
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 32, 32, 3))
    )
    # 3 cascade bbox heads + 3 info-flow mask heads + semantic head
    names = set(variables["params"].keys())
    assert {"bbox_head_0", "bbox_head_1", "bbox_head_2",
            "mask_head_0", "mask_head_1", "mask_head_2",
            "semantic_head"} <= names


@pytest.mark.slow
def test_three_scales_heads():
    """MaskRCNN3D3ScalesHeads: three pathways, separate per-scale heads
    (reference two_stage_3d_3scales_heads.py:189-225)."""
    cfg = _tiny_cfg("MaskRCNN3D3ScalesHeads")
    model, variables, sets, batch = _setup(cfg)
    assert model.num_scales == 3 and not model.share_heads
    # anchor_cfgs pads the missing rpn_head_3 with rpn_head_2's cfg
    assert len(sets) == 3
    names = set(variables["params"].keys())
    assert {"rpn_head_0", "rpn_head_1", "rpn_head_2",
            "bbox_head_0", "bbox_head_1", "bbox_head_2"} <= names
    total, losses = pl.forward_train(
        model, variables, batch, jax.random.PRNGKey(1), cfg, sets
    )
    keys = {k for k in losses if "loss" in k}
    assert {
        "loss_rpn_cls", "loss_rpn_cls_2", "loss_rpn_cls_3",
        "loss_rpn_reg", "loss_rpn_reg_2", "loss_rpn_reg_3",
        "loss_cls", "loss_cls_2", "loss_cls_3",
        "loss_mask",
    } <= keys
    assert np.isfinite(float(total))
    out = pl.simple_test(model, variables, batch, cfg, sets)
    assert out["dets"].shape == (1, 8, 7)
    assert out["labels"].shape == (1, 8)


@pytest.mark.slow
def test_one_pathway_one_rpn():
    """MaskRCNN3D2ScalesOnePathwayOneRPN: a single RPN head runs on both
    pathways' features (reference two_stage_3d_onepathway_onerpn.py:
    142-143 applies self.rpn_head to x and x_2)."""
    cfg = _tiny_cfg("MaskRCNN3D2ScalesOnePathwayOneRPN")
    # reference-style config: ONE rpn_head entry; scale-2 anchors come
    # from the same cfg on the 1.5x feature shapes
    cfg.model.pop("rpn_head_2", None)
    model, variables, sets, batch = _setup(cfg)
    assert model.one_rpn and model.share_heads and model.with_refinement
    assert len(sets) == 2
    names = set(variables["params"].keys())
    assert "rpn_head_0" in names and "rpn_head_1" not in names
    total, losses = pl.forward_train(
        model, variables, batch, jax.random.PRNGKey(1), cfg, sets
    )
    keys = {k for k in losses if "loss" in k}
    assert {
        "loss_rpn_cls", "loss_rpn_cls_2", "loss_cls",
        "loss_refinement_reg", "loss_mask",
    } <= keys
    assert np.isfinite(float(total))
    # the scale-2 RPN loss flows through the SAME head parameters
    grads = jax.grad(
        lambda v: pl.forward_train(
            model, v, batch, jax.random.PRNGKey(1), cfg, sets
        )[1]["loss_rpn_cls_2"]
    )(variables)["params"]
    g = jax.tree_util.tree_leaves(grads["rpn_head_0"])
    assert any(float(jnp.abs(x).max()) > 0 for x in g)
    out = pl.simple_test(model, variables, batch, cfg, sets)
    assert out["dets"].shape == (1, 8, 7)


@pytest.mark.slow  # 29 s: parcel train+test compile; r5 fast-tier trim
def test_parcel_detector():
    """MaskRCNN3DParcel: 15-way brain-region branch — train loss +
    NMS carry of per-detection parcellation scores (reference
    two_stage_3d_parcel.py, bbox_nms.py:108-159 multiclass_nms_3d_parcel)."""
    cfg = _tiny_cfg("MaskRCNN3DParcel")
    model, variables, sets, batch = _setup(cfg)
    assert model.num_parcellations == 15 and model.num_scales == 1
    batch["gt_bregions"] = jnp.asarray(np.array([[7, 0, 0]], np.int32))
    total, losses = pl.forward_train(
        model, variables, batch, jax.random.PRNGKey(1), cfg, sets
    )
    keys = {k for k in losses if "loss" in k}
    assert {"loss_rpn_cls", "loss_cls", "loss_mask",
            "loss_parcellation_cls"} <= keys
    assert "acc_parcellation" in losses
    assert np.isfinite(float(total))
    assert np.isfinite(float(losses["loss_parcellation_cls"]))
    out = pl.simple_test(model, variables, batch, cfg, sets)
    assert out["dets"].shape == (1, 8, 7)
    # parcellation logits ride through NMS aligned row-for-row with dets
    assert out["parcellations"].shape == (1, 8, 15)
    assert np.isfinite(np.asarray(out["parcellations"])).all()


@pytest.mark.slow
def test_batch2_train_and_test():
    """Per-chip batch > 1 end-to-end: the whole pipeline is written with
    a leading batch dim (vmapped sampling, flat B*N roi stages), used by
    bench.py's MRCNN3D_BENCH_TRAIN_BATCH knob for MFU headroom."""
    cfg = _tiny_cfg("MaskRCNN3D2Scales")
    model, variables, sets, batch = _setup(cfg)
    b2 = {}
    for k, v in batch.items():
        b2[k] = jnp.concatenate([v, v], axis=0)
    total, losses = pl.forward_train(
        model, variables, b2, jax.random.PRNGKey(1), cfg, sets
    )
    keys = {k for k in losses if "loss" in k}
    assert {"loss_rpn_cls", "loss_rpn_cls_2", "loss_cls",
            "loss_mask"} <= keys
    assert np.isfinite(float(total))
    # duplicated batch rows must produce identical per-image detections
    out = pl.simple_test(model, variables, b2, cfg, sets)
    assert out["dets"].shape == (2, 8, 7)
    np.testing.assert_allclose(
        np.asarray(out["dets"][0]), np.asarray(out["dets"][1]),
        rtol=1e-5, atol=1e-5,
    )
