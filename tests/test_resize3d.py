"""On-device trilinear resize parity vs the C++ host runtime.

`ops/resize3d.resize_trilinear_3d` is the device path that derives the
1.5x twin volume inside the tiled driver (apis/tiled.py); the host
truth is `native.resize_trilinear`, the same kernel the synthetic
scaled-twin generator materialises datasets with
(data/synthetic.make_synthetic_coco3d_scaled) — i.e. the
skimage-resize grid-center convention the reference uses to build its
pre-materialised 1.5x dataset (reference coco_3d_2scales.py:209-234).
"""
import numpy as np
import pytest

from mrcnn3d import native
from mrcnn3d.ops.resize3d import resize_trilinear_3d


@pytest.mark.parametrize(
    "shape,out",
    [
        ((8, 12, 10, 1), (12, 18, 15)),   # 1.5x up
        ((7, 9, 11, 3), (11, 14, 17)),    # odd dims, multi-channel
        ((10, 10, 10, 1), (5, 7, 10)),    # mixed down/identity
    ],
)
def test_device_resize_matches_native(shape, out):
    vol = np.random.RandomState(0).randn(*shape).astype(np.float32)
    want = native.resize_trilinear(vol, *out)
    got = np.asarray(resize_trilinear_3d(vol, out))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def tiny_two_scale_model():
    import jax
    import jax.numpy as jnp

    from mrcnn3d.detectors.build import build_detector
    from mrcnn3d.utils.config import Config

    cfg = Config.fromfile("configs/mask_rcnn_3d_2scales.py")
    cfg.model["backbone"]["depth"] = 18
    cfg.model["backbone"]["base_width"] = 8
    cfg.model["neck"]["out_channels"] = 16
    for k in ("bbox_head", "refinement_head"):
        cfg.model[k]["fc_out_channels"] = 64
    for k in ("mask_head", "refinement_mask_head"):
        cfg.model[k]["num_convs"] = 1
    for k in ("nms_pre", "nms_post", "max_num"):
        cfg.test_cfg["rpn"][k] = 16
    cfg.test_cfg["rcnn"]["max_per_img"] = 16
    cfg.test_cfg["rcnn"]["score_thr"] = 0.01
    model = build_detector(cfg)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 32, 32, 3))
    )
    return cfg, model, variables


def test_tiled_derives_twin_on_device(tiny_two_scale_model):
    """tiled_inference without imgs_2: the on-device derived twin must
    give the same detections as passing the host-materialised twin."""
    cfg, model, variables = tiny_two_scale_model
    from mrcnn3d.apis.tiled import tiled_inference

    d, h, w = 16, 32, 32
    vol = np.random.RandomState(5).randn(d, h, w, 3).astype(np.float32)
    twin = native.resize_trilinear(
        vol, int(round(d * 1.5)), int(round(h * 1.5)), int(round(w * 1.5))
    )
    got = tiled_inference(
        cfg, model, variables, dict(imgs=vol),
        patch_hw=w, patch_d=d,
    )
    want = tiled_inference(
        cfg, model, variables, dict(imgs=vol, imgs_2=twin),
        patch_hw=w, patch_d=d,
    )
    got_pc = got[0] if isinstance(got, tuple) else got
    want_pc = want[0] if isinstance(want, tuple) else want
    for g, t in zip(got_pc, want_pc):
        assert g.shape == t.shape
        np.testing.assert_allclose(g, t, rtol=1e-3, atol=1e-3)
