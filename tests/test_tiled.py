"""Tiled whole-volume inference driver."""
import numpy as np
import pytest

from mrcnn3d.apis.tiled import tile_starts


def test_tile_starts_cover_and_flush():
    starts = tile_starts(100, 40, 30)
    assert starts[0] == 0 and starts[-1] == 60
    covered = set()
    for s in starts:
        covered.update(range(s, s + 40))
    assert covered == set(range(100))


def test_tile_starts_small_extent():
    assert tile_starts(30, 40, 30) == [0]


def test_tiled_inference_end_to_end(tmp_path):
    import jax.numpy as jnp

    from mrcnn3d.apis.tiled import tiled_inference
    from mrcnn3d.detectors.build import build_detector
    from mrcnn3d.utils.config import Config

    cfg = Config.fromfile("configs/mask_rcnn_3d_2scales.py")
    cfg.model["type"] = "FasterRCNN3D"
    for k in ("mask_head", "refinement_head", "refinement_mask_head",
              "rpn_head_2"):
        cfg.model.pop(k, None)
    cfg.model["backbone"]["depth"] = 18
    for k in ("nms_pre", "nms_post", "max_num"):
        cfg.test_cfg["rpn"][k] = 16
    cfg.test_cfg["rcnn"]["max_per_img"] = 16
    cfg.test_cfg["rcnn"]["score_thr"] = 0.01

    model = build_detector(cfg)
    import jax

    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 32, 32, 3))
    )
    vol = np.random.RandomState(0).randn(16, 64, 64, 3).astype(np.float32)
    out = tiled_inference(
        cfg,
        model,
        variables,
        dict(imgs=vol),
        patch_hw=32,
        patch_d=16,
        overlap=0.5,
    )
    assert len(out) == 1  # one foreground class
    assert out[0].shape[1] == 7
    if len(out[0]):
        # all detections in volume coordinates
        assert out[0][:, 2].max() <= 64 + 32
