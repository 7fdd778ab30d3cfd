"""Serving loop: shape-bucketed persistent inference over a directory."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrcnn3d.apis.serve import serve_paths, watch
from mrcnn3d.apis.test_api import InferenceRunner
from mrcnn3d.detectors.build import build_detector
from mrcnn3d.utils.config import Config

NORM = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375],
    to_rgb=True,
)


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    cfg = Config.fromfile("configs/mask_rcnn_3d_2scales.py")
    cfg.model["type"] = "MaskRCNN3D"
    cfg.model["backbone"]["depth"] = 18
    for k in ("rpn_head_2", "mask_head", "refinement_head",
              "refinement_mask_head"):
        cfg.model.pop(k, None)
    for k in ("nms_pre", "nms_post", "max_num"):
        cfg.test_cfg["rpn"][k] = 16
    cfg.test_cfg["rcnn"]["max_per_img"] = 8
    model = build_detector(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 32, 32, 3))
    )
    runner = InferenceRunner(cfg, model, variables)

    root = tmp_path_factory.mktemp("serve")
    rng = np.random.RandomState(0)
    for i in range(3):
        np.save(root / f"vol{i}.npy", rng.rand(32, 32, 8).astype(np.float32))
    return runner, str(root)


def test_serve_paths_streams_all(served):
    runner, root = served
    paths = sorted(
        os.path.join(root, f) for f in os.listdir(root)
        if f.endswith(".npy")
    )
    outs = list(serve_paths(runner, paths, NORM, num_classes=2))
    assert [os.path.basename(p) for p, _ in outs] == [
        "vol0.npy", "vol1.npy", "vol2.npy"
    ]
    for _, per_class in outs:
        assert len(per_class) == 1  # one foreground class
        assert per_class[0].shape[1] == 7
    # the compiled program is shared across same-shape volumes
    assert len(runner._cache) == 1


def test_watch_writes_json(served, tmp_path):
    runner, root = served
    out_dir = tmp_path / "out"
    watch(
        runner, root, str(out_dir), NORM, num_classes=2,
        poll_s=0.01, stop_after=3,
    )
    files = sorted(os.listdir(out_dir))
    assert files == ["vol0.json", "vol1.json", "vol2.json"]
    rec = json.load(open(out_dir / "vol0.json"))
    assert "class_1" in rec
