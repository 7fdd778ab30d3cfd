"""Depth-sharded whole-volume forward == replicated forward (8-dev mesh)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrcnn3d.models.resnet3d import ResNet3D
from mrcnn3d.parallel.mesh import make_mesh
from mrcnn3d.parallel.spatial import spatial_extract_feat


def _run_isolated(test_name):
    """Run `test_name` from this file in a FRESH interpreter.

    XLA:CPU's in-process collectives abort (SIGABRT materializing the
    result) when a 2-D-mesh SPMD program executes after 1-D-mesh
    programs in the same process — reproducible with this file alone,
    absent when either runs standalone.  The hybrid (data x depth)
    tests therefore re-exec themselves isolated; the child inherits the
    conftest's 8-virtual-device CPU setup.
    """
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["_MRCNN3D_ISOLATED"] = "1"
    # no persistent compile cache in the child: XLA:CPU aborts when
    # reloading the serialized executable of (some) 2-D-mesh SPMD
    # programs — fresh compiles run fine (verified both ways)
    env["MRCNN3D_NO_COMPILE_CACHE"] = "1"
    # retry once: spawning a jax process next to a live one on this
    # 1-CPU box can transiently SIGABRT during backend bring-up
    for attempt in range(2):
        proc = subprocess.run(
            [sys.executable, "-m", "pytest",
             f"{os.path.abspath(__file__)}::{test_name}", "-x", "-q",
             "-p", "no:cacheprovider"],
            capture_output=True, text=True, timeout=1800, env=env,
            cwd=os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))
            ),
        )
        if proc.returncode == 0:
            return
    assert proc.returncode == 0, (
        (proc.stdout or "")[-3000:] + (proc.stderr or "")[-2000:]
    )


def _isolated(test_name):
    import os

    if os.environ.get("_MRCNN3D_ISOLATED") == "1":
        return False  # we ARE the isolated child: run the body
    _run_isolated(test_name)
    return True


class _Wrapper:
    """Duck-typed model exposing extract_feat for the sharding helper."""

    def __init__(self, module):
        self.module = module

    def apply(self, variables, x, method=None):
        return self.module.apply(variables, x)

    def clone(self, **updates):
        return _Wrapper(self.module.clone(**updates))

    @property
    def extract_feat(self):
        return None


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)
def test_depth_sharded_backbone_matches_replicated():
    mesh = make_mesh(8)
    m = ResNet3D(depth=18, base_width=8)
    x = jnp.asarray(
        np.random.RandomState(0).randn(1, 32, 32, 32, 3), jnp.float32
    )
    variables = m.init(jax.random.PRNGKey(0), x[:, :8, :16, :16, :])

    ref = m.apply(variables, x)
    fn = spatial_extract_feat(_Wrapper(m), variables, mesh)
    sharded = fn(x)
    assert len(sharded) == len(ref)
    for a, b in zip(sharded, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4
        )


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)
@pytest.mark.slow  # 66 s: double SPMD inference compile; r5 fast-tier trim
def test_sharded_simple_test_matches_replicated():
    """End-to-end sharded_simple_test == plain simple_test (flagship
    two-scale flow scaled down to the 8-dev CPU mesh)."""
    from mrcnn3d.detectors import pipeline as pl
    from mrcnn3d.detectors.build import anchor_cfgs, build_detector
    from mrcnn3d.parallel.mesh import make_mesh
    from mrcnn3d.parallel.spatial import sharded_simple_test
    from mrcnn3d.utils.config import Config

    cfg = Config.fromfile("configs/mask_rcnn_3d_2scales.py")
    cfg.model["backbone"]["depth"] = 18
    for k in ("nms_pre", "nms_post", "max_num"):
        cfg.test_cfg["rpn"][k] = 16
    cfg.test_cfg["rcnn"]["max_per_img"] = 8

    model = build_detector(cfg)
    d, h, w = 16, 32, 32
    d2, h2, w2 = 24, 48, 48
    rng = np.random.RandomState(0)
    batch = dict(
        imgs=jnp.asarray(rng.randn(1, d, h, w, 3), jnp.float32),
        imgs_2=jnp.asarray(rng.randn(1, d2, h2, w2, 3), jnp.float32),
    )
    variables = model.init(jax.random.PRNGKey(0), batch["imgs"])
    acfgs = anchor_cfgs(cfg)
    asets = []
    for i, (dd, hh, ww) in enumerate(((d, h, w), (d2, h2, w2))):
        feats = jax.eval_shape(
            lambda v: model.apply(
                variables, v, method=model.extract_feat
            ),
            batch["imgs" if i == 0 else "imgs_2"],
        )
        asets.append(
            pl.build_anchor_set(
                [f.shape[1:4] for f in feats], (hh, ww, 3, dd), acfgs[i]
            )
        )

    ref = pl.simple_test(model, variables, batch, cfg, asets)
    mesh = make_mesh(8)
    fn = sharded_simple_test(model, variables, cfg, asets, mesh)
    dets, labels, valid = fn(batch)
    np.testing.assert_array_equal(
        np.asarray(valid), np.asarray(ref["valid"])
    )
    np.testing.assert_allclose(
        np.asarray(dets), np.asarray(ref["dets"]), atol=2e-3
    )
    np.testing.assert_array_equal(
        np.asarray(labels), np.asarray(ref["labels"])
    )


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)
def test_batched_dp_inference_matches_serial():
    """shard_map batched inference over the data mesh == per-volume
    serial simple_test (BASELINE flow 5)."""
    from mrcnn3d.detectors import pipeline as pl
    from mrcnn3d.detectors.build import anchor_cfgs, build_detector
    from mrcnn3d.parallel.batched import make_batched_infer
    from mrcnn3d.utils.config import Config

    cfg = Config.fromfile("configs/mask_rcnn_3d_2scales.py")
    cfg.model["type"] = "MaskRCNN3D"
    cfg.model["backbone"]["depth"] = 18
    cfg.model.pop("rpn_head_2", None)
    cfg.model.pop("mask_head", None)
    cfg.model.pop("refinement_head", None)
    cfg.model.pop("refinement_mask_head", None)
    for k in ("nms_pre", "nms_post", "max_num"):
        cfg.test_cfg["rpn"][k] = 16
    cfg.test_cfg["rcnn"]["max_per_img"] = 8

    model = build_detector(cfg)
    d, h, w = 8, 32, 32
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, d, h, w, 3))
    )
    feats = jax.eval_shape(
        lambda v: model.apply(variables, v, method=model.extract_feat),
        jnp.zeros((1, d, h, w, 3)),
    )
    aset = pl.build_anchor_set(
        [f.shape[1:4] for f in feats], (h, w, 3, d), anchor_cfgs(cfg)[0]
    )

    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.randn(8, d, h, w, 3), jnp.float32)

    mesh = make_mesh(8)
    run = make_batched_infer(model, variables, cfg, [aset], mesh)
    out = run(dict(imgs=imgs))
    assert out["dets"].shape == (8, 8, 7)

    # serial per-volume reference
    for i in (0, 3, 7):
        ref = pl.simple_test(
            model, variables, dict(imgs=imgs[i:i + 1]), cfg, [aset]
        )
        np.testing.assert_allclose(
            np.asarray(out["dets"][i]), np.asarray(ref["dets"][0]),
            atol=1e-4,
        )
        np.testing.assert_array_equal(
            np.asarray(out["valid"][i]), np.asarray(ref["valid"][0])
        )


@pytest.mark.slow
@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)
def test_hybrid_dp_depth_train_step_matches_unsharded():
    """One full train step on a 2x4 (data x depth) mesh == the same step
    unsharded: hybrid DP x spatial training (make_mesh2 + the 3-tuple
    spatial_shard), loss and updated params compared."""
    if _isolated("test_hybrid_dp_depth_train_step_matches_unsharded"):
        return
    from mrcnn3d.detectors import pipeline as pl
    from mrcnn3d.detectors.build import anchor_cfgs, build_detector
    from mrcnn3d.parallel.mesh import (
        data_sharding, make_mesh2, replicated,
    )
    from mrcnn3d.train.optim import make_optimizer, step_lr_schedule
    from mrcnn3d.train.step import create_train_state, make_train_step
    from mrcnn3d.utils.config import Config

    cfg = Config.fromfile("configs/mask_rcnn_3d_2scales.py")
    cfg.model["backbone"]["depth"] = 18
    for k in ("nms_pre", "nms_post", "max_num"):
        cfg.train_cfg["rpn_proposal"][k] = 16
    cfg.train_cfg["rcnn"]["sampler"]["num"] = 8
    cfg.train_cfg["rpn"]["sampler"]["num"] = 32

    model = build_detector(cfg)
    b, g = 2, 2
    d, h, w = 16, 32, 32
    d2, h2, w2 = 24, 48, 48
    rng = np.random.RandomState(0)
    batch = dict(
        imgs=jnp.asarray(rng.randn(b, d, h, w, 3), jnp.float32),
        imgs_2=jnp.asarray(rng.randn(b, d2, h2, w2, 3), jnp.float32),
    )
    gtb = np.zeros((b, g, 6), np.float32)
    gtb[:, 0] = [4, 4, 14, 14, 1, 5]
    gtv = np.zeros((b, g), bool)
    gtv[:, 0] = True
    gtl = np.zeros((b, g), np.int32)
    gtl[:, 0] = 1
    gtm = np.zeros((b, g, d, h, w), np.uint8)
    gtm[:, 0, 1:6, 4:15, 4:15] = 1
    batch.update(
        gt_boxes=jnp.asarray(gtb), gt_valid=jnp.asarray(gtv),
        gt_labels=jnp.asarray(gtl), gt_masks=jnp.asarray(gtm),
        gt_boxes_2=jnp.asarray(gtb * 1.5), gt_valid_2=jnp.asarray(gtv),
        gt_labels_2=jnp.asarray(gtl),
    )

    sched = step_lr_schedule(1e-3, [], 100)
    tx = make_optimizer(
        cfg.optimizer, cfg.optimizer_config["grad_clip"], sched
    )
    state0 = create_train_state(
        model, jax.random.PRNGKey(0), batch["imgs"][:1, :8, :16, :16], tx
    )
    acfgs = anchor_cfgs(cfg)
    variables = {"params": state0.params,
                 "batch_stats": state0.batch_stats}
    asets = []
    for i, (dd, hh, ww) in enumerate(((d, h, w), (d2, h2, w2))):
        feats = jax.eval_shape(
            lambda v: model.apply(
                variables, v, method=model.extract_feat
            ),
            batch["imgs" if i == 0 else "imgs_2"],
        )
        asets.append(
            pl.build_anchor_set(
                [f.shape[1:4] for f in feats], (hh, ww, 3, dd), acfgs[i]
            )
        )

    # train_step donates its state arg — keep a host copy for the
    # hybrid twin before the first (donating) call consumes state0
    state_host = jax.tree.map(np.asarray, state0)
    step_ref = make_train_step(model, tx, cfg, asets)
    sref, mref = step_ref(state0, batch, jax.random.PRNGKey(1))

    mesh = make_mesh2(2, 4)
    rep, ds = replicated(mesh), data_sharding(mesh)
    state_h = jax.tree.map(lambda x: jax.device_put(x, rep), state_host)
    batch_h = jax.tree.map(lambda x: jax.device_put(x, ds), batch)
    step_h = make_train_step(model, tx, cfg, asets, mesh=mesh)
    sh, mh = step_h(state_h, batch_h, jax.random.PRNGKey(1))

    np.testing.assert_allclose(
        float(mh["loss"]), float(mref["loss"]), rtol=2e-4, atol=2e-4
    )
    flat_r = jax.tree_util.tree_leaves(sref.params)
    flat_h = jax.tree_util.tree_leaves(sh.params)
    for a, b_ in zip(flat_r[:8], flat_h[:8]):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=5e-3, atol=2e-4
        )


@pytest.mark.slow
@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)
def test_hybrid_sharded_simple_test_matches_replicated():
    """sharded_simple_test over a 2x4 (data x depth) mesh with batch=2
    == plain simple_test: hybrid DP x spatial whole-volume inference."""
    if _isolated("test_hybrid_sharded_simple_test_matches_replicated"):
        return
    from mrcnn3d.detectors import pipeline as pl
    from mrcnn3d.detectors.build import anchor_cfgs, build_detector
    from mrcnn3d.parallel.mesh import make_mesh2
    from mrcnn3d.parallel.spatial import sharded_simple_test
    from mrcnn3d.utils.config import Config

    cfg = Config.fromfile("configs/mask_rcnn_3d_2scales.py")
    cfg.model["backbone"]["depth"] = 18
    for k in ("nms_pre", "nms_post", "max_num"):
        cfg.test_cfg["rpn"][k] = 16
    cfg.test_cfg["rcnn"]["max_per_img"] = 8

    model = build_detector(cfg)
    d, h, w = 16, 32, 32
    d2, h2, w2 = 24, 48, 48
    rng = np.random.RandomState(7)
    batch = dict(
        imgs=jnp.asarray(rng.randn(2, d, h, w, 3), jnp.float32),
        imgs_2=jnp.asarray(rng.randn(2, d2, h2, w2, 3), jnp.float32),
    )
    variables = model.init(jax.random.PRNGKey(0), batch["imgs"][:1])
    acfgs = anchor_cfgs(cfg)
    asets = []
    for i, (dd, hh, ww) in enumerate(((d, h, w), (d2, h2, w2))):
        feats = jax.eval_shape(
            lambda v: model.apply(
                variables, v, method=model.extract_feat
            ),
            batch["imgs" if i == 0 else "imgs_2"],
        )
        asets.append(
            pl.build_anchor_set(
                [f.shape[1:4] for f in feats], (hh, ww, 3, dd), acfgs[i]
            )
        )

    ref = pl.simple_test(model, variables, batch, cfg, asets)
    mesh = make_mesh2(2, 4)
    fn = sharded_simple_test(
        model, variables, cfg, asets, mesh,
        axis="depth", batch_axis="data",
    )
    dets, labels, valid = fn(batch)
    np.testing.assert_array_equal(
        np.asarray(valid), np.asarray(ref["valid"])
    )
    np.testing.assert_allclose(
        np.asarray(dets), np.asarray(ref["dets"]), atol=2e-3
    )
