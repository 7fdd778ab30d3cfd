"""End-to-end integration: train a tiny model on synthetic data, then eval.

Exercises the full stack: synthetic COCO-3D data -> Prefetcher ->
jitted train step (losses, grads, SGD) -> orbax checkpoint ->
shape-bucketed inference -> 29-stat COCO evaluation.
"""
import numpy as np
import pytest

from mrcnn3d.utils.config import Config


@pytest.fixture(scope="module")
def tiny_cfg():
    cfg = Config.fromfile("configs/mask_rcnn_3d_2scales.py")
    # single-scale tiny model for CPU speed
    cfg.model["type"] = "MaskRCNN3D"
    del cfg.model["rpn_head_2"]
    del cfg.model["refinement_head"]
    del cfg.model["refinement_mask_head"]
    cfg.model["backbone"]["depth"] = 18
    cfg.model["neck"]["out_channels"] = 32
    cfg.model["rpn_head"]["in_channels"] = 32
    cfg.model["rpn_head"]["feat_channels"] = 32
    cfg.model["bbox_head"]["fc_out_channels"] = 64
    cfg.model["bbox_head"]["in_channels"] = 32
    cfg.model["bbox_roi_extractor"]["out_channels"] = 32
    cfg.model["mask_roi_extractor"]["out_channels"] = 32
    cfg.model["mask_head"]["conv_out_channels"] = 32
    cfg.model["mask_head"]["in_channels"] = 32
    for k in ("nms_pre", "nms_post", "max_num"):
        cfg.train_cfg["rpn_proposal"][k] = 32
        cfg.test_cfg["rpn"][k] = 32
    cfg.train_cfg["rpn"]["sampler"]["num"] = 64
    cfg.train_cfg["rcnn"]["sampler"]["num"] = 32
    cfg.test_cfg["rcnn"]["max_per_img"] = 32
    cfg.test_cfg["rcnn"]["score_thr"] = 0.05
    cfg.static_shapes["crop_size"] = (32, 32, 16)
    cfg.static_shapes["max_gt"] = 8
    cfg.total_epochs = 1
    return cfg


@pytest.fixture(scope="module")
def synth_data(tmp_path_factory):
    from mrcnn3d.data.synthetic import make_synthetic_coco3d

    root = tmp_path_factory.mktemp("integ")
    return make_synthetic_coco3d(
        str(root), num_volumes=2, hw=128, depth=16, seed=3
    )


NORM = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True
)


@pytest.mark.slow
def test_train_and_eval(tiny_cfg, synth_data, tmp_path):
    ann_file, img_dir = synth_data
    from mrcnn3d.apis.test_api import evaluate_dataset
    from mrcnn3d.apis.train_api import train_detector
    from mrcnn3d.data.coco3d import Coco3DDataset
    from mrcnn3d.detectors.build import build_detector

    ds = Coco3DDataset(
        ann_file,
        img_dir,
        NORM,
        max_gt=8,
        extra_aug=dict(random_crop_3d=dict(min_ious=(0.1,))),
        seed=0,
    )
    state = train_detector(
        tiny_cfg,
        ds,
        work_dir=str(tmp_path / "wd"),
        seed=0,
        max_iters=2,
        mesh=None,
    )
    assert int(state.step) == 2
    for leaf in [state.params["rpn_head_0"]["rpn_conv"]["kernel"]]:
        assert np.isfinite(np.asarray(leaf)).all()

    # eval path: shape-bucketed inference + COCO stats
    test_ds = Coco3DDataset(
        ann_file, img_dir, NORM, test_mode=True, max_gt=8
    )
    model = build_detector(tiny_cfg)
    stats = evaluate_dataset(tiny_cfg, model, state, test_ds)
    assert "bbox_mAP" in stats and len(stats) == 29
    assert all(np.isfinite(v) for v in stats.values())

    # segm path: mask head -> full-volume paste -> voxel IoU eval
    tiny_cfg.test_cfg["return_bbox_only"] = False
    segm_stats = evaluate_dataset(
        tiny_cfg, model, state, test_ds, iou_type="segm"
    )
    tiny_cfg.test_cfg["return_bbox_only"] = True
    assert "segm_mAP" in segm_stats and len(segm_stats) == 29


@pytest.mark.slow  # 104 s: two train runs + restore; r5 fast-tier trim
def test_checkpoint_resume(tiny_cfg, synth_data, tmp_path):
    ann_file, img_dir = synth_data
    from mrcnn3d.apis.train_api import train_detector
    from mrcnn3d.data.coco3d import Coco3DDataset

    ds = Coco3DDataset(
        ann_file,
        img_dir,
        NORM,
        max_gt=8,
        extra_aug=dict(random_crop_3d=dict(min_ious=(0.1,))),
        seed=0,
    )
    wd = str(tmp_path / "wd2")
    s1 = train_detector(tiny_cfg, ds, work_dir=wd, seed=0, max_iters=1, mesh=None)
    assert int(s1.step) == 1
    # resume picks up from the saved step
    s2 = train_detector(tiny_cfg, ds, work_dir=wd, seed=0, max_iters=2, mesh=None)
    assert int(s2.step) == 2


@pytest.mark.slow  # 20 s: full sharded-vs-single eval; r5 fast-tier trim
def test_rank_strided_eval_matches_single(tiny_cfg, synth_data):
    """Sharded eval (idx % world == rank, entries merged) reproduces the
    single-process stats exactly (reference eval_hooks.py:111-149)."""
    import types

    from mrcnn3d.apis.test_api import evaluate_dataset, run_inference
    from mrcnn3d.data.coco3d import Coco3DDataset
    from mrcnn3d.detectors.build import build_detector
    from mrcnn3d.eval.coco_eval3d import CocoEval3D
    from mrcnn3d.eval.results import results2json3d
    import jax
    import jax.numpy as jnp

    ann_file, img_dir = synth_data
    ds = Coco3DDataset(ann_file, img_dir, NORM, test_mode=True, max_gt=8)
    model = build_detector(tiny_cfg)
    sample = ds.prepare_test(0)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(sample["imgs"][None])
    )
    state = types.SimpleNamespace(
        params=variables["params"],
        batch_stats=variables.get("batch_stats"),
    )
    full = evaluate_dataset(tiny_cfg, model, state, ds)

    entries = []
    for r in range(2):
        results, infos = run_inference(
            tiny_cfg, model, variables, ds, rank=r, world=2
        )[:2]
        entries.extend(results2json3d(results, infos))
    sharded = CocoEval3D(ds.coco, entries, iou_type="bbox").named_stats(
        prefix="bbox"
    )
    assert set(full) == set(sharded)
    for k in full:
        np.testing.assert_allclose(sharded[k], full[k], atol=1e-9)


@pytest.mark.slow  # 56 s: child train process + resume; r5 fast-tier trim
def test_sigterm_checkpoints_and_stops(tiny_cfg, synth_data, tmp_path):
    """Preemption safety: SIGTERM mid-training checkpoints the current
    step and returns cleanly; a resume picks up from it (TPU pool
    reclaim flow — the reference loses everything since the last
    interval checkpoint)."""
    import signal
    import threading

    from mrcnn3d.apis.train_api import train_detector
    from mrcnn3d.data.coco3d import Coco3DDataset

    ann_file, img_dir = synth_data
    ds = Coco3DDataset(
        ann_file,
        img_dir,
        NORM,
        max_gt=8,
        extra_aug=dict(random_crop_3d=dict(min_ious=(0.1,))),
        seed=0,
    )
    wd = str(tmp_path / "wd_sig")
    # fire SIGTERM once the first step has had time to compile+run;
    # raise_signal from a timer thread delivers to the main thread
    timer = threading.Timer(
        1.0, lambda: signal.raise_signal(signal.SIGTERM)
    )
    timer.start()
    try:
        s1 = train_detector(
            tiny_cfg, ds, work_dir=wd, seed=0, max_iters=500, mesh=None
        )
    finally:
        timer.cancel()
    stopped_at = int(s1.step)
    assert 1 <= stopped_at < 500
    # resume continues from the reclaimed step
    s2 = train_detector(
        tiny_cfg, ds, work_dir=wd, seed=0,
        max_iters=stopped_at + 1, mesh=None,
    )
    assert int(s2.step) == stopped_at + 1
