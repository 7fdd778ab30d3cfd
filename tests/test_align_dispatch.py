"""Pin the RoIAlign formulation dispatch at the product geometries.

The `_use_xfirst` cost model is calibrated against the round-4
tools/bench_ops.py shootout on a real v5e (measured at 2000 rois:
gather 75 ms vs xfirst 55 ms at bbox 7x7x3 on 1.0x features; gather
925 ms vs xfirst ~154 ms at mask 14x14x10; xfirst regresses on the
larger 1.5x features).  These tests are the staleness guard: if the
constants drift or someone edits the model, the pinned decisions at
the three geometries the flagship actually runs must not silently
flip — re-run the shootout on hardware before changing them.
"""
import jax.numpy as jnp

from mrcnn3d.detectors.pipeline import _use_xfirst

ROI_BBOX = dict(
    roi_layer=dict(out_size=7, out_size_depth=3, sample_num=2),
    featmap_strides=[4, 8, 16, 32],
    featmap_strides_depth=[2, 4, 8, 16],
)
ROI_MASK = dict(
    roi_layer=dict(out_size=14, out_size_depth=10, sample_num=2),
    featmap_strides=[4, 8, 16, 32],
    featmap_strides_depth=[2, 4, 8, 16],
)


def _feats(d0, h0, c=64):
    return [jnp.zeros((1, d0, h0, h0, c), jnp.bfloat16)]


def test_bbox_align_1x_uses_xfirst():
    # 512x512x64 input -> level-0 (32, 128, 128, 64)
    assert _use_xfirst(_feats(32, 128), ROI_BBOX)


def test_bbox_align_1p5x_uses_gather():
    # 768x768x96 input -> level-0 (48, 192, 192, 64)
    assert not _use_xfirst(_feats(48, 192), ROI_BBOX)


def test_mask_align_1x_uses_xfirst():
    assert _use_xfirst(_feats(32, 128), ROI_MASK)


def test_batch_or_optout_falls_back_to_gather():
    feats = [jnp.zeros((2, 32, 128, 128, 64), jnp.bfloat16)]
    assert not _use_xfirst(feats, ROI_BBOX)  # multi-volume
    cfg = dict(ROI_BBOX, roi_layer=dict(
        ROI_BBOX["roi_layer"], use_xfirst_infer=False))
    assert not _use_xfirst(_feats(32, 128), cfg)
