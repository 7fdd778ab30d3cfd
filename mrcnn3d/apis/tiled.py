"""Halo-aware volume-tiling inference driver.

The reference scales to whole volumes by evaluating pre-cut patch
datasets whose img_infos carry pos_top/pos_left/pos_front offsets, then
translating detections to volume coordinates and merging with a global
asymmetric-overlap NMS at 0.1 (SURVEY.md section 5 long-context analysis;
coco_utils.py:306-370).  This driver does the tiling on the fly: fixed
patch geometry (one XLA compile), overlapping halos so boundary objects
appear fully inside some patch, per-patch inference, coordinate
translation, and the same merge NMS.
"""
from __future__ import annotations

import numpy as np

from ..detectors import pipeline as pl
from ..eval.masks import get_box_masks_3d
from ..eval.results import det_entries, merge_patch_detections
from .test_api import InferenceRunner


def tile_starts(extent, patch, stride):
    """Start offsets covering [0, extent) with overlap; last tile flush."""
    if extent <= patch:
        return [0]
    starts = list(range(0, extent - patch, stride))
    starts.append(extent - patch)
    return starts


def _fixed_tile(vol, z0, y0, x0, pd, ph):
    """Crop a (pd, ph, ph) window, zero-padding at volume edges.

    Every tile has identical geometry so the whole sweep runs on ONE
    compiled program; zeros are the normalised mean intensity. (Volumes
    smaller than the patch, and short 1.5x windows from upscale rounding,
    are the cases that would otherwise trigger a recompile per distinct
    remainder shape.)
    """
    t = vol[z0 : z0 + pd, y0 : y0 + ph, x0 : x0 + ph]
    pads = [
        (0, pd - t.shape[0]),
        (0, ph - t.shape[1]),
        (0, ph - t.shape[2]),
        (0, 0),
    ]
    if any(p[1] for p in pads[:3]):
        t = np.pad(t, pads)
    return t


def tiled_inference(
    cfg,
    model,
    variables,
    volume_sample,
    patch_hw=256,
    patch_d=None,
    overlap=0.25,
    merge_thr=0.1,
):
    """Run patch-tiled inference over one (possibly huge) volume.

    volume_sample: dict from dataset.prepare_test (imgs (D, H, W, 3)
    normalised [+ imgs_2]).  Returns per-class det arrays in volume
    coordinates after the global merge NMS; when the model's mask path
    is on (test_cfg return_bbox_only=False), also returns aligned
    per-class segmentation lists — compact {box, mask, shape} dicts in
    VOLUME coordinates (reference segm2json3D carries the patch mask +
    segm_pos_* placement the same way, coco_utils.py:416-477); paste
    with eval.masks.paste_mask_3d or feed to CocoEval3D directly.
    """
    runner = InferenceRunner(cfg, model, variables)
    img = np.asarray(volume_sample["imgs"])
    with_masks = getattr(model, "with_mask", False) and not cfg.test_cfg.get(
        "return_bbox_only", False
    )
    mask_thr = cfg.test_cfg["rcnn"].get("mask_thr_binary", 0.25)
    d, h, w, _ = img.shape
    patch_d = patch_d or d
    stride_hw = max(int(patch_hw * (1 - overlap)), 1)
    stride_d = max(int(patch_d * (1 - overlap)), 1)

    img2 = None
    up = cfg.get("upscale_factor", 1.5)
    if model.num_scales >= 2:
        img2 = np.asarray(volume_sample["imgs_2"])

    # fixed 1.5x window geometry for the whole sweep (one compile)
    pd2, ph2 = int(round(patch_d * up)), int(round(patch_hw * up))

    entries = []
    for z0 in tile_starts(d, patch_d, stride_d):
        for y0 in tile_starts(h, patch_hw, stride_hw):
            for x0 in tile_starts(w, patch_hw, stride_hw):
                sample = {
                    "imgs": _fixed_tile(img, z0, y0, x0, patch_d, patch_hw)
                }
                if img2 is not None:
                    # the 1.0x window [u0, u0+p) maps to [u0*up, (u0+p)*up)
                    # in the 1.5x volume; round (not truncate) the origin so
                    # both pathways see the same physical window
                    z2, y2, x2 = (
                        int(round(z0 * up)),
                        int(round(y0 * up)),
                        int(round(x0 * up)),
                    )
                    sample["imgs_2"] = _fixed_tile(
                        img2, z2, y2, x2, pd2, ph2
                    )
                out = runner(sample)
                dets, labels, valid = out[:3]
                per_class = pl.bbox2result3d(
                    dets, labels, valid, model.num_classes
                )
                info = dict(
                    id=0,
                    pos_left=x0,
                    pos_top=y0,
                    pos_front=z0,
                )
                patch_entries = det_entries(per_class, info)
                if with_masks and len(out) > 3:
                    # attach the box-extent mask to each entry: box
                    # masks come out row-ordered with labels, which is
                    # exactly bbox2result3d's per-class row order, so a
                    # class-major flatten aligns with det_entries
                    cls_masks = [[] for _ in range(model.num_classes - 1)]
                    for bm in get_box_masks_3d(
                        out[3], dets, labels, valid, mask_thr
                    ):
                        cls_masks[bm["label"] - 1].append(bm)
                    flat = [bm for cm in cls_masks for bm in cm]
                    shift = np.array([x0, y0, x0, y0, z0, z0], np.int32)
                    for e, bm in zip(patch_entries, flat):
                        e["segmentation"] = dict(
                            box=bm["box"] + shift,
                            mask=bm["mask"],
                            shape=(d, h, w),
                        )
                entries.extend(patch_entries)

    merged = merge_patch_detections(entries, merge_thr)
    # back to per-class xyxyzz+score arrays (+ aligned segm carriers)
    out = [[] for _ in range(model.num_classes - 1)]
    segms = [[] for _ in range(model.num_classes - 1)]
    for e in merged:
        b = e["bbox"]
        out[e["category_id"] - 1].append(
            [
                b[0],
                b[1],
                b[0] + b[2] - 1,
                b[1] + b[3] - 1,
                b[4],
                b[4] + b[5] - 1,
                e["score"],
            ]
        )
        if "segmentation" in e:
            segms[e["category_id"] - 1].append(e["segmentation"])
    per_class = [
        np.asarray(x, np.float32).reshape(-1, 7) for x in out
    ]
    if with_masks:
        return per_class, segms
    return per_class
