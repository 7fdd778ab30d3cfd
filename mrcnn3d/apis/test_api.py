"""Inference/eval API (reference tools/test.py + apis/inference.py path).

Whole volumes are jit-compiled per padded shape (shape-bucketed cache);
detections flow through the patch→global json writers and the 29-stat
3-D COCO evaluator.
"""
from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..detectors import pipeline as pl
from ..detectors.build import anchor_cfgs
from ..eval.coco_eval3d import CocoEval3D
from ..eval.results import results2json3d

logger = logging.getLogger("mrcnn3d")


class InferenceRunner:
    """Shape-bucketed jitted simple_test over full volumes."""

    def __init__(self, cfg, model, variables):
        self.cfg = cfg
        self.model = model
        self.variables = variables
        self.acs = anchor_cfgs(cfg)
        self._cache = {}

    def _get_fn(self, shapes):
        key = tuple(shapes)
        if key in self._cache:
            return self._cache[key]
        sets = []
        for (d, h, w), ac in zip(shapes, self.acs):
            x = jnp.zeros((1, d, h, w, 3))
            feats = jax.eval_shape(
                lambda v: self.model.apply(
                    self.variables, v, method=self.model.extract_feat
                ),
                x,
            )
            fs = [f.shape[1:4] for f in feats]
            sets.append(pl.build_anchor_set(fs, (h, w, 3, d), ac))

        model, variables, cfg = self.model, self.variables, self.cfg

        @jax.jit
        def fn(batch):
            out = pl.simple_test(model, variables, batch, cfg, sets)
            res = (out["dets"], out["labels"], out["valid"])
            if "mask_logits" in out:
                res = res + (out["mask_logits"],)
            return res

        self._cache[key] = fn
        return fn

    def __call__(self, sample):
        imgs = sample["imgs"][None]
        batch = {"imgs": jnp.asarray(imgs)}
        shapes = [imgs.shape[1:4]]
        if self.model.num_scales >= 2:
            imgs2 = sample["imgs_2"][None]
            batch["imgs_2"] = jnp.asarray(imgs2)
            shapes.append(imgs2.shape[1:4])
        fn = self._get_fn(shapes)
        out = fn(batch)
        dets, labels, valid = out[:3]
        result = (
            np.asarray(dets[0]),
            np.asarray(labels[0]),
            np.asarray(valid[0]),
        )
        if len(out) > 3:
            result = result + (np.asarray(out[3], np.float32),)
        return result


def run_inference(
    cfg, model, variables, dataset, progress=True, rank=0, world=1
):
    """Returns (per-image per-class results, img_infos).

    rank/world > 1 evaluates the rank-strided shard idx % world == rank,
    mirroring the reference's distributed eval hook
    (mmdet/core/evaluation/eval_hooks.py:111-149); callers merge the
    per-rank entries (image ids travel with each entry) via
    `allgather_entries`.
    """
    runner = InferenceRunner(cfg, model, variables)
    results, infos, segms = [], [], []
    for idx in range(rank, len(dataset), world):
        sample = dataset.prepare_test(idx)
        out = runner(sample)
        dets, labels, valid = out[:3]
        per_class = pl.bbox2result3d(
            dets, labels, valid, model.num_classes
        )
        results.append(per_class)
        infos.append(sample["img_info"])
        if len(out) > 3:
            from ..eval.masks import get_seg_masks_3d

            d, h, w = sample["ori_shape"]
            cls_segms = get_seg_masks_3d(
                out[3],
                dets,
                labels,
                valid,
                model.num_classes,
                (h, w, d),
                cfg.test_cfg["rcnn"].get("mask_thr_binary", 0.25),
            )
            segms.append(cls_segms)
        if progress:
            logger.info(
                "inference %d/%d: %d dets",
                idx + 1,
                len(dataset),
                int(valid.sum()),
            )
    if segms:
        return results, infos, segms
    return results, infos


def allgather_entries(entries):
    """Merge per-rank result-entry lists across JAX processes.

    Host-side pytree-free gather (entries are python dicts): pickle to a
    padded uint8 buffer, `multihost_utils.process_allgather`, unpickle.
    A no-op in single-process runs.  Mirrors the reference hook's
    tmpfile broadcast (eval_hooks.py:122-148) over ICI/DCN collectives
    instead of a shared filesystem.
    """
    if jax.process_count() == 1:
        return entries
    import pickle

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(entries), np.uint8)
    sizes = multihost_utils.process_allgather(
        np.array([payload.size], np.int64)
    ).ravel()
    buf = np.zeros(int(sizes.max()), np.uint8)
    buf[: payload.size] = payload
    bufs = multihost_utils.process_allgather(buf)
    merged = []
    for sz, b in zip(sizes, np.asarray(bufs).reshape(len(sizes), -1)):
        merged.extend(pickle.loads(b[: int(sz)].tobytes()))
    return merged


def evaluate_dataset(
    cfg, model, state, dataset, iou_type="bbox", rank=0, world=1
):
    """In-loop / offline evaluation: 29-stat 3-D COCO summary.

    iou_type 'segm' requires the model's mask path (test_cfg
    return_bbox_only=False); detections are pasted into full volumes and
    scored with voxel IoU against lazily-loaded gt masks.

    With world > 1, each process runs its rank-strided shard and the
    entries are all-gathered before scoring, so every process returns
    the same full-dataset stats (reference eval_hooks.py:111-149).
    """
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    out = run_inference(
        cfg, model, variables, dataset, rank=rank, world=world
    )
    if len(out) == 3 and iou_type == "segm":
        results, infos, segms = out
        from ..eval.masks import segm_entries

        entries = []
        for cls_segms, per_class, info in zip(segms, results, infos):
            entries.extend(segm_entries(cls_segms, per_class, info))
        if world > 1:
            entries = allgather_entries(entries)
        evaluator = CocoEval3D(dataset.coco, entries, iou_type="segm")
        return evaluator.named_stats(prefix="segm")
    results, infos = out[:2]
    # patch->global merge must run over the FULL entry set: patches of
    # one volume can land on different ranks, so gather raw entries
    # first and merge after (single-process path merges inline)
    entries = results2json3d(results, infos, merge=(world == 1))
    if world > 1:
        from ..eval.results import merge_patch_detections

        entries = merge_patch_detections(allgather_entries(entries))
    evaluator = CocoEval3D(dataset.coco, entries, iou_type="bbox")
    return evaluator.named_stats(prefix="bbox")
