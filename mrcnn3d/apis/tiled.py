"""Halo-aware volume-tiling inference driver, device-resident.

The reference scales to whole volumes by evaluating pre-cut patch
datasets whose img_infos carry pos_top/pos_left/pos_front offsets, then
translating detections to volume coordinates and merging with a global
asymmetric-overlap NMS at 0.1 (SURVEY.md section 5 long-context analysis;
coco_utils.py:306-370).  This driver does the tiling on the fly and
TPU-first:

  * the whole volume (both resolutions) is uploaded to device HBM ONCE
    (cast to the model compute dtype — half the bytes for bf16 models);
  * each tile is cut ON DEVICE with `lax.dynamic_slice` inside one
    jitted program whose origin is a traced argument — one compile for
    the whole sweep, zero per-tile host->device image transfer (the
    previous host-cropping driver re-uploaded every overlapping tile:
    ~4.4 GB per 512^2x240 sweep, which dominated end-to-end time on
    remote-attached devices);
  * the mask fetch is class-gathered on device: only the predicted
    class's (Dm, Hm, Wm) logit slice travels back, 4x less than the
    full (C, Dm, Hm, Wm) block.

Detections are translated to volume coordinates and merged with the
same global NMS as the reference.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..detectors import pipeline as pl
from ..detectors.build import anchor_cfgs
from ..eval.masks import _sigmoid, box_mask_from_probs
from ..eval.results import det_entries, merge_patch_detections


def tile_starts(extent, patch, stride):
    """Start offsets covering [0, extent) with overlap; last tile flush."""
    if extent <= patch:
        return [0]
    starts = list(range(0, extent - patch, stride))
    starts.append(extent - patch)
    return starts


def _to_device_flat(vol, dtype):
    """Upload a (D, H, W, 3) volume as a FLAT 1-D device array.

    Volume-scale arrays with minor dimension 3 must NEVER exist as
    standalone device arrays on the remote TPU backend: any eager op
    touching one (upload copy, reshape, even the `ravel()[0]` sync)
    can allocate it in a 128-lane-padded `T(8,128)` layout — observed
    r5: `f32[240,512,512,3]` rejected as a 32.2 GB allocation, 42.7x
    its logical bytes.  1-D arrays and jitted-program internals are
    safe, so volumes travel flat and are reshaped INSIDE the consuming
    program.  Returns (flat_device_array, shape).  Casting host-side
    first also halves the tunnel bytes for f32 input on bf16 models."""
    shape = tuple(int(s) for s in np.shape(vol))
    assert len(shape) == 4, f"expected (D, H, W, C) volume, got {shape}"
    if isinstance(vol, jax.Array):
        # device input: flatten via a jitted program (1-D output layout
        # is compact; test-scale arrays only — the product path uploads
        # from host)
        return jax.jit(jnp.ravel)(vol).astype(dtype), shape
    host = np.ascontiguousarray(np.asarray(vol)).astype(dtype)
    return jax.device_put(host.reshape(-1)), shape


@functools.lru_cache(maxsize=4)
def _prep_fn(shape, shape2, tgt1, tgt2, up_shape, two_scale, dtype):
    """ONE jitted prep program per geometry: reshape the flat
    upload(s), derive the 1.5x twin on device when the sample didn't
    carry one (same grid-center trilinear the reference's
    pre-materialised twin dataset uses), zero-pad both so every tile's
    dynamic_slice is in-bounds — and return both volumes FLAT (1-D
    outputs keep compact layouts; see _to_device_flat).  Zero padding
    is the normalised mean intensity (matches the reference's border
    handling for remainder patches).  lru-cached so repeat volumes of
    the same geometry reuse the compiled program."""
    from ..ops.resize3d import resize_trilinear_3d

    def pad_fused(v, src_dhw, tgt):
        """Zero-pad in the (D, H, W*C) FUSED view: volume-scale tensors
        with a minor dim of 3 must never meet a layout-sensitive op on
        the remote TPU backend (see _to_device_flat / resize3d.py) —
        padding the fused last axis by (tgt_w - w)*C zeros per row is
        exactly a W-axis pad of the unfused volume."""
        c = v.shape[-1] // src_dhw[2]
        pads = [
            (0, tgt[0] - src_dhw[0]),
            (0, tgt[1] - src_dhw[1]),
            (0, (tgt[2] - src_dhw[2]) * c),
        ]
        if any(p[1] > 0 for p in pads):
            v = jnp.pad(v, pads)
        return v

    @jax.jit
    def prep(f, f2):
        dd, hh, ww, cc = shape
        v = f.reshape(dd, hh, ww * cc).astype(dtype)
        v1 = pad_fused(v, (dd, hh, ww), tgt1)
        if not two_scale:
            v2 = jnp.zeros((3,), dtype)
        elif f2 is not None:
            d2, h2, w2, c2 = shape2
            v2 = pad_fused(
                f2.reshape(d2, h2, w2 * c2).astype(dtype),
                (d2, h2, w2), tgt2,
            )
        else:
            tw = resize_trilinear_3d(f.reshape(shape).astype(dtype),
                                     up_shape)
            v2 = pad_fused(
                tw.reshape(up_shape[0], up_shape[1], up_shape[2] * cc),
                up_shape, tgt2,
            )
        return v1.reshape(-1), v2.reshape(-1)

    return prep


class DeviceTiler:
    """One compiled program for a whole tile sweep.

    fn(vol, vol2, o1, o2) dynamic-slices the device-resident volume(s)
    at the (traced) origins and runs simple_test on the patch pair.

    `max_dets` caps the per-tile detections carried off device: the
    top-`max_dets` by score are compacted ON DEVICE (dets + labels +
    the predicted class's mask-logit slice) before the fetch, so the
    host transfer is O(max_dets), not O(test_cfg max_per_img).  The
    reference carries max_per_img=2000 per patch
    (configs/3d-multi-resolution-rcnn.py:139-144); a SWI patch holds
    nowhere near 256 true lesions, so the default loses nothing in
    practice — pass max_dets=None for strict full-budget parity.
    """

    def __init__(self, cfg, model, variables, patch1, patch2=None,
                 max_dets=256, vol_shape1=None, vol_shape2=None):
        self.model = model
        self.patch1, self.patch2 = patch1, patch2
        # padded (D, H, W, 3) shapes of the FLAT device volumes the
        # sweep receives: volumes travel between programs 1-D (layout
        # hazard, see _to_device_flat) and are reshaped in-program
        self.vol_shape1 = vol_shape1 or (patch1 + (3,))
        self.vol_shape2 = vol_shape2 or (
            (patch2 + (3,)) if patch2 else (1, 1, 1, 3)
        )
        vs1, vs2 = self.vol_shape1, self.vol_shape2
        acs = anchor_cfgs(cfg)
        sets = []
        shapes = [patch1] + ([patch2] if patch2 else [])
        for (d, h, w), ac in zip(shapes, acs):
            x = jnp.zeros((1, d, h, w, 3))
            feats = jax.eval_shape(
                lambda v: model.apply(
                    variables, v, method=model.extract_feat
                ),
                x,
            )
            fs = [f.shape[1:4] for f in feats]
            sets.append(pl.build_anchor_set(fs, (h, w, 3, d), ac))

        dtype = getattr(model, "dtype", jnp.float32)

        @jax.jit
        def fn(volf, vol2f, o1, o2):
            # FUSED (D, H, W*3) views: a dynamic_slice on a volume-scale
            # (..., 3) operand hits the remote backend's 128-lane-padded
            # layout (see _to_device_flat); slicing the fused axis at
            # x*3 is the same tile, and the per-TILE unfuse reshape is
            # patch-scale (proven safe by the patch programs)
            vol = volf.reshape(vs1[0], vs1[1], vs1[2] * vs1[3])
            t = jax.lax.dynamic_slice(
                vol, (o1[0], o1[1], o1[2] * 3),
                (patch1[0], patch1[1], patch1[2] * 3),
            ).reshape(patch1 + (3,))
            batch = {"imgs": t[None].astype(dtype)}
            if patch2 is not None:
                vol2 = vol2f.reshape(vs2[0], vs2[1], vs2[2] * vs2[3])
                t2 = jax.lax.dynamic_slice(
                    vol2, (o2[0], o2[1], o2[2] * 3),
                    (patch2[0], patch2[1], patch2[2] * 3),
                ).reshape(patch2 + (3,))
                batch["imgs_2"] = t2[None].astype(dtype)
            out = pl.simple_test(model, variables, batch, cfg, sets)
            dets = out["dets"][0]
            labels = out["labels"][0]
            valid = out["valid"][0]
            if max_dets is not None and max_dets < dets.shape[0]:
                scores = jnp.where(
                    valid, dets[:, 6], -jnp.inf
                ).astype(jnp.float32)
                top_s, top_i = jax.lax.top_k(scores, max_dets)
                dets = dets[top_i]
                labels = labels[top_i]
                valid = valid[top_i] & jnp.isfinite(top_s)
            res = (dets, labels, valid)
            if "mask_logits" in out:
                ml = out["mask_logits"]  # (N, C, Dm, Hm, Wm)
                if ml.shape[0] != dets.shape[0]:
                    ml = ml[top_i]
                lbl = (labels + 1).astype(jnp.int32)
                sel = jax.vmap(lambda m, c: m[c])(ml, lbl)
                res = res + (sel.astype(jnp.bfloat16),)
            return res

        self._fn = fn

    def run(self, vol, vol2, o1, o2):
        """Device step only: returns device arrays, blocked-on."""
        out = self._fn(
            vol, vol2,
            jnp.asarray(o1, jnp.int32), jnp.asarray(o2, jnp.int32),
        )
        jax.block_until_ready(out)
        return out

    @staticmethod
    def fetch(out):
        """Device->host transfer of a run() result.  Mask logits travel
        as bf16 (half the tunnel bytes) and widen to f32 on the host."""
        res = (
            np.asarray(out[0]),
            np.asarray(out[1]),
            np.asarray(out[2]),
        )
        if len(out) > 3:
            res = res + (np.asarray(out[3]).astype(np.float32),)
        return res

    def __call__(self, vol, vol2, o1, o2):
        return self.fetch(self.run(vol, vol2, o1, o2))


# Sweep-program + device-volume reuse across tiled_inference calls: the
# compiled sweep depends only on (model, variables, cfg, geometry), and
# re-tracing a fresh @jax.jit closure per volume measured ~70 s/call on
# the remote-attached chip (VERDICT r4 weak #2).  Keys use object ids;
# the cached value holds references to the keyed objects so an id can
# never be reused while its entry is alive.  Both caches are tiny LRUs.
_TILER_CACHE = {}
_VOL_CACHE = {}
_CACHE_CAP = 2


def _cache_put(cache, key, value):
    cache[key] = value
    while len(cache) > _CACHE_CAP:
        cache.pop(next(iter(cache)))


def _get_tiler(cfg, model, variables, patch1, patch2, max_dets,
               vol_shape1=None, vol_shape2=None):
    key = (id(cfg), id(model), id(variables), patch1, patch2, max_dets,
           vol_shape1, vol_shape2)
    hit = _TILER_CACHE.get(key)
    if hit is not None and hit[0] is cfg and hit[1] is variables:
        return hit[2]
    tiler = DeviceTiler(
        cfg, model, variables, patch1, patch2, max_dets=max_dets,
        vol_shape1=vol_shape1, vol_shape2=vol_shape2,
    )
    _cache_put(_TILER_CACHE, key, (cfg, variables, tiler))
    return tiler


def tiled_inference(
    cfg,
    model,
    variables,
    volume_sample,
    patch_hw=256,
    patch_d=None,
    overlap=0.25,
    merge_thr=0.1,
    max_dets_per_tile=256,
    timers=None,
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

    `timers`: optional dict — phase wall-times are accumulated into it
    (tools/profile_tiled.py reads these, so the profile can never drift
    from the real driver).
    """
    import time as _time

    def _t():
        return _time.perf_counter()

    def _acc(key, t0):
        if timers is not None:
            timers[key] = timers.get(key, 0.0) + (_time.perf_counter() - t0)

    img = volume_sample["imgs"]
    with_masks = getattr(model, "with_mask", False) and not cfg.test_cfg.get(
        "return_bbox_only", False
    )
    mask_thr = cfg.test_cfg["rcnn"].get("mask_thr_binary", 0.25)
    d, h, w, _ = img.shape
    patch_d = patch_d or d
    stride_hw = max(int(patch_hw * (1 - overlap)), 1)
    stride_d = max(int(patch_d * (1 - overlap)), 1)

    zs = tile_starts(d, patch_d, stride_d)
    ys = tile_starts(h, patch_hw, stride_hw)
    xs = tile_starts(w, patch_hw, stride_hw)

    up = cfg.get("upscale_factor", 1.5)
    two_scale = model.num_scales >= 2
    pd2, ph2 = int(round(patch_d * up)), int(round(patch_hw * up))
    patch2 = (pd2, ph2, ph2) if two_scale else None

    # the model compute dtype is also the transfer dtype: for bf16
    # models this halves the (one-time) host->device upload
    dtype = getattr(model, "dtype", jnp.float32)

    # pad ONCE so every tile's dynamic_slice is in-bounds: the 1.0x
    # volume up to the patch, the 1.5x volume up to the farthest
    # rounded origin + patch (round(s*up) can overshoot dim2 by a voxel)
    if two_scale:
        z2s = [int(round(z * up)) for z in zs]
        y2s = [int(round(y * up)) for y in ys]
        x2s = [int(round(x * up)) for x in xs]
    vkey = (
        id(volume_sample["imgs"]), img.shape, str(dtype),
        patch_d, patch_hw, overlap, two_scale,
    )
    tgt1 = (max(d, patch_d), max(h, patch_hw), max(w, patch_hw))
    if two_scale:
        tgt2 = (max(z2s) + pd2, max(y2s) + ph2, max(x2s) + ph2)
        up_shape = (
            int(round(d * up)), int(round(h * up)), int(round(w * up))
        )
    else:
        tgt2 = up_shape = None
    vol_shape1 = tgt1 + (3,)
    vol_shape2 = (tgt2 + (3,)) if two_scale else (1, 1, 1, 3)
    vhit = _VOL_CACHE.get(vkey)
    if vhit is not None and vhit[0] is volume_sample["imgs"]:
        vol, vol2 = vhit[1], vhit[2]
    else:
        t0 = _t()
        # flat upload + ONE prep program (reshape, on-device 1.5x twin
        # derivation — three MXU einsums replacing the reference's
        # pre-materialised twin upload (coco_3d_2scales.py:209-234 /
        # native.resize_trilinear; 1.3 GB for a 512^2x240 SWI volume),
        # zero-pad); volumes stay FLAT between programs (layout hazard,
        # see _to_device_flat)
        flat, shape = _to_device_flat(img, dtype)
        raw2 = volume_sample.get("imgs_2") if two_scale else None
        if raw2 is not None:
            flat2, shape2 = _to_device_flat(raw2, dtype)
        else:
            flat2, shape2 = None, None
        prep = _prep_fn(
            shape, shape2, tgt1, tgt2, up_shape, two_scale, dtype
        )
        vol, vol2 = prep(flat, flat2)
        jax.block_until_ready((vol, vol2))
        _cache_put(_VOL_CACHE, vkey, (volume_sample["imgs"], vol, vol2))
        _acc("upload+derive_twin+pad", t0)

    t0 = _t()
    tiler = _get_tiler(
        cfg, model, variables, (patch_d, patch_hw, patch_hw), patch2,
        max_dets_per_tile, vol_shape1, vol_shape2,
    )
    _acc("tiler_ctor", t0)

    entries = []
    first_tile = True
    for iz, z0 in enumerate(zs):
        for iy, y0 in enumerate(ys):
            for ix, x0 in enumerate(xs):
                o2 = (
                    (z2s[iz], y2s[iy], x2s[ix]) if two_scale else (0, 0, 0)
                )
                t0 = _t()
                out_dev = tiler.run(vol, vol2, (z0, y0, x0), o2)
                _acc(
                    "sweep_compile+first_tile" if first_tile
                    else "tile_device_step",
                    t0,
                )
                first_tile = False
                t0 = _t()
                out = tiler.fetch(out_dev)
                _acc("fetch", t0)
                t0 = _t()
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
                    # Attach the RAW class-gathered mask probs + the int
                    # box per entry; the trilinear resize to box extents
                    # is deferred to AFTER the merge NMS (it only needs
                    # boxes), so only surviving detections pay the host
                    # resize.  At the full 2000-det budget this was
                    # 2000 resizes/tile x 5 tiles before the merge —
                    # the dominant cost of the whole-volume sweep.
                    # Ordering: labels/valid row order per class is
                    # exactly bbox2result3d's per-class row order, so a
                    # class-major index flatten aligns with det_entries.
                    probs = _sigmoid(np.asarray(out[3], np.float32))
                    vmask = np.asarray(valid).astype(bool)
                    lbl = np.asarray(labels)
                    rows = [
                        i
                        for c in range(model.num_classes - 1)
                        for i in np.nonzero(vmask & (lbl == c))[0]
                    ]
                    shift = np.array([x0, y0, x0, y0, z0, z0], np.int32)
                    boxes_int = np.asarray(dets)[:, :6].astype(np.int32)
                    for e, i in zip(patch_entries, rows):
                        e["segmentation"] = dict(
                            box=boxes_int[i] + shift,
                            probs=probs[i],
                            shape=(d, h, w),
                        )
                entries.extend(patch_entries)
                _acc("host_entries", t0)

    t0 = _t()
    merged = merge_patch_detections(entries, merge_thr)
    _acc("merge_nms", t0)
    if timers is not None:
        timers["n_entries"] = len(entries)
        timers["n_merged"] = len(merged)
    t0 = _t()
    # deferred mask realisation: resize+threshold survivors only
    for e in merged:
        seg = e.get("segmentation")
        if seg is not None and "mask" not in seg:
            seg["mask"] = box_mask_from_probs(
                seg.pop("probs"), seg["box"], mask_thr
            )
    _acc("deferred_mask_realise", t0)
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
