"""PyTorch checkpoint → flax params converter (checkpoint replay parity).

Maps reference state_dict names (mmdet MaskRCNN3D2Scales, torch NCDHW)
onto this framework's channel-last flax tree:

  backbone.conv1.weight (O,I,kd,kh,kw)      -> backbone/conv1/kernel (kd,kh,kw,I,O)
  backbone.bn1.{weight,bias}                -> backbone/bn1/{scale,bias}
  backbone.bn1.running_{mean,var}           -> batch_stats backbone/bn1/{mean,var}
  backbone.layerL.B.convN / bnN             -> backbone/layerL_B/convN|bnN
  backbone.layerL.B.downsample.{0,1}        -> .../downsample_conv|downsample_bn
  neck.lateral_convs.i.conv                 -> neck/lateral_i
  neck.fpn_convs.i.conv                     -> neck/fpn_i
  rpn_head{,_2}.rpn_{conv,cls,reg}          -> rpn_head_{0,1}/rpn_*
  bbox_head.shared_fcs.i                    -> bbox_head_0/shared_fc_i
  bbox_head.fc_{cls,reg}                    -> bbox_head_0/fc_*
  refinement_head.*                         -> refinement_head/*
  mask_head.convs.i.conv                    -> mask_head_0/conv_i
  mask_head.upsample (in,out,kd,kh,kw)      -> mask_head_0/upsample (kd,kh,kw,in,out)
  mask_head.conv_logits                     -> mask_head_0/conv_logits
  refinement_mask_head.*                    -> refinement_mask_head/*

Linear weights are transposed (out,in)->(in,out); the FIRST fc after RoI
flatten additionally permutes its input dim from torch C*D*H*W order to
our D*H*W*C order.  `module.` prefixes are stripped and the reference
backbone's self-supervised projection keys skipped
(reference resnet3d.py:422-438 load_checkpoint).
"""
from __future__ import annotations

import re

import numpy as np

EXCLUDE = (
    "projection_original_features",
    "connect_patches_feature",
)


def _conv_w(w):
    # (O, I, kd, kh, kw) -> (kd, kh, kw, I, O)
    return np.transpose(np.asarray(w), (2, 3, 4, 1, 0))


def _deconv_w(w):
    # torch ConvTranspose3d (I, O, kd, kh, kw) -> flax (kd, kh, kw, I, O).
    # torch's deconv is the conv gradient (kernel applied mirrored);
    # flax ConvTranspose is a fractionally-strided conv, so flip spatial.
    w = np.transpose(np.asarray(w), (2, 3, 4, 0, 1))
    return w[::-1, ::-1, ::-1].copy()


def _fc_w(w):
    return np.transpose(np.asarray(w))


def _fc0_w(w, roi_shape, channels):
    """First-after-flatten fc: permute input dim C*D*H*W -> D*H*W*C."""
    w = np.asarray(w)  # (out, C*D*H*W)
    out = w.shape[0]
    d, h, ww = roi_shape
    w = w.reshape(out, channels, d, h, ww)
    w = np.transpose(w, (0, 2, 3, 4, 1)).reshape(out, -1)
    return np.transpose(w)


def convert_state_dict(
    state_dict,
    num_scales=2,
    roi_shape=(3, 7, 7),
    mask_roi_shape=(10, 14, 14),
    channels=64,
):
    """torch state_dict (name -> np/torch tensor) -> (params, batch_stats).

    Returns nested dicts matching Detector3D's variable tree.
    """
    params: dict = {}
    stats: dict = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(leaf)

    def np_of(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    sd = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if any(e in k for e in EXCLUDE):
            continue
        sd[k] = np_of(v)

    def bn(src, dst):
        put(params, dst + ["scale"], sd[src + ".weight"])
        put(params, dst + ["bias"], sd[src + ".bias"])
        put(stats, dst + ["mean"], sd[src + ".running_mean"])
        put(stats, dst + ["var"], sd[src + ".running_var"])

    def conv(src, dst, bias=False):
        put(params, dst + ["kernel"], _conv_w(sd[src + ".weight"]))
        if bias and src + ".bias" in sd:
            put(params, dst + ["bias"], sd[src + ".bias"])

    # ---- backbone ---- (every section is optional: partial checkpoints
    # such as backbone-only pretrains or single blocks convert too)
    if "backbone.conv1.weight" in sd:
        conv("backbone.conv1", ["backbone", "conv1"])
        bn("backbone.bn1", ["backbone", "bn1"])
    layer_re = re.compile(r"^backbone\.layer(\d+)\.(\d+)\.")
    seen = set()
    for k in sd:
        m = layer_re.match(k)
        if not m:
            continue
        li, bi = int(m.group(1)), int(m.group(2))
        if (li, bi) in seen:
            continue
        seen.add((li, bi))
        src = f"backbone.layer{li}.{bi}"
        dst = ["backbone", f"layer{li}_{bi}"]
        for n in (1, 2, 3):
            if f"{src}.conv{n}.weight" in sd:
                conv(f"{src}.conv{n}", dst + [f"conv{n}"])
                bn(f"{src}.bn{n}", dst + [f"bn{n}"])
        if f"{src}.downsample.0.weight" in sd:
            conv(f"{src}.downsample.0", dst + ["downsample_conv"])
            bn(f"{src}.downsample.1", dst + ["downsample_bn"])

    # ---- neck ----
    i = 0
    while f"neck.lateral_convs.{i}.conv.weight" in sd:
        conv(
            f"neck.lateral_convs.{i}.conv",
            ["neck", f"lateral_{i}"],
            bias=True,
        )
        conv(f"neck.fpn_convs.{i}.conv", ["neck", f"fpn_{i}"], bias=True)
        i += 1

    # ---- rpn heads ----
    for s in range(num_scales):
        src = "rpn_head" if s == 0 else f"rpn_head_{s + 1}"
        if f"{src}.rpn_conv.weight" not in sd:
            continue
        dst = [f"rpn_head_{s}"]
        conv(f"{src}.rpn_conv", dst + ["rpn_conv"], bias=True)
        conv(f"{src}.rpn_cls", dst + ["rpn_cls"], bias=True)
        conv(f"{src}.rpn_reg", dst + ["rpn_reg"], bias=True)

    # ---- bbox / refinement heads ----
    def fc_head(src, dst, roi):
        i = 0
        while f"{src}.shared_fcs.{i}.weight" in sd:
            w = sd[f"{src}.shared_fcs.{i}.weight"]
            kernel = _fc0_w(w, roi, channels) if i == 0 else _fc_w(w)
            put(params, dst + [f"shared_fc_{i}", "kernel"], kernel)
            put(
                params,
                dst + [f"shared_fc_{i}", "bias"],
                sd[f"{src}.shared_fcs.{i}.bias"],
            )
            i += 1
        for name in ("fc_cls", "fc_reg"):
            if f"{src}.{name}.weight" in sd:
                put(
                    params,
                    dst + [name, "kernel"],
                    _fc_w(sd[f"{src}.{name}.weight"]),
                )
                put(params, dst + [name, "bias"], sd[f"{src}.{name}.bias"])

    if "bbox_head.shared_fcs.0.weight" in sd:
        fc_head("bbox_head", ["bbox_head_0"], roi_shape)
    if "bbox_head_2.shared_fcs.0.weight" in sd:
        fc_head("bbox_head_2", ["bbox_head_1"], roi_shape)
    if "refinement_head.shared_fcs.0.weight" in sd:
        fc_head("refinement_head", ["refinement_head"], roi_shape)

    # ---- mask heads ----
    def mask_head(src, dst):
        i = 0
        while f"{src}.convs.{i}.conv.weight" in sd:
            conv(f"{src}.convs.{i}.conv", dst + [f"conv_{i}"], bias=True)
            i += 1
        if f"{src}.upsample.weight" in sd:
            put(
                params,
                dst + ["upsample", "kernel"],
                _deconv_w(sd[f"{src}.upsample.weight"]),
            )
            put(params, dst + ["upsample", "bias"], sd[f"{src}.upsample.bias"])
        if f"{src}.conv_logits.weight" in sd:
            conv(f"{src}.conv_logits", dst + ["conv_logits"], bias=True)

    if "mask_head.convs.0.conv.weight" in sd:
        mask_head("mask_head", ["mask_head_0"])
    if "mask_head_2.convs.0.conv.weight" in sd:
        mask_head("mask_head_2", ["mask_head_1"])
    if "refinement_mask_head.convs.0.conv.weight" in sd:
        mask_head("refinement_mask_head", ["refinement_mask_head"])

    return params, stats


def load_torch_checkpoint(path, **kwargs):
    """Load a reference .pth and convert (handles Runner-style wrapping)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt.get("model_state_dict", ckpt))
    return convert_state_dict(sd, **kwargs)


def merge_into_variables(variables, params, stats):
    """Overlay converted leaves onto an initialised variable tree.

    Shapes are validated; missing keys keep their initial values (e.g.
    when loading a backbone-only pretrain checkpoint).
    """
    import jax

    def overlay(dst, src, path=""):
        out = dict(dst)
        for k, v in src.items():
            if k not in dst:
                raise KeyError(f"unknown converted key {path}/{k}")
            if isinstance(v, dict):
                out[k] = overlay(dst[k], v, f"{path}/{k}")
            else:
                have = np.asarray(dst[k])
                if have.shape != v.shape:
                    raise ValueError(
                        f"shape mismatch at {path}/{k}: "
                        f"{have.shape} vs {v.shape}"
                    )
                out[k] = v.astype(have.dtype)
        return out

    new = dict(variables)
    new["params"] = overlay(variables["params"], params)
    if stats:
        new["batch_stats"] = overlay(
            variables.get("batch_stats", {}), stats
        )
    return jax.tree.map(lambda x: x, new)
