"""Checkpoint-converter numerical parity tests vs torch (CPU).

Each test builds the torch op with reference conventions (NCDHW), runs the
converted weights through our channel-last flax module, and compares
outputs — the op-level guarantee behind checkpoint replay.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp
from flax import linen as nn

from mrcnn3d.compat.torch_convert import (
    _conv_w,
    _deconv_w,
    _fc0_w,
    _fc_w,
    convert_state_dict,
)
from mrcnn3d.models.layers import FrozenBatchNorm


def _np(t):
    return t.detach().numpy()


def test_conv3d_parity():
    tconv = torch.nn.Conv3d(2, 3, 3, padding=1)
    x = torch.randn(1, 2, 4, 6, 6)
    want = _np(tconv(x))  # (1, 3, 4, 6, 6)

    conv = nn.Conv(3, (3, 3, 3), padding=1)
    params = {
        "kernel": _conv_w(_np(tconv.weight)),
        "bias": _np(tconv.bias),
    }
    x_cl = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 4, 1)))
    got = conv.apply({"params": params}, x_cl)
    got = np.transpose(np.asarray(got), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_frozen_bn_parity():
    tbn = torch.nn.BatchNorm3d(4)
    tbn.weight.data.normal_()
    tbn.bias.data.normal_()
    tbn.running_mean.normal_()
    tbn.running_var.uniform_(0.5, 2.0)
    tbn.eval()  # norm_eval=True semantics
    x = torch.randn(2, 4, 3, 5, 5)
    want = _np(tbn(x))

    bn = FrozenBatchNorm()
    variables = {
        "params": {
            "scale": _np(tbn.weight),
            "bias": _np(tbn.bias),
        },
        "batch_stats": {
            "mean": _np(tbn.running_mean),
            "var": _np(tbn.running_var),
        },
    }
    x_cl = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 4, 1)))
    got = bn.apply(variables, x_cl)
    got = np.transpose(np.asarray(got), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_flattened_fc_parity():
    # torch flattens (N, C, D, H, W); we flatten (N, D, H, W, C)
    c, d, h, w = 3, 2, 4, 4
    tfc = torch.nn.Linear(c * d * h * w, 8)
    x = torch.randn(2, c, d, h, w)
    want = _np(tfc(x.reshape(2, -1)))

    dense = nn.Dense(8)
    params = {
        "kernel": _fc0_w(_np(tfc.weight), (d, h, w), c),
        "bias": _np(tfc.bias),
    }
    x_cl = np.transpose(x.numpy(), (0, 2, 3, 4, 1)).reshape(2, -1)
    got = dense.apply({"params": params}, jnp.asarray(x_cl))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_plain_fc_parity():
    tfc = torch.nn.Linear(16, 4)
    x = torch.randn(3, 16)
    want = _np(tfc(x))
    dense = nn.Dense(4)
    params = {"kernel": _fc_w(_np(tfc.weight)), "bias": _np(tfc.bias)}
    got = dense.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_deconv_parity():
    tdc = torch.nn.ConvTranspose3d(3, 5, 2, stride=2)
    x = torch.randn(1, 3, 2, 3, 3)
    want = _np(tdc(x))  # (1, 5, 4, 6, 6)

    dc = nn.ConvTranspose(5, (2, 2, 2), strides=(2, 2, 2))
    params = {
        "kernel": _deconv_w(_np(tdc.weight)),
        "bias": _np(tdc.bias),
    }
    x_cl = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 4, 1)))
    got = dc.apply({"params": params}, x_cl)
    got = np.transpose(np.asarray(got), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_bottleneck_block_parity():
    """Reference-style torch Bottleneck vs our Bottleneck3D via converter."""
    import torch.nn as tnn

    class TorchBottleneck(tnn.Module):
        # mirrors the documented reference block (resnet3d.py:87-230):
        # 1x1x1 -> bn -> relu -> 3x3x3(stride) -> bn -> relu -> 1x1x1
        # -> bn -> +downsample -> relu
        def __init__(self, cin, planes, stride):
            super().__init__()
            self.conv1 = tnn.Conv3d(cin, planes, 1, bias=False)
            self.bn1 = tnn.BatchNorm3d(planes)
            self.conv2 = tnn.Conv3d(
                planes, planes, 3, stride=stride, padding=1, bias=False
            )
            self.bn2 = tnn.BatchNorm3d(planes)
            self.conv3 = tnn.Conv3d(planes, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm3d(planes * 4)
            self.downsample = tnn.Sequential(
                tnn.Conv3d(cin, planes * 4, 1, stride=stride, bias=False),
                tnn.BatchNorm3d(planes * 4),
            )

        def forward(self, x):
            idn = self.downsample(x)
            out = torch.relu(self.bn1(self.conv1(x)))
            out = torch.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            return torch.relu(out + idn)

    tb = TorchBottleneck(4, 2, stride=2)
    for m in tb.modules():
        if isinstance(m, tnn.BatchNorm3d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.8, 1.2)
    tb.eval()
    x = torch.randn(1, 4, 4, 8, 8)
    want = _np(tb(x))

    sd = {f"backbone.layer1.0.{k}": v for k, v in tb.state_dict().items()}
    params, stats = convert_state_dict(sd)

    from mrcnn3d.models.resnet3d import Bottleneck3D

    blk = Bottleneck3D(planes=2, stride=2, with_downsample=True)
    variables = {
        "params": params["backbone"]["layer1_0"],
        "batch_stats": stats["backbone"]["layer1_0"],
    }
    x_cl = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 4, 1)))
    got = blk.apply(variables, x_cl)
    got = np.transpose(np.asarray(got), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_s2d_stem_parity_vs_torch():
    """Space-to-depth stem == torch Conv3d(3,16,7,stride=(1,2,2),pad=3)."""
    tconv = torch.nn.Conv3d(3, 16, 7, stride=(1, 2, 2), padding=3,
                            bias=False)
    x = torch.randn(1, 3, 6, 32, 32)
    want = _np(tconv(x))

    from mrcnn3d.models.resnet3d import stem_conv_s2d

    w = jnp.asarray(_conv_w(_np(tconv.weight)))
    x_cl = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 4, 1)))
    got = stem_conv_s2d(x_cl, w)
    got = np.transpose(np.asarray(got), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.slow  # 25 s: full flagship leaf-coverage sweep; r5 fast-tier trim
def test_full_model_conversion_coverage():
    """Synthesize a reference-named state dict for the full flagship model
    and verify the converter covers EVERY parameter and stat leaf."""
    import jax
    import numpy as np

    from mrcnn3d.compat.torch_convert import (
        convert_state_dict,
        merge_into_variables,
    )
    from mrcnn3d.detectors.build import build_detector
    from mrcnn3d.utils.config import Config

    cfg = Config.fromfile("configs/mask_rcnn_3d_2scales.py")
    cfg.model["backbone"]["depth"] = 50
    model = build_detector(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 32, 32, 3))
    )

    rng = np.random.RandomState(0)

    def tshape(path, leaf):
        """our leaf shape -> torch-layout shape for the synthetic ckpt"""
        shape = np.shape(leaf)
        name = path[-1]
        if name == "kernel" and len(shape) == 5:
            kd, kh, kw, i, o = shape
            if path[-2] == "upsample":  # deconv
                return (i, o, kd, kh, kw)
            return (o, i, kd, kh, kw)
        if name == "kernel" and len(shape) == 2:
            return (shape[1], shape[0])
        return shape

    # build the reference-style name for each of our tree paths
    def ref_names(path):
        p = list(path)
        mod, rest = p[0], p[1:]
        leaf = rest[-1]
        mid = rest[:-1]
        leaf_map = {"scale": "weight", "bias": "bias", "kernel": "weight",
                    "mean": "running_mean", "var": "running_var"}
        tleaf = leaf_map[leaf]
        if mod == "backbone":
            if mid == ["conv1"] or mid == ["bn1"]:
                return f"backbone.{mid[0]}.{tleaf}"
            layer, block = mid[0].split("_")  # layerL_B
            sub = mid[1]
            if sub == "downsample_conv":
                sub = "downsample.0"
            elif sub == "downsample_bn":
                sub = "downsample.1"
            return f"backbone.{layer}.{block}.{sub}.{tleaf}"
        if mod == "neck":
            kind, i = mid[0].rsplit("_", 1)
            t = {"lateral": "lateral_convs", "fpn": "fpn_convs"}[kind]
            return f"neck.{t}.{i}.conv.{tleaf}"
        if mod.startswith("rpn_head_"):
            s = int(mod.split("_")[-1])
            src = "rpn_head" if s == 0 else f"rpn_head_{s + 1}"
            return f"{src}.{mid[0]}.{tleaf}"
        if mod.startswith("bbox_head_"):
            s = int(mod.split("_")[-1])
            src = "bbox_head" if s == 0 else f"bbox_head_{s + 1}"
            sub = mid[0]
            if sub.startswith("shared_fc_"):
                sub = f"shared_fcs.{sub.split('_')[-1]}"
            return f"{src}.{sub}.{tleaf}"
        if mod == "refinement_head":
            sub = mid[0]
            if sub.startswith("shared_fc_"):
                sub = f"shared_fcs.{sub.split('_')[-1]}"
            return f"refinement_head.{sub}.{tleaf}"
        if mod.startswith("mask_head_") or mod == "refinement_mask_head":
            s = mod.split("_")[-1]
            src = (
                "refinement_mask_head"
                if mod == "refinement_mask_head"
                else ("mask_head" if s == "0" else f"mask_head_{int(s)+1}")
            )
            sub = mid[0]
            if sub.startswith("conv_") and sub.split("_")[-1].isdigit():
                sub = f"convs.{sub.split('_')[-1]}.conv"
            return f"{src}.{sub}.{tleaf}"
        raise KeyError(mod)

    sd = {}
    for coll in ("params", "batch_stats"):
        flat = jax.tree_util.tree_flatten_with_path(variables[coll])[0]
        for kp, leaf in flat:
            path = [k.key for k in kp]
            name = ref_names(path)
            sd[name] = rng.randn(*tshape(path, leaf)).astype(np.float32)

    params, stats = convert_state_dict(sd)
    merged = merge_into_variables(variables, params, stats)

    # every leaf must have been replaced (values differ from init)
    for coll in ("params", "batch_stats"):
        before = jax.tree_util.tree_flatten_with_path(variables[coll])[0]
        after = dict(
            jax.tree_util.tree_flatten_with_path(merged[coll])[0]
        )
        for kp, leaf in before:
            new = after[kp]
            assert not np.allclose(
                np.asarray(leaf), np.asarray(new)
            ), f"param not covered by converter: {kp}"


def test_full_forward_replay_parity():
    """END-TO-END checkpoint replay: a reference-shaped torch model
    (ResNet3D-50 w16 backbone + FPN3D + dual RPN heads, reference
    state-dict names) and the converted flax flagship produce the same
    features and RPN outputs on one input (reference
    two_stage_3d_2scales.py:332-380 extract_feat + rpn path)."""
    import torch.nn as tnn

    import jax

    from mrcnn3d.compat.torch_convert import (
        convert_state_dict,
        merge_into_variables,
    )
    from mrcnn3d.detectors.build import build_detector
    from mrcnn3d.utils.config import Config

    torch.manual_seed(0)

    class TorchBottleneck(tnn.Module):
        def __init__(self, cin, planes, stride, downsample):
            super().__init__()
            self.conv1 = tnn.Conv3d(cin, planes, 1, bias=False)
            self.bn1 = tnn.BatchNorm3d(planes)
            self.conv2 = tnn.Conv3d(planes, planes, 3, stride=stride,
                                    padding=1, bias=False)
            self.bn2 = tnn.BatchNorm3d(planes)
            self.conv3 = tnn.Conv3d(planes, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm3d(planes * 4)
            self.downsample = None
            if downsample:
                self.downsample = tnn.Sequential(
                    tnn.Conv3d(cin, planes * 4, 1, stride=stride,
                               bias=False),
                    tnn.BatchNorm3d(planes * 4),
                )

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            out = torch.relu(self.bn1(self.conv1(x)))
            out = torch.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            return torch.relu(out + idn)

    class TorchResNet3D(tnn.Module):
        """reference resnet3d.py:313-486 (width 16, stem stride (1,2,2))"""

        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv3d(3, 16, 7, stride=(1, 2, 2),
                                    padding=3, bias=False)
            self.bn1 = tnn.BatchNorm3d(16)
            self.maxpool = tnn.MaxPool3d(3, stride=2, padding=1)
            blocks = (3, 4, 6, 3)
            cin = 16
            for li, (n, stride) in enumerate(
                zip(blocks, (1, 2, 2, 2)), start=1
            ):
                planes = 16 * 2 ** (li - 1)
                layer = []
                for j in range(n):
                    layer.append(TorchBottleneck(
                        cin, planes, stride if j == 0 else 1,
                        downsample=(j == 0),
                    ))
                    cin = planes * 4
                setattr(self, f"layer{li}", tnn.Sequential(*layer))

        def forward(self, x):
            x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
            outs = []
            for li in range(1, 5):
                x = getattr(self, f"layer{li}")(x)
                outs.append(x)
            return outs

    class TorchConvModule(tnn.Module):
        def __init__(self, cin, cout, k, stride=1, padding=0):
            super().__init__()
            self.conv = tnn.Conv3d(cin, cout, k, stride=stride,
                                   padding=padding)

        def forward(self, x):
            return self.conv(x)

    class TorchFPN3D(tnn.Module):
        """reference fpn3d.py forward (explicit-size nearest top-down,
        maxpool(1, stride 2) extra levels)"""

        def __init__(self, in_channels, out_channels, num_outs):
            super().__init__()
            self.num_outs = num_outs
            self.lateral_convs = tnn.ModuleList(
                [TorchConvModule(c, out_channels, 1) for c in in_channels]
            )
            self.fpn_convs = tnn.ModuleList(
                [TorchConvModule(out_channels, out_channels, 3, padding=1)
                 for _ in in_channels]
            )

        def forward(self, inputs):
            import torch.nn.functional as F

            laterals = [l(x) for l, x in zip(self.lateral_convs, inputs)]
            for i in range(len(laterals) - 1, 0, -1):
                laterals[i - 1] = laterals[i - 1] + F.interpolate(
                    laterals[i], size=list(laterals[i - 1].shape[2:]),
                    mode="nearest",
                )
            outs = [f(l) for f, l in zip(self.fpn_convs, laterals)]
            for _ in range(self.num_outs - len(outs)):
                outs.append(F.max_pool3d(outs[-1], 1, stride=2))
            return outs

    class TorchRPNHead(tnn.Module):
        def __init__(self, c, num_anchors):
            super().__init__()
            self.rpn_conv = tnn.Conv3d(c, c, 3, padding=1)
            self.rpn_cls = tnn.Conv3d(c, num_anchors, 1)
            self.rpn_reg = tnn.Conv3d(c, num_anchors * 6, 1)

        def forward(self, x):
            x = torch.relu(self.rpn_conv(x))
            return self.rpn_cls(x), self.rpn_reg(x)

    class TorchFlagship(tnn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = TorchResNet3D()
            self.neck = TorchFPN3D([64, 128, 256, 512], 64, 5)
            self.rpn_head = TorchRPNHead(64, 1)
            self.rpn_head_2 = TorchRPNHead(64, 1)

    tm = TorchFlagship()
    for m in tm.modules():
        if isinstance(m, tnn.BatchNorm3d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.8, 1.2)
    tm.eval()

    x = torch.randn(1, 3, 8, 32, 32)
    with torch.no_grad():
        tfeats = tm.neck(tm.backbone(x))
        trpn = [tm.rpn_head(f) for f in tfeats]
        trpn2 = [tm.rpn_head_2(f) for f in tfeats]

    cfg = Config.fromfile("configs/mask_rcnn_3d_2scales.py")
    cfg.model["backbone"]["depth"] = 50
    model = build_detector(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 32, 32, 3))
    )
    params, stats = convert_state_dict(tm.state_dict())
    variables = merge_into_variables(variables, params, stats)

    x_cl = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 4, 1)))
    feats = model.apply(variables, x_cl, method=model.extract_feat)
    assert len(feats) == len(tfeats)
    for lvl, (got, want) in enumerate(zip(feats, tfeats)):
        got = np.transpose(np.asarray(got), (0, 4, 1, 2, 3))
        np.testing.assert_allclose(
            got, _np(want), atol=2e-3,
            err_msg=f"FPN level {lvl}",
        )
    for s, twant in enumerate((trpn, trpn2)):
        outs = model.apply(variables, feats, s, method=model.rpn)
        for lvl, ((gc, gr), (wc, wr)) in enumerate(zip(outs, twant)):
            np.testing.assert_allclose(
                np.transpose(np.asarray(gc), (0, 4, 1, 2, 3)),
                _np(wc), atol=2e-3, err_msg=f"rpn{s} cls lvl {lvl}",
            )
            np.testing.assert_allclose(
                np.transpose(np.asarray(gr), (0, 4, 1, 2, 3)),
                _np(wr), atol=2e-3, err_msg=f"rpn{s} reg lvl {lvl}",
            )


def test_s2d4_stem_parity_vs_torch():
    """4x4 space-to-depth stem == torch Conv3d(3,16,7,(1,2,2),pad=3)."""
    tconv = torch.nn.Conv3d(3, 16, 7, stride=(1, 2, 2), padding=3,
                            bias=False)
    x = torch.randn(1, 3, 6, 32, 32)
    want = _np(tconv(x))

    from mrcnn3d.models.resnet3d import stem_conv_s2d4

    w = jnp.asarray(_conv_w(_np(tconv.weight)))
    x_cl = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 4, 1)))
    got = stem_conv_s2d4(x_cl, w)
    got = np.transpose(np.asarray(got), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.slow
def test_full_detector_replay_parity():
    """FULL-detector checkpoint replay: a complete reference-shaped torch
    state dict (backbone, FPN, both RPNs, shared bbox head, refinement
    head, both mask heads — every learned component of
    two_stage_3d_2scales.py) converts, and end-to-end `simple_test`
    detections + mask logits match a torch-side forward that uses the
    torch modules for every learned stage and this repo's
    CUDA-semantics-tested ops (RoIAlign3D, delta2bbox3d,
    multiclass_nms_3d — each oracle-verified elsewhere) as the glue the
    reference runs as CUDA kernels (which cannot execute here).
    Precomputed proposals drive both sides — a real reference pathway
    (pp/pp_2, coco_3d_2scales.py:317-324)."""
    import torch.nn as tnn
    import torch.nn.functional as F

    import jax

    from mrcnn3d.compat.torch_convert import (
        convert_state_dict,
        merge_into_variables,
    )
    from mrcnn3d.detectors import pipeline as pl
    from mrcnn3d.detectors.build import anchor_cfgs, build_detector
    from mrcnn3d.ops.box3d import delta2bbox3d
    from mrcnn3d.ops.roi_align3d import multi_level_roi_align_3d
    from mrcnn3d.utils.config import Config

    torch.manual_seed(3)

    class TorchBottleneck(tnn.Module):
        def __init__(self, cin, planes, stride, downsample):
            super().__init__()
            self.conv1 = tnn.Conv3d(cin, planes, 1, bias=False)
            self.bn1 = tnn.BatchNorm3d(planes)
            self.conv2 = tnn.Conv3d(planes, planes, 3, stride=stride,
                                    padding=1, bias=False)
            self.bn2 = tnn.BatchNorm3d(planes)
            self.conv3 = tnn.Conv3d(planes, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm3d(planes * 4)
            self.downsample = None
            if downsample:
                self.downsample = tnn.Sequential(
                    tnn.Conv3d(cin, planes * 4, 1, stride=stride,
                               bias=False),
                    tnn.BatchNorm3d(planes * 4),
                )

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            out = torch.relu(self.bn1(self.conv1(x)))
            out = torch.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            return torch.relu(out + idn)

    class TorchResNet3D(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv3d(3, 16, 7, stride=(1, 2, 2),
                                    padding=3, bias=False)
            self.bn1 = tnn.BatchNorm3d(16)
            self.maxpool = tnn.MaxPool3d(3, stride=2, padding=1)
            blocks = (3, 4, 6, 3)
            cin = 16
            for li, (n, stride) in enumerate(
                zip(blocks, (1, 2, 2, 2)), start=1
            ):
                planes = 16 * 2 ** (li - 1)
                layer = []
                for j in range(n):
                    layer.append(TorchBottleneck(
                        cin, planes, stride if j == 0 else 1,
                        downsample=(j == 0),
                    ))
                    cin = planes * 4
                setattr(self, f"layer{li}", tnn.Sequential(*layer))

        def forward(self, x):
            x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
            outs = []
            for li in range(1, 5):
                x = getattr(self, f"layer{li}")(x)
                outs.append(x)
            return outs

    class TorchConvModule(tnn.Module):
        def __init__(self, cin, cout, k, stride=1, padding=0):
            super().__init__()
            self.conv = tnn.Conv3d(cin, cout, k, stride=stride,
                                   padding=padding)

        def forward(self, x):
            return self.conv(x)

    class TorchFPN3D(tnn.Module):
        def __init__(self, in_channels, out_channels, num_outs):
            super().__init__()
            self.num_outs = num_outs
            self.lateral_convs = tnn.ModuleList(
                [TorchConvModule(c, out_channels, 1) for c in in_channels]
            )
            self.fpn_convs = tnn.ModuleList(
                [TorchConvModule(out_channels, out_channels, 3, padding=1)
                 for _ in in_channels]
            )

        def forward(self, inputs):
            laterals = [l(x) for l, x in zip(self.lateral_convs, inputs)]
            for i in range(len(laterals) - 1, 0, -1):
                laterals[i - 1] = laterals[i - 1] + F.interpolate(
                    laterals[i], size=list(laterals[i - 1].shape[2:]),
                    mode="nearest",
                )
            outs = [f(l) for f, l in zip(self.fpn_convs, laterals)]
            for _ in range(self.num_outs - len(outs)):
                outs.append(F.max_pool3d(outs[-1], 1, stride=2))
            return outs

    class TorchRPNHead(tnn.Module):
        def __init__(self, c, num_anchors):
            super().__init__()
            self.rpn_conv = tnn.Conv3d(c, c, 3, padding=1)
            self.rpn_cls = tnn.Conv3d(c, num_anchors, 1)
            self.rpn_reg = tnn.Conv3d(c, num_anchors * 6, 1)

    class TorchSharedFCHead(tnn.Module):
        """reference convfc_bbox_head_3d.py SharedFC trunk."""

        def __init__(self, in_feats, num_classes, with_cls=True):
            super().__init__()
            self.shared_fcs = tnn.ModuleList(
                [tnn.Linear(in_feats, 1024), tnn.Linear(1024, 1024)]
            )
            self.fc_cls = tnn.Linear(1024, num_classes) if with_cls else None
            self.fc_reg = tnn.Linear(1024, 6 * num_classes)

        def forward(self, x):
            x = x.flatten(1)
            for fc in self.shared_fcs:
                x = torch.relu(fc(x))
            cls = self.fc_cls(x) if self.fc_cls is not None else None
            return cls, self.fc_reg(x)

    class TorchMaskHead(tnn.Module):
        """reference fcn_mask_head_3d.py:45-98."""

        def __init__(self, c, num_classes):
            super().__init__()
            self.convs = tnn.ModuleList(
                [TorchConvModule(c, c, 3, padding=1) for _ in range(4)]
            )
            self.upsample = tnn.ConvTranspose3d(c, c, 2, stride=2)
            self.conv_logits = tnn.Conv3d(c, num_classes, 1)

        def forward(self, x):
            for m in self.convs:
                x = torch.relu(m(x))
            x = torch.relu(self.upsample(x))
            return self.conv_logits(x)

    class TorchFlagship(tnn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = TorchResNet3D()
            self.neck = TorchFPN3D([64, 128, 256, 512], 64, 5)
            self.rpn_head = TorchRPNHead(64, 1)
            self.rpn_head_2 = TorchRPNHead(64, 1)
            self.bbox_head = TorchSharedFCHead(64 * 3 * 7 * 7, 2)
            self.refinement_head = TorchSharedFCHead(
                64 * 3 * 7 * 7, 2, with_cls=False
            )
            self.mask_head = TorchMaskHead(64, 2)
            self.refinement_mask_head = TorchMaskHead(64, 2)

    tm = TorchFlagship()
    for m in tm.modules():
        if isinstance(m, tnn.BatchNorm3d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.8, 1.2)
    tm.eval()

    cfg = Config.fromfile("configs/mask_rcnn_3d_2scales.py")
    cfg.model["backbone"]["depth"] = 50
    cfg.test_cfg["return_bbox_only"] = False
    cfg.test_cfg["rcnn"]["max_per_img"] = 32
    model = build_detector(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 32, 32, 3))
    )
    params, stats = convert_state_dict(tm.state_dict())
    variables = merge_into_variables(variables, params, stats)

    # inputs + precomputed proposals (well-separated, inside both frames)
    rng = np.random.RandomState(5)
    x1 = rng.randn(1, 3, 8, 32, 32).astype(np.float32)
    x2 = rng.randn(1, 3, 12, 48, 48).astype(np.float32)
    base = np.array(
        [
            [2, 2, 12, 12, 1, 4],
            [16, 4, 28, 14, 2, 6],
            [4, 18, 14, 30, 0, 3],
            [18, 18, 30, 30, 3, 7],
            [8, 8, 22, 22, 1, 6],
            [1, 12, 9, 26, 2, 5],
        ],
        np.float32,
    )
    props1 = base
    props2 = base * 1.5

    means = tuple(cfg.model["bbox_head"]["target_means"])
    stds = tuple(cfg.model["bbox_head"]["target_stds"])
    roi_cfg = cfg.model["bbox_roi_extractor"]
    mask_cfg = cfg.model["mask_roi_extractor"]

    def to_cl(t):
        return jnp.asarray(np.transpose(_np(t), (0, 2, 3, 4, 1)))

    def align(feats_cl, boxes, rcfg):
        rois = jnp.asarray(
            np.concatenate(
                [np.zeros((boxes.shape[0], 1), np.float32), boxes], axis=1
            )
        )
        return multi_level_roi_align_3d(
            [f for f in feats_cl[: len(rcfg["featmap_strides"])]],
            rois,
            rcfg["roi_layer"]["out_size"],
            rcfg["roi_layer"]["out_size_depth"],
            rcfg["featmap_strides"],
            rcfg["featmap_strides_depth"],
            rcfg["roi_layer"]["sample_num"],
        )

    def to_torch_pooled(p):
        return torch.from_numpy(
            np.transpose(np.asarray(p, np.float32), (0, 4, 1, 2, 3))
        )

    with torch.no_grad():
        tfeats1 = tm.neck(tm.backbone(torch.from_numpy(x1)))
        tfeats2 = tm.neck(tm.backbone(torch.from_numpy(x2)))
        f1_cl = [to_cl(f) for f in tfeats1]
        f2_cl = [to_cl(f) for f in tfeats2]
        shape1 = (32, 32, 3, 8)
        shape2 = (48, 48, 3, 12)

        # scale-1 bbox head
        p1 = align(f1_cl, props1, roi_cfg)
        cls1, reg1 = tm.bbox_head(to_torch_pooled(p1))
        boxes1 = np.asarray(delta2bbox3d(
            jnp.asarray(props1), jnp.asarray(_np(reg1)), means, stds, shape1
        ))
        scores1 = _np(torch.softmax(cls1, dim=1))

        # scale-2 bbox head (shared) + rescale to 1.0x frame
        p2 = align(f2_cl, props2, roi_cfg)
        cls2, reg2 = tm.bbox_head(to_torch_pooled(p2))
        boxes2 = np.asarray(delta2bbox3d(
            jnp.asarray(props2), jnp.asarray(_np(reg2)), means, stds, shape2
        )) / 1.5
        scores2 = _np(torch.softmax(cls2, dim=1))

        # refinement: class-1 scale-2 boxes re-regressed on 1.0x feats
        ref_in = boxes2[:, 6:12]
        pr = align(f1_cl, ref_in.astype(np.float32), roi_cfg)
        _, ref_reg = tm.refinement_head(to_torch_pooled(pr))
        boxes2 = np.asarray(delta2bbox3d(
            jnp.asarray(ref_in.astype(np.float32)),
            jnp.asarray(_np(ref_reg)), means, stds, shape1,
        ))

        boxes_all = np.concatenate([boxes1, boxes2], axis=0)
        scores_all = np.concatenate([scores1, scores2], axis=0)
        tdets, tlabels, tvalid, tsrc = pl.multiclass_nms_3d(
            jnp.asarray(boxes_all),
            jnp.asarray(scores_all),
            jnp.ones((boxes_all.shape[0],), bool),
            cfg.test_cfg["rcnn"]["score_thr"],
            cfg.test_cfg["rcnn"]["nms"]["iou_thr"],
            cfg.test_cfg["rcnn"]["max_per_img"],
        )
        tdets, tvalid, tsrc = map(np.asarray, (tdets, tvalid, tsrc))

        # mask heads on final detections, split by provenance
        pm = align(f1_cl, tdets[:, :6].astype(np.float32), mask_cfg)
        tmask1 = _np(tm.mask_head(to_torch_pooled(pm)))
        tmask2 = _np(tm.refinement_mask_head(to_torch_pooled(pm)))
        refined = tsrc >= props1.shape[0]
        tmask = np.where(
            refined[:, None, None, None, None], tmask2, tmask1
        )

    # ---- flax side: one jitted simple_test with converted weights ----
    acs = anchor_cfgs(cfg)
    sets = []
    for (d, h, w), ac in zip([(8, 32, 32), (12, 48, 48)], acs):
        xx = jnp.zeros((1, d, h, w, 3))
        feats = jax.eval_shape(
            lambda v: model.apply(variables, v, method=model.extract_feat),
            xx,
        )
        fs = [f.shape[1:4] for f in feats]
        sets.append(pl.build_anchor_set(fs, (h, w, 3, d), ac))
    batch = dict(
        imgs=jnp.asarray(np.transpose(x1, (0, 2, 3, 4, 1))),
        imgs_2=jnp.asarray(np.transpose(x2, (0, 2, 3, 4, 1))),
        proposals=jnp.asarray(props1[None]),
        proposals_2=jnp.asarray(props2[None]),
    )
    out = pl.simple_test(model, variables, batch, cfg, sets)
    jdets = np.asarray(out["dets"])[0]
    jvalid = np.asarray(out["valid"])[0]
    jmask = np.asarray(out["mask_logits"])

    np.testing.assert_array_equal(jvalid, tvalid)
    n = int(tvalid.sum())
    assert n > 0, "no detections survived NMS — test is vacuous"
    np.testing.assert_allclose(
        jdets[:n], tdets[:n], atol=2e-3,
        err_msg="final detections diverge from torch replay",
    )
    np.testing.assert_allclose(
        jmask[:n], tmask[:n], atol=2e-3,
        err_msg="mask logits diverge from torch replay",
    )
