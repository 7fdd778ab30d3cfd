"""Soft-NMS, proposal recall, and alternative backbones."""
import jax
import jax.numpy as jnp
import numpy as np

from mrcnn3d.eval.recall import eval_recalls_3d
from mrcnn3d.models.backbones_extra import ResNeXt3D, UNet3D
from mrcnn3d.ops.nms3d import nms_3d_numpy, soft_nms_3d_numpy


class TestSoftNms:
    def test_gaussian_decays_but_keeps(self):
        box = [10, 10, 30, 30, 2, 8]
        dets = np.array([box + [0.9], box + [0.8]], np.float32)
        out, idx = soft_nms_3d_numpy(dets, method="gaussian", sigma=0.5)
        assert idx[0] == 0
        # overlapping duplicate survives with decayed score
        assert len(out) == 2
        assert out[1, 6] < 0.8

    def test_naive_matches_hard_nms(self):
        rng = np.random.RandomState(0)
        x1 = rng.uniform(0, 40, 20)
        dets = np.stack(
            [
                x1,
                x1,
                x1 + 10,
                x1 + 10,
                np.zeros(20),
                np.full(20, 5.0),
                rng.uniform(0, 1, 20),
            ],
            axis=-1,
        ).astype(np.float32)
        _, idx = soft_nms_3d_numpy(dets, iou_thr=0.5, method="naive")
        assert sorted(idx) == sorted(nms_3d_numpy(dets, 0.5))


class TestRecall:
    def test_perfect_proposals(self):
        gts = [np.array([[10, 10, 20, 20, 2, 8]], np.float32)]
        props = [np.array([[10, 10, 20, 20, 2, 8, 0.9]], np.float32)]
        r = eval_recalls_3d(gts, props, (1, 10), (0.5, 0.9))
        np.testing.assert_allclose(r, 1.0)

    def test_topk_cutoff(self):
        gts = [np.array([[10, 10, 20, 20, 2, 8]], np.float32)]
        # good proposal ranked second
        props = [
            np.array(
                [
                    [100, 100, 120, 120, 0, 5, 0.9],
                    [10, 10, 20, 20, 2, 8, 0.5],
                ],
                np.float32,
            )
        ]
        r = eval_recalls_3d(gts, props, (1, 2), (0.5,))
        assert r[0, 0] == 0.0 and r[1, 0] == 1.0


class TestBackbones:
    def test_unet3d_shapes(self):
        m = UNet3D(base_channels=4)
        x = jnp.zeros((1, 8, 32, 32, 3))
        variables = m.init(jax.random.PRNGKey(0), x)
        outs = m.apply(variables, x)
        assert len(outs) == 4
        assert outs[0].shape == (1, 8, 32, 32, 4)  # finest
        assert outs[-1].shape == (1, 1, 4, 4, 32)  # coarsest

    def test_resnext3d_shapes(self):
        m = ResNeXt3D(depth=50, groups=4, base_width=4, width=8)
        x = jnp.zeros((1, 8, 32, 32, 3))
        variables = m.init(jax.random.PRNGKey(0), x)
        outs = m.apply(variables, x)
        assert len(outs) == 4
        # strides xy {4,8,16,32}, depth {2,4,8,16}; widths 32..256
        assert outs[0].shape == (1, 4, 8, 8, 32)
        assert outs[3].shape == (1, 1, 1, 1, 256)


class TestVocMap:
    def test_perfect(self):
        from mrcnn3d.eval.mean_ap import eval_map_3d

        gts = [np.array([[10, 10, 20, 20, 2, 8]], np.float32)]
        dets = [np.array([[10, 10, 20, 20, 2, 8, 0.9]], np.float32)]
        ap, r, p = eval_map_3d(dets, gts)
        assert ap == 1.0

    def test_fp_before_tp(self):
        from mrcnn3d.eval.mean_ap import eval_map_3d

        gts = [np.array([[10, 10, 20, 20, 2, 8]], np.float32)]
        dets = [
            np.array(
                [
                    [100, 100, 110, 110, 0, 4, 0.95],
                    [10, 10, 20, 20, 2, 8, 0.9],
                ],
                np.float32,
            )
        ]
        ap, r, p = eval_map_3d(dets, gts)
        # recall 1 at precision 0.5 -> continuous AP 0.5
        assert abs(ap - 0.5) < 1e-6

    def test_11point_mode(self):
        from mrcnn3d.eval.mean_ap import eval_map_3d

        gts = [np.array([[10, 10, 20, 20, 2, 8]], np.float32)]
        dets = [np.array([[10, 10, 20, 20, 2, 8, 0.9]], np.float32)]
        ap, _, _ = eval_map_3d(dets, gts, mode="11points")
        assert abs(ap - 1.0) < 1e-6


def test_fpn3d_2scales_fused_neck():
    """FPN3D2Scales interleaves the two pathways into one top-down chain
    (reference necks/fpn3d_2scales.py:143-188)."""
    import jax
    import jax.numpy as jnp

    from mrcnn3d.models.fpn3d import FPN3D2Scales

    rng = jax.random.PRNGKey(0)
    # 1.0x stages (B, d, h, w, C) and their 1.5x twins
    chans = [64, 128, 256, 512]
    feats = [
        jnp.ones((1, 8 // 2**i + (8 // 2**i == 0), 16 // 2**i,
                  16 // 2**i, c))
        for i, c in enumerate(chans)
    ]
    feats2 = [
        jnp.ones((1, 12 // 2**i + (12 // 2**i == 0), 24 // 2**i,
                  24 // 2**i, c))
        for i, c in enumerate(chans)
    ]
    neck = FPN3D2Scales(out_channels=32, num_outs=9)
    variables = neck.init(rng, feats, feats2)
    outs = neck.apply(variables, feats, feats2)
    assert len(outs) == 9
    # slot 2i is the 1.5x stage i, slot 2i+1 the 1.0x stage i
    for i in range(4):
        assert outs[2 * i].shape[1:4] == feats2[i].shape[1:4]
        assert outs[2 * i + 1].shape[1:4] == feats[i].shape[1:4]
    # extra level subsamples outs[-2] (reference :187), i.e. the last
    # 1.5x slot, not the finmost-coarse 1.0x one
    assert outs[8].shape[1:4] == tuple(
        -(-s // 2) for s in outs[6].shape[1:4]
    )
    # every lateral/fpn conv pair exists (2 per backbone stage)
    names = set(variables["params"].keys())
    assert {f"lateral_{i}" for i in range(8)} <= names
    assert {f"fpn_{i}" for i in range(8)} <= names


def test_roi_pool_3d_matches_oracle():
    """RoIPool3D == scalar numpy oracle of the CUDA kernel
    (reference mmdet/ops/roi_pool/src/roi_pool_kernel.cu)."""
    import jax.numpy as jnp

    from mrcnn3d.ops.roi_pool3d import roi_pool_3d, roi_pool_3d_numpy

    rng = np.random.RandomState(3)
    feats = rng.randn(2, 12, 24, 24, 5).astype(np.float32)
    n = 12
    x1 = rng.uniform(-4, 80, n)
    y1 = rng.uniform(-4, 80, n)
    z1 = rng.uniform(-2, 18, n)
    rois = np.stack(
        [rng.randint(0, 2, n).astype(np.float64), x1, y1,
         x1 + rng.uniform(2, 40, n), y1 + rng.uniform(2, 40, n),
         z1, z1 + rng.uniform(1, 8, n)], -1,
    ).astype(np.float32)
    want = roi_pool_3d_numpy(feats, rois, 7, 3, 0.25, 0.5)
    got = roi_pool_3d(
        jnp.asarray(feats), jnp.asarray(rois), 7, 3, 0.25, 0.5,
        max_hw=24, max_d=12,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_roi_pool_2d_depth1():
    """Depth-1 RoIPool == the 2-D legacy op on (1, H, W) volumes."""
    import jax.numpy as jnp

    from mrcnn3d.ops.roi_pool3d import roi_pool_3d, roi_pool_3d_numpy

    rng = np.random.RandomState(4)
    feats = rng.randn(1, 1, 16, 16, 3).astype(np.float32)
    rois = np.array(
        [[0, 4, 4, 40, 44, 0, 0], [0, 0, 0, 60, 60, 0, 0]], np.float32
    )
    want = roi_pool_3d_numpy(feats, rois, 7, 1, 0.25, 1.0)
    got = roi_pool_3d(
        jnp.asarray(feats), jnp.asarray(rois), 7, 1, 0.25, 1.0,
        max_hw=16, max_d=1,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


class TestDCN:
    def test_deform_conv_matches_oracle(self):
        from mrcnn3d.ops.dcn import deform_conv2d, deform_conv2d_numpy

        rng = np.random.RandomState(5)
        x = rng.randn(2, 9, 10, 4).astype(np.float32)
        w = (rng.randn(3, 3, 4, 6) * 0.1).astype(np.float32)
        off = (rng.randn(2, 9, 10, 18) * 1.5).astype(np.float32)
        want = deform_conv2d_numpy(x, off, w)
        got = deform_conv2d(
            jnp.asarray(x), jnp.asarray(off), jnp.asarray(w)
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    def test_modulated_and_zero_offset_is_plain_conv(self):
        from mrcnn3d.ops.dcn import deform_conv2d, deform_conv2d_numpy

        rng = np.random.RandomState(6)
        x = rng.randn(1, 8, 8, 3).astype(np.float32)
        w = (rng.randn(3, 3, 3, 5) * 0.1).astype(np.float32)
        zero_off = np.zeros((1, 8, 8, 18), np.float32)
        got = deform_conv2d(jnp.asarray(x), jnp.asarray(zero_off),
                            jnp.asarray(w))
        import jax.numpy as jnp2
        ref = jax.lax.conv_general_dilated(
            jnp2.asarray(x), jnp2.asarray(w), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-4
        )
        # v2 mask
        m = rng.uniform(0, 1, (1, 8, 8, 9)).astype(np.float32)
        off = (rng.randn(1, 8, 8, 18) * 1.0).astype(np.float32)
        want = deform_conv2d_numpy(x, off, w, mask=m)
        got = deform_conv2d(jnp.asarray(x), jnp.asarray(off),
                            jnp.asarray(w), mask=jnp.asarray(m))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    def test_pack_module_gradients(self):
        from mrcnn3d.ops.dcn import DeformConv2dPack

        m = DeformConv2dPack(features=4, modulated=True)
        x = jnp.asarray(
            np.random.RandomState(7).randn(1, 1, 8, 8, 3), jnp.float32
        )
        variables = m.init(jax.random.PRNGKey(0), x)

        def f(v):
            return jnp.sum(m.apply(v, x) ** 2)

        g = jax.grad(f)(variables)
        leaves = jax.tree.leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        # zero-init offset branch -> starts as a plain conv; offset grads
        # flow through the bilinear sampler
        total = sum(float(jnp.abs(l).sum()) for l in leaves)
        assert total > 0


def test_resnext_2d_depth1():
    """ResNeXt two_d mode: (1,k,k) kernels on depth-1 volumes == the 2-D
    legacy ResNeXt (reference mmdet/models/backbones/resnext.py)."""
    from mrcnn3d.models.backbones_extra import ResNeXt3D

    m = ResNeXt3D(depth=50, groups=4, base_width=4, width=8, two_d=True)
    x = jnp.zeros((1, 1, 32, 32, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(variables, x)
    assert len(outs) == 4
    # depth stays 1 at every stage; xy strides 4/8/16/32
    assert [o.shape[1] for o in outs] == [1, 1, 1, 1]
    assert [o.shape[2] for o in outs] == [8, 4, 2, 1]


def test_max_pool_3d_custom_vjp_matches_xla():
    """max_pool_3d's dense backward == XLA select-and-scatter routing,
    including ties (first maximal element in window scan order wins) —
    the rule the reference's torch CUDA MaxPool3d backward uses."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    from mrcnn3d.models.layers import max_pool_3d

    rng = np.random.RandomState(40)
    # quantized values force ties inside windows
    x = jnp.asarray(np.round(rng.randn(2, 9, 10, 11, 4) * 2) / 2,
                    jnp.float32)

    for window, strides, padding in [
        ((3, 3, 3), (2, 2, 2), [(1, 1), (1, 1), (1, 1)]),
        ((1, 3, 3), (1, 2, 2), [(0, 0), (1, 1), (1, 1)]),
        ((2, 2, 2), (2, 2, 2), "VALID"),
        ((1, 3, 3), (1, 1, 1), [(0, 0), (1, 1), (1, 1)]),
    ]:
        y = max_pool_3d(x, window, strides, padding)
        y_ref = nn.max_pool(
            x, window_shape=window, strides=strides, padding=padding
        )
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref))
        g = jnp.asarray(rng.randn(*y.shape), jnp.float32)
        gx = jax.grad(
            lambda v: jnp.vdot(max_pool_3d(v, window, strides, padding), g)
        )(x)
        gx_ref = jax.grad(
            lambda v: jnp.vdot(
                nn.max_pool(
                    v, window_shape=window, strides=strides, padding=padding
                ),
                g,
            )
        )(x)
        np.testing.assert_allclose(
            np.asarray(gx), np.asarray(gx_ref), atol=1e-5
        )


class TestMultiClassMap:
    """Multi-class VOC eval_map semantics (reference mean_ap.py:204-330)."""

    def _two_class_fixture(self):
        # img0: one class-1 gt matched twice (dup -> fp); img1: class-2 gt
        dets0 = [
            np.array(
                [[10, 10, 20, 20, 0.9], [11, 11, 21, 21, 0.8]], np.float32
            ),
            np.zeros((0, 5), np.float32),
        ]
        dets1 = [
            np.zeros((0, 5), np.float32),
            np.array([[5, 5, 15, 15, 0.7]], np.float32),
        ]
        gts = [
            np.array([[10, 10, 20, 20]], np.float32),
            np.array([[5, 5, 15, 15]], np.float32),
        ]
        labels = [np.array([1]), np.array([2])]
        return [dets0, dets1], gts, labels

    def test_duplicate_match_is_fp(self):
        from mrcnn3d.eval.mean_ap import eval_map

        dets, gts, labels = self._two_class_fixture()
        m, res = eval_map(dets, gts, labels, print_summary=False)
        # class 1: tp at rank 1, fp at rank 2 -> AP = 1.0 (recall
        # saturates before the fp); class 2 perfect
        assert res[0]["num_dets"] == 2 and res[0]["num_gts"] == 1
        assert abs(res[0]["ap"] - 1.0) < 1e-6
        assert abs(m - 1.0) < 1e-6

    def test_ignored_gt_neither_tp_nor_fp(self):
        from mrcnn3d.eval.mean_ap import eval_map

        dets = [[np.array([[10, 10, 20, 20, 0.9]], np.float32)]]
        gts = [np.array([[10, 10, 20, 20], [40, 40, 50, 50]], np.float32)]
        labels = [np.array([1, 1])]
        ign = [np.array([1, 0], np.int32)]
        m, res = eval_map(
            dets, gts, labels, gt_ignore=ign, print_summary=False
        )
        # the only det hits the ignored gt: not a tp, not a fp; the
        # remaining live gt is unmatched -> recall 0, AP 0
        assert res[0]["num_gts"] == 1
        assert res[0]["recall"][-1] == 0.0
        assert res[0]["precision"][-1] == 0.0
        assert m == 0.0

    def test_voc07_11point_mode(self):
        from mrcnn3d.eval.mean_ap import eval_map

        dets = [[np.array([[0, 0, 10, 10, 0.9]], np.float32)],
                [np.array([[0, 0, 10, 10, 0.8]], np.float32)]]
        gts = [np.array([[0, 0, 10, 10]], np.float32),
               np.array([[50, 50, 60, 60]], np.float32)]
        labels = [np.array([1]), np.array([1])]
        m_area, _ = eval_map(dets, gts, labels, print_summary=False)
        m_07, _ = eval_map(
            dets, gts, labels, dataset="voc07", print_summary=False
        )
        # recall caps at 0.5 with precision 1.0 then 0.5:
        # area AP = 0.5; 11-point AP = 6/11 (thr 0..0.5 -> max prec 1)
        assert abs(m_area - 0.5) < 1e-6
        assert abs(m_07 - 6 / 11) < 1e-6

    def test_scale_ranges_bucketing(self):
        from mrcnn3d.eval.mean_ap import eval_map

        # one small gt (11x11 -> 121), one large gt (41x41 -> 1681)
        dets = [[np.array(
            [[0, 0, 10, 10, 0.9], [100, 100, 140, 140, 0.8]], np.float32
        )]]
        gts = [np.array([[0, 0, 10, 10], [100, 100, 140, 140]], np.float32)]
        labels = [np.array([1, 1])]
        m, res = eval_map(
            dets, gts, labels, scale_ranges=[(0, 20), (20, 1000)],
            print_summary=False,
        )
        assert list(res[0]["num_gts"]) == [1, 1]
        assert m == [1.0, 1.0]

    def test_tpfp_imagenet_small_gt_threshold(self):
        from mrcnn3d.eval.mean_ap import tpfp_imagenet

        # 5x5 gt: thr = min(25/ (15*15), 0.5) ~ 0.111 -> a loose det
        # with IoU ~0.2 still matches under the imagenet rule
        gts = np.array([[10, 10, 14, 14]], np.float32)
        dets = np.array([[8, 8, 14, 14, 0.9]], np.float32)
        tp, fp = tpfp_imagenet(dets, gts, np.zeros(1, np.int32), 0.5)
        assert tp[0, 0] == 1 and fp[0, 0] == 0

    def test_3d_dets(self):
        from mrcnn3d.eval.mean_ap import eval_map

        dets = [[np.array([[4, 4, 14, 14, 2, 6, 0.9]], np.float32)]]
        gts = [np.array([[4, 4, 14, 14, 2, 6]], np.float32)]
        labels = [np.array([1])]
        m, res = eval_map(dets, gts, labels, print_summary=False)
        assert abs(m - 1.0) < 1e-6


class TestDeformRoIPool:
    """Deformable RoI pooling vs the CUDA-semantics scalar oracle
    (reference deform_pool_cuda_kernel.cu)."""

    def _data(self, seed=0, c=8):
        rng = np.random.RandomState(seed)
        feats = rng.randn(2, 16, 16, c).astype(np.float32)
        rois = np.array(
            [
                [0, 2.2, 3.1, 11.7, 12.4],
                [1, 0.0, 0.0, 15.0, 15.0],
                [0, 5.0, 5.0, 6.0, 6.0],  # tiny roi
                [1, -2.0, -2.0, 4.0, 4.0],  # partially outside
            ],
            np.float32,
        )
        return feats, rois

    def test_no_trans_matches_oracle(self):
        import jax.numpy as jnp
        from mrcnn3d.ops.dcn import deform_roi_pool, deform_roi_pool_numpy

        feats, rois = self._data()
        want = deform_roi_pool_numpy(
            feats, rois, None, spatial_scale=0.5, out_size=5
        )
        got = deform_roi_pool(
            jnp.asarray(feats), jnp.asarray(rois), None,
            spatial_scale=0.5, out_size=5,
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    def test_offsets_match_oracle(self):
        import jax.numpy as jnp
        from mrcnn3d.ops.dcn import deform_roi_pool, deform_roi_pool_numpy

        feats, rois = self._data(seed=1)
        rng = np.random.RandomState(2)
        offs = rng.randn(len(rois), 2, 5, 5).astype(np.float32)
        want = deform_roi_pool_numpy(
            feats, rois, offs, spatial_scale=0.5, out_size=5,
            trans_std=0.2,
        )
        got = deform_roi_pool(
            jnp.asarray(feats), jnp.asarray(rois), jnp.asarray(offs),
            spatial_scale=0.5, out_size=5, trans_std=0.2,
        )
        np.testing.assert_allclose(
            np.asarray(got), want, atol=1e-4, rtol=1e-4
        )

    def test_position_sensitive_groups(self):
        import jax.numpy as jnp
        from mrcnn3d.ops.dcn import deform_roi_pool, deform_roi_pool_numpy

        feats, rois = self._data(seed=3, c=8)  # gs=2: 8 = 2*2*2
        want = deform_roi_pool_numpy(
            feats, rois, None, spatial_scale=1.0, out_size=4,
            group_size=2,
        )
        got = deform_roi_pool(
            jnp.asarray(feats), jnp.asarray(rois), None,
            spatial_scale=1.0, out_size=4, group_size=2,
        )
        assert got.shape == (4, 4, 4, 2)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    def test_pack_module_zero_init_and_grads(self):
        import jax
        import jax.numpy as jnp
        from mrcnn3d.ops.dcn import (
            DeformRoIPoolingPack,
            deform_roi_pool,
        )

        feats, rois = self._data(seed=4)
        mod = DeformRoIPoolingPack(
            out_size=5, out_channels=8, spatial_scale=0.5,
            trans_std=0.1, modulated=True,
        )
        variables = mod.init(
            jax.random.PRNGKey(0), jnp.asarray(feats), jnp.asarray(rois)
        )
        out = mod.apply(variables, jnp.asarray(feats), jnp.asarray(rois))
        # zero-init offset fc -> offsets 0; zero-init mask fc ->
        # sigmoid(0) = 0.5: starts as plain pooling * 0.5
        base = deform_roi_pool(
            jnp.asarray(feats), jnp.asarray(rois), None,
            spatial_scale=0.5, out_size=5,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(base) * 0.5, atol=1e-5
        )
        # gradients flow to the offset branch
        g = jax.grad(
            lambda v: jnp.sum(
                mod.apply(v, jnp.asarray(feats), jnp.asarray(rois)) ** 2
            )
        )(variables)
        leaves = jax.tree_util.tree_leaves(g["params"]["offset_fc_2"])
        assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
